"""Butterfly (bipartite 4-cycle) counting over the review graph.

The butterfly — two users sharing two products — is THE dense-block
signal FRAUDAR peels for (/root/reference Detector/Fraudar.py:195-249
maximizes average degree of a bipartite block, and blocks dense in
butterflies are exactly its high-score targets); the global butterfly
count is the standard one-number readout of bipartite clustering /
review-bombing pressure.

    butterflies = Σ_{p1<p2} C(|N(p1) ∩ N(p2)|, 2)

computed from the USER side: every user with degree d emits C(d, 2)
product wedges; per-pair wedge counts c give Σ C(c, 2). Users above
``degree_cap`` are skipped — the standard hub mitigation (a cap-d hub
alone contributes C(d,2) wedge pairs); the cap is part of the
operator's spec and the SQL oracle replays it verbatim.

Scale shape: ONE coarse bucket shuffle by user for the wedge emission
(per-user adjacency never materializes driver-side), ONE by product
pair for the counts; per-bucket work is lexsort + run-boundary
reduceat; the readout moves three integers per bucket. Driver-local
fast path below the small-graph gate (identical kernel).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table


def _wedges_from_runs(src: np.ndarray, dst: np.ndarray, cap: int):
    """Sorted-by-src (src, dst) rows -> (p1, p2) wedge arrays, capped."""
    if len(src) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    starts = np.flatnonzero(np.concatenate([[True], s[1:] != s[:-1]]))
    ends = np.append(starts[1:], len(s))
    p1, p2 = [], []
    for a, b in zip(starts, ends):
        deg = b - a
        if deg < 2 or deg > cap:
            continue
        grp = d[a:b]
        i, j = np.triu_indices(deg, k=1)
        p1.append(grp[i])
        p2.append(grp[j])
    if not p1:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    return np.concatenate(p1), np.concatenate(p2)


def _counts_to_stats(c: np.ndarray) -> tuple[int, int, int]:
    return int(c.sum()), len(c), int((c * (c - 1) // 2).sum())


def butterfly_count(
    edges: "ray.data.Dataset",
    degree_cap: int = 1000,
    approx_edges: int | None = None,
    local_threshold: int = 1_000_000,
) -> tuple[int, int, int]:
    """(n_wedges, n_pairs, n_butterflies) over deduped bipartite
    (src=user, dst=product) edges. Exact integers."""
    e = edges.select_columns(["src", "dst"])

    if approx_edges is not None and approx_edges <= local_threshold:
        t = collect_table(e)
        p1, p2 = _wedges_from_runs(
            t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
            degree_cap,
        )
        if len(p1) == 0:
            return 0, 0, 0
        order = np.lexsort((p2, p1))
        p1, p2 = p1[order], p2[order]
        starts = np.flatnonzero(
            np.concatenate([[True], (p1[1:] != p1[:-1]) | (p2[1:] != p2[:-1])])
        )
        c = np.diff(np.append(starts, len(p1)))
        return _counts_to_stats(c)

    from ugfraud_ray.functions.bucketing import n_coarse_buckets

    nb = np.uint64(n_coarse_buckets(approx_edges))

    def bucket_user(t: pa.Table) -> pa.Table:
        u = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = u * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(29)
        return t.append_column("_ub", pa.array((h % nb).astype(np.int64)))

    def emit(g) -> pa.Table:
        p1, p2 = _wedges_from_runs(
            g["src"].to_numpy().astype(np.int64),
            g["dst"].to_numpy().astype(np.int64),
            degree_cap,
        )
        return pa.table({"p1": pa.array(p1), "p2": pa.array(p2)})

    wedges = (
        e.map_batches(bucket_user, batch_format="pyarrow")
        .groupby("_ub")
        .map_groups(emit, batch_format="pyarrow")
    )

    def bucket_pair(t: pa.Table) -> pa.Table:
        a = t["p1"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["p2"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = a * np.uint64(0x9E3779B97F4A7C15) ^ b * np.uint64(0xC2B2AE3D27D4EB4F)
        h ^= h >> np.uint64(29)
        return t.append_column("_pb", pa.array((h % nb).astype(np.int64)))

    def stats_bucket(g) -> pa.Table:
        p1 = g["p1"].to_numpy().astype(np.int64)
        p2 = g["p2"].to_numpy().astype(np.int64)
        order = np.lexsort((p2, p1))
        p1, p2 = p1[order], p2[order]
        if len(p1) == 0:
            return pa.table({"w": pa.array([], pa.int64()), "p": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        starts = np.flatnonzero(
            np.concatenate([[True], (p1[1:] != p1[:-1]) | (p2[1:] != p2[:-1])])
        )
        c = np.diff(np.append(starts, len(p1)))
        w, p, b = _counts_to_stats(c)
        return pa.table({"w": pa.array([w]), "p": pa.array([p]), "b": pa.array([b])})

    parts = collect_table(
        wedges.map_batches(bucket_pair, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(stats_bucket, batch_format="pyarrow")
    )
    if parts.num_rows == 0:
        return 0, 0, 0
    return (
        int(parts["w"].to_numpy(zero_copy_only=False).sum()),
        int(parts["p"].to_numpy(zero_copy_only=False).sum()),
        int(parts["b"].to_numpy(zero_copy_only=False).sum()),
    )
