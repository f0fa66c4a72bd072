"""k-truss decomposition: maximal subgraph where every edge closes
>= k-2 triangles (within the subgraph).

The edge-level sibling of k-core (`pipelines/kcore.py`) and the
subgraph-density family FRAUDAR peels greedily (/root/reference
Detector/Fraudar.py:195-249) — k-truss is its order-free fixpoint
cousin: repeatedly drop every edge whose triangle support is below
k-2 until stable. Round = one exact per-edge support pass (the
degree-oriented wedge+close shape of `pipelines/clustering.py`, but
closes credit the three EDGES); edges only ever leave, so the stop
rule (first count-stable round) is replayable post-hoc in SQL exactly
like kcore_members.

Scale shape per round: orient alive edges by (degree, vid) → wedge
emit carrying the source corner (ONE coarse-bucket shuffle) → tagged
close join (second shuffle) emitting sparse canonical-edge credits →
credits+edges co-bucketed once more to filter survivors. Small graphs
run the identical kernel driver-local.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table
from ugfraud_ray.pipelines.triangles import _canonical_edges


def _supports_local(a: np.ndarray, b: np.ndarray, nv: int) -> np.ndarray:
    """Exact triangle support per canonical (a<b) edge (aligned)."""
    sup = np.zeros(len(a), dtype=np.int64)
    if len(a) == 0:
        return sup
    deg = np.bincount(a, minlength=nv) + np.bincount(b, minlength=nv)
    a_first = (deg[a] < deg[b]) | ((deg[a] == deg[b]) & (a < b))
    u = np.where(a_first, a, b)
    w = np.where(a_first, b, a)
    order = np.lexsort((w, u))
    u, w = u[order], w[order]
    starts = np.flatnonzero(np.concatenate([[True], np.diff(u) != 0]))
    ends = np.append(starts[1:], len(u))
    us, xs, ys = [], [], []
    for s, t2 in zip(starts, ends):
        if t2 - s < 2:
            continue
        grp = w[s:t2]
        i, j = np.triu_indices(t2 - s, k=1)
        xs.append(grp[i])
        ys.append(grp[j])
        us.append(np.full(len(i), u[s], dtype=np.int64))
    if not xs:
        return sup
    wu, wx, wy = np.concatenate(us), np.concatenate(xs), np.concatenate(ys)
    ek = a * nv + b
    ek_order = np.argsort(ek)
    ek_sorted = ek[ek_order]
    closed = np.isin(wx * nv + wy, ek_sorted)
    wu, wx, wy = wu[closed], wx[closed], wy[closed]
    for p, q in ((wu, wx), (wu, wy), (wx, wy)):
        key = np.minimum(p, q) * nv + np.maximum(p, q)
        pos = np.searchsorted(ek_sorted, key)
        np.add.at(sup, ek_order[pos], 1)
    return sup


def _ktruss_local(a: np.ndarray, b: np.ndarray, nv: int, k: int, max_rounds: int) -> np.ndarray:
    alive = np.ones(len(a), dtype=bool)
    for _ in range(max_rounds):
        sup = _supports_local(a[alive], b[alive], nv)
        new = sup >= (k - 2)
        if new.all():
            break
        idx = np.flatnonzero(alive)
        alive[idx[~new]] = False
    return alive


def ktruss(
    edges: "ray.data.Dataset",
    k: int = 4,
    local_threshold: int = 400_000,
    max_rounds: int = 200,
) -> "ray.data.Dataset":
    """Dataset(a, b) — the canonical edges of the k-truss of the
    undirected simple graph induced by `edges`. Exact fixpoint."""
    try:
        hint = edges.count()
    except Exception:
        hint = None
    e = _canonical_edges(edges.select_columns(["src", "dst"]), approx_rows=hint).materialize()
    ne = e.count()

    @ray.remote
    def _block_max(t) -> int:
        if t.num_rows == 0:
            return -1
        return int(
            max(
                t["a"].to_numpy(zero_copy_only=False).max(),
                t["b"].to_numpy(zero_copy_only=False).max(),
            )
        )

    if ne == 0:
        return ray.data.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        )

    if ne <= local_threshold:
        t = collect_table(e)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        nv = int(max(a.max(), b.max())) + 1
        alive = _ktruss_local(a, b, nv, k, max_rounds)
        order = np.lexsort((b[alive], a[alive]))
        return ray.data.from_arrow(
            pa.table({"a": pa.array(a[alive][order]), "b": pa.array(b[alive][order])})
        )

    maxes = ray.get([_block_max.remote(r) for r in e.to_arrow_refs()])
    nv = (max(maxes) if maxes else 0) + 1
    from ugfraud_ray.stages.graph_build import dense_degrees

    alive = e
    n_alive = ne
    from ugfraud_ray.functions.bucketing import n_coarse_buckets

    for _ in range(max_rounds):
        deg = dense_degrees(alive, "a", nv) + dense_degrees(alive, "b", nv)
        deg_ref = ray.put(deg)
        nb = np.uint64(n_coarse_buckets(n_alive))

        def orient(t: pa.Table, _dr=deg_ref) -> pa.Table:
            dg = ray.get(_dr)
            x = t["a"].to_numpy(zero_copy_only=False)
            y = t["b"].to_numpy(zero_copy_only=False)
            a_first = (dg[x] < dg[y]) | ((dg[x] == dg[y]) & (x < y))
            return pa.table(
                {
                    "u": pa.array(np.where(a_first, x, y)),
                    "w": pa.array(np.where(a_first, y, x)),
                }
            )

        def bucket_u(t: pa.Table) -> pa.Table:
            h = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = h * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(29)
            return t.append_column("_cb", pa.array((h % nb).astype(np.int64)))

        def emit_wedges(g) -> pa.Table:
            u = g["u"].to_numpy().astype(np.int64)
            w = g["w"].to_numpy().astype(np.int64)
            order = np.lexsort((w, u))
            u, w = u[order], w[order]
            starts = (
                np.flatnonzero(np.concatenate([[True], np.diff(u) != 0]))
                if len(u)
                else np.zeros(0, np.int64)
            )
            ends = np.append(starts[1:], len(u))
            us, xs, ys = [], [], []
            for s, t2 in zip(starts, ends):
                if t2 - s < 2:
                    continue
                grp = w[s:t2]
                i, j = np.triu_indices(t2 - s, k=1)
                xs.append(grp[i])
                ys.append(grp[j])
                us.append(np.full(len(i), u[s], dtype=np.int64))
            if not xs:
                return pa.table(
                    {"x": pa.array([], pa.int64()), "y": pa.array([], pa.int64()),
                     "u": pa.array([], pa.int64()), "kind": pa.array([], pa.int8())}
                )
            n = sum(len(v) for v in xs)
            return pa.table(
                {
                    "x": pa.array(np.concatenate(xs)),
                    "y": pa.array(np.concatenate(ys)),
                    "u": pa.array(np.concatenate(us)),
                    "kind": pa.array(np.zeros(n, np.int8)),
                }
            )

        def edge_rows(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {"x": t["a"], "y": t["b"], "u": pa.array(np.zeros(n, np.int64)),
                 "kind": pa.array(np.ones(n, np.int8))}
            )

        def bucket_xy(t: pa.Table) -> pa.Table:
            x = t["x"].to_numpy(zero_copy_only=False).astype(np.uint64)
            y = t["y"].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = x * np.uint64(0x9E3779B97F4A7C15) ^ y * np.uint64(0xC2B2AE3D27D4EB4F)
            h ^= h >> np.uint64(29)
            return t.append_column("_cb2", pa.array((h % nb).astype(np.int64)))

        def close_credits(g) -> pa.Table:
            """Sparse canonical-edge credits from closed wedges."""
            x = g["x"].to_numpy().astype(np.int64)
            y = g["y"].to_numpy().astype(np.int64)
            u = g["u"].to_numpy().astype(np.int64)
            kind = g["kind"].to_numpy().astype(np.int64)
            if len(x) == 0:
                return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64())})
            key = x * nv + y
            ek = np.unique(key[kind == 1])
            closed = (kind == 0) & np.isin(key, ek)
            lo = np.concatenate(
                [np.minimum(u[closed], x[closed]), np.minimum(u[closed], y[closed]), x[closed]]
            )
            hi = np.concatenate(
                [np.maximum(u[closed], x[closed]), np.maximum(u[closed], y[closed]), y[closed]]
            )
            ckey = lo * nv + hi
            uk, cnt = np.unique(ckey, return_counts=True)
            return pa.table(
                {
                    "a": pa.array((uk // nv).astype(np.int64)),
                    "b": pa.array((uk % nv).astype(np.int64)),
                    "c": pa.array(cnt.astype(np.int64)),
                }
            )

        wedges = (
            alive.map_batches(orient, batch_format="pyarrow")
            .map_batches(bucket_u, batch_format="pyarrow")
            .groupby("_cb")
            .map_groups(emit_wedges, batch_format="pyarrow")
        )
        credits = (
            wedges.union(alive.map_batches(edge_rows, batch_format="pyarrow"))
            .map_batches(bucket_xy, batch_format="pyarrow")
            .groupby("_cb2")
            .map_groups(close_credits, batch_format="pyarrow")
        )

        # co-bucket credits (kind 0, weight c) with alive edges (kind 1)
        # and keep edges whose summed credit >= k-2
        def tag_credit(t: pa.Table) -> pa.Table:
            return pa.table(
                {"a": t["a"], "b": t["b"], "c": t["c"],
                 "kind": pa.array(np.zeros(t.num_rows, np.int8))}
            )

        def tag_edge(t: pa.Table) -> pa.Table:
            return pa.table(
                {"a": t["a"], "b": t["b"],
                 "c": pa.array(np.zeros(t.num_rows, np.int64)),
                 "kind": pa.array(np.ones(t.num_rows, np.int8))}
            )

        def bucket_ab(t: pa.Table) -> pa.Table:
            x = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
            y = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = x * np.uint64(0xC2B2AE3D27D4EB4F) ^ y * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(31)
            return t.append_column("_cb3", pa.array((h % nb).astype(np.int64)))

        thr = k - 2

        def survivors(g) -> pa.Table:
            a = g["a"].to_numpy().astype(np.int64)
            b = g["b"].to_numpy().astype(np.int64)
            c = g["c"].to_numpy().astype(np.int64)
            kind = g["kind"].to_numpy().astype(np.int64)
            order = np.lexsort((b, a))
            a, b, c, kind = a[order], b[order], c[order], kind[order]
            starts = (
                np.flatnonzero(np.concatenate([[True], (np.diff(a) != 0) | (np.diff(b) != 0)]))
                if len(a)
                else np.zeros(0, np.int64)
            )
            tot = np.add.reduceat(c, starts) if len(a) else np.zeros(0, np.int64)
            is_edge = np.maximum.reduceat(kind, starts) if len(a) else np.zeros(0, np.int64)
            keep = (is_edge == 1) & (tot >= thr)
            return pa.table({"a": pa.array(a[starts][keep]), "b": pa.array(b[starts][keep])})

        alive = (
            credits.map_batches(tag_credit, batch_format="pyarrow")
            .union(alive.map_batches(tag_edge, batch_format="pyarrow"))
            .map_batches(bucket_ab, batch_format="pyarrow")
            .groupby("_cb3")
            .map_groups(survivors, batch_format="pyarrow")
            .materialize()
        )
        n_new = alive.count()
        if n_new == n_alive:
            break
        n_alive = n_new
    return alive.sort(["a", "b"])
