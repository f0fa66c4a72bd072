"""Per-vertex triangle counts and local clustering coefficient.

The companion readout to the global kernel in `pipelines/triangles.py`
(SURVEY §2.12 — no reference analog; UGFraud's densest structural
signal is FRAUDAR's block density, /root/reference
Detector/Fraudar.py:164-172). cc(v) = 2·T(v) / (d(v)·(d(v)−1)) on the
undirected simple graph, the standard local density feature for
link-graph spam analysis.

Same two-shuffle shape as triangle_count: degree-oriented wedges
(every wedge is generated at its lowest-(degree, vid) corner, bounding
per-vertex pair blowup at hubs), then a coarse-bucket close join — but
each closed wedge credits ALL THREE corners, so close buckets emit
dense per-vertex bincount partials that tree-reduce into one T array.
Small graphs run the identical kernel driver-local (the shuffle pool's
fixed spin-up dominates sub-million-edge inputs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table
from ugfraud_ray.pipelines.triangles import _canonical_edges


def _cc_table(tri: np.ndarray, deg: np.ndarray) -> pa.Table:
    """(vid, triangles, clustering) for vertices with degree >= 1.

    clustering is computed as (2.0*T)/(d*(d-1.0)) — mirrored
    op-for-op by the SQL oracle — and rounded to 9 decimals.
    """
    keep = deg >= 1
    vid = np.flatnonzero(keep).astype(np.int64)
    t = tri[keep].astype(np.int64)
    d = deg[keep].astype(np.int64)
    cc = np.zeros(len(vid), dtype=np.float64)
    m = d >= 2
    cc[m] = (2.0 * t[m]) / (d[m] * (d[m] - 1.0))
    return pa.table(
        {
            "vid": pa.array(vid),
            "triangles": pa.array(t),
            "clustering": pa.array(np.round(cc, 9)),
        }
    )


def _local_counts(a: np.ndarray, b: np.ndarray, nv: int) -> tuple[np.ndarray, np.ndarray]:
    """Driver-local per-vertex triangle counts on canonical (a<b) edges."""
    deg = np.bincount(a, minlength=nv) + np.bincount(b, minlength=nv)
    tri = np.zeros(nv, dtype=np.int64)
    if len(a) == 0:
        return tri, deg
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
        grp = w[s:t2]  # ascending vids within the run
        i, j = np.triu_indices(t2 - s, k=1)
        xs.append(grp[i])
        ys.append(grp[j])
        us.append(np.full(len(i), u[s], dtype=np.int64))
    if not xs:
        return tri, deg
    wu = np.concatenate(us)
    wx = np.concatenate(xs)
    wy = np.concatenate(ys)
    closed = np.isin(wx * nv + wy, a * nv + b)
    for arr in (wu, wx, wy):
        tri += np.bincount(arr[closed], minlength=nv)
    return tri, deg


def local_clustering(
    edges: "ray.data.Dataset", P: int = 8, local_threshold: int = 400_000
) -> "ray.data.Dataset":
    """Dataset(vid, triangles:int64, clustering:double) over the
    undirected simple graph induced by `edges` (self-loops dropped,
    multi-edges collapsed); one row per vertex with degree >= 1."""
    try:
        hint = edges.count()
    except Exception:
        hint = None
    e = _canonical_edges(edges, approx_rows=hint).materialize()
    ne = e.count()
    if ne == 0:
        return ray.data.from_arrow(_cc_table(np.zeros(0, np.int64), np.zeros(0, np.int64)))

    from ugfraud_ray.stages.graph_build import dense_degrees

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

    if ne <= local_threshold:
        t = collect_table(e)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        nv = int(max(a.max(), b.max())) + 1
        tri, deg = _local_counts(a, b, nv)
        return ray.data.from_arrow(_cc_table(tri, deg))

    maxes = ray.get([_block_max.remote(r) for r in e.to_arrow_refs()])
    nv = (max(maxes) if maxes else 0) + 1
    deg = dense_degrees(e, "a", nv) + dense_degrees(e, "b", nv)
    deg_ref = ray.put(deg)

    def orient(t: pa.Table) -> pa.Table:
        dg = ray.get(deg_ref)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        a_first = (dg[a] < dg[b]) | ((dg[a] == dg[b]) & (a < b))
        return pa.table(
            {
                "u": pa.array(np.where(a_first, a, b)),
                "w": pa.array(np.where(a_first, b, a)),
            }
        )

    # wedge emit keyed by oriented source u, CARRYING u (the dedup
    # pair-emitter drops the key, so triangles get their own emitter)
    from ugfraud_ray.functions.bucketing import n_coarse_buckets

    nb = np.uint64(n_coarse_buckets(ne))

    def bucket_u(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = u * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(29)
        return t.append_column("_cb", pa.array((h % nb).astype(np.int64)))

    def emit_wedges(g) -> pa.Table:
        u = g["u"].to_numpy().astype(np.int64)
        w = g["w"].to_numpy().astype(np.int64)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        starts = np.flatnonzero(np.concatenate([[True], np.diff(u) != 0])) if len(u) else np.zeros(0, np.int64)
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

    wedges = (
        e.map_batches(orient, batch_format="pyarrow")
        .map_batches(bucket_u, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(emit_wedges, batch_format="pyarrow")
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

    def close_bucket(g) -> pa.Table:
        """Per-bucket SPARSE (vid, cnt) partial of per-vertex triangle
        credit — traffic stays O(closed wedges), never O(V) per bucket."""
        x = g["x"].to_numpy().astype(np.int64)
        y = g["y"].to_numpy().astype(np.int64)
        u = g["u"].to_numpy().astype(np.int64)
        kind = g["kind"].to_numpy().astype(np.int64)
        if len(x) == 0:
            return pa.table({"cv": pa.array([], pa.int64()), "cn": pa.array([], pa.int64())})
        key = x * nv + y
        ek = np.unique(key[kind == 1])
        closed = (kind == 0) & np.isin(key, ek)
        credit = np.concatenate([u[closed], x[closed], y[closed]])
        vids, cnts = np.unique(credit, return_counts=True)
        return pa.table({"cv": pa.array(vids), "cn": pa.array(cnts.astype(np.int64))})

    parts = (
        wedges.union(e.map_batches(edge_rows, batch_format="pyarrow"))
        .map_batches(bucket_xy, batch_format="pyarrow")
        .groupby("_cb2")
        .map_groups(close_bucket, batch_format="pyarrow")
    )
    # driver holds the O(V) count vector — the same footprint as the
    # broadcast degree table above
    tri = np.zeros(nv, dtype=np.int64)
    for batch in parts.iter_batches(batch_format="pyarrow"):
        np.add.at(
            tri,
            batch["cv"].to_numpy(zero_copy_only=False),
            batch["cn"].to_numpy(zero_copy_only=False),
        )
    return ray.data.from_arrow(_cc_table(tri, deg))
