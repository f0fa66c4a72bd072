"""Exact triangle counting (north-rule kernel; no reference analog —
SURVEY §2.12 "the one genuinely new shuffle-heavy kernel").

Edge-iterator algorithm with degree orientation:

1. undirected-dedup edges, drop self-loops (canonical (lo, hi) form)
2. degree table (A1); orient each edge from the lower-(degree, vid)
   endpoint to the higher one — every vertex's out-adjacency is then
   O(sqrt(m)) even for hubs (the classic skew bound)
3. wedges: groupby(oriented src) -> emit candidate pairs (b, c) for each
   pair of out-neighbors (vectorized np.triu per group)
4. count wedges whose closing edge (b, c) exists: groupby the pair key
   over tagged union of wedges and edges.

Two shuffles total: the wedge groupby and the closing-edge groupby.
Per-group work is numpy; the degree orientation bounds the largest
group's pair blowup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ugfraud_ray.functions.collect import collect_table
import ray.data
from ray.data.aggregate import Count


def _canonical_edges(edges: "ray.data.Dataset", approx_rows: int | None = None) -> "ray.data.Dataset":
    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        m = s != d
        s, d = s[m], d[m]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        return pa.table({"a": pa.array(lo), "b": pa.array(hi)})

    e = edges.map_batches(canon, batch_format="pyarrow")
    from ugfraud_ray.stages.graph_build import dedup_pairs

    return dedup_pairs(e, a="a", b="b", approx_rows=approx_rows)


def triangle_count(
    edges: "ray.data.Dataset", P: int = 8, local_threshold: int = 400_000
) -> int:
    """Exact global triangle count of the undirected simple graph.

    Graphs with ≤ local_threshold deduped edges run the identical
    degree-oriented wedge+close computation driver-local in numpy — the
    three shuffle stages cost seconds of fixed pool spin-up each, which
    dwarfs small graphs. The distributed path is unchanged.
    """
    try:
        hint = edges.count()  # free on materialized / parquet-read inputs
    except Exception:
        hint = None
    e = _canonical_edges(edges, approx_rows=hint).materialize()
    ne = e.count()
    if ne <= local_threshold:
        t = collect_table(e)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        if ne == 0:
            return 0
        nv = int(max(a.max(), b.max())) + 1
        deg = np.bincount(a, minlength=nv) + np.bincount(b, minlength=nv)
        a_first = (deg[a] < deg[b]) | ((deg[a] == deg[b]) & (a < b))
        u = np.where(a_first, a, b)
        w = np.where(a_first, b, a)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        starts = np.flatnonzero(np.concatenate([[True], np.diff(u) != 0]))
        ends = np.append(starts[1:], len(u))
        xs, ys = [], []
        for s, t2 in zip(starts, ends):
            if t2 - s < 2:
                continue
            grp = w[s:t2]
            i, j = np.triu_indices(t2 - s, k=1)
            xs.append(grp[i])
            ys.append(grp[j])
        if not xs:
            return 0
        wk = np.concatenate(xs) * nv + np.concatenate(ys)
        ek = a * nv + b  # canonical a<b keys, matches wedge (x<y) keys
        return int(np.isin(wk, ek).sum())

    # coalesce the (small-side) dedup output before the two all-to-alls
    # below — upstream map_groups emits hundreds of sub-MB blocks at
    # sf~1 and the sort shuffle's per-block overhead dominates
    from ugfraud_ray.stages.graph_build import right_size_blocks

    e = right_size_blocks(e, ne).materialize() if ne <= 50_000_000 else e

    # degree of each endpoint (on the deduped simple graph) via dense
    # bincount partials over the materialized blocks — raw ray tasks, no
    # new Dataset execution (a groupby-Count here spins up the hash
    # shuffle pool and costs ~8 s of fixed overhead for 15k groups)
    from ugfraud_ray.stages.graph_build import dense_degrees

    @ray.remote
    def _block_max(t) -> int:
        if hasattr(t, "num_rows"):
            if t.num_rows == 0:
                return -1
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
        else:
            if len(t) == 0:
                return -1
            a = np.asarray(t["a"])
            b = np.asarray(t["b"])
        return int(max(a.max(), b.max()))

    maxes = ray.get([_block_max.remote(r) for r in e.to_arrow_refs()])
    n_vert = (max(maxes) if maxes else 0) + 1
    dense = dense_degrees(e, "a", n_vert) + dense_degrees(e, "b", n_vert)
    deg_ref = ray.put(dense)

    def orient(t: pa.Table) -> pa.Table:
        dg = ray.get(deg_ref)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        da = dg[a]
        db = dg[b]
        # orient from lower (deg, vid) to higher
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        return pa.table({"u": pa.array(src), "w": pa.array(dst)})

    oriented = e.map_batches(orient, batch_format="pyarrow")

    # wedges = all out-neighbor pairs sharing an oriented source: the
    # shared coarse-bucket pair emitter (one small-group shuffle +
    # vectorized run loops) instead of one Python group per vertex
    from ugfraud_ray.pipelines.dedup import _bucketed_pair_emit
    from ugfraud_ray.functions.bucketing import n_coarse_buckets

    nb_w = n_coarse_buckets(ne)
    wedge_ds = _bucketed_pair_emit(oriented, ["u"], "w", n_buckets=nb_w).map_batches(
        lambda t: pa.table(
            {
                "x": t["id_a"],
                "y": t["id_b"],
                "kind": pa.array(np.zeros(t.num_rows, np.int8)),
            }
        ),
        batch_format="pyarrow",
    )

    def edge_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {"x": t["a"], "y": t["b"], "kind": pa.array(np.ones(n, np.int8))}
        )

    tagged_edges = e.map_batches(edge_rows, batch_format="pyarrow")

    # per (x,y): triangles = Σ wedge rows whose pair also appears as an
    # edge row. A per-pair hash aggregate would build millions of
    # groups; instead hash (x,y) into cluster/data-proportional coarse
    # buckets (one shuffle) and count per bucket with lexsort runs +
    # reduceat — vectorized.
    from ray.data.aggregate import Sum

    nb_c = np.uint64(nb_w)

    def bucketize(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.uint64)
        y = t["y"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = x * np.uint64(0x9E3779B97F4A7C15) ^ y * np.uint64(0xC2B2AE3D27D4EB4F)
        h ^= h >> np.uint64(29)
        return t.append_column("_cb", pa.array((h % nb_c).astype(np.int64)))

    def count_bucket(g) -> pa.Table:
        x = g["x"].to_numpy().astype(np.int64)
        y = g["y"].to_numpy().astype(np.int64)
        kind = g["kind"].to_numpy().astype(np.int64)
        order = np.lexsort((y, x))
        x, y, kind = x[order], y[order], kind[order]
        if len(x):
            starts = np.flatnonzero(
                np.concatenate([[True], (np.diff(x) != 0) | (np.diff(y) != 0)])
            )
            n_wedges = np.add.reduceat((kind == 0).astype(np.int64), starts)
            has_edge = np.maximum.reduceat(kind, starts)
            tri = int(n_wedges[has_edge == 1].sum())
        else:
            tri = 0
        return pa.table({"t": pa.array([tri], pa.int64())})

    tagged = wedge_ds.union(tagged_edges).map_batches(bucketize, batch_format="pyarrow")
    total = (
        tagged.groupby("_cb")
        .map_groups(count_bucket, batch_format="pyarrow")
        .aggregate(Sum("t", alias_name="total"))
    )
    return int(total["total"])


def transitivity(
    edges: "ray.data.Dataset", local_threshold: int = 400_000
) -> pa.Table:
    """Global clustering coefficient (transitivity) of the undirected
    simple graph: 3·triangles / wedges, wedges = Σ_v C(deg(v), 2).

    Triangles reuse ``triangle_count`` (identical canonicalization);
    wedge counts are EXACT integers — dense bincount degrees, per-chunk
    int64 d·(d−1)/2 partials merged as Python ints (overflow-immune, the
    `graphstats.assortativity` pattern) — and the float readout is the
    single fixed expression (3.0·t)/w mirrored in SQL. Single row
    (n_triangles, n_wedges, transitivity)."""
    tri = triangle_count(edges)
    try:
        hint = edges.count()
    except Exception:
        hint = None
    e = _canonical_edges(edges, approx_rows=hint).materialize()
    ne = e.count()
    if ne == 0:
        return pa.table(
            {
                "n_triangles": pa.array([0], pa.int64()),
                "n_wedges": pa.array([0], pa.int64()),
                "transitivity": pa.array([0.0]),
            }
        )
    if ne <= local_threshold:
        t = collect_table(e)
        ab = np.concatenate(
            [
                t["a"].to_numpy(zero_copy_only=False).astype(np.int64),
                t["b"].to_numpy(zero_copy_only=False).astype(np.int64),
            ]
        )
        deg = np.bincount(ab)
    else:
        from ugfraud_ray.stages.graph_build import dense_degrees

        n = int(
            max(e.max("a"), e.max("b"))
        ) + 1
        deg = dense_degrees(e, "a", n) + dense_degrees(e, "b", n)
    wedges = 0
    for chunk in np.array_split(deg[deg > 1].astype(np.int64), max(1, len(deg) // 1_000_000 + 1)):
        wedges += int((chunk * (chunk - 1) // 2).sum())
    tv = (3.0 * float(tri)) / float(wedges) if wedges else 0.0
    return pa.table(
        {
            "n_triangles": pa.array([tri], pa.int64()),
            "n_wedges": pa.array([wedges], pa.int64()),
            "transitivity": pa.array([tv]),
        }
    )


def triangles_per_vertex(
    edges: "ray.data.Dataset", local_threshold: int = 400_000
) -> "ray.data.Dataset":
    """Per-vertex triangle participation: Dataset(id, triangles) for
    every vertex in >= 1 triangle (zero-participation vertices emit
    nothing — mirrors the SQL enumeration oracle).

    Same degree-oriented wedge+close plan as ``triangle_count``, with
    the wedge source u carried so each closed wedge credits all three
    corners. Distributed shape: THREE coarse-bucket shuffles (wedge
    groupby, closing-pair groupby, id-range readout groupby), every
    per-bucket kernel a lexsort/run-reduce — no per-vertex hash
    aggregate anywhere. Below the gate the identical computation runs
    driver-local (shuffle-pool spin-up dominates small graphs).
    """
    try:
        hint = edges.count()
    except Exception:
        hint = None
    e = _canonical_edges(edges, approx_rows=hint).materialize()
    ne = e.count()

    if ne <= local_threshold:
        t = collect_table(e)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        if ne == 0:
            return ray.data.from_arrow(
                pa.table(
                    {"id": pa.array([], pa.int64()), "triangles": pa.array([], pa.int64())}
                )
            )
        nv = int(max(a.max(), b.max())) + 1
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
            us.append(np.full(len(i), u[s], dtype=np.int64))
            xs.append(grp[i])
            ys.append(grp[j])
        cnt = np.zeros(nv, dtype=np.int64)
        if xs:
            wu = np.concatenate(us)
            wx = np.concatenate(xs)
            wy = np.concatenate(ys)
            closed = np.isin(wx * nv + wy, a * nv + b)
            for arr in (wu[closed], wx[closed], wy[closed]):
                np.add.at(cnt, arr, 1)
        ids = np.flatnonzero(cnt)
        return ray.data.from_arrow(
            pa.table({"id": pa.array(ids), "triangles": pa.array(cnt[ids])})
        )

    # ---- distributed path ----
    from ugfraud_ray.functions.bucketing import n_coarse_buckets
    from ugfraud_ray.stages.graph_build import dense_degrees, right_size_blocks

    if ne <= 50_000_000:
        e = right_size_blocks(e, ne).materialize()

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

    maxes = ray.get([_block_max.remote(r) for r in e.to_arrow_refs()])
    n_vert = (max(maxes) if maxes else 0) + 1
    dense = dense_degrees(e, "a", n_vert) + dense_degrees(e, "b", n_vert)
    deg_ref = ray.put(dense)
    nb = np.uint64(n_coarse_buckets(ne))

    def orient_bucket(t: pa.Table) -> pa.Table:
        dg = ray.get(deg_ref)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        a_first = (dg[a] < dg[b]) | ((dg[a] == dg[b]) & (a < b))
        src = np.where(a_first, a, b).astype(np.int64)
        dst = np.where(a_first, b, a).astype(np.int64)
        h = src.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(29)
        return pa.table(
            {
                "u": pa.array(src),
                "w": pa.array(dst),
                "_cb": pa.array((h % nb).astype(np.int64)),
            }
        )

    def emit_wedges(g: pa.Table) -> pa.Table:
        u = g["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = g["w"].to_numpy(zero_copy_only=False).astype(np.int64)
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
            us.append(np.full(len(i), u[s], dtype=np.int64))
            xs.append(grp[i])
            ys.append(grp[j])
        if not xs:
            return pa.table(
                {
                    "x": pa.array([], pa.int64()),
                    "y": pa.array([], pa.int64()),
                    "u": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.int8()),
                }
            )
        return pa.table(
            {
                "x": pa.array(np.concatenate(xs)),
                "y": pa.array(np.concatenate(ys)),
                "u": pa.array(np.concatenate(us)),
                "kind": pa.array(np.zeros(sum(len(v) for v in xs), np.int8)),
            }
        )

    wedges = (
        e.map_batches(orient_bucket, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(emit_wedges, batch_format="pyarrow")
    )

    def edge_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "x": t["a"],
                "y": t["b"],
                "u": pa.array(np.full(n, -1, dtype=np.int64)),
                "kind": pa.array(np.ones(n, np.int8)),
            }
        )

    tagged = wedges.union(e.map_batches(edge_rows, batch_format="pyarrow"))

    def bucket_xy(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.uint64)
        y = t["y"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = x * np.uint64(0x9E3779B97F4A7C15) ^ y * np.uint64(0xC2B2AE3D27D4EB4F)
        h ^= h >> np.uint64(29)
        return t.append_column("_cb", pa.array((h % nb).astype(np.int64)))

    def close_bucket(g: pa.Table) -> pa.Table:
        x = g["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = g["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = g["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        kind = g["kind"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((y, x))
        x, y, u, kind = x[order], y[order], u[order], kind[order]
        if not len(x):
            return pa.table(
                {"id": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        starts = np.flatnonzero(
            np.concatenate([[True], (np.diff(x) != 0) | (np.diff(y) != 0)])
        )
        run_id = np.cumsum(np.concatenate([[0], (np.diff(x) != 0) | (np.diff(y) != 0)]))
        has_edge = np.zeros(len(starts), dtype=bool)
        np.maximum.at(has_edge, run_id, kind == 1)
        closed = (kind == 0) & has_edge[run_id]
        ids = np.concatenate([u[closed], x[closed], y[closed]])
        uq, cts = np.unique(ids, return_counts=True)
        return pa.table(
            {"id": pa.array(uq.astype(np.int64)), "c": pa.array(cts.astype(np.int64))}
        )

    partials = (
        tagged.map_batches(bucket_xy, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(close_bucket, batch_format="pyarrow")
    )

    # readout: id-range buckets (order-free exact sums, no per-id hash
    # aggregate); partial rows are bounded by 3x closed wedges already
    # pre-uniqued per bucket
    step = max(1, (n_vert + int(nb) - 1) // int(nb))

    def bucket_id(t: pa.Table) -> pa.Table:
        i = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_rb", pa.array(i // step))

    def sum_bucket(g: pa.Table) -> pa.Table:
        i = g["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        uq, inv = np.unique(i, return_inverse=True)
        s = np.zeros(len(uq), dtype=np.int64)
        np.add.at(s, inv, c)
        return pa.table({"id": pa.array(uq), "triangles": pa.array(s)})

    return (
        partials.map_batches(bucket_id, batch_format="pyarrow")
        .groupby("_rb")
        .map_groups(sum_bucket, batch_format="pyarrow")
    )


def local_clustering(
    edges: "ray.data.Dataset", local_threshold: int = 400_000
) -> "ray.data.Dataset":
    """(id, degree, triangles, cc) — per-vertex local clustering
    coefficient cc = 2*tri / (d*(d-1)) over the canonical simple
    undirected graph, for every vertex with degree >= 2 (d < 2 has no
    defined coefficient and is excluded on both sides). The per-vertex
    sibling of ``transitivity``, nesting the verified
    ``triangles_per_vertex`` chain; the degree is the DISTINCT-neighbor
    count on the same canonical edge set the triangles use.

    Combine is one vid-bucketed union of the (sparse) triangle table
    and the degree table — spam_mass's no-driver-array idiom; cc is ONE
    float division rounded to the pinned 1e-9 grid (identical IEEE
    chain to the SQL CAST/ROUND readout).
    """
    from ray.data.aggregate import Sum

    from ugfraud_ray.functions.bucketing import bucket_by_int_col, n_coarse_buckets

    try:
        hint = edges.count()
    except Exception:  # pragma: no cover
        hint = None
    e = _canonical_edges(edges, approx_rows=hint).materialize()

    def endpoint_rows(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(np.concatenate([a, b]), return_counts=True)
        return pa.table(
            {
                "id": pa.array(u),
                "degree": pa.array(c.astype(np.int64)),
                "triangles": pa.array(np.zeros(len(u), dtype=np.int64)),
            }
        )

    deg_rows = e.map_batches(endpoint_rows, batch_format="pyarrow")

    def tri_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": t["id"],
                "degree": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "triangles": t["triangles"],
            }
        )

    tri = triangles_per_vertex(edges, local_threshold=local_threshold).map_batches(
        tri_rows, batch_format="pyarrow"
    )

    bucketize = bucket_by_int_col("id", n_coarse_buckets(hint))

    def combine(g: pa.Table) -> pa.Table:
        v = g["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = g["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
        tr = g["triangles"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(v, kind="stable")
        v, d, tr = v[order], d[order], tr[order]
        starts = np.flatnonzero(np.concatenate([[True], v[1:] != v[:-1]]))
        dd = np.add.reduceat(d, starts)
        tt = np.add.reduceat(tr, starts)
        vv = v[starts]
        keep = dd >= 2
        vv, dd, tt = vv[keep], dd[keep], tt[keep]
        cc = np.floor(
            2.0 * tt.astype(np.float64) / (dd.astype(np.float64) * (dd - 1.0))
            * 1e9 + 0.5
        ) / 1e9
        return pa.table(
            {
                "id": pa.array(vv),
                "degree": pa.array(dd),
                "triangles": pa.array(tt),
                "cc": pa.array(cc),
            }
        )

    return (
        deg_rows.union(tri)
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(combine, batch_format="pyarrow")
    )
