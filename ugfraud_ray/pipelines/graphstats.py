"""Whole-graph structural statistics: degree histogram and reciprocity.

Reference analog: fBox groups users BY DEGREE for its per-degree
percentile thresholds (/root/reference Detector/fBox.py:72-98, SURVEY
A4) — the degree histogram is that grouping's size readout, and the
standard power-law check for a web crawl. Reciprocity (fraction of
directed edges whose reverse also exists) is the classic link-spam
signal for link farms; no reference analog (the review graph is
bipartite-undirected).

Both are one-pass shapes: degrees come from dense bincount partials
(`stages.graph_build.dense_degrees`, the engine's A1 path), the
histogram is a second bincount over the degree vector; reciprocity
hash-buckets canonical (lo, hi) pairs into 64 coarse buckets (ONE
shuffle) and counts pairs present in both orientations.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table


def degree_histogram(
    edges: "ray.data.Dataset", n_vertices: int, kind: str = "total"
) -> "ray.data.Dataset":
    """Dataset(degree:int64, n_vertices:int64) over the DIRECTED edge
    table (multi-edges count). kind: 'in' | 'out' | 'total'. Degree-0
    vertices are excluded (matches the SQL grouped readout)."""
    from ugfraud_ray.stages.graph_build import dense_degrees

    e = edges.select_columns(["src", "dst"]).materialize()
    deg = np.zeros(n_vertices, dtype=np.int64)
    if kind in ("out", "total"):
        deg += dense_degrees(e, "src", n_vertices)
    if kind in ("in", "total"):
        deg += dense_degrees(e, "dst", n_vertices)
    hist = np.bincount(deg[deg > 0])
    d = np.flatnonzero(hist)
    return ray.data.from_arrow(
        pa.table(
            {
                "degree": pa.array(d.astype(np.int64)),
                "n_vertices": pa.array(hist[d].astype(np.int64)),
            }
        )
    )


def reciprocity(
    edges: "ray.data.Dataset", local_threshold: int = 2_000_000
) -> "ray.data.Dataset":
    """One row: (n_edges, n_reciprocal, n_mutual_pairs) on the directed
    simple graph (self-loops dropped, duplicate directed edges
    collapsed). n_reciprocal counts directed edges whose reverse exists;
    n_mutual_pairs = n_reciprocal / 2."""

    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d
        s, d = s[m], d[m]
        return pa.table(
            {
                "a": pa.array(np.minimum(s, d)),
                "b": pa.array(np.maximum(s, d)),
                "fwd": pa.array((s < d).astype(np.int8)),
            }
        )

    def kernel(a: np.ndarray, b: np.ndarray, fwd: np.ndarray) -> tuple[int, int]:
        """(n_directed_edges, n_mutual_pairs) for one bucket; duplicate
        directed edges collapse first."""
        order = np.lexsort((fwd, b, a))
        a, b, fwd = a[order], b[order], fwd[order]
        if len(a) == 0:
            return 0, 0
        uniq = np.concatenate(
            [[True], (np.diff(a) != 0) | (np.diff(b) != 0) | (np.diff(fwd) != 0)]
        )
        a, b, fwd = a[uniq], b[uniq], fwd[uniq]
        n_edges = len(a)
        pair_new = np.concatenate([[True], (np.diff(a) != 0) | (np.diff(b) != 0)])
        starts = np.flatnonzero(pair_new)
        runs = np.diff(np.append(starts, len(a)))
        return n_edges, int((runs == 2).sum())

    ds = edges.select_columns(["src", "dst"]).map_batches(canon, batch_format="pyarrow")
    try:
        n = edges.count()
    except Exception:
        n = None
    if n is not None and n <= local_threshold:
        t = collect_table(ds)
        ne, nm = kernel(
            t["a"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["b"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["fwd"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
    else:
        from ugfraud_ray.functions.bucketing import n_coarse_buckets

        nb = np.uint64(n_coarse_buckets(n))

        def bucketize(t: pa.Table) -> pa.Table:
            x = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
            y = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = x * np.uint64(0x9E3779B97F4A7C15) ^ y * np.uint64(0xC2B2AE3D27D4EB4F)
            h ^= h >> np.uint64(29)
            return t.append_column("_cb", pa.array((h % nb).astype(np.int64)))

        def per_bucket(g) -> pa.Table:
            ne, nm = kernel(
                g["a"].to_numpy().astype(np.int64),
                g["b"].to_numpy().astype(np.int64),
                g["fwd"].to_numpy().astype(np.int64),
            )
            return pa.table({"ne": pa.array([ne], pa.int64()), "nm": pa.array([nm], pa.int64())})

        from ray.data.aggregate import Sum

        agg = (
            ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("_cb")
            .map_groups(per_bucket, batch_format="pyarrow")
            .aggregate(Sum("ne", alias_name="ne"), Sum("nm", alias_name="nm"))
        )
        ne, nm = int(agg["ne"]), int(agg["nm"])
    return ray.data.from_arrow(
        pa.table(
            {
                "n_edges": pa.array([ne], pa.int64()),
                "n_reciprocal": pa.array([2 * nm], pa.int64()),
                "n_mutual_pairs": pa.array([nm], pa.int64()),
            }
        )
    )


def assortativity(
    edges: "ray.data.Dataset", n_vertices: int
) -> tuple[int, int, int, int]:
    """Exact integer moments for the degree assortativity coefficient
    over the canonical undirected simple graph, each edge counted in
    BOTH directions (the networkx convention):

        r = (n·Sxy − Sx²) / (n·Sxx − Sx²)

    with n = 2·|E|, Sx = Σ deg(u), Sxx = Σ deg(u)², Sxy = Σ deg(u)·deg(v)
    over directed stubs. Returns (n, Sx, Sxx, Sxy) as PYTHON ints —
    per-block int64 partials merge driver-side in arbitrary precision
    (deg²·E overflows int64 at web scale), the lineitem_pricing_summary
    pattern. Degrees come from dense bincount partials over the
    canonical pair table; the pair table is scanned once more for the
    cross moment with the degree array broadcast via ray.put.
    """
    from ugfraud_ray.pipelines.kcore import _canonical_undirected
    from ugfraud_ray.stages.graph_build import dense_degrees

    und = _canonical_undirected(edges, None).materialize()
    deg = dense_degrees(und, "src", n_vertices) + dense_degrees(und, "dst", n_vertices)
    deg_ref = ray.put(deg)

    @ray.remote
    def moments_block(t) -> tuple[int, int, int, int]:
        if isinstance(t, pa.Table):
            if t.num_rows == 0:
                return (0, 0, 0, 0)
            a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            if len(t) == 0 or "src" not in getattr(t, "columns", []):
                return (0, 0, 0, 0)
            a = np.asarray(t["src"]).astype(np.int64)
            b = np.asarray(t["dst"]).astype(np.int64)
        d = ray.get(deg_ref)
        dx, dy = d[a], d[b]
        # both stub directions: Sx accumulates dx+dy, Sxx dx²+dy², Sxy 2·dx·dy.
        # chunked int64 partials -> Python-int accumulation so hub-degree
        # squares can't overflow inside a large block
        sx = sxx = sxy = 0
        for i in range(0, len(dx), 1 << 16):
            cx, cy = dx[i : i + (1 << 16)], dy[i : i + (1 << 16)]
            sx += int(cx.sum() + cy.sum())
            sxx += int((cx * cx).sum() + (cy * cy).sum())
            sxy += int(2 * (cx * cy).sum())
        return (2 * len(a), sx, sxx, sxy)

    parts = ray.get([moments_block.remote(bk) for bk in und.to_arrow_refs()])
    n = sum(p[0] for p in parts)
    sx = sum(p[1] for p in parts)
    sxx = sum(p[2] for p in parts)
    sxy = sum(p[3] for p in parts)
    return n, sx, sxx, sxy


def rich_club(
    edges: "ray.data.Dataset",
    ks: tuple[int, ...] = (1, 2, 4, 8, 16, 32),
    local_threshold: int = 2_000_000,
) -> pa.Table:
    """Rich-club coefficients φ(k) = 2·E_k / (N_k·(N_k−1)) over the
    undirected SIMPLE graph: N_k = vertices with degree > k, E_k =
    edges with BOTH endpoints of degree > k — the hub-interconnection
    readout (Zhou & Mondragón 2004; link farms show up as φ(k) ≈ 1 at
    high k). Counts are exact integers, φ is one fixed float expression
    mirrored in SQL. Output (k, n_rich, n_rich_edges, phi) ascending k;
    φ = 0 when N_k < 2.

    ≤ local_threshold canonical edges: one driver-local pass (the usual
    shuffle-spin-up gate). Above it: dense bincount degree partials
    tree-reduced (stages.graph_build.dense_degrees, the A1 path), the
    (n,) degree array broadcast ONCE via ray.put, and per-block
    min-degree>k counts summed — the edges never land on the driver
    (mirrors assortativity/degree_histogram)."""
    from ugfraud_ray.pipelines.triangles import _canonical_edges

    try:
        hint = edges.count()
    except Exception:
        hint = None
    e = _canonical_edges(edges, approx_rows=hint).materialize()
    karr = np.asarray(ks, dtype=np.int64)
    n_canon = e.count()
    if n_canon <= local_threshold:
        t = collect_table(e)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = int(max(a.max(), b.max())) + 1 if len(a) else 0
        deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
        edge_min = np.minimum(deg[a], deg[b]) if len(a) else np.zeros(0, np.int64)
        n_rich = np.array([(deg > k).sum() for k in karr], dtype=np.int64)
        n_edges = np.array([(edge_min > k).sum() for k in karr], dtype=np.int64)
        return _rich_club_table(karr, n_rich, n_edges)

    from ray.data.aggregate import Max

    from ugfraud_ray.stages.graph_build import dense_degrees

    mx = e.aggregate(Max("a", alias_name="ma"), Max("b", alias_name="mb"))
    n = int(max(mx["ma"], mx["mb"])) + 1
    deg = dense_degrees(e, "a", n) + dense_degrees(e, "b", n)
    deg_ref = ray.put(deg)
    ks_ref = ray.put(karr)

    @ray.remote
    def edge_counts_block(t: pa.Table) -> np.ndarray:
        d = ray.get(deg_ref)
        kk = ray.get(ks_ref)
        if t.num_rows == 0:
            return np.zeros(len(kk), dtype=np.int64)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        em = np.minimum(d[a], d[b])
        return np.array([(em > k).sum() for k in kk], dtype=np.int64)

    parts = ray.get([edge_counts_block.remote(bk) for bk in e.to_arrow_refs()])
    n_edges = np.sum(parts, axis=0).astype(np.int64) if parts else np.zeros(len(karr), np.int64)
    n_rich = np.array([(deg > k).sum() for k in karr], dtype=np.int64)
    return _rich_club_table(karr, n_rich, n_edges)


def _rich_club_table(
    karr: np.ndarray, n_rich: np.ndarray, n_edges: np.ndarray
) -> pa.Table:
    nr = n_rich.astype(np.float64)
    denom = np.where(n_rich > 1, nr * (nr - 1.0), 1.0)
    phi = np.where(n_rich > 1, (2.0 * n_edges.astype(np.float64)) / denom, 0.0)
    return pa.table(
        {
            "k": pa.array(karr),
            "n_rich": pa.array(n_rich),
            "n_rich_edges": pa.array(n_edges),
            "phi": pa.array(phi),
        }
    )


def temporal_degree_snapshots(tagged: "ray.data.Dataset") -> "ray.data.Dataset":
    """Temporal graph snapshots over a (month:int64 months-since-1970,
    src:int64) edge-endpoint stream: per month the edge count, distinct
    active sources, and the max-degree source (ties to the smaller id).
    One (month, src) grouped count collapses the stream to
    active-vertex size, then a per-month integer argmax runs over that
    tiny table. All-integer outputs, exact at any scale; the month key
    is emitted as ISO yyyy-mm."""
    from ray.data.aggregate import Count

    per_user = tagged.groupby(["month", "src"]).aggregate(Count(alias_name="cnt"))

    def per_month(g: pa.Table) -> pa.Table:
        cnt = g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = g["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((src, -cnt))[0]
        m = int(g["month"][0].as_py())
        y, mm = 1970 + m // 12, m % 12 + 1
        return pa.table(
            {
                "month": pa.array([f"{y:04d}-{mm:02d}"], pa.string()),
                "n_edges": pa.array([int(cnt.sum())], pa.int64()),
                "n_users": pa.array([len(src)], pa.int64()),
                "top_user": pa.array([int(src[order])], pa.int64()),
                "top_degree": pa.array([int(cnt[order])], pa.int64()),
            }
        )

    return per_user.groupby("month").map_groups(per_month, batch_format="pyarrow")
