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


def powerlaw_alpha(edges: "ray.data.Dataset", dmin: int = 2) -> pa.Table:
    """Hill maximum-likelihood estimate of the degree-distribution
    power-law exponent over the total-degree tail d >= dmin
    (Clauset-Shalizi-Newman 2009 eq. 3.1 for discrete dmin-anchored
    tails): alpha = 1 + n / sum(ln(d_i / dmin)). The scale-free slope
    is THE summary statistic of a crawl-snapshot web graph.

    One row: (dmin, n_tail, alpha). Fully distributed: per-block
    endpoint bincount partials -> (vid) groupby-sum -> per-block degree
    histogram partials -> (degree) groupby-sum; only the
    distinct-degree histogram (hundreds of rows on any real graph)
    lands on the driver, where the log-sum runs in ascending-degree
    order. Works on vid-numbered edges; degree-0 vertices are
    naturally absent.
    """
    from ray.data.aggregate import Sum

    def endpoint_counts(t: pa.Table) -> pa.Table:
        v = np.concatenate(
            [
                t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                t["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
            ]
        )
        u, c = np.unique(v, return_counts=True)
        return pa.table({"vid": pa.array(u), "c": pa.array(c.astype(np.int64))})

    deg = (
        edges.select_columns(["src", "dst"])
        .map_batches(endpoint_counts, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Sum("c", alias_name="d"))
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(d, return_counts=True)
        return pa.table({"degree": pa.array(u), "c": pa.array(c.astype(np.int64))})

    hist = collect_table(
        deg.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("degree")
        .aggregate(Sum("c", alias_name="c"))
    )
    d = hist["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
    c = hist["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(d)
    d, c = d[order], c[order]
    tail = d >= dmin
    n = int(c[tail].sum())
    slog = float(np.sum(c[tail] * np.log(d[tail] / float(dmin))))
    if slog == 0.0:
        # empty tail or every tail degree == dmin: the Hill MLE is
        # undefined; fail loudly rather than emit inf/NaN silently
        raise ValueError(
            f"powerlaw_alpha: degenerate degree tail (n_tail={n}, all "
            f"degrees == dmin={dmin}); no power-law exponent is defined"
        )
    alpha = 1.0 + n / slog
    return pa.table(
        {
            "dmin": pa.array([int(dmin)], pa.int64()),
            "n_tail": pa.array([n], pa.int64()),
            "alpha": pa.array([round(alpha, 9)], pa.float64()),
        }
    )


def _churn_block(
    src: np.ndarray, dst: np.ndarray, j: np.ndarray, n_months: int
) -> pa.Table:
    """Per-bucket transition counts over one edge-hash bucket (every
    month of an edge lands in the same bucket). Rows are deduped to
    distinct (src, dst, month-index), then consecutive-month membership
    is read off neighbouring rows of the lexsorted stream — no per-edge
    Python loop."""
    order = np.lexsort((j, dst, src))
    src, dst, j = src[order], dst[order], j[order]
    keep = np.ones(len(j), dtype=bool)
    keep[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1]) | (j[1:] != j[:-1])
    src, dst, j = src[keep], dst[keep], j[keep]
    same_prev = np.zeros(len(j), dtype=bool)
    same_prev[1:] = (src[1:] == src[:-1]) & (dst[1:] == dst[:-1]) & (j[1:] == j[:-1] + 1)
    same_next = np.zeros(len(j), dtype=bool)
    same_next[:-1] = same_prev[1:]
    a = np.zeros(n_months, dtype=np.int64)
    r = np.zeros(n_months, dtype=np.int64)
    c = np.zeros(n_months, dtype=np.int64)
    pos = j > 0
    np.add.at(c, j[pos & same_prev], 1)
    np.add.at(a, j[pos & ~same_prev], 1)
    drop = (~same_next) & (j + 1 < n_months)
    np.add.at(r, j[drop] + 1, 1)
    jj = np.arange(n_months, dtype=np.int64)
    return pa.table(
        {"j": pa.array(jj), "a": pa.array(a), "r": pa.array(r), "c": pa.array(c)}
    )


def edge_churn(
    tagged: "ray.data.Dataset",
    month_col: str = "month",
    local_threshold: int = 2_000_000,
    approx_rows: int | None = None,
) -> pa.Table:
    """Snapshot-to-snapshot edge churn of a temporal graph — the
    crawl-delta analytic: for each consecutive pair of snapshot keys
    (integer ``month_col``) report how many DISTINCT edges were added,
    removed, and carried over versus the previous snapshot. Output
    (month, n_added, n_removed, n_common), one row per snapshot after
    the first, months with no change included as zeros.

    Scale shape: per-block distinct (month, src, dst) partials, then
    ONE edge-hash coarse-bucket shuffle so every month of an edge is
    co-located, transition flags read off neighbouring rows of the
    per-bucket lexsorted stream, and a months-sized counter merge.
    The snapshot-key list (<= a few hundred) is the only broadcast.
    Below ``local_threshold`` rows the identical kernel runs
    driver-local.
    """
    from ugfraud_ray.functions.bucketing import n_coarse_buckets, pair_hash_bucket

    # one materialization (three int columns, no text): the month scan,
    # the row count and the distinct/bucket kernel all reuse it instead
    # of re-executing the caller's (possibly join-backed) lineage
    ds = tagged.select_columns([month_col, "src", "dst"]).materialize()

    def extract(t: pa.Table):
        return (
            t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
            t[month_col].to_numpy(zero_copy_only=False).astype(np.int64),
        )

    def month_partial(t: pa.Table) -> pa.Table:
        m = np.unique(t[month_col].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"m": pa.array(m)})

    months = np.unique(
        collect_table(ds.map_batches(month_partial, batch_format="pyarrow"))["m"]
        .to_numpy(zero_copy_only=False)
    )
    n_m = len(months)

    def finish(tab: pa.Table) -> pa.Table:
        js = tab["j"].to_numpy(zero_copy_only=False)
        a = np.zeros(n_m, dtype=np.int64)
        r = np.zeros(n_m, dtype=np.int64)
        c = np.zeros(n_m, dtype=np.int64)
        np.add.at(a, js, tab["a"].to_numpy(zero_copy_only=False))
        np.add.at(r, js, tab["r"].to_numpy(zero_copy_only=False))
        np.add.at(c, js, tab["c"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                month_col: pa.array(months[1:]),
                "n_added": pa.array(a[1:]),
                "n_removed": pa.array(r[1:]),
                "n_common": pa.array(c[1:]),
            }
        )

    n = approx_rows if approx_rows is not None else ds.count()
    if n_m < 2:
        return pa.table(
            {
                month_col: pa.array([], pa.int64()),
                "n_added": pa.array([], pa.int64()),
                "n_removed": pa.array([], pa.int64()),
                "n_common": pa.array([], pa.int64()),
            }
        )
    midx_ref = ray.put(months)

    def distinct_partial(t: pa.Table) -> pa.Table:
        s, d, m = extract(t)
        j = np.searchsorted(ray.get(midx_ref), m)
        key = np.stack([s, d, j], axis=1)
        u = np.unique(key, axis=0)
        return pa.table(
            {
                "src": pa.array(u[:, 0]),
                "dst": pa.array(u[:, 1]),
                "j": pa.array(u[:, 2]),
                "_cb": pa.array(
                    pair_hash_bucket(u[:, 0], u[:, 1], n_coarse_buckets(n))
                ),
            }
        )

    if n <= local_threshold:
        t = collect_table(ds)
        s, d, m = extract(t)
        j = np.searchsorted(months, m)
        return finish(_churn_block(s, d, j, n_m))

    from ray.data.aggregate import Sum

    per_bucket = (
        ds.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(
            lambda g: _churn_block(
                g["src"].to_numpy(zero_copy_only=False),
                g["dst"].to_numpy(zero_copy_only=False),
                g["j"].to_numpy(zero_copy_only=False),
                n_m,
            ),
            batch_format="pyarrow",
        )
        .groupby("j")
        .aggregate(Sum("a", alias_name="a"), Sum("r", alias_name="r"), Sum("c", alias_name="c"))
    )
    return finish(collect_table(per_bucket))


def adjacency_docs(
    edges: "ray.data.Dataset", local_threshold: int = 1_000_000
) -> "ray.data.Dataset":
    """Render each vertex's DISTINCT out-neighbour set as a document:
    (doc_id = src, text = ascending dst ids space-joined) — the input
    shape for structural near-dup over a link graph (mirror-host
    detection: hosts serving the same page set have near-identical
    out-link sets, so text-dedup machinery applies verbatim).

    Scale shape: per-block distinct (src,dst) partials packed into one
    int64 (loud guard at 2^31 per endpoint), ONE src-keyed coarse-bucket
    shuffle, per-bucket lexsorted run assembly (event_paths' shape).
    Reference analog: user_data's {user: [reviews]} grouping
    (/root/reference Utils/helper.py:123-167) rendered as text.
    """
    from ugfraud_ray.functions.bucketing import n_coarse_buckets

    ds = edges.select_columns(["src", "dst"])

    def pack(t: pa.Table) -> np.ndarray:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(s) and (
            s.min() < 0 or d.min() < 0 or s.max() >= 1 << 31 or d.max() >= 1 << 31
        ):
            raise ValueError("adjacency_docs: endpoint ids must fit in 31 bits")
        return (s << np.int64(32)) | d

    def assemble(packed: np.ndarray) -> pa.Table:
        u = np.unique(packed)
        src = (u >> np.int64(32)).astype(np.int64)
        dst = (u & np.int64(0xFFFFFFFF)).astype(np.int64)
        starts = np.flatnonzero(np.concatenate([[True], np.diff(src) != 0]))
        ends = np.append(starts[1:], len(src))
        texts = [
            " ".join(str(x) for x in dst[a:b]) for a, b in zip(starts, ends)
        ]
        return pa.table(
            {
                "doc_id": pa.array(src[starts]),
                "text": pa.array(texts, pa.string()),
            }
        )

    try:
        n = ds.count()
    except Exception:  # pragma: no cover
        n = None
    if n is not None and n <= local_threshold:
        return ray.data.from_arrow(assemble(pack(collect_table(ds))))

    nb = np.uint64(n_coarse_buckets(n))

    def bucketize(t: pa.Table) -> pa.Table:
        p = np.unique(pack(t))
        h = (p >> np.int64(32)).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(29)
        return pa.table(
            {"p": pa.array(p), "_cb": pa.array((h % nb).astype(np.int64))}
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(
            lambda g: assemble(g["p"].to_numpy(zero_copy_only=False).astype(np.int64)),
            batch_format="pyarrow",
        )
    )


def joint_degree_matrix(
    edges: "ray.data.Dataset", approx_edges: int | None = None
) -> "ray.data.Dataset":
    """(src_bucket, dst_bucket, n_edges) — the joint degree distribution
    (degree-mixing matrix) over the canonical undirected simple graph,
    with degrees folded to power-of-two buckets (bit_length, the
    length_histogram convention): the 2-D diagnostic behind the scalar
    assortativity (which web-graph papers report next to it). Each
    undirected edge contributes ONE cell at (min_bucket, max_bucket).

    Scale shape: dense bincount degrees broadcast once (the
    attach_edge_weights pattern), per-block bucket-pair uniqued
    partials bounded by bucket^2, one tiny grouped sum.
    """
    from ray.data.aggregate import Sum

    from ugfraud_ray.pipelines.kcore import _canonical_undirected

    e = _canonical_undirected(edges, approx_edges).materialize()
    n = max(ray.get([_bmax.remote(r) for r in e.to_arrow_refs()]) or [0]) + 1
    from ugfraud_ray.stages.graph_build import dense_degrees

    deg = dense_degrees(e, "src", n) + dense_degrees(e, "dst", n)
    # bit_length buckets: 0 -> 0, else floor(log2(d)) + 1
    buck = np.zeros(n, dtype=np.int64)
    nz = deg > 0
    buck[nz] = np.floor(np.log2(deg[nz])).astype(np.int64) + 1
    ref = ray.put(buck)

    def partial(t: pa.Table) -> pa.Table:
        bk = ray.get(ref)
        a = bk[t["src"].to_numpy(zero_copy_only=False).astype(np.int64)]
        b = bk[t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        pk = lo * np.int64(64) + hi
        u, c = np.unique(pk, return_counts=True)
        return pa.table(
            {
                "src_bucket": pa.array(u // 64),
                "dst_bucket": pa.array(u % 64),
                "n_edges": pa.array(c.astype(np.int64)),
            }
        )

    return (
        e.map_batches(partial, batch_format="pyarrow")
        .groupby(["src_bucket", "dst_bucket"])
        .aggregate(Sum("n_edges", alias_name="n_edges"))
    )


@ray.remote
def _bmax(t: pa.Table) -> int:
    a = t["src"].to_numpy(zero_copy_only=False)
    b = t["dst"].to_numpy(zero_copy_only=False)
    return int(max(a.max(initial=0), b.max(initial=0)))


def edge_hygiene(edges: "ray.data.Dataset") -> pa.Table:
    """(n_raw, n_self_loops, n_directed_distinct, n_undirected_distinct,
    n_reciprocal_pairs) — the graph-hygiene report run before any
    kernel: how much of the raw edge stream is self-loops, duplicate
    multi-edges, or reciprocal pairs (what dedup_pairs/symmetrize will
    collapse). Raw/self counts are streaming integer partials; the
    distinct counts ride the engine's bucketed pair dedup (nothing
    edge-scale lands on the driver)."""
    from ray.data.aggregate import Sum

    from ugfraud_ray.functions.collect import collect_table
    from ugfraud_ray.stages.graph_build import dedup_pairs

    e = edges.select_columns(["src", "dst"]).materialize()

    def counts(t: pa.Table) -> pa.Table:
        sv = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dv = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n_raw": pa.array([len(sv)], pa.int64()),
                "n_self": pa.array([int((sv == dv).sum())], pa.int64()),
            }
        )

    agg = e.map_batches(counts, batch_format="pyarrow").aggregate(
        Sum("n_raw", alias_name="n_raw"), Sum("n_self", alias_name="n_self")
    )
    n_raw, n_self = int(agg["n_raw"]), int(agg["n_self"])

    def nonloop(t: pa.Table) -> pa.Table:
        sv = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dv = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(sv != dv))

    nl = e.map_batches(nonloop, batch_format="pyarrow").materialize()
    hint = nl.count()
    n_directed = dedup_pairs(nl, approx_rows=hint).count()

    def canon(t: pa.Table) -> pa.Table:
        sv = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dv = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"src": pa.array(np.minimum(sv, dv)), "dst": pa.array(np.maximum(sv, dv))}
        )

    n_undirected = dedup_pairs(
        nl.map_batches(canon, batch_format="pyarrow"), approx_rows=hint
    ).count()
    return pa.table(
        {
            "n_raw": pa.array([n_raw], pa.int64()),
            "n_self_loops": pa.array([n_self], pa.int64()),
            "n_directed_distinct": pa.array([n_directed], pa.int64()),
            "n_undirected_distinct": pa.array([n_undirected], pa.int64()),
            "n_reciprocal_pairs": pa.array([n_directed - n_undirected], pa.int64()),
        }
    )
