"""Link-prediction scores: common neighbors + Adamic–Adar.

For every non-adjacent unordered pair (u, v) of the undirected simple
graph, score the likelihood of a future edge:

    cn(u,v) = |N(u) ∩ N(v)|
    aa(u,v) = Σ_{w ∈ N(u) ∩ N(v)} 1 / ln(deg(w))

(the FRAUDAR/fBox "shared-neighbor suspiciousness" shape — reference
Detector/Fraudar.py scores blocks by exactly this co-neighborhood
density — generalized to the standard LP feature pair.)

Shape and scale plan: this is the wedge expansion from
`pipelines/triangles.py` — each common neighbor w emits its neighbor
pairs, so a hub of degree d contributes C(d,2) pairs. The standard
mitigation (GraphFrames, GBBS) is a degree cap: vertices with
deg > max_degree are skipped as common neighbors (they carry almost no
Adamic–Adar weight anyway: 1/ln(d) → 0). The cap is part of the
operator's spec and is replayed verbatim by the SQL oracle.

Distributed path = one coarse-bucket shuffle (pairs hash to 64
buckets), vectorized lexsort-run aggregation per bucket, per-bucket
top-N prune (each pair lives in exactly one bucket, so pruning before
the global top-N merge is lossless). Small inputs run the identical
numpy kernel driver-local (every Ray shuffle carries seconds of fixed
pool spin-up).

Deterministic output: top-N ordered by (cn DESC, u ASC, v ASC) — the
float aa never participates in ordering, so the cut is stable across
block orders and float summation orders.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table
from ugfraud_ray.pipelines.triangles import _canonical_edges


def _score_runs(u, v, kind, wgt, top_n):
    """Aggregate tagged pair rows (kind 0 = wedge w/ weight, 1 = edge);
    returns the (cn desc, u, v) top-N among non-edge pairs as arrays."""
    order = np.lexsort((v, u))
    u, v, kind, wgt = u[order], v[order], kind[order], wgt[order]
    if not len(u):
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, np.zeros(0, dtype=np.float64)
    starts = np.flatnonzero(
        np.concatenate([[True], (np.diff(u) != 0) | (np.diff(v) != 0)])
    )
    cn = np.add.reduceat((kind == 0).astype(np.int64), starts)
    aa = np.add.reduceat(np.where(kind == 0, wgt, 0.0), starts)
    has_edge = np.maximum.reduceat(kind, starts)
    keep = has_edge == 0
    ru, rv, cn, aa = u[starts][keep], v[starts][keep], cn[keep], aa[keep]
    pick = np.lexsort((rv, ru, -cn))[:top_n]
    return ru[pick], rv[pick], cn[pick], aa[pick]


def link_prediction_scores(
    edges: "ray.data.Dataset",
    n_vertices: int,
    top_n: int = 100,
    max_degree: int = 10_000,
    approx_rows: int | None = None,
    local_threshold: int = 400_000,
    n_buckets: int | None = None,
    center_mask: "np.ndarray | None" = None,
) -> pa.Table:
    """Top-N (u, v, cn, aa) non-adjacent pairs of the undirected graph.

    center_mask: optional (n_vertices,) bool — only these vertices act
    as wedge CENTERS (common neighbors). Bipartite projections restrict
    centers to one side so the pairs come from the other."""
    from ugfraud_ray.stages.graph_build import dense_degrees
    from ugfraud_ray.functions.bucketing import n_coarse_buckets

    e = _canonical_edges(edges, approx_rows=approx_rows).materialize()
    ne = e.count()
    if n_buckets is None:
        # cap at 4096: the global merge collects n_buckets × top_n rows
        # onto the driver, so the bucket count must stay merge-small
        n_buckets = min(n_coarse_buckets(ne), 4096)
    if ne == 0:
        return pa.table(
            {
                "u": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
                "cn": pa.array([], pa.int64()),
                "aa": pa.array([], pa.float64()),
            }
        )
    deg = dense_degrees(e, "a", n_vertices) + dense_degrees(e, "b", n_vertices)
    with np.errstate(divide="ignore"):
        wvec = np.where(deg >= 2, 1.0 / np.log(np.maximum(deg, 2)), 0.0)
    ok = (deg >= 2) & (deg <= max_degree)  # eligible common neighbors
    if center_mask is not None:
        ok &= np.asarray(center_mask, dtype=bool)

    if ne <= local_threshold:
        t = collect_table(e)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        # adjacency (w, nbr), w eligible
        w = np.concatenate([a, b])
        nbr = np.concatenate([b, a])
        m = ok[w]
        w, nbr = w[m], nbr[m]
        order = np.lexsort((nbr, w))
        w, nbr = w[order], nbr[order]
        starts = np.flatnonzero(np.concatenate([[True], np.diff(w) != 0]))
        ends = np.append(starts[1:], len(w))
        pu, pv, pw = [], [], []
        for s, t2 in zip(starts, ends):
            if t2 - s < 2:
                continue
            grp = nbr[s:t2]
            i, j = np.triu_indices(t2 - s, k=1)
            pu.append(grp[i])
            pv.append(grp[j])
            pw.append(np.full(len(i), w[s], dtype=np.int64))
        if not pu:
            return pa.table(
                {
                    "u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    "cn": pa.array([], pa.int64()),
                    "aa": pa.array([], pa.float64()),
                }
            )
        pu = np.concatenate(pu)
        pv = np.concatenate(pv)
        pw = np.concatenate(pw)
        u_all = np.concatenate([pu, a])
        v_all = np.concatenate([pv, b])
        kind = np.concatenate(
            [np.zeros(len(pu), np.int8), np.ones(len(a), np.int8)]
        )
        wgt = np.concatenate([wvec[pw], np.zeros(len(a))])
        ru, rv, cn, aa = _score_runs(u_all, v_all, kind, wgt, top_n)
        return pa.table(
            {
                "u": pa.array(ru),
                "v": pa.array(rv),
                "cn": pa.array(cn),
                "aa": pa.array(aa),
            }
        )

    # ----- distributed path -----
    ok_ref = ray.put(ok)
    w_ref = ray.put(wvec)

    def adjacency(t: pa.Table) -> pa.Table:
        okv = ray.get(ok_ref)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.concatenate([a, b])
        nbr = np.concatenate([b, a])
        m = okv[w]
        return pa.table({"w": pa.array(w[m]), "nbr": pa.array(nbr[m])})

    adj = e.map_batches(adjacency, batch_format="pyarrow")

    # wedge pairs per common neighbor w, carrying w for the aa weight;
    # groupby w's coarse bucket so one vertex's adjacency is contiguous
    def bucket_w(t: pa.Table) -> pa.Table:
        h = t["w"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = h * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(31)
        return t.append_column(
            "_cb", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    def emit(g) -> pa.Table:
        wv = ray.get(w_ref)
        w = g["w"].to_numpy().astype(np.int64)
        nbr = g["nbr"].to_numpy().astype(np.int64)
        order = np.lexsort((nbr, w))
        w, nbr = w[order], nbr[order]
        starts = np.flatnonzero(np.concatenate([[True], np.diff(w) != 0]))
        ends = np.append(starts[1:], len(w))
        pu, pv, pg = [], [], []
        for s, t2 in zip(starts, ends):
            if t2 - s < 2:
                continue
            grp = nbr[s:t2]
            i, j = np.triu_indices(t2 - s, k=1)
            pu.append(grp[i])
            pv.append(grp[j])
            pg.append(np.full(len(i), wv[w[s]]))
        if not pu:
            return pa.table(
                {
                    "u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.int8()),
                    "wgt": pa.array([], pa.float64()),
                }
            )
        n = sum(len(x) for x in pu)
        return pa.table(
            {
                "u": pa.array(np.concatenate(pu)),
                "v": pa.array(np.concatenate(pv)),
                "kind": pa.array(np.zeros(n, np.int8)),
                "wgt": pa.array(np.concatenate(pg)),
            }
        )

    wedges = (
        adj.map_batches(bucket_w, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(emit, batch_format="pyarrow")
    )

    def edge_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "u": t["a"],
                "v": t["b"],
                "kind": pa.array(np.ones(n, np.int8)),
                "wgt": pa.array(np.zeros(n, np.float64)),
            }
        )

    tagged = wedges.union(e.map_batches(edge_rows, batch_format="pyarrow"))

    def bucket_pair(t: pa.Table) -> pa.Table:
        x = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        y = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = x * np.uint64(0x9E3779B97F4A7C15) ^ y * np.uint64(0xC2B2AE3D27D4EB4F)
        h ^= h >> np.uint64(29)
        return t.append_column(
            "_pb", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    def score_bucket(g) -> pa.Table:
        ru, rv, cn, aa = _score_runs(
            g["u"].to_numpy().astype(np.int64),
            g["v"].to_numpy().astype(np.int64),
            g["kind"].to_numpy().astype(np.int8),
            g["wgt"].to_numpy().astype(np.float64),
            top_n,
        )
        return pa.table(
            {
                "u": pa.array(ru),
                "v": pa.array(rv),
                "cn": pa.array(cn),
                "aa": pa.array(aa),
            }
        )

    per_bucket = (
        tagged.map_batches(bucket_pair, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(score_bucket, batch_format="pyarrow")
    )
    # global merge: ≤ n_buckets × top_n candidate rows — driver-small
    ct = collect_table(per_bucket)
    ru, rv = (
        ct["u"].to_numpy(zero_copy_only=False).astype(np.int64),
        ct["v"].to_numpy(zero_copy_only=False).astype(np.int64),
    )
    cn = ct["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
    aa = ct["aa"].to_numpy(zero_copy_only=False).astype(np.float64)
    pick = np.lexsort((rv, ru, -cn))[:top_n]
    return pa.table(
        {
            "u": pa.array(ru[pick]),
            "v": pa.array(rv[pick]),
            "cn": pa.array(cn[pick]),
            "aa": pa.array(aa[pick]),
        }
    )


def coreview_pairs(
    edges: "ray.data.Dataset",
    part_offset: int,
    top_n: int = 100,
    max_degree: int = 10_000,
) -> pa.Table:
    """Co-review projection — the classic collusion signal (FRAUDAR's
    dense-block input viewed pairwise): top user pairs by number of
    commonly-reviewed products, with the Adamic-Adar-weighted variant
    (1/ln(prod degree) — busy products count less). Exactly the
    link-prediction kernel on the bipartite review graph with wedge
    CENTERS restricted to the product side (vid >= part_offset): common
    neighbors of two users ARE their co-reviewed products, and user
    pairs are never adjacent in a bipartite graph so the non-edge filter
    is a no-op. Asserts the user-id domain stays below part_offset so a
    scale where the domains overlap fails loudly instead of silently
    mixing product vids into the user pairs."""
    e = edges.select_columns(["src", "dst"]).materialize()
    max_src = int(e.max("src"))
    if max_src >= part_offset:
        raise ValueError(
            f"coreview_pairs: user id {max_src} overlaps the product vid "
            f"domain (part_offset={part_offset}); renumber before projecting"
        )
    n = int(e.max("dst")) + 1
    center = np.zeros(n, dtype=bool)
    center[part_offset:] = True
    t = link_prediction_scores(
        e, n, top_n=top_n, max_degree=max_degree,
        approx_rows=e.count(), center_mask=center,
    )
    return pa.table(
        {
            "u": t["u"],
            "v": t["v"],
            "common_prods": t["cn"],
            "aa": pa.array(np.round(t["aa"].to_numpy(), 9)),
        }
    )
