"""fBox / SVD / FRAUDAR conformance vs dense-numpy oracles.

Oracles use dense matrices + np.linalg.svd + naive O(n²) greedy loops —
independent execution style from the engine's Gram route / heap peel
(SURVEY §7.4 gates 5-7)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from tests.test_detectors import _mini_review_graph


def _edges_ds(src, dst, rating=None, offset=0):
    cols = {"src": pa.array(src), "dst": pa.array(dst - offset)}
    if rating is not None:
        cols["rating"] = pa.array(rating.astype(np.float64))
    return ray.data.from_arrow(pa.table(cols))


def test_gram_svd_matches_dense(ray_session):
    from ugfraud_ray.detectors.spectral import gram_matrix, truncated_svd_from_gram

    src, dst, rating, *_ , U, Pn = _mini_review_graph(seed=21)
    A = np.zeros((U, Pn))
    A[src, dst - U] = 1
    e = _edges_ds(src, dst, offset=U)
    G = gram_matrix(e, Pn)
    assert np.allclose(G, A.T @ A)
    s, Vk = truncated_svd_from_gram(G, 5)
    s_ref = np.linalg.svd(A, compute_uv=False)[:5]
    assert np.allclose(s, s_ref, atol=1e-8)


def test_fbox_matches_dense_oracle(ray_session):
    from ugfraud_ray.detectors.fbox import fbox

    src, dst, rating, *_, U, Pn = _mini_review_graph(seed=23, n_users=60, n_prods=10, n_edges=200)
    A = np.zeros((U, Pn))
    A[src, dst - U] = 1
    k, tau = 3, 20.0
    u, s, vt = np.linalg.svd(A)
    u, s, vt = u[:, :k], s[:k], vt[:k]
    rec_out = np.linalg.norm(u * s, axis=1)
    rec_in = np.linalg.norm(vt.T * s, axis=1)
    out_deg = A.sum(axis=1).astype(int)
    in_deg = A.sum(axis=0).astype(int)
    sus_u = set()
    for d in np.unique(out_deg[out_deg > 0]):
        mask = out_deg == d
        th = np.percentile(rec_out[mask], tau)
        sus_u |= set(np.flatnonzero(mask & (rec_out < th)).tolist())
    sus_p = set()
    for d in np.unique(in_deg[in_deg > 0]):
        mask = in_deg == d
        th = np.percentile(rec_in[mask], tau)
        sus_p |= set(np.flatnonzero(mask & (rec_in < th)).tolist())

    e = _edges_ds(src, dst, offset=U)
    got_u, got_p = fbox(e, Pn, tau=tau, k=k)
    assert set(got_u.to_pandas()["vid"].tolist()) == sus_u
    assert set(got_p.to_pandas()["pid"].tolist()) == sus_p


def test_svd_embedding_matches_dense(ray_session):
    from ugfraud_ray.detectors.svd import svd_decompose, svd_user_embedding

    src, dst, rating, *_, U, Pn = _mini_review_graph(seed=29)
    A = np.zeros((U, Pn))
    A[src, dst - U] = rating
    e = _edges_ds(src, dst, rating=rating, offset=U)
    s, Vk = svd_decompose(e, Pn, percent=0.5)
    k = len(s)
    s_ref = np.linalg.svd(A, compute_uv=False)[:k]
    assert np.allclose(s, s_ref, atol=1e-8)
    emb = svd_user_embedding(e, s, Vk).to_pandas().sort_values("vid")
    got = np.stack(emb["emb"].to_numpy())
    want = A @ (Vk / np.where(s > 0, s, 1.0)[None, :])
    present = sorted(set(src.tolist()))
    assert np.allclose(got, want[present], atol=1e-8)


def _naive_peel(src, dst, col_w, m, n):
    """O((m+n)·E) argmin-delete oracle, literal transcription of the
    published greedy (row ties before col, lowest index first)."""
    alive_r = np.ones(m, bool)
    alive_c = np.ones(n, bool)
    E = [(int(s), int(d)) for s, d in zip(src, dst)]
    cur = sum(col_w[d] for _, d in E)
    best = cur / (m + n)
    deleted = []
    best_k = 0
    while alive_r.any() and alive_c.any():
        rd = np.full(m, np.inf)
        rd[alive_r] = 0.0
        cd = np.full(n, np.inf)
        cd[alive_c] = 0.0
        for s, d in E:
            if alive_r[s] and alive_c[d]:
                rd[s] += col_w[d]
                cd[d] += col_w[d]
        ri = int(np.argmin(rd))
        ci = int(np.argmin(cd))
        if rd[ri] <= cd[ci]:
            cur -= rd[ri]
            alive_r[ri] = False
            deleted.append((0, ri))
        else:
            cur -= cd[ci]
            alive_c[ci] = False
            deleted.append((1, ci))
        denom = alive_r.sum() + alive_c.sum()
        if denom == 0:
            break
        if cur / denom > best:
            best = cur / denom
            best_k = len(deleted)
    rs, cs = set(range(m)), set(range(n))
    for kind, i in deleted[:best_k]:
        (rs if kind == 0 else cs).discard(i)
    return rs, cs, best


def test_fraudar_peel_matches_naive_oracle():
    from ugfraud_ray.detectors.fraudar import fast_greedy_decreasing

    rng = np.random.default_rng(31)
    m, n, ne = 25, 8, 70
    src = rng.integers(0, m, ne)
    dst = rng.integers(0, n, ne)
    pairs = np.array(sorted({(int(s), int(d)) for s, d in zip(src, dst)}), dtype=np.int64)
    src, dst = pairs[:, 0], pairs[:, 1]
    colsum = np.bincount(dst, minlength=n).astype(np.float64)
    col_w = 1.0 / np.log(colsum + 5)
    rs, cs, score = fast_greedy_decreasing(src, dst, col_w, m=m, n=n)
    rs2, cs2, score2 = _naive_peel(src, dst, col_w, m, n)
    assert rs == rs2 and cs == cs2
    assert abs(score - score2) < 1e-9


def test_fraudar_recovers_planted_block(ray_session):
    from ugfraud_ray.detectors.fraudar import detect_blocks, inject_clique_camo

    rng = np.random.default_rng(37)
    m, n = 200, 40
    src = rng.integers(0, m, 400)
    dst = rng.integers(0, n, 400)
    src2, dst2, prow, pcol = inject_clique_camo(src, dst, m, n, m0=15, n0=5, p=1.0)
    e = ray.data.from_arrow(pa.table({"src": pa.array(src2), "dst": pa.array(dst2)}))
    blocks = detect_blocks(e)
    top_rows, top_cols, _ = blocks[0]
    # planted block must dominate the densest block found
    assert len(prow & top_rows) / len(prow) >= 0.9
    assert len(pcol & top_cols) / len(pcol) >= 0.9


def test_fraudar_batched_peel_recovers_planted_block():
    from ugfraud_ray.detectors.fraudar import (
        fast_greedy_decreasing,
        fast_greedy_decreasing_batched,
        inject_clique_camo,
    )

    rng = np.random.default_rng(53)
    m, n = 400, 60
    src = rng.integers(0, m, 900)
    dst = rng.integers(0, n, 900)
    src2, dst2, prow, pcol = inject_clique_camo(src, dst, m, n, m0=20, n0=6, p=1.0)
    colsum = np.bincount(dst2, minlength=n).astype(np.float64)
    col_w = 1.0 / np.log(colsum + 5)
    er, ec, es = fast_greedy_decreasing(src2, dst2, col_w, m=m, n=n)
    br, bc, bs = fast_greedy_decreasing_batched(src2, dst2, col_w, m=m, n=n)
    # the approximation must still recover the planted block well
    assert len(prow & br) / len(prow) >= 0.8
    assert len(pcol & bc) / len(pcol) >= 0.8
    # and its score must be close to the exact peel's
    assert bs >= 0.8 * es


def test_gram_local_fast_path_matches_distributed(ray_session):
    """gram_matrix's approx_edges-gated driver-local kernel must agree
    with the distributed self-join route (binary and weighted)."""
    from ugfraud_ray.detectors.spectral import gram_matrix

    src, dst, rating, *_, U, Pn = _mini_review_graph(seed=29)
    e = _edges_ds(src, dst, rating=rating, offset=U)
    for value in (None, "rating"):
        G_dist = gram_matrix(e, Pn, value=value)
        G_loc = gram_matrix(e, Pn, value=value, approx_edges=len(src))
        assert np.allclose(G_dist, G_loc, atol=1e-9)


def test_fbox_local_fast_path_matches_distributed(ray_session):
    """fbox's approx_edges-gated driver-local read-out must flag the
    same users/products with the same thresholds as the distributed
    read-out."""
    from ugfraud_ray.detectors.fbox import fbox

    src, dst, rating, *_, U, Pn = _mini_review_graph(
        seed=31, n_users=60, n_prods=10, n_edges=200
    )
    e = _edges_ds(src, dst, offset=U)
    du, dp = fbox(e, Pn, tau=20.0, k=3)
    lu, lp = fbox(e, Pn, tau=20.0, k=3, approx_edges=len(src))
    for got, want, key in ((lu, du, "vid"), (lp, dp, "pid")):
        g = got.to_pandas().sort_values(key).reset_index(drop=True)
        w = want.to_pandas().sort_values(key).reset_index(drop=True)
        assert g[key].tolist() == w[key].tolist()
        assert g["degree"].tolist() == w["degree"].tolist()
        assert np.allclose(g["rec"], w["rec"], atol=1e-9)
        assert np.allclose(g["threshold"], w["threshold"], atol=1e-9)


def test_fraudar_distributed_exact_peel_parity(ray_session):
    """r5 forced-distributed peel (shard-resident edges, driver
    vertex-sized state): peel='exact' must reproduce the LOCAL exact
    path's block sets and scores — multi-block, with per-round
    col-weight recompute and block-edge removal — on a seeded planted
    fixture."""
    from ugfraud_ray.detectors.fraudar import detect_blocks, inject_clique_camo

    rng = np.random.default_rng(91)
    m, n = 300, 50
    src = rng.integers(0, m, 700)
    dst = rng.integers(0, n, 700)
    src2, dst2, _, _ = inject_clique_camo(src, dst, m, n, m0=18, n0=6, p=1.0, seed=7)
    e = ray.data.from_arrow(
        pa.table({"src": pa.array(src2), "dst": pa.array(dst2)})
    ).materialize()

    local = detect_blocks(e, max_blocks=3)
    dist = detect_blocks(e, max_blocks=3, peel="exact", num_shards=3)
    assert len(local) == len(dist)
    for (lr, lc, ls), (dr, dc, dscore) in zip(local, dist):
        assert lr == dr and lc == dc
        assert abs(ls - dscore) < 1e-9


def test_fraudar_distributed_batched_peel_parity(ray_session):
    """Distributed batched peel (incremental decrements) agrees with
    the local recompute-per-round batched peel on the seeded fixture
    and still recovers the planted block."""
    from ugfraud_ray.detectors.fraudar import (
        _ShardedPeelGraph,
        _peel_batched_distributed,
        fast_greedy_decreasing_batched,
        inject_clique_camo,
    )

    rng = np.random.default_rng(53)
    m, n = 400, 60
    src = rng.integers(0, m, 900)
    dst = rng.integers(0, n, 900)
    src2, dst2, prow, pcol = inject_clique_camo(src, dst, m, n, m0=20, n0=6, p=1.0)
    colsum = np.bincount(dst2, minlength=n).astype(np.float64)
    col_w = 1.0 / np.log(colsum + 5)
    br, bc, bs = fast_greedy_decreasing_batched(
        src2, dst2, col_w, m=m, n=n, min_frac=0.05
    )

    e = ray.data.from_arrow(
        pa.table({"src": pa.array(src2), "dst": pa.array(dst2)})
    ).materialize()
    g = _ShardedPeelGraph(e, num_shards=3)
    try:
        w = g.col_weights("log")
        dr, dc, ds = _peel_batched_distributed(g, w, min_frac=0.05)
    finally:
        g.shutdown()
    assert dr == br and dc == bc
    assert abs(ds - bs) < 1e-9
    assert len(prow & dr) / len(prow) >= 0.8
