"""product_quantize (similarity): m=1 degenerates to exactly the kmeans
chain (same seeds, same ties, same d2), block-split invariance, and
planted per-subspace structure recovery."""

import numpy as np
import pyarrow as pa

import ray.data

from ugfraud_ray.pipelines.similarity import kmeans, product_quantize


def _ds(vecs, blocks=3):
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
        }
    )
    return ray.data.from_arrow(t).repartition(blocks)


def _rand(n=60, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    return rng.normal(0, 1, (n, dim)).round(3)


def test_pq_m1_equals_kmeans(ray_session):
    vecs = _rand()
    pq = (
        product_quantize(_ds(vecs), m=1, k=4, iters=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    km = (
        kmeans(_ds(vecs), k=4, iters=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert list(pq["code_0"]) == list(km["cluster"])
    assert list(pq["d2"]) == list(km["d2"])


def test_pq_block_split_invariant(ray_session):
    vecs = _rand(n=40)
    a = (
        product_quantize(_ds(vecs, blocks=1), m=2, k=3, iters=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        product_quantize(_ds(vecs, blocks=5), m=2, k=3, iters=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_pq_recovers_planted_subspace_structure(ray_session):
    # subspace 0 has two tight blobs at +/-5 on dims 0-3; subspace 1 two
    # blobs on dims 4-7 with an INDEPENDENT group split — PQ must code
    # each subspace by its own blob
    rng = np.random.default_rng(11)
    n = 40
    g0 = rng.integers(0, 2, n)
    g1 = rng.integers(0, 2, n)
    vecs = np.zeros((n, 8))
    vecs[:, :4] = (g0[:, None] * 2 - 1) * 5 + rng.normal(0, 0.05, (n, 4))
    vecs[:, 4:] = (g1[:, None] * 2 - 1) * 5 + rng.normal(0, 0.05, (n, 4))
    out = (
        product_quantize(_ds(vecs.round(3)), m=2, k=2, iters=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    for col, g in [("code_0", g0), ("code_1", g1)]:
        codes = out[col].to_numpy()
        # codes are a relabeling of the planted groups
        assert len(set(zip(codes.tolist(), g.tolist()))) == 2


def test_pq_rejects_indivisible_dim(ray_session):
    import pytest

    with pytest.raises(ValueError):
        product_quantize(_ds(_rand(n=10, dim=6)), m=4, k=2, iters=1)


def test_ivf_pq_topk_matches_naive(ray_session):
    """Full IVF-PQ composite vs a direct numpy mirror of the same
    integer chain (coarse kmeans -> probe -> ADC ranking)."""
    from ugfraud_ray.pipelines.similarity import (
        _dist2,
        _kmeans_fit,
        _quantize_block,
        ivf_pq_topk,
    )

    rng = np.random.default_rng(11)
    n, dim, m = 60, 8, 2
    vecs = np.round(rng.normal(size=(n, dim)), 3).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    got = (
        ivf_pq_topk(ds, query_ids=[0, 1, 2], k=5, kc=3, nprobe=2, m=m, kpq=4, iters=2)
        .to_pandas()
        .sort_values(["query_id", "rnk"])
        .reset_index(drop=True)
    )

    # naive mirror using the same fit helpers on the same data
    grid, cgrid, shift = 1000, 1000, 8
    C = _kmeans_fit(ds, 3, 2, "vec_id", "embedding", grid, cgrid, shift)
    dsub = dim // m
    books = []
    for s in range(m):
        sub = pa.table(
            {
                "vec_id": t["vec_id"],
                "sub": pa.array(vecs[:, s * dsub : (s + 1) * dsub].tolist()),
            }
        )
        books.append(
            _kmeans_fit(ray.data.from_arrow(sub), 4, 2, "vec_id", "sub", grid, cgrid, shift)
        )
    q = _quantize_block(t, "embedding", grid, shift)
    cell = np.argmin(_dist2(q, C, cgrid), axis=1)
    codes = np.stack(
        [
            np.argmin(_dist2(q[:, s * dsub : (s + 1) * dsub], books[s], cgrid), axis=1)
            for s in range(m)
        ],
        axis=1,
    )
    for qid in [0, 1, 2]:
        dc = _dist2(q[qid : qid + 1], C, cgrid)[0]
        pr = np.argsort(dc, kind="stable")[:2]
        cand = np.flatnonzero(np.isin(cell, pr) & (np.arange(n) != qid))
        adc = np.stack(
            [_dist2(q[qid : qid + 1, s * dsub : (s + 1) * dsub], books[s], cgrid)[0] for s in range(m)]
        )
        d2 = np.array([int(sum(adc[s, codes[c, s]] for s in range(m))) for c in cand])
        sel = np.lexsort((cand, d2))[:5]
        sub = got[got["query_id"] == qid]
        assert list(sub["neighbor_id"]) == [int(c) for c in cand[sel]]
        assert list(sub["d2"]) == [int(x) for x in d2[sel]]
