"""Distributed Lloyd k-means (similarity.kmeans) vs a single-array
naive mirror implementing the identical integer rules."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ugfraud_ray.pipelines.similarity import kmeans


def _naive_kmeans(ids, vecs, k, iters, grid=1000, cgrid=1000, shift=8):
    q = np.floor(vecs * grid + 0.5).astype(np.int64) + shift * grid
    h = np.array(
        [
            int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "little")
            for i in ids
        ],
        dtype=np.uint64,
    )
    C = q[np.lexsort((ids, h))[:k]] * cgrid

    def dist2(C):
        qq = (q * q).sum(axis=1) * (cgrid * cgrid)
        cross = (q @ C.T) * cgrid
        return qq[:, None] - 2 * cross + (C * C).sum(axis=1)[None, :]

    for _ in range(iters):
        a = np.argmin(dist2(C), axis=1)
        newC = C.copy()
        for j in range(k):
            m = a == j
            if m.any():
                qs = q[m].sum(axis=0, dtype=np.int64)
                n = int(m.sum())
                newC[j] = (qs * 2 * cgrid + n) // (2 * n)
        C = newC
    D = dist2(C)
    a = np.argmin(D, axis=1)
    return a, D[np.arange(len(q)), a]


def _run(ids, vecs, k, iters, blocks=5):
    t = pa.table(
        {"vec_id": pa.array(ids), "embedding": pa.array(vecs.tolist())}
    )
    ds = ray.data.from_arrow(t).repartition(blocks)
    out = kmeans(ds, k=k, iters=iters).to_pandas().sort_values("vec_id")
    return out["cluster"].to_numpy(), out["d2"].to_numpy()


def test_kmeans_matches_naive_mirror(ray_session):
    rng = np.random.default_rng(7)
    n, d, k = 300, 16, 4
    centers = rng.normal(size=(k, d)) * 2
    vecs = centers[rng.integers(0, k, n)] + rng.normal(size=(n, d)) * 0.3
    ids = np.arange(100, 100 + n, dtype=np.int64)
    want_a, want_d = _naive_kmeans(ids, vecs, k, iters=3)
    got_a, got_d = _run(ids, vecs, k, iters=3)
    np.testing.assert_array_equal(got_a, want_a)
    np.testing.assert_array_equal(got_d, want_d)
    assert len(np.unique(got_a)) > 1


def test_kmeans_empty_cluster_keeps_previous_centroid(ray_session):
    # all-identical vectors: every point ties to cluster 0 (lowest id
    # wins), clusters 1.. stay empty and must keep their seed centroid
    ids = np.arange(20, dtype=np.int64)
    vecs = np.tile(np.array([0.25, -0.5, 0.125]), (20, 1))
    want_a, want_d = _naive_kmeans(ids, vecs, k=3, iters=2)
    got_a, got_d = _run(ids, vecs, k=3, iters=2, blocks=3)
    np.testing.assert_array_equal(got_a, want_a)
    np.testing.assert_array_equal(got_a, np.zeros(20, dtype=np.int64))
    np.testing.assert_array_equal(got_d, np.zeros(20, dtype=np.int64))


def test_kmeans_rejects_out_of_range_values(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"vec_id": pa.array([1]), "embedding": pa.array([[-9.5, 0.0]])})
    )
    with pytest.raises(Exception, match="raise kmeans"):
        kmeans(ds, k=1, iters=1).materialize()


def _naive_kcenter(ids, vecs, k, grid=1000):
    q = np.floor(vecs * grid + 0.5).astype(np.int64)
    h = np.array(
        [
            int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "little")
            for i in ids
        ],
        dtype=np.uint64,
    )
    seed = np.lexsort((ids, h))[0]
    chosen = [seed]
    d2 = [0]
    for _ in range(1, k):
        C = q[chosen]
        D = (
            (q * q).sum(axis=1)[:, None]
            - 2 * (q @ C.T)
            + (C * C).sum(axis=1)[None, :]
        ).min(axis=1)
        keep = ~np.isin(np.arange(len(ids)), chosen)
        cand = np.flatnonzero(keep)
        j = cand[np.lexsort((ids[cand], -D[cand]))[0]]
        chosen.append(int(j))
        d2.append(int(D[j]))
    return ids[chosen], np.array(d2, dtype=np.int64)


def test_kcenter_matches_naive_mirror(ray_session):
    from ugfraud_ray.pipelines.similarity import kcenter_sample

    rng = np.random.default_rng(11)
    n, d, k = 200, 8, 5
    vecs = rng.normal(size=(n, d))
    ids = rng.permutation(n).astype(np.int64) * 3 + 7
    want_ids, want_d2 = _naive_kcenter(ids, vecs, k)
    t = pa.table({"vec_id": pa.array(ids), "embedding": pa.array(vecs.tolist())})
    got = kcenter_sample(ray.data.from_arrow(t).repartition(6), k=k)
    np.testing.assert_array_equal(
        got["vec_id"].to_numpy(zero_copy_only=False), want_ids
    )
    np.testing.assert_array_equal(got["d2"].to_numpy(zero_copy_only=False), want_d2)
    np.testing.assert_array_equal(
        got["rank"].to_numpy(zero_copy_only=False), np.arange(k)
    )


def test_kcenter_duplicate_points_tie_to_lowest_id(ray_session):
    from ugfraud_ray.pipelines.similarity import kcenter_sample

    # two distinct locations, many duplicates: picks alternate between
    # the clouds, ties broken by lowest id
    ids = np.arange(10, dtype=np.int64)
    vecs = np.where((ids % 2 == 0)[:, None], 0.5, -0.5) * np.ones((10, 3))
    got = kcenter_sample(
        ray.data.from_arrow(
            pa.table({"vec_id": pa.array(ids), "embedding": pa.array(vecs.tolist())})
        ).repartition(3),
        k=3,
    )
    want_ids, want_d2 = _naive_kcenter(ids, vecs, 3)
    np.testing.assert_array_equal(
        got["vec_id"].to_numpy(zero_copy_only=False), want_ids
    )
    np.testing.assert_array_equal(got["d2"].to_numpy(zero_copy_only=False), want_d2)


def test_embedding_covariance_matches_numpy(ray_session):
    from ugfraud_ray.pipelines.similarity import embedding_covariance

    rng = np.random.default_rng(3)
    n, d = 150, 6
    vecs = rng.normal(size=(n, d)) * 1.5
    got = embedding_covariance(
        ray.data.from_arrow(
            pa.table({"embedding": pa.array(vecs.tolist())})
        ).repartition(4)
    ).to_pandas()
    q = np.floor(vecs * 1000 + 0.5)
    want = np.cov(q.T / 1000.0, bias=True)
    for i, j, c in got.itertuples(index=False):
        assert abs(c - want[i, j]) < 2e-9, (i, j)
    assert len(got) == d * (d + 1) // 2


def test_pca_project_matches_numpy(ray_session):
    from ugfraud_ray.pipelines.similarity import pca_project

    rng = np.random.default_rng(5)
    n, d = 200, 8
    # anisotropic cloud: clear principal directions
    basis = rng.normal(size=(d, d))
    scales = np.array([4.0, 2.0] + [0.3] * (d - 2))
    vecs = (rng.normal(size=(n, d)) * scales) @ basis.T * 0.1
    vecs = np.clip(vecs, -7.9, 7.9)
    t = pa.table(
        {"vec_id": pa.array(np.arange(n, dtype=np.int64)), "embedding": pa.array(vecs.tolist())}
    )
    got = (
        pca_project(ray.data.from_arrow(t).repartition(4))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    q = np.floor(vecs * 1000 + 0.5) / 1000
    C = np.cov(q.T, bias=True)
    # mirror the engine's covariance rounding
    C = np.floor(C * 1e9 + 0.5) / 1e9
    w, v = np.linalg.eigh(C)
    order = np.argsort(-w)[:2]
    comps = v[:, order].T
    for r in range(2):
        m = np.argmax(np.abs(np.round(comps[r], 12)))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    want = q @ comps.T
    np.testing.assert_allclose(got["pc0"].to_numpy(), np.round(want[:, 0], 9), atol=1e-8)
    np.testing.assert_allclose(got["pc1"].to_numpy(), np.round(want[:, 1], 9), atol=1e-8)
    # the top component must carry more variance than the second
    assert got["pc0"].to_numpy().var() > got["pc1"].to_numpy().var()
