"""SemDeDup (similarity.semdedup) vs a single-array naive mirror:
kmeans assignment (the test_kmeans integer rules) + within-cluster
keep-lowest-id pruning under the division-free cosine predicate."""

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from ugfraud_ray.pipelines.similarity import semdedup


def _naive_assign(ids, vecs, k, iters, grid=1000, cgrid=1000, shift=8):
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
    return np.argmin(dist2(C), axis=1), q - shift * grid


def _naive_semdedup(ids, vecs, k, iters, num, den, **kw):
    a, qs = _naive_assign(ids, vecs, k, iters, **kw)
    ids = np.asarray(ids)
    kept = np.ones(len(ids), dtype=np.int64)
    for j in range(len(ids)):
        nj = int((qs[j].astype(object) ** 2).sum())
        for i in range(len(ids)):
            if a[i] != a[j] or ids[i] >= ids[j]:
                continue
            s = int((qs[i].astype(object) * qs[j]).sum())
            ni = int((qs[i].astype(object) ** 2).sum())
            if s > 0 and s * s * den >= num * ni * nj:
                kept[j] = 0
                break
    return a, kept


def _run(ids, vecs, k, iters, num, den, blocks=5):
    t = pa.table({"vec_id": pa.array(ids), "embedding": pa.array(vecs.tolist())})
    ds = ray.data.from_arrow(t).repartition(blocks)
    out = (
        semdedup(ds, k=k, iters=iters, sim2_num=num, sim2_den=den)
        .to_pandas()
        .sort_values("vec_id")
    )
    return out["cluster"].to_numpy(), out["kept"].to_numpy()


def test_semdedup_matches_naive_mirror(ray_session):
    rng = np.random.default_rng(7)
    # planted near-duplicate pairs: base vectors plus tiny jitter copies
    base = rng.normal(size=(40, 8)) * 0.3
    dup = base[:15] + rng.normal(size=(15, 8)) * 0.01
    vecs = np.vstack([base, dup])
    ids = rng.permutation(len(vecs)).astype(np.int64) * 7 + 3
    got_a, got_k = _run(ids, vecs, k=3, iters=2, num=81, den=100)
    want_a, want_k = _naive_semdedup(ids, vecs, k=3, iters=2, num=81, den=100)
    order = np.argsort(ids)
    np.testing.assert_array_equal(got_a, want_a[order])
    np.testing.assert_array_equal(got_k, want_k[order])
    assert (got_k == 0).sum() >= 10  # the planted dups actually drop


def test_semdedup_exact_duplicates_keep_lowest_id(ray_session):
    # identical vectors: only the smallest id in each cluster survives
    vecs = np.tile(np.array([[0.2, -0.1, 0.4]]), (6, 1))
    ids = np.array([30, 10, 20, 50, 40, 60], dtype=np.int64)
    got_a, got_k = _run(ids, vecs, k=1, iters=1, num=81, den=100, blocks=3)
    assert got_k.tolist() == [1, 0, 0, 0, 0, 0]  # sorted by id: 10 kept


def test_semdedup_zero_vectors_never_drop(ray_session):
    vecs = np.zeros((4, 3))
    ids = np.arange(4, dtype=np.int64)
    _, got_k = _run(ids, vecs, k=1, iters=1, num=0, den=1, blocks=2)
    assert got_k.tolist() == [1, 1, 1, 1]  # s = 0 fails s > 0 even at t = 0


def test_semdedup_object_int_fallback_matches(ray_session):
    # dim 4 x values near the +-8 shift bound pushes the int64 bound
    # past 2^62, forcing the exact Python-int path
    rng = np.random.default_rng(3)
    base = rng.uniform(-7.9, 7.9, size=(12, 4))
    vecs = np.vstack([base, base[:5] * 0.999])
    ids = np.arange(len(vecs), dtype=np.int64)
    q = np.floor(vecs * 1000 + 0.5).astype(np.int64)
    s_bound = 4 * int(np.abs(q).max()) ** 2
    assert s_bound * s_bound * 100 >= 2**62  # the fallback really fires
    got_a, got_k = _run(ids, vecs, k=2, iters=1, num=81, den=100, blocks=3)
    want_a, want_k = _naive_semdedup(ids, vecs, k=2, iters=1, num=81, den=100)
    np.testing.assert_array_equal(got_a, want_a)
    np.testing.assert_array_equal(got_k, want_k)
    assert (got_k == 0).sum() >= 4
