"""cluster_outliers and knn_graph (pipelines/similarity.py) vs naive
single-array mirrors sharing the kmeans integer rules."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ugfraud_ray.pipelines.similarity import cluster_outliers, kmeans, knn_graph

from tests.test_kmeans import _naive_kmeans


def _mk(ids, vecs, blocks=5):
    t = pa.table({"vec_id": pa.array(ids), "embedding": pa.array(vecs.tolist())})
    return ray.data.from_arrow(t).repartition(blocks)


def _rand(n, dim, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(-2, 2, size=(n, dim))


def test_cluster_outliers_matches_naive():
    ids = np.arange(40, dtype=np.int64)
    vecs = _rand(40, 6, seed=3)
    got = (
        cluster_outliers(_mk(ids, vecs), k=3, iters=2, topn=4)
        .to_pandas()
        .sort_values(["cluster", "rnk"])
        .reset_index(drop=True)
    )
    a, d2 = _naive_kmeans(ids, vecs, k=3, iters=2)
    for c in np.unique(a):
        m = np.flatnonzero(a == c)
        order = m[np.lexsort((ids[m], -d2[m]))][:4]
        sub = got[got["cluster"] == c]
        assert sub["vec_id"].tolist() == ids[order].tolist()
        assert sub["d2"].tolist() == d2[order].astype(int).tolist()
        assert sub["rnk"].tolist() == list(range(1, len(order) + 1))


def test_cluster_outliers_block_split_invariant():
    ids = np.arange(30, dtype=np.int64)
    vecs = _rand(30, 4, seed=7)
    a = cluster_outliers(_mk(ids, vecs, blocks=1), k=2, iters=1, topn=5).to_pandas()
    b = cluster_outliers(_mk(ids, vecs, blocks=9), k=2, iters=1, topn=5).to_pandas()
    key = ["cluster", "rnk"]
    pa_ = a.sort_values(key).reset_index(drop=True)
    pb = b.sort_values(key).reset_index(drop=True)
    assert pa_.equals(pb)


def _naive_knn(ids, vecs, k, iters, nn, grid=1000, shift=8):
    a, _ = _naive_kmeans(ids, vecs, k=k, iters=iters, grid=grid, shift=shift)
    q = np.floor(vecs * grid + 0.5).astype(np.int64)
    rows = []
    for c in np.unique(a):
        m = np.flatnonzero(a == c)
        if len(m) <= 1:
            continue
        sub_ids, sub_q = ids[m], q[m]
        for i in range(len(m)):
            d2 = ((sub_q - sub_q[i]) ** 2).sum(axis=1)
            order = np.lexsort((sub_ids, d2))
            order = order[order != i][:nn]
            for r, j in enumerate(order, start=1):
                rows.append((sub_ids[i], sub_ids[j], int(d2[j]), r))
    return sorted(rows)


def test_knn_graph_matches_naive():
    ids = np.arange(35, dtype=np.int64)
    vecs = _rand(35, 5, seed=11)
    got = knn_graph(_mk(ids, vecs), k=3, iters=2, nn=3).to_pandas()
    got_rows = sorted(
        zip(
            got["vec_id"].astype(int),
            got["nbr_id"].astype(int),
            got["d2"].astype(int),
            got["rnk"].astype(int),
        )
    )
    assert got_rows == _naive_knn(ids, vecs, k=3, iters=2, nn=3)


def test_knn_graph_singletons_emit_nothing():
    # two tight groups + one far-away singleton; k=3 isolates it
    base = np.zeros((7, 3))
    base[:3] += [0.0, 0.0, 0.0]
    base[3:6] += [3.0, 3.0, 3.0]
    base[6] = [-7.9, -7.9, -7.9]
    ids = np.arange(7, dtype=np.int64)
    got = knn_graph(_mk(ids, base, blocks=2), k=3, iters=2, nn=2).to_pandas()
    # the singleton id must not appear as a source
    a, _ = _naive_kmeans(ids, base, k=3, iters=2)
    singleton_clusters = [c for c in np.unique(a) if (a == c).sum() == 1]
    for c in singleton_clusters:
        lone = ids[a == c][0]
        assert lone not in set(got["vec_id"].tolist())
    assert got_rows_consistent(got)


def got_rows_consistent(got) -> bool:
    # rnk within each vec_id is 1..n_i and d2 is non-decreasing in rnk
    for _, g in got.groupby("vec_id"):
        g = g.sort_values("rnk")
        if g["rnk"].tolist() != list(range(1, len(g) + 1)):
            return False
        if not np.all(np.diff(g["d2"].to_numpy()) >= 0):
            return False
    return True
