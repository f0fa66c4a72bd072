"""Deterministic global shuffle (splits.shuffle_shards) vs a naive
single-array rank, incl. the forced many-bucket range path."""

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from ugfraud_ray.pipelines.splits import shuffle_shards


def _naive(ids, n_shards, seed):
    h = np.array(
        [
            int.from_bytes(hashlib.md5(f"{seed}-{i}".encode()).digest()[:8], "little")
            for i in ids
        ],
        dtype=np.uint64,
    )
    order = np.lexsort((ids, h))
    pos = np.empty(len(ids), dtype=np.int64)
    pos[order] = np.arange(len(ids))
    return pos, pos % n_shards


def _run(ids, n_shards, seed, **kw):
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids)})
    ).repartition(5)
    out = shuffle_shards(ds, n_shards=n_shards, seed=seed, **kw).to_pandas()
    out = out.sort_values("doc_id")
    return out["pos"].to_numpy(), out["shard"].to_numpy()


def test_shuffle_shards_matches_naive_rank(ray_session):
    ids = (np.arange(200, dtype=np.int64) * 13 + 7)
    want_pos, want_shard = _naive(ids, 8, 42)
    got_pos, got_shard = _run(ids, 8, 42)
    np.testing.assert_array_equal(got_pos, want_pos)
    np.testing.assert_array_equal(got_shard, want_shard)
    # pos is a permutation; round-robin shards are balanced to +-1
    assert sorted(got_pos) == list(range(200))
    counts = np.bincount(got_shard, minlength=8)
    assert counts.max() - counts.min() <= 1


def test_shuffle_shards_forced_many_buckets(ray_session):
    ids = np.arange(150, dtype=np.int64)
    want_pos, _ = _naive(ids, 4, 3)
    got_pos, _ = _run(ids, 4, 3, n_buckets=16)
    np.testing.assert_array_equal(got_pos, want_pos)


def test_shuffle_shards_seed_changes_order(ray_session):
    ids = np.arange(100, dtype=np.int64)
    p1, _ = _run(ids, 4, 1)
    p2, _ = _run(ids, 4, 2)
    assert (p1 != p2).any()
