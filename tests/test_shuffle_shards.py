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


def test_interleave_mixture_proportional_and_exact(ray_session):
    import hashlib

    from ugfraud_ray.pipelines.splits import interleave_mixture

    n = 300
    srcs = [f"s{i % 3}" for i in range(n)]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "source": pa.array(srcs),
        }
    )
    w = {"s0": 1, "s1": 2, "s2": 4}
    got = (
        interleave_mixture(ray.data.from_arrow(t).repartition(4), w, seed=9)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def low64(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")

    # naive per-source rank by (hash, id)
    import collections

    by_src = collections.defaultdict(list)
    for i, s in zip(range(n), srcs):
        by_src[s].append((low64(f"9-{i}"), i))
    rank = {}
    for s, lst in by_src.items():
        for r, (_, i) in enumerate(sorted(lst)):
            rank[i] = r
    assert (got["src_rank"].to_numpy() == np.array([rank[i] for i in range(n)])).all()
    want_key = np.array(
        [(rank[i] * 1_000_000) // w[srcs[i]] for i in range(n)], dtype=np.int64
    )
    assert (got["sched_key"].to_numpy() == want_key).all()
    # proportionality: in the first 120 schedule slots, s2 appears ~4x s0
    order = got.sort_values(["sched_key", "source", "doc_id"]).head(140)
    c = order["source"].value_counts()
    assert c["s2"] > c["s1"] > c["s0"]
