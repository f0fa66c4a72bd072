"""cms_heavy_hitters (sketches) vs a pure-Python count-min mirror:
exact top-k selection, grid replay, the one-sided estimate guarantee,
and block-split invariance (the partials merge by Sum)."""

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from ugfraud_ray.pipelines.sketches import cms_heavy_hitters


def _h(j, v, w):
    return (
        int.from_bytes(hashlib.md5(f"{j}-{v}".encode()).digest()[:8], "little") % w
    )


def _naive(keys, d, w, topk):
    from collections import Counter

    counts = Counter(keys)
    grid = [[0] * w for _ in range(d)]
    for v, n in counts.items():
        for j in range(d):
            grid[j][_h(j, v, w)] += n
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
    return [
        (v, n, min(grid[j][_h(j, v, w)] for j in range(d))) for v, n in top
    ]


def _run(keys, blocks=4, **kw):
    t = pa.table({"user_id": pa.array(np.asarray(keys, dtype=np.int64))})
    ds = ray.data.from_arrow(t).repartition(blocks)
    out = cms_heavy_hitters(ds, key_col="user_id", **kw).to_pandas()
    return [
        (int(r.user_id), int(r.n_exact), int(r.n_cms)) for r in out.itertuples()
    ]


def test_cms_matches_naive_and_overestimates(ray_session):
    rng = np.random.default_rng(7)
    # zipf-ish: a few heavy keys over a long tail, tiny w to force collisions
    keys = np.concatenate(
        [np.repeat(np.arange(5), [500, 300, 200, 100, 50]), rng.integers(100, 400, 2000)]
    )
    rng.shuffle(keys)
    got = _run(keys, d=3, w=32, topk=10)
    assert got == _naive(keys.tolist(), d=3, w=32, topk=10)
    for _, n_exact, n_cms in got:
        assert n_cms >= n_exact  # CMS never under-counts


def test_cms_block_split_invariant(ray_session):
    keys = list(range(50)) * 3 + [7] * 40
    assert _run(keys, blocks=1, d=4, w=64, topk=8) == _run(
        keys, blocks=7, d=4, w=64, topk=8
    )
