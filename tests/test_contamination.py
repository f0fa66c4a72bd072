"""Contamination check vs a naive set-overlap oracle."""

import numpy as np
import pyarrow as pa
import ray.data

from ugfraud_ray.pipelines.contamination import contamination_check
from ugfraud_ray.pipelines.dedup import _shingle_hashes

BENCH = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
]
CORPUS = [
    (10, "the quick brown fox jumps over the lazy dog"),  # exact benchmark copy
    (11, "the quick brown fox sat still all day long here"),  # partial overlap
    (12, "completely unrelated words about ray data engines"),
    (13, "ab"),  # single short token -> 1 shingle, no overlap
    (14, ""),  # empty -> 0 shingles, never contaminated
]


def _naive(pct):
    bench = set()
    for t in BENCH:
        bench |= set(_shingle_hashes(t, 3).tolist())
    rows = []
    for i, t in CORPUS:
        sh = set(_shingle_hashes(t, 3).tolist())
        ov = len(sh & bench)
        rows.append((i, len(sh), ov, int(len(sh) > 0 and ov * 100 >= pct * len(sh))))
    return rows


def test_contamination_matches_naive(ray_session):
    bench = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": pa.array(BENCH)})
    )
    corpus = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in CORPUS], pa.int64()),
                "text": pa.array([t for _, t in CORPUS]),
            }
        )
    )
    got = (
        contamination_check(corpus, bench, pct=50, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _naive(50)
    assert [tuple(r) for r in got.to_numpy()] == want
    # the exact copy is contaminated, the unrelated doc is not
    assert got.contaminated[0] == 1
    assert got.contaminated[2] == 0
    assert got.n_shingles[4] == 0 and got.contaminated[4] == 0
