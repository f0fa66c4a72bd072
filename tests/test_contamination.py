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


def test_bloom_no_false_negatives_and_fp_visible(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.contamination import bloom_contamination

    bench_texts = ["the quick brown fox jumps", "pack my box with jugs"]
    corpus_texts = [
        "the quick brown fox jumps over it",  # real overlap
        "totally unrelated words here now",
        "",  # empty -> all zeros
    ] + [f"filler text number {i} block {i*7}" for i in range(30)]
    bench = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(bench_texts), dtype=np.int64)),
                "text": pa.array(bench_texts),
            }
        )
    )
    corpus = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    np.arange(100, 100 + len(corpus_texts), dtype=np.int64)
                ),
                "text": pa.array(corpus_texts),
            }
        )
    ).repartition(3)
    # tiny filter (16 bits, 1 hash) to force false positives
    out = (
        bloom_contamination(corpus, bench, mbits=16, nh=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (out["n_bloom"] >= out["n_overlap"]).all()  # no false negatives
    assert out.loc[0, "n_overlap"] > 0
    assert out.loc[2, "n_shingles"] == 0 and out.loc[2, "n_bloom"] == 0
    # with 16 bits, 1 hash and ~hundreds of distinct corpus shingles,
    # false positives are essentially certain
    assert (out["n_bloom"] > out["n_overlap"]).any()


def test_bloom_matches_exact_when_filter_is_large(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.contamination import bloom_contamination

    texts = [f"unique doc {i} with words {i*3} {i*5} {i*7}" for i in range(20)]
    bench = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(3, dtype=np.int64)),
                "text": pa.array(texts[:3]),
            }
        )
    )
    corpus = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(100, 120, dtype=np.int64)),
                "text": pa.array(texts),
            }
        )
    )
    out = bloom_contamination(corpus, bench, mbits=1 << 22, nh=4).to_pandas()
    # a 4M-bit filter over ~100 shingles: fp probability ~0
    assert (out["n_bloom"] == out["n_overlap"]).all()
