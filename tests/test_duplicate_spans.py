"""Duplicated-substring fractions (text_analysis.duplicate_spans) on a
planted corpus, broadcast-probe path vs the forced hash-join path."""

import numpy as np
import pyarrow as pa

import ray.data

from ugfraud_ray.pipelines.text_analysis import duplicate_spans


def _mkdocs():
    rng = np.random.default_rng(11)
    shared = "the quick brown fox jumps over the lazy dog again and again. "
    # genuinely unique bodies: random letters, no 16-gram crosses docs
    uniq = [
        "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz "), 80))
        for _ in range(8)
    ]
    texts = [
        shared * 3,                          # 0: fully duplicated vs 1
        shared * 3,                          # 1: exact copy of 0
        shared + uniq[0] * 2,                # 2: partially duplicated
        uniq[1] * 3,                         # 3: unique
        uniq[2] * 3,                         # 4: unique
        "tiny",                              # 5: < k chars -> md5 fallback fp
        "tiny",                              # 6: same tiny text -> shared fp
    ]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        }
    )


def _run(**kw):
    ds = ray.data.from_arrow(_mkdocs()).repartition(3)
    out = duplicate_spans(ds, **kw).to_pandas().sort_values("doc_id")
    return out.reset_index(drop=True)


def test_duplicate_spans_planted(ray_session):
    out = _run()
    by = {r.doc_id: r for r in out.itertuples()}
    assert by[0].dup_frac == 1.0 and by[1].dup_frac == 1.0  # exact copies
    assert 0.0 < by[2].dup_frac < 1.0                        # partial overlap
    assert by[3].dup_frac == 0.0 and by[4].dup_frac == 0.0   # unique
    assert by[5].dup_frac == 1.0 and by[6].dup_frac == 1.0   # tiny md5 twins
    assert (out["n_shared"] <= out["n_fp"]).all()
    np.testing.assert_allclose(
        out["dup_frac"], out["n_shared"] / out["n_fp"]
    )


def test_duplicate_spans_forced_join_path_parity(ray_session):
    a = _run()
    b = _run(local_vocab_threshold=0)
    assert a.equals(b)
