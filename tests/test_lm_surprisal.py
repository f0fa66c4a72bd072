"""lm_surprisal (text_analysis) vs a pure-Python trigram-LM mirror,
plus local/distributed-path agreement (local_threshold=0 forces the
h-bucketed union-join path)."""

import numpy as np
import pyarrow as pa

import ray.data

from ugfraud_ray.pipelines.text_analysis import lm_surprisal


def _naive(texts, min_count=2):
    tris = []  # (doc, trigram)
    for i, s in enumerate(texts):
        toks = [w for w in s.lower().split() if w]
        tris.append([tuple(toks[j : j + 3]) for j in range(len(toks) - 2)])
    model = {}
    for ts in tris:
        for tr in ts:
            model[tr] = model.get(tr, 0) + 1
    model = {k: v for k, v in model.items() if v >= min_count}
    total = sum(model.values())
    bt = total.bit_length()
    out = {}
    for i, ts in enumerate(tris):
        if not ts:
            continue
        n_hit = sum(1 for tr in ts if tr in model)
        s = sum(bt - model[tr].bit_length() for tr in ts if tr in model)
        out[i] = (len(ts), n_hit, s)
    return out


def _run(texts, **kw):
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    out = lm_surprisal(ds, **kw).to_pandas()
    return {
        int(r.doc_id): (int(r.n_trigrams), int(r.n_hit), int(r.surprisal_sum))
        for r in out.itertuples()
    }


TEXTS = [
    "the cat sat on the mat",
    "the cat sat on the mat",  # exact dup -> every trigram in-model
    "the dog sat on the mat today",
    "completely novel words never repeated anywhere",
    "xy",  # < 3 tokens -> no row
    "the cat sat",  # one trigram, repeated 3x corpus-wide
    "",
]


def test_surprisal_matches_naive(ray_session):
    exp = _naive(TEXTS)
    got = _run(TEXTS)
    assert got == exp
    assert 4 not in got and 6 not in got  # short/empty docs emit no row
    # the duplicated doc is fully in-model; the novel doc has zero hits
    assert got[0][1] == got[0][0]
    assert got[3][1] == 0 and got[3][2] == 0


def test_surprisal_distributed_path_agrees(ray_session):
    exp = _run(TEXTS)
    got = _run(TEXTS, local_threshold=0)
    assert got == exp
