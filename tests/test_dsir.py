"""DSIR importance weights vs a naive Python mirror."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _low64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def _naive_dsir(ids, texts, langs, nbuckets, target="en"):
    ct = np.zeros(nbuckets, dtype=np.int64)
    cr = np.zeros(nbuckets, dtype=np.int64)
    feats = {}
    for d, txt, lg in zip(ids, texts, langs):
        toks = [w for w in txt.lower().split() if w]
        bs = [_low64(w) % nbuckets for w in toks] + [
            _low64(f"{a}\x1f{b}") % nbuckets for a, b in zip(toks, toks[1:])
        ]
        feats[d] = bs
        for b in bs:
            cr[b] += 1
            if lg == target:
                ct[b] += 1
    w = np.array(
        [int(t + 1).bit_length() - int(r + 1).bit_length() for t, r in zip(ct, cr)]
    )
    return {
        d: (len(bs), int(sum(w[b] for b in bs))) for d, bs in feats.items() if bs
    }


def test_dsir_weights_match_naive(ray_session):
    from ugfraud_ray.pipelines.curation import dsir_weights

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox",
        "zorro zorro zorro",
        "",          # zero tokens -> no row
        "   ",       # whitespace only -> no row
        "single",
        "la rapida volpe marrone salta sopra il cane pigro",
    ]
    langs = ["en", "en", "en", "en", "it", "en", "it"]
    ids = list(range(len(texts)))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(langs),
            }
        )
    ).repartition(3)
    nb = 64  # tiny bucket count to force collisions
    got = (
        dsir_weights(ds, nbuckets=nb)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _naive_dsir(ids, texts, langs, nb)
    assert list(got["doc_id"]) == sorted(want)
    for _, r in got.iterrows():
        nf, wt = want[r["doc_id"]]
        assert (r["n_features"], r["dsir_weight"]) == (nf, wt)


def test_quality_dedup_keeps_best_quality(ray_session):
    """Planted near-dup family: winner is the best-qsel doc, not the
    min id; singletons always kept."""
    from ugfraud_ray.pipelines.curation import _quality_selkey, quality_dedup

    base = " ".join(f"tok{i}" for i in range(80))
    # docs 0/1/2 near-dups; doc 1 has cleaner text (higher quality key)
    texts = [
        base + " !!!! #### %%%% ^^^^ &&&& ****",   # punct-heavy
        base + " tail words here",                 # clean
        base + " ;;;; @@@@ ???? <<<< >>>> ~~~~",   # punct-heavy
        "completely different content entirely",   # singleton
    ]
    ids = [0, 1, 2, 3]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    ds = ray.data.from_arrow(t).repartition(2)
    got = quality_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    qs = _quality_selkey(t)
    assert (got["qsel"].to_numpy() == qs).all()
    fam = got[got["cluster"] == got.loc[0, "cluster"]]
    assert len(fam) == 3, "docs 0-2 should cluster together"
    best = fam.sort_values(["qsel", "doc_id"], ascending=[False, True]).iloc[0]
    assert best["doc_id"] == 1 and best["kept"] == 1
    assert fam[fam["doc_id"] != 1]["kept"].sum() == 0
    assert got.loc[3, "kept"] == 1  # singleton


def test_ppl_buckets_naive(ray_session):
    """Bucket boundaries are exact 25/75 order statistics of the
    integer mean-surprisal key; mirror with a direct computation."""
    from ugfraud_ray.pipelines.curation import ppl_buckets
    from ugfraud_ray.pipelines.text_analysis import lm_surprisal

    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 40)))
        for _ in range(40)
    ] + ["too short", ""]  # excluded (<3 tokens)
    ids = list(range(len(texts)))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    ).repartition(3)
    got = ppl_buckets(ds, approx_docs=len(ids)).to_pandas().set_index("doc_id")
    sc = lm_surprisal(ds, approx_docs=len(ids)).to_pandas()
    key = ((sc["surprisal_sum"].to_numpy() * 1000) // sc["n_trigrams"].to_numpy()).astype(np.int64)
    srt = np.sort(key)
    n = len(srt)
    t1, t2 = srt[(n - 1) // 4], srt[(3 * (n - 1)) // 4]
    for did, k in zip(sc["doc_id"], key):
        want = "head" if k <= t1 else ("middle" if k <= t2 else "tail")
        assert got.loc[did, "bucket"] == want
        assert got.loc[did, "ppl_key"] == k
    assert 41 not in got.index and 40 not in got.index
