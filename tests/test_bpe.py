"""BPE tokenizer training vs a naive pure-Python reference."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _naive_bpe(word_counts: dict[str, int], n_merges: int):
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for step in range(n_merges):
        pairs: dict[tuple, int] = {}
        for w, c in vocab.items():
            for i in range(len(w) - 1):
                pairs[(w[i], w[i + 1])] = pairs.get((w[i], w[i + 1]), 0) + c
        if not pairs:
            break
        best = max(pairs.values())
        pair = min(p for p, c in pairs.items() if c == best)
        merges.append((step, pair[0], pair[1], best))
        new_vocab = {}
        for w, c in vocab.items():
            out, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and (w[i], w[i + 1]) == pair:
                    out.append(w[i] + w[i + 1])
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _docs_from_words(word_counts: dict[str, int]) -> "ray.data.Dataset":
    # one doc per word occurrence, split across blocks
    texts = []
    for w, c in word_counts.items():
        texts.extend([w] * c)
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    return ray.data.from_arrow(t).repartition(4)


def test_bpe_train_matches_naive(ray_session):
    from ugfraud_ray.pipelines.bpe import bpe_train

    wc = {
        "lower": 5,
        "lowest": 3,
        "newer": 6,
        "wider": 2,
        "new": 4,
        "aaaa": 7,  # overlap case: (a,a) merges greedily left-to-right
        "banana": 2,
    }
    want = _naive_bpe(wc, 10)
    got = bpe_train(_docs_from_words(wc), n_merges=10)
    rows = list(
        zip(
            got["step"].to_pylist(),
            got["left"].to_pylist(),
            got["right"].to_pylist(),
            got["n"].to_pylist(),
        )
    )
    assert rows == want


def test_bpe_train_vocab_paths_agree(ray_session):
    from ugfraud_ray.pipelines.bpe import bpe_train

    wc = {"alpha": 3, "alps": 2, "beta": 5, "aaa": 4}
    ds = _docs_from_words(wc)
    a = bpe_train(ds, n_merges=6)
    b = bpe_train(ds, n_merges=6, local_threshold=0)  # forced grouped-sum path
    assert a.equals(b)
    # min_count floor drops hapax words before training
    c = bpe_train(ds, n_merges=6, min_count=3)
    assert c.num_rows > 0
    naive = _naive_bpe({w: n for w, n in wc.items() if n >= 3}, 6)
    rows = list(
        zip(
            c["step"].to_pylist(),
            c["left"].to_pylist(),
            c["right"].to_pylist(),
            c["n"].to_pylist(),
        )
    )
    assert rows == naive


def test_char_pair_counts_matches_naive(ray_session):
    from collections import Counter

    from ugfraud_ray.pipelines.bpe import char_pair_counts

    texts = ["Banana split  banana", "aa AA aaa", ""]
    t = pa.table(
        {"doc_id": pa.array(range(3), pa.int64()), "text": pa.array(texts)}
    )
    got = char_pair_counts(ray.data.from_arrow(t).repartition(2)).to_pandas()
    cnt: Counter = Counter()
    for tx in texts:
        for w in tx.lower().split():
            for i in range(len(w) - 1):
                cnt[(w[i], w[i + 1])] += 1
    want = {k: v for k, v in cnt.items()}
    gmap = {
        (r.left_sym, r.right_sym): int(r.n) for r in got.itertuples(index=False)
    }
    assert gmap == want


def test_bpe_encode_counts_matches_naive(ray_session):
    from ugfraud_ray.pipelines.bpe import bpe_encode_counts, bpe_train

    wc = {"lower": 4, "lowest": 3, "low": 6, "aaaa": 5, "newer": 2}
    ds = _docs_from_words(wc)
    merges = bpe_train(ds, n_merges=8)
    pairs = list(zip(merges["left"].to_pylist(), merges["right"].to_pylist()))

    def naive_encode(word: str) -> int:
        ranks = {p: i for i, p in enumerate(pairs)}
        sym = list(word)
        while len(sym) >= 2:
            ranked = [(ranks[p], p) for p in set(zip(sym, sym[1:])) if p in ranks]
            if not ranked:
                break
            _, pr = min(ranked)
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pr:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return len(sym)

    # encode a corpus containing trained and UNSEEN words
    texts = ["lower lowest zzz", "aaaa aaa low", ""]
    t = pa.table(
        {"doc_id": pa.array(range(3), pa.int64()), "text": pa.array(texts)}
    )
    out = bpe_encode_counts(
        ray.data.from_arrow(t).repartition(2), merges
    ).to_pandas()
    got = dict(zip(out["doc_id"].astype(int), out["n_tokens_bpe"].astype(int)))
    want = {
        d: sum(naive_encode(w) for w in tx.lower().split())
        for d, tx in enumerate(texts)
    }
    assert got == want
    assert got[2] == 0
