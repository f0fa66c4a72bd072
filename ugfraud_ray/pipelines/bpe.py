"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units").

The LLM-pipeline capability next to ``text_analysis.bpe_token_counts``
(which only COUNTS pretokens with a fixed regex): learn the merge table
itself from the corpus.

Classic BPE trains on the WORD-FREQUENCY vocabulary, not the raw
corpus: the distributed part is one (word, count) aggregation (per-block
``np.unique`` partials, grouped sum above the gate), after which the
vocabulary — dimension-sized relative to the corpus, and floored by
``min_count`` to cut the long junk tail a web crawl produces — lands on
the driver for the merge loop. That loop is fully vectorized over ONE
flat int-symbol array (no per-word Python): pair counting is a
lexsort/reduceat over packed (left<<32|right) keys weighted by word
counts, and merge application handles the classic aaa-overlap case with
a greedy keep-every-other-in-run rule, exactly the reference BPE
left-to-right semantics.

Determinism: the winning pair each step maximizes summed count with
ties broken by the LEXICOGRAPHIC (left, right) symbol strings, so the
merge table is a pure function of the corpus (block order cannot leak
in — counts are exact integer sums).

No reference analog (/root/reference is graph-only; md5 is its only
text scalar, Utils/helper.py:118-120).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table

_TOKRE = r"\s+"


def _word_partial(t: pa.Table, key: str) -> pa.Table:
    col = pc.utf8_lower(pc.utf8_trim_whitespace(pc.cast(t[key], pa.string())))
    lists = pc.split_pattern_regex(col, _TOKRE)
    flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
    flat = flat[flat != ""]
    u, c = np.unique(flat, return_counts=True)
    return pa.table({"word": pa.array(u, pa.string()), "n": pa.array(c.astype(np.int64))})


def word_vocab(
    docs: "ray.data.Dataset",
    key: str = "text",
    min_count: int = 1,
    approx_docs: int | None = None,
    local_threshold: int = 2_000_000,
) -> tuple[np.ndarray, np.ndarray]:
    """(words, counts) — the lowercased \\s+ word-frequency vocabulary.

    Per-block uniqued partials; driver merge below the doc gate, ONE
    (word) grouped sum above it. Either way the RESULT lands on the
    driver — that is BPE training's contract (the merge loop needs the
    whole vocabulary resident); ``min_count`` is the web-scale relief
    valve that drops the hapax tail before collection.
    """
    partials = docs.select_columns([key]).map_batches(
        lambda t: _word_partial(t, key), batch_format="pyarrow"
    )
    n_docs = approx_docs if approx_docs is not None else docs.count()
    if n_docs <= local_threshold:
        t = collect_table(partials)
        w = t["word"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(w, kind="stable")
        w, n = w[order], n[order]
        firsts = np.ones(len(w), dtype=bool)
        firsts[1:] = w[1:] != w[:-1]
        starts = np.flatnonzero(firsts)
        tot = np.add.reduceat(n, starts) if len(starts) else n[:0]
        w = w[starts]
    else:  # pragma: no cover - forced in tests via local_threshold=0
        from ray.data.aggregate import Sum

        t = collect_table(
            partials.groupby("word").aggregate(Sum("n", alias_name="n"))
        )
        w = t["word"].to_numpy(zero_copy_only=False)
        tot = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = tot >= min_count
    return w[keep], tot[keep]


def _train_merges(
    words: np.ndarray, counts: np.ndarray, n_merges: int
) -> pa.Table:
    """Driver-side vectorized merge loop over the resident vocabulary."""
    chars = sorted(set("".join(words.tolist())))
    sym_of = {c: i for i, c in enumerate(chars)}
    syms: list[str] = list(chars)
    flat = np.fromiter(
        (sym_of[c] for w in words.tolist() for c in w), dtype=np.int64
    )
    lens = np.fromiter((len(w) for w in words.tolist()), dtype=np.int64, count=len(words))
    wid = np.repeat(np.arange(len(words), dtype=np.int64), lens)
    wcnt = np.repeat(counts.astype(np.int64), lens)

    steps, lefts, rights, ns = [], [], [], []
    for step in range(n_merges):
        if len(flat) < 2:
            break
        adj = wid[:-1] == wid[1:]
        a, b, w = flat[:-1][adj], flat[1:][adj], wcnt[:-1][adj]
        if len(a) == 0:
            break
        if len(syms) >= (1 << 31):  # pragma: no cover
            raise ValueError("bpe_train: symbol table exceeds 2^31")
        pk = (a << np.int64(32)) | b
        order = np.argsort(pk, kind="stable")
        pks, ws = pk[order], w[order]
        starts = np.flatnonzero(np.concatenate([[True], pks[1:] != pks[:-1]]))
        tot = np.add.reduceat(ws, starts)
        upairs = pks[starts]
        best = int(tot.max())
        cand = upairs[tot == best]
        ca = (cand >> np.int64(32)).astype(np.int64)
        cb = (cand & np.int64(0xFFFFFFFF)).astype(np.int64)
        j = min(
            range(len(cand)), key=lambda i: (syms[ca[i]], syms[cb[i]])
        )
        A, B = int(ca[j]), int(cb[j])
        steps.append(step)
        lefts.append(syms[A])
        rights.append(syms[B])
        ns.append(best)
        new_id = len(syms)
        syms.append(syms[A] + syms[B])

        m = np.zeros(len(flat), dtype=bool)
        m[:-1] = (flat[:-1] == A) & (flat[1:] == B) & (wid[:-1] == wid[1:])
        pos = np.flatnonzero(m)
        if A == B and len(pos):
            # greedy left-to-right over aaa-runs: keep alternate matches
            run_start = np.concatenate([[True], np.diff(pos) != 1])
            run_id = np.cumsum(run_start) - 1
            first_of_run = pos[np.flatnonzero(run_start)]
            pos = pos[(pos - first_of_run[run_id]) % 2 == 0]
        flat[pos] = new_id
        drop = np.zeros(len(flat), dtype=bool)
        drop[pos + 1] = True
        keepm = ~drop
        flat, wid, wcnt = flat[keepm], wid[keepm], wcnt[keepm]

    return pa.table(
        {
            "step": pa.array(np.array(steps, dtype=np.int64)),
            "left": pa.array(lefts, pa.string()),
            "right": pa.array(rights, pa.string()),
            "n": pa.array(np.array(ns, dtype=np.int64)),
        }
    )


def bpe_train(
    docs: "ray.data.Dataset",
    n_merges: int = 16,
    key: str = "text",
    min_count: int = 1,
    approx_docs: int | None = None,
    local_threshold: int = 2_000_000,
) -> pa.Table:
    """Learn ``n_merges`` BPE merges: (step, left, right, n) with n the
    summed pair count the step merged. See module docstring."""
    w, c = word_vocab(
        docs,
        key=key,
        min_count=min_count,
        approx_docs=approx_docs,
        local_threshold=local_threshold,
    )
    return _train_merges(w, c, n_merges)


def char_pair_counts(
    docs: "ray.data.Dataset", key: str = "text"
) -> "ray.data.Dataset":
    """(left_sym, right_sym, n) — step-0 adjacent character-pair counts
    over word occurrences, the value-bearing oracled side channel of
    ``bpe_train`` (the merge loop itself is iterative and not
    SQL-expressible; its first iteration's count table is). Bounded by
    alphabet^2 rows: per-block uniqued partials into one tiny grouped
    sum, zero corpus-sized shuffles.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        col = pc.utf8_lower(pc.utf8_trim_whitespace(pc.cast(t[key], pa.string())))
        lists = pc.split_pattern_regex(col, _TOKRE)
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        flat = flat[flat != ""]
        if len(flat) == 0:
            return pa.table(
                {
                    "left_sym": pa.array([], pa.string()),
                    "right_sym": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        # one flat char stream with word ids (words are ASCII-or-not
        # agnostic: python-level char split keeps codepoints)
        lens = np.fromiter((len(x) for x in flat.tolist()), dtype=np.int64, count=len(flat))
        chs = np.asarray(list("".join(flat.tolist())), dtype=object)
        word = np.repeat(np.arange(len(flat), dtype=np.int64), lens)
        adj = word[:-1] == word[1:]
        l, r = chs[:-1][adj], chs[1:][adj]
        pk = np.char.add(np.char.add(l.astype(str), "\x1f"), r.astype(str))
        u, cnt = np.unique(pk, return_counts=True)
        parts = np.char.partition(u, "\x1f")
        return pa.table(
            {
                "left_sym": pa.array(parts[:, 0].astype(object), pa.string()),
                "right_sym": pa.array(parts[:, 2].astype(object), pa.string()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    return (
        docs.select_columns([key])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["left_sym", "right_sym"])
        .aggregate(Sum("n", alias_name="n"))
    )


class _BPEEncoder:
    """Actor-pool encoder: merge ranks built once per actor in
    ``__init__``; per-batch work encodes each DISTINCT word once and
    reuses it via the word cache (Zipf does the amortizing)."""

    def __init__(self, merge_rows: list[tuple[str, str]], key: str, id_col: str):
        self.ranks = {pair: i for i, pair in enumerate(merge_rows)}
        self.key = key
        self.id_col = id_col
        self.cache: dict[str, int] = {}

    def _encode_len(self, word: str) -> int:
        symbols = list(word)
        while len(symbols) >= 2:
            ranked = [
                (self.ranks[p], p)
                for p in set(zip(symbols, symbols[1:]))
                if p in self.ranks
            ]
            if not ranked:
                break
            _, pair = min(ranked)
            out, i = [], 0
            while i < len(symbols):
                if i + 1 < len(symbols) and (symbols[i], symbols[i + 1]) == pair:
                    out.append(symbols[i] + symbols[i + 1])
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            symbols = out
        return len(symbols)

    def __call__(self, t: pa.Table) -> pa.Table:
        col = pc.utf8_lower(pc.utf8_trim_whitespace(pc.cast(t[self.key], pa.string())))
        lists = pc.split_pattern_regex(col, _TOKRE)
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        rows = np.repeat(np.arange(len(lens)), lens)
        keep = flat != ""
        flat, rows = flat[keep], rows[keep]
        uniq, inv = np.unique(flat, return_inverse=True)
        enc = np.fromiter(
            (
                self.cache.get(w) or self.cache.setdefault(w, self._encode_len(w))
                for w in uniq.tolist()
            ),
            dtype=np.int64,
            count=len(uniq),
        )
        per_tok = enc[inv]
        n = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(n, rows, per_tok)
        return pa.table({self.id_col: t[self.id_col], "n_tokens_bpe": pa.array(n)})


def bpe_encode_counts(
    docs: "ray.data.Dataset",
    merges: pa.Table,
    key: str = "text",
    id_col: str = "doc_id",
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """(doc_id, n_tokens_bpe) — token counts under the TRAINED tokenizer
    (``bpe_train``'s merge table applied in rank order, the standard
    BPE encode; greedy left-to-right per merge, same semantics as
    training so train-set words re-segment identically). The merge
    table ships once per actor via ``fn_constructor_args``; scoring is
    one streaming pass."""
    from ugfraud_ray.functions.pools import actor_pool_size

    merge_rows = list(zip(merges["left"].to_pylist(), merges["right"].to_pylist()))
    return docs.select_columns([id_col, key]).map_batches(
        _BPEEncoder,
        fn_constructor_args=(merge_rows, key, id_col),
        batch_format="pyarrow",
        concurrency=actor_pool_size(concurrency),
    )
