"""Text-analysis operators over the `documents` table.

Training-data-pipeline additions (no direct reference analog; the
reference's only scalar text ops are id prefixing and md5, SURVEY §2.8):
language ID, quality features, token counting, rolling-hash
fingerprints. Everything is a vectorized ``map_batches`` stage —
pyarrow.compute regex kernels where possible, tight per-row loops only
for the rolling hash (which is O(len) anyway).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ugfraud_ray.functions.pools import actor_pool_size

# character classes chosen to match the DuckDB/RE2 POSIX classes used by
# the oracle SQL exactly (ASCII): see __ray_entry__.oracle_sql
_DIGIT_RE = "[0-9]"
_SPACE_RE = "[\t\n\x0b\x0c\r ]"
_PUNCT_RE = r"""[!-/:-@\[-`{-~]"""
_TOKEN_RE = r"[\s\S]"  # unused placeholder


def token_counts(
    docs: "ray.data.Dataset", key: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """(doc_id, n_tokens): count of non-empty whitespace-separated tokens."""

    def f(t: pa.Table) -> pa.Table:
        n = np.array([len(s.split()) for s in t[key].to_pylist()], dtype=np.int64)
        return pa.table({id_col: t[id_col], "n_tokens": pa.array(n)})

    return docs.map_batches(f, batch_format="pyarrow")


# GPT-2-style pretokenizer, RE2-safe (no lookahead: the original's
# `\s+(?!\S)` trailing-space rule is dropped; instead `\s+` runs merge,
# which only changes counts on multi-space runs). Alternation order
# matters and RE2 uses leftmost-first here, same as DuckDB's RE2.
_BPE_RE = r"'(s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\t\n\x0b\x0c\r ]+|[\t\n\x0b\x0c\r ]+"


def bpe_token_counts(
    docs: "ray.data.Dataset", key: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """(doc_id, n_bpe_tokens): non-overlapping matches of a BPE-ish
    pretokenizer regex — the byte-pair-encoding *pretoken* count, the
    usual proxy for LLM token budget at corpus scale. One vectorized
    RE2 kernel per batch; no Python loop."""

    def f(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(t[key], _BPE_RE), pa.int64())
        return pa.table({id_col: t[id_col], "n_bpe_tokens": n})

    return docs.map_batches(f, batch_format="pyarrow")


def quality_features(
    docs: "ray.data.Dataset", key: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """(doc_id, n_chars, n_digits, n_spaces, n_punct) — all Arrow kernels."""

    def f(t: pa.Table) -> pa.Table:
        col = t[key]
        return pa.table(
            {
                id_col: t[id_col],
                "n_chars": pc.cast(pc.utf8_length(col), pa.int64()),
                "n_digits": pc.cast(pc.count_substring_regex(col, _DIGIT_RE), pa.int64()),
                "n_spaces": pc.cast(pc.count_substring_regex(col, _SPACE_RE), pa.int64()),
                "n_punct": pc.cast(pc.count_substring_regex(col, _PUNCT_RE), pa.int64()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def quality_score(
    docs: "ray.data.Dataset", key: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Heuristic [0,1] quality score from length/punct/space ratios."""

    def f(t: pa.Table) -> pa.Table:
        n_chars = pc.utf8_length(t[key]).to_numpy(zero_copy_only=False).astype(np.float64)
        n_sp = pc.count_substring_regex(t[key], _SPACE_RE).to_numpy(zero_copy_only=False)
        n_pu = pc.count_substring_regex(t[key], _PUNCT_RE).to_numpy(zero_copy_only=False)
        nz = np.maximum(n_chars, 1.0)
        space_ratio = n_sp / nz
        punct_ratio = n_pu / nz
        len_score = np.clip(n_chars / 500.0, 0.0, 1.0)
        # reasonable text has some spaces (0.1-0.25) and few punct chars
        space_score = 1.0 - np.clip(np.abs(space_ratio - 0.17) / 0.17, 0.0, 1.0)
        punct_score = 1.0 - np.clip(punct_ratio / 0.2, 0.0, 1.0)
        score = (len_score + space_score + punct_score) / 3.0
        return pa.table({id_col: t[id_col], "quality": pa.array(score)})

    return docs.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# language ID — character-n-gram profile heuristic
# ---------------------------------------------------------------------------

# tiny per-language marker sets (function words + diacritics); a real
# deployment would load fasttext in __init__ — the Ray-side plumbing
# (actor pool, batch scoring) is identical.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "with", "for", "that"),
    "de": ("der", "die", "und", "ist", "das", "nicht", "mit", "ein"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "que"),
    "es": ("el", "la", "los", "que", "es", "una", "para", "con"),
    "it": ("il", "la", "che", "di", "e", "per", "una", "sono"),
    "zh": tuple("的是不了在有人这中大"),
}


class LanguageID:
    """Actor-pool stage: marker tables prepared once per actor."""

    def __init__(self, key: str = "text", id_col: str = "doc_id"):
        self.key = key
        self.id_col = id_col
        self.word_markers = {
            lang: frozenset(m) for lang, m in _LANG_MARKERS.items() if lang != "zh"
        }
        self.zh_chars = frozenset(_LANG_MARKERS["zh"])

    def __call__(self, t: pa.Table) -> pa.Table:
        langs = []
        confs = []
        for text in t[self.key].to_pylist():
            if any(ord(c) > 0x2E80 for c in text[:200]):
                langs.append("zh")
                confs.append(1.0)
                continue
            toks = text.lower().split()
            if not toks:
                langs.append("und")
                confs.append(0.0)
                continue
            tokset = toks[:200]
            best_lang, best = "und", 0
            for lang, markers in self.word_markers.items():
                score = sum(1 for w in tokset if w in markers)
                if score > best:
                    best_lang, best = lang, score
            langs.append(best_lang)
            confs.append(min(1.0, best / max(1, len(tokset)) * 10))
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "lang_pred": pa.array(langs, pa.string()),
                "lang_conf": pa.array(confs, pa.float64()),
            }
        )


def language_id(
    docs: "ray.data.Dataset", key: str = "text", id_col: str = "doc_id", concurrency: int = 2
) -> "ray.data.Dataset":
    return docs.map_batches(
        LanguageID,
        fn_constructor_args=(key, id_col),
        batch_format="pyarrow",
        concurrency=actor_pool_size(concurrency),
    )


# ---------------------------------------------------------------------------
# document fingerprinting — winnowed rolling hash
# ---------------------------------------------------------------------------


def fingerprints(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    window: int = 8,
) -> "ray.data.Dataset":
    """(doc_id, fp:int64) winnowing fingerprints (Schleimer et al. 2003).

    Rolling polynomial hash over k-char grams; one fingerprint per
    winnowing window (the min hash in each window, deduped) — the
    standard local fingerprinting scheme for copy detection.
    """
    B = np.uint64(257)
    BK = np.uint64(pow(257, k - 1, 1 << 64))

    def f(t: pa.Table) -> pa.Table:
        ids_out, fps_out = [], []
        for i, text in zip(t[id_col].to_pylist(), t[key].to_pylist()):
            data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            n = len(data)
            if n < k:
                h = int.from_bytes(hashlib.md5(text.encode()).digest()[:8], "little")
                ids_out.append(i)
                fps_out.append(h & 0x7FFFFFFFFFFFFFFF)
                continue
            # vectorized rolling hash: prefix powers trick
            m = n - k + 1
            hashes = np.zeros(m, dtype=np.uint64)
            h0 = np.uint64(0)
            for j in range(k):
                h0 = h0 * B + data[j]
            hashes[0] = h0
            for j in range(1, m):
                h0 = (h0 - data[j - 1] * BK) * B + data[j + k - 1]
                hashes[j] = h0
            if m <= window:
                sel = np.array([hashes.argmin()])
            else:
                w = np.lib.stride_tricks.sliding_window_view(hashes, window)
                sel = np.unique(w.argmin(axis=1) + np.arange(len(w)))
            for s in np.unique(hashes[sel]):
                ids_out.append(i)
                fps_out.append(int(s) & 0x7FFFFFFFFFFFFFFF)
        return pa.table(
            {id_col: pa.array(ids_out, pa.int64()), "fp": pa.array(fps_out, pa.int64())}
        )

    return docs.map_batches(f, batch_format="pyarrow")


def _explode_tokens(t: pa.Table, key: str):
    """(flat_tokens, row_idx) for the lowercased RE2-\\s+ tokenization
    (same tokenizer as top_tokens / the SQL oracles), empties dropped."""
    col = pc.utf8_lower(pc.utf8_trim_whitespace(t[key]))
    lists = pc.split_pattern_regex(col, r"\s+")
    flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    rows = np.repeat(np.arange(len(lens)), lens)
    keep = flat != ""
    return flat[keep], rows[keep]


def distinctive_terms(
    docs: "ray.data.Dataset",
    k: int = 3,
    common_df_pct: int = 10,
    key: str = "text",
    id_col: str = "doc_id",
    approx_docs: int | None = None,
) -> "ray.data.Dataset":
    """(doc_id, token, tf, rnk): each document's k most frequent tokens
    EXCLUDING corpus-common tokens (document frequency · 100 >
    common_df_pct · N, integer comparison) — the TF-IDF shape with a
    bit-exact integer ranking (tf desc, token asc), no float idf.

    Two passes, both scale-true:
    1. document frequency — per-block (token, partial_df) partials
       (each doc's tokens uniqued first), then a vocabulary-sized
       groupby-sum (driver-local below the ``approx_docs`` hint). Only
       the COMMON-token set is collected and broadcast: it is heavy
       hitters by construction, ≤ ~100/common_df_pct × the average
       per-doc distinct-token count, regardless of corpus size.
    2. per-doc term frequencies via one run-length encoding over the
       (row, token)-sorted token stream, commons dropped with a single
       vectorized ``pc.index_in`` probe, per-doc top-k by stable
       segment ranking. No Python loop over rows or tokens.
    """
    from ray.data.aggregate import Sum

    def df_partial(t: pa.Table) -> pa.Table:
        flat, rows = _explode_tokens(t, key)
        order = np.lexsort((rows, flat))
        f, r = flat[order], rows[order]
        first = np.ones(len(f), dtype=bool)
        first[1:] = (f[1:] != f[:-1]) | (r[1:] != r[:-1])
        uniq, counts = np.unique(f[first], return_counts=True)
        return pa.table(
            {"token": pa.array(uniq, pa.string()), "df": pa.array(counts.astype(np.int64))}
        )

    partials = docs.map_batches(df_partial, batch_format="pyarrow")
    n_docs = approx_docs if approx_docs is not None else docs.count()
    if approx_docs is not None and approx_docs <= 2_000_000:
        from ugfraud_ray.functions.collect import collect_table

        pt = collect_table(partials)
        toks = pt["token"].to_numpy(zero_copy_only=False)
        dfs = pt["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(toks, return_inverse=True)
        tot = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(tot, inv, dfs)
        common = uniq[tot * 100 > common_df_pct * n_docs]
        common_arr = pa.array(common, pa.string())
    else:
        df_tab = partials.groupby("token").aggregate(Sum("df", alias_name="df"))

        def only_common(t: pa.Table) -> pa.Table:
            m = pc.greater(pc.multiply(t["df"], 100), common_df_pct * n_docs)
            return t.filter(m).select(["token"])

        from ugfraud_ray.functions.collect import collect_table

        common_arr = collect_table(
            df_tab.map_batches(only_common, batch_format="pyarrow")
        )["token"].combine_chunks()
    common_ref = ray.put(common_arr)

    def tf_topk(t: pa.Table) -> pa.Table:
        flat, rows = _explode_tokens(t, key)
        commons = ray.get(common_ref)
        if len(commons):
            hit = pc.index_in(pa.array(flat), value_set=commons).to_numpy(
                zero_copy_only=False
            )
            keep = np.isnan(hit.astype(np.float64))
            flat, rows = flat[keep], rows[keep]
        order = np.lexsort((flat, rows))
        f, r = flat[order], rows[order]
        new = np.ones(len(f), dtype=bool)
        new[1:] = (f[1:] != f[:-1]) | (r[1:] != r[:-1])
        starts = np.flatnonzero(new)
        tf = np.diff(np.append(starts, len(f)))
        tok_u, row_u = f[starts], r[starts]
        o2 = np.lexsort((tok_u, -tf, row_u))
        row_s, tok_s, tf_s = row_u[o2], tok_u[o2], tf[o2]
        grp = np.ones(len(row_s), dtype=bool)
        grp[1:] = row_s[1:] != row_s[:-1]
        pos = np.arange(len(row_s))
        rnk = pos - np.maximum.accumulate(np.where(grp, pos, 0)) + 1
        sel = rnk <= k
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(ids[row_s[sel]]),
                "token": pa.array(tok_s[sel], pa.string()),
                "tf": pa.array(tf_s[sel].astype(np.int64)),
                "rnk": pa.array(rnk[sel].astype(np.int64)),
            }
        )

    return docs.map_batches(tf_topk, batch_format="pyarrow")


def top_tokens(
    docs: "ray.data.Dataset",
    k: int = 100,
    key: str = "text",
) -> "ray.data.Dataset":
    """(token, n, rnk): the corpus's k most frequent lowercased
    whitespace-separated tokens, ties broken token-ascending.

    The classic vocabulary shuffle, kept narrow by PRE-AGGREGATING
    inside map_batches: each block tokenizes with Arrow kernels
    (utf8_lower + RE2 split), collapses to per-block (token, count)
    partials via np.unique, and only the block's distinct vocabulary —
    not one row per token occurrence — enters the groupby. The
    post-aggregate table is vocabulary-sized, so the final
    sort-and-limit is cheap at any corpus scale.
    """

    def partial(t: pa.Table) -> pa.Table:
        col = pc.utf8_lower(pc.utf8_trim_whitespace(t[key]))
        toks = pc.list_flatten(pc.split_pattern_regex(col, r"\s+"))
        arr = toks.to_numpy(zero_copy_only=False)
        arr = arr[arr != ""]
        uniq, counts = np.unique(arr, return_counts=True)
        return pa.table(
            {
                "token": pa.array(uniq, pa.string()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )

    def rank(t: pa.Table) -> pa.Table:
        toks = t["token"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((toks, -n))[:k]
        return pa.table(
            {
                "token": pa.array(toks[order], pa.string()),
                "n": pa.array(n[order]),
                "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    # per-block top-k partials, then one driver-side merge of ≤ P·k rows
    parts = agg.map_batches(rank, batch_format="pyarrow")
    from ugfraud_ray.functions.collect import collect_table

    merged = collect_table(parts.select_columns(["token", "n"]))
    return ray.data.from_arrow(rank(merged))


def repetition_stats(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> "ray.data.Dataset":
    """Within-document repetition (Gopher-style quality signal).

    (id, n_ngrams, n_distinct) over word n-gram shingles — a document
    whose distinct/total shingle ratio is low is boilerplate or a
    degenerate repeat. Uses the engine's shared 64-bit shingle chain
    (`pipelines.dedup._shingle_hashes`), so the SQL oracle reuses the
    same bit-exact CTEs; counts are integers — no float gate. Pure
    per-batch map: no shuffle, no state.
    """
    from ugfraud_ray.pipelines.dedup import _shingle_hashes

    def stats(t: pa.Table) -> pa.Table:
        n_tot = np.empty(t.num_rows, dtype=np.int64)
        n_dis = np.empty(t.num_rows, dtype=np.int64)
        for i, text in enumerate(t[key].to_pylist()):
            sh = _shingle_hashes(text, ngram)
            n_tot[i] = len(sh)
            n_dis[i] = len(np.unique(sh))
        return pa.table(
            {
                id_col: t[id_col],
                "n_ngrams": pa.array(n_tot),
                "n_distinct": pa.array(n_dis),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow")


def boilerplate_stats(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    min_docs: int = 3,
    pct: int = 50,
    local_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Cross-document boilerplate detection: a shingle is *boilerplate*
    when it appears in >= min_docs distinct documents; a document is
    flagged when boilerplate shingles make up >= pct% of its distinct
    shingles. The web-corpus companion to `repetition_stats` (within-doc)
    and `contamination_check` (vs a fixed suite): here the "suite" is the
    corpus itself, so the document-frequency pass is a real shuffle.

    Output: (doc_id, n_shingles, n_boiler, is_boilerplate) — integer-only
    (the flag uses n_boiler*100 >= pct*n_shingles), so the SQL replay is
    bit-exact. Docs whose text yields zero shingles are absent (as in the
    grouped SQL).

    Scale shape: distinct (doc_id, shingle) pairs are hash-bucketed by
    shingle into 64 coarse buckets (ONE shuffle); each bucket computes
    run-length document frequencies and per-doc partial counts, and a
    doc_id groupby sums the ≤64 partials per doc. Small corpora run the
    identical kernel driver-local.
    """
    from ugfraud_ray.functions.collect import collect_table
    from ugfraud_ray.pipelines.dedup import _shingle_hashes

    def emit_pairs(t: pa.Table) -> pa.Table:
        ids, shs = [], []
        for i, text in zip(t[id_col].to_pylist(), t[key].to_pylist()):
            u = np.unique(_shingle_hashes(text, ngram))
            if len(u):
                ids.append(np.full(len(u), i, dtype=np.int64))
                shs.append(u)
        if not ids:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "sh": pa.array([], pa.uint64())}
            )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(ids)),
                "sh": pa.array(np.concatenate(shs), pa.uint64()),
            }
        )

    pairs = docs.select_columns([id_col, key]).map_batches(
        emit_pairs, batch_format="pyarrow"
    )

    def bucket_kernel(ids: np.ndarray, sh: np.ndarray) -> pa.Table:
        """Per-doc (n_shingles_partial, n_boiler_partial) for one shingle
        bucket; df per shingle = run length (pairs are doc-distinct)."""
        order = np.argsort(sh, kind="stable")
        ids, sh = ids[order], sh[order]
        starts = np.flatnonzero(np.concatenate([[True], np.diff(sh.astype(np.int64)) != 0])) if len(sh) else np.zeros(0, np.int64)
        df = np.diff(np.append(starts, len(sh)))
        boiler_row = np.repeat(df >= min_docs, df)
        uids, inv = np.unique(ids, return_inverse=True)
        ns = np.bincount(inv)
        nb = np.bincount(inv, weights=boiler_row.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(uids),
                "ns": pa.array(ns.astype(np.int64)),
                "nb": pa.array(nb),
            }
        )

    def finalize(t: pa.Table) -> pa.Table:
        ns = t["n_shingles"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t["n_boiler"].to_numpy(zero_copy_only=False).astype(np.int64)
        flag = ((nb * 100 >= pct * ns) & (ns > 0)).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_shingles": pa.array(ns),
                "n_boiler": pa.array(nb),
                "is_boilerplate": pa.array(flag),
            }
        )

    try:
        n_docs = docs.count()
    except Exception:
        n_docs = None
    if n_docs is not None and n_docs <= local_threshold:
        t = collect_table(pairs)
        part = bucket_kernel(
            t[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
            t["sh"].to_numpy(zero_copy_only=False).astype(np.uint64),
        )
        out = part.rename_columns([id_col, "n_shingles", "n_boiler"])
        return ray.data.from_arrow(finalize(out))

    from ugfraud_ray.functions.bucketing import n_coarse_buckets

    # shingle rows ≈ tokens per doc × docs; 128 is the same expansion
    # convention as exact_shingle_jaccard's n_exp hint
    nb = np.uint64(n_coarse_buckets(n_docs * 128 if n_docs is not None else None))

    def bucketize(t: pa.Table) -> pa.Table:
        h = t["sh"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = h * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(29)
        return t.append_column("_sb", pa.array((h % nb).astype(np.int64)))

    def per_bucket(g) -> pa.Table:
        return bucket_kernel(
            g[id_col].to_numpy().astype(np.int64),
            g["sh"].to_numpy().astype(np.uint64),
        )

    from ray.data.aggregate import Sum

    summed = (
        pairs.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_sb")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("ns", alias_name="n_shingles"), Sum("nb", alias_name="n_boiler"))
    )
    return summed.map_batches(finalize, batch_format="pyarrow")


def source_quality_rollup(
    docs: "ray.data.Dataset", key: str = "text", source_col: str = "source"
) -> "ray.data.Dataset":
    """Per-source corpus curation readout: (source, n_docs, total_chars,
    total_tokens, avg_tokens). Integer partial sums per block (the
    source domain is tiny) -> one grouped sum; avg_tokens mirrors the
    SQL op-for-op (int sum * 1.0 / count, round 9). The per-source
    quality dashboard every crawl-curation pipeline keeps."""

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        n_chars = pc.utf8_length(t[key]).to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = np.array([len(s.split()) for s in t[key].to_pylist()], dtype=np.int64)
        df = pd.DataFrame(
            {"source": t[source_col].to_pylist(), "c": n_chars, "k": n_tok}
        )
        g = df.groupby("source", sort=False).agg(
            n=("c", "size"), c=("c", "sum"), k=("k", "sum")
        ).reset_index()
        return pa.table(
            {
                "source": pa.array(g["source"].tolist(), pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64)),
                "c": pa.array(g["c"].to_numpy().astype(np.int64)),
                "k": pa.array(g["k"].to_numpy().astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        docs.select_columns([source_col, key])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("c", alias_name="total_chars"),
            Sum("k", alias_name="total_tokens"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t["n_docs"].to_numpy(zero_copy_only=False).astype(np.float64)
        k = t["total_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column("avg_tokens", pa.array(np.round(k * 1.0 / n, 9)))

    return agg.map_batches(finalize, batch_format="pyarrow")


def oov_stats(
    docs: "ray.data.Dataset",
    vocab_k: int = 100,
    key: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Vocabulary-coverage quality filter: (doc_id, n_tokens, n_oov) —
    tokens outside the corpus's own top-`vocab_k` vocabulary
    (`top_tokens`, deterministic count-desc/token-asc tie-break). The
    classic cheap LM-free proxy for perplexity filtering, integer-only
    so the SQL replay is exact.

    Two passes: the vocabulary shuffle (pre-aggregated, vocab-sized),
    then the vocabulary broadcast once via ray.put and a streaming
    per-batch membership probe (sorted-array searchsorted — never a
    join against the corpus side)."""
    from ugfraud_ray.functions.collect import collect_table

    vocab_tbl = collect_table(top_tokens(docs, k=vocab_k, key=key))
    vocab = np.sort(vocab_tbl["token"].to_numpy(zero_copy_only=False))
    vocab_ref = ray.put(vocab)

    def f(t: pa.Table) -> pa.Table:
        # SAME tokenizer as the vocabulary build (_explode_tokens: Arrow
        # utf8_lower + RE2 \s+ split) — a second tokenizer (str.split)
        # disagrees on Unicode whitespace/casing and would make
        # n_tokens/n_oov inconsistent with the vocab's own token stream
        vb = ray.get(vocab_ref)
        flat, rows = _explode_tokens(t, key)
        n_tok = np.bincount(rows, minlength=t.num_rows).astype(np.int64)
        if len(flat) and len(vb):
            pos = np.clip(np.searchsorted(vb, flat), 0, len(vb) - 1)
            oov_rows = rows[vb[pos] != flat]
        else:
            oov_rows = rows
        n_oov = np.bincount(oov_rows, minlength=t.num_rows).astype(np.int64)
        return pa.table(
            {id_col: t[id_col], "n_tokens": pa.array(n_tok), "n_oov": pa.array(n_oov)}
        )

    return docs.select_columns([id_col, key]).map_batches(f, batch_format="pyarrow")


def _postings_block(tokens: np.ndarray, doc_ids: np.ndarray, min_df: int) -> pa.Table:
    """(token, df, postings) from distinct (token, doc_id) pairs.

    lexsort by (token, doc_id) -> run boundaries -> df via run lengths;
    postings = ','-joined ascending doc ids per run."""
    if len(tokens) == 0:
        return pa.table(
            {
                "token": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "postings": pa.array([], pa.string()),
            }
        )
    order = np.lexsort((doc_ids, tokens))
    tok, ids = tokens[order], doc_ids[order]
    starts = np.flatnonzero(np.concatenate([[True], tok[1:] != tok[:-1]]))
    ends = np.concatenate([starts[1:], [len(tok)]])
    df = ends - starts
    keep = df >= min_df
    ids_str = ids.astype(str)
    postings = [",".join(ids_str[s:e]) for s, e in zip(starts[keep], ends[keep])]
    return pa.table(
        {
            "token": pa.array(tok[starts[keep]], pa.string()),
            "df": pa.array(df[keep].astype(np.int64)),
            "postings": pa.array(postings, pa.string()),
        }
    )


def inverted_index(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    local_threshold: int = 2_000_000,
    approx_pairs: int | None = None,
) -> "ray.data.Dataset":
    """(token, df, postings): the IR inverted-index build over the corpus.

    df = number of distinct documents containing the token; postings =
    ','-joined ascending doc ids (the posting list; deterministic).
    Reference analog: `get_edge_attributes_index` inverts attr -> [ids]
    (/root/reference Utils/helper.py:296-312) — this is that inversion
    over the token domain at corpus scale.

    Scale shape: each block emits DISTINCT (token, doc_id) pairs (one
    row per document-term, never per occurrence — each doc lives in
    exactly one block so per-block distinct is globally distinct), then
    ONE coarse 64-bucket token-hash shuffle; per bucket the posting
    lists assemble vectorized (lexsort + run boundaries). A per-token
    hash aggregate (vocabulary-sized groups) is the measured slow path.
    Tokenizer shared with top_tokens (lower + RE2 \\s+ split).
    """

    def pairs(t: pa.Table) -> pa.Table:
        flat, rows = _explode_tokens(t, key)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[rows]
        # distinct (token, doc) within the block: lexsort + run mask
        if len(flat):
            order = np.lexsort((ids, flat))
            ftok, fid = flat[order], ids[order]
            first = np.concatenate([[True], (ftok[1:] != ftok[:-1]) | (fid[1:] != fid[:-1])])
            ftok, fid = ftok[first], fid[first]
        else:
            ftok, fid = flat, ids
        return pa.table(
            {"token": pa.array(ftok, pa.string()), "doc_id": pa.array(fid)}
        )

    pair_ds = docs.select_columns([id_col, key]).map_batches(pairs, batch_format="pyarrow")

    if approx_pairs is not None and approx_pairs <= local_threshold:
        from ugfraud_ray.functions.collect import collect_table

        t = collect_table(pair_ds)
        return ray.data.from_arrow(
            _postings_block(
                t["token"].to_numpy(zero_copy_only=False),
                t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                min_df,
            )
        )

    from ugfraud_ray.functions.bucketing import n_coarse_buckets

    nb = np.uint64(n_coarse_buckets(approx_pairs))

    def bucketize(t: pa.Table) -> pa.Table:
        import pandas as pd

        h = pd.util.hash_array(t["token"].to_numpy(zero_copy_only=False).astype(object))
        return t.append_column("_cb", pa.array((h % nb).astype(np.int64)))

    def per_bucket(g) -> pa.Table:
        return _postings_block(
            g["token"].to_numpy().astype(object),
            g["doc_id"].to_numpy().astype(np.int64),
            min_df,
        )

    return (
        pair_ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def bm25_scores(
    docs: "ray.data.Dataset",
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    key: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """(doc_id, score): Okapi BM25 of every document against a fixed
    query-term set — the standard relevance readout over the corpus
    (Robertson–Spärck Jones idf, the +1 'BM25+' log form). Tokenizer is
    the shared ``_explode_tokens`` (Arrow lower + RE2 \\s+), so the SQL
    oracle replays token streams exactly. No reference analog (UGFraud
    has no ranking); the inverted_index / distinctive_terms ops cover
    the integer half of TF-IDF, this adds the float scorer.

    Float replay contract: df/dl/tf/N/total_len are EXACT integers;
    idf_t = ln((N − df + 0.5)/(df + 0.5) + 1) and avgdl = total/N are
    one-expression floats; per-doc score sums terms in ASCENDING term
    order with the per-term factor written
    ``idf · (tf·(k1+1))/(tf + k1·(1 − b + b·dl/avgdl))`` — the SQL
    pivot mirrors the same association order; readout rounds to 9.

    Scale shape: one stateless pass emits per-doc (dl, tf per term)
    rows (query set broadcast in the closure, tiny); corpus stats come
    from Ray integer aggregates; scoring streams with the idf vector in
    the closure. No shuffle at all beyond the tiny aggregates.
    """
    from ugfraud_ray.functions.collect import collect_table

    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("bm25_scores: empty query_terms")
    tcols = [f"tf{i}" for i in range(len(terms))]
    tarr = np.array(terms)

    def per_doc(t: pa.Table) -> pa.Table:
        flat, rows = _explode_tokens(t, key)
        n = t.num_rows
        dl = np.bincount(rows, minlength=n).astype(np.int64)
        out = {id_col: t[id_col], "dl": pa.array(dl)}
        pos = np.searchsorted(tarr, flat)
        pos_c = np.clip(pos, 0, len(tarr) - 1)
        hit = tarr[pos_c] == flat
        for i, c in enumerate(tcols):
            m = hit & (pos_c == i)
            out[c] = pa.array(np.bincount(rows[m], minlength=n).astype(np.int64))
        return pa.table(out)

    tf = docs.map_batches(per_doc, batch_format="pyarrow").materialize()
    n_docs = tf.count()
    if n_docs == 0:
        raise ValueError("bm25_scores: empty corpus")
    sums = tf.sum(["dl"] + tcols + [])  # dict of exact integer sums
    total_len = int(sums["sum(dl)"])
    # df per term: docs with tf > 0 — exact integer aggregate
    def df_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {c: pa.array([int((t[c].to_numpy(zero_copy_only=False) > 0).sum())]) for c in tcols}
        )

    dft = collect_table(tf.map_batches(df_partial, batch_format="pyarrow"))
    dfs = [int(np.sum(dft[c].to_numpy(zero_copy_only=False))) for c in tcols]
    avgdl = float(total_len) / float(n_docs)
    idf = [
        float(np.log((n_docs - d + 0.5) / (d + 0.5) + 1.0)) for d in dfs
    ]

    def score(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.zeros(t.num_rows, dtype=np.float64)
        denom_base = k1 * (1.0 - b + b * dl / avgdl)
        for i, c in enumerate(tcols):  # ascending term order, fixed
            tfv = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            s = s + idf[i] * (tfv * (k1 + 1.0)) / (tfv + denom_base)
        return pa.table(
            {
                id_col: t[id_col],
                "score": pa.array(np.floor(s * 1e9 + 0.5) / 1e9),
            }
        )

    return tf.map_batches(score, batch_format="pyarrow")


def bigram_pmi(
    docs: "ray.data.Dataset",
    min_count: int = 5,
    topk: int = 30,
    key: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Top-k collocations: adjacent-token bigrams ranked by pointwise
    mutual information pmi = ln(((c_xy / c_x) / c_y) · T) with T = total
    bigram count — the standard phrase-mining / tokenizer-merge-rule
    readout. Tokenizer is the shared ``_explode_tokens`` stream
    (empties dropped BEFORE pairing, so bigrams can span a run of
    whitespace); counts are exact integers, pmi is one fixed float
    expression rounded to 9, rank ties break by (x, y).

    Scale shape: per-block ``np.unique`` pre-aggregation of bigram
    partials, ONE sort-based groupby-sum over (x, y), min_count filter
    bounds the survivor set to ≤ T/min_count rows, and the unigram
    counts for survivors come from a second stateless pass with the
    (small) survivor-token set broadcast in the closure — the corpus
    vocabulary is never collected.
    """
    from ugfraud_ray.functions.collect import collect_table
    from ray.data.aggregate import Sum

    def bigram_partials(t: pa.Table) -> pa.Table:
        flat, rows = _explode_tokens(t, key)
        if len(flat) < 2:
            return pa.table(
                {"x": pa.array([], pa.string()), "y": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        same = rows[:-1] == rows[1:]
        x, y = flat[:-1][same], flat[1:][same]
        # integer-code packing (numpy unicode arrays strip embedded NULs,
        # so string concat packing is unsafe)
        ux, ixv = np.unique(x, return_inverse=True)
        uy, iyv = np.unique(y, return_inverse=True)
        code = ixv.astype(np.int64) * len(uy) + iyv
        uniq, counts = np.unique(code, return_counts=True)
        return pa.table(
            {
                "x": pa.array(ux[uniq // len(uy)]),
                "y": pa.array(uy[uniq % len(uy)]),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    counts = (
        docs.map_batches(bigram_partials, batch_format="pyarrow")
        .groupby(["x", "y"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    total = int(counts.sum("n") or 0)
    surv = collect_table(counts.filter(expr=f"n >= {int(min_count)}"))
    sx = surv["x"].to_numpy(zero_copy_only=False)
    sy = surv["y"].to_numpy(zero_copy_only=False)
    sn = surv["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.unique(np.concatenate([sx, sy])) if len(sx) else np.array([], dtype=str)

    def unigram_partials(t: pa.Table) -> pa.Table:
        flat, _ = _explode_tokens(t, key)
        if len(flat) == 0 or len(vocab) == 0:
            return pa.table({"tok": pa.array([], pa.string()), "c": pa.array([], pa.int64())})
        pos = np.clip(np.searchsorted(vocab, flat), 0, len(vocab) - 1)
        hit = vocab[pos] == flat
        c = np.bincount(pos[hit], minlength=len(vocab)).astype(np.int64)
        nz = np.flatnonzero(c)
        return pa.table({"tok": pa.array(vocab[nz]), "c": pa.array(c[nz])})

    ut = collect_table(docs.map_batches(unigram_partials, batch_format="pyarrow"))
    uc = np.zeros(len(vocab), dtype=np.int64)
    if ut.num_rows:
        pos = np.searchsorted(vocab, ut["tok"].to_numpy(zero_copy_only=False))
        np.add.at(uc, pos, ut["c"].to_numpy(zero_copy_only=False).astype(np.int64))

    cx = uc[np.searchsorted(vocab, sx)] if len(sx) else np.array([], dtype=np.int64)
    cy = uc[np.searchsorted(vocab, sy)] if len(sy) else np.array([], dtype=np.int64)
    pmi = np.log(
        sn.astype(np.float64) / cx.astype(np.float64) / cy.astype(np.float64)
        * float(total)
    ) if len(sn) else np.array([], dtype=np.float64)
    pmi9 = np.floor(pmi * 1e9 + 0.5) / 1e9
    order = np.lexsort((sy, sx, -pmi9))[:topk]
    return pa.table(
        {
            "x": pa.array(sx[order]),
            "y": pa.array(sy[order]),
            "n": pa.array(sn[order]),
            "pmi": pa.array(pmi9[order]),
        }
    )


def phrase_search(
    docs: "ray.data.Dataset",
    phrases: list[str],
    key: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """(doc_id, phrase, pos) — first occurrence (1-based character
    position, SQL STRPOS convention) of each query phrase in each
    matching document; non-matching (doc, phrase) pairs are dropped.
    The keyword-in-context search primitive: one vectorized Arrow
    ``find_substring`` kernel per phrase per batch, zero shuffles, and
    the broadcast phrase list lives in the closure. Case-sensitive by
    contract (both sides would lower() identically otherwise)."""
    plist = sorted(set(phrases))

    def f(t: pa.Table) -> pa.Table:
        ids_out, ph_out, pos_out = [], [], []
        col = t[key]
        # find_substring returns BYTE offsets; STRPOS counts CHARACTERS.
        # They agree on pure-ASCII prefixes — convert only the rows with
        # a multibyte char before the match (rare), per-row
        nbytes = pc.binary_length(col).to_numpy(zero_copy_only=False)
        nchars = pc.utf8_length(col).to_numpy(zero_copy_only=False)
        ascii_row = nbytes == nchars
        for ph in plist:
            pos = pc.find_substring(col, ph).to_numpy(zero_copy_only=False)
            hit = pos >= 0
            if hit.any():
                cpos = pos.astype(np.int64) + 1
                fix = hit & ~ascii_row
                if fix.any():
                    texts = col.to_pylist()
                    for i in np.flatnonzero(fix).tolist():
                        cpos[i] = texts[i].find(ph) + 1
                ids_out.append(
                    t[id_col].to_numpy(zero_copy_only=False)[hit]
                )
                ph_out.append(np.full(int(hit.sum()), ph, dtype=object))
                pos_out.append(cpos[hit])
        if not ids_out:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "phrase": pa.array([], pa.string()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(ids_out)),
                "phrase": pa.array(np.concatenate(ph_out), pa.string()),
                "pos": pa.array(np.concatenate(pos_out)),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def zipf_slope(docs: "ray.data.Dataset", k: int = 100, key: str = "text") -> pa.Table:
    """Zipf slope of the corpus token spectrum: OLS slope of ln(count)
    on ln(rank) over the top-k tokens (a healthy natural corpus sits
    near -1; template farms flatten it). Float replay contract: each
    per-rank term (x, y, xy, x^2) is quantized to the 1e-9 grid as an
    exact int64, the four sums are order-free integer sums, and the
    slope is ONE mirrored float expression over them. The heavy work is
    the top_tokens vocabulary pass; the regression runs over k rows."""
    from ugfraud_ray.functions.collect import collect_table

    tt = top_tokens(docs, k=k, key=key)
    t = tt if isinstance(tt, pa.Table) else collect_table(tt)
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    rnk = t["rnk"].to_numpy(zero_copy_only=False).astype(np.float64)
    kk = len(n)
    x = np.log(rnk)
    y = np.log(n)
    g = lambda v: np.floor(v * 1e9 + 0.5).astype(np.int64)
    sx, sy = int(g(x).sum()), int(g(y).sum())
    sxy, sxx = int(g(x * y).sum()), int(g(x * x).sum())
    slope = (kk * float(sxy) - float(sx) * float(sy) / 1e9) / (
        kk * float(sxx) - float(sx) * float(sx) / 1e9
    )
    return pa.table(
        {
            "k": pa.array([kk], pa.int64()),
            "slope": pa.array([np.floor(slope * 1e9 + 0.5) / 1e9]),
        }
    )


def length_histogram(docs: "ray.data.Dataset", key: str = "text") -> "ray.data.Dataset":
    """Power-of-two token-length histogram of the corpus — the curation
    dashboard's length-distribution panel. Bucket = bit_length of
    n_tokens (0 for empty docs); exact integer counts, one tiny grouped
    sum over per-block bincount partials (the histogram never sees one
    row per document past the map stage)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        flat, rows = _explode_tokens(t, key)
        n = np.bincount(rows, minlength=t.num_rows).astype(np.int64)
        b = np.zeros(len(n), dtype=np.int64)
        nz = n > 0
        b[nz] = np.frexp(n[nz].astype(np.float64))[1]  # bit_length, exact < 2^53
        u, c = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(u), "c": pa.array(c.astype(np.int64))})

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("c", alias_name="n_docs"))
    )


def rarity_scores(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    scale: int = 10**9,
    approx_docs: int | None = None,
    local_vocab_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Per-document rarity score — the integer-exact cousin of an idf
    quality signal: rarity = sum over token OCCURRENCES of
    (scale // df(token)), where df is the corpus document frequency.
    Output (doc_id, n_tokens, rarity), all int64; zero-token docs emit
    nothing (mirrors the SQL ``token <> ''`` stream). No floats, no
    log — truncating integer division matches DuckDB ``//`` exactly.

    Two passes (the distinctive_terms shape): df via per-block
    uniqued (token, partial-df) partials, then either
    - LOCAL (corpus hint <= threshold): vocab merged on the driver,
      broadcast once (ray.put of two sorted arrays), scored by a
      vectorized searchsorted probe per block; or
    - DISTRIBUTED: vocabulary-sized groupby-sum, per-block (doc, token,
      tf) run-length rows joined to the df table (join_partitions-sized
      hash join — never a fixed partition count), then ONE doc-keyed
      groupby-sum. The vocabulary never lands on the driver.
    """
    from ray.data.aggregate import Sum

    def df_partial(t: pa.Table) -> pa.Table:
        flat, rows = _explode_tokens(t, key)
        order = np.lexsort((rows, flat))
        f, r = flat[order], rows[order]
        first = np.ones(len(f), dtype=bool)
        first[1:] = (f[1:] != f[:-1]) | (r[1:] != r[:-1])
        uniq, counts = np.unique(f[first], return_counts=True)
        return pa.table(
            {"token": pa.array(uniq, pa.string()), "df": pa.array(counts.astype(np.int64))}
        )

    partials = docs.map_batches(df_partial, batch_format="pyarrow")
    n_docs = approx_docs if approx_docs is not None else docs.count()

    if n_docs <= local_vocab_threshold:
        from ugfraud_ray.functions.collect import collect_table

        pt = collect_table(partials)
        toks = pt["token"].to_numpy(zero_copy_only=False)
        dfs = pt["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        vocab, inv = np.unique(toks, return_inverse=True)
        tot = np.zeros(len(vocab), dtype=np.int64)
        np.add.at(tot, inv, dfs)
        lookup_ref = ray.put((vocab, scale // tot))

        def score(t: pa.Table) -> pa.Table:
            vocab_, contrib_ = ray.get(lookup_ref)
            flat, rows = _explode_tokens(t, key)
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            c = contrib_[np.searchsorted(vocab_, flat)]
            nr = len(t)
            n_tok = np.bincount(rows, minlength=nr).astype(np.int64)
            rar = np.zeros(nr, dtype=np.int64)
            np.add.at(rar, rows, c)
            nz = n_tok > 0
            return pa.table(
                {
                    id_col: pa.array(ids[nz]),
                    "n_tokens": pa.array(n_tok[nz]),
                    "rarity": pa.array(rar[nz]),
                }
            )

        return docs.select_columns([id_col, key]).map_batches(
            score, batch_format="pyarrow"
        )

    from ugfraud_ray.stages.graph_build import join_partitions

    df_tab = partials.groupby("token").aggregate(Sum("df", alias_name="df"))

    def tf_rows(t: pa.Table) -> pa.Table:
        flat, rows = _explode_tokens(t, key)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((flat, rows))
        f, r = flat[order], rows[order]
        first = np.ones(len(f), dtype=bool)
        first[1:] = (f[1:] != f[:-1]) | (r[1:] != r[:-1])
        starts = np.flatnonzero(first)
        tf = np.diff(np.append(starts, len(f))).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids[r[starts]]),
                "token": pa.array(f[starts], pa.string()),
                "tf": pa.array(tf),
            }
        )

    tf_ds = docs.select_columns([id_col, key]).map_batches(
        tf_rows, batch_format="pyarrow"
    )
    joined = tf_ds.join(
        df_tab, join_type="inner", num_partitions=join_partitions(), on=("token",)
    )

    def contrib(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(tf),
                "rarity": pa.array(tf * (scale // dfv)),
            }
        )

    return (
        joined.map_batches(contrib, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("n_tokens", alias_name="n_tokens"), Sum("rarity", alias_name="rarity"))
    )


def trigram_counts(
    docs: "ray.data.Dataset",
    key: str = "text",
    min_count: int = 2,
    approx_docs: int | None = None,
    local_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Corpus trigram table (w1, w2, w3, n) with n >= min_count — the
    n-gram LM / contamination-probe building block (CCNet-style corpus
    statistics). Tokenizer = the shared lowercased RE2-\\s+ stream;
    trigrams never cross a document boundary.

    Per-block partials count trigram runs via ONE lexsort over the
    three string arrays (no packed-key collisions); the merge is either
    a driver reduce (corpus hint <= threshold) or a coarse-bucket
    shuffle keyed on the hashed triple followed by the identical run
    kernel + HAVING filter per bucket.
    """
    from ray.data.aggregate import Sum

    def tri_partial(t: pa.Table) -> pa.Table:
        flat, rows = _explode_tokens(t, key)
        if len(flat) < 3:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "w3": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        ok = (rows[:-2] == rows[1:-1]) & (rows[1:-1] == rows[2:])
        w1, w2, w3 = flat[:-2][ok], flat[1:-1][ok], flat[2:][ok]
        order = np.lexsort((w3, w2, w1))
        w1, w2, w3 = w1[order], w2[order], w3[order]
        if len(w1):
            change = (w1[1:] != w1[:-1]) | (w2[1:] != w2[:-1]) | (w3[1:] != w3[:-1])
            starts = np.flatnonzero(np.concatenate([[True], change]))
            cnt = np.diff(np.append(starts, len(w1))).astype(np.int64)
        else:
            starts = np.zeros(0, dtype=np.int64)
            cnt = np.zeros(0, dtype=np.int64)
        return pa.table(
            {
                "w1": pa.array(w1[starts], pa.string()),
                "w2": pa.array(w2[starts], pa.string()),
                "w3": pa.array(w3[starts], pa.string()),
                "n": pa.array(cnt),
            }
        )

    partials = docs.select_columns([key]).map_batches(
        tri_partial, batch_format="pyarrow"
    )
    n_docs = approx_docs if approx_docs is not None else docs.count()

    if n_docs <= local_threshold:
        from ugfraud_ray.functions.collect import collect_table

        t = collect_table(partials)
        w1 = t["w1"].to_numpy(zero_copy_only=False)
        w2 = t["w2"].to_numpy(zero_copy_only=False)
        w3 = t["w3"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((w3, w2, w1))
        w1, w2, w3, n = w1[order], w2[order], w3[order], n[order]
        if len(w1):
            change = (w1[1:] != w1[:-1]) | (w2[1:] != w2[:-1]) | (w3[1:] != w3[:-1])
            starts = np.flatnonzero(np.concatenate([[True], change]))
            tot = np.add.reduceat(n, starts)
        else:
            starts = np.zeros(0, dtype=np.int64)
            tot = np.zeros(0, dtype=np.int64)
        keep = tot >= min_count
        return ray.data.from_arrow(
            pa.table(
                {
                    "w1": pa.array(w1[starts][keep], pa.string()),
                    "w2": pa.array(w2[starts][keep], pa.string()),
                    "w3": pa.array(w3[starts][keep], pa.string()),
                    "n": pa.array(tot[keep]),
                }
            )
        )

    from ugfraud_ray.functions.bucketing import hash_string_column, n_coarse_buckets

    nb = np.uint64(n_coarse_buckets(None))

    def bucketize(t: pa.Table) -> pa.Table:
        h = (
            hash_string_column(t["w1"]) * np.uint64(0x9E3779B97F4A7C15)
            ^ hash_string_column(t["w2"]) * np.uint64(0xC2B2AE3D27D4EB4F)
            ^ hash_string_column(t["w3"])
        )
        return t.append_column("_cb", pa.array((h % nb).astype(np.int64)))

    def per_bucket(g: pa.Table) -> pa.Table:
        w1 = g["w1"].to_numpy(zero_copy_only=False)
        w2 = g["w2"].to_numpy(zero_copy_only=False)
        w3 = g["w3"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((w3, w2, w1))
        w1, w2, w3, n = w1[order], w2[order], w3[order], n[order]
        if len(w1):
            change = (w1[1:] != w1[:-1]) | (w2[1:] != w2[:-1]) | (w3[1:] != w3[:-1])
            starts = np.flatnonzero(np.concatenate([[True], change]))
            tot = np.add.reduceat(n, starts)
        else:
            starts = np.zeros(0, dtype=np.int64)
            tot = np.zeros(0, dtype=np.int64)
        keep = tot >= min_count
        return pa.table(
            {
                "w1": pa.array(w1[starts][keep], pa.string()),
                "w2": pa.array(w2[starts][keep], pa.string()),
                "w3": pa.array(w3[starts][keep], pa.string()),
                "n": pa.array(tot[keep]),
            }
        )

    return (
        partials.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def chunk_documents(
    docs: "ray.data.Dataset",
    size: int = 200,
    stride: int = 150,
    id_col: str = "doc_id",
    key: str = "text",
) -> "ray.data.Dataset":
    """Overlapping fixed-window chunking — split every document into
    character windows of ``size`` starting at multiples of ``stride``
    (stride < size overlaps; the RAG / context-window prep op). Output
    (doc_id, chunk_id, start, chunk); empty documents emit no chunks,
    the last chunk may be short. Offsets are CODEPOINTS (python slicing
    == SQL substr semantics), not bytes.

    Zero Python loops: the kernel works on the Arrow string buffers
    directly — codepoint starts are the non-continuation bytes
    ((b & 0xC0) != 0x80), chunk byte ranges come from one searchsorted
    over them, and the output column is rebuilt as ONE large_string
    gather (index-repeat + cumsum offsets) from the same data buffer.
    Per-batch cost is O(bytes + chunks); nothing leaves the task but
    the chunk rows. Reference analog: none (UGFraud is graph-only);
    public pattern: fixed-window document chunking for retrieval.
    """
    if not (0 < stride and 0 < size):
        raise ValueError("size and stride must be positive")

    def f(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        col = pc.cast(t[key], pa.large_utf8()).combine_chunks()
        if col.null_count:
            raise ValueError("chunk_documents: null text")
        n_rows = len(col)
        off = np.frombuffer(col.buffers()[1], dtype=np.int64)[
            col.offset : col.offset + n_rows + 1
        ]
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        # byte position of every codepoint start, plus the end sentinel
        cp_byte = np.flatnonzero((data & 0xC0) != 0x80)
        cp_byte = np.append(cp_byte, len(data))
        # codepoint index of each row boundary -> per-row char counts
        row_cp = np.searchsorted(cp_byte, off)
        n_chars = np.diff(row_cp)
        n_chunks = np.where(n_chars > 0, (n_chars - 1) // stride + 1, 0)
        total = int(n_chunks.sum())
        row = np.repeat(np.arange(n_rows), n_chunks)
        starts_of = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
        chunk_id = np.arange(total) - starts_of[row]
        start = chunk_id * stride
        end = np.minimum(start + size, n_chars[row])
        # char -> byte via the codepoint table (global char index)
        a = cp_byte[row_cp[row] + start]
        b = cp_byte[row_cp[row] + end]
        lens = b - a
        out_off = np.concatenate([[0], np.cumsum(lens)])
        idx = np.repeat(a - out_off[:-1], lens) + np.arange(int(out_off[-1]))
        chunks = pa.LargeStringArray.from_buffers(
            total,
            pa.py_buffer(out_off.astype(np.int64).tobytes()),
            pa.py_buffer(data[idx].tobytes()),
        )
        return pa.table(
            {
                id_col: pa.array(ids[row]),
                "chunk_id": pa.array(chunk_id.astype(np.int64)),
                "start": pa.array(start.astype(np.int64)),
                "chunk": chunks,
            }
        )

    return docs.select_columns([id_col, key]).map_batches(
        f, batch_format="pyarrow"
    )


def duplicate_spans(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    window: int = 8,
    approx_docs: int | None = None,
    local_vocab_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Per-document duplicated-substring signal (the Lee et al. 2022
    "Deduplicating Training Data" measurement, on the winnowing grid):
    of each doc's :func:`fingerprints`, how many also occur in ANOTHER
    document. Output (doc_id, n_fp, n_shared, dup_frac) — ints plus ONE
    float division of two exact ints (identical bits both sides).

    Shape (the rarity_scores gate): fingerprint once (materialized —
    id+fp ints only, never text), per-block uniqued (fp, df) partials,
    then either a driver-merged fp->df broadcast probe (corpus hint
    below the threshold) or a distributed groupby-sum + hash join above
    it; either way ONE doc-keyed groupby-sum finishes. A fingerprint is
    emitted once per doc, so df(fp) = COUNT(*) = distinct docs.
    """
    from ray.data.aggregate import Sum

    from ugfraud_ray.functions.collect import collect_table

    fp = (
        fingerprints(docs, key=key, id_col=id_col, k=k, window=window)
        .materialize()
    )
    n_docs = approx_docs if approx_docs is not None else docs.count()

    def df_partial(t: pa.Table) -> pa.Table:
        uniq, counts = np.unique(
            t["fp"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"fp": pa.array(uniq), "df": pa.array(counts.astype(np.int64))}
        )

    partials = fp.map_batches(df_partial, batch_format="pyarrow")

    if n_docs <= local_vocab_threshold:
        pt = collect_table(partials)
        vals_, inv = np.unique(
            pt["fp"].to_numpy(zero_copy_only=False), return_inverse=True
        )
        tot = np.zeros(len(vals_), dtype=np.int64)
        np.add.at(tot, inv, pt["df"].to_numpy(zero_copy_only=False).astype(np.int64))
        ref = ray.put((vals_, tot))

        def probe(t: pa.Table) -> pa.Table:
            vals, tot = ray.get(ref)
            fpv = t["fp"].to_numpy(zero_copy_only=False)
            shared = (tot[np.searchsorted(vals, fpv)] >= 2).astype(np.int64)
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            uid, inv = np.unique(ids, return_inverse=True)
            nf = np.bincount(inv).astype(np.int64)
            ns = np.zeros(len(uid), dtype=np.int64)
            np.add.at(ns, inv, shared)
            return pa.table(
                {
                    id_col: pa.array(uid),
                    "n_fp": pa.array(nf),
                    "n_shared": pa.array(ns),
                }
            )

        summed = (
            fp.map_batches(probe, batch_format="pyarrow")
            .groupby(id_col)
            .aggregate(
                Sum("n_fp", alias_name="n_fp"),
                Sum("n_shared", alias_name="n_shared"),
            )
        )
    else:
        from ugfraud_ray.stages.graph_build import join_partitions

        df_tab = partials.groupby("fp").aggregate(Sum("df", alias_name="df"))
        joined = fp.join(
            df_tab,
            join_type="inner",
            num_partitions=join_partitions(),
            on=("fp",),
        )

        def part(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            shared = (
                t["df"].to_numpy(zero_copy_only=False).astype(np.int64) >= 2
            ).astype(np.int64)
            uid, inv = np.unique(ids, return_inverse=True)
            nf = np.bincount(inv).astype(np.int64)
            ns = np.zeros(len(uid), dtype=np.int64)
            np.add.at(ns, inv, shared)
            return pa.table(
                {
                    id_col: pa.array(uid),
                    "n_fp": pa.array(nf),
                    "n_shared": pa.array(ns),
                }
            )

        summed = (
            joined.map_batches(part, batch_format="pyarrow")
            .groupby(id_col)
            .aggregate(
                Sum("n_fp", alias_name="n_fp"),
                Sum("n_shared", alias_name="n_shared"),
            )
        )

    def finish(t: pa.Table) -> pa.Table:
        nf = t["n_fp"].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = t["n_shared"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_fp": pa.array(nf),
                "n_shared": pa.array(ns),
                "dup_frac": pa.array(ns / nf),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")


def normalize_text(
    docs: "ray.data.Dataset", key: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Canonical text normalization (the first stage of every web-text
    curation recipe; no reference analog — the reference's only text
    scalar is md5, `UGFraud/Utils/helper.py`): Unicode NFC, lowercase,
    collapse every whitespace run to one space, trim edge spaces.
    Returns (id_col, norm_text, changed, n_chars_norm).

    ``utf8_lower`` / ``replace_substring_regex`` / ``utf8_trim`` are
    utf8proc/RE2 Arrow kernels, the same libraries DuckDB's ``lower`` /
    ``regexp_replace`` / ``trim`` bind, so the SQL replay is
    byte-identical (oracle-verified, both SFs). NFC goes through
    ``unicodedata.normalize`` — pyarrow's ``utf8_normalize(form="NFC")``
    does NOT compose (it leaves e + U+0301 decomposed, unlike DuckDB's
    ``nfc_normalize``) — applied ONLY to the non-ASCII minority behind a
    vectorized ``string_is_ascii`` fast path (NFC is the identity on
    ASCII), so the Python work is bounded by the non-ASCII row count.
    ``n_chars_norm`` counts codepoints (== DuckDB ``length``).
    """
    import unicodedata

    def f(t: pa.Table) -> pa.Table:
        orig = pc.cast(t[key], pa.string())
        col = orig
        mask = pc.string_is_ascii(col).to_numpy(zero_copy_only=False)
        if not mask.all():
            arr = np.asarray(col.to_pylist(), dtype=object)
            for i in np.flatnonzero(~mask):
                if arr[i] is not None:
                    arr[i] = unicodedata.normalize("NFC", arr[i])
            col = pa.array(arr, pa.string())
        norm = pc.utf8_trim(
            pc.replace_substring_regex(pc.utf8_lower(col), r"\s+", " "),
            characters=" ",
        )
        return pa.table(
            {
                id_col: t[id_col],
                "norm_text": norm,
                "changed": pc.cast(pc.not_equal(norm, orig), pa.int64()),
                "n_chars_norm": pc.cast(pc.utf8_length(norm), pa.int64()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def lm_surprisal(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    approx_docs: int | None = None,
    local_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Per-document n-gram-LM surprisal scoring (the KenLM-perplexity
    quality signal of CCNet/RedPajama recipes, log2-quantized so every
    number is an EXACT integer; no reference analog). The corpus
    trigram model is :func:`trigram_counts` (n >= min_count); each
    document's trigrams probe it and accumulate

        surprisal(tri) = bitlen(total_model_mass) - bitlen(n_tri)

    — the integer bit-length difference IS floor-log2 surprisal, exact
    on both sides (DuckDB: ``length(bin(n))``), so no float/log appears
    anywhere. Returns (id_col, n_trigrams, n_hit, surprisal_sum); docs
    with no trigram (< 3 tokens) emit no row. High mean surprisal or a
    low hit rate = text the corpus LM finds improbable.

    Trigram identity is the repo-wide md5-low64 convention over
    ``w1\\x1fw2\\x1fw3`` (== DuckDB ``md5_number_upper(w1 || chr(31) ||
    ...)``); the model is grouped BY HASH on both sides, so even a
    collision replays identically. Scale shape: probe partials
    run-compress per (doc, trigram) with one lexsort (md5 only on the
    compressed rows); below the gate the (h, surp) model — vocabulary-
    sized, not corpus-sized — broadcasts once via ``ray.put`` and docs
    aggregate fully inside their own block (zero shuffles); above it,
    model and probe rows union into ONE h-bucketed shuffle (the
    minhash_agreement no-chained-join pattern), per-bucket searchsorted
    join, then a single (doc_id) groupby-sum.
    """
    from ray.data.aggregate import Sum

    from ugfraud_ray.pipelines.sketches import _md5_low64

    model = trigram_counts(
        docs,
        key=key,
        min_count=min_count,
        approx_docs=approx_docs,
        local_threshold=local_threshold,
    )

    def model_hash(t: pa.Table) -> pa.Table:
        w1 = t["w1"].to_numpy(zero_copy_only=False)
        w2 = t["w2"].to_numpy(zero_copy_only=False)
        w3 = t["w3"].to_numpy(zero_copy_only=False)
        h = _md5_low64([f"{a}\x1f{b}\x1f{c}" for a, b, c in zip(w1, w2, w3)])
        return pa.table(
            {
                "h": pa.array(h.view(np.int64)),
                "n": pa.array(t["n"].to_numpy(zero_copy_only=False).astype(np.int64)),
            }
        )

    hashed = model.map_batches(model_hash, batch_format="pyarrow")

    def probe_partial(t: pa.Table) -> pa.Table:
        flat, rows = _explode_tokens(t, key)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(flat) < 3:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "h": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        ok = (rows[:-2] == rows[1:-1]) & (rows[1:-1] == rows[2:])
        r = rows[:-2][ok]
        w1, w2, w3 = flat[:-2][ok], flat[1:-1][ok], flat[2:][ok]
        order = np.lexsort((w3, w2, w1, r))
        r, w1, w2, w3 = r[order], w1[order], w2[order], w3[order]
        if len(r):
            change = (
                (r[1:] != r[:-1])
                | (w1[1:] != w1[:-1])
                | (w2[1:] != w2[:-1])
                | (w3[1:] != w3[:-1])
            )
            starts = np.flatnonzero(np.concatenate([[True], change]))
            cnt = np.diff(np.append(starts, len(r))).astype(np.int64)
        else:
            starts = np.zeros(0, dtype=np.int64)
            cnt = np.zeros(0, dtype=np.int64)
        h = _md5_low64(
            [
                f"{a}\x1f{b}\x1f{c}"
                for a, b, c in zip(w1[starts], w2[starts], w3[starts])
            ]
        )
        return pa.table(
            {
                id_col: pa.array(ids[r[starts]]),
                "h": pa.array(h.view(np.int64)),
                "c": pa.array(cnt),
            }
        )

    def _group_model(h: np.ndarray, n: np.ndarray, bt: int):
        """(sorted unique h, surp) with n summed per hash group."""
        order = np.argsort(h, kind="stable")
        h, n = h[order], n[order]
        if len(h):
            starts = np.flatnonzero(np.concatenate([[True], h[1:] != h[:-1]]))
            nh = np.add.reduceat(n, starts)
            hu = h[starts]
        else:
            hu = h
            nh = n
        # frexp exponent == bit length, exact for nh < 2^53
        surp = np.int64(bt) - np.frexp(nh.astype(np.float64))[1].astype(np.int64)
        return hu, surp

    n_docs = approx_docs if approx_docs is not None else docs.count()

    if n_docs <= local_threshold:
        from ugfraud_ray.functions.collect import collect_table

        mt = collect_table(hashed)
        n_arr = mt["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        bt = int(n_arr.sum(dtype=np.int64)).bit_length() if len(n_arr) else 0
        hu, surp = _group_model(
            mt["h"].to_numpy(zero_copy_only=False).astype(np.int64), n_arr, bt
        )
        mref = ray.put((hu, surp))

        def score_block(t: pa.Table, _mref=mref) -> pa.Table:
            hu, surp = ray.get(_mref)
            p = probe_partial(t)
            ids = p[id_col].to_numpy(zero_copy_only=False)
            h = p["h"].to_numpy(zero_copy_only=False)
            c = p["c"].to_numpy(zero_copy_only=False)
            if len(hu):
                idx = np.minimum(np.searchsorted(hu, h), len(hu) - 1)
                hit = hu[idx] == h
                s_term = np.where(hit, c * surp[idx], 0)
            else:
                hit = np.zeros(len(h), dtype=bool)
                s_term = np.zeros(len(h), dtype=np.int64)
            uid, inv = np.unique(ids, return_inverse=True)
            n_tri = np.zeros(len(uid), dtype=np.int64)
            n_hit = np.zeros(len(uid), dtype=np.int64)
            s_sum = np.zeros(len(uid), dtype=np.int64)
            np.add.at(n_tri, inv, c)
            np.add.at(n_hit, inv, np.where(hit, c, 0))
            np.add.at(s_sum, inv, s_term)
            return pa.table(
                {
                    id_col: pa.array(uid),
                    "n_trigrams": pa.array(n_tri),
                    "n_hit": pa.array(n_hit),
                    "surprisal_sum": pa.array(s_sum),
                }
            )

        return docs.select_columns([id_col, key]).map_batches(
            score_block, batch_format="pyarrow"
        )

    from ugfraud_ray.functions.bucketing import n_coarse_buckets

    nb = n_coarse_buckets(None)
    # vocabulary-sized (never corpus-sized): pin it so the scalar total
    # and the bucketed join don't rebuild the trigram lineage twice
    hashed = hashed.materialize()
    bt = int(hashed.sum("n", ignore_nulls=True) or 0).bit_length()

    def tag_model(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_cb": pa.array((h.view(np.uint64) % np.uint64(nb)).astype(np.int64)),
                "kind": pa.array(np.zeros(len(h), dtype=np.int64)),
                id_col: pa.array(np.full(len(h), -1, dtype=np.int64)),
                "h": t["h"],
                "v": t["n"],
            }
        )

    def tag_probe(t: pa.Table) -> pa.Table:
        p = probe_partial(t)
        h = p["h"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_cb": pa.array((h.view(np.uint64) % np.uint64(nb)).astype(np.int64)),
                "kind": pa.array(np.ones(len(h), dtype=np.int64)),
                id_col: p[id_col],
                "h": p["h"],
                "v": p["c"],
            }
        )

    tagged = hashed.map_batches(tag_model, batch_format="pyarrow").union(
        docs.select_columns([id_col, key]).map_batches(
            tag_probe, batch_format="pyarrow"
        )
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy(zero_copy_only=False)
        h = g["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = kind == 0
        hu, surp = _group_model(h[m], v[m], bt)
        ph, pc_, pid = h[~m], v[~m], ids[~m]
        if len(hu):
            idx = np.minimum(np.searchsorted(hu, ph), len(hu) - 1)
            hit = hu[idx] == ph
            s_term = np.where(hit, pc_ * surp[idx], 0)
        else:
            hit = np.zeros(len(ph), dtype=bool)
            s_term = np.zeros(len(ph), dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(pid),
                "n_trigrams": pa.array(pc_),
                "n_hit": pa.array(np.where(hit, pc_, 0)),
                "surprisal_sum": pa.array(s_term),
            }
        )

    return (
        tagged.groupby("_cb")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(
            Sum("n_trigrams", alias_name="n_trigrams"),
            Sum("n_hit", alias_name="n_hit"),
            Sum("surprisal_sum", alias_name="surprisal_sum"),
        )
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> "ray.data.Dataset":
    """Gopher repetition/quality gate (Rae et al. 2021, table A1) with
    every predicate an EXACT integer comparison — ratio thresholds are
    cross-multiplied so no float or division appears on either side:

    - r_word_count:   min_words <= n_words <= max_words
    - r_mean_word_len: 3*n_words <= total word chars <= 10*n_words
    - r_alpha:        >= 80% of words contain an [a-z] letter
                      (5*n_alpha >= 4*n_words)
    - r_stop:         >= 2 DISTINCT Gopher stopwords present
    - r_ellipsis:     <= 30% of lines end with '...' or '…'
                      (10*n_ellipsis <= 3*n_lines)
    - r_bullet:       <= 90% of lines start with '-', '*' or '•'
                      (10*n_bullet <= 9*n_lines)
    - r_hash:         '#' symbols per word <= 0.1 (10*n_hash <= n_words)
    - keep:           all of the above

    Tokenization is the repo-wide lowered ``\\s+`` split; word length is
    codepoints (== DuckDB LENGTH). One vectorized Arrow pass per batch,
    zero shuffles at any scale; every doc emits a row (zero-token docs
    fail r_word_count). Flags are int64 0/1.
    """

    def f(t: pa.Table) -> pa.Table:
        nr = t.num_rows
        col = pc.utf8_lower(pc.utf8_trim_whitespace(t[key]))
        lists = pc.split_pattern_regex(col, r"\s+")
        flat = pc.list_flatten(lists)
        lens_per_row = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        rows = np.repeat(np.arange(nr), lens_per_row)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        n_words = np.bincount(rows[nonempty], minlength=nr).astype(np.int64)
        tot_chars = np.zeros(nr, dtype=np.int64)
        np.add.at(tot_chars, rows[nonempty], wlen[nonempty])
        alpha = pc.match_substring_regex(flat, "[a-z]").to_numpy(zero_copy_only=False)
        n_alpha = np.bincount(rows[nonempty & alpha], minlength=nr).astype(np.int64)
        n_stop = np.zeros(nr, dtype=np.int64)
        for sw in GOPHER_STOPWORDS:
            hit = pc.equal(flat, sw).to_numpy(zero_copy_only=False)
            present = np.bincount(rows[hit], minlength=nr) > 0
            n_stop += present
        # line-shape rules over the exact '\n' split
        lines = pc.split_pattern(t[key], "\n")
        lflat = pc.list_flatten(lines)
        llens = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
        lrows = np.repeat(np.arange(nr), llens)
        n_lines = np.bincount(lrows, minlength=nr).astype(np.int64)
        ell = pc.or_(
            pc.ends_with(lflat, "..."), pc.ends_with(lflat, "…")
        ).to_numpy(zero_copy_only=False)
        n_ell = np.bincount(lrows[ell], minlength=nr).astype(np.int64)
        bul = pc.or_(
            pc.or_(pc.starts_with(lflat, "-"), pc.starts_with(lflat, "*")),
            pc.starts_with(lflat, "•"),
        ).to_numpy(zero_copy_only=False)
        n_bul = np.bincount(lrows[bul], minlength=nr).astype(np.int64)
        n_hash = (
            pc.utf8_length(t[key]).to_numpy(zero_copy_only=False).astype(np.int64)
            - pc.utf8_length(
                pc.replace_substring(t[key], "#", "")
            ).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        r_wc = ((n_words >= min_words) & (n_words <= max_words)).astype(np.int64)
        r_mwl = ((3 * n_words <= tot_chars) & (tot_chars <= 10 * n_words)).astype(np.int64)
        r_alpha = (5 * n_alpha >= 4 * n_words).astype(np.int64)
        r_stop = (n_stop >= 2).astype(np.int64)
        r_ell = (10 * n_ell <= 3 * n_lines).astype(np.int64)
        r_bul = (10 * n_bul <= 9 * n_lines).astype(np.int64)
        r_hash = (10 * n_hash <= n_words).astype(np.int64)
        keep = r_wc & r_mwl & r_alpha & r_stop & r_ell & r_bul & r_hash
        return pa.table(
            {
                id_col: t[id_col],
                "n_words": pa.array(n_words),
                "r_word_count": pa.array(r_wc),
                "r_mean_word_len": pa.array(r_mwl),
                "r_alpha": pa.array(r_alpha),
                "r_stop": pa.array(r_stop),
                "r_ellipsis": pa.array(r_ell),
                "r_bullet": pa.array(r_bul),
                "r_hash": pa.array(r_hash),
                "keep": pa.array(keep),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def lang_confusion(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
    concurrency: int = 2,
) -> "ray.data.Dataset":
    """Language-ID evaluation confusion matrix: (lang, lang_pred,
    n_docs) comparing the heuristic :class:`LanguageID` prediction
    against the labeled ``label_col``. Per-batch pair-count partials
    (bounded by |langs|^2) merged by one tiny groupby — the actor pool
    keeps the marker tables loaded once per actor.
    """
    from ray.data.aggregate import Sum

    class _Conf(LanguageID):
        def __init__(self, key: str, id_col: str, label_col: str):
            super().__init__(key, id_col)
            self.label_col = label_col

        def __call__(self, t: pa.Table) -> pa.Table:
            out = super().__call__(t)
            lab = np.asarray(t[self.label_col].to_pylist(), dtype=object)
            pred = np.asarray(out["lang_pred"].to_pylist(), dtype=object)
            pair = np.char.add(np.char.add(lab.astype(str), "\x1f"), pred.astype(str))
            u, c = np.unique(pair, return_counts=True)
            labs = [s.split("\x1f")[0] for s in u]
            preds = [s.split("\x1f")[1] for s in u]
            return pa.table(
                {
                    "lang": pa.array(labs, pa.string()),
                    "lang_pred": pa.array(preds, pa.string()),
                    "n_docs": pa.array(c.astype(np.int64)),
                }
            )

    return (
        docs.select_columns([id_col, key, label_col])
        .map_batches(
            _Conf,
            fn_constructor_args=(key, id_col, label_col),
            batch_format="pyarrow",
            concurrency=actor_pool_size(concurrency),
        )
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


def vocab_growth(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    n_checkpoints: int = 10,
) -> pa.Table:
    """Heaps'-law vocabulary-growth curve (Heaps 1978): at doc-id
    thresholds t_k = max_id * k / K, report cumulative token
    occurrences and cumulative DISTINCT vocabulary (tokens whose first
    occurrence doc <= t_k). Sublinear growth of n_distinct in n_tokens
    is the expected natural-text shape; a flattening curve diagnoses a
    crawl that has stopped contributing new vocabulary.

    Output (k, threshold_doc, n_tokens, n_distinct), all int64 exact.
    Scale shape: token first-occurrence via per-block uniqued
    (token, min_doc) partials + ONE vocabulary groupby-min; both
    readouts are K-counter partials — only 2K integers merge on the
    driver.
    """
    from ray.data.aggregate import Min, Sum

    from ugfraud_ray.functions.collect import collect_table

    mx = docs.max(id_col)
    ths = np.array([(mx * k) // n_checkpoints for k in range(1, n_checkpoints + 1)],
                   dtype=np.int64)
    th_ref = ray.put(ths)

    def occ_partial(t: pa.Table) -> pa.Table:
        th = ray.get(th_ref)
        flat, rows = _explode_tokens(t, key)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[rows]
        counts = np.array([(ids <= x).sum() for x in th], dtype=np.int64)
        return pa.table(
            {"k": pa.array(np.arange(1, len(th) + 1, dtype=np.int64)),
             "n": pa.array(counts)}
        )

    occ = collect_table(
        docs.map_batches(occ_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"))
    )

    def first_partial(t: pa.Table) -> pa.Table:
        flat, rows = _explode_tokens(t, key)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[rows]
        order = np.lexsort((ids, flat))
        f, d = flat[order], ids[order]
        first = np.ones(len(f), dtype=bool)
        first[1:] = f[1:] != f[:-1]
        return pa.table(
            {"token": pa.array(f[first], pa.string()), "fdoc": pa.array(d[first])}
        )

    fd = docs.map_batches(first_partial, batch_format="pyarrow").groupby(
        "token"
    ).aggregate(Min("fdoc", alias_name="fdoc"))

    def dist_partial(t: pa.Table) -> pa.Table:
        th = ray.get(th_ref)
        f = t["fdoc"].to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.array([(f <= x).sum() for x in th], dtype=np.int64)
        return pa.table(
            {"k": pa.array(np.arange(1, len(th) + 1, dtype=np.int64)),
             "n": pa.array(counts)}
        )

    dist = collect_table(
        fd.map_batches(dist_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"))
    )
    ko = np.argsort(occ["k"].to_numpy(zero_copy_only=False))
    kd = np.argsort(dist["k"].to_numpy(zero_copy_only=False))
    return pa.table(
        {
            "k": pa.array(np.arange(1, n_checkpoints + 1, dtype=np.int64)),
            "threshold_doc": pa.array(ths),
            "n_tokens": pa.array(occ["n"].to_numpy(zero_copy_only=False)[ko].astype(np.int64)),
            "n_distinct": pa.array(dist["n"].to_numpy(zero_copy_only=False)[kd].astype(np.int64)),
        }
    )


def tokenizer_fertility(
    docs: "ray.data.Dataset",
    key: str = "text",
    lang_col: str = "lang",
) -> "ray.data.Dataset":
    """Per-language tokenizer fertility: BPE pretokens per whitespace
    word — the multilingual tokenizer-budget diagnostic (a language
    whose fertility is 2x pays 2x the context window for the same
    text). Returns (lang, n_docs, n_bpe_tokens, n_words, fertility)
    with fertility = round(tokens/words, 9) and 0.0 for empty groups.

    Both counts are single vectorized RE2 kernels (the shared _BPE_RE
    pretokenizer and '\\S+' words); per-block partials collapse to one
    row per language before the |langs|-sized groupby — the corpus
    never shuffles. Reference analog: none (UGFraud is monolingual);
    this is the corpus-budget sibling of bpe_token_counts.
    """
    from ray.data.aggregate import Sum

    src = docs.select_columns([lang_col, key])

    def partial(t: pa.Table) -> pa.Table:
        bpe = pc.cast(pc.count_substring_regex(t[key], _BPE_RE), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        w = pc.cast(pc.count_substring_regex(t[key], r"\S+"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        langs = np.asarray(t[lang_col].to_pylist(), dtype=object)
        uniq, inv = np.unique(langs.astype(str), return_inverse=True)
        nd = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        nt = np.bincount(inv, weights=bpe, minlength=len(uniq)).astype(np.int64)
        nw = np.bincount(inv, weights=w, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "lang": pa.array(uniq.tolist(), pa.string()),
                "nd": pa.array(nd),
                "nt": pa.array(nt),
                "nw": pa.array(nw),
            }
        )

    agg = (
        src.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("nd", alias_name="n_docs"),
            Sum("nt", alias_name="n_bpe_tokens"),
            Sum("nw", alias_name="n_words"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        nt = t["n_bpe_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        nw = t["n_words"].to_numpy(zero_copy_only=False).astype(np.int64)
        fert = np.where(nw > 0, np.round(nt / np.maximum(nw, 1), 9), 0.0)
        return t.append_column("fertility", pa.array(fert))

    return agg.map_batches(finish, batch_format="pyarrow")


def ngram_novelty(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    approx_docs: int | None = None,
    local_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """(doc_id, n_tri_distinct, n_novel, novelty) — per-document n-gram
    novelty: the fraction of a doc's DISTINCT trigrams whose globally
    FIRST occurrence (minimal doc_id over the corpus) is this doc. The
    corpus-freshness curation signal next to ``vocab_growth``: a crawl
    batch full of near-zero-novelty docs is re-crawled boilerplate.

    Trigram identity is the shared md5-low64 of ``w1\\x1fw2\\x1fw3``
    (``lm_surprisal``'s collision-stable key, == DuckDB
    ``md5_number_upper`` over the chr(31)-packed triple), so engine and
    SQL merge colliding trigrams identically. Docs are whole rows, so
    per-batch np.unique gives exact per-doc distinct pairs with zero
    shuffles; below the corpus gate the int pairs collect and one
    driver lexsort resolves firsts, above it ONE h-bucketed coarse
    shuffle co-locates every (doc, h) of a trigram and the per-bucket
    kernel emits (doc, n_pairs, n_novel) partials into a tiny
    (doc_id) grouped sum — the trigram vocabulary never lands on the
    driver and nothing text-bearing ever shuffles. novelty =
    floor(n_novel/n_tri_distinct·1e9 + 0.5)/1e9, the engine's pinned
    9-grid readout.

    No reference analog (reference is graph-only); novelty scoring per
    Lee et al. 2022-style dedup diagnostics over the winnowing/trigram
    grid family.
    """
    from ray.data.aggregate import Sum

    from ugfraud_ray.pipelines.sketches import _md5_low64

    empty = pa.table(
        {id_col: pa.array([], pa.int64()), "h": pa.array([], pa.int64())}
    )

    def pairs(t: pa.Table) -> pa.Table:
        flat, rows = _explode_tokens(t, key)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(flat) < 3:
            return empty
        ok = (rows[:-2] == rows[1:-1]) & (rows[1:-1] == rows[2:])
        if not ok.any():
            return empty
        r = rows[:-2][ok]
        w1, w2, w3 = flat[:-2][ok], flat[1:-1][ok], flat[2:][ok]
        h = _md5_low64(
            [f"{a}\x1f{b}\x1f{c}" for a, b, c in zip(w1, w2, w3)]
        ).view(np.int64)
        # distinct on (doc, h) — the SQL DISTINCT is post-hash, so a
        # within-doc trigram collision dedupes identically both sides
        order = np.lexsort((h, r))
        r, h = r[order], h[order]
        keep = np.concatenate([[True], (r[1:] != r[:-1]) | (h[1:] != h[:-1])])
        return pa.table(
            {id_col: pa.array(ids[r[keep]]), "h": pa.array(h[keep])}
        )

    P = docs.select_columns([id_col, key]).map_batches(pairs, batch_format="pyarrow")
    n_docs = approx_docs if approx_docs is not None else docs.count()

    def _counts(ids: np.ndarray, h: np.ndarray) -> pa.Table:
        """(doc, n_pairs, n_novel) over one complete set of h-runs."""
        order = np.lexsort((ids, h))
        ids, h = ids[order], h[order]
        first = np.concatenate([[True], h[1:] != h[:-1]])
        u_tot, c_tot = np.unique(ids, return_counts=True)
        u_nov, c_nov = np.unique(ids[first], return_counts=True)
        nov = np.zeros(len(u_tot), dtype=np.int64)
        nov[np.searchsorted(u_tot, u_nov)] = c_nov
        return pa.table(
            {
                id_col: pa.array(u_tot),
                "n_pairs": pa.array(c_tot.astype(np.int64)),
                "n_novel": pa.array(nov),
            }
        )

    if n_docs <= local_threshold:
        from ugfraud_ray.functions.collect import collect_table

        t = collect_table(P)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = t["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            grouped = ray.data.from_arrow(
                pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        "n_pairs": pa.array([], pa.int64()),
                        "n_novel": pa.array([], pa.int64()),
                    }
                )
            )
        else:
            grouped = ray.data.from_arrow(_counts(ids, h))
    else:
        from ugfraud_ray.functions.bucketing import n_coarse_buckets

        nb = np.uint64(n_coarse_buckets(None))

        def bucketize(t: pa.Table) -> pa.Table:
            hv = t["h"].to_numpy(zero_copy_only=False).view(np.uint64)
            return t.append_column("_cb", pa.array((hv % nb).astype(np.int64)))

        def per_bucket(g: pa.Table) -> pa.Table:
            ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            h = g["h"].to_numpy(zero_copy_only=False).astype(np.int64)
            return _counts(ids, h)

        grouped = (
            P.map_batches(bucketize, batch_format="pyarrow")
            .groupby("_cb")
            .map_groups(per_bucket, batch_format="pyarrow")
            .groupby(id_col)
            .aggregate(
                Sum("n_pairs", alias_name="n_pairs"),
                Sum("n_novel", alias_name="n_novel"),
            )
        )

    def fin(t: pa.Table) -> pa.Table:
        tot = t["n_pairs"].to_numpy(zero_copy_only=False).astype(np.int64)
        nov = t["n_novel"].to_numpy(zero_copy_only=False).astype(np.int64)
        frac = np.floor(nov.astype(np.float64) / tot.astype(np.float64) * 1e9 + 0.5) / 1e9
        return pa.table(
            {
                id_col: t[id_col],
                "n_tri_distinct": pa.array(tot),
                "n_novel": pa.array(nov),
                "novelty": pa.array(frac),
            }
        )

    return grouped.map_batches(fin, batch_format="pyarrow")


def char_entropy(
    docs: "ray.data.Dataset", key: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """(doc_id, n_chars, n_distinct, h_nats) — Shannon entropy of each
    document's codepoint distribution, the gibberish/binary-junk
    detector a web-text gate thresholds on (natural language sits
    ~2.5-4.5 nats; base64 blobs and key-mash noise spike toward
    ln(alphabet), repeated-char spam collapses toward 0).

    Docs are whole rows, so the whole operator is ONE zero-shuffle
    streaming pass: per batch, codepoints come off the raw UTF-8 buffer
    (all-ASCII batches are a single np.frombuffer view over the Arrow
    data buffer; the non-ASCII minority decodes via utf-32 per doc —
    normalize_text's bounded-Python contract), then per-doc char runs
    resolve with one lexsort + reduceat. Entropy terms sum in
    (doc, codepoint) order; the SQL replay orders its SUM by the char
    string, and UTF-8 binary collation == codepoint order, so both
    sides walk the identical IEEE chain; 1e-9-grid readout. Empty docs
    emit no row (mirrored by text <> '' in the SQL — DuckDB's
    string_split('','') yields [''], not []).

    Reference analog: none (SURVEY §2.8 — md5 is the reference's only
    text scalar); standard corpus-filtering heuristic alongside
    gopher_rules.
    """

    def f(t: pa.Table) -> pa.Table:
        col = pc.cast(t[key], pa.large_utf8()).combine_chunks()
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        off = np.frombuffer(col.buffers()[1], dtype=np.int64)[
            col.offset : col.offset + len(col) + 1
        ]
        mask = pc.string_is_ascii(col).to_numpy(zero_copy_only=False)
        if mask.all():
            data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
            cps = data[off[0] : off[-1]].astype(np.int64)
            doc_of = np.repeat(np.arange(len(ids)), np.diff(off))
        else:
            parts, owners = [], []
            for i, s in enumerate(col.to_pylist()):
                if s:
                    cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
                    parts.append(cp.astype(np.int64))
                    owners.append(np.full(len(cp), i, dtype=np.int64))
            if parts:
                cps = np.concatenate(parts)
                doc_of = np.concatenate(owners)
            else:
                cps = np.zeros(0, dtype=np.int64)
                doc_of = np.zeros(0, dtype=np.int64)
        if len(cps) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "h_nats": pa.array([], pa.float64()),
                }
            )
        order = np.lexsort((cps, doc_of))
        d, c = doc_of[order], cps[order]
        runs = np.flatnonzero(
            np.concatenate([[True], (d[1:] != d[:-1]) | (c[1:] != c[:-1])])
        )
        n = np.diff(np.append(runs, len(d))).astype(np.int64)
        d = d[runs]
        dstarts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
        tot = np.add.reduceat(n, dstarts)
        n_distinct = np.diff(np.append(dstarts, len(d))).astype(np.int64)
        p = n.astype(np.float64) / np.repeat(tot, n_distinct).astype(np.float64)
        terms = -(p * np.log(p))
        h = np.add.reduceat(terms, dstarts)
        h[n_distinct == 1] = 0.0
        return pa.table(
            {
                id_col: pa.array(ids[d[dstarts]]),
                "n_chars": pa.array(tot),
                "n_distinct": pa.array(n_distinct),
                "h_nats": pa.array(np.floor(h * 1e9 + 0.5) / 1e9),
            }
        )

    return docs.select_columns([id_col, key]).map_batches(f, batch_format="pyarrow")


def feature_correlation(
    docs: "ray.data.Dataset",
    key: str = "text",
) -> pa.Table:
    """(feat_a, feat_b, r) — pairwise Pearson correlations over the
    four integer quality features (the EDA step before training the
    quality classifier; collinear features get dropped). All moments
    (Σx, Σx², Σxy) are EXACT integer sums — per-block int64 partials
    merged as Python ints on the driver — and r is one pinned float
    chain over those integers: (n·Σxy − Σx·Σy) /
    (sqrt(n·Σx² − Σx²tot) · sqrt(n·Σy² − Σy²tot)), rounded to the 1e-9
    grid; float(int) == SQL CAST(CAST(.. AS VARCHAR) AS DOUBLE)
    (round-to-nearest both sides). Constant features emit r = 0.0.
    """
    feats = ["n_chars", "n_digits", "n_spaces", "n_punct"]
    qf = quality_features(docs, key=key)

    def partial(t: pa.Table) -> pa.Table:
        xs = {
            c: t[c].to_numpy(zero_copy_only=False).astype(np.int64) for c in feats
        }
        vals = {"n": np.int64(t.num_rows)}
        for c in feats:
            vals[f"s_{c}"] = xs[c].sum()
            vals[f"q_{c}"] = (xs[c] * xs[c]).sum()
        for i, a in enumerate(feats):
            for b in feats[i + 1 :]:
                vals[f"x_{a}_{b}"] = (xs[a] * xs[b]).sum()
        return pa.table({k: pa.array([int(v)], pa.int64()) for k, v in vals.items()})

    from ugfraud_ray.functions.collect import collect_table

    pt = collect_table(qf.map_batches(partial, batch_format="pyarrow"))
    tot = {c: sum(int(v) for v in pt[c].to_pylist()) for c in pt.column_names}
    n = tot["n"]

    def _r(a: str, b: str) -> float:
        num = float(n * tot[f"x_{a}_{b}"] - tot[f"s_{a}"] * tot[f"s_{b}"])
        da = float(n * tot[f"q_{a}"] - tot[f"s_{a}"] * tot[f"s_{a}"])
        db = float(n * tot[f"q_{b}"] - tot[f"s_{b}"] * tot[f"s_{b}"])
        if da <= 0.0 or db <= 0.0:
            return 0.0
        r = num / (np.sqrt(da) * np.sqrt(db))
        return float(np.floor(r * 1e9 + 0.5) / 1e9)

    fa, fb, rr = [], [], []
    for i, a in enumerate(feats):
        for b in feats[i + 1 :]:
            fa.append(a)
            fb.append(b)
            rr.append(_r(a, b))
    return pa.table(
        {
            "feat_a": pa.array(fa, pa.string()),
            "feat_b": pa.array(fb, pa.string()),
            "r": pa.array(np.array(rr)),
        }
    )


def gopher_pass_by_lang(
    docs: "ray.data.Dataset",
    local_threshold: int = 10_000_000,
) -> "ray.data.Dataset":
    """(lang, n_docs, n_keep, pass_rate) — the Gopher gate's yield per
    language (the readout that tells a multilingual curation which
    languages the English-tuned thresholds starve). Composes the exact
    integer gopher_rules keep bit with the doc language: below the
    metadata gate the (doc_id -> lang) map broadcasts for a vectorized
    searchsorted attach (mixture_report's rule), above it a hash join;
    then one lang-sized grouped sum; pass_rate on the 1e-9 grid."""
    from ray.data.aggregate import Sum

    from ugfraud_ray.functions.collect import collect_table

    g = gopher_rules(docs).select_columns(["doc_id", "keep"])
    meta = docs.select_columns(["doc_id", "lang"])
    n_meta = meta.count()
    if n_meta > local_threshold:  # pragma: no cover - forced in tests
        from ugfraud_ray.stages.graph_build import join_partitions

        attached = g.join(
            meta, join_type="inner", on=("doc_id",), num_partitions=join_partitions()
        )
    else:
        mt = collect_table(meta)
        mid = mt["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        langs = np.asarray(mt["lang"].to_pylist(), dtype=object)
        order = np.argsort(mid, kind="stable")
        ref = ray.put((mid[order], langs[order]))

        def attach(t: pa.Table) -> pa.Table:
            ids_s, lg = ray.get(ref)
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.clip(np.searchsorted(ids_s, ids), 0, len(ids_s) - 1)
            if not (ids_s[pos] == ids).all():
                raise ValueError("gopher_pass_by_lang: doc without metadata")
            return pa.table({"lang": pa.array(lg[pos].astype(object), pa.string()),
                             "keep": t["keep"]})

        attached = g.map_batches(attach, batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        lg = np.asarray(t["lang"].to_pylist(), dtype=object)
        kp = t["keep"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(lg, return_inverse=True)
        nd = np.bincount(inv).astype(np.int64)
        nk = np.zeros(len(u), dtype=np.int64)
        np.add.at(nk, inv, kp)
        return pa.table(
            {
                "lang": pa.array(u.astype(object), pa.string()),
                "n_docs": pa.array(nd),
                "n_keep": pa.array(nk),
            }
        )

    agg = (
        attached.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_keep", alias_name="n_keep"))
    )

    def fin(t: pa.Table) -> pa.Table:
        nd = t["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        nk = t["n_keep"].to_numpy(zero_copy_only=False).astype(np.int64)
        rate = np.floor(nk.astype(np.float64) / nd.astype(np.float64) * 1e9 + 0.5) / 1e9
        return pa.table(
            {
                "lang": t["lang"],
                "n_docs": pa.array(nd),
                "n_keep": pa.array(nk),
                "pass_rate": pa.array(rate),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")
