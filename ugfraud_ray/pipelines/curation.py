"""End-to-end corpus curation — the composed flagship pipeline.

The full pass a training-data user runs before tokenization, chaining
the individually-oracled stages into ONE streaming lineage:

    1. quality gate        — keep docs with ≥ ``min_chars`` characters
                             (utf8 length; the doc_quality family's
                             cheapest predicate, pushed to the front so
                             every later stage sees less data)
    2. exact dedup         — md5(text) groups, survivor = min doc_id
                             (D1 semantics, pipelines/dedup.exact_dedup)
    3. near-dedup          — MinHash-LSH clusters over the survivors,
                             keep doc_id == cluster (= min id of its
                             candidate component,
                             pipelines/dedup.minhash_lsh_dedup)
    4. split + token count — split = md5(doc_id) mod 1000 cumulative
                             buckets (test < 100 ≤ valid < 200 ≤ train,
                             the assign_splits convention) and n_tokens
                             from the shared ``_explode_tokens``
                             tokenizer, both pure per-row functions in
                             one stateless pass.

Output: (doc_id, split, n_tokens) for every retained document — the
per-split token budget reads off with one group-by.

Scale shape: NO text-bearing dataset is ever materialized. The gated
lineage is lazy; each consumer (exact-dedup hashing pass, MinHash
candidate pass, LSH assign pass, final semi-join) re-reads the
column-pruned source through the filter instead of pinning the corpus
text in the object store — at 100 TB a handful of pruned streaming
re-reads beats spilling the whole corpus twice. Only id-only datasets
(dedup survivor ids, cluster representatives) are materialized, and a
survivor-id membership pass rides a broadcast Arrow id set below
``local_threshold`` survivors and an inner hash join above it.
Every stage is individually value-oracled; the composite query replays
the identical chain in one SQL statement.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table
from ugfraud_ray.stages.graph_build import join_partitions


def _semi_join_ids(
    ds: "ray.data.Dataset",
    ids: "ray.data.Dataset",
    id_col: str,
    local_threshold: int,
) -> "ray.data.Dataset":
    """Rows of ds whose id_col is in ids(id_col) — broadcast filter for
    small id sets, hash join above the gate.

    ``ids`` is materialized here: it is id-only (never carries text) and
    is consumed twice (count + collect/join), so pinning it avoids
    re-running its whole upstream lineage.
    """
    ids = ids.materialize()
    n = ids.count()
    if n > local_threshold:
        return ds.join(ids, join_type="inner", on=(id_col,), num_partitions=join_partitions())
    if n == 0:
        return ds.limit(0)
    keep_ref = ray.put(collect_table(ids)[id_col].combine_chunks())

    def f(t: pa.Table) -> pa.Table:
        mask = pc.fill_null(pc.is_in(t[id_col], value_set=ray.get(keep_ref)), False)
        return t.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def curate(
    docs: "ray.data.Dataset",
    min_chars: int = 100,
    key: str = "text",
    id_col: str = "doc_id",
    split_mod: int = 1000,
    split_bounds: tuple = (("test", 100), ("valid", 200)),
    local_threshold: int = 20_000_000,
) -> "ray.data.Dataset":
    """(doc_id, split, n_tokens) of the curated corpus (see module doc)."""
    from ugfraud_ray.pipelines.dedup import exact_dedup, minhash_lsh_dedup
    from ugfraud_ray.pipelines.sketches import _md5_low64
    from ugfraud_ray.pipelines.text_analysis import _explode_tokens

    def gate(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(pc.utf8_length(t[key]), min_chars))

    # lazy on purpose: every consumer re-reads the pruned source through
    # the gate filter; the text column is never pinned in the object store
    gated = docs.map_batches(gate, batch_format="pyarrow")
    if gated.limit(1).count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "split": pa.array([], pa.string()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        )

    exact = exact_dedup(gated, key=key, id_col=id_col).select_columns([id_col])
    survivors = _semi_join_ids(gated, exact, id_col, local_threshold)

    clusters = minhash_lsh_dedup(survivors, key=key, id_col=id_col)
    reps = clusters.filter(expr=f"{id_col} == cluster").select_columns([id_col])
    final = _semi_join_ids(survivors, reps, id_col, local_threshold)

    def finish(t: pa.Table) -> pa.Table:
        flat, rows = _explode_tokens(t, key)
        n = np.bincount(rows, minlength=t.num_rows).astype(np.int64)
        ids = t[id_col].to_pylist()
        b = (_md5_low64([str(i) for i in ids]) % np.uint64(split_mod)).astype(np.int64)
        split = np.full(len(b), "train", dtype=object)
        lo = 0
        for name, hi in split_bounds:
            split[(b >= lo) & (b < hi)] = name
            lo = hi
        return pa.table(
            {
                id_col: t[id_col],
                "split": pa.array(split, pa.string()),
                "n_tokens": pa.array(n),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow")


def mixture_report(
    cur: "ray.data.Dataset",
    meta: "ray.data.Dataset",
    id_col: str = "doc_id",
    local_threshold: int = 10_000_000,
) -> "ray.data.Dataset":
    """Data-mixture report — the readout an LLM data team consumes:
    per (split, lang, source) document count and total token budget over
    the curated corpus joined back to document metadata.

    ``cur`` is the curate() output (doc_id, split, n_tokens); ``meta``
    carries (doc_id, lang, source). Below ``local_threshold`` metadata
    rows the (id -> lang/source) map is collected once, sorted, and
    broadcast for a vectorized searchsorted attach (with a loud error if
    a curated doc has no metadata); above it, the corpus-sized metadata
    never lands on the driver — an inner ``Dataset.join`` on doc_id does
    the attach (missing metadata silently drops the doc there, the
    inner-join semantics). Exact integers, one tiny grouped sum.
    """
    from ray.data.aggregate import Count, Sum

    n_meta = meta.count()
    if n_meta > local_threshold:
        attached = cur.join(
            meta, join_type="inner", on=(id_col,), num_partitions=join_partitions()
        ).select_columns(["split", "lang", "source", "n_tokens"])
    else:
        mt = collect_table(meta)
        if mt.num_rows == 0:
            raise ValueError("mixture_report: empty metadata")
        mid = mt[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(mid, kind="stable")
        langs = np.asarray(mt["lang"].to_pylist(), dtype=object)
        srcs = np.asarray(mt["source"].to_pylist(), dtype=object)
        ref = ray.put((mid[order], langs[order], srcs[order]))

        def attach(t: pa.Table) -> pa.Table:
            ids_s, lg, sc = ray.get(ref)
            vid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.clip(np.searchsorted(ids_s, vid), 0, len(ids_s) - 1)
            if not (ids_s[pos] == vid).all():
                raise ValueError("mixture_report: curated doc missing from metadata")
            return pa.table(
                {
                    "split": t["split"],
                    "lang": pa.array(lg[pos], pa.string()),
                    "source": pa.array(sc[pos], pa.string()),
                    "n_tokens": t["n_tokens"],
                }
            )

        attached = cur.map_batches(attach, batch_format="pyarrow")

    return attached.groupby(["split", "lang", "source"]).aggregate(
        Count(alias_name="n_docs"), Sum("n_tokens", alias_name="total_tokens")
    )


def _quality_selkey(t: pa.Table, key: str = "text") -> np.ndarray:
    """Integer quality selection key: the quality_score ratio rewritten
    as one exact rational N/D over the integer char/space/punct counts
    (common denominator D = 3*500*17*nz = 25500*nz), landed on the 1e-6
    grid with a half-up non-negative integer division — no float
    arithmetic anywhere, so rank order replays bit-exactly in SQL.

      len   = min(nc,500)/500
      space = (17*nz - min(|100*nsp - 17*nz|, 17*nz)) / (17*nz)
      punct = (nz - min(5*npu, nz)) / nz           nz = max(nc, 1)
      qsel  = (N*2e6 + D) // (2*D),  N/D = (len+space+punct)/3

    int64 bound: N <= 76500*nz and N*2e6 < 2^63 for nz < 6e7 chars
    (guarded)."""
    from ugfraud_ray.pipelines.text_analysis import _PUNCT_RE, _SPACE_RE

    nc = pc.cast(pc.utf8_length(t[key]), pa.int64()).to_numpy(zero_copy_only=False)
    nsp = pc.count_substring_regex(t[key], _SPACE_RE).to_numpy(zero_copy_only=False).astype(np.int64)
    npu = pc.count_substring_regex(t[key], _PUNCT_RE).to_numpy(zero_copy_only=False).astype(np.int64)
    nz = np.maximum(nc, 1)
    if nz.max(initial=0) >= 60_000_000:  # pragma: no cover
        raise ValueError("domain_cap: document too large for the int64 key grid")
    m_s = np.minimum(np.abs(100 * nsp - 17 * nz), 17 * nz)
    m_p = np.minimum(5 * npu, nz)
    n = (
        np.minimum(nc, 500) * 51 * nz
        + (17 * nz - m_s) * 1500
        + (nz - m_p) * 25500
    )
    d = 25500 * nz
    return (n * 2_000_000 + d) // (2 * d)


def domain_cap(
    docs: "ray.data.Dataset",
    k: int = 3,
    id_col: str = "doc_id",
    source_col: str = "source",
    local_threshold: int = 1_000_000,
) -> "ray.data.Dataset":
    """Per-source document cap — keep the top ``k`` docs of every source
    by (quality DESC, doc_id ASC) with a dense rank. The RefinedWeb-style
    curation rule that stops any single domain from dominating the
    corpus. Output (doc_id, source, quality, rnk); quality = qsel/1e6
    (exact-integer key, see :func:`_quality_selkey`, so the float is the
    same bits both sides).

    Distributed shape (the top_orders_per_customer semilattice): one
    scoring pass, per-block top-k partials (<= k rows per source leave a
    block) -> ONE coarse source-hash bucket shuffle -> identical kernel
    per bucket. Below the gate the kernel runs once driver-local.
    Reference analog: none (UGFraud has no corpus ops); public pattern:
    RefinedWeb / CCNet per-domain caps.
    """
    import pandas as pd

    from ugfraud_ray.functions.bucketing import n_coarse_buckets

    src = docs.select_columns([id_col, source_col, "text"])

    def score(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col],
                source_col: t[source_col],
                "qsel": pa.array(_quality_selkey(t)),
            }
        )

    def topk_kernel(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        srcs = t[source_col].to_numpy(zero_copy_only=False)
        q = t["qsel"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, code = np.unique(srcs, return_inverse=True)
        order = np.lexsort((ids, -q, code))
        code, ids, q = code[order], ids[order], q[order]
        if len(ids):
            new = np.concatenate([[True], code[1:] != code[:-1]])
            starts = np.flatnonzero(new)
            run = np.cumsum(new) - 1
            pos = np.arange(len(ids)) - starts[run]
            keep = pos < k
        else:
            keep = np.zeros(0, dtype=bool)
            pos = np.zeros(0, dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids[keep]),
                source_col: pa.array(uniq[code[keep]], pa.string()),
                "quality": pa.array(q[keep] / 1_000_000.0),
                "rnk": pa.array((pos[keep] + 1).astype(np.int64)),
                "qsel": pa.array(q[keep]),
            }
        )

    scored = src.map_batches(score, batch_format="pyarrow")
    n = docs.count()
    if n <= local_threshold:
        out = topk_kernel(collect_table(scored))
        return ray.data.from_arrow(out.drop_columns(["qsel"]))

    nb = n_coarse_buckets(n)

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            t[source_col].to_numpy(zero_copy_only=False).astype(object)
        )
        return t.append_column("_cb", pa.array((h % nb).astype(np.int64)))

    def per_bucket(g: pa.Table) -> pa.Table:
        return topk_kernel(g.drop_columns(["_cb", "rnk", "quality"]))

    return (
        scored.map_batches(topk_kernel, batch_format="pyarrow")
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(per_bucket, batch_format="pyarrow")
        .map_batches(
            lambda t: t.drop_columns(["qsel"]), batch_format="pyarrow"
        )
    )


def source_coverage(
    docs: "ray.data.Dataset", key: str = "text", source_col: str = "source"
) -> "ray.data.Dataset":
    """Token-mass coverage curve by source (the Lorenz-curve curation
    diagnostic: "how concentrated is the corpus — what share of tokens
    do the top-k sources contribute?"). Returns one row per source,
    ranked by (n_tokens DESC, source ASC):
    (rnk, source, n_tokens, cum_tokens) — cum_tokens/total at rank k is
    the coverage of the k heaviest sources. All integers, so the SQL
    window replay (ROW_NUMBER + SUM OVER the same ordering) is exact.

    Shape: per-block (source, tokens) integer partials -> ONE grouped
    sum bounded by the source domain -> the ranked prefix scan runs on
    the sources-sized aggregate at the driver (never corpus-sized).
    Token rule = whitespace split, empties dropped — identical to
    :func:`text_analysis.source_quality_rollup`.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        src = np.asarray(t[source_col].to_pylist(), dtype=object)
        n_tok = np.array(
            [len(s.split()) for s in t[key].to_pylist()], dtype=np.int64
        )
        order = np.argsort(src, kind="stable")
        src, n_tok = src[order], n_tok[order]
        if len(src):
            change = src[1:] != src[:-1]
            starts = np.flatnonzero(np.concatenate([[True], change]))
            sums = np.add.reduceat(n_tok, starts)
            u = src[starts]
        else:
            starts = np.zeros(0, np.int64)
            sums = np.zeros(0, np.int64)
            u = src
        return pa.table(
            {
                "source": pa.array(u.tolist(), pa.string()),
                "k": pa.array(sums),
            }
        )

    agg = (
        docs.select_columns([source_col, key])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(source_col)
        .aggregate(Sum("k", alias_name="n_tokens"))
    )
    from ugfraud_ray.functions.collect import collect_table

    t = collect_table(agg)
    src = np.asarray(t["source"].to_pylist(), dtype=object)
    k = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
    # (n_tokens DESC, source ASC): stable sort by source, then stable
    # sort by -k (np.lexsort rejects object keys)
    o1 = np.argsort(src, kind="stable")
    o2 = np.argsort(-k[o1], kind="stable")
    order = o1[o2]
    src, k = src[order], k[order]
    return ray.data.from_arrow(
        pa.table(
            {
                "rnk": pa.array(np.arange(1, len(k) + 1, dtype=np.int64)),
                "source": pa.array(src.tolist(), pa.string()),
                "n_tokens": pa.array(k),
                "cum_tokens": pa.array(np.cumsum(k).astype(np.int64)),
            }
        )
    )


def _dsir_feature_buckets(
    t: pa.Table, key: str, nbuckets: int
) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, row_idx) for DSIR's hashed unigram+bigram features.

    Tokenization is the repo-wide lowered ``\\s+`` split with empties
    dropped; bigrams never cross a document boundary. Feature identity
    is md5-low64 (== DuckDB ``md5_number_upper``), bigrams over
    ``w1\\x1fw2`` — the lm_surprisal convention — reduced mod nbuckets.
    """
    from ugfraud_ray.pipelines.sketches import _md5_low64
    from ugfraud_ray.pipelines.text_analysis import _explode_tokens

    flat, rows = _explode_tokens(t, key)
    uh = _md5_low64(list(flat)) % np.uint64(nbuckets)
    adj = rows[:-1] == rows[1:] if len(rows) else np.zeros(0, dtype=bool)
    w1, w2, brows = flat[:-1][adj], flat[1:][adj], rows[:-1][adj]
    bh = _md5_low64([f"{a}\x1f{b}" for a, b in zip(w1, w2)]) % np.uint64(nbuckets)
    return (
        np.concatenate([uh, bh]).astype(np.int64),
        np.concatenate([rows, brows]),
    )


def dsir_weights(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    target_col: str = "lang",
    target_value: str = "en",
    nbuckets: int = 65536,
) -> "ray.data.Dataset":
    """DSIR data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"),
    log2-quantized so every number is an EXACT integer. Features are
    hashed unigrams+bigrams in ``nbuckets`` buckets; the target
    distribution is the subset ``target_col == target_value`` and the
    raw distribution is the whole corpus. Per bucket

        w[b] = bitlen(n_target[b] + 1) - bitlen(n_raw[b] + 1)

    (bit-length difference == floor-log2 likelihood ratio, exact on
    both sides: DuckDB ``length(bin(n))``), and a document's weight is
    the sum of w over its feature OCCURRENCES. Output (id_col,
    n_features, dsir_weight); docs with zero tokens emit nothing.
    High (less negative) weight = looks like the target set.

    Scale shape: the model is FIXED-SIZE (nbuckets counters) whatever
    the corpus — per-block bincount partials collapse into one tiny
    bucket groupby, the merged table broadcasts once via ``ray.put``,
    and the scoring pass aggregates inside each source batch. Zero
    corpus-sized shuffles at any scale; no gate needed.
    """
    from ray.data.aggregate import Sum

    cols = docs.select_columns([id_col, key, target_col])

    def model_partial(t: pa.Table) -> pa.Table:
        b, rows = _dsir_feature_buckets(t, key, nbuckets)
        is_t = pc.equal(t[target_col], target_value).to_numpy(zero_copy_only=False)
        cr = np.bincount(b, minlength=nbuckets)
        ct = np.bincount(b[is_t[rows]], minlength=nbuckets)
        nz = np.flatnonzero(cr)
        return pa.table(
            {
                "b": pa.array(nz.astype(np.int64)),
                "ct": pa.array(ct[nz].astype(np.int64)),
                "cr": pa.array(cr[nz].astype(np.int64)),
            }
        )

    model = (
        cols.map_batches(model_partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("ct", alias_name="ct"), Sum("cr", alias_name="cr"))
    )
    mt = collect_table(model)  # bounded: <= nbuckets rows by construction
    w = np.zeros(nbuckets, dtype=np.int64)
    bs = mt["b"].to_numpy(zero_copy_only=False)
    ct = mt["ct"].to_numpy(zero_copy_only=False).astype(np.float64)
    cr = mt["cr"].to_numpy(zero_copy_only=False).astype(np.float64)
    # frexp exponent == bit length, exact < 2^53
    w[bs] = np.frexp(ct + 1.0)[1].astype(np.int64) - np.frexp(cr + 1.0)[1].astype(np.int64)
    w_ref = ray.put(w)

    def score(t: pa.Table) -> pa.Table:
        wv = ray.get(w_ref)
        b, rows = _dsir_feature_buckets(t, key, nbuckets)
        nr = len(t)
        nf = np.bincount(rows, minlength=nr).astype(np.int64)
        ws = np.zeros(nr, dtype=np.int64)
        np.add.at(ws, rows, wv[b])
        nz = nf > 0
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids[nz]),
                "n_features": pa.array(nf[nz]),
                "dsir_weight": pa.array(ws[nz]),
            }
        )

    return cols.map_batches(score, batch_format="pyarrow")


_QD_PACK = 1 << 40  # qsel <= 3e6, so qsel*2^40 < 3.4e18 < 2^63; doc_id must be < 2^40


def quality_dedup(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    seed: int = 7,
) -> "ray.data.Dataset":
    """Quality-aware near-dedup — keep the BEST document of each
    MinHash-LSH near-dup cluster instead of the first: the real
    curation policy when duplicates differ in extraction quality
    (SemDeDup/FineWeb keep-best variant of the keep-min rule).
    Output (doc_id, cluster, qsel, kept) where qsel is the exact
    integer quality selection key (``_quality_selkey``, the 1e-6-grid
    rational) and kept = 1 iff the doc maximizes (qsel, -doc_id) in its
    cluster — singleton clusters are always kept.

    Scale shape: reuses the verified LSH+CC cluster chain; clusters and
    quality keys zip in ONE doc-bucketed union shuffle of integer rows
    (text never shuffles); winners come from cluster-keyed Max over a
    packed (qsel, -doc) key, and only multi-doc families broadcast —
    the same O(colliding docs) footprint as the LSH cluster map itself.
    """
    from ray.data.aggregate import Count, Max

    from ugfraud_ray.functions.bucketing import n_coarse_buckets
    from ugfraud_ray.pipelines.dedup import minhash_lsh_dedup

    clusters = minhash_lsh_dedup(
        docs, key=key, id_col=id_col, num_perm=num_perm,
        bands=bands, ngram=ngram, seed=seed,
    )

    def q_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and (ids.max() >= _QD_PACK or ids.min() < 0):
            raise ValueError(
                "quality_dedup: doc_id outside [0, 2^40) breaks the packed key"
            )
        return pa.table(
            {
                id_col: pa.array(ids),
                "val": pa.array(_quality_selkey(t, key)),
                "kind": pa.array(np.ones(len(ids), dtype=np.int64)),
            }
        )

    def c_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col],
                "val": t["cluster"],
                "kind": pa.array(np.zeros(len(t), dtype=np.int64)),
            }
        )

    tagged = clusters.map_batches(c_rows, batch_format="pyarrow").union(
        docs.select_columns([id_col, key]).map_batches(q_rows, batch_format="pyarrow")
    )
    from ugfraud_ray.functions.bucketing import bucket_by_int_col

    bucketize = bucket_by_int_col(id_col, n_coarse_buckets())

    def zip_rows(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        val = g["val"].to_numpy(zero_copy_only=False).astype(np.int64)
        kind = g["kind"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((kind, ids))
        ids, val, kind = ids[order], val[order], kind[order]
        if len(ids) % 2 or not ((ids[::2] == ids[1::2]).all() and (kind[::2] == 0).all()):
            raise ValueError("quality_dedup: cluster and quality streams disagree")
        return pa.table(
            {
                id_col: pa.array(ids[::2]),
                "cluster": pa.array(val[::2]),
                "qsel": pa.array(val[1::2]),
            }
        )

    joined = (
        tagged.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(zip_rows, batch_format="pyarrow")
        .materialize()  # integer triplets only; reused by winners + flags
    )

    def pack_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        q = t["qsel"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "cluster": t["cluster"],
                "pack": pa.array(q * np.int64(_QD_PACK) + (np.int64(_QD_PACK) - 1 - ids)),
                "n": pa.array(np.ones(len(ids), dtype=np.int64)),
            }
        )

    fams = (
        joined.map_batches(pack_rows, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Max("pack", alias_name="pack"), Count(alias_name="n"))
        .filter(expr="n > 1")
    )
    ft = collect_table(fams)
    fc = ft["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
    fw = (np.int64(_QD_PACK) - 1 - (ft["pack"].to_numpy(zero_copy_only=False) % _QD_PACK)).astype(np.int64)
    order = np.argsort(fc)
    fam_ref = ray.put((fc[order], fw[order]))

    def flag(t: pa.Table) -> pa.Table:
        fcs, fws = ray.get(fam_ref)
        cl = t["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(fcs, cl), 0, max(len(fcs) - 1, 0))
        hit = (fcs[pos] == cl) if len(fcs) else np.zeros(len(cl), dtype=bool)
        kept = (~hit | (ids == (fws[pos] if len(fcs) else ids))).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "cluster": t["cluster"],
                "qsel": t["qsel"],
                "kept": pa.array(kept),
            }
        )

    return joined.map_batches(flag, batch_format="pyarrow")


def ppl_buckets(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    approx_docs: int | None = None,
) -> "ray.data.Dataset":
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3):
    split the corpus into 'head' / 'middle' / 'tail' by the per-doc
    mean LM surprisal — head = looks most like the corpus LM, tail =
    least. The LM is the engine's integer-exact trigram surprisal
    (:func:`text_analysis.lm_surprisal`); the per-doc key is
    surprisal_sum * 1000 // n_trigrams (1e-3 grid, exact), and the cut
    points are the EXACT 25th/75th-percentile order statistics
    (rank floor((n-1)q), q a power-of-two fraction so the float rank
    equals the SQL integer division exactly). Docs with < 3 tokens emit
    nothing (the surprisal contract). Output (id_col, ppl_key, bucket).

    Scale shape: surprisal is the verified fixed-vocab chain; the key
    dataset is integer pairs (materialized once, no text); thresholds
    come from the histogram+refine exact-quantile pass — never a full
    sort; bucketing is one streaming map.
    """
    from ugfraud_ray.functions.quantiles import exact_quantiles
    from ugfraud_ray.pipelines.text_analysis import lm_surprisal

    n_docs = approx_docs if approx_docs is not None else docs.count()
    sc = lm_surprisal(docs, key=key, id_col=id_col, approx_docs=n_docs)

    def to_key(t: pa.Table) -> pa.Table:
        ss = t["surprisal_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        nt = t["n_trigrams"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {id_col: t[id_col], "ppl_key": pa.array((ss * 1000) // nt)}
        )

    keys = sc.map_batches(to_key, batch_format="pyarrow").materialize()
    qs = exact_quantiles(keys, "ppl_key", [0.25, 0.75], approx_rows=n_docs)
    t1, t2 = int(qs[0][1]), int(qs[1][1])

    def bucket(t: pa.Table) -> pa.Table:
        k = t["ppl_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.where(k <= t1, "head", np.where(k <= t2, "middle", "tail"))
        return pa.table(
            {
                id_col: t[id_col],
                "ppl_key": t["ppl_key"],
                "bucket": pa.array(b.tolist(), pa.string()),
            }
        )

    return keys.map_batches(bucket, batch_format="pyarrow")


def quality_percentile(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    key: str = "text",
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Rank-normalized quality: every doc's exact global percentile rank
    under the integer quality key (:func:`_quality_selkey`), pct_rank =
    round(pos / (n-1), 9) with pos = ROW_NUMBER by (qsel ASC, id ASC) -
    1 — the quantile-transform a curation pipeline uses to make quality
    thresholds corpus-independent ("keep the top 30%" instead of "keep
    quality > 0.62").

    Distributed shape (shuffle_shards' two-level ordered scan, NO
    global sort): qsel is bounded on the 1e6 grid, so bucket =
    qsel * nb // 1_000_001 is ORDER-PRESERVING; buckets rank locally by
    (qsel, id), the driver prefix-sums <= nb counts into offsets, and a
    second pass emits the global position. Every rank quantity is an
    integer; the single float division is mirrored in the SQL replay.

    Reference analog: scale_value's min-max normalization
    (/root/reference Utils/helper.py:66-86) — this is its
    outlier-immune rank-based sibling.
    """
    from ugfraud_ray.functions.bucketing import n_coarse_buckets

    nb = n_buckets or n_coarse_buckets()

    def key_rows(t: pa.Table) -> pa.Table:
        q = _quality_selkey(t, key=key)
        return pa.table(
            {
                id_col: t[id_col],
                "qsel": pa.array(q),
                "_rb": pa.array(q * nb // 1_000_001),
            }
        )

    def local_rank(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        q = g["qsel"].to_numpy(zero_copy_only=False).astype(np.int64)
        rb = int(g["_rb"][0].as_py())
        order = np.lexsort((ids, q))
        inv = np.empty(len(order), dtype=np.int64)
        inv[order] = np.arange(len(order))
        return pa.table(
            {
                id_col: pa.array(ids),
                "qsel": pa.array(q),
                "_rb": pa.array(np.full(len(ids), rb, dtype=np.int64)),
                "_local": pa.array(inv),
            }
        )

    ranked = (
        docs.select_columns([id_col, key])
        .map_batches(key_rows, batch_format="pyarrow")
        .groupby("_rb")
        .map_groups(local_rank, batch_format="pyarrow")
        .materialize()  # id+key ints only; read twice (counts, then finish)
    )

    def bucket_counts(t: pa.Table) -> pa.Table:
        rb, cnt = np.unique(
            t["_rb"].to_numpy(zero_copy_only=False).astype(np.int64), return_counts=True
        )
        return pa.table({"_rb": pa.array(rb), "_n": pa.array(cnt.astype(np.int64))})

    ct = collect_table(ranked.map_batches(bucket_counts, batch_format="pyarrow"))
    totals: dict = {}
    for r, c in zip(ct["_rb"].to_pylist(), ct["_n"].to_pylist()):
        totals[r] = totals.get(r, 0) + c
    offsets: dict = {}
    run = 0
    for r in sorted(totals):
        offsets[r] = run
        run += totals[r]
    n_total = run
    keys_arr = np.array(sorted(offsets), dtype=np.int64)
    vals_arr = np.array([offsets[k] for k in keys_arr.tolist()], dtype=np.int64)
    off_ref = ray.put((keys_arr, vals_arr, n_total))

    def finish(t: pa.Table, _o=off_ref) -> pa.Table:
        keys_arr, vals_arr, n = ray.get(_o)
        rb = t["_rb"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = vals_arr[np.searchsorted(keys_arr, rb)] + t["_local"].to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        pct = (
            np.round(pos / (n - 1), 9)
            if n > 1
            else np.zeros(len(pos), dtype=np.float64)
        )
        return pa.table(
            {
                id_col: t[id_col],
                "qsel": t["qsel"],
                "pct_rank": pa.array(pct),
            }
        )

    return ranked.map_batches(finish, batch_format="pyarrow")


def split_leakage(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    key: str = "text",
    buckets: dict[str, int] | None = None,
    mod: int = 1000,
) -> "ray.data.Dataset":
    """(split_a, split_b, n_pairs) — decontamination QA for a hashed
    train/valid/test split: how many MinHash-LSH candidate near-dup
    pairs CROSS split boundaries. A healthy curated corpus has (near-)
    zero off-diagonal mass; a big train/test cell means the eval set
    leaks into training (Lee et al. 2022 / Gopher decontamination
    rationale, applied to the corpus's own split instead of an external
    benchmark — ``contamination.bloom_contamination`` covers that one).

    Scale shape: the pair set comes from the shared bit-exact
    ``dedup.minhash_lsh_candidates`` chain; each endpoint's split is
    recomputed INLINE from the split hash (md5-low64(str(id)) % mod,
    ``splits.assign_splits``'s rule), so classification adds ZERO
    joins/shuffles on top of the LSH chain — per-batch uniqued
    (split_a, split_b, n) partials into a <=|splits|^2-row grouped sum.
    Pair-class order is lexicographic (split_a <= split_b), matching
    SQL LEAST/GREATEST on the split names.
    """
    from ray.data.aggregate import Sum

    from ugfraud_ray.pipelines.dedup import minhash_lsh_candidates
    from ugfraud_ray.pipelines.sketches import _md5_low64

    buckets = {"test": 100, "valid": 100} if buckets is None else buckets
    if sum(buckets.values()) > mod:
        raise ValueError("split buckets exceed mod")
    names, bounds = [], []
    acc = 0
    for name, n in buckets.items():
        acc += n
        names.append(name)
        bounds.append(acc)

    def split_of(ids: np.ndarray) -> np.ndarray:
        b = (_md5_low64([str(i) for i in ids.tolist()]) % np.uint64(mod)).astype(
            np.int64
        )
        out = np.full(len(b), "train", dtype=object)
        lo = 0
        for name, hi in zip(names, bounds):
            out[(b >= lo) & (b < hi)] = name
            lo = hi
        return out

    cands = minhash_lsh_candidates(docs, key=key, id_col=id_col)

    def classify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "split_a": pa.array([], pa.string()),
                    "split_b": pa.array([], pa.string()),
                    "n_pairs": pa.array([], pa.int64()),
                }
            )
        a = split_of(t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64))
        b = split_of(t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64))
        swap = a > b  # numpy object-str comparison == lexicographic LEAST
        sa = np.where(swap, b, a)
        sb = np.where(swap, a, b)
        pairkey = np.char.add(np.char.add(sa.astype(str), "\x1f"), sb.astype(str))
        u, cnt = np.unique(pairkey, return_counts=True)
        parts = np.char.partition(u, "\x1f")
        return pa.table(
            {
                "split_a": pa.array(parts[:, 0].astype(object), pa.string()),
                "split_b": pa.array(parts[:, 2].astype(object), pa.string()),
                "n_pairs": pa.array(cnt.astype(np.int64)),
            }
        )

    return (
        cands.map_batches(classify, batch_format="pyarrow")
        .groupby(["split_a", "split_b"])
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))
    )


def doc_cube(docs: "ray.data.Dataset") -> pa.Table:
    """CUBE(lang, source) corpus report: (lang, source, n_docs,
    n_tokens) at every grouping-set level, aggregated-out dimensions
    shown as 'ALL' — the multi-dimensional sibling of
    ``relational.revenue_rollup`` (same contract: ONE corpus pass; the
    upper levels are exact integer re-sums of the dimension-sized
    (lang, source) base cells, never a second scan or shuffle).
    Tokens = the shared lowercased \\s+ count."""
    from ray.data.aggregate import Sum

    from ugfraud_ray.pipelines.text_analysis import _explode_tokens

    def partial(t: pa.Table) -> pa.Table:
        lang = np.asarray(t["lang"].to_pylist(), dtype=object)
        srcv = np.asarray(t["source"].to_pylist(), dtype=object)
        _, rows = _explode_tokens(t, "text")  # empties dropped, == list_filter
        toks = np.bincount(rows, minlength=t.num_rows).astype(np.int64)
        pk = np.char.add(np.char.add(lang.astype(str), "\x1f"), srcv.astype(str))
        order = np.argsort(pk, kind="stable")
        pk, toks = pk[order], toks[order]
        starts = np.flatnonzero(np.concatenate([[True], pk[1:] != pk[:-1]]))
        nd = np.diff(np.append(starts, len(pk))).astype(np.int64)
        nt = np.add.reduceat(toks, starts) if len(starts) else toks[:0]
        parts = np.char.partition(pk[starts], "\x1f")
        return pa.table(
            {
                "lang": pa.array(parts[:, 0].astype(object), pa.string()),
                "source": pa.array(parts[:, 2].astype(object), pa.string()),
                "n_docs": pa.array(nd),
                "n_tokens": pa.array(nt),
            }
        )

    base = collect_table(
        docs.select_columns(["lang", "source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_tokens", alias_name="n_tokens"))
    )
    import pandas as pd

    df = base.to_pandas()
    out = [df]
    by_lang = df.groupby("lang", as_index=False)[["n_docs", "n_tokens"]].sum()
    by_lang["source"] = "ALL"
    out.append(by_lang)
    by_src = df.groupby("source", as_index=False)[["n_docs", "n_tokens"]].sum()
    by_src["lang"] = "ALL"
    out.append(by_src)
    total = pd.DataFrame(
        {
            "lang": ["ALL"],
            "source": ["ALL"],
            "n_docs": [df["n_docs"].sum()],
            "n_tokens": [df["n_tokens"].sum()],
        }
    )
    out.append(total)
    allr = pd.concat(out, ignore_index=True)[["lang", "source", "n_docs", "n_tokens"]]
    return pa.table(
        {
            "lang": pa.array(allr["lang"].astype(object), pa.string()),
            "source": pa.array(allr["source"].astype(object), pa.string()),
            "n_docs": pa.array(allr["n_docs"].to_numpy().astype(np.int64)),
            "n_tokens": pa.array(allr["n_tokens"].to_numpy().astype(np.int64)),
        }
    )


def mixture_drift(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> pa.Table:
    """(source, n_a, n_b, share_a, share_b, abs_delta) — per-source
    composition drift between two crawl snapshots (here the
    deterministic even/odd doc_id halves — the driver-testdata stand-in
    for consecutive monthly crawls): the total-variation drift the
    mixture monitor alerts on is 0.5 * SUM(abs_delta). One pass of
    dimension-bounded (source, parity) partials into a tiny grouped
    sum; shares are single float divisions on identical integers both
    sides, deltas on the pinned 1e-9 grid."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        src = np.asarray(t[source_col].to_pylist(), dtype=object)
        par = (
            t[id_col].to_numpy(zero_copy_only=False).astype(np.int64) % 2
        ).astype(np.int64)
        pk = np.char.add(np.char.add(src.astype(str), "\x1f"), par.astype(str))
        u, c = np.unique(pk, return_counts=True)
        parts = np.char.partition(u, "\x1f")
        return pa.table(
            {
                "source": pa.array(parts[:, 0].astype(object), pa.string()),
                "parity": pa.array(parts[:, 2].astype(np.int64)),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    base = collect_table(
        docs.select_columns([id_col, source_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "parity"])
        .aggregate(Sum("n", alias_name="n"))
    ).to_pandas()
    piv = base.pivot_table(
        index="source", columns="parity", values="n", fill_value=0, aggfunc="sum"
    )
    na = piv[0].to_numpy().astype(np.int64) if 0 in piv.columns else np.zeros(len(piv), np.int64)
    nb = piv[1].to_numpy().astype(np.int64) if 1 in piv.columns else np.zeros(len(piv), np.int64)
    ta, tb = int(na.sum()), int(nb.sum())
    sa = na.astype(np.float64) / float(ta)
    sb = nb.astype(np.float64) / float(tb)
    delta = np.floor(np.abs(sa - sb) * 1e9 + 0.5) / 1e9
    return pa.table(
        {
            "source": pa.array(piv.index.to_numpy().astype(object), pa.string()),
            "n_a": pa.array(na),
            "n_b": pa.array(nb),
            "share_a": pa.array(np.floor(sa * 1e9 + 0.5) / 1e9),
            "share_b": pa.array(np.floor(sb * 1e9 + 0.5) / 1e9),
            "abs_delta": pa.array(delta),
        }
    )


def curation_funnel(
    docs: "ray.data.Dataset", min_chars: int = 100
) -> pa.Table:
    """(stage, n_docs, n_tokens) — the curation funnel report: how many
    documents and tokens survive each stage (raw -> length gate ->
    exact dedup -> near dedup). THE number a data lead asks for after
    every crawl; each row nests the corresponding verified stage.
    Token counts use the shared lowered tokenizer; the final stage is
    exactly ``curate()``'s output (its n_tokens column summed)."""
    from ray.data.aggregate import Sum

    from ugfraud_ray.pipelines.dedup import exact_dedup
    from ugfraud_ray.pipelines.text_analysis import _explode_tokens

    def tok_counts(ds: "ray.data.Dataset") -> tuple[int, int]:
        def partial(t: pa.Table) -> pa.Table:
            _, rows = _explode_tokens(t, "text")
            return pa.table(
                {
                    "nd": pa.array([t.num_rows], pa.int64()),
                    "nt": pa.array([len(rows)], pa.int64()),
                }
            )

        agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
            Sum("nd", alias_name="nd"), Sum("nt", alias_name="nt")
        )
        return int(agg["nd"] or 0), int(agg["nt"] or 0)

    raw_d, raw_t = tok_counts(docs)

    def gate(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(pc.utf8_length(t["text"]), min_chars))

    gated = docs.map_batches(gate, batch_format="pyarrow").materialize()
    g_d, g_t = tok_counts(gated)

    exact_ids = exact_dedup(gated, key="text", id_col="doc_id").select_columns(["doc_id"])
    survivors = _semi_join_ids(gated, exact_ids, "doc_id", 20_000_000).materialize()
    e_d, e_t = tok_counts(survivors)

    cur = curate(docs, min_chars=min_chars)
    f_d = cur.count()
    f_t = int(cur.sum("n_tokens") or 0)

    return pa.table(
        {
            "stage": pa.array(
                ["raw", "length_gate", "exact_dedup", "near_dedup"], pa.string()
            ),
            "n_docs": pa.array([raw_d, g_d, e_d, f_d], pa.int64()),
            "n_tokens": pa.array([raw_t, g_t, e_t, f_t], pa.int64()),
        }
    )
