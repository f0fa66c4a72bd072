"""Benchmark-contamination detection: n-gram overlap vs a broadcast set.

The standard decontamination step for a training corpus: mark any
document whose word n-gram shingles overlap a benchmark/eval suite
above a threshold (the GPT-3 / PaLM "13-gram overlap" recipe, here at
the engine's shared 3-gram granularity).

Scale shape: the benchmark suite is tiny relative to the corpus BY
DEFINITION, so its distinct shingle-hash set is collected once,
sorted, `ray.put` once, and probed per batch with `np.searchsorted`
(never a shuffle join — the corpus side streams). Shingle hashing is
`pipelines.dedup._shingle_hashes`, the identical 64-bit chain used by
minhash-LSH, so the SQL oracle reuses the same bit-exact CTE chain.

Contamination rule (integer-exact, no float ratio):

    contaminated = n_shingles > 0 AND n_overlap * 100 >= pct * n_shingles
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.pools import actor_pool_size

from ugfraud_ray.functions.collect import collect_table
from ugfraud_ray.pipelines.dedup import _shingle_hashes


def benchmark_shingles(
    bench_docs: "ray.data.Dataset", key: str = "text", ngram: int = 3
) -> np.ndarray:
    """Sorted distinct uint64 shingle hashes of the benchmark suite."""

    def per_block(t: pa.Table) -> pa.Table:
        hs = [_shingle_hashes(x, ngram) for x in t[key].to_pylist()]
        u = np.unique(np.concatenate(hs)) if hs else np.zeros(0, np.uint64)
        return pa.table({"sh": pa.array(u, pa.uint64())})

    t = collect_table(bench_docs.map_batches(per_block, batch_format="pyarrow"))
    return np.unique(t["sh"].to_numpy(zero_copy_only=False).astype(np.uint64))


class ContaminationScorer:
    """Actor-pool batch stage: benchmark set fetched ONCE per actor."""

    def __init__(self, bench_ref, key: str, id_col: str, ngram: int, pct: int):
        self.bench = ray.get(bench_ref)  # sorted uint64
        self.key = key
        self.id_col = id_col
        self.ngram = ngram
        self.pct = pct

    def __call__(self, t: pa.Table) -> pa.Table:
        n_sh = np.empty(t.num_rows, dtype=np.int64)
        n_ov = np.empty(t.num_rows, dtype=np.int64)
        for i, text in enumerate(t[self.key].to_pylist()):
            sh = np.unique(_shingle_hashes(text, self.ngram))
            n_sh[i] = len(sh)
            if len(sh) and len(self.bench):
                idx = np.searchsorted(self.bench, sh)
                idx[idx == len(self.bench)] = 0
                n_ov[i] = int((self.bench[idx] == sh).sum())
            else:
                n_ov[i] = 0
        flag = ((n_sh > 0) & (n_ov * 100 >= self.pct * n_sh)).astype(np.int64)
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "n_shingles": pa.array(n_sh),
                "n_overlap": pa.array(n_ov),
                "contaminated": pa.array(flag),
            }
        )


def contamination_check(
    docs: "ray.data.Dataset",
    bench_docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    pct: int = 10,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """(id, n_shingles, n_overlap, contaminated) per corpus document."""
    bench_ref = ray.put(benchmark_shingles(bench_docs, key=key, ngram=ngram))
    return docs.map_batches(
        ContaminationScorer,
        fn_constructor_args=(bench_ref, key, id_col, ngram, pct),
        concurrency=actor_pool_size(concurrency),
        batch_format="pyarrow",
    )


def _bloom_bits(sh: np.ndarray, nh: int, mbits: int) -> np.ndarray:
    """(len(sh), nh) bit positions via Kirsch-Mitzenmacher double
    hashing over the 64-bit shingle hash: bit_j = (hi32 + j*lo32) %
    mbits — pure uint64 arithmetic (hi32 + j*lo32 < 2^33 + nh*2^32,
    no wraparound), so DuckDB HUGEINT replays it exactly."""
    hi = sh >> np.uint64(32)
    lo = sh & np.uint64(0xFFFFFFFF)
    return np.stack(
        [(hi + np.uint64(j) * lo) % np.uint64(mbits) for j in range(nh)], axis=1
    )


class BloomScorer:
    """Actor-pool stage: the bloom bitset AND the exact benchmark set
    fetched once per actor; per doc reports the exact overlap next to
    the bloom-filter overlap so the one-sided error (false positives,
    never false negatives) is directly visible."""

    def __init__(self, state_ref, key, id_col, ngram, nh, mbits):
        self.bloom, self.bench = ray.get(state_ref)
        self.key = key
        self.id_col = id_col
        self.ngram = ngram
        self.nh = nh
        self.mbits = mbits

    def __call__(self, t: pa.Table) -> pa.Table:
        n_sh = np.empty(t.num_rows, dtype=np.int64)
        n_ov = np.empty(t.num_rows, dtype=np.int64)
        n_bl = np.empty(t.num_rows, dtype=np.int64)
        for i, text in enumerate(t[self.key].to_pylist()):
            sh = np.unique(_shingle_hashes(text, self.ngram))
            n_sh[i] = len(sh)
            if not len(sh):
                n_ov[i] = n_bl[i] = 0
                continue
            if len(self.bench):
                idx = np.searchsorted(self.bench, sh)
                idx[idx == len(self.bench)] = 0
                n_ov[i] = int((self.bench[idx] == sh).sum())
            else:
                n_ov[i] = 0
            bits = _bloom_bits(sh, self.nh, self.mbits)
            n_bl[i] = int(self.bloom[bits].all(axis=1).sum())
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "n_shingles": pa.array(n_sh),
                "n_overlap": pa.array(n_ov),
                "n_bloom": pa.array(n_bl),
            }
        )


def bloom_contamination(
    docs: "ray.data.Dataset",
    bench_docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    mbits: int = 1 << 16,
    nh: int = 2,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Bloom-filter decontamination probe (Bloom 1970; bit derivation =
    Kirsch-Mitzenmacher 2006 double hashing over the shared 64-bit
    shingle chain). Returns (id, n_shingles, n_overlap, n_bloom) per
    corpus doc with the invariant n_bloom >= n_overlap — a Bloom filter
    has NO false negatives, so n_bloom - n_overlap is the measured
    false-positive mass at this (mbits, nh, |bench|) operating point.

    Why next to the exact broadcast probe (:func:`contamination_check`):
    the exact set costs 8 bytes per benchmark shingle; the bitset costs
    mbits bits TOTAL whatever the benchmark size, and per-block bitsets
    merge by OR (commutative, associative, idempotent) — the shape that
    survives when the "benchmark" is a whole held-out corpus. Here the
    bitset is built from the collected benchmark shingle set (tiny by
    definition in the eval-suite case); everything — shingle hash, bit
    positions, min-over-j membership — replays bit-exactly in SQL.
    """
    sh = benchmark_shingles(bench_docs, key=key, ngram=ngram)
    bloom = np.zeros(mbits, dtype=bool)
    if len(sh):
        bloom[_bloom_bits(sh, nh, mbits).reshape(-1).astype(np.int64)] = True
    state_ref = ray.put((bloom, sh))
    return docs.map_batches(
        BloomScorer,
        fn_constructor_args=(state_ref, key, id_col, ngram, nh, mbits),
        concurrency=actor_pool_size(concurrency),
        batch_format="pyarrow",
    )
