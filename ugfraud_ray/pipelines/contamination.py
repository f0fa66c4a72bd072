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
