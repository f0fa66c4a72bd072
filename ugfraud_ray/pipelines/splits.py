"""Deterministic dataset splitting (train/valid/test) by key hash.

Every large training pipeline needs a split that is (a) stable across
runs and cluster sizes, (b) computable per batch with no shuffle, and
(c) replayable by any other system. Bucket = md5-low64 of the string
key, mod `mod` (== DuckDB ``md5_number_upper(CAST(id AS VARCHAR)) %
mod`` — the engine's shared hash convention, `pipelines/sketches.py`).
Split boundaries are cumulative bucket ranges, so fractions are exact
in expectation and assignment is a pure per-row function: embarrassing
parallel, no state, no coordination.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ugfraud_ray.pipelines.sketches import _md5_low64


def assign_splits(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    buckets: dict[str, int] | None = None,
    mod: int = 1000,
) -> "ray.data.Dataset":
    """Label every row: (id_col, bucket, split).

    `buckets` maps split name -> number of buckets, assigned in dict
    order from bucket 0; the remainder is 'train'. Default: 10% test,
    10% valid, 80% train.
    """
    buckets = {"test": 100, "valid": 100} if buckets is None else buckets
    if sum(buckets.values()) > mod:
        raise ValueError("split buckets exceed mod")
    # cumulative upper bounds in dict order
    names, bounds = [], []
    acc = 0
    for name, n in buckets.items():
        acc += n
        names.append(name)
        bounds.append(acc)

    def label(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        b = (_md5_low64([str(i) for i in ids]) % np.uint64(mod)).astype(np.int64)
        split = np.full(len(b), "train", dtype=object)
        lo = 0
        for name, hi in zip(names, bounds):
            split[(b >= lo) & (b < hi)] = name
            lo = hi
        return pa.table(
            {
                id_col: t[id_col],
                "bucket": pa.array(b),
                "split": pa.array(split, pa.string()),
            }
        )

    return ds.map_batches(label, batch_format="pyarrow")


def take_split(
    ds: "ray.data.Dataset",
    split: str,
    id_col: str = "doc_id",
    buckets: dict[str, int] | None = None,
    mod: int = 1000,
) -> "ray.data.Dataset":
    """Filter to one split, keeping ALL original columns (streaming)."""
    buckets = {"test": 100, "valid": 100} if buckets is None else buckets
    lo = 0
    hi = None
    for name, n in buckets.items():
        if name == split:
            hi = lo + n
            break
        lo += n
    if hi is None:  # train = remainder
        lo = sum(buckets.values())
        hi = mod

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        b = (_md5_low64([str(i) for i in ids]) % np.uint64(mod)).astype(np.int64)
        return t.filter(pa.array((b >= lo) & (b < hi)))

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_sample_topk(
    ds: "ray.data.Dataset",
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 7,
) -> "ray.data.Dataset":
    """Deterministic weighted sampling without replacement — the
    Efraimidis–Spirakis top-k: draw u_i from the md5 hash of
    f"{seed}:{id}" and keep the k rows with the largest u^(1/w), i.e.
    the largest ln(u)/w. Inclusion probability is proportional to the
    weight; the draw is a pure per-row function (stable across runs and
    cluster sizes) — the standard quality-weighted corpus-mixing
    primitive. No reference analog (random.sample at J4 is unweighted).

    Numeric replay contract (SQL oracle): u = (h>>11 + 1)/2^53 keeps
    both the shift and the divide EXACT in float64 on both sides; the
    single ln + divide may differ by ulps between libms, so selection
    orders by (round(key, 6) DESC, id ASC) — ties broken by id, and a
    boundary flip needs two keys within 1e-6, i.e. ulp-noise-proof.
    Output: (id, weight, key6), the selected k rows.

    Scale shape: per-block top-k inside map_batches (no state), then
    one sort over the ≤ k·num_blocks survivors.
    """
    pre = f"{seed}:"

    def score(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        h = _md5_low64([pre + str(i) for i in ids])
        u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) / float(1 << 53)
        with np.errstate(divide="ignore"):
            key = np.where(w > 0, np.log(u) / np.where(w > 0, w, 1.0), -np.inf)
        key6 = np.floor(key * 1e6 + 0.5) / 1e6
        keep = w > 0
        out = pa.table(
            {
                id_col: t[id_col].filter(pa.array(keep)),
                "weight": pa.array(w[keep]),
                "key6": pa.array(key6[keep]),
            }
        )
        if out.num_rows > k:  # per-block pre-prune, same order rule
            kk = out["key6"].to_numpy(zero_copy_only=False)
            ii = np.asarray(out[id_col].to_pylist())
            order = np.lexsort((ii, -kk))[:k]
            out = out.take(pa.array(np.sort(order)))
        return out

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["key6", id_col], descending=[True, False])
        .limit(k)
    )
