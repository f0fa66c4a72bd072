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
