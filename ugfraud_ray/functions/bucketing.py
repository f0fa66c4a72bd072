"""Cluster/data-proportional coarse-bucket sizing for the one-shuffle
dedup / sessionize / wedge-close kernels.

Every "hash key into coarse buckets → ONE groupby shuffle → vectorized
per-bucket kernel" stage previously used a FIXED 64 buckets. That is a
64-task parallelism ceiling and, worse, a per-task memory bomb: at 100 TB
each bucket is ~1/64 of the whole input materialized as one group in one
task. These helpers size the bucket count to max(64, 2×cluster CPUs,
rows/rows_per_bucket):

- the 2×CPU term keeps every core busy on any cluster size (on the
  32-cpu test box this is exactly the old 64, so local behavior —
  timings AND results — is unchanged);
- the rows term bounds per-bucket size so one group always fits a
  worker's heap (default ≈2M rows/bucket ⇒ a few hundred MB worst case);
- correctness is bucket-count-independent by construction: every kernel
  only requires that all rows of one key (pair / user / shingle) land in
  the same bucket, which any modulus preserves.

The cap exists only to bound the groupby's key cardinality; 2^18 buckets
× 2M rows covers ~5×10^11 rows per stage before buckets grow past the
target size, and the sort-based groupby handles 2^18 keys fine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)


def n_coarse_buckets(
    approx_rows: int | None = None,
    rows_per_bucket: int = 2_000_000,
    floor_: int = 64,
    cap: int = 1 << 18,
) -> int:
    """Coarse-bucket count: max(floor, 2×cluster CPUs, rows/rows_per_bucket),
    capped. approx_rows may be any upper bound on the stage's input rows
    (exact counts, pre-dedup counts and band-expanded counts all work —
    overestimating only makes buckets smaller)."""
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n = max(int(floor_), 2 * ncpu)
    if approx_rows is not None and approx_rows > 0:
        n = max(n, -(-int(approx_rows) // int(rows_per_bucket)))
    return min(int(cap), n)


def int_hash_bucket(v: np.ndarray, n_buckets: int) -> np.ndarray:
    """splitmix-style bucket of an int array (any int dtype) -> int64
    bucket ids in [0, n_buckets)."""
    h = v.astype(np.uint64) * _MIX1
    h ^= h >> np.uint64(29)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def pair_hash_bucket(a: np.ndarray, b: np.ndarray, n_buckets: int) -> np.ndarray:
    """Bucket of an int pair-key (order-sensitive)."""
    h = a.astype(np.uint64) * _MIX1 ^ b.astype(np.uint64) * _MIX2
    h ^= h >> np.uint64(29)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def bucket_by_int_col(col: str, n_buckets: int, out: str = "_cb"):
    """map_batches(batch_format="pyarrow") fn appending a hash-bucket
    column derived from one integer column."""
    def bucketize(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        return t.append_column(out, pa.array(int_hash_bucket(v, n_buckets)))

    return bucketize


def _hash_string_chunk(arr: pa.Array) -> np.ndarray:
    """uint64 hashes for ONE non-chunked Arrow string array — zero-copy
    over the offset/data buffers (see hash_string_column)."""
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    off = (
        np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
        .astype(np.int64)
    )
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.zeros(0, np.uint8)
    )
    starts, ends = off[:-1], off[1:]
    lens = (ends - starts).astype(np.uint64)
    pos = np.arange(8, dtype=np.int64)
    w = np.uint64(1) << (np.arange(8, dtype=np.uint64) * np.uint64(8))
    if len(data):
        fi = starts[:, None] + pos
        first = np.where(fi < ends[:, None], data[np.clip(fi, 0, len(data) - 1)], 0)
        li = ends[:, None] - 8 + pos
        last = np.where(li >= starts[:, None], data[np.clip(li, 0, len(data) - 1)], 0)
        h = (first.astype(np.uint64) * w).sum(axis=1, dtype=np.uint64)
        h ^= (last.astype(np.uint64) * w).sum(axis=1, dtype=np.uint64) * _MIX1
    else:
        h = np.zeros(len(lens), dtype=np.uint64)
    h ^= lens * _MIX2
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    if arr.null_count:
        valid = np.asarray(arr.is_valid())
        h = np.where(valid, h, np.uint64(0))
    return h


def hash_string_column(col) -> np.ndarray:
    """Vectorized 64-bit BUCKETING hash of an Arrow string column (r5 —
    retires the last pandas-batch sites): packs the first 8 and last 8
    UTF-8 bytes plus the byte length and splitmix-mixes, computed
    zero-copy over the Arrow offset/data buffers — no pandas object
    conversion. Bucketing-only by contract: collisions merely skew
    bucket sizes (an exact groupby always follows downstream), and
    URL-/token-shaped keys carry their entropy in the tail bytes this
    hash reads in full."""
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 0:
            return np.zeros(0, dtype=np.uint64)
        return np.concatenate([_hash_string_chunk(c) for c in col.chunks])
    return _hash_string_chunk(col)
