"""Snapshot diff: classify rows between two table versions by key.

The data-versioning readout (CDC / lakehouse table-diff shape) that
pairs with the incremental-dedup and partition-compaction utilities:
given snapshots A and B keyed by ``id_col``, report per-status counts —
``added`` (key only in B), ``removed`` (only in A), ``changed`` (key in
both, content hash differs), ``same``.

Content identity is md5-low64 of the content column (the engine's
collision-stable convention == DuckDB md5_number_upper). Scale shape:
each side collapses to (id, h) int rows inside its own blocks (content
never shuffles), the union rides ONE id-hash coarse-bucket shuffle, and
the per-bucket kernel classifies with a lexsort — output is 4 rows.

Reference analog: none (the reference's add_new_data appends blindly,
SURVEY §2.3 T2; this is the audited version of that step).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.bucketing import bucket_by_int_col, n_coarse_buckets

_STATUSES = ("added", "removed", "changed", "same")


def snapshot_diff(
    a: "ray.data.Dataset",
    b: "ray.data.Dataset",
    id_col: str = "doc_id",
    key: str = "text",
    approx_rows: int | None = None,
) -> "ray.data.Dataset":
    """(status, n) — see module docstring."""
    from ray.data.aggregate import Sum

    from ugfraud_ray.pipelines.sketches import _md5_low64

    def hashes(side: int):
        def f(t: pa.Table) -> pa.Table:
            h = _md5_low64(t[key].to_pylist()).view(np.int64)
            return pa.table(
                {
                    id_col: t[id_col],
                    "h": pa.array(h),
                    "side": pa.array(np.full(t.num_rows, side, dtype=np.int64)),
                }
            )

        return f

    union = a.select_columns([id_col, key]).map_batches(
        hashes(0), batch_format="pyarrow"
    ).union(
        b.select_columns([id_col, key]).map_batches(hashes(1), batch_format="pyarrow")
    )
    bucketize = bucket_by_int_col(id_col, n_coarse_buckets(approx_rows))

    def classify(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = g["h"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, ids))
        ids, h, side = ids[order], h[order], side[order]
        starts = np.flatnonzero(np.concatenate([[True], ids[1:] != ids[:-1]]))
        counts = np.diff(np.append(starts, len(ids)))
        if counts.max(initial=0) > 2:
            raise ValueError("snapshot_diff: duplicate key within a snapshot")
        n = np.zeros(4, dtype=np.int64)  # added, removed, changed, same
        solo = counts == 1
        solo_side = side[starts[solo]]
        n[0] = int((solo_side == 1).sum())
        n[1] = int((solo_side == 0).sum())
        both = starts[counts == 2]
        if len(both):
            if not ((side[both] == 0) & (side[both + 1] == 1)).all():
                raise ValueError("snapshot_diff: duplicate key within a snapshot")
            same = h[both] == h[both + 1]
            n[3] = int(same.sum())
            n[2] = int((~same).sum())
        return pa.table(
            {
                "status": pa.array(list(_STATUSES), pa.string()),
                "n": pa.array(n),
            }
        )

    return (
        union.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(classify, batch_format="pyarrow")
        .groupby("status")
        .aggregate(Sum("n", alias_name="n"))
    )
