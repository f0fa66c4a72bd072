"""LM training-sequence packing via a distributed ordered prefix scan.

The last step of every LM data pipeline: lay documents out into
fixed-token-budget training sequences. Packing rule (prefix-sum
expressible, so exactly SQL-replayable): documents are laid out in
doc_id order; a document starts at global token offset
``cum_before = Σ n_tokens(preceding docs)`` and belongs to sequence
``cum_before // budget`` at offset ``cum_before % budget``.

The primitive underneath is the classic two-level parallel SCAN —
the global-order generalization of `events.running_total` (which is
per-user). doc_ids bucket into contiguous ranges (``doc_id //
range_size``): each range computes its local ordered cumsum and its
total in parallel (ONE coarse groupby); the per-range totals (tiny —
one row per range) prefix-sum on the driver; a broadcast of range
offsets turns local cumsums into global ones in a final streaming
pass. No stage ever holds more than a range locally, and the driver
holds one int per range.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table


def pack_sequences(
    docs: "ray.data.Dataset",
    budget: int = 512,
    range_size: int = 4096,
    key: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """(doc_id, n_tokens, seq_id, seq_offset) — whitespace-token counts,
    doc_id-ordered packing into `budget`-token sequences."""

    def counts(t: pa.Table) -> pa.Table:
        n = np.array([len(s.split()) for s in t[key].to_pylist()], dtype=np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids),
                "n_tokens": pa.array(n),
                "_rb": pa.array(ids // range_size),
            }
        )

    cnt = docs.select_columns([id_col, key]).map_batches(
        counts, batch_format="pyarrow"
    ).materialize()

    def local_scan(g) -> pa.Table:
        ids = g[id_col].to_numpy().astype(np.int64)
        n = g["n_tokens"].to_numpy().astype(np.int64)
        # stable: duplicate doc_ids keep a deterministic relative order,
        # making seq_id/seq_offset reproducible (and SQL-replayable)
        order = np.argsort(ids, kind="stable")
        ids, n = ids[order], n[order]
        before = np.concatenate([[0], np.cumsum(n)[:-1]])
        rb = int(g["_rb"][0].as_py())
        return pa.table(
            {
                id_col: pa.array(ids),
                "n_tokens": pa.array(n),
                "_rb": pa.array(np.full(len(ids), rb, dtype=np.int64)),
                "_local_before": pa.array(before),
                "_range_total": pa.array(np.full(len(ids), int(n.sum()), dtype=np.int64)),
            }
        )

    scanned = cnt.groupby("_rb").map_groups(local_scan, batch_format="pyarrow").materialize()

    # per-range totals: one row per range — driver prefix sum
    totals = collect_table(
        scanned.map_batches(
            lambda t: pa.table(
                {
                    "_rb": t["_rb"],
                    "_range_total": t["_range_total"],
                }
            ).group_by("_rb").aggregate([("_range_total", "max")]),
            batch_format="pyarrow",
        )
    ).to_pandas().groupby("_rb")["_range_total_max"].max().sort_index()
    rbs = totals.index.to_numpy().astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(totals.to_numpy())[:-1]]).astype(np.int64)
    off_of = np.zeros(int(rbs.max()) + 1 if len(rbs) else 1, dtype=np.int64)
    off_of[rbs] = offs
    off_ref = ray.put(off_of)

    def finalize(t: pa.Table) -> pa.Table:
        om = ray.get(off_ref)
        rb = t["_rb"].to_numpy(zero_copy_only=False)
        before = om[rb] + t["_local_before"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": t["n_tokens"],
                "seq_id": pa.array(before // budget),
                "seq_offset": pa.array(before % budget),
            }
        )

    return scanned.map_batches(finalize, batch_format="pyarrow")
