"""Raw-file sources matching the reference's on-disk input formats.

A reference user feeds ``read_graph_data(metadata.gz)`` (gzipped
whitespace lines ``user_id prod_id rating label date``,
/root/reference/UGFraud/Utils/helper.py:123-202) or
``Fraudar.readData`` (whitespace ``user prod`` edge list,
Detector/Fraudar.py:24-32). These readers ingest the same files as
streaming Ray Datasets: ``ray.data.read_text`` (gzip decoded by Arrow,
one block per file shard) followed by ONE vectorized Arrow split/parse
per batch — no Python loop over lines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _open_args(path: str) -> dict:
    if str(path).endswith(".gz"):
        return {"arrow_open_stream_args": {"compression": "gzip"}}
    return {}


def read_metadata(path: str, binned: bool = True) -> "ray.data.Dataset":
    """(user_id, prod_id, rating, label, date[, rating_12]) from a
    metadata text/gzip file.

    rating 'None' becomes null (helper.py:146-149). ``binned`` adds the
    adj-mode 1/2 rating: ``int(rating) <= 3 -> 2 else 1``
    (helper.py:193-196 — note the TRUNCATION: 3.5 bins to 2), nulls
    stay null.
    """
    ds = ray.data.read_text(path, **_open_args(path))

    def parse(t: pa.Table) -> pa.Table:
        lines = t["text"]
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        parts = pc.split_pattern_regex(pc.utf8_trim_whitespace(lines), r"\s+")
        u = pc.list_element(parts, 0)
        p = pc.list_element(parts, 1)
        r_raw = pc.list_element(parts, 2)
        label = pc.cast(pc.list_element(parts, 3), pa.int64())
        date = pc.list_element(parts, 4)
        is_none = pc.equal(r_raw, "None")
        rating = pc.cast(
            pc.if_else(is_none, pa.nulls(len(t), pa.string()), r_raw), pa.float64()
        )
        cols = {
            "user_id": u,
            "prod_id": p,
            "rating": rating,
            "label": label,
            "date": date,
        }
        if binned:
            trunc = pc.trunc(rating)
            cols["rating_12"] = pc.if_else(
                pc.less_equal(trunc, 3.0),
                pa.array(np.full(len(t), 2), pa.int64()),
                pa.array(np.full(len(t), 1), pa.int64()),
            )
        return pa.table(cols)

    return ds.map_batches(parse, batch_format="pyarrow")


def read_edge_list(path: str) -> "ray.data.Dataset":
    """(src, dst) int64 edges from a whitespace edge-list file
    (Fraudar.readData, Detector/Fraudar.py:24-32)."""
    ds = ray.data.read_text(path, **_open_args(path))

    def parse(t: pa.Table) -> pa.Table:
        lines = t["text"]
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        parts = pc.split_pattern_regex(pc.utf8_trim_whitespace(lines), r"\s+")
        return pa.table(
            {
                "src": pc.cast(pc.list_element(parts, 0), pa.int64()),
                "dst": pc.cast(pc.list_element(parts, 1), pa.int64()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")
