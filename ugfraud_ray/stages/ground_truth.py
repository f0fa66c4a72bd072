"""M9 — ground-truth labels (create_ground_truth, helper.py:11-36).

Review label: 1 iff raw label == -1. User label: 1 iff ANY of the
user's reviews is spam — a grouped boolean-or, i.e. ``groupby(src).max``
(A2 in SURVEY §2.5). Fully distributed, no driver dicts.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Max


def review_ground_truth(edges: "ray.data.Dataset", label_col: str = "raw_label") -> "ray.data.Dataset":
    """edges(src, dst, raw_label∈{-1,1}) -> (src, dst, label∈{0,1})."""

    def remap(t: pa.Table) -> pa.Table:
        lab = pc.if_else(pc.equal(t[label_col], -1), pa.scalar(1, pa.int8()), pa.scalar(0, pa.int8()))
        return pa.table({"src": t["src"], "dst": t["dst"], "label": lab})

    return edges.map_batches(remap, batch_format="pyarrow")


def user_ground_truth(review_labels: "ray.data.Dataset") -> "ray.data.Dataset":
    """(src, dst, label) -> (vid, label) where label = any review spam."""
    return (
        review_labels.groupby("src")
        .aggregate(Max("label", alias_name="label"))
        .rename_columns({"src": "vid"})
    )
