"""Behavioral priors + the Prior detector.

The reference ships precomputed priors in a pickle
(/root/reference/UGFraud/Demo/demo_pre.py:41-42) — three dicts
[user_priors, review_priors, prod_priors]. Here priors are *derived*
deterministically from the review-edge table (so every scale has them),
with a shape chosen to be SQL-expressible for the oracle gate:

- user  prior = (#negative reviews by user) / (#reviews by user)
- prod  prior = (#negative reviews on prod) / (#reviews on prod)
- review prior = 0.9 if rating is negative (2) else 0.1

The Prior "detector" (/root/reference/UGFraud/Demo/eval_Prior.py:10-15)
is just scale_value over the review priors; distributed intended-mode
here, bug-for-bug reference mode available via
stages.normalize.scale_value_reference on the collected dict.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ugfraud_ray.stages.normalize import scale_value_ds


def _neg_frac(edges: "ray.data.Dataset", key: str) -> "ray.data.Dataset":
    def add_neg(t: pa.Table) -> pa.Table:
        neg = pc.cast(pc.equal(pc.cast(t["rating"], pa.int64()), 2), pa.int64())
        return pa.table({key: t[key], "neg": neg})

    g = (
        edges.map_batches(add_neg, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Count(alias_name="n"), Sum("neg", alias_name="n_neg"))
    )

    def frac(t: pa.Table) -> pa.Table:
        f = t["n_neg"].to_numpy(zero_copy_only=False) / t["n"].to_numpy(zero_copy_only=False)
        return pa.table({"vid": t[key], "prior": pa.array(f, pa.float64())})

    return g.map_batches(frac, batch_format="pyarrow")


def user_priors(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """(vid, prior) for users (src side)."""
    return _neg_frac(edges, "src")


def prod_priors(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """(vid, prior) for products (dst side)."""
    return _neg_frac(edges, "dst")


def review_priors(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """edges + prior column (0.9 neg / 0.1 pos)."""

    def f(t: pa.Table) -> pa.Table:
        p = pc.if_else(
            pc.equal(pc.cast(t["rating"], pa.int64()), 2),
            pa.scalar(0.9, pa.float64()),
            pa.scalar(0.1, pa.float64()),
        )
        return t.append_column("prior", p)

    return edges.map_batches(f, batch_format="pyarrow")


def prior_review_scores(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Prior detector: scale_value(review priors) -> (src, dst, score)."""
    rp = review_priors(edges)
    return scale_value_ds(rp, "prior", out_col="score").select_columns(["src", "dst", "score"])


def vertex_priors(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Union of user+prod priors as one (vid, prior, kind) table.

    kind 1 = user (src side), 0 = prod (dst side), reference layout
    (products first / users second, GANG.py:150-155).
    """
    u = user_priors(edges).map_batches(
        lambda t: t.append_column("kind", pa.array(np.ones(t.num_rows, np.int8))),
        batch_format="pyarrow",
    )
    p = prod_priors(edges).map_batches(
        lambda t: t.append_column("kind", pa.array(np.zeros(t.num_rows, np.int8))),
        batch_format="pyarrow",
    )
    return u.union(p)
