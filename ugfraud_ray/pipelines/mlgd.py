"""Distributed full-batch logistic regression by exact gradient descent.

The scalable-ML primitive a curation stack trains its quality/language
gates with (the fastText/CCNet classifier shape, Joulin et al. 2016 /
Wenzek et al. 2020): one streaming pass per GD iteration computing the
full-batch gradient as per-block partials, weights broadcast each pass.

Determinism contract (what makes this SQL-replayable, unusual for
trained models): every per-row gradient contribution quantizes to a
fixed integer grid BEFORE summation — floor((sigma(x.w) - y) * x_j *
grid + 0.5) — so the gradient is an order-free integer total (per-block
int64 partials merged as Python ints on the driver; the SQL side is one
SUM over the identical expression). The weight update then runs on
identical doubles both sides: w_j - lr * (float(G_j)/grid) / n. The dot
product accumulates STRICTLY left-to-right over the feature list
(matching the SQL's left-associative + chain), sigma is the literal
1/(1+exp(-z)) both sides.

Reference analog: the SVD+classifier head (SURVEY §2.3 T5,
/root/reference SVD.py:90-138) trains sklearn on dense factors; this is
the from-scratch distributed trainer with an exactness story instead of
a library call.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table

_GRID = 1e9


def minmax_normalize(
    ds: "ray.data.Dataset", cols: list[str]
) -> tuple["ray.data.Dataset", dict]:
    """Per-column (v - min)/(max - min) in one extra aggregate pass;
    constant columns map to 0.0. Integer inputs make the diffs exact, so
    the single division is the identical IEEE op on the SQL side."""
    from ray.data.aggregate import Max, Min

    aggs = []
    for c in cols:
        aggs.append(Min(c, alias_name=f"_min_{c}"))
        aggs.append(Max(c, alias_name=f"_max_{c}"))
    st = ds.aggregate(*aggs)
    bounds = {c: (float(st[f"_min_{c}"]), float(st[f"_max_{c}"])) for c in cols}
    b_ref = ray.put(bounds)

    def f(t: pa.Table) -> pa.Table:
        b = ray.get(b_ref)
        out = {n: t[n] for n in t.column_names}
        for c in cols:
            lo, hi = b[c]
            v = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            x = (v - lo) / (hi - lo) if hi > lo else np.zeros(len(v))
            out[c] = pa.array(x)
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow"), bounds


def logistic_regression_gd(
    feats: "ray.data.Dataset",
    feature_cols: list[str],
    label_col: str = "y",
    iters: int = 5,
    lr: float = 1.0,
    approx_rows: int | None = None,
) -> pa.Table:
    """(feature, weight) after ``iters`` full-batch GD steps from zero
    weights (plus a 'bias' row); weights on the pinned 1e-9 grid.

    Features are assumed normalized to O(1) (see minmax_normalize), so
    each row's grid contribution is <= _GRID and totals stay well below
    2^53 — float(G) is then exact on both sides.
    """
    feats = feats.materialize()
    n = approx_rows if approx_rows is not None else feats.count()
    if n == 0:
        raise ValueError("logistic_regression_gd: empty input")
    d = len(feature_cols)
    w = np.zeros(d + 1, dtype=np.float64)  # [w_1..w_d, bias]

    for _ in range(iters):
        w_ref = ray.put(w.copy())

        def grad_partial(t: pa.Table, _wref=w_ref) -> pa.Table:
            ww = ray.get(_wref)
            z = np.zeros(t.num_rows, dtype=np.float64)
            xs = []
            for j, c in enumerate(feature_cols):
                x = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
                xs.append(x)
                z = z + x * ww[j]  # strict left-to-right, == SQL + chain
            z = z + ww[d]
            p = 1.0 / (1.0 + np.exp(-z))
            e = p - t[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table(
                {
                    **{
                        f"g{j}": pa.array(
                            [int(np.floor(e * xs[j] * _GRID + 0.5).astype(np.int64).sum())],
                            pa.int64(),
                        )
                        for j in range(d)
                    },
                    "gb": pa.array(
                        [int(np.floor(e * _GRID + 0.5).astype(np.int64).sum())],
                        pa.int64(),
                    ),
                }
            )

        pt = collect_table(feats.map_batches(grad_partial, batch_format="pyarrow"))
        G = [int(sum(int(v) for v in pt[f"g{j}"].to_pylist())) for j in range(d)]
        Gb = int(sum(int(v) for v in pt["gb"].to_pylist()))
        if max(abs(g) for g in G + [Gb]) >= (1 << 53):
            raise ValueError("logistic_regression_gd: gradient grid overflow")
        for j in range(d):
            w[j] = w[j] - lr * (float(G[j]) / _GRID) / n
        w[d] = w[d] - lr * (float(Gb) / _GRID) / n

    names = list(feature_cols) + ["bias"]
    return pa.table(
        {
            "feature": pa.array(names, pa.string()),
            "weight": pa.array(np.floor(w * 1e9 + 0.5) / 1e9),
        }
    )
