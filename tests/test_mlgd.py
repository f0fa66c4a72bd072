"""Distributed logistic-regression GD vs a naive numpy mirror."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _naive_gd(X: np.ndarray, y: np.ndarray, iters: int, lr: float, grid=1e9):
    n, d = X.shape
    w = np.zeros(d + 1)
    for _ in range(iters):
        z = np.zeros(n)
        for j in range(d):
            z = z + X[:, j] * w[j]
        z = z + w[d]
        p = 1.0 / (1.0 + np.exp(-z))
        e = p - y
        for j in range(d):
            G = int(np.floor(e * X[:, j] * grid + 0.5).astype(np.int64).sum())
            w[j] = w[j] - lr * (float(G) / grid) / n
        Gb = int(np.floor(e * grid + 0.5).astype(np.int64).sum())
        w[d] = w[d] - lr * (float(Gb) / grid) / n
    return np.floor(w * 1e9 + 0.5) / 1e9


def test_logreg_gd_matches_naive_and_learns(ray_session):
    from ugfraud_ray.pipelines.mlgd import logistic_regression_gd, minmax_normalize

    rng = np.random.default_rng(17)
    n = 600
    raw = rng.integers(0, 1000, size=(n, 3)).astype(np.int64)
    # separable-ish label: depends on feature 0
    y = (raw[:, 0] > 500).astype(np.float64)
    t = pa.table(
        {
            "a": pa.array(raw[:, 0]),
            "b": pa.array(raw[:, 1]),
            "c": pa.array(raw[:, 2]),
            "y": pa.array(y),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    feats, bounds = minmax_normalize(ds, ["a", "b", "c"])
    got = logistic_regression_gd(feats, ["a", "b", "c"], "y", iters=6, lr=2.0)

    X = np.empty((n, 3))
    for j, c in enumerate(["a", "b", "c"]):
        lo, hi = bounds[c]
        X[:, j] = (raw[:, j].astype(np.float64) - lo) / (hi - lo)
    want = _naive_gd(X, y, iters=6, lr=2.0)
    np.testing.assert_array_equal(got["weight"].to_numpy(), want)
    assert got["feature"].to_pylist() == ["a", "b", "c", "bias"]
    # the informative feature got the dominant positive weight
    w = dict(zip(got["feature"].to_pylist(), got["weight"].to_pylist()))
    assert w["a"] > 0.5 and abs(w["b"]) < w["a"] and abs(w["c"]) < w["a"]
