"""Exact distributed quantiles vs a numpy full-sort oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions import quantiles as qmod
from ugfraud_ray.functions.quantiles import exact_quantiles

QS = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]


def _oracle(vals: np.ndarray, qs: list[float]) -> list[tuple[float, float]]:
    arr = np.sort(vals.astype(np.float64))
    return [(q, float(arr[int(np.floor((arr.size - 1) * q))])) for q in qs]


def _ds(vals: np.ndarray, blocks: int = 7) -> "ray.data.Dataset":
    return ray.data.from_arrow(pa.table({"x": pa.array(vals)})).repartition(blocks)


def test_exact_quantiles_continuous(ray_session):
    rng = np.random.default_rng(17)
    vals = rng.lognormal(3.0, 2.0, 20_000)
    got = exact_quantiles(_ds(vals), "x", QS)
    assert got == _oracle(vals, QS)


def test_exact_quantiles_heavy_duplication(ray_session, monkeypatch):
    # one value owns >90% of rows -> its bin exceeds the refine cap and
    # forces the recursive heavy-bin path
    monkeypatch.setattr(qmod, "_REFINE_CAP", 500)
    rng = np.random.default_rng(23)
    vals = np.concatenate([np.full(9_000, 42.5), rng.uniform(0, 100, 1_000)])
    rng.shuffle(vals)
    got = exact_quantiles(_ds(vals), "x", QS)
    assert got == _oracle(vals, QS)


def test_exact_quantiles_all_equal_and_empty(ray_session):
    vals = np.full(1_000, 7.25)
    got = exact_quantiles(_ds(vals), "x", [0.1, 0.9])
    assert got == [(0.1, 7.25), (0.9, 7.25)]
    empty = ray.data.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    got = exact_quantiles(empty, "x", [0.5])
    assert len(got) == 1 and np.isnan(got[0][1])


def _grouped_oracle(keys, vals, qs):
    out = set()
    for k in np.unique(keys):
        seg = np.sort(vals[keys == k].astype(np.float64))
        for q in qs:
            out.add((str(k), q, float(seg[int(np.floor((seg.size - 1) * q))])))
    return out


def _grouped_rows(t):
    return set(zip((str(k) for k in t.column(0).to_pylist()),
                   t["q"].to_pylist(), t["value"].to_pylist()))


def test_grouped_exact_quantiles(ray_session):
    from ugfraud_ray.functions.quantiles import grouped_exact_quantiles

    rng = np.random.default_rng(41)
    keys = rng.choice(np.array(["a", "b", "c", "d"]), 12_000)
    vals = np.round(rng.gamma(2.0, 50.0, 12_000), 2)  # ties
    qs = [0.0, 0.5, 0.9, 1.0]
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys), "x": pa.array(vals)})
    ).repartition(9)
    got = grouped_exact_quantiles(ds, "k", "x", qs)
    assert _grouped_rows(got) == _grouped_oracle(keys, vals, qs)
    # local fast path agrees
    local = grouped_exact_quantiles(ds, "k", "x", qs, approx_rows=12_000)
    assert _grouped_rows(local) == _grouped_oracle(keys, vals, qs)


def test_grouped_exact_quantiles_heavy_cell(ray_session, monkeypatch):
    from ugfraud_ray.functions.quantiles import grouped_exact_quantiles

    monkeypatch.setattr(qmod, "_REFINE_CAP", 300)
    rng = np.random.default_rng(43)
    keys = np.array(["hot"] * 8_000 + ["cold"] * 2_000)
    vals = np.concatenate([np.full(7_000, 5.5), rng.uniform(0, 10, 3_000)])
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys), "x": pa.array(vals)})
    ).repartition(5)
    qs = [0.25, 0.75]
    got = grouped_exact_quantiles(ds, "k", "x", qs)
    assert _grouped_rows(got) == _grouped_oracle(keys, vals, qs)


def test_exact_quantiles_local_fast_path_agrees(ray_session):
    rng = np.random.default_rng(31)
    vals = np.round(rng.normal(0, 10, 5_000), 1)  # ties across bins
    ds = _ds(vals)
    assert exact_quantiles(ds, "x", QS, approx_rows=5_000) == _oracle(vals, QS)
    assert exact_quantiles(ds, "x", QS) == _oracle(vals, QS)
