"""Bucket-count independence of the coarse-bucket shuffle kernels.

VERDICT r1 finding 1: the one-shuffle kernels used a FIXED 64 buckets
(64-task parallelism ceiling, ~input/64 per task at scale). The fix
sizes buckets to max(64, 2×cluster CPUs, rows/rows_per_bucket). These
tests prove the invariant the fix relies on: results are identical for
ANY bucket count — including counts well above 64 — because every
kernel only needs all rows of one key co-bucketed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from ugfraud_ray.functions.bucketing import n_coarse_buckets


def test_n_coarse_buckets_sizing():
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    floor_expected = max(64, 2 * ncpu)
    assert n_coarse_buckets() == floor_expected
    assert n_coarse_buckets(10) == floor_expected
    # data-proportional term: 10^9 rows at 2M rows/bucket -> 500 buckets
    assert n_coarse_buckets(1_000_000_000) == max(floor_expected, 500)
    # cap
    assert n_coarse_buckets(10**15) == 1 << 18


def _rand_pairs(n=5000, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "src": pa.array(rng.integers(0, 200, n)),
            "dst": pa.array(rng.integers(0, 200, n)),
            "w": pa.array(rng.integers(0, 100, n)),
        }
    )


@pytest.mark.parametrize("nb", [3, 64, 257])
def test_dedup_pairs_bucket_independence(nb):
    from ugfraud_ray.stages.graph_build import dedup_pairs

    t = _rand_pairs()
    ds = ray.data.from_arrow(t).repartition(5)
    got = (
        dedup_pairs(ds, a="src", b="dst", extra={"w": "min"}, n_buckets=nb)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    exp = (
        t.to_pandas()
        .groupby(["src", "dst"], as_index=False)["w"]
        .min()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["src", "dst", "w"]], exp)


@pytest.mark.parametrize("nb", [5, 193])
def test_pair_emit_bucket_independence(nb):
    from ugfraud_ray.pipelines.dedup import _bucketed_pair_emit

    rng = np.random.default_rng(11)
    t = pa.table(
        {
            "key": pa.array(rng.integers(0, 40, 900)),
            "doc_id": pa.array(np.arange(900, dtype=np.int64)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    got = (
        _bucketed_pair_emit(ds, ["key"], "doc_id", n_buckets=nb)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    exp_rows = []
    for _, grp in df.groupby("key"):
        ids = np.sort(grp["doc_id"].to_numpy())
        i, j = np.triu_indices(len(ids), k=1)
        exp_rows.append(pd.DataFrame({"id_a": ids[i], "id_b": ids[j]}))
    exp = (
        pd.concat(exp_rows, ignore_index=True)
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_sessionize_many_buckets(monkeypatch):
    """Force the dynamic bucket count above 64 and check the distributed
    sessionize matches the driver-local kernel bit-for-bit."""
    import ugfraud_ray.pipelines.events as ev

    rng = np.random.default_rng(7)
    n = 4000
    base = np.datetime64("2024-01-01T00:00:00", "us")
    t = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 300, n)),
            "ts": pa.array(
                base + rng.integers(0, 10**10, n).astype("timedelta64[us]")
            ),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "value": pa.array(np.round(rng.random(n), 6)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    local = ev.sessionize(ds, gap_minutes=30).to_pandas()
    monkeypatch.setattr(ev, "n_coarse_buckets", lambda *a, **k: 311)
    dist = ev.sessionize(ds, gap_minutes=30, local_threshold=0).to_pandas()
    key = ["user_id", "session_id"]
    pd.testing.assert_frame_equal(
        local.sort_values(key).reset_index(drop=True),
        dist.sort_values(key).reset_index(drop=True),
    )
