"""Event-stream operator tests: windowing, sessionization, extraction."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _synth_events(n=2000, n_users=37, seed=23) -> pa.Table:
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = base + np.sort(rng.integers(0, 14 * 86400 * 1_000_000, size=n))
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(rng.integers(0, n_users, size=n)),
            "event_type": pa.array(
                np.array(["view", "click", "error"])[rng.integers(0, 3, size=n)], pa.string()
            ),
            "value": pa.array(np.round(rng.uniform(0, 50, size=n), 2)),
        }
    )


def test_windowed_counts_match_pandas(ray_session):
    from ugfraud_ray.pipelines.events import windowed_counts

    t = _synth_events()
    got = windowed_counts(ray.data.from_arrow(t)).to_pandas()

    df = t.to_pandas()
    df["ws"] = df["ts"].to_numpy().astype("datetime64[h]").astype("datetime64[us]").astype(np.int64)
    want = (
        df.groupby(["ws", "event_type"])
        .agg(n_events=("value", "size"), total_value=("value", "sum"))
        .reset_index()
    )
    got = got.sort_values(["window_start_us", "event_type"]).reset_index(drop=True)
    want = want.sort_values(["ws", "event_type"]).reset_index(drop=True)
    assert (got["window_start_us"].to_numpy() == want["ws"].to_numpy()).all()
    assert (got["n_events"].to_numpy() == want["n_events"].to_numpy()).all()
    assert np.allclose(got["total_value"], np.round(want["total_value"], 6))


def test_sessionize_local_and_bucketed_agree(ray_session):
    from ugfraud_ray.pipelines.events import sessionize

    t = _synth_events()
    ds = ray.data.from_arrow(t)
    local = sessionize(ds, gap_minutes=45).to_pandas()
    dist = sessionize(ds, gap_minutes=45, local_threshold=0).to_pandas()
    key = ["user_id", "session_id"]
    local = local.sort_values(key).reset_index(drop=True)
    dist = dist.sort_values(key).reset_index(drop=True)
    assert len(local) == len(dist)
    for c in local.columns:
        if local[c].dtype == np.float64:
            assert np.allclose(local[c], dist[c])
        else:
            assert (local[c].to_numpy() == dist[c].to_numpy()).all()
    # session invariants: gaps inside a session never exceed 45 min
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    gap_us = 45 * 60 * 1_000_000
    for uid, g in df.groupby("user_id"):
        tsv = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        n_sessions = 1 + int((np.diff(tsv) > gap_us).sum()) if len(tsv) else 0
        assert (local["user_id"] == uid).sum() == n_sessions


def test_extract_props(ray_session):
    from ugfraud_ray.pipelines.events import extract_props

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "props": pa.array(['{"k": 7}', '{"k": -3}', '{"j": 1, "k": 42}'], pa.string()),
        }
    )
    got = extract_props(ray.data.from_arrow(t)).to_pandas().sort_values("event_id")
    assert got["k"].tolist() == [7, -3, 42]


def test_asof_local_and_bucketed_agree(ray_session):
    from ugfraud_ray.pipelines.events import asof_last_event

    t = _synth_events(n=1500, n_users=29, seed=31)
    ds = ray.data.from_arrow(t)
    local = asof_last_event(ds, "error").to_pandas().sort_values("event_id").reset_index(drop=True)
    dist = (
        asof_last_event(ds, "error", local_threshold=0)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert (local == dist).all().all()
    # hand-check semantics: a matching event joins itself (inclusive)
    df = t.to_pandas()
    err_ids = set(df[df["event_type"] == "error"]["event_id"])
    self_rows = local[local["event_id"].isin(err_ids)]
    assert (self_rows["last_match_id"] == self_rows["event_id"]).all()


def test_asof_tiny_hand_case(ray_session):
    from ugfraud_ray.pipelines.events import asof_last_event

    base = np.datetime64("2024-01-01T00:00:00", "us")
    mins = lambda m: base + np.timedelta64(m * 60_000_000, "us")
    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "ts": pa.array([mins(0), mins(5), mins(10), mins(1), mins(20)]),
            "user_id": pa.array([7, 7, 7, 8, 8], pa.int64()),
            "event_type": pa.array(["error", "view", "error", "view", "error"], pa.string()),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
        }
    )
    got = asof_last_event(ray.data.from_arrow(t), "error").to_pandas().sort_values("event_id")
    assert got["last_match_id"].tolist() == [0, 0, 2, -1, 4]


def test_topk_per_user(ray_session):
    from ugfraud_ray.pipelines.events import topk_per_user

    t = _synth_events(n=1200, n_users=17, seed=41)
    ds = ray.data.from_arrow(t)
    local = topk_per_user(ds, k=3).to_pandas().sort_values(["user_id", "rnk"]).reset_index(drop=True)
    dist = (
        topk_per_user(ds, k=3, local_threshold=0)
        .to_pandas().sort_values(["user_id", "rnk"]).reset_index(drop=True)
    )
    assert (local == dist).all().all()
    df = t.to_pandas()
    for uid, g in df.groupby("user_id"):
        want = g.sort_values(["value", "event_id"], ascending=[False, True]).head(3)
        got = local[local["user_id"] == uid]
        assert got["event_id"].tolist() == want["event_id"].tolist()


def test_sliding_window_count(ray_session):
    from ugfraud_ray.pipelines.events import sliding_window_count

    t = _synth_events(n=900, n_users=11, seed=59)
    ds = ray.data.from_arrow(t)
    local = sliding_window_count(ds, 60).to_pandas().sort_values("event_id").reset_index(drop=True)
    dist = (
        sliding_window_count(ds, 60, local_threshold=0)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert (local == dist).all().all()
    # brute-force check
    df = t.to_pandas()
    ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    uid = df["user_id"].to_numpy()
    win = 60 * 60 * 1_000_000
    want = np.array(
        [((uid == uid[i]) & (ts >= ts[i] - win) & (ts <= ts[i])).sum() for i in range(len(df))]
    )
    got = local.set_index("event_id").loc[df["event_id"]]["n_in_window"].to_numpy()
    assert (got == want).all()


def test_events_ops_empty_input(ray_session):
    """Empty event tables must not crash any operator (driver robustness)."""
    from ugfraud_ray.pipelines.events import (
        asof_last_event,
        extract_props,
        sessionize,
        sliding_window_count,
        topk_per_user,
        windowed_counts,
    )

    t = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "value": pa.array([], pa.float64()),
            "props": pa.array([], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    assert windowed_counts(ds).count() == 0
    assert sessionize(ds).count() == 0
    assert asof_last_event(ds).count() == 0
    assert topk_per_user(ds).count() == 0
    assert sliding_window_count(ds).count() == 0
    assert extract_props(ds).count() == 0


def test_distinct_users_per_type_both_paths(ray_session):
    from ugfraud_ray.pipelines.events import distinct_users_per_type

    rng = np.random.default_rng(53)
    n = 6_000
    t = pa.table(
        {
            "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
            "user_id": pa.array(rng.integers(0, 400, n)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(7)
    et = t["event_type"].to_numpy(zero_copy_only=False)
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    want = {k: len(np.unique(uid[et == k])) for k in ["a", "b", "c"]}
    for hint in (n, None):
        got = {
            r["event_type"]: r["n_users"]
            for r in distinct_users_per_type(ds, approx_rows=hint).take_all()
        }
        assert got == want, hint


def test_interval_join_matches_numpy(ray_session):
    import pytest

    from ugfraud_ray.pipelines.events import interval_join

    rng = np.random.default_rng(61)
    n = 3_000
    base = np.datetime64("2026-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 72 * 3600, n).astype("timedelta64[s]").astype(
        "timedelta64[us]"
    )
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    hour = 3_600_000_000
    starts = (np.array([2, 10, 40]) * hour + base.astype(np.int64)).astype(np.int64)
    ends = starts + hour

    got = {
        (r["event_id"], r["window_start_us"])
        for r in interval_join(ds, starts, ends).take_all()
    }
    tus = ts.astype(np.int64)
    want = set()
    for s, e in zip(starts, ends):
        for i in np.flatnonzero((tus >= s) & (tus < e)):
            want.add((int(i), int(s)))
    assert got == want and len(want) > 0

    with pytest.raises(ValueError):
        interval_join(ds, np.array([0, hour // 2]), np.array([hour, 2 * hour]))

    empty = interval_join(ds, np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    assert empty.count() == 0


def test_running_total_matches_pandas(ray_session):
    from ugfraud_ray.pipelines.events import running_total

    t = _synth_events(n=3000, n_users=29, seed=7)
    got = (
        running_total(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    units = np.floor(df["value"].to_numpy() * 10_000.0 + 0.5).astype(np.int64)
    df["want"] = pd.Series(units, index=df.index).groupby(df["user_id"].to_numpy()).cumsum() / 10_000.0
    want = df.sort_values("event_id")["want"].to_numpy()
    assert np.array_equal(got["running_value"].to_numpy(), want)


def test_running_total_bucketed_matches_local(ray_session):
    from ugfraud_ray.pipelines import events as ev

    t = _synth_events(n=2500, n_users=17, seed=3)
    # negative values exercise the sign-safety of the segment bases
    tt = t.set_column(
        t.schema.get_field_index("value"),
        "value",
        pa.array(t["value"].to_numpy() - 25.0),
    )
    local = (
        ev.running_total(ray.data.from_arrow(tt))
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    dist = (
        ev.running_total(ray.data.from_arrow(tt).repartition(7), local_threshold=0)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert np.array_equal(local["running_value"].to_numpy(), dist["running_value"].to_numpy())


def test_zscore_matches_two_pass_numpy(ray_session):
    from ugfraud_ray.pipelines.events import zscore_per_type

    t = _synth_events(n=4000, n_users=31, seed=13)
    got = (
        zscore_per_type(ray.data.from_arrow(t).repartition(6))
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    df = t.to_pandas()
    q = np.floor(df["value"].to_numpy() * 10000.0 + 0.5).astype(np.int64)
    want = {}
    for ty, sub in df.assign(q=q).groupby("event_type"):
        n = len(sub)
        s, ss = int(sub["q"].sum()), int((sub["q"].astype(object) ** 2).sum())
        ssum, ssq = float(s) / 10000.0, float(ss) / 100000000.0
        mu = ssum / float(n)
        sd = np.sqrt((ssq - ssum * ssum / float(n)) / float(n - 1))
        z = np.floor((sub["q"].to_numpy().astype(np.float64) / 10000.0 - mu) / sd
                     * 1000000.0 + 0.5) / 1000000.0
        want.update(dict(zip(sub["event_id"], z)))
    w = np.array([want[e] for e in got["event_id"]])
    assert np.array_equal(got["z"].to_numpy(), w)
    # z-scores standardize: mean ~0, std ~1 per group
    j = got.merge(df[["event_id", "event_type"]], on="event_id")
    for _, sub in j.groupby("event_type"):
        assert abs(sub["z"].mean()) < 1e-6
        assert abs(sub["z"].std() - 1.0) < 1e-3


def test_top_type_per_user_matches_pandas(ray_session):
    from ugfraud_ray.pipelines.events import top_type_per_user

    t = _synth_events(n=5000, n_users=41, seed=19)
    ds = ray.data.from_arrow(t).repartition(6)
    local = top_type_per_user(ds, approx_rows=5000).to_pandas()
    bucketed = top_type_per_user(ds, approx_rows=None).to_pandas()
    df = t.to_pandas()
    counts = df.groupby(["user_id", "event_type"]).size().reset_index(name="n")
    counts = counts.sort_values(
        ["user_id", "n", "event_type"], ascending=[True, False, True]
    )
    want = counts.groupby("user_id").head(1).reset_index(drop=True)
    for got in (local, bucketed):
        g = got.sort_values("user_id").reset_index(drop=True)
        assert list(g["user_id"]) == list(want["user_id"])
        assert list(g["top_type"]) == list(want["event_type"])
        assert list(g["n"]) == list(want["n"])


def test_funnel_matches_pandas_oracle(ray_session):
    from ugfraud_ray.pipelines.events import funnel

    t = _synth_events(n=260, n_users=90, seed=31)
    steps = ["view", "click", "error"]
    got = (
        funnel(ray.data.from_arrow(t), steps=steps)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )

    df = t.to_pandas()
    want = {}
    for uid, g in df.groupby("user_id"):
        g = g.sort_values("ts")
        prev = None
        step = 0
        for s in steps:
            cand = g[(g["event_type"] == s)]
            if prev is not None:
                cand = cand[cand["ts"] > prev]
            if len(cand) == 0:
                break
            prev = cand["ts"].min()
            step += 1
        if step >= 1:
            want[int(uid)] = step
    assert got["user_id"].tolist() == sorted(want)
    assert got["funnel_step"].tolist() == [want[u] for u in sorted(want)]
    assert set(got["funnel_step"]) == {1, 2, 3}  # non-degenerate fixture


def test_funnel_local_and_bucketed_agree(ray_session):
    from ugfraud_ray.pipelines.events import funnel

    t = _synth_events(n=2500, n_users=41, seed=8)
    ds = ray.data.from_arrow(t)
    steps = ["view", "click", "error"]
    a = funnel(ds, steps=steps, local_threshold=1_000_000).to_pandas().sort_values("user_id")
    b = funnel(ds, steps=steps, local_threshold=0).to_pandas().sort_values("user_id")
    assert a["user_id"].tolist() == b["user_id"].tolist()
    assert a["funnel_step"].tolist() == b["funnel_step"].tolist()


def test_retention_matches_pandas_oracle(ray_session):
    from ugfraud_ray.pipelines.events import retention_cohorts

    t = _synth_events(n=2200, n_users=48, seed=44)
    got = (
        retention_cohorts(ray.data.from_arrow(t))
        .to_pandas().sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    )
    df = t.to_pandas()
    wk = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // (7 * 86400 * 1_000_000)
    df = df.assign(week=wk)
    first = df.groupby("user_id")["week"].min().rename("cohort")
    j = df.join(first, on="user_id")
    j["off"] = j["week"] - j["cohort"]
    want = (
        j.drop_duplicates(["user_id", "off"])
        .groupby(["cohort", "off"]).size().reset_index(name="n")
        .sort_values(["cohort", "off"]).reset_index(drop=True)
    )
    assert got["cohort_week"].tolist() == want["cohort"].tolist()
    assert got["week_offset"].tolist() == want["off"].tolist()
    assert got["n_users"].tolist() == want["n"].tolist()
    assert len(got) >= 3


def test_retention_local_and_bucketed_agree(ray_session):
    from ugfraud_ray.pipelines.events import retention_cohorts

    t = _synth_events(n=1800, n_users=33, seed=2)
    ds = ray.data.from_arrow(t)
    a = retention_cohorts(ds, local_threshold=1_000_000).to_pandas().sort_values(
        ["cohort_week", "week_offset"]).reset_index(drop=True)
    b = retention_cohorts(ds, local_threshold=0).to_pandas().sort_values(
        ["cohort_week", "week_offset"]).reset_index(drop=True)
    for c in ("cohort_week", "week_offset", "n_users"):
        assert a[c].tolist() == b[c].tolist(), c


def test_event_paths_matches_pandas(ray_session):
    from ugfraud_ray.pipelines.events import event_paths

    t = _synth_events(n=700, n_users=23, seed=13)
    got = event_paths(ray.data.from_arrow(t)).to_pandas().sort_values("user_id").reset_index(drop=True)
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    want = df.groupby("user_id")["event_type"].agg(">".join)
    assert got["user_id"].tolist() == list(want.index)
    assert got["path"].tolist() == list(want.values)
    assert got["n_events"].tolist() == df.groupby("user_id").size().tolist()


def test_event_paths_local_and_bucketed_agree(ray_session):
    from ugfraud_ray.pipelines.events import event_paths

    t = _synth_events(n=900, n_users=31, seed=77)
    ds = ray.data.from_arrow(t)
    a = event_paths(ds).to_pandas().sort_values("user_id").reset_index(drop=True)
    b = event_paths(ds, local_threshold=0).to_pandas().sort_values("user_id").reset_index(drop=True)
    assert (a == b).all().all()


def test_windowed_unique_users(ray_session):
    from ugfraud_ray.pipelines.events import windowed_unique_users

    t = _synth_events(n=1500, n_users=29, seed=91)
    got = (
        windowed_unique_users(ray.data.from_arrow(t))
        .to_pandas().sort_values("window_start_us").reset_index(drop=True)
    )
    df = t.to_pandas()
    ws = df["ts"].to_numpy().astype("datetime64[h]").astype("datetime64[us]").astype(np.int64)
    want = (
        df.assign(ws=ws).groupby("ws")["user_id"].nunique().reset_index()
        .sort_values("ws").reset_index(drop=True)
    )
    assert got["window_start_us"].tolist() == want["ws"].tolist()
    assert got["n_users"].tolist() == want["user_id"].tolist()


def test_interarrival_matches_pandas_and_bucketed_path(ray_session):
    from ugfraud_ray.pipelines.events import interarrival_stats

    t = _synth_events()
    ds = ray.data.from_arrow(t)
    local = interarrival_stats(ds).to_pandas().sort_values("user_id").reset_index(drop=True)
    dist = (
        interarrival_stats(ds, local_threshold=0)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert local.equals(dist)

    df = t.to_pandas()
    df["us"] = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    df = df.sort_values(["user_id", "us", "event_id"])
    df["gap"] = df.groupby("user_id")["us"].diff()
    g = df.dropna(subset=["gap"]).groupby("user_id")["gap"]
    want = g.agg(["count", "min", "max", "sum"]).astype(np.int64)
    assert (local["user_id"].to_numpy() == want.index.to_numpy()).all()
    assert (local["n_gaps"].to_numpy() == want["count"].to_numpy()).all()
    assert (local["min_gap_us"].to_numpy() == want["min"].to_numpy()).all()
    assert (local["max_gap_us"].to_numpy() == want["max"].to_numpy()).all()
    assert (local["sum_gap_us"].to_numpy() == want["sum"].to_numpy()).all()


def test_type_cooccurrence_matches_naive_and_bucketed(ray_session):
    from ugfraud_ray.pipelines.events import type_cooccurrence

    t = _synth_events(n=1500, n_users=19, seed=41)
    ds = ray.data.from_arrow(t).repartition(4)
    local = (
        type_cooccurrence(ds, gap_minutes=30)
        .to_pandas()
        .sort_values(["type_a", "type_b"])
        .reset_index(drop=True)
    )
    dist = (
        type_cooccurrence(ds, gap_minutes=30, local_threshold=0)
        .to_pandas()
        .sort_values(["type_a", "type_b"])
        .reset_index(drop=True)
    )
    assert local.equals(dist)

    # naive mirror: assign sessions per user with the sessionize rule,
    # then count sessions containing both types of each pair
    df = t.to_pandas()
    df["us"] = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    df = df.sort_values(["user_id", "us", "event_id"])
    gap = 30 * 60 * 1_000_000
    from collections import defaultdict

    sess_types = defaultdict(set)
    sid = 0
    prev = None
    for u, us, et in zip(df["user_id"], df["us"], df["event_type"]):
        if prev is None or u != prev[0] or us - prev[1] > gap:
            sid += 1
        sess_types[sid].add(et)
        prev = (u, us)
    want = defaultdict(int)
    for types in sess_types.values():
        ts_sorted = sorted(types)
        for i in range(len(ts_sorted)):
            for j in range(i + 1, len(ts_sorted)):
                want[(ts_sorted[i], ts_sorted[j])] += 1
    got = {(r.type_a, r.type_b): r.n_sessions for r in local.itertuples()}
    assert got == dict(want)


def test_type_transitions_matches_pandas(ray_session):
    from ugfraud_ray.pipelines.events import type_transitions

    t = _synth_events(n=1200, n_users=17, seed=77)
    ds = ray.data.from_arrow(t).repartition(4)
    local = (
        type_transitions(ds)
        .to_pandas().sort_values(["type_from", "type_to"]).reset_index(drop=True)
    )
    dist = (
        type_transitions(ds, local_threshold=0)
        .to_pandas().sort_values(["type_from", "type_to"]).reset_index(drop=True)
    )
    assert local.equals(dist)
    df = t.to_pandas()
    df["us"] = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    df = df.sort_values(["user_id", "us", "event_id"])
    df["nxt"] = df.groupby("user_id")["event_type"].shift(-1)
    want = (
        df.dropna(subset=["nxt"]).groupby(["event_type", "nxt"]).size().to_dict()
    )
    got = {(r.type_from, r.type_to): r.n for r in local.itertuples()}
    assert got == want


def test_late_events_planted(ray_session):
    from ugfraud_ray.pipelines.events import late_events

    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    h = 3_600_000_000
    # arrival order = event_id; event 2 arrives after an event 3h newer
    us = np.array([0, 3 * h, 1 * h, 4 * h, 3 * h - 1], dtype=np.int64) + base
    # lateness with delay=1h: e2 (1h < 3h-1h) LATE; e4 (3h-1 + 1h < 4h? 4h-1<4h) LATE
    types = ["a", "a", "b", "a", "b"]
    t = pa.table(
        {
            "event_id": pa.array(np.arange(5, dtype=np.int64)),
            "ts": pa.array(us.astype("datetime64[us]")),
            "event_type": pa.array(types, pa.string()),
        }
    )
    got = (
        late_events(ray.data.from_arrow(t).repartition(3), delay_us=h, n_buckets=4)
        .to_pandas().set_index("event_type")
    )
    assert got.loc["a", "n_events"] == 3 and got.loc["a", "n_late"] == 0
    assert got.loc["b", "n_events"] == 2 and got.loc["b", "n_late"] == 2


def test_burst_stats_matches_naive(ray_session):
    from ugfraud_ray.pipelines.events import burst_stats

    t = _synth_events(n=900, n_users=11, seed=3)
    ds = ray.data.from_arrow(t).repartition(3)
    W = 3_600_000_000
    local = burst_stats(ds, window_us=W).to_pandas().set_index("user_id").sort_index()
    dist = (
        burst_stats(ds, window_us=W, local_threshold=0)
        .to_pandas().set_index("user_id").sort_index()
    )
    assert local.equals(dist)
    df = t.to_pandas()
    df["us"] = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    for uid, g in df.groupby("user_id"):
        tv = np.sort(g["us"].to_numpy())
        burst = max(
            int(np.searchsorted(tv, x + W, side="right") - np.searchsorted(tv, x, side="left"))
            for x in tv
        )
        assert local.loc[uid, "n_events"] == len(tv)
        assert local.loc[uid, "max_burst"] == burst


def test_rolling_active_users_matches_pandas_and_bucketed_path(ray_session):
    from ugfraud_ray.pipelines.events import rolling_active_users

    t = _synth_events(n=1500, n_users=29, seed=41)
    ds = ray.data.from_arrow(t).repartition(5)
    day = (
        t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        // 86_400_000_000
    )
    df = pd.DataFrame({"user": t["user_id"].to_numpy(), "day": day})
    pairs = df.drop_duplicates()
    want = {}
    for d in sorted(pairs["day"].unique()):
        want[d] = pairs[(pairs["day"] >= d - 6) & (pairs["day"] <= d)]["user"].nunique()

    got = rolling_active_users(ds, window_days=7).to_pandas()
    assert dict(zip(got["day"].astype(int), got["n_users"].astype(int))) == want

    forced = rolling_active_users(ds, window_days=7, local_threshold=0).to_pandas()
    assert dict(zip(forced["day"].astype(int), forced["n_users"].astype(int))) == want


def test_winsorize_matches_naive_both_paths(ray_session):
    from ugfraud_ray.pipelines.events import winsorize_per_type

    t = _synth_events(n=900, seed=77)
    ds = ray.data.from_arrow(t).repartition(7)

    # naive mirror on the same 1e-4 grid with the pinned rank rule
    df = t.to_pandas()
    df["qq"] = np.floor(df["value"].to_numpy() * 1e4 + 0.5).astype(np.int64)
    want = {}
    for k, g in df.groupby("event_type"):
        v = np.sort(g["qq"].to_numpy())
        n = v.size
        cl = v[int(np.floor((n - 1) * 0.05))]
        ch = v[int(np.floor((n - 1) * 0.95))]
        for eid, qq in zip(g["event_id"], g["qq"]):
            want[int(eid)] = float(min(max(qq, cl), ch)) / 10000.0

    for forced_rows in (None, 10_000_000):  # local grouped-quantile path / distributed
        out = winsorize_per_type(ds, 0.05, 0.95, approx_rows=forced_rows).to_pandas()
        got = dict(zip(out["event_id"].astype(int), out["value_w"]))
        assert got == want

    # degenerate lo == hi: everything clips to the per-type median
    med = winsorize_per_type(ds, 0.5, 0.5).to_pandas()
    meds = {
        k: np.sort(g["qq"].to_numpy())[int(np.floor((len(g) - 1) * 0.5))] / 10000.0
        for k, g in df.groupby("event_type")
    }
    assert all(
        med.loc[i, "value_w"] == meds[med.loc[i, "event_type"]] for i in med.index
    )


def test_type_entropy_matches_naive_both_paths(ray_session):
    from ugfraud_ray.pipelines.events import type_entropy

    t = _synth_events(n=1200, n_users=25, seed=5)
    ds = ray.data.from_arrow(t).repartition(6)

    df = t.to_pandas()
    want = {}
    for u, g in df.groupby("user_id"):
        cnt = g.groupby("event_type").size().sort_index()
        p = cnt.to_numpy() / cnt.sum()
        h = 0.0 if len(cnt) == 1 else float(np.floor(-(p * np.log(p)).sum() * 1e9 + 0.5) / 1e9)
        want[int(u)] = (int(cnt.sum()), int(len(cnt)), h)

    for forced in (None, 10_000_000):
        out = type_entropy(ds, approx_rows=forced).to_pandas()
        got = {
            int(r.user_id): (int(r.n_events), int(r.n_types), float(r.h_nats))
            for r in out.itertuples()
        }
        assert got.keys() == want.keys()
        for u in want:
            assert got[u][:2] == want[u][:2]
            assert abs(got[u][2] - want[u][2]) < 1e-9, (u, got[u], want[u])


def test_entry_attribution_matches_pandas_both_paths(ray_session):
    from ugfraud_ray.pipelines.events import entry_attribution

    t = _synth_events(n=800, n_users=19, seed=41)
    ds = ray.data.from_arrow(t).repartition(5)

    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    gap = pd.Timedelta(minutes=30)
    want: dict[tuple, int] = {}
    for _, g in df.groupby("user_id"):
        brk = (g["ts"].diff() > gap) | g["ts"].diff().isna()
        sid = brk.cumsum()
        for _, s in g.groupby(sid):
            entry = s["event_type"].iloc[0]
            for et in s["event_type"]:
                want[(entry, et)] = want.get((entry, et), 0) + 1

    for thresh in (1_000_000, 0):
        out = entry_attribution(ds, local_threshold=thresh).to_pandas()
        got = {
            (r.entry_type, r.event_type): int(r.n_events)
            for r in out.itertuples(index=False)
        }
        assert got == want, f"threshold={thresh}"


def test_validation_counts_and_quarantine(ray_session):
    from ugfraud_ray.stages.validate import (
        quarantine_split,
        standard_event_rules,
        validation_counts,
    )

    t = _synth_events(n=400, seed=3)
    # plant violations: type 'error' is already unknown-type; push some values
    v = t["value"].to_numpy(zero_copy_only=False).copy()
    v[:7] = 500.0
    t = t.set_column(4, "value", pa.array(v))
    t = t.append_column("props", pa.array(['{"k": 95}'] * 5 + ['{"k": 1}'] * 395))
    ds = ray.data.from_arrow(t).repartition(4)

    rules = standard_event_rules()
    got = dict(
        zip(
            *(
                lambda d: (d["rule"].tolist(), d["n"].astype(int).tolist())
            )(validation_counts(ds, rules).to_pandas())
        )
    )
    df = t.to_pandas()
    known = {"click", "signup", "view", "purchase"}
    m_val = df["value"] > 100.0
    m_typ = ~df["event_type"].isin(known)
    m_k = df["props"].str.extract(r'"k": (-?\d+)')[0].astype(float).fillna(-1) >= 90
    m_ts = df["ts"] >= pd.Timestamp("2024-01-29")
    want = {
        "value_cap": int(m_val.sum()),
        "known_type": int(m_typ.sum()),
        "props_k_range": int(m_k.sum()),
        "ts_cutoff": int(m_ts.sum()),
        "__valid__": int((~(m_val | m_typ | m_k | m_ts)).sum()),
    }
    assert got == want
    assert want["value_cap"] >= 7 and want["props_k_range"] == 5

    good, bad = quarantine_split(ds, rules)
    gdf, bdf = good.to_pandas(), bad.to_pandas()
    assert len(gdf) == want["__valid__"]
    assert len(gdf) + len(bdf) == len(df)
    # first-rule attribution in rule-list order
    first = bdf.set_index("event_id")["_bad_rule"]
    for eid in df.loc[m_val, "event_id"]:
        assert first[eid] == "value_cap"


def test_daily_value_quantiles_matches_naive(ray_session):
    from ugfraud_ray.pipelines.events import daily_value_quantiles

    t = _synth_events(n=700, seed=8)
    ds = ray.data.from_arrow(t).repartition(4)
    out = daily_value_quantiles(ds).to_pandas()
    df = t.to_pandas()
    df["day"] = (df["ts"].astype("int64") // (86400 * 10**6)).astype(int)
    df["qq"] = np.floor(df["value"].to_numpy() * 1e4 + 0.5).astype(np.int64)
    want = {}
    for d, g in df.groupby("day"):
        v = np.sort(g["qq"].to_numpy())
        for q in (0.5, 0.99):
            want[(int(d), q)] = v[int(np.floor((len(v) - 1) * q))] / 10000.0
    got = {(int(r.day), float(r.q)): float(r.value) for r in out.itertuples()}
    assert got == want


def test_daily_type_pivot_matches_pandas(ray_session):
    import pytest

    from ugfraud_ray.pipelines.events import daily_type_pivot

    t = _synth_events(n=500, seed=2)
    types = ("click", "error", "view")
    out = daily_type_pivot(
        ray.data.from_arrow(t).repartition(4), types=types
    ).to_pandas().set_index("day")
    df = t.to_pandas()
    df["day"] = (df["ts"].astype("int64") // (86400 * 10**6)).astype(int)
    want = df.pivot_table(
        index="day", columns="event_type", values="event_id",
        aggfunc="count", fill_value=0,
    )
    for k in types:
        got_col = out[f"n_{k}"]
        for d in want.index:
            assert got_col.get(d, 0) == want.loc[d].get(k, 0)
    with pytest.raises(Exception, match="unknown event types"):
        daily_type_pivot(
            ray.data.from_arrow(t), types=("click",)
        ).to_pandas()


def test_bounce_rates_matches_pandas_both_paths(ray_session):
    from ugfraud_ray.pipelines.events import bounce_rates

    t = _synth_events(n=600, n_users=40, seed=9)
    ds = ray.data.from_arrow(t).repartition(5)
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    gap = pd.Timedelta(minutes=30)
    want: dict[str, list] = {}
    for _, g in df.groupby("user_id"):
        brk = (g["ts"].diff() > gap) | g["ts"].diff().isna()
        for _, s in g.groupby(brk.cumsum()):
            e = s["event_type"].iloc[0]
            want.setdefault(e, [0, 0])
            want[e][0] += 1
            want[e][1] += int(len(s) == 1)
    for thresh in (1_000_000, 0):
        out = bounce_rates(ds, local_threshold=thresh).to_pandas()
        got = {
            r.entry_type: [int(r.n_sessions), int(r.n_bounce)]
            for r in out.itertuples(index=False)
        }
        assert got == want, f"threshold={thresh}"
        for r in out.itertuples(index=False):
            assert abs(
                r.bounce_rate
                - np.floor(r.n_bounce / r.n_sessions * 1e9 + 0.5) / 1e9
            ) == 0


def test_conversion_lag_matches_pandas_both_paths(ray_session):
    from ugfraud_ray.pipelines.events import conversion_lag

    t = _synth_events(n=900, n_users=33, seed=14)
    ds = ray.data.from_arrow(t).repartition(4)
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    nf = nc = 0
    lags = []
    for _, g in df.groupby("user_id"):
        f = g[g["event_type"] == "view"]
        if f.empty:
            continue
        nf += 1
        t0 = f["ts"].iloc[0]
        c = g[(g["event_type"] == "click") & (g["ts"] >= t0)]
        if c.empty:
            continue
        nc += 1
        lags.append(int((c["ts"].iloc[0] - t0).value // 1000))
    for thresh in (1_000_000, 0):
        out = conversion_lag(
            ds, from_type="view", to_type="click", local_threshold=thresh
        ).to_pandas().iloc[0]
        assert int(out.n_from_users) == nf and int(out.n_converted) == nc
        assert int(out.min_lag_us) == min(lags) and int(out.max_lag_us) == max(lags)
        assert int(out.sum_lag_us) == sum(lags)


def test_max_active_streak_matches_pandas_both_paths(ray_session):
    from ugfraud_ray.pipelines.events import max_active_streak

    t = _synth_events(n=1500, n_users=21, seed=31)
    ds = ray.data.from_arrow(t).repartition(4)
    df = t.to_pandas()
    df["day"] = (df["ts"].astype("int64") // (86400 * 10**6)).astype(int)
    want = {}
    for u, g in df.groupby("user_id"):
        days = np.sort(g["day"].unique())
        runs, cur = [], 1
        for i in range(1, len(days)):
            if days[i] == days[i - 1] + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        want[int(u)] = (len(days), max(runs))
    for thresh in (1_000_000, 0):
        out = max_active_streak(ds, local_threshold=thresh).to_pandas()
        got = {
            int(r.user_id): (int(r.n_active_days), int(r.max_streak))
            for r in out.itertuples(index=False)
        }
        assert got == want, f"threshold={thresh}"
