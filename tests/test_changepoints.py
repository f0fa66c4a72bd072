"""CUSUM changepoints (events.changepoints) on a planted level shift
vs a naive prefix-scan mirror."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ugfraud_ray.pipelines.events import changepoints


def _mkevents():
    rows = []
    eid = 0
    # type "a": 2/day for 10 days then 20/day for 10 days -> shift at day 9
    for day in range(20):
        for _ in range(2 if day < 10 else 20):
            rows.append((eid, np.datetime64("2024-01-01", "us")
                         + np.timedelta64(day, "D") + np.timedelta64(eid % 7, "h"),
                         eid % 5, "a"))
            eid += 1
    # type "b": flat 3/day, no shift (stat small, earliest-tie rule)
    for day in range(12):
        for _ in range(3):
            rows.append((eid, np.datetime64("2024-02-01", "us")
                         + np.timedelta64(day, "D"), eid % 5, "b"))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    return df


def _naive(df):
    out = []
    day = df["ts"].astype("datetime64[us]").astype(np.int64) // 86_400_000_000
    for et, g in df.assign(day=day).groupby("event_type"):
        c = g.groupby("day").size().sort_index()
        s = c.cumsum().to_numpy()
        m = len(c)
        i = np.arange(1, m + 1)
        stat = np.abs(m * s - i * s[-1])
        b = int(np.argmax(stat))
        out.append((et, int(c.index[b]), int(stat[b])))
    return sorted(out)


def test_changepoints_match_naive(ray_session):
    df = _mkevents()
    ds = ray.data.from_pandas(df).repartition(4)
    got = changepoints(ds).to_pandas()
    got = sorted(got.itertuples(index=False, name=None))
    want = _naive(df)
    assert got == want
    # the planted shift in "a" is found at the end of the low regime
    by = {r[0]: r for r in got}
    a_day = by["a"][1]
    base = int(np.datetime64("2024-01-01").astype("datetime64[D]").astype(int))
    assert a_day == base + 9


def test_ewma_matches_naive_recursion(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.events import ewma_daily

    rng = np.random.default_rng(5)
    rows = []
    for typ in ["a", "b"]:
        for day in range(20):
            for _ in range(int(rng.integers(0, 6))):
                rows.append((typ, day))
    t = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows]),
            "ts": pa.array(
                np.array([r[1] * 86_400_000_000 + 7 for r in rows], dtype=np.int64),
                pa.timestamp("us"),
            ),
        }
    )
    out = (
        ewma_daily(ray.data.from_arrow(t).repartition(4), num=3, den=4, scale=100)
        .to_pandas()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    # naive mirror
    import collections

    daily = collections.Counter(rows)
    for typ in ["a", "b"]:
        days = sorted(d for (tt, d) in daily if tt == typ)
        prev = None
        for d in days:
            n = daily[(typ, d)]
            prev = n * 100 if prev is None else (3 * prev + 1 * n * 100) // 4
            row = out[(out.event_type == typ) & (out.day == d)]
            assert len(row) == 1
            assert int(row.n.iloc[0]) == n
            assert int(row.ewma_scaled.iloc[0]) == prev
