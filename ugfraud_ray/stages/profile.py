"""Table profiling: per-column row/null/distinct counts and min/max.

The discovery pass every ingestion runs before wiring a pipeline to an
unknown table (and the drift monitor it re-runs per snapshot). Shapes:
rows/nulls are per-block integer partials into a tiny (column) grouped
sum; min/max ride ONE typed Ray aggregate; exact distincts go through a
(column, value) grouped dedup followed by per-block count partials —
the distinct values never land on the driver (the same cost class as
SQL COUNT(DISTINCT); for web-scale unique-key columns swap in the
mergeable HLL from ``pipelines/sketches`` — the exact mode here is what
the DuckDB oracle replays).

Values render as strings (int64 str() == SQL CAST(.. AS VARCHAR);
string columns pass through), so one output schema profiles every
column type the engine pins.

Reference analog: none beyond ad-hoc prints (SURVEY §2.2 M2's
data_checker validates shape, never profiles).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table


def profile_table(ds: "ray.data.Dataset", columns: list[str]) -> pa.Table:
    """(column, n_rows, n_nulls, n_distinct, min_val, max_val)."""
    from ray.data.aggregate import Max, Min, Sum

    src = ds.select_columns(columns).materialize()

    def counts_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "column": pa.array(columns, pa.string()),
                "n_rows": pa.array(
                    np.full(len(columns), t.num_rows, dtype=np.int64)
                ),
                "n_nulls": pa.array(
                    np.array([t[c].null_count for c in columns], dtype=np.int64)
                ),
            }
        )

    counts = collect_table(
        src.map_batches(counts_partial, batch_format="pyarrow")
        .groupby("column")
        .aggregate(Sum("n_rows", alias_name="n_rows"), Sum("n_nulls", alias_name="n_nulls"))
    ).to_pandas().set_index("column")

    def dist_partial(t: pa.Table) -> pa.Table:
        cols, vals = [], []
        for c in columns:
            v = t[c].drop_null()
            u = np.unique(np.asarray([str(x) for x in v.to_pylist()], dtype=object))
            cols.extend([c] * len(u))
            vals.extend(u.tolist())
        return pa.table(
            {"column": pa.array(cols, pa.string()), "v": pa.array(vals, pa.string())}
        )

    deduped = (
        src.map_batches(dist_partial, batch_format="pyarrow")
        .groupby(["column", "v"])
        .count()
    )

    def per_col_partial(t: pa.Table) -> pa.Table:
        col = np.asarray(t["column"].to_pylist(), dtype=object)
        u, c = np.unique(col, return_counts=True)
        return pa.table(
            {
                "column": pa.array(u.astype(object), pa.string()),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    dist = collect_table(
        deduped.map_batches(per_col_partial, batch_format="pyarrow")
        .groupby("column")
        .aggregate(Sum("n", alias_name="n"))
    ).to_pandas().set_index("column")

    aggs = []
    for c in columns:
        aggs.append(Min(c, alias_name=f"_min_{c}"))
        aggs.append(Max(c, alias_name=f"_max_{c}"))
    typed = src.aggregate(*aggs)

    out = {k: [] for k in
           ("column", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")}
    for c in columns:
        out["column"].append(c)
        out["n_rows"].append(int(counts.loc[c, "n_rows"]))
        out["n_nulls"].append(int(counts.loc[c, "n_nulls"]))
        out["n_distinct"].append(int(dist.loc[c, "n"]) if c in dist.index else 0)
        mn, mx = typed[f"_min_{c}"], typed[f"_max_{c}"]
        out["min_val"].append(None if mn is None else str(mn))
        out["max_val"].append(None if mx is None else str(mx))
    return pa.table(
        {
            "column": pa.array(out["column"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "n_nulls": pa.array(out["n_nulls"], pa.int64()),
            "n_distinct": pa.array(out["n_distinct"], pa.int64()),
            "min_val": pa.array(out["min_val"], pa.string()),
            "max_val": pa.array(out["max_val"], pa.string()),
        }
    )
