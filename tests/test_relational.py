"""Join+aggregate pipeline: broadcast and Dataset.join paths agree
with each other and with a DuckDB oracle."""

from __future__ import annotations

import duckdb

from ugfraud_ray.pipelines import relational

SF = "/root/testdata/sf0.001"


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "nation"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(
        """
        SELECT n_name,
               SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                   AS BIGINT)) / 10000.0 AS revenue,
               COUNT(*) AS n_lineitems
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
        GROUP BY n_name ORDER BY n_name
        """
    ).fetchall()


def _rows(t):
    rows = list(zip(t["n_name"].to_pylist(), t["revenue"].to_pylist(),
                    t["n_lineitems"].to_pylist()))
    return sorted(rows)


def test_revenue_by_nation_broadcast_path(ray_session):
    got = _rows(relational.revenue_by_nation(SF))
    assert got == [tuple(r) for r in _duck(SF)]


def test_revenue_by_nation_distributed_join_path(ray_session, monkeypatch):
    monkeypatch.setattr(relational, "_BCAST_ORDERS", 0)
    got = _rows(relational.revenue_by_nation(SF))
    assert got == [tuple(r) for r in _duck(SF)]
