"""Join+aggregate pipeline: broadcast and Dataset.join paths agree
with each other and with a DuckDB oracle."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa

import ray
import ray.data

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


def _semi_anti_tables():
    left = pa.table(
        {
            "k": pa.array(np.arange(200, dtype=np.int64)),
            "payload": pa.array([f"row{i}" for i in range(200)]),
        }
    )
    # right hits even keys < 100, with duplicates
    right = pa.table({"rk": pa.array(np.repeat(np.arange(0, 100, 2, dtype=np.int64), 3))})
    return left, right


def test_semi_anti_join_partition_left(ray_session):
    left, right = _semi_anti_tables()
    lds = ray.data.from_arrow(left).repartition(5)
    rds = ray.data.from_arrow(right).repartition(3)
    semi = relational.semi_anti_join(lds, rds, "k", "rk", anti=False).to_pandas()
    anti = relational.semi_anti_join(lds, rds, "k", "rk", anti=True).to_pandas()
    assert sorted(semi["k"]) == list(range(0, 100, 2))
    assert len(semi) + len(anti) == 200
    assert set(semi["k"]).isdisjoint(set(anti["k"]))


def test_semi_anti_join_distributed_matches_broadcast(ray_session, monkeypatch):
    left, right = _semi_anti_tables()
    lds = ray.data.from_arrow(left).repartition(4)
    rds = ray.data.from_arrow(right).repartition(2)
    want_semi = relational.semi_anti_join(lds, rds, "k", "rk", anti=False).to_pandas()
    want_anti = relational.semi_anti_join(lds, rds, "k", "rk", anti=True).to_pandas()
    monkeypatch.setattr(relational, "_BCAST_KEY_ROWS", 0)
    got_semi = relational.semi_anti_join(lds, rds, "k", "rk", anti=False).to_pandas()
    got_anti = relational.semi_anti_join(lds, rds, "k", "rk", anti=True).to_pandas()
    for got, want in [(got_semi, want_semi), (got_anti, want_anti)]:
        g = got.sort_values("k").reset_index(drop=True)
        w = want.sort_values("k").reset_index(drop=True)
        assert g[["k", "payload"]].equals(w[["k", "payload"]])


def test_revenue_rollup_levels_consistent(ray_session):
    t = relational.revenue_rollup(SF).to_pandas()
    nat = t[(t.r_name != "ALL") & (t.n_name != "ALL")]
    reg = t[(t.r_name != "ALL") & (t.n_name == "ALL")].set_index("r_name")
    tot = t[(t.r_name == "ALL")]
    assert len(tot) == 1
    # subtotals are exact integer re-sums of their children
    for rn, sub in nat.groupby("r_name"):
        assert round(sub["revenue"].sum() - reg.loc[rn, "revenue"], 4) == 0
        assert sub["n_lineitems"].sum() == reg.loc[rn, "n_lineitems"]
    assert nat["n_lineitems"].sum() == tot["n_lineitems"].iloc[0]


def test_pricing_summary_matches_duckdb_exact(ray_session):
    import __ray_entry__ as entrymod

    got = relational.pricing_summary(SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
    want = con.execute(entrymod.oracle_sql()["lineitem_pricing_summary"]).df()
    key = ["l_returnflag", "l_linestatus"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)[g.columns]
    # bit-exact, not allclose: the whole point of the integer partials
    for c in g.columns:
        assert (g[c].to_numpy() == w[c].to_numpy()).all(), c


def test_top_unshipped_orders_paths_agree(ray_session):
    import numpy as np

    from ugfraud_ray.pipelines.relational import top_unshipped_orders

    sf = "/root/testdata/sf0.001"
    cutoff = int(np.datetime64("1998-06-01", "us").astype(np.int64))
    a = top_unshipped_orders(sf, cutoff_us=cutoff, n=10)
    b = top_unshipped_orders(sf, cutoff_us=cutoff, n=10, bcast_orders=0)  # join path
    assert a.to_pandas().equals(b.to_pandas())
    df = a.to_pandas()
    assert len(df) == 10
    # strictly ordered by revenue desc then orderkey asc
    rev = df["revenue"].to_numpy()
    assert all(
        (rev[i] > rev[i + 1])
        or (rev[i] == rev[i + 1] and df["o_orderkey"].iloc[i] < df["o_orderkey"].iloc[i + 1])
        for i in range(9)
    )


def test_semi_anti_join_hash_join_branch_parity(ray_session):
    """Force the Ray-native hash semi/anti join branch (approx hint
    above _BCAST_KEY_ROWS) and compare to the broadcast branch — the
    cluster-scale side of the size gate, green-tested (VERDICT r2 #7)."""
    import pyarrow as pa

    from ugfraud_ray.pipelines.relational import _BCAST_KEY_ROWS, semi_anti_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "x": pa.array(list("abcdef")),
            }
        )
    )
    right = ray.data.from_arrow(pa.table({"k": pa.array([2, 4, 9], pa.int64())}))
    for anti in (False, True):
        bc = (
            semi_anti_join(left, right, "k", anti=anti)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        hj = (
            semi_anti_join(
                left, right, "k", anti=anti, approx_right_rows=_BCAST_KEY_ROWS + 1
            )
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert bc["k"].tolist() == hj["k"].tolist()
        assert bc["x"].tolist() == hj["x"].tolist()
    assert hj["k"].tolist() == [1, 3, 5, 6]


def test_review_graph_monthly_join_branch_parity(ray_session, monkeypatch):
    """threshold=0 forces the lineitem x orders Dataset.join branch of
    the monthly-snapshot query; it must equal the broadcast-map run."""
    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"

    def run():
        out = entrymod.queries()["review_graph_monthly"](sf)
        df = out.to_pandas() if hasattr(out, "to_pandas") else out
        return df.sort_values("month").reset_index(drop=True)

    base = run()
    monkeypatch.setattr(entrymod, "MONTHLY_JOIN_THRESHOLD", 0)
    joined = run()
    assert base.values.tolist() == joined.values.tolist()


def test_svd_classifier_join_branch_parity(ray_session):
    """local_threshold=0 forces svd_classifier_probs' embedding x label
    hash join; probs must be bit-identical to the broadcast attach
    (the embedding itself is integer-grid deterministic)."""
    import numpy as np
    import pyarrow as pa

    from ugfraud_ray.detectors.svdclf import svd_classifier_probs

    rng = np.random.default_rng(4)
    n, k = 120, 3
    emb = rng.normal(size=(n, k))
    lab = (rng.random(n) < 0.4).astype(np.int8)
    emb_ds = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(np.arange(n, dtype=np.int64)),
                "emb": pa.FixedSizeListArray.from_arrays(pa.array(emb.reshape(-1)), k),
            }
        )
    )
    lab_ds = ray.data.from_arrow(
        pa.table({"vid": pa.array(np.arange(n, dtype=np.int64)), "label": pa.array(lab)})
    )
    a = (
        svd_classifier_probs(emb_ds, lab_ds, seed=11)
        .to_pandas().sort_values("vid").reset_index(drop=True)
    )
    b = (
        svd_classifier_probs(emb_ds, lab_ds, seed=11, local_threshold=0)
        .to_pandas().sort_values("vid").reset_index(drop=True)
    )
    assert a["vid"].tolist() == b["vid"].tolist()
    assert a["prob"].tolist() == b["prob"].tolist()


def test_top_orders_per_customer_paths_and_oracle(ray_session):
    from ugfraud_ray.pipelines.relational import top_orders_per_customer

    key = ["o_custkey", "rnk"]
    loc = (
        top_orders_per_customer(SF)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    dist = (
        top_orders_per_customer(SF, local_threshold=0)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert loc.equals(dist)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    want = (
        con.execute(
            """
        SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rnk
            FROM orders
        ) WHERE rnk <= 2
        """
        )
        .df()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert (loc["o_orderkey"].to_numpy() == want["o_orderkey"].to_numpy()).all()
    assert np.array_equal(loc["o_totalprice"].to_numpy(), want["o_totalprice"].to_numpy())


def test_topk_with_other(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.relational import topk_with_other

    keys = ["a"] * 10 + ["b"] * 8 + ["c"] * 8 + ["d"] * 3 + ["e"] * 1
    t = pa.table({"k": pa.array(keys)})
    out = topk_with_other(ray.data.from_arrow(t).repartition(3), "k", k=2)
    rows = list(zip(out["key"].to_pylist(), out["n"].to_pylist()))
    # tie at 8 between b and c -> key ASC keeps b
    assert rows == [("a", 10), ("b", 8), ("OTHER", 12)]
    # k >= domain: no OTHER row
    out2 = topk_with_other(ray.data.from_arrow(t), "k", k=10)
    assert "OTHER" not in out2["key"].to_pylist()
