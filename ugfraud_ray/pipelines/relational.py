"""Multi-table join + grouped aggregate pipelines (TPC-H-q5 shape).

The reference does joins only as driver-side dict lookups (SURVEY §2.4,
`Utils/helper.py:261-268`); this is the engine's general relational
surface: a big⋈big fact join, broadcast dimension lookups, and an
in-map combiner so the final groupby is dimension-sized, never
fact-sized.

Scale design (100 TB):
- lineitem ⋈ orders is the one unavoidable all-to-all; below
  ``_BCAST_ORDERS`` rows the order→customer map ships once via
  ``ray.put`` as a sorted key/value pair probed with searchsorted
  (Ray's hash join carries a multi-second shuffle-pool spin-up that
  dwarfs small build sides).
- customer→nation is gated by the SAME row-count rule: broadcast
  sorted-pair lookup below it, hash join above (TPC-H customer is
  ~1.5B rows at 100 TB — it must never be an unconditional collect).
- revenue is accumulated per batch into integer 10⁻⁴-currency units
  (``floor(x·10⁴ + 0.5)`` — IEEE-identical in numpy and SQL), so the
  per-nation sum is order-independent and bit-exact regardless of block
  arrival order; each block emits one ≤25-row partial and the driver
  sums the tiny partials (no fact-sized shuffle reaches the groupby).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table

_BCAST_ORDERS = 10_000_000


def _read(sf_dir: str, table: str, columns: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _rev_units(price: np.ndarray, discount: np.ndarray) -> np.ndarray:
    """Revenue in integer 1e-4 currency units; floor(x+0.5) (not
    banker's round) so numpy and SQL agree bit-for-bit."""
    return np.floor(price * (1.0 - discount) * 10_000.0 + 0.5).astype(np.int64)


_BCAST_KEY_ROWS = 10_000_000


def _sorted_lookup(keys: np.ndarray, sk: np.ndarray, sv: np.ndarray) -> np.ndarray:
    """Value per key via searchsorted against the broadcast SORTED
    (sk, sv) pair; misses → -1. Sized by build-side row count, never by
    max key — the standard broadcast-map idiom."""
    if len(sk) == 0 or len(keys) == 0:
        return np.full(len(keys), -1, dtype=np.int64)
    pos = np.clip(np.searchsorted(sk, keys), 0, len(sk) - 1)
    return np.where(sk[pos] == keys, sv[pos], np.int64(-1)).astype(np.int64)


def _nat_partial(nk: np.ndarray, rev: np.ndarray, n: np.ndarray, n_nat: int) -> pa.Table:
    """One ≤n_nat-row (nk, rev, cnt) partial from pre-aggregated
    (nationkey, rev-units, count) batch vectors; nk<0 rows drop."""
    keep = nk >= 0
    acc = np.zeros(n_nat, dtype=np.int64)
    cnt = np.zeros(n_nat, dtype=np.int64)
    np.add.at(acc, nk[keep], rev[keep].astype(np.int64))
    np.add.at(cnt, nk[keep], n[keep].astype(np.int64))
    return pa.table(
        {"nk": pa.array(np.arange(n_nat)), "rev": pa.array(acc), "cnt": pa.array(cnt)}
    )


def semi_anti_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key_col: str,
    right_key_col: str | None = None,
    anti: bool = False,
    approx_right_rows: int | None = None,
) -> "ray.data.Dataset":
    """Existence (semi) / non-existence (anti) filter of ``left`` by the
    key set of ``right`` — the reference's membership checks are
    driver-side ``dict``/``set`` probes (/root/reference
    UGFraud/Utils/helper.py:261-268); this is the distributed general form.

    Scale design: below ``_BCAST_KEY_ROWS`` the right side reduces to a
    sorted distinct-key array (per-block ``np.unique`` partials, driver
    merge — the keys, not the rows, move) broadcast once via ``ray.put``
    and probed per batch with ``searchsorted``; the left side STREAMS —
    no shuffle touches it. Above the threshold it falls through to
    Ray's native hash semi/anti join, partitioned by
    ``join_partitions()`` (cluster-sized, never data-derived — an
    unschedulable aggregator pool hangs, see graph_build.py).
    """
    right_key_col = right_key_col or key_col
    n = approx_right_rows if approx_right_rows is not None else right.count()

    if n <= _BCAST_KEY_ROWS:
        def uniq(t: pa.Table) -> pa.Table:
            return pa.table(
                {"k": pa.array(np.unique(t[right_key_col].to_numpy(zero_copy_only=False)))}
            )

        kt = collect_table(right.map_batches(uniq, batch_format="pyarrow"))
        keys = (
            np.unique(kt["k"].to_numpy(zero_copy_only=False))
            if kt.num_rows
            else np.array([], dtype=np.int64)
        )
        keys_ref = ray.put(keys)

        def filt(t: pa.Table) -> pa.Table:
            k = ray.get(keys_ref)
            v = t[key_col].to_numpy(zero_copy_only=False)
            if len(k) == 0:
                hit = np.zeros(len(v), dtype=bool)
            else:
                idx = np.searchsorted(k, v)
                hit = (idx < len(k)) & (k[np.minimum(idx, len(k) - 1)] == v)
            return t.filter(pa.array(~hit if anti else hit))

        return left.map_batches(filt, batch_format="pyarrow")

    from ugfraud_ray.stages.graph_build import join_partitions

    return left.join(
        right.select_columns([right_key_col]),
        join_type="left_anti" if anti else "left_semi",
        num_partitions=join_partitions(),
        on=(key_col,),
        right_on=(right_key_col,),
    )


def _nation_revenue_units(sf_dir: str):
    """Per-nation (integer-unit revenue, lineitem count) vectors plus the
    nation table — the single fact-table pass shared by
    ``revenue_by_nation`` and ``revenue_rollup``.

    Both build sides are gated by ROW COUNT (parquet metadata, free),
    never collected unconditionally: below ``_BCAST_ORDERS`` rows a side
    ships once via ``ray.put`` as a SORTED key array probed with
    searchsorted (sized by count, not max key — no dense max-key
    allocation); above, it falls through to Ray's hash join at
    ``join_partitions()``. The fact pass reduces lineitem to per-batch
    (custkey, rev, n) partials first, so whichever path resolves
    customer→nation only ever sees distinct-custkey-per-batch rows."""
    nation = collect_table(
        _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    )
    n_nat = int(nation["n_nationkey"].to_numpy(zero_copy_only=False).max()) + 1

    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    n_cust = cust_ds.count()  # parquet metadata — free
    n_ord = orders.count()

    # --- fact pass: lineitem → per-batch (c_custkey, rev, n) partials ---
    def _cust_partial(cu: np.ndarray, price: np.ndarray, disc: np.ndarray) -> pa.Table:
        keep = cu >= 0
        cu, rev = cu[keep], _rev_units(price[keep], disc[keep])
        uc, inv = np.unique(cu, return_inverse=True)
        acc = np.zeros(len(uc), dtype=np.int64)
        np.add.at(acc, inv, rev)
        cnt = np.bincount(inv, minlength=len(uc)).astype(np.int64)
        return pa.table(
            {"c_custkey": pa.array(uc), "rev": pa.array(acc), "n": pa.array(cnt)}
        )

    if n_ord <= _BCAST_ORDERS:
        ot = collect_table(orders)
        ok = ot["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        oc = ot["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(ok)
        o2c_ref = ray.put((ok[o], oc[o]))

        def fact_partial(t: pa.Table) -> pa.Table:
            oks, ocs = ray.get(o2c_ref)
            lo = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            cu = _sorted_lookup(lo, oks, ocs)
            return _cust_partial(
                cu,
                t["l_extendedprice"].to_numpy(zero_copy_only=False),
                t["l_discount"].to_numpy(zero_copy_only=False),
            )

        fact = lineitem.map_batches(fact_partial, batch_format="pyarrow")
    else:
        from ugfraud_ray.stages.graph_build import join_partitions

        joined = lineitem.join(
            orders.rename_columns({"o_orderkey": "l_orderkey"}),
            join_type="inner",
            num_partitions=join_partitions(),
            on=("l_orderkey",),
        )

        def fact_joined(t: pa.Table) -> pa.Table:
            return _cust_partial(
                t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                t["l_extendedprice"].to_numpy(zero_copy_only=False),
                t["l_discount"].to_numpy(zero_copy_only=False),
            )

        fact = joined.map_batches(fact_joined, batch_format="pyarrow")

    # --- nation resolution: gated broadcast lookup vs hash join ---
    if n_cust <= _BCAST_ORDERS:
        ct = collect_table(cust_ds)
        ck = ct["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cn = ct["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(ck)
        c2n_ref = ray.put((ck[o], cn[o]))

        def nk_partial(t: pa.Table) -> pa.Table:
            cks, cns = ray.get(c2n_ref)
            cu = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            nk = _sorted_lookup(cu, cks, cns)
            return _nat_partial(
                nk,
                t["rev"].to_numpy(zero_copy_only=False),
                t["n"].to_numpy(zero_copy_only=False),
                n_nat,
            )

        partials = fact.map_batches(nk_partial, batch_format="pyarrow")
    else:
        from ugfraud_ray.stages.graph_build import join_partitions

        fact_j = fact.join(
            cust_ds,
            join_type="inner",
            num_partitions=join_partitions(),
            on=("c_custkey",),
        )

        def nk_joined(t: pa.Table) -> pa.Table:
            return _nat_partial(
                t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                t["rev"].to_numpy(zero_copy_only=False),
                t["n"].to_numpy(zero_copy_only=False),
                n_nat,
            )

        partials = fact_j.map_batches(nk_joined, batch_format="pyarrow")

    # partials are (n_blocks × n_nat) rows — driver sum, no shuffle
    pt = collect_table(partials)
    rev = np.zeros(n_nat, dtype=np.int64)
    cnt = np.zeros(n_nat, dtype=np.int64)
    np.add.at(rev, pt["nk"].to_numpy(zero_copy_only=False), pt["rev"].to_numpy(zero_copy_only=False))
    np.add.at(cnt, pt["nk"].to_numpy(zero_copy_only=False), pt["cnt"].to_numpy(zero_copy_only=False))

    return rev, cnt, nation


def revenue_by_nation(sf_dir: str) -> pa.Table:
    """(n_name, revenue, n_lineitems) — lineitem revenue grouped by the
    ordering customer's nation."""
    rev, cnt, nation = _nation_revenue_units(sf_dir)
    nat_k = nation["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    names = nation["n_name"].to_pylist()
    keep = cnt[nat_k] > 0
    return pa.table(
        {
            "n_name": pa.array([n for n, k in zip(names, keep) if k], pa.string()),
            "revenue": pa.array(rev[nat_k][keep] / 10_000.0, pa.float64()),
            "n_lineitems": pa.array(cnt[nat_k][keep]),
        }
    )


def pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H-Q1-shape multi-aggregate: per (l_returnflag, l_linestatus),
    sums of quantity / base price / discounted price / charge plus
    averages and row count — the canonical wide-scan report.

    One streaming pass, no shuffle at any scale: each block reduces to a
    ≤|flag×status| (≈6-row) integer partial inside ``map_batches``;
    quantity/price/discount/tax quantize to their natural decimal grids
    via floor(x·10^k + 0.5) so every sum — including the degree-3
    product charge = price·(1-disc)·(1+tax) — is an exact integer,
    merged on the driver as Python ints (unbounded, no int64 overflow at
    any corpus size). The float output columns are computed by the SAME
    IEEE expression the SQL oracle uses, so they compare bit-exact."""
    cols = [
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
    ]

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        q = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False) * 100.0 + 0.5).astype(
            np.int64
        )
        b = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        d = np.floor(t["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5).astype(
            np.int64
        )
        x = np.floor(t["l_tax"].to_numpy(zero_copy_only=False) * 100.0 + 0.5).astype(
            np.int64
        )
        disc_price = b * (100 - d)          # 1e-4 units
        charge = disc_price * (100 + x)     # 1e-6 units
        df = pd.DataFrame(
            {
                "rf": t["l_returnflag"].to_numpy(zero_copy_only=False),
                "ls": t["l_linestatus"].to_numpy(zero_copy_only=False),
                "s_qty": q,
                "s_base": b,
                "s_disc_price": disc_price,
                "s_charge": charge,
                "s_disc": d,
            }
        )
        g = df.groupby(["rf", "ls"], sort=False).agg(
            s_qty=("s_qty", "sum"),
            s_base=("s_base", "sum"),
            s_disc_price=("s_disc_price", "sum"),
            s_charge=("s_charge", "sum"),
            s_disc=("s_disc", "sum"),
            n=("s_qty", "size"),
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    parts = collect_table(
        _read(sf_dir, "lineitem", cols).map_batches(partial, batch_format="pyarrow")
    ).to_pandas()
    acc: dict[tuple[str, str], list[int]] = {}
    for row in parts.itertuples(index=False):
        a = acc.setdefault((row.rf, row.ls), [0, 0, 0, 0, 0, 0])
        a[0] += int(row.s_qty)
        a[1] += int(row.s_base)
        a[2] += int(row.s_disc_price)
        a[3] += int(row.s_charge)
        a[4] += int(row.s_disc)
        a[5] += int(row.n)
    keys = sorted(acc)
    out = {
        "l_returnflag": [],
        "l_linestatus": [],
        "sum_qty": [],
        "sum_base_price": [],
        "sum_disc_price": [],
        "sum_charge": [],
        "avg_qty": [],
        "avg_price": [],
        "avg_disc": [],
        "count_order": [],
    }
    for k in keys:
        s_qty, s_base, s_dp, s_ch, s_d, n = acc[k]
        out["l_returnflag"].append(k[0])
        out["l_linestatus"].append(k[1])
        # each expression is mirrored op-for-op in the SQL oracle
        out["sum_qty"].append(float(s_qty) / 100.0)
        out["sum_base_price"].append(float(s_base) / 100.0)
        out["sum_disc_price"].append(float(s_dp) / 10000.0)
        out["sum_charge"].append(float(s_ch) / 1000000.0)
        out["avg_qty"].append(float(s_qty) / 100.0 / float(n))
        out["avg_price"].append(float(s_base) / 100.0 / float(n))
        out["avg_disc"].append(float(s_d) / 100.0 / float(n))
        out["count_order"].append(n)
    return pa.table(
        {
            "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
            "l_linestatus": pa.array(out["l_linestatus"], pa.string()),
            "sum_qty": pa.array(out["sum_qty"], pa.float64()),
            "sum_base_price": pa.array(out["sum_base_price"], pa.float64()),
            "sum_disc_price": pa.array(out["sum_disc_price"], pa.float64()),
            "sum_charge": pa.array(out["sum_charge"], pa.float64()),
            "avg_qty": pa.array(out["avg_qty"], pa.float64()),
            "avg_price": pa.array(out["avg_price"], pa.float64()),
            "avg_disc": pa.array(out["avg_disc"], pa.float64()),
            "count_order": pa.array(out["count_order"], pa.int64()),
        }
    )


def revenue_rollup(sf_dir: str) -> pa.Table:
    """ROLLUP(region, nation) revenue: (r_name, n_name, revenue,
    n_lineitems) at nation level, region subtotals (n_name='ALL') and a
    grand total (both 'ALL').

    The rollup costs ONE fact-table pass at any scale: upper levels are
    exact integer re-sums of the 25-slot per-nation partial, never a
    second scan or shuffle — the reason revenue accumulates in integer
    1e-4 units (order-independent, so subtotal == sum of its children
    bit-for-bit, which the SQL ROLLUP oracle checks)."""
    rev, cnt, nation = _nation_revenue_units(sf_dir)
    region = collect_table(_read(sf_dir, "region", ["r_regionkey", "r_name"]))
    nat_k = nation["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nat_r = nation["n_regionkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_names = nation["n_name"].to_pylist()
    r_by_key = dict(
        zip(
            region["r_regionkey"].to_numpy(zero_copy_only=False).tolist(),
            region["r_name"].to_pylist(),
        )
    )
    rows: list[tuple[str, str, int, int]] = []
    reg_acc: dict[str, list[int]] = {}
    for nk, rk, nm in zip(nat_k.tolist(), nat_r.tolist(), n_names):
        if cnt[nk] == 0:
            continue
        rn = r_by_key[rk]
        rows.append((rn, nm, int(rev[nk]), int(cnt[nk])))
        a = reg_acc.setdefault(rn, [0, 0])
        a[0] += int(rev[nk])
        a[1] += int(cnt[nk])
    for rn, (rv, c) in reg_acc.items():
        rows.append((rn, "ALL", rv, c))
    rows.append(("ALL", "ALL", int(rev.sum()), int(cnt.sum())))
    rows.sort()
    return pa.table(
        {
            "r_name": pa.array([r[0] for r in rows], pa.string()),
            "n_name": pa.array([r[1] for r in rows], pa.string()),
            "revenue": pa.array([r[2] / 10_000.0 for r in rows], pa.float64()),
            "n_lineitems": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def top_unshipped_orders(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff_us: int = 0,
    n: int = 10,
    bcast_orders: int | None = None,
) -> pa.Table:
    """TPC-H-Q3-shape composition: customer(segment) ⋈ orders(placed
    before cutoff) ⋈ lineitem(shipped after cutoff) -> per-order integer
    revenue -> top-n by (revenue DESC, orderkey ASC). Deterministic and
    bit-exact vs SQL (revenue in 1e-4 units).

    Scale shape: the qualifying customer-key set and the qualifying
    order->date map are broadcast (dimension side, small by the segment
    + date filters); the fact table streams, emitting SPARSE per-block
    (orderkey, units) partials; one orderkey groupby sums them and the
    top-n is a sort-limit over qualifying orders only. Above
    ``bcast_orders`` the order map switches to the cluster-sized hash
    join exactly like revenue_by_nation."""
    bcast = _BCAST_ORDERS if bcast_orders is None else bcast_orders
    cust = collect_table(_read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]))
    seg = cust["c_mktsegment"].to_numpy(zero_copy_only=False)
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)[seg == segment]
    ck_max = int(ck.max()) + 1 if len(ck) else 1
    in_seg = np.zeros(ck_max, dtype=bool)
    in_seg[ck] = True
    seg_ref = ray.put(in_seg)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    lineitem = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )
    n_ord = orders.count()
    if n_ord > bcast:
        from ugfraud_ray.stages.graph_build import join_partitions

        def ofilt(t: pa.Table) -> pa.Table:
            sm = ray.get(seg_ref)
            cu = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            od = t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            keep = (od < cutoff_us) & (cu < len(sm)) & sm[np.minimum(cu, len(sm) - 1)]
            return pa.table(
                {
                    "l_orderkey": t["o_orderkey"].filter(pa.array(keep)),
                    "o_date_us": pa.array(od[keep]),
                }
            )

        qual = orders.map_batches(ofilt, batch_format="pyarrow")

        def lfilt(t: pa.Table) -> pa.Table:
            sd = t["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            keep = sd > cutoff_us
            return pa.table(
                {
                    "l_orderkey": t["l_orderkey"].filter(pa.array(keep)),
                    "units": pa.array(
                        _rev_units(
                            t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep],
                            t["l_discount"].to_numpy(zero_copy_only=False)[keep],
                        )
                    ),
                }
            )

        joined = lineitem.map_batches(lfilt, batch_format="pyarrow").join(
            qual, join_type="inner", num_partitions=join_partitions(), on=("l_orderkey",)
        )

        def partial(t: pa.Table) -> pa.Table:
            ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            u = t["units"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["o_date_us"].to_numpy(zero_copy_only=False).astype(np.int64)
            uk, inv = np.unique(ok, return_inverse=True)
            acc = np.zeros(len(uk), dtype=np.int64)
            np.add.at(acc, inv, u)
            dd = np.zeros(len(uk), dtype=np.int64)
            dd[inv] = d
            return pa.table(
                {"o": pa.array(uk), "u": pa.array(acc), "d": pa.array(dd)}
            )

        parts = joined.map_batches(partial, batch_format="pyarrow")
    else:
        ot = collect_table(orders)
        ok = ot["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        oc = ot["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        od = ot["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        q = (od < cutoff_us) & (oc < ck_max) & in_seg[np.minimum(oc, ck_max - 1)]
        o2d = np.full(int(ok.max()) + 1 if len(ok) else 1, -1, dtype=np.int64)
        o2d[ok[q]] = od[q]
        o2d_ref = ray.put(o2d)

        def partial_b(t: pa.Table) -> pa.Table:
            m = ray.get(o2d_ref)
            lo = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            sd = t["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            keep = (sd > cutoff_us) & (lo < len(m)) & (m[np.minimum(lo, len(m) - 1)] >= 0)
            lo = lo[keep]
            u = _rev_units(
                t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep],
                t["l_discount"].to_numpy(zero_copy_only=False)[keep],
            )
            uk, inv = np.unique(lo, return_inverse=True)
            acc = np.zeros(len(uk), dtype=np.int64)
            np.add.at(acc, inv, u)
            return pa.table(
                {"o": pa.array(uk), "u": pa.array(acc), "d": pa.array(m[uk])}
            )

        parts = lineitem.map_batches(partial_b, batch_format="pyarrow")

    # qualifying-order domain is small after the filters: driver merge
    pt = collect_table(parts)
    o = pt["o"].to_numpy(zero_copy_only=False).astype(np.int64)
    u = pt["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = pt["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    uk, inv = np.unique(o, return_inverse=True)
    acc = np.zeros(len(uk), dtype=np.int64)
    np.add.at(acc, inv, u)
    dd = np.zeros(len(uk), dtype=np.int64)
    dd[inv] = d
    order = np.lexsort((uk, -acc))[:n]
    return pa.table(
        {
            "o_orderkey": pa.array(uk[order]),
            "o_date_us": pa.array(dd[order]),
            "revenue": pa.array(np.array([float(x) / 1e4 for x in acc[order]])),
        }
    )


def top_orders(sf_dir: str, k: int) -> pa.Table:
    """O1 descending ranking (reference rank-by-score listings,
    /root/reference UGFraud/Detector/Fraudar.py top-block pick shape):
    global top-k orders by (o_totalprice DESC, o_orderkey ASC) WITHOUT
    a global sort — every block keeps its own top-k (vectorized lexsort
    partial), and the ≤ k·n_blocks survivors merge once on the driver
    (top-k is a semilattice; same pattern as events.top_anomalies)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return t.take(pa.array(np.lexsort((ok, -p))[:k]))

    merged = collect_table(orders.map_batches(partial, batch_format="pyarrow"))
    if merged.num_rows == 0:
        return merged
    p = merged["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
    ok = merged["o_orderkey"].to_numpy(zero_copy_only=False)
    return merged.take(pa.array(np.lexsort((ok, -p))[:k]))


def top_orders_per_customer(
    sf_dir: str,
    k: int = 2,
    local_threshold: int = 1_000_000,
) -> "ray.data.Dataset":
    """Per-customer top-k orders by (o_totalprice DESC, o_orderkey ASC)
    with a dense rank — the relational window-function shape
    (ROW_NUMBER OVER PARTITION BY). Output
    (o_custkey, o_orderkey, o_totalprice, rnk); price passes through
    untouched so the hash compare is float-safe.

    Distributed shape: per-block top-k partials (lexsort runs bound the
    rows leaving a block to k per customer) -> ONE coarse customer
    bucket shuffle -> the identical kernel per bucket. Below the gate
    the kernel runs once driver-local.
    """
    from ugfraud_ray.functions.bucketing import int_hash_bucket, n_coarse_buckets
    from ugfraud_ray.functions.collect import collect_table

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    n = orders.count()

    def topk_kernel(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((o, -p, c))
        c, o, p = c[order], o[order], p[order]
        if len(c):
            new = np.concatenate([[True], c[1:] != c[:-1]])
            run = np.cumsum(new) - 1
            starts = np.flatnonzero(new)
            pos = np.arange(len(c)) - starts[run]
            keep = pos < k
        else:
            keep = np.zeros(0, dtype=bool)
            pos = np.zeros(0, dtype=np.int64)
        return pa.table(
            {
                "o_custkey": pa.array(c[keep]),
                "o_orderkey": pa.array(o[keep]),
                "o_totalprice": pa.array(p[keep]),
                "rnk": pa.array((pos[keep] + 1).astype(np.int64)),
            }
        )

    if n <= local_threshold:
        return ray.data.from_arrow(
            topk_kernel(collect_table(orders))
        )

    nb = n_coarse_buckets(n)

    def bucketize(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_cb", pa.array(int_hash_bucket(c, nb)))

    partial = orders.map_batches(topk_kernel, batch_format="pyarrow")

    def per_bucket(g: pa.Table) -> pa.Table:
        return topk_kernel(g.drop_columns(["_cb", "rnk"]))

    return (
        partial.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def topk_with_other(
    ds: "ray.data.Dataset",
    key_col: str,
    k: int = 3,
    other_label: str = "OTHER",
) -> pa.Table:
    """(key, n) — cardinality-capped group counts: the top-``k`` keys by
    (count DESC, key ASC) keep their own row, everything else collapses
    into ONE ``other_label`` row. The reporting primitive that keeps
    dashboards bounded when the key domain is unbounded (long-tail
    sources/domains). One grouped count over the dimension-sized key
    domain; the cap itself is a driver-side sort of that tiny table."""
    from ray.data.aggregate import Count

    from ugfraud_ray.functions.collect import collect_table

    t = collect_table(ds.groupby(key_col).aggregate(Count(alias_name="n")))
    keys = np.asarray(t[key_col].to_pylist(), dtype=object)
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((keys, -n))
    keys, n = keys[order], n[order]
    top_keys = keys[:k].tolist()
    top_n = n[:k].tolist()
    other = int(n[k:].sum())
    out_k = [str(x) for x in top_keys]
    out_n = list(top_n)
    if other > 0:
        out_k.append(other_label)
        out_n.append(other)
    return pa.table(
        {
            "key": pa.array(out_k, pa.string()),
            "n": pa.array(np.array(out_n, dtype=np.int64)),
        }
    )


def suppliers_per_nation(sf_dir: str) -> "ray.data.Dataset":
    """(n_name, n_suppliers, supplier_list) — ordered string aggregation:
    every nation's supplier names joined by ', ' in ascending name
    order (the ORDER BY inside an aggregate — a capability distinct
    from plain grouped sums). Scale shape: ONE nation-keyed coarse
    bucket shuffle; the per-bucket kernel lexsorts (nation, name) runs
    and joins with a vectorized pc.binary_join — no Python loop over
    names; the nation dimension is 25-bounded so the output is tiny."""
    from ugfraud_ray.functions.bucketing import n_coarse_buckets

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    from ugfraud_ray.functions.collect import collect_table

    nt = collect_table(nat)
    nk = nt["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = np.asarray(nt["n_name"].to_pylist(), dtype=object)
    order = np.argsort(nk, kind="stable")
    ref = ray.put((nk[order], nn[order]))

    def attach(t: pa.Table) -> pa.Table:
        kk, names = ray.get(ref)
        k = t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(kk, k)
        return pa.table(
            {
                "n_name": pa.array(names[pos].astype(object), pa.string()),
                "s_name": t["s_name"],
            }
        )

    nb = np.uint64(n_coarse_buckets(None))

    def bucketize(t: pa.Table) -> pa.Table:
        import pandas as pd

        h = pd.util.hash_array(
            np.asarray(t["n_name"].to_pylist(), dtype=object)
        )
        return t.append_column("_cb", pa.array((h % nb).astype(np.int64)))

    def per_bucket(g: pa.Table) -> pa.Table:
        nn_ = np.asarray(g["n_name"].to_pylist(), dtype=object)
        sn = np.asarray(g["s_name"].to_pylist(), dtype=object)
        order = np.lexsort((sn, nn_))
        nn_, sn = nn_[order], sn[order]
        starts = np.flatnonzero(np.concatenate([[True], nn_[1:] != nn_[:-1]]))
        counts = np.diff(np.append(starts, len(nn_))).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(counts)))
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(sn, pa.large_string())
        )
        joined = pc.binary_join(lists, pa.scalar(", ", pa.large_string()))
        return pa.table(
            {
                "n_name": pa.array(nn_[starts].astype(object), pa.string()),
                "n_suppliers": pa.array(counts),
                "supplier_list": pc.cast(joined, pa.string()),
            }
        )

    return (
        sup.map_batches(attach, batch_format="pyarrow")
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def nation_month_share(sf_dir: str) -> "ray.data.Dataset":
    """(month, n_name, revenue, share) — share-of-month revenue by
    customer nation (the BI market-share window): o_totalprice
    accumulates in exact integer cents per (month, nation) via
    per-block dense partials (months x 25 nations — dimension-sized),
    month totals re-sum those exact integers, and share is ONE float
    division rounded to the 1e-9 grid. Month = epoch-months of
    o_orderdate; revenue mirrors ROUND(cents / 100.0, 2) both sides."""
    from ray.data.aggregate import Sum

    cust = collect_table(_read(sf_dir, "customer", ["c_custkey", "c_nationkey"]))
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cn = cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nation = collect_table(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    nk = nation["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nname = np.asarray(nation["n_name"].to_pylist(), dtype=object)
    c2n = np.full(int(ck.max()) + 1 if len(ck) else 1, -1, dtype=np.int64)
    c2n[ck] = cn
    ref = ray.put(c2n)

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        oc = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
            * 100.0 + 0.5
        ).astype(np.int64)
        month = (
            t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[M]").astype(np.int64)
        )
        nat = m[oc]
        pk = month * np.int64(64) + nat
        u, inv = np.unique(pk, return_inverse=True)
        sums = np.zeros(len(u), dtype=np.int64)
        np.add.at(sums, inv, cents)
        return pa.table({"pk": pa.array(u), "cents": pa.array(sums)})

    base = collect_table(
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(Sum("cents", alias_name="cents"))
    )
    pk = base["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
    cents = base["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
    month = pk // 64
    nat = pk % 64
    # month totals: exact integer re-sums of the dimension-sized cells
    um = np.unique(month)
    tot = np.zeros(len(um), dtype=np.int64)
    np.add.at(tot, np.searchsorted(um, month), cents)
    tot_row = tot[np.searchsorted(um, month)]
    name_lk = np.full(int(nk.max()) + 1, "", dtype=object)
    name_lk[nk] = nname
    share = np.floor(
        cents.astype(np.float64) / tot_row.astype(np.float64) * 1e9 + 0.5
    ) / 1e9
    return ray.data.from_arrow(
        pa.table(
            {
                "month": pa.array(month),
                "n_name": pa.array(name_lk[nat].astype(object), pa.string()),
                "revenue": pa.array(np.round(cents / 100.0, 2)),
                "share": pa.array(share),
            }
        )
    )


def late_orders_by_priority(
    sf_dir: str, late_days: int = 90
) -> "ray.data.Dataset":
    """(o_orderpriority, n_orders) — the TPC-H Q4 EXISTS shape on this
    schema: orders with AT LEAST ONE lineitem shipped more than
    ``late_days`` days after the order date, counted per priority.
    The order-date map broadcasts once (review_edges' rule), the late
    flag is a vectorized date comparison per lineitem batch, and the
    EXISTS resolves through ``semi_anti_join``'s broadcast-or-join
    gate — no fact-sized groupby anywhere."""
    from ray.data.aggregate import Count

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).materialize()
    ot = collect_table(orders.select_columns(["o_orderkey", "o_orderdate"]))
    ok = ot["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    od = (
        ot["o_orderdate"].to_numpy(zero_copy_only=False)
        .astype("datetime64[us]").astype(np.int64)
    )
    lk = np.zeros(int(ok.max()) + 1 if len(ok) else 1, dtype=np.int64)
    lk[ok] = od
    ref = ray.put(lk)
    late_us = np.int64(late_days) * 86_400_000_000

    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def late_keys(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        lo = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sd = (
            t["l_shipdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        late = sd > m[lo] + late_us
        return pa.table({"l_orderkey": pa.array(np.unique(lo[late]))})

    late = lineitem.map_batches(late_keys, batch_format="pyarrow")
    hit = semi_anti_join(orders, late, "o_orderkey", right_key_col="l_orderkey")
    return (
        hit.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"))
        .rename_columns({"o_orderpriority": "priority"})
        .select_columns(["priority", "n_orders"])
    )


def forecast_revenue(sf_dir: str) -> pa.Table:
    """One row (revenue) — the TPC-H Q6 predicate-scan shape: lineitems
    shipped in 1996 with discount in [0.05, 0.07] and quantity < 24;
    revenue = Σ l_extendedprice·l_discount in EXACT integer 1e-4 units
    (floor(x·1e4 + 0.5) per row, order-free partial sums), one final
    ROUND(units/1e4, 2) readout. The column-pruned streaming scan the
    brief's 'prune at the read' rule describes — no shuffle at all."""
    from ray.data.aggregate import Sum

    li = _read(
        sf_dir, "lineitem",
        ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        disc = t["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        px = t["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = (
            (sd >= np.datetime64("1996-01-01", "us"))
            & (sd < np.datetime64("1997-01-01", "us"))
            & (disc >= 0.05)
            & (disc <= 0.07)
            & (qty < 24)
        )
        units = np.floor(px[keep] * disc[keep] * 10_000.0 + 0.5).astype(np.int64)
        return pa.table({"u": pa.array([int(units.sum())], pa.int64())})

    agg = li.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("u", alias_name="u")
    )
    rev = round(int(agg["u"]) / 10_000.0, 2)
    return pa.table({"revenue": pa.array([rev], pa.float64())})


def customer_rfm(sf_dir: str) -> "ray.data.Dataset":
    """(c_custkey, recency_days, frequency, monetary) — the classic RFM
    segmentation base: days from the customer's last order to the
    corpus max order date, order count, and total spend in EXACT
    integer cents (ROUND(c/100.0, 2) readout — 2-decimal values have no
    .5 boundary). One streaming pass of per-block (cust, max_date, n,
    cents) partials into a customer-keyed grouped merge."""
    from ray.data.aggregate import Max, Sum

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        oc = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        od = (
            t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[D]").astype(np.int64)
        )
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
            * 100.0 + 0.5
        ).astype(np.int64)
        u, inv = np.unique(oc, return_inverse=True)
        mx = np.full(len(u), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, od)
        n = np.bincount(inv).astype(np.int64)
        cm = np.zeros(len(u), dtype=np.int64)
        np.add.at(cm, inv, cents)
        return pa.table(
            {
                "c_custkey": pa.array(u),
                "last_day": pa.array(mx),
                "frequency": pa.array(n),
                "cents": pa.array(cm),
            }
        )

    agg = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(
            Max("last_day", alias_name="last_day"),
            Sum("frequency", alias_name="frequency"),
            Sum("cents", alias_name="cents"),
        )
        .materialize()
    )
    max_day = int(agg.max("last_day"))

    def fin(t: pa.Table) -> pa.Table:
        ld = t["last_day"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "recency_days": pa.array(max_day - ld),
                "frequency": t["frequency"],
                "monetary": pa.array(np.round(c / 100.0, 2)),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")
