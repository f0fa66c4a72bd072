"""Mergeable sketches — approximate analytics whose partials never grow.

HyperLogLog grouped approximate COUNT(DISTINCT) is the 100-TB companion
to the exact grouped distinct (`events.distinct_users_per_type`): the
exact path must move the distinct (group, value) pair domain through one
shuffle, which is unbounded in the value cardinality; the sketch path
moves NOTHING proportional to the data. Each block reduces inside
``map_batches`` to a (group, register, max-rho) partial bounded by
|groups| x 4096 rows regardless of block size; partials merge by MAX —
commutative, associative, idempotent — so the merge is safe under Ray's
nondeterministic block arrival order, task retries, and any tree/driver
merge topology, and the sketch state checkpoints as a tiny table.

Determinism contract (what lets this be DuckDB-oracled bit-exactly,
estimate INCLUDED): the item hash is md5-low64 of the value's decimal
string (== DuckDB ``md5_number_upper(CAST(v AS VARCHAR))``, the same
hash-parity convention as the simhash/minhash oracles); rho uses
bit-length, never float log2 of the hash; the register sum S is an
exact integer (Python int here, HUGEINT in SQL); and every int→double
conversion routes through the decimal string (DuckDB's direct
HUGEINT→DOUBLE cast is NOT round-to-nearest — measured 4096-ulp-scale
gaps — while strtod and Python's float(int) are both correctly
rounded). See ``__ray_entry__.oracle_sql()['events_hll_users']``.

The reference has no sketches (its closest shape is the exact grouped
`Counter` scans, /root/reference UGFraud/Utils/helper.py:261-268); this
is part of the training-data-pipeline surface the engine adds.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table

HLL_P = 12                      # 4096 registers: rel. std err ~1.04/sqrt(m) = 1.6%
HLL_M = 1 << HLL_P
_W_BITS = 64 - HLL_P            # suffix bits examined for the run length
_RHO_MAX = _W_BITS + 1          # rho for an all-zero suffix
# alpha_m * m^2 * 2^53 — the numerator of the raw estimate, one float
# constant shared verbatim (via repr) with the SQL oracle
HLL_ALPHA_NUM = (
    0.7213 / (1 + 1.079 / float(HLL_M)) * float(HLL_M) * float(HLL_M) * float(1 << _RHO_MAX)
)


def _md5_low64(values: list) -> np.ndarray:
    """First 8 md5 bytes, little-endian — DuckDB ``md5_number_upper``."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "little")
    return out


def _registers_partial(group_col: str, value_col: str):
    """Per-block partial: distinct (group, value) first (cuts md5 calls),
    then (group, register j, max rho). Output is <= |groups|·4096 rows
    whatever the block size — the pre-aggregate-before-merge pattern."""

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "grp": t[group_col].to_numpy(zero_copy_only=False),
                "v": t[value_col].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        hv = _md5_low64(df["v"].tolist())
        j = (hv & np.uint64(HLL_M - 1)).astype(np.int64)
        # suffix < 2^52 is exactly representable in float64, so the frexp
        # exponent IS the bit length — no per-item Python int loop
        w = (hv >> np.uint64(HLL_P)).astype(np.float64)
        rho = np.where(w > 0, _RHO_MAX - np.frexp(w)[1], _RHO_MAX).astype(np.int64)
        out = (
            pd.DataFrame({"grp": df["grp"].to_numpy(), "j": j, "rho": rho})
            .groupby(["grp", "j"], sort=False)["rho"]
            .max()
            .reset_index()
        )
        return pa.table(
            {
                "grp": pa.array(out["grp"]),
                "j": pa.array(out["j"].to_numpy(), pa.int64()),
                "rho": pa.array(out["rho"].to_numpy(), pa.int64()),
            }
        )

    return partial


def hll_estimate(nz: int, s_nonzero: int) -> float:
    """Estimate from (count of nonzero registers, exact integer sum of
    2^(RHO_MAX - rho) over them). Mirrors the SQL oracle op-for-op:
    raw = ALPHA_NUM / float(S); linear counting below 2.5·m; result
    rounded via floor(x·100 + 0.5)/100 (IEEE-identical both sides)."""
    s_total = s_nonzero + (HLL_M - nz) * (1 << _RHO_MAX)
    raw = HLL_ALPHA_NUM / float(s_total)
    zeros = HLL_M - nz
    est = float(HLL_M) * math.log(float(HLL_M) / float(zeros)) if (
        zeros > 0 and raw <= 2.5 * float(HLL_M)
    ) else raw
    return math.floor(est * 100.0 + 0.5) / 100.0


def hll_distinct_per_group(
    ds: "ray.data.Dataset", group_col: str = "event_type", value_col: str = "user_id"
) -> pa.Table:
    """(group, n_registers, s_hll, approx) — grouped approximate
    COUNT(DISTINCT value) via a 4096-register HyperLogLog per group.

    ``s_hll`` is float(S) of the exact integer register sum — the whole
    sketch state is checked by the oracle, not just the rounded
    estimate. Rows sorted by group for stable output.
    """
    parts = collect_table(
        ds.map_batches(_registers_partial(group_col, value_col), batch_format="pyarrow")
    )
    import pandas as pd

    if parts.num_rows == 0:
        return pa.table(
            {
                group_col: pa.array([], pa.string()),
                "n_registers": pa.array([], pa.int64()),
                "s_hll": pa.array([], pa.float64()),
                "approx": pa.array([], pa.float64()),
            }
        )
    merged = (
        parts.to_pandas()
        .groupby(["grp", "j"], sort=False)["rho"]
        .max()
        .reset_index()
    )
    groups, nzs, s_floats, ests = [], [], [], []
    for grp, sub in merged.groupby("grp", sort=True):
        rhos = sub["rho"].to_numpy()
        nz = int(len(rhos))
        s_nonzero = sum(1 << (_RHO_MAX - int(r)) for r in rhos)  # exact Python ints
        s_total = s_nonzero + (HLL_M - nz) * (1 << _RHO_MAX)
        groups.append(grp)
        nzs.append(nz)
        s_floats.append(float(s_total))
        ests.append(hll_estimate(nz, s_nonzero))
    return pa.table(
        {
            group_col: pa.array(groups),
            "n_registers": pa.array(nzs, pa.int64()),
            "s_hll": pa.array(s_floats, pa.float64()),
            "approx": pa.array(ests, pa.float64()),
        }
    )


def cms_heavy_hitters(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    d: int = 4,
    w: int = 2048,
    topk: int = 20,
) -> "ray.data.Dataset":
    """Count-min-sketch heavy hitters (Cormode & Muthukrishnan 2005):
    a d x w integer grid where row j buckets a key by md5-low64 of
    ``f"{j}-{key}"`` mod w (== DuckDB ``md5_number_upper(CAST(j AS
    VARCHAR) || '-' || CAST(key AS VARCHAR)) % w``), cells summed;
    estimate(key) = min over j of its d cells — never below the true
    count. Returns the exact top-`topk` keys (n DESC, key ASC) with
    (key, n_exact, n_cms): the one-sided CMS error is directly visible
    against the exact count, and the whole readout — hash, grid, min —
    replays bit-exactly in SQL (everything is integer).

    Scale shape: per-key counts from per-block ``np.unique`` partials +
    ONE groupby-sum (|keys|-sized, never event-sized; materialized once
    and reused by the grid pass and the top-k pass). The grid partials
    reduce to <= d*w rows per block whatever the block size and merge
    by Sum — commutative and associative, so safe under Ray's block
    arrival order — and the collected grid is d*w ints total: THE
    sketch is the state that would stream at 100 TB, the exact counts
    exist here only because the heavy-hitter readout wants ground
    truth next to the estimate. Top-k = per-block top-k partials +
    driver merge of <= topk rows per block (no global sort).
    """
    from ray.data.aggregate import Sum

    def key_partial(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, cnt = np.unique(k, return_counts=True)
        return pa.table(
            {key_col: pa.array(uk), "n": pa.array(cnt.astype(np.int64))}
        )

    counts = (
        events.select_columns([key_col])
        .map_batches(key_partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # |keys|-sized, reused by the grid + top-k passes
    )

    def cms_partial(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        js, bs, cs = [], [], []
        for j in range(d):
            h = _md5_low64([f"{j}-{v}" for v in k])
            b = (h % np.uint64(w)).astype(np.int64)
            grid = np.zeros(w, dtype=np.int64)
            np.add.at(grid, b, n)
            nz = np.flatnonzero(grid)
            js.append(np.full(len(nz), j, dtype=np.int64))
            bs.append(nz)
            cs.append(grid[nz])
        return pa.table(
            {
                "j": pa.array(np.concatenate(js) if js else np.zeros(0, np.int64)),
                "b": pa.array(np.concatenate(bs) if bs else np.zeros(0, np.int64)),
                "cell": pa.array(np.concatenate(cs) if cs else np.zeros(0, np.int64)),
            }
        )

    cells = collect_table(
        counts.map_batches(cms_partial, batch_format="pyarrow")
        .groupby(["j", "b"])
        .aggregate(Sum("cell", alias_name="cell"))
    )
    grid = np.zeros((d, w), dtype=np.int64)
    grid[
        cells["j"].to_numpy(zero_copy_only=False),
        cells["b"].to_numpy(zero_copy_only=False),
    ] = cells["cell"].to_numpy(zero_copy_only=False)

    def topk_partial(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = np.lexsort((k, -n))[:topk]
        return pa.table({key_col: pa.array(k[sel]), "n": pa.array(n[sel])})

    cand = collect_table(counts.map_batches(topk_partial, batch_format="pyarrow"))
    k = cand[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n = cand["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    sel = np.lexsort((k, -n))[:topk]
    k, n = k[sel], n[sel]

    est = np.empty(len(k), dtype=np.int64)
    for i, key in enumerate(k):
        cells_i = [
            grid[j, int(_md5_low64([f"{j}-{key}"])[0] % np.uint64(w))]
            for j in range(d)
        ]
        est[i] = min(cells_i)

    return ray.data.from_arrow(
        pa.table(
            {
                key_col: pa.array(k),
                "n_exact": pa.array(n),
                "n_cms": pa.array(est),
            }
        )
    )
