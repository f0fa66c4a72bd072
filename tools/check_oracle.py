"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` SQL via
DuckDB on the same sf dir, compares row count, column names, and
(column-name-sorted, row-sorted) values with a small float tolerance.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

import ray

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    errs = []
    if len(got) != len(want):
        errs.append(f"rowcount {len(got)} != {len(want)}")
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        errs.append(f"columns {gc} != {wc}")
        return errs
    g = got[gc].sort_values(gc).reset_index(drop=True)
    w = want[gc].sort_values(gc).reset_index(drop=True)
    if len(g) != len(w):
        return errs
    for c in gc:
        a, b = g[c].to_numpy(), w[c].to_numpy()
        if np.issubdtype(g[c].dtype, np.floating) or np.issubdtype(w[c].dtype, np.floating):
            if not np.allclose(a.astype(float), b.astype(float), rtol=1e-9, atol=1e-12):
                bad = np.flatnonzero(~np.isclose(a.astype(float), b.astype(float), rtol=1e-9, atol=1e-12))
                errs.append(f"col {c}: {len(bad)} mismatches, first at {bad[0]}: {a[bad[0]]} vs {b[bad[0]]}")
        else:
            if not (a == b).all():
                bad = np.flatnonzero(a != b)
                errs.append(f"col {c}: {len(bad)} mismatches, first at {bad[0]}: {a[bad[0]]} vs {b[bad[0]]}")
        if errs:
            # also check dtype family mismatch info
            pass
    if list(got.dtypes[sorted(got.columns)].astype(str)) != list(want.dtypes[sorted(want.columns)].astype(str)):
        errs.append(
            f"dtype note: got {dict(got.dtypes.astype(str))} vs oracle {dict(want.dtypes.astype(str))}"
        )
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, ignore_reinit_error=True)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray side raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(got)}, {dt:.1f}s)")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {type(e).__name__}: {e}")
            failures += 1
            continue
        errs = [e for e in compare(name, got, want) if not e.startswith("dtype note")]
        notes = [e for e in compare(name, got, want) if e.startswith("dtype note")]
        if errs:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(errs))
            failures += 1
        else:
            msg = f"OK   {name} rows={len(got)} ({dt:.1f}s)"
            if notes:
                msg += "  [" + notes[0] + "]"
            print(msg)
    return failures


if __name__ == "__main__":
    rc = main()
    ray.shutdown()
    sys.exit(1 if rc else 0)
