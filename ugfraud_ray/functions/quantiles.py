"""Exact distributed order statistics (quantiles) over a numeric column.

No reference analog beyond driver-side median picks (SURVEY §2.5 A3,
`Utils/helper.py:74,105-107`); this is the scale generalization: exact
kth-order-statistic selection that never materializes or sorts the
full column.

Three streaming passes at any scale, SHARED across all requested
quantiles:

1. min/max/count aggregate.
2. histogram pass — every block bins its values against shared edges
   and emits ONE (n_bins,) count-vector row; the driver sums the tiny
   partials and locates the one bin per requested rank.
3. refine pass — ONE filter collects only values inside the union of
   candidate bins (expected n/n_bins per bin); each quantile is the
   exact order statistic inside its bin's sorted values. A
   pathologically heavy bin (> _REFINE_CAP values, i.e. massive
   duplication in a narrow range) is recursed into with fresh edges
   before collecting, bounded by a depth guard for the all-one-value
   degenerate case.

Rank definition: rank_q = floor((n-1)·q), 0-based among ascending
values — stated explicitly so a SQL oracle can replay it with
ROW_NUMBER instead of relying on any engine's quantile flavor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table

_N_BINS = 4096
_REFINE_CAP = 4_000_000  # max values collected per bin in the refine pass
_MAX_DEPTH = 8  # 4096^8 range shrink ≈ float64 resolution
_LOCAL_ROWS = 4_000_000  # caller-hinted small inputs sort on the driver


def _bin_indices(values: np.ndarray, interior_edges: np.ndarray) -> np.ndarray:
    """Bin ids via searchsorted-right on the n_bins-1 interior edges:
    values == an edge land in the higher bin, values == hi in the last."""
    return np.searchsorted(interior_edges, values, side="right")


def _histogram(ds: "ray.data.Dataset", col: str, lo: float, hi: float) -> np.ndarray:
    """(n_bins,) counts of col over [lo, hi] (caller guarantees range)."""
    interior = np.linspace(lo, hi, _N_BINS + 1)[1:-1]
    e_ref = ray.put(interior)

    def part(t: pa.Table) -> pa.Table:
        e = ray.get(e_ref)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        counts = np.bincount(_bin_indices(v, e), minlength=_N_BINS).astype(np.int64)
        return pa.table({"bin": pa.array(np.arange(_N_BINS)), "n": pa.array(counts)})

    parts = collect_table(ds.map_batches(part, batch_format="pyarrow"))
    out = np.zeros(_N_BINS, dtype=np.int64)
    np.add.at(out, parts["bin"].to_numpy(zero_copy_only=False),
              parts["n"].to_numpy(zero_copy_only=False))
    return out


def _bin_filter(ds: "ray.data.Dataset", col: str, lo: float, hi: float,
                wanted_bins: set[int]) -> "ray.data.Dataset":
    """Rows whose bin id (same binning as _histogram) is in wanted_bins."""
    interior = np.linspace(lo, hi, _N_BINS + 1)[1:-1]
    payload_ref = ray.put((interior, np.array(sorted(wanted_bins), dtype=np.int64)))

    def keep(t: pa.Table) -> pa.Table:
        e, bins = ray.get(payload_ref)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.filter(pa.array(np.isin(_bin_indices(v, e), bins)))

    return ds.map_batches(keep, batch_format="pyarrow")


def _pick_from_sorted(arr: np.ndarray, within_rank: int) -> float:
    return float(arr[within_rank])


def _refine_heavy(ds: "ray.data.Dataset", col: str, lo: float, hi: float,
                  rank: int, depth: int = 0) -> float:
    """Exact order statistic `rank` (0-based) within ds's values in one
    heavy bin range [lo, hi); shrinks the range recursively."""
    if lo == hi or depth >= _MAX_DEPTH:
        vals = collect_table(ds.select_columns([col]))
        arr = np.sort(vals[col].to_numpy(zero_copy_only=False).astype(np.float64))
        return _pick_from_sorted(arr, rank)
    hist = _histogram(ds, col, lo, hi)
    cum = np.cumsum(hist)
    b = int(np.searchsorted(cum, rank, side="right"))
    below = int(cum[b - 1]) if b > 0 else 0
    edges = np.linspace(lo, hi, _N_BINS + 1)
    sub = _bin_filter(ds, col, lo, hi, {b}).materialize()
    if hist[b] > _REFINE_CAP:
        return _refine_heavy(sub, col, float(edges[b]), float(edges[b + 1]),
                             rank - below, depth + 1)
    vals = collect_table(sub.select_columns([col]))
    arr = np.sort(vals[col].to_numpy(zero_copy_only=False).astype(np.float64))
    return _pick_from_sorted(arr, rank - below)


def exact_quantiles(
    ds: "ray.data.Dataset",
    col: str,
    qs: list[float],
    approx_rows: int | None = None,
) -> list[tuple[float, float]]:
    """[(q, value)] — exact floor((n-1)·q)-th ascending order statistics.

    ``approx_rows`` is the caller-known row-count hint gating the
    driver-local sort fast path (same convention as dedup_pairs et al.,
    see ray-perf notes: sub-million-row inputs shouldn't pay
    distributed-pass spin-up).
    """
    if approx_rows is not None and approx_rows <= _LOCAL_ROWS:
        vals = collect_table(ds.select_columns([col]))
        arr = np.sort(vals[col].to_numpy(zero_copy_only=False).astype(np.float64))
        n = arr.size
        if n == 0:
            return [(q, float("nan")) for q in qs]
        return [(q, float(arr[int(np.floor((n - 1) * q))])) for q in qs]

    stats = ds.aggregate(
        ray.data.aggregate.Min(col, alias_name="lo"),
        ray.data.aggregate.Max(col, alias_name="hi"),
        ray.data.aggregate.Count(alias_name="n"),
    )
    n = int(stats["n"])
    if n == 0 or stats["lo"] is None:
        return [(q, float("nan")) for q in qs]
    lo, hi = float(stats["lo"]), float(stats["hi"])
    if lo == hi:
        return [(q, lo) for q in qs]
    ranks = {q: int(np.floor((n - 1) * q)) for q in qs}

    # one histogram pass shared by every quantile
    hist = _histogram(ds, col, lo, hi)
    cum = np.cumsum(hist)
    edges = np.linspace(lo, hi, _N_BINS + 1)
    bin_of = {q: int(np.searchsorted(cum, r, side="right")) for q, r in ranks.items()}
    light = {b for b in set(bin_of.values()) if hist[b] <= _REFINE_CAP}

    # one refine pass collecting every light candidate bin together
    by_bin: dict[int, np.ndarray] = {}
    if light:
        sub = _bin_filter(ds, col, lo, hi, light)
        t = collect_table(sub)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = _bin_indices(v, edges[1:-1])
        order = np.lexsort((v, idx))
        v, idx = v[order], idx[order]
        starts = np.searchsorted(idx, sorted(light), side="left")
        ends = np.searchsorted(idx, sorted(light), side="right")
        for b, s, e in zip(sorted(light), starts, ends):
            by_bin[b] = v[s:e]

    out: list[tuple[float, float]] = []
    for q in qs:
        r, b = ranks[q], bin_of[q]
        below = int(cum[b - 1]) if b > 0 else 0
        if b in by_bin:
            out.append((q, _pick_from_sorted(by_bin[b], r - below)))
        else:
            sub = _bin_filter(ds, col, lo, hi, {b}).materialize()
            out.append((q, _refine_heavy(sub, col, float(edges[b]),
                                         float(edges[b + 1]), r - below)))
    return out
