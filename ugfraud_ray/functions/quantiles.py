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
import pyarrow.compute as pc

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


def _grp_bins(v: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Per-row bin id via floor-division against each row's group range
    (lo/hi already gathered per row); clip handles v == hi and any
    float-rounding overshoot. Used identically in the histogram and
    refine passes so bin membership is consistent."""
    width = np.maximum(hi - lo, 1e-300)
    return np.clip(
        np.floor((v - lo) / width * _N_BINS).astype(np.int64), 0, _N_BINS - 1
    )


def grouped_exact_quantiles(
    ds: "ray.data.Dataset",
    key: str,
    col: str,
    qs: list[float],
    approx_rows: int | None = None,
) -> pa.Table:
    """(key, q, value) — exact floor((n_g−1)·q)-th ascending order
    statistic of ``col`` within every group of ``key``.

    Scale generalization of fBox's per-degree percentile thresholds
    (SURVEY §2.5 A4, /root/reference Detector/fBox.py:72-76): the same
    shared-histogram selection as :func:`exact_quantiles`, keyed by
    group — one per-group min/max/count aggregate (group count is
    assumed dimension-sized, ≤ ~100k), one histogram pass emitting
    (group, bin) partials, one refine pass collecting the union of
    candidate (group, bin) cells. Per-cell overflow past _REFINE_CAP
    recurses into the cell with a tightened range.
    """
    if approx_rows is not None and approx_rows <= _LOCAL_ROWS:
        t = collect_table(ds.select_columns([key, col]))
        return _grouped_local(t, key, col, qs)

    from ray.data.aggregate import Count, Max, Min

    stats = collect_table(
        ds.groupby(key).aggregate(
            Min(col, alias_name="lo"), Max(col, alias_name="hi"), Count(alias_name="n")
        )
    )
    keys = stats[key]
    glo = stats["lo"].to_numpy(zero_copy_only=False).astype(np.float64)
    ghi = stats["hi"].to_numpy(zero_copy_only=False).astype(np.float64)
    gn = stats["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_grp = len(gn)
    kmap_ref = ray.put((keys.combine_chunks(), glo, ghi))

    def gather(t: pa.Table):
        ks, lo_a, hi_a = ray.get(kmap_ref)
        gi = pc.index_in(t[key], value_set=ks).to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        return gi, v, _grp_bins(v, lo_a[gi], hi_a[gi])

    def hist_part(t: pa.Table) -> pa.Table:
        gi, _, b = gather(t)
        cell = gi * _N_BINS + b
        acc = np.bincount(cell, minlength=n_grp * _N_BINS).astype(np.int64)
        nz = np.flatnonzero(acc)
        return pa.table({"cell": pa.array(nz), "n": pa.array(acc[nz])})

    parts = collect_table(ds.map_batches(hist_part, batch_format="pyarrow"))
    hist = np.zeros(n_grp * _N_BINS, dtype=np.int64)
    np.add.at(hist, parts["cell"].to_numpy(zero_copy_only=False),
              parts["n"].to_numpy(zero_copy_only=False))
    hist = hist.reshape(n_grp, _N_BINS)
    cum = np.cumsum(hist, axis=1)

    # locate the candidate cell for every (group, q)
    targets: list[tuple[int, float, int, int, int]] = []  # (g, q, rank, bin, below)
    for g in range(n_grp):
        for q in qs:
            r = int(np.floor((gn[g] - 1) * q))
            b = int(np.searchsorted(cum[g], r, side="right"))
            below = int(cum[g, b - 1]) if b > 0 else 0
            targets.append((g, q, r, b, below))
    light = {(g, b) for g, _, _, b, _ in targets if hist[g, b] <= _REFINE_CAP}

    by_cell: dict[tuple[int, int], np.ndarray] = {}
    if light:
        cells = np.array(sorted(g * _N_BINS + b for g, b in light), dtype=np.int64)
        cells_ref = ray.put(cells)

        def keep(t: pa.Table) -> pa.Table:
            gi, _, b = gather(t)
            return t.filter(pa.array(np.isin(gi * _N_BINS + b, ray.get(cells_ref))))

        sub = collect_table(ds.map_batches(keep, batch_format="pyarrow"))
        gi, v, b = gather(sub)
        cell = gi * _N_BINS + b
        order = np.lexsort((v, cell))
        v, cell = v[order], cell[order]
        starts = np.searchsorted(cell, cells, side="left")
        ends = np.searchsorted(cell, cells, side="right")
        for c, s, e in zip(cells, starts, ends):
            by_cell[(int(c) // _N_BINS, int(c) % _N_BINS)] = v[s:e]

    out_k, out_q, out_v = [], [], []
    for g, q, r, b, below in targets:
        if glo[g] == ghi[g]:
            val = glo[g]
        elif (g, b) in by_cell:
            val = _pick_from_sorted(by_cell[(g, b)], r - below)
        else:
            # heavy cell: filter to this one group's cell and recurse
            # with the ungrouped machinery on the tightened range
            w = (ghi[g] - glo[g]) / _N_BINS
            b_lo, b_hi = glo[g] + b * w, glo[g] + (b + 1) * w
            sub = _grp_bin_filter(
                ds, key, keys[g], col, glo[g], ghi[g], b
            ).materialize()
            val = _refine_heavy(sub, col, float(b_lo), float(b_hi), r - below)
        out_k.append(keys[g].as_py())
        out_q.append(q)
        out_v.append(val)
    return pa.table(
        {key: pa.array(out_k), "q": pa.array(out_q, pa.float64()),
         "value": pa.array(out_v, pa.float64())}
    )


def _grp_bin_filter(ds, key: str, key_value, col: str, lo: float, hi: float, b: int):
    kv = key_value.as_py()

    def keep(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        bb = _grp_bins(v, np.float64(lo), np.float64(hi))
        in_key = pc.equal(t[key], kv).to_numpy(zero_copy_only=False)
        return t.filter(pa.array((bb == b) & in_key))

    return ds.map_batches(keep, batch_format="pyarrow")


def _grouped_local(t: pa.Table, key: str, col: str, qs: list[float]) -> pa.Table:
    v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
    ki = pc.index_in(t[key], value_set=pc.unique(t[key].combine_chunks()))
    gi = ki.to_numpy(zero_copy_only=False).astype(np.int64)
    uk = pc.unique(t[key].combine_chunks())
    order = np.lexsort((v, gi))
    v, gi = v[order], gi[order]
    starts = np.searchsorted(gi, np.arange(len(uk)), side="left")
    ends = np.searchsorted(gi, np.arange(len(uk)), side="right")
    out_k, out_q, out_v = [], [], []
    for g in range(len(uk)):
        seg = v[starts[g]:ends[g]]
        for q in qs:
            out_k.append(uk[g].as_py())
            out_q.append(q)
            out_v.append(float(seg[int(np.floor((seg.size - 1) * q))]))
    return pa.table(
        {key: pa.array(out_k), "q": pa.array(out_q, pa.float64()),
         "value": pa.array(out_v, pa.float64())}
    )


def exact_rank(
    ds: "ray.data.Dataset",
    col: str,
    rank: int,
    n: int,
    approx_rows: int | None = None,
) -> float:
    """Exact 0-based ASCENDING order statistic ``rank`` of ``col``,
    given the caller-known total row count ``n`` (0 <= rank < n).

    Rides :func:`exact_quantiles` by inverting its rank rule
    floor((n-1)·q): q = (rank+0.5)/(n-1) lands floor((n-1)·q) on
    ``rank`` exactly — the float64 product carries |err| ≈ rank·2e-16,
    far below the 0.5 offset, for any n a dataset can hold.
    """
    if n <= 0:
        return float("nan")
    if not 0 <= rank < n:
        raise ValueError(f"rank {rank} outside [0, {n})")
    q = 0.0 if n == 1 else (rank + 0.5) / (n - 1)
    ((_, val),) = exact_quantiles(ds, col, [q], approx_rows=approx_rows)
    return val


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
