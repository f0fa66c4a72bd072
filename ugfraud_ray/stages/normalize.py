"""M7/M8 — score normalization (scale_value, nor_priors).

Reference: Utils/helper.py:66-115. `scale_value` there has a confirmed
for/else bug (SURVEY §2.11 B1): only entries whose min-max-normalized
value is exactly 0 or 1 survive, plus the final iterated key. We expose

- ``scale_value_reference(d)`` — bit-for-bit replication of the buggy
  semantics (conformance mode, driver-side; score dicts are per-vertex,
  small relative to edges),
- ``scale_value(d)`` — the intended math (all keys, clamped to
  (1e-7, 1-1e-7)),
- ``scale_value_ds(ds, col)`` — the distributed intended version:
  2-pass global min/max aggregate then a vectorized map_batches
  normalize (no driver materialization).

``nor_priors`` (helper.py:89-115) min-max-normalizes the three prior
dicts and returns the "means" — actually the element at index len/2 of
the *descending* sort (B7); we reproduce that definition exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Max, Min


def _desc_stats(d: dict) -> tuple[float, float, float]:
    vals = sorted(d.values(), reverse=True)
    return vals[0], vals[int(len(vals) / 2)], vals[-1]


def scale_value_reference(value_dict: dict) -> dict:
    """Replicates helper.py:66-86 including the for/else truncation bug."""
    vmax, _, vmin = _desc_stats(value_dict)
    scale_dict: dict = {}
    last_key = None
    last_norm = None
    for k, p in value_dict.items():
        norm = (p - vmin) / (vmax - vmin)
        if norm == 0:
            scale_dict[k] = 1e-7
        elif norm == 1:
            scale_dict[k] = 1 - 1e-7
        last_key, last_norm = k, norm
    if last_key is not None:  # the stray `else` body (helper.py:83-84)
        scale_dict[last_key] = last_norm
    return scale_dict


def scale_value(value_dict: dict) -> dict:
    """The intended min-max normalization to (0,1) with 1e-7 clamps."""
    vmax, _, vmin = _desc_stats(value_dict)
    out = {}
    for k, p in value_dict.items():
        norm = (p - vmin) / (vmax - vmin)
        if norm == 0:
            norm = 1e-7
        elif norm == 1:
            norm = 1 - 1e-7
        out[k] = norm
    return out


def scale_value_ds(
    ds: "ray.data.Dataset", col: str = "score", out_col: str | None = None
) -> "ray.data.Dataset":
    """Distributed intended-mode scale_value: global min/max then normalize."""
    out_col = out_col or col
    stats = ds.aggregate(Min(col, alias_name="mn"), Max(col, alias_name="mx"))
    mn, mx = float(stats["mn"]), float(stats["mx"])
    span = mx - mn

    def norm(t: pa.Table) -> pa.Table:
        v = (t[col].to_numpy(zero_copy_only=False) - mn) / span
        v = np.where(v == 0, 1e-7, np.where(v == 1, 1 - 1e-7, v))
        arr = pa.array(v, pa.float64())
        if out_col == col:
            return t.set_column(t.schema.get_field_index(col), col, arr)
        return t.append_column(out_col, arr)

    return ds.map_batches(norm, batch_format="pyarrow")


def nor_priors(priors: list[dict]) -> tuple[list[dict], list[float]]:
    """helper.py:89-115 — normalize [u, r, p] prior dicts; return medians."""
    u, r, p = priors
    u_max, u_mean, u_min = _desc_stats(u)
    r_max, r_mean, r_min = _desc_stats(r)
    p_max, p_mean, p_min = _desc_stats(p)
    u2 = {k: (v - u_min) / (u_max - u_min) for k, v in u.items()}
    r2 = {k: (v - r_min) / (r_max - r_min) for k, v in r.items()}
    p2 = {k: (v - p_min) / (p_max - p_min) for k, v in p.items()}
    return [u2, r2, p2], [u_mean, r_mean, p_mean]
