"""Subset betweenness centrality (radius-bounded Brandes).

Exact Brandes (2001) dependency accumulation from a deterministic
SOURCE SUBSET, horizon-bounded at ``radius`` hops — the standard
scalable betweenness estimate on web graphs (pivot sampling à la
Bader–Kintali, with hash-picked pivots instead of random ones so every
run and the SQL oracle replay the same computation). Reference analog:
SpEagle's `local_schedule` bounded-ball exploration
(/root/reference/Detector/SpEagle.py:339-379) is the same
source-subset frontier expansion; Brandes adds the shortest-path-count
(sigma) and dependency (delta) channels.

    forward, level r:   sigma_r(v) = Σ_{u→v, d(u)=r−1} sigma(u)
    backward, level r:  delta(u)  += Σ_{u→v, d(v)=r}  sigma(u)/sigma(v) · (1+delta(v))
    bc(v) = Σ_{s ∈ S, s ≠ v} delta_s(v)

Scale shape: state is dense (n, |S|) matrices (dist int16, sigma
int64, delta float64) — the same driver-resident dense-block pattern
as `pipelines/hyperball.py`; one round = per-edge-block ``np.add.at``
partials tree-summed by Ray tasks, 2·radius rounds total. |S| is the
batching knob: at web scale sources are processed in fixed-width
batches (the matrices shard by source column with NO cross-column
coupling), so memory is n·batch·24 bytes regardless of |S|.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


@ray.remote
def _fwd_block(t, sigma: np.ndarray, active: np.ndarray):
    """Per-block forward partial: Σ sigma(src) into dst for edges whose
    src is on the current frontier (active)."""
    n, S = sigma.shape
    out = np.zeros((n, S), dtype=np.int64)
    if isinstance(t, pa.Table) and t.num_rows > 0:
        a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        np.add.at(out, b, sigma[a] * active[a])
    return out


@ray.remote
def _bwd_block(t, sigma: np.ndarray, coef: np.ndarray, at_prev: np.ndarray):
    """Per-block backward partial: Σ sigma(src)/sigma(dst)·(1+delta(dst))
    into src, for edges src(level r−1) → dst(level r); coef already
    encodes (1+delta)/sigma masked to level r."""
    n, S = sigma.shape
    out = np.zeros((n, S), dtype=np.float64)
    if isinstance(t, pa.Table) and t.num_rows > 0:
        a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        np.add.at(out, a, sigma[a] * coef[b] * at_prev[a])
    return out


@ray.remote
def _sum_blocks(*parts: np.ndarray) -> np.ndarray:
    out = parts[0].copy()
    for p in parts[1:]:
        out += p
    return out


def _tree_sum(refs):
    while len(refs) > 1:
        refs = [_sum_blocks.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
    return ray.get(refs[0]) if refs else None


def betweenness_subset(
    edges: "ray.data.Dataset",
    n_vertices: int,
    sources: np.ndarray,
    radius: int = 4,
    local_threshold: int = 5_000_000,
    approx_edges: int | None = None,
) -> pa.Table:
    """bc(v) = Σ_{s∈sources, s≠v} delta_s(v) over shortest paths of
    length ≤ radius on the DIRECTED vid-domain edge table. Returns
    (vid, betweenness) for all n_vertices, ascending vid."""
    n = n_vertices
    S = len(sources)
    src_cols = np.asarray(sources, dtype=np.int64)
    dist = np.full((n, S), -1, dtype=np.int16)
    sigma = np.zeros((n, S), dtype=np.int64)
    dist[src_cols, np.arange(S)] = 0
    sigma[src_cols, np.arange(S)] = 1

    local = approx_edges is not None and approx_edges <= local_threshold
    if local:
        from ugfraud_ray.functions.collect import collect_table

        t = collect_table(edges.select_columns(["src", "dst"]))
        a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        blocks = None
    else:
        blocks = edges.select_columns(["src", "dst"]).materialize().to_arrow_refs()

    # forward: levels 1..radius
    for r in range(1, radius + 1):
        active = dist == (r - 1)
        if local:
            acc = np.zeros((n, S), dtype=np.int64)
            np.add.at(acc, b, sigma[a] * active[a])
        else:
            sig_ref, act_ref = ray.put(sigma), ray.put(active)
            acc = _tree_sum([_fwd_block.remote(bk, sig_ref, act_ref) for bk in blocks])
            if acc is None:
                acc = np.zeros((n, S), dtype=np.int64)
        newly = (acc > 0) & (dist == -1)
        dist[newly] = r
        sigma[newly] = acc[newly]

    # backward: levels radius..1 (delta starts all-zero)
    delta = np.zeros((n, S), dtype=np.float64)
    sig_safe = np.where(sigma > 0, sigma, 1).astype(np.float64)
    for r in range(radius, 0, -1):
        coef = np.where(dist == r, (1.0 + delta) / sig_safe, 0.0)
        at_prev = dist == (r - 1)
        if local:
            dacc = np.zeros((n, S), dtype=np.float64)
            np.add.at(dacc, a, sigma[a] * coef[b] * at_prev[a])
        else:
            sig_ref = ray.put(sigma.astype(np.float64))
            coef_ref, prev_ref = ray.put(coef), ray.put(at_prev)
            dacc = _tree_sum(
                [_bwd_block.remote(bk, sig_ref, coef_ref, prev_ref) for bk in blocks]
            )
            if dacc is None:
                dacc = np.zeros((n, S), dtype=np.float64)
        delta = delta + dacc

    # readout: exclude the source's own column (Brandes sums s != v)
    delta[src_cols, np.arange(S)] = 0.0
    bc = delta.sum(axis=1)
    return pa.table(
        {
            "vid": pa.array(np.arange(n, dtype=np.int64)),
            "betweenness": pa.array(bc),
        }
    )
