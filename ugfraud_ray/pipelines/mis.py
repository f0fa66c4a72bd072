"""Maximal independent set via deterministic Luby rounds.

No direct reference implementation (a §2.12-style standard kernel, like
k-core); the closest analog is SpEagle's independent-set-shaped residual
schedule (/root/reference Detector/SpEagle.py:339-379 picks BFS roots
greedily by degree) — MIS is the order-free parallel version: every
round ALL local priority-minima join at once, so rounds are Jacobi
supersteps. In a web corpus an MIS over the co-citation graph is the
classic "pick one representative per densely-linked cluster" primitive.

Semantics (pinned so the SQL oracle replays them exactly):
- graph = canonical undirected simple graph (directed edges collapse to
  deduped (min,max) pairs; self-loops dropped upstream);
- priority(v) = md5-low64(str(vid)) — the engine's shared md5 convention
  (`pipelines/sketches._md5_low64` == DuckDB ``md5_number_upper``),
  compared as exact uint64 on both sides;
- round i over undecided vertices U_i:
    J_i = {v in U_i : prio(v) < min prio of v's undecided neighbors}
          (vertices with no undecided neighbor join unconditionally)
    X_i = {v in U_i \\ J_i : some neighbor in J_i}
  MIS += J_i; U_{i+1} = U_i \\ (J_i ∪ X_i). Strict-min priorities make
  J_i independent; every neighbor of a join is excluded the same round,
  so no undecided vertex ever has an MIS neighbor at round start.
- stop at the first empty-or-unchanged U (post-hoc count-stable stop,
  the kcore/GANG replay pattern) or ``max_iters``.

Scale shape: two dense edge passes per round (neighbor-min priority
over undecided-undecided edges, then join-flag propagation), each as
per-block partials + 8-way tree reduce (min / or) — per-vertex hash
aggregates are the measured many-groups slow path. The status and
priority arrays broadcast once per round via ray.put. Same
driver-holds-(n,)-arrays assumption as dense_degrees; beyond ~10^9
vertices switch to vid-range-bucketed partials.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table
from ugfraud_ray.pipelines.kcore import _canonical_undirected

_U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def vid_priorities(n_vertices: int) -> np.ndarray:
    """uint64 md5-low64 priority per vid (== DuckDB md5_number_upper)."""
    out = np.empty(n_vertices, dtype=np.uint64)
    for v in range(n_vertices):
        out[v] = int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "little")
    return out


def _round_local(a, b, und, prio):
    """One Luby round on local edge arrays -> (joins, excluded) masks."""
    n = len(und)
    both = und[a] & und[b]
    mn = np.full(n, _U64MAX, dtype=np.uint64)
    np.minimum.at(mn, a[both], prio[b[both]])
    np.minimum.at(mn, b[both], prio[a[both]])
    joins = und & (prio < mn)
    excl = np.zeros(n, dtype=bool)
    ja = joins[a] & und[b]
    jb = joins[b] & und[a]
    excl[b[ja]] = True
    excl[a[jb]] = True
    excl &= und & ~joins
    return joins, excl


@ray.remote
def _nbrmin_block(t, und: np.ndarray, prio: np.ndarray, n: int) -> np.ndarray:
    if isinstance(t, pa.Table):
        if t.num_rows == 0:
            return np.full(n, _U64MAX, dtype=np.uint64)
        a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        if len(t) == 0 or "src" not in getattr(t, "columns", []):
            return np.full(n, _U64MAX, dtype=np.uint64)
        a = np.asarray(t["src"]).astype(np.int64)
        b = np.asarray(t["dst"]).astype(np.int64)
    both = und[a] & und[b]
    mn = np.full(n, _U64MAX, dtype=np.uint64)
    np.minimum.at(mn, a[both], prio[b[both]])
    np.minimum.at(mn, b[both], prio[a[both]])
    return mn


@ray.remote
def _min_blocks(*parts: np.ndarray) -> np.ndarray:
    out = parts[0].copy()
    for p in parts[1:]:
        np.minimum(out, p, out=out)
    return out


@ray.remote
def _joinnbr_block(t, joins: np.ndarray, und: np.ndarray, n: int) -> np.ndarray:
    if isinstance(t, pa.Table):
        if t.num_rows == 0:
            return np.zeros(n, dtype=bool)
        a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        if len(t) == 0 or "src" not in getattr(t, "columns", []):
            return np.zeros(n, dtype=bool)
        a = np.asarray(t["src"]).astype(np.int64)
        b = np.asarray(t["dst"]).astype(np.int64)
    excl = np.zeros(n, dtype=bool)
    ja = joins[a] & und[b]
    jb = joins[b] & und[a]
    excl[b[ja]] = True
    excl[a[jb]] = True
    return excl


@ray.remote
def _or_blocks(*parts: np.ndarray) -> np.ndarray:
    out = parts[0].copy()
    for p in parts[1:]:
        out |= p
    return out


def _tree(refs, combine):
    while len(refs) > 1:
        refs = [combine.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
    return refs


def mis_members(
    edges: "ray.data.Dataset",
    n_vertices: int,
    max_iters: int = 30,
    approx_edges: int | None = None,
    priorities: np.ndarray | None = None,
) -> np.ndarray:
    """Boolean (n_vertices,) MIS membership mask over int-vid edges.

    priorities: optional uint64 (n_vertices,) total order; defaults to
    md5-low64(str(vid)). Callers with external ids pass md5 of the
    ORIGINAL id so the SQL replay needs no renumbering."""
    und_edges = _canonical_undirected(edges, approx_edges)
    prio = vid_priorities(n_vertices) if priorities is None else priorities
    und = np.ones(n_vertices, dtype=bool)
    mis = np.zeros(n_vertices, dtype=bool)

    if approx_edges is not None and approx_edges <= 5_000_000:
        t = collect_table(und_edges)
        a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        for _ in range(max_iters):
            if not und.any():
                break
            joins, excl = _round_local(a, b, und, prio)
            mis |= joins
            und &= ~(joins | excl)
        return mis

    blocks = und_edges.materialize().to_arrow_refs()
    prio_ref = ray.put(prio)
    for _ in range(max_iters):
        if not und.any():
            break
        und_ref = ray.put(und)
        refs = _tree(
            [_nbrmin_block.remote(bk, und_ref, prio_ref, n_vertices) for bk in blocks],
            _min_blocks,
        )
        mn = ray.get(refs[0]) if refs else np.full(n_vertices, _U64MAX, dtype=np.uint64)
        joins = und & (prio < mn)
        joins_ref = ray.put(joins)
        refs = _tree(
            [_joinnbr_block.remote(bk, joins_ref, und_ref, n_vertices) for bk in blocks],
            _or_blocks,
        )
        nbr = ray.get(refs[0]) if refs else np.zeros(n_vertices, dtype=bool)
        excl = und & ~joins & nbr
        mis |= joins
        und &= ~(joins | excl)
    return mis


def coloring(
    edges: "ray.data.Dataset",
    n_vertices: int,
    max_iters: int = 60,
    approx_edges: int | None = None,
    priorities: np.ndarray | None = None,
) -> np.ndarray:
    """Greedy distributed graph coloring by MIS layering: round r colors
    every uncolored vertex whose md5 priority is a strict local minimum
    among UNCOLORED neighbors with color r (Jones–Plassmann with
    round-index colors). Within a round the colored set is independent,
    and colored vertices leave the residual graph, so the result is a
    proper coloring; expected round count is O(log n) for hash
    priorities. Returns int64 (n_vertices,) colors (0-based; -1 only if
    ``max_iters`` was hit before the residual emptied — callers treat
    that as non-convergence).

    Same monotone-status shape as ``mis_members`` (colors assign once),
    so the SQL oracle replays a fixed round count with no stop CTE; the
    same two dense tree-reduced edge passes per round, minus the
    exclusion pass (only joins leave the residual).
    """
    und_edges = _canonical_undirected(edges, approx_edges)
    prio = vid_priorities(n_vertices) if priorities is None else priorities
    color = np.full(n_vertices, -1, dtype=np.int64)
    und = np.ones(n_vertices, dtype=bool)

    if approx_edges is not None and approx_edges <= 5_000_000:
        t = collect_table(und_edges)
        a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        for r in range(max_iters):
            if not und.any():
                break
            both = und[a] & und[b]
            mn = np.full(n_vertices, _U64MAX, dtype=np.uint64)
            np.minimum.at(mn, a[both], prio[b[both]])
            np.minimum.at(mn, b[both], prio[a[both]])
            joins = und & (prio < mn)
            color[joins] = r
            und &= ~joins
        return color

    blocks = und_edges.materialize().to_arrow_refs()
    prio_ref = ray.put(prio)
    for r in range(max_iters):
        if not und.any():
            break
        und_ref = ray.put(und)
        refs = _tree(
            [_nbrmin_block.remote(bk, und_ref, prio_ref, n_vertices) for bk in blocks],
            _min_blocks,
        )
        mn = ray.get(refs[0]) if refs else np.full(n_vertices, _U64MAX, dtype=np.uint64)
        joins = und & (prio < mn)
        color[joins] = r
        und &= ~joins
    return color
