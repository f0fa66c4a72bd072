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

Scale shape: ≤ local_threshold edges the rounds run driver-local
(dense numpy passes over the collected pair table — the usual
shuffle-spin-up gate); above it the rounds run as ``MISProgram`` /
``ColoringProgram`` on the vid-sharded ``SuperstepEngine``
(state/engine.py): each shard owns its slice of the status/priority
state, the neighbor-min-priority pass is the engine's exact
``lexmin64`` combine (md5-low64 keys split into two 32-bit float64
columns, packed back to uint64 at the combine — bit-exact), and the
join-flag pass rides the same combine as min(1−joined). The driver
holds NO per-vertex arrays during the rounds (only the final
membership readout); both paths compute the identical fixpoint
(parity-tested).
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
    from ugfraud_ray.pipelines.sketches import _md5_low64

    return _md5_low64(list(range(n_vertices)))


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


_IDENT_F = float(0xFFFFFFFF)  # per-column lexmin64 identity


def _shard_prio(vids: np.ndarray, shard) -> tuple[np.ndarray, np.ndarray]:
    """(hi, lo) float64 halves of the uint64 priority for owned vids:
    from the layout's (prio_hi, prio_lo) vertex aux when present (callers
    with external ids write md5 of the ORIGINAL id there), else computed
    shard-locally as md5-low64(str(vid)) — no driver array either way."""
    t = getattr(shard, "_aux_table", None)
    if t is not None and "prio_hi" in t.column_names:
        return shard.vertex_aux("prio_hi"), shard.vertex_aux("prio_lo")
    from ugfraud_ray.pipelines.sketches import _md5_low64

    p = _md5_low64(vids.tolist())
    return (
        (p >> np.uint64(32)).astype(np.float64),
        (p & np.uint64(0xFFFFFFFF)).astype(np.float64),
    )


def _pack_u64(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    return (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)


class MISProgram:
    """Luby rounds as alternating supersteps on the lexmin64 combine.

    state = (status 0/1/2, prio_hi, prio_lo, joined_this_round); even
    supersteps aggregate the exact min priority key over undecided
    in-neighbors (decided srcs send the identity key, matching the
    local kernel's undecided-undecided edge filter), odd supersteps
    propagate join flags as min(1 − joined) (0 ⇔ some neighbor joined).
    delta = undecided count, so ``tol=0.0`` stops exactly when the
    local loop's ``not und.any()`` break fires."""

    state_dim = 4
    msg_dim = 2
    combine = "lexmin64"
    edge_cols: tuple = ()

    def __init__(self):
        self.step = 0

    def init_state(self, vids: np.ndarray, shard) -> np.ndarray:
        st = np.zeros((len(vids), 4), dtype=np.float64)
        st[:, 1], st[:, 2] = _shard_prio(vids, shard)
        return st

    def prepare_edges(self, edge_table, shard):
        return None

    def message(self, src_state: np.ndarray, edge_data, shard) -> np.ndarray:
        if self.step % 2 == 0:
            und = src_state[:, 0] == 0.0
            hi = np.where(und, src_state[:, 1], _IDENT_F)
            lo = np.where(und, src_state[:, 2], _IDENT_F)
            return np.column_stack([hi, lo])
        return np.column_stack(
            [1.0 - src_state[:, 3], np.zeros(len(src_state), dtype=np.float64)]
        )

    def apply(self, vids, old, agg, have_msg, aux, shard):
        new = old.copy()
        und = old[:, 0] == 0.0
        if self.step % 2 == 0:
            mykey = _pack_u64(old[:, 1], old[:, 2])
            aggkey = _pack_u64(agg[:, 0], agg[:, 1])
            joins = und & (mykey < aggkey)
            new[joins, 0] = 1.0
            new[:, 3] = joins.astype(np.float64)
            delta = float(und.sum())
        else:
            anyjoin = agg[:, 0] == 0.0
            excl = und & anyjoin
            new[excl, 0] = 2.0
            new[:, 3] = 0.0
            delta = float((new[:, 0] == 0.0).sum())
        self.step += 1
        return new, {"delta": delta}

    def init_stats(self, vids, state, shard) -> dict:
        return {}

    def reduce_stats(self, stats: list[dict]) -> dict:
        out: dict = {}
        for s in stats:
            for k_, v in s.items():
                out[k_] = out.get(k_, 0.0) + v
        return out


class ColoringProgram(MISProgram):
    """Jones–Plassmann layering: one superstep per round; undecided
    strict-local-minima take color = round index and leave the residual.
    state = (color or −1, prio_hi, prio_lo); delta = uncolored count."""

    state_dim = 3

    def init_state(self, vids: np.ndarray, shard) -> np.ndarray:
        st = np.zeros((len(vids), 3), dtype=np.float64)
        st[:, 0] = -1.0
        st[:, 1], st[:, 2] = _shard_prio(vids, shard)
        return st

    def message(self, src_state: np.ndarray, edge_data, shard) -> np.ndarray:
        unc = src_state[:, 0] < 0.0
        hi = np.where(unc, src_state[:, 1], _IDENT_F)
        lo = np.where(unc, src_state[:, 2], _IDENT_F)
        return np.column_stack([hi, lo])

    def apply(self, vids, old, agg, have_msg, aux, shard):
        new = old.copy()
        unc = old[:, 0] < 0.0
        mykey = _pack_u64(old[:, 1], old[:, 2])
        aggkey = _pack_u64(agg[:, 0], agg[:, 1])
        joins = unc & (mykey < aggkey)
        new[joins, 0] = float(self.step)
        self.step += 1
        return new, {"delta": float((new[:, 0] < 0.0).sum())}


def _engine_state(
    und_edges: "ray.data.Dataset",
    n_vertices: int,
    program,
    max_iters: int,
    priorities: np.ndarray | None,
    P: int,
    layout_dir: str | None,
) -> np.ndarray:
    """Run a lexmin64 program over the symmetrized layout; return the
    collected (n_vertices,) status/color column. The driver holds no
    per-vertex arrays during the rounds (priorities, when external, are
    written once into the layout's vertex-aux partition files)."""
    import tempfile

    from ugfraud_ray.state.engine import SuperstepEngine
    from ugfraud_ray.state.layout import build_layout, symmetrize

    sym = symmetrize(und_edges.select_columns(["src", "dst"])).materialize()
    va = None
    if priorities is not None:
        prio = np.asarray(priorities, dtype=np.uint64)
        va = ray.data.from_arrow(
            pa.table(
                {
                    "vid": pa.array(np.arange(n_vertices, dtype=np.int64)),
                    "prio_hi": pa.array((prio >> np.uint64(32)).astype(np.float64)),
                    "prio_lo": pa.array(
                        (prio & np.uint64(0xFFFFFFFF)).astype(np.float64)
                    ),
                }
            )
        ).materialize()
    layout = build_layout(
        sym,
        n_vertices,
        layout_dir or tempfile.mkdtemp(prefix="mis_"),
        P=P,
        vertex_aux=va,
    )
    eng = SuperstepEngine(layout, program)
    eng.run(max_iters=max_iters, tol=0.0)
    rt = collect_table(eng.result_dataset())
    eng.shutdown()
    out = np.zeros(n_vertices, dtype=np.float64)
    vid = rt["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
    out[vid] = rt["s0"].to_numpy(zero_copy_only=False)
    return out


def mis_members(
    edges: "ray.data.Dataset",
    n_vertices: int,
    max_iters: int = 30,
    approx_edges: int | None = None,
    priorities: np.ndarray | None = None,
    local_threshold: int = 5_000_000,
    P: int = 4,
    layout_dir: str | None = None,
) -> np.ndarray:
    """Boolean (n_vertices,) MIS membership mask over int-vid edges.

    priorities: optional uint64 (n_vertices,) total order; defaults to
    md5-low64(str(vid)). Callers with external ids pass md5 of the
    ORIGINAL id so the SQL replay needs no renumbering."""
    und_edges = _canonical_undirected(edges, approx_edges)

    if approx_edges is not None and approx_edges <= local_threshold:
        prio = vid_priorities(n_vertices) if priorities is None else priorities
        und = np.ones(n_vertices, dtype=bool)
        mis = np.zeros(n_vertices, dtype=bool)
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

    status = _engine_state(
        und_edges, n_vertices, MISProgram(), 2 * max_iters, priorities, P, layout_dir
    )
    return status == 1.0


def coloring(
    edges: "ray.data.Dataset",
    n_vertices: int,
    max_iters: int = 60,
    approx_edges: int | None = None,
    priorities: np.ndarray | None = None,
    local_threshold: int = 5_000_000,
    P: int = 4,
    layout_dir: str | None = None,
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

    if approx_edges is not None and approx_edges <= local_threshold:
        prio = vid_priorities(n_vertices) if priorities is None else priorities
        color = np.full(n_vertices, -1, dtype=np.int64)
        und = np.ones(n_vertices, dtype=bool)
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

    status = _engine_state(
        und_edges, n_vertices, ColoringProgram(), max_iters, priorities, P, layout_dir
    )
    return status.astype(np.int64)
