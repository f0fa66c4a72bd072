"""Greedy maximal matching via deterministic handshake rounds.

A §2.12-class standard kernel alongside MIS and Jones-Plassmann
coloring (no reference analog; the closest is FRAUDAR's greedy peel
order, /root/reference Detector/Fraudar/greedy.py — matching is the
order-free parallel sibling). On a web graph a maximal matching is the
classic coarsening primitive (pair densely-linked pages, contract,
recurse — the multilevel-partitioning shape).

Semantics (pinned so the SQL oracle replays them exactly):
- graph = canonical undirected simple graph;
- round i over ACTIVE vertices A_i (everyone starts active; isolated
  vertices deactivate in round 1):
    m(v)   = MIN vid over v's active neighbors (NULL if none)
    v is "done" (status 2) if m(v) is NULL;
    v proposes to m(v); v MATCHES u (status 1, partner u) iff
    minProposer(v) == m(v), where minProposer(v) = MIN vid over active
    neighbors u with m(u) = v.  (Any proposer to v is an active
    neighbor, hence >= m(v); so the min proposer equals m(v) exactly
    when m(v) proposed back — the handshake needs only MIN combines.)
  Both endpoints of a handshake detect it symmetrically in the same
  round; statuses are monotone (0 -> 1|2), and the global-minimum
  active vid always matches or deactivates, so rounds terminate.

Scale shape: below the edge gate the rounds run driver-local (numpy
passes over the collected pair table); above it ``MatchingProgram``
runs on the vid-sharded SuperstepEngine — two supersteps per round on
the exact lexmin64 combine (phase A: min active-neighbor vid; phase B:
min proposer vid routed ONLY along each proposer's chosen edge via the
per-edge dst channel), no driver per-vertex arrays during the rounds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table
from ugfraud_ray.pipelines.kcore import _canonical_undirected

_INF = np.int64(1 << 62)
_IDENT_F = float(0xFFFFFFFF)


def _matching_local(a: np.ndarray, b: np.ndarray, n: int, max_rounds: int) -> np.ndarray:
    """(n,) partner array (-1 unmatched) via local handshake rounds."""
    partner = np.full(n, -1, dtype=np.int64)
    active = np.zeros(n, dtype=bool)
    active[a] = True
    active[b] = True
    for _ in range(max_rounds):
        if not active.any():
            break
        both = active[a] & active[b]
        m = np.full(n, _INF, dtype=np.int64)
        np.minimum.at(m, a[both], b[both])
        np.minimum.at(m, b[both], a[both])
        no_nb = active & (m == _INF)
        # min proposer per vertex: active u with m(u) == v
        mp = np.full(n, _INF, dtype=np.int64)
        ua, va_ = a[both], b[both]
        fwd = m[ua] == va_
        np.minimum.at(mp, va_[fwd], ua[fwd])
        bwd = m[va_] == ua
        np.minimum.at(mp, ua[bwd], va_[bwd])
        matched = active & (m < _INF) & (mp == m)
        if not (matched.any() or no_nb.any()):
            break  # pragma: no cover - handshake always progresses
        partner[matched] = m[matched]
        active &= ~(matched | no_nb)
    return partner


class MatchingProgram:
    """Handshake rounds as alternating supersteps (lexmin64 combine).

    state = (status 0/1/2, partner, proposal, myvid); even supersteps
    aggregate the min active-neighbor vid, odd supersteps aggregate the
    min proposer vid (each active src emits its vid ONLY along the edge
    to its proposal — the per-edge dst channel masks the rest to the
    identity). delta = active count, so tol=0.0 stops at the fixpoint.
    """

    state_dim = 4
    msg_dim = 2
    combine = "lexmin64"
    edge_cols: tuple = ()

    def __init__(self):
        self.step = 0

    def init_state(self, vids: np.ndarray, shard) -> np.ndarray:
        st = np.zeros((len(vids), 4), dtype=np.float64)
        st[:, 1] = -1.0
        st[:, 2] = -1.0
        st[:, 3] = vids.astype(np.float64)
        return st

    def prepare_edges(self, edge_table, shard):
        return edge_table["dst"].to_numpy(zero_copy_only=False).astype(np.float64)

    def init_stats(self, vids, state, shard) -> dict:
        return {}

    def reduce_stats(self, stats: list[dict]) -> dict:
        out: dict = {}
        for s in stats:
            for k, v in s.items():
                out[k] = out.get(k, 0.0) + v
        return out

    @staticmethod
    def _pack_cols(vid: np.ndarray, live: np.ndarray) -> np.ndarray:
        v = vid.astype(np.uint64)
        hi = np.where(live, (v >> np.uint64(32)).astype(np.float64), _IDENT_F)
        lo = np.where(live, (v & np.uint64(0xFFFFFFFF)).astype(np.float64), _IDENT_F)
        return np.column_stack([hi, lo])

    def message(self, src_state: np.ndarray, edge_data, shard) -> np.ndarray:
        active = src_state[:, 0] == 0.0
        if self.step % 2 == 0:
            return self._pack_cols(src_state[:, 3], active)
        proposing = active & (src_state[:, 2] >= 0.0) & (src_state[:, 2] == edge_data)
        return self._pack_cols(src_state[:, 3], proposing)

    def apply(self, vids, old, agg, have_msg, aux, shard):
        new = old.copy()
        active = old[:, 0] == 0.0
        key = (agg[:, 0].astype(np.uint64) << np.uint64(32)) | agg[:, 1].astype(
            np.uint64
        )
        ident = (np.uint64(0xFFFFFFFF) << np.uint64(32)) | np.uint64(0xFFFFFFFF)
        got = key != ident
        if self.step % 2 == 0:
            no_nb = active & ~got
            new[no_nb, 0] = 2.0
            new[:, 2] = np.where(active & got, key.astype(np.float64), -1.0)
            delta = float((new[:, 0] == 0.0).sum())
        else:
            matched = (
                active
                & got
                & (old[:, 2] >= 0.0)
                & (key.astype(np.float64) == old[:, 2])
            )
            new[matched, 0] = 1.0
            new[matched, 1] = old[matched, 2]
            new[:, 2] = -1.0
            delta = float((new[:, 0] == 0.0).sum())
        self.step += 1
        return new, {"delta": delta}


def maximal_matching(
    edges: "ray.data.Dataset",
    n_vertices: int,
    max_rounds: int = 30,
    approx_edges: int | None = None,
    local_threshold: int = 5_000_000,
    P: int = 4,
    layout_dir: str | None = None,
) -> "ray.data.Dataset":
    """(id, partner) for every matched vertex pair, id < partner."""
    und = _canonical_undirected(edges, approx_edges)

    if approx_edges is not None and approx_edges <= local_threshold:
        t = collect_table(und)
        a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        partner = _matching_local(a, b, n_vertices, max_rounds)
    else:
        import tempfile

        from ugfraud_ray.state.engine import SuperstepEngine
        from ugfraud_ray.state.layout import build_layout, symmetrize

        sym = symmetrize(und.select_columns(["src", "dst"])).materialize()
        layout = build_layout(
            sym,
            n_vertices,
            layout_dir or tempfile.mkdtemp(prefix="match_"),
            P=P,
        )
        eng = SuperstepEngine(layout, MatchingProgram())
        eng.run(max_iters=2 * max_rounds, tol=0.0)
        rt = collect_table(eng.result_dataset())
        eng.shutdown()
        partner = np.full(n_vertices, -1, dtype=np.int64)
        vid = rt["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
        st = rt["s0"].to_numpy(zero_copy_only=False)
        pn = rt["s1"].to_numpy(zero_copy_only=False).astype(np.int64)
        partner[vid[st == 1.0]] = pn[st == 1.0]

    ids = np.flatnonzero(partner >= 0)
    keep = ids < partner[ids]
    return ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(ids[keep].astype(np.int64)),
                "partner": pa.array(partner[ids[keep]]),
            }
        )
    )


def coarsen_by_matching(
    edges: "ray.data.Dataset",
    n_vertices: int,
    matched: "ray.data.Dataset",
    approx_edges: int | None = None,
) -> "ray.data.Dataset":
    """One multilevel-coarsening step: contract every matched pair to
    its smaller endpoint and collapse multi-edges to integer weights —
    (src, dst, weight) on supervertex ids, self-loops dropped
    (``contraction.contract_graph`` semantics).

    The matched-pair table is at most V/2 rows and only the PARTNER
    endpoints remap (winners keep their own id), so the broadcast here
    is the (partner -> winner) array — the same
    colliding-subset-broadcast contract as minhash_lsh_dedup; above a
    broadcast gate ``contract_graph`` itself switches to hash joins.
    """
    from ugfraud_ray.pipelines.contraction import contract_graph

    mt = collect_table(matched)
    win = mt["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    los = mt["partner"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(los, kind="stable")
    win, los = win[order], los[order]
    pair_ref = ray.put((los, win))

    def assign(t: pa.Table) -> pa.Table:
        lo, wn = ray.get(pair_ref)
        v = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = v.copy()
        if len(lo):
            at = np.clip(np.searchsorted(lo, v), 0, len(lo) - 1)
            hit = lo[at] == v
            g[hit] = wn[at[hit]]
        return pa.table({"id": pa.array(v), "gid": pa.array(g)})

    gm = ray.data.range(n_vertices).map_batches(assign, batch_format="pyarrow")
    return contract_graph(
        edges, gm, approx_rows=approx_edges, map_rows=n_vertices
    )
