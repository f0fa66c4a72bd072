"""Gather–scatter superstep engine over partitioned CSR shards.

This is the piece the reference simply does not have: its iterative
detectors run single-threaded sweeps over driver-resident Python objects
(e.g. SpEagle `run_bp` Detector/SpEagle.py:424-463, GANG `pu_lbp`
Detector/GANG.py:114-137). Here every iterative kernel is a
`VertexProgram` executed by a pool of `GraphShard` actors:

- shard p owns vertex partition ``{vid : vid % P == p}`` (dense local
  arrays, local index = vid // P) and all edges whose dst lives in p
  (so dst-aggregation is partition-local), except hub-dst edges which
  are spread across shards and combined in a second small reduce
  (two-level combine for skew).
- one superstep = ``compute``(gather src state from the P published
  state blocks → vectorized message kernel → segmented combine) then
  ``apply`` (vertex update) — Jacobi semantics, order-free, which is the
  convergence-equivalent form of the reference's Gauss–Seidel sweeps
  (SURVEY §2.9 I1).
- state blocks live in the object store; the driver holds only
  ObjectRefs, per-step scalar stats, and the (small) combined hub
  aggregates.
- every ``checkpoint_every`` steps each shard writes its state block to
  ``ckpt/step=k/state_p{p}.parquet`` and the driver commits
  ``step_k.json`` (metrics manifest) only after all shards land —
  resume scans the greatest committed step (per-partition lineage +
  mid-iteration resumability, north rule).

Messages are plain float64 (n, msg_dim) numpy arrays (msg_dim defaults
to state_dim — programs whose state carries extra bookkeeping columns
set it smaller); combines are ``np.bincount`` (sum), ``ufunc.at``
(min/max), or ``lexmin64`` — an EXACT lexicographic min over a 2-column
message whose columns are integers in [0, 2^32): the pair is packed
into one uint64 key (hi<<32 | lo), minimized with ``np.minimum.at``,
and unpacked, so 64-bit hash priorities (md5-low64) survive the float64
message path bit-exactly. No Python loops over edges anywhere.
"""

from __future__ import annotations

import glob
import json
import os
import time
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray


class VertexProgram:
    """Vectorized vertex-program contract (all numpy, no per-row Python).

    Subclasses define the kernel; the engine owns partitioning, gather,
    combine, hub reconciliation, convergence and checkpointing.
    """

    state_dim: int = 1
    msg_dim: int | None = None  # message width; defaults to state_dim
    combine: str = "sum"  # 'sum' | 'min' | 'max' | 'lexmin64'
    edge_cols: tuple = ()  # extra edge columns the kernel needs

    def init_state(self, vids: np.ndarray, shard: "Any") -> np.ndarray:
        """Initial (len(vids), state_dim) float64 state for owned vids."""
        raise NotImplementedError

    def prepare_edges(self, edge_table: pa.Table, shard: "Any") -> Any:
        """Optional per-edge static data (computed once per shard)."""
        return None

    def message(self, src_state: np.ndarray, edge_data: Any, shard: "Any") -> np.ndarray:
        """(n_edges, state_dim) contributions sent along each edge."""
        raise NotImplementedError

    def apply(
        self, vids: np.ndarray, old: np.ndarray, agg: np.ndarray, have_msg: np.ndarray,
        aux: dict, shard: "Any",
    ) -> tuple[np.ndarray, dict]:
        """New state + local stats (must include 'delta')."""
        raise NotImplementedError

    def init_stats(self, vids: np.ndarray, state: np.ndarray, shard: "Any") -> dict:
        """Optional per-shard stats over the initial state (e.g. dangling mass)."""
        return {}

    def reduce_stats(self, stats: list[dict]) -> dict:
        """Driver-side combine of per-shard stats -> aux for next step."""
        out: dict = {}
        for s in stats:
            for k, v in s.items():
                out[k] = out.get(k, 0.0) + v
        return out


_U32MAX_F = float(0xFFFFFFFF)  # per-column lexmin64 identity (key = u64 max)
_COMBINE_IDENT = {"sum": 0.0, "min": np.inf, "max": -np.inf, "lexmin64": _U32MAX_F}


def _lex_pack(c0: np.ndarray, c1: np.ndarray) -> np.ndarray:
    """(hi, lo) float64 columns of exact integers in [0, 2^32) -> uint64 key."""
    return (c0.astype(np.uint64) << np.uint64(32)) | c1.astype(np.uint64)


def _lex_unpack(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    hi = (key >> np.uint64(32)).astype(np.float64)
    lo = (key & np.uint64(0xFFFFFFFF)).astype(np.float64)
    return hi, lo


@ray.remote
class GraphShard:
    def __init__(self, layout_path: str, p: int, program: VertexProgram):
        from ugfraud_ray.state.layout import GraphLayout

        self.layout = GraphLayout.load(layout_path)
        self.p = p
        self.P = self.layout.P
        self.N = self.layout.n_vertices
        self.program = program
        files = sorted(glob.glob(os.path.join(layout_path, "edges", f"part={p}", "*.parquet")))
        cols = ["src", "dst"] + list(program.edge_cols)
        if files:
            t = pa.concat_tables([pq.read_table(f, columns=cols) for f in files])
        else:
            t = pa.table({c: pa.array([], pa.int64()) for c in cols})
        self.src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.n_edges = len(self.src)
        self.src_part = (self.src % self.P).astype(np.int64)
        self.src_local = self.src // self.P
        self.dst_part = (self.dst % self.P).astype(np.int64)
        self.dst_local = self.dst // self.P
        # static gather plan: edges grouped by src partition once, so the
        # per-superstep gather is O(E) regardless of P (a per-partition
        # boolean mask loop would be O(E·P) and kill scaling efficiency)
        self.src_order = np.argsort(self.src_part, kind="stable")
        counts = np.bincount(self.src_part, minlength=self.P)
        self.src_bounds = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self.src_local_sorted = self.src_local[self.src_order]
        # hub handling: edges whose dst is a hub may belong to any dst
        # partition; aggregate them separately into the hub index space.
        self.hub_vids = np.array(self.layout.hub_vids, dtype=np.int64)
        if len(self.hub_vids):
            self.is_hub_edge = np.isin(self.dst, self.hub_vids)
            self.hub_idx = np.searchsorted(self.hub_vids, self.dst[self.is_hub_edge])
        else:
            self.is_hub_edge = np.zeros(self.n_edges, dtype=bool)
            self.hub_idx = np.zeros(0, dtype=np.int64)
        self.local_mask = (~self.is_hub_edge) & (self.dst_part == self.p)
        # owned vertices
        self.vids = np.arange(p, self.N, self.P, dtype=np.int64)
        self.n_local = len(self.vids)
        # hubs owned by this shard
        if len(self.hub_vids):
            own = self.hub_vids % self.P == self.p
            self.owned_hub_vids = self.hub_vids[own]
            self.owned_hub_local = self.owned_hub_vids // self.P
            self.owned_hub_pos = np.flatnonzero(own)
        else:
            self.owned_hub_vids = np.zeros(0, dtype=np.int64)
            self.owned_hub_local = np.zeros(0, dtype=np.int64)
            self.owned_hub_pos = np.zeros(0, dtype=np.int64)
        # per-partition static vertex columns (e.g. out-degree, priors)
        vfiles = sorted(glob.glob(os.path.join(layout_path, "vertex", f"part={p}", "*.parquet")))
        self._aux_table = pa.concat_tables([pq.read_table(f) for f in vfiles]) if vfiles else None
        self.edge_data = program.prepare_edges(t, self)
        self.state = np.ascontiguousarray(program.init_state(self.vids, self), dtype=np.float64)
        if self.state.ndim == 1:
            self.state = self.state[:, None]
        # preallocated superstep buffers (zeros pre-faults the pages at
        # actor init): concurrent shards mmap/munmap'ing large fresh
        # temporaries every step serialize on the kernel mmap lock —
        # measured multi-second stalls in the BP engine
        k = program.state_dim
        self.k_msg = getattr(program, "msg_dim", None) or k
        self._src_vals = np.zeros((self.n_edges, k))
        self._gtmp = np.zeros((self.n_edges, k))
        self._agg = np.zeros((self.n_local, self.k_msg))
        self._have = np.zeros(self.n_local, dtype=bool)

    def vertex_aux(self, col: str, default: float = 0.0) -> np.ndarray:
        """Dense (n_local,) array of a static vertex column for owned vids."""
        out = np.full(self.n_local, default, dtype=np.float64)
        if self._aux_table is not None and col in self._aux_table.column_names:
            vid = self._aux_table["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
            val = self._aux_table[col].to_numpy(zero_copy_only=False).astype(np.float64)
            out[vid // self.P] = val
        return out

    # ---- published state -------------------------------------------------
    def get_state(self) -> np.ndarray:
        return self.state

    def set_state(self, arr: np.ndarray) -> bool:
        self.state = np.ascontiguousarray(arr, dtype=np.float64)
        return True

    # ---- superstep phase 1: gather + combine -----------------------------
    def compute(self, state_refs: list) -> np.ndarray:
        """Aggregate messages for owned vids; return hub partials (small).

        state_refs may be get_state blocks (arrays) or pipelined apply
        results ((state, stats) pairs are split by num_returns=2, so
        plain arrays arrive either way)."""
        k = self.program.state_dim
        blocks = ray.get(list(state_refs))
        src_vals = self._src_vals
        for q in range(self.P):
            sl = slice(self.src_bounds[q], self.src_bounds[q + 1])
            if sl.start < sl.stop:
                n = sl.stop - sl.start
                np.take(blocks[q], self.src_local_sorted[sl], axis=0, out=self._gtmp[:n])
                src_vals[self.src_order[sl]] = self._gtmp[:n]
        msgs = self.program.message(src_vals, self.edge_data, self)
        if msgs.ndim == 1:
            msgs = msgs[:, None]
        km = self.k_msg
        ident = _COMBINE_IDENT[self.program.combine]
        agg = self._agg
        agg.fill(ident)
        have = self._have
        have.fill(False)
        lm = self.local_mask
        dl = self.dst_local[lm]
        if self.program.combine == "sum":
            for j in range(km):
                agg[:, j] += np.bincount(dl, weights=msgs[lm, j], minlength=self.n_local)
        elif self.program.combine == "min":
            for j in range(km):
                np.minimum.at(agg[:, j], dl, msgs[lm, j])
        elif self.program.combine == "lexmin64":
            aggk = np.full(self.n_local, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
            np.minimum.at(aggk, dl, _lex_pack(msgs[lm, 0], msgs[lm, 1]))
            agg[:, 0], agg[:, 1] = _lex_unpack(aggk)
        else:
            for j in range(km):
                np.maximum.at(agg[:, j], dl, msgs[lm, j])
        np.logical_or.at(have, dl, True)
        self._agg, self._have = agg, have
        # hub partials: (n_hubs, km) dense — n_hubs is small by construction
        n_hubs = len(self.hub_vids)
        hub_partial = np.full((n_hubs, km), ident, dtype=np.float64)
        hub_have = np.zeros(n_hubs, dtype=bool)
        if n_hubs and self.is_hub_edge.any():
            hm = msgs[self.is_hub_edge]
            if self.program.combine == "sum":
                for j in range(km):
                    hub_partial[:, j] += np.bincount(self.hub_idx, weights=hm[:, j], minlength=n_hubs)
            elif self.program.combine == "min":
                for j in range(km):
                    np.minimum.at(hub_partial[:, j], self.hub_idx, hm[:, j])
            elif self.program.combine == "lexmin64":
                hk = np.full(n_hubs, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
                np.minimum.at(hk, self.hub_idx, _lex_pack(hm[:, 0], hm[:, 1]))
                hub_partial[:, 0], hub_partial[:, 1] = _lex_unpack(hk)
            else:
                for j in range(km):
                    np.maximum.at(hub_partial[:, j], self.hub_idx, hm[:, j])
            np.logical_or.at(hub_have, self.hub_idx, True)
        return np.concatenate([hub_partial, hub_have[:, None].astype(np.float64)], axis=1)

    def initial_stats(self) -> dict:
        return self.program.init_stats(self.vids, self.state, self)

    # ---- superstep phase 2: apply ---------------------------------------
    def apply(self, hub_agg: np.ndarray | None, aux: dict):
        agg, have = self._agg, self._have
        if hub_agg is not None and len(self.owned_hub_pos):
            vals = hub_agg[self.owned_hub_pos, :-1]
            hv = hub_agg[self.owned_hub_pos, -1] > 0
            agg[self.owned_hub_local] = vals
            have[self.owned_hub_local] = hv
        new_state, stats = self.program.apply(self.vids, self.state, agg, have, aux, self)
        if new_state.ndim == 1:
            new_state = new_state[:, None]
        self.state = np.ascontiguousarray(new_state, dtype=np.float64)
        # (state, stats): called with num_returns=2 so the driver feeds
        # the state ref straight into the next compute round (pipelined,
        # shard-to-shard through the object store) and fetches only the
        # small stats ref itself
        return self.state, stats

    # ---- checkpointing ---------------------------------------------------
    def checkpoint(self, ckpt_dir: str, step: int) -> bool:
        d = os.path.join(ckpt_dir, f"step={step}")
        os.makedirs(d, exist_ok=True)
        cols = {"vid": pa.array(self.vids)}
        for j in range(self.state.shape[1]):
            cols[f"s{j}"] = pa.array(self.state[:, j])
        pq.write_table(pa.table(cols), os.path.join(d, f"state_p{self.p}.parquet"))
        return True

    def restore(self, ckpt_dir: str, step: int) -> bool:
        f = os.path.join(ckpt_dir, f"step={step}", f"state_p{self.p}.parquet")
        t = pq.read_table(f)
        k = len(t.column_names) - 1
        self.state = np.column_stack([t[f"s{j}"].to_numpy() for j in range(k)]).astype(np.float64)
        return True

    def state_table(self) -> pa.Table:
        cols = {"vid": pa.array(self.vids)}
        for j in range(self.state.shape[1]):
            cols[f"s{j}"] = pa.array(self.state[:, j])
        return pa.table(cols)


class SuperstepEngine:
    """Driver-side loop: spawn shard pool, iterate, checkpoint, converge."""

    def __init__(self, layout, program: VertexProgram, ckpt_dir: str | None = None,
                 checkpoint_every: int = 0):
        self.layout = layout
        self.program = program
        self.ckpt_dir = ckpt_dir
        self.checkpoint_every = checkpoint_every
        self.shards = [
            GraphShard.remote(layout.path, p, program) for p in range(layout.P)
        ]
        self.metrics: list[dict] = []
        self.n_hubs = len(layout.hub_vids)

    def _combine_hub(self, partials: list[np.ndarray]) -> np.ndarray | None:
        if not self.n_hubs:
            return None
        k = getattr(self.program, "msg_dim", None) or self.program.state_dim
        vals = np.stack([p[:, :k] for p in partials])  # (P, n_hubs, k)
        have = np.stack([p[:, k] > 0 for p in partials])
        any_have = have.any(axis=0)
        if self.program.combine == "sum":
            out = vals.sum(axis=0)
        elif self.program.combine == "min":
            out = vals.min(axis=0)
        elif self.program.combine == "lexmin64":
            keys = np.stack([_lex_pack(p[:, 0], p[:, 1]) for p in partials]).min(axis=0)
            hi, lo = _lex_unpack(keys)
            out = np.column_stack([hi, lo])
        else:
            out = vals.max(axis=0)
        return np.concatenate([out, any_have[:, None].astype(np.float64)], axis=1)

    def run(
        self,
        max_iters: int,
        tol: float | None = None,
        aux: dict | None = None,
        resume: bool = False,
        stop_fn=None,
    ) -> dict:
        """Run supersteps until convergence or max_iters.

        Convergence: stats['delta'] <= tol, or, if ``stop_fn(stats, prev_aux)``
        is given, whenever it returns True (driver-side rule, e.g. GANG's
        global-sum difference /root/reference Detector/GANG.py:126-137).
        """
        aux = dict(aux or {})
        start_step = 0
        if resume and self.ckpt_dir:
            done = self._latest_checkpoint()
            if done is not None:
                step, saved_aux = done
                ray.get([s.restore.remote(self.ckpt_dir, step) for s in self.shards])
                aux.update(saved_aux)
                start_step = step + 1
        if start_step == 0:
            init = ray.get([s.initial_stats.remote() for s in self.shards])
            if any(init):
                aux.update(self.program.reduce_stats(init))
        # Pipelined superstep loop: apply is called with num_returns=2 —
        # its state ref feeds the NEXT compute round directly (no
        # per-step get_state round, no driver barrier on state) while
        # the driver fetches only the small stats refs. Convergence is
        # checked before each apply launch, so the number of applied
        # supersteps is identical to the barriered loop; at most one
        # extra compute (which only fills shard-local buffers) runs
        # after convergence.
        state_refs = [s.get_state.remote() for s in self.shards]
        stats_refs = None

        def _consume_stats(refs):
            """Merge a finished step's stats into aux/metrics; returns
            (stats, aux_before_merge) for the convergence checks."""
            nonlocal aux
            stats = self.program.reduce_stats(ray.get(refs))
            self.metrics[-1].update(
                {k: float(v) for k, v in stats.items() if np.isscalar(v)}
            )
            step = self.metrics[-1]["step"]
            aux_before = aux
            aux = {**aux, **stats}
            if self.checkpoint_every and self.ckpt_dir and (step + 1) % self.checkpoint_every == 0:
                self._commit_checkpoint(step, aux)
            return stats, aux_before

        for it in range(start_step, max_iters):
            t0 = time.perf_counter()
            compute_futs = [s.compute.remote(state_refs) for s in self.shards]
            if stats_refs is not None:
                # stats of the PREVIOUS step, fetched while compute runs
                stats, aux_before = _consume_stats(stats_refs)
                stats_refs = None
                if stop_fn is not None and stop_fn(stats, aux_before):
                    break
                if tol is not None and stats.get("delta", np.inf) <= tol:
                    break
            hub_parts = ray.get(compute_futs)
            hub_agg = self._combine_hub(hub_parts)
            pairs = [
                s.apply.options(num_returns=2).remote(hub_agg, aux) for s in self.shards
            ]
            state_refs = [p[0] for p in pairs]
            stats_refs = [p[1] for p in pairs]
            dt = time.perf_counter() - t0
            self.metrics.append({"step": it, "seconds": dt})
        if stats_refs is not None:
            _consume_stats(stats_refs)
        if self.ckpt_dir:
            os.makedirs(self.ckpt_dir, exist_ok=True)
            with open(os.path.join(self.ckpt_dir, "metrics.json"), "w") as f:
                json.dump(self.metrics, f)
        return aux

    def _commit_checkpoint(self, step: int, aux: dict) -> None:
        ray.get([s.checkpoint.remote(self.ckpt_dir, step) for s in self.shards])
        safe_aux = {k: float(v) for k, v in aux.items() if np.isscalar(v) and np.isreal(v)}
        manifest = {"step": step, "P": self.layout.P, "aux": safe_aux}
        # tmp + rename: the manifest IS the commit point of the
        # checkpoint protocol, so its write must be atomic — a SIGKILL
        # mid-json.dump otherwise leaves a truncated step_k.json that
        # poisons every future resume (found by tools/chaos_resume.py)
        final = os.path.join(self.ckpt_dir, f"step_{step}.json")
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)

    def _latest_checkpoint(self):
        if not self.ckpt_dir or not os.path.isdir(self.ckpt_dir):
            return None
        best = None
        for f in glob.glob(os.path.join(self.ckpt_dir, "step_*.json")):
            try:
                with open(f) as fh:
                    m = json.load(fh)
            except (json.JSONDecodeError, OSError):
                # pre-atomic-write leftovers / torn files: skip, an
                # older committed manifest is still a valid resume point
                continue
            if best is None or m["step"] > best[0]:
                best = (m["step"], m.get("aux", {}))
        return best

    def refresh_shards(self, touched: list[int]) -> None:
        """Per-partition lineage invalidation after `append_edges`
        (layout.py): ONLY the touched shards are killed and rebuilt from
        the grown layout; untouched shards keep their in-memory state,
        so a subsequent run() re-converges incrementally (the engine
        analog of the reference's add_new_data + local_schedule,
        Detector/SpEagle.py:283-323, 381-422)."""
        self.layout = type(self.layout).load(self.layout.path)
        for p in touched:
            ray.kill(self.shards[p])
            self.shards[p] = GraphShard.remote(self.layout.path, p, self.program)
        self.n_hubs = len(self.layout.hub_vids)

    def result_dataset(self) -> "ray.data.Dataset":
        import ray.data

        return ray.data.from_arrow_refs([s.state_table.remote() for s in self.shards])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
