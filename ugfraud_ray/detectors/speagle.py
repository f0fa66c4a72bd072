"""SpEagle — loopy belief propagation on the user–review–product factor
graph (Akoglu et al., KDD'15), rebuilt as a partitioned Jacobi superstep
engine.

Reference /root/reference/UGFraud/Detector/SpEagle.py:
- one Python Node object per user, product AND review, messages in
  per-node dicts (SpEagle.py:24-222), sequential Gauss–Seidel sweeps
  with alternating direction (run_bp, SpEagle.py:424-463).
- message update (recompute_outgoing, SpEagle.py:177-222):
      m_i->j(x_j) = lse_{x_i}( logH[x_j, x_i] + (belief_i − m_j->i)(x_i) )
  normalized by the lse over the whole 2x2 table; belief_i = prior_i +
  Σ incoming (get_belief, SpEagle.py:141-175).
- classify (SpEagle.py:465-508): softmax(belief)[1] per node.

Engine form (north star): reviews ARE the edge rows — each edge carries
its review prior and 4 log-odds messages (u→r, p→r, r→u, r→p);
vertices carry S_v = prior_v + Σ m_r→v. One superstep updates all 4
message arrays Jacobi-style (vectorized logaddexp, no Python loop over
edges), then rebuilds S via dst-local segment sums + compact
src-partition partials shuffled to their owners. Gauss–Seidel vs Jacobi
changes the trajectory, not the fixed point (SURVEY §2.9 I1):
conformance is at convergence, np.allclose 1e-6.

Scalar log-odds representation: a normalized 2-class log message
[m0, m1] is fully determined by its difference d = m1 − m0
(m0 = −logaddexp(0, d)), the message kernel is shift-invariant in its
input, and belief sums are LINEAR in d — so the whole algorithm closes
over one float64 per message instead of two. This halves the
superstep's memory traffic (the measured bottleneck) and drops the
per-edge transcendental count from 12 to 8 logaddexp. Read-out
posteriors exp(S1)/(exp(S0)+exp(S1)) = sigmoid(S_diff) are unchanged
mathematically; convergence delta is reported in mean |Δ log-odds|.

Checkpointing: every ``checkpoint_every`` supersteps each shard writes
messages+S to ``ckpt/step=k/bp_p{p}.parquet`` and the driver commits a
manifest after all shards land; resume loads the greatest committed step
(per-partition lineage, mid-iteration resumability).
"""

from __future__ import annotations

import glob
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

EPS_PRIOR = 1e-5  # reference Node.__init__ prior clamp (SpEagle.py:57-63)


def default_potentials(numerical_eps: float = 1e-5, eps: float = 0.1) -> dict:
    """The demo's 4 log-potential matrices (eval_SpEagle.py:11-15)."""
    ur = np.log(np.array([[1 - numerical_eps, numerical_eps],
                          [numerical_eps, 1 - numerical_eps]]))
    rp = np.log(np.array([[1 - eps, eps], [eps, 1 - eps]]))
    return {"u_r": ur, "r_u": ur, "r_p": rp, "p_r": rp}


def log_prior_2vec(p: np.ndarray) -> np.ndarray:
    """prior scalar -> log [1-p, p] with the reference's eps clamps."""
    p = np.asarray(p, dtype=np.float64)
    p = np.where(p == 1.0, 1.0 - EPS_PRIOR, np.where(p == 0.0, EPS_PRIOR, p))
    return np.column_stack([np.log(1.0 - p), np.log(p)])


def log_prior_odds(p: np.ndarray) -> np.ndarray:
    """prior scalar -> log-odds log(p/(1-p)) with the reference's clamps."""
    p = np.asarray(p, dtype=np.float64)
    p = np.where(p == 1.0, 1.0 - EPS_PRIOR, np.where(p == 0.0, EPS_PRIOR, p))
    return np.log(p) - np.log(1.0 - p)


def _msg(v: np.ndarray, logH: np.ndarray) -> np.ndarray:
    """Vectorized reference message kernel over E edges (2-vector form,
    kept for conformance-oracle reuse in tests).

    v: (E,2) log inputs; logH: (2,2). out[e,j] = lse_i(logH[j,i]+v[e,i]),
    normalized so lse_j(out[e,:]) = 0 (SpEagle.py:210-215).
    """
    v0, v1 = v[:, 0], v[:, 1]
    o0 = np.logaddexp(logH[0, 0] + v0, logH[0, 1] + v1)
    o1 = np.logaddexp(logH[1, 0] + v0, logH[1, 1] + v1)
    z = np.logaddexp(o0, o1)
    o0 -= z
    o1 -= z
    out = np.empty_like(v)
    out[:, 0] = o0
    out[:, 1] = o1
    return out


def _msg_diff(d: np.ndarray, logH: np.ndarray) -> np.ndarray:
    """Scalar log-odds message kernel: the difference out1 − out0 of
    `_msg` depends only on the input difference d = v1 − v0 (shift
    invariance of lse), so per message only TWO logaddexp over (E,)
    are needed and normalization cancels:

        out_diff = lse(logH[1,0], logH[1,1]+d) − lse(logH[0,0], logH[0,1]+d)
    """
    return np.logaddexp(logH[1, 0], logH[1, 1] + d) - np.logaddexp(
        logH[0, 0], logH[0, 1] + d
    )


@ray.remote
class BPShard:
    def __init__(self, layout_path: str, p: int, potentials: dict,
                 active_ref=None):
        from ugfraud_ray.state.layout import GraphLayout

        self._active_ref = active_ref
        self.layout = GraphLayout.load(layout_path)
        self.p = p
        self.P = self.layout.P
        self.N = self.layout.n_vertices
        self.pot = {k: np.asarray(v, dtype=np.float64) for k, v in potentials.items()}
        files = sorted(glob.glob(os.path.join(layout_path, "edges", f"part={p}", "*.parquet")))
        cols = ["src", "dst", "prior"]
        t = (
            pa.concat_tables([pq.read_table(f, columns=cols) for f in files])
            if files
            else pa.table({c: pa.array([], pa.int64() if c != "prior" else pa.float64()) for c in cols})
        )
        self.src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.E = len(self.src)
        self.prior_r = log_prior_odds(t["prior"].to_numpy(zero_copy_only=False))
        # early_stop_at (SpEagle.py:424-436): outgoing messages of nodes
        # OUTSIDE the schedule prefix never update (they stay at the
        # uniform init, exactly like the reference's untouched Nodes).
        # Jacobi mapping: freeze u2r where the user is inactive, p2r
        # where the product is, r2u/r2p where the review is (a review
        # node is active iff its user is — the BFS-adjacency rule).
        if active_ref is not None:
            # top-level ObjectRef args arrive auto-dereferenced
            act = np.sort(np.asarray(active_ref))
            self.fz_u2r = ~np.isin(self.src, act)
            self.fz_p2r = ~np.isin(self.dst, act)
            self.fz_r = self.fz_u2r
        else:
            self.fz_u2r = self.fz_p2r = self.fz_r = None
        self.src_part = (self.src % self.P).astype(np.int64)
        self.src_local = self.src // self.P
        self.dst_part = (self.dst % self.P).astype(np.int64)
        self.dst_local = self.dst // self.P
        # static gather/scatter plans (O(E) per superstep independent of
        # P): edges sorted by endpoint partition once; per-partition
        # slices carry precomputed unique-local indices + inverse maps
        # so partial sums are bincounts, never per-partition masks.
        self.plans = {}
        for name, part, local in (
            ("src", self.src_part, self.src_local),
            ("dst", self.dst_part, self.dst_local),
        ):
            order = np.argsort(part, kind="stable")
            counts = np.bincount(part, minlength=self.P)
            bounds = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
            local_sorted = local[order]
            groups = []
            for q in range(self.P):
                seg = local_sorted[bounds[q] : bounds[q + 1]]
                uniq, inv = np.unique(seg, return_inverse=True)
                groups.append((uniq, inv))
            self.plans[name] = (order, bounds, local_sorted, groups)
        # owned vertices + their log priors
        self.vids = np.arange(p, self.N, self.P, dtype=np.int64)
        self.n_local = len(self.vids)
        vfiles = sorted(glob.glob(os.path.join(layout_path, "vertex", f"part={p}", "*.parquet")))
        pv = np.zeros(self.n_local, dtype=np.float64)
        kind = np.zeros(self.n_local, dtype=np.int8)
        if vfiles:
            vt = pa.concat_tables([pq.read_table(f) for f in vfiles])
            vid = vt["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
            pv[vid // self.P] = vt["prior"].to_numpy(zero_copy_only=False)
            if "kind" in vt.column_names:
                kind[vid // self.P] = vt["kind"].to_numpy(zero_copy_only=False)
        self.kind = kind
        self.prior_v = log_prior_odds(pv)
        # message state (all zeros = uniform log-odds, Node.add_neighbor).
        # Double-buffered + preallocated scratch: the superstep kernel
        # runs ALLOCATION-FREE — concurrent shards each mmap/munmap'ing
        # ~40 MB temporaries per step serialize on the kernel's mmap
        # lock and caused multi-second stalls (measured: pure-numpy
        # kernel sections spiking 5x only under concurrency).
        self.m_u2r = np.zeros(self.E)
        self.m_p2r = np.zeros(self.E)
        self.m_r2u = np.zeros(self.E)
        self.m_r2p = np.zeros(self.E)
        # zeros (not empty) pre-faults the pages at actor init, keeping
        # first-touch page faults out of the first measured superstep
        self._n_u2r = np.zeros(self.E)
        self._n_p2r = np.zeros(self.E)
        self._n_r2u = np.zeros(self.E)
        self._n_r2p = np.zeros(self.E)
        self._Su = np.zeros(self.E)
        self._Sp = np.zeros(self.E)
        self._t1 = np.zeros(self.E)
        self._t2 = np.zeros(self.E)
        # exp of the potential entries, precomputed per message type:
        # the kernel uses the closed form
        #   f(d) = log((e^h10 + e^h11 t)/(e^h00 + e^h01 t)),  t = e^d
        # (= _msg_diff algebraically) with d clipped to ±40 — ONE exp +
        # ONE log per message instead of two logaddexp (which cost an
        # exp + log1p each); clip error < e^-40, far below conformance
        # tolerance. Transcendental passes per superstep: 16 -> 8.
        self._epot = {k: np.exp(v) for k, v in self.pot.items()}
        self.S = self.prior_v.copy()

    def get_state(self) -> np.ndarray:
        return self.S

    # ---- one Jacobi superstep over this shard's edges -------------------
    def compute(self, state_refs: list):
        t0 = time.perf_counter()
        blocks = ray.get(list(state_refs))
        t_fetch = time.perf_counter() - t0
        t0 = time.perf_counter()
        for arr, plan in ((self._Su, self.plans["src"]), (self._Sp, self.plans["dst"])):
            order, bounds, local_sorted, _ = plan
            for q in range(self.P):
                sl = slice(bounds[q], bounds[q + 1])
                if sl.start < sl.stop:
                    np.take(blocks[q], local_sorted[sl], out=self._t1[: sl.stop - sl.start])
                    arr[order[sl]] = self._t1[: sl.stop - sl.start]
        t_gather = time.perf_counter() - t0
        t0 = time.perf_counter()

        def msg_into(cavity_a, cavity_b, sign, key, out):
            # out <- _msg_diff(cavity_a +/- cavity_b, pot[key]) via the
            # exp closed form (see __init__), allocation-free
            eh = self._epot[key]
            d = self._t1
            np.subtract(cavity_a, cavity_b, out=d) if sign < 0 else np.add(
                cavity_a, cavity_b, out=d
            )
            np.clip(d, -40.0, 40.0, out=d)
            np.exp(d, out=d)  # t
            np.multiply(d, eh[1, 1], out=out)
            out += eh[1, 0]  # numerator
            np.multiply(d, eh[0, 1], out=d)
            d += eh[0, 0]  # denominator
            np.divide(out, d, out=out)
            np.log(out, out=out)

        def l1_delta(new, old):
            np.subtract(new, old, out=self._t1)
            np.abs(self._t1, out=self._t1)
            return self._t1.sum()

        msg_into(self._Su, self.m_r2u, -1, "u_r", self._n_u2r)
        msg_into(self._Sp, self.m_r2p, -1, "p_r", self._n_p2r)
        msg_into(self.prior_r, self.m_p2r, +1, "r_u", self._n_r2u)
        msg_into(self.prior_r, self.m_u2r, +1, "r_p", self._n_r2p)
        if self.fz_u2r is not None:
            np.copyto(self._n_u2r, self.m_u2r, where=self.fz_u2r)
            np.copyto(self._n_p2r, self.m_p2r, where=self.fz_p2r)
            np.copyto(self._n_r2u, self.m_r2u, where=self.fz_r)
            np.copyto(self._n_r2p, self.m_r2p, where=self.fz_r)
        delta = (
            l1_delta(self._n_u2r, self.m_u2r)
            + l1_delta(self._n_p2r, self.m_p2r)
            + l1_delta(self._n_r2u, self.m_r2u)
            + l1_delta(self._n_r2p, self.m_r2p)
        )
        # swap double buffers: new become current, old become next scratch
        self.m_u2r, self._n_u2r = self._n_u2r, self.m_u2r
        self.m_p2r, self._n_p2r = self._n_p2r, self.m_p2r
        self.m_r2u, self._n_r2u = self._n_r2u, self.m_r2u
        self.m_r2p, self._n_r2p = self._n_r2p, self.m_r2p
        t_kernel = time.perf_counter() - t0
        t0 = time.perf_counter()
        # Two-sided partial exchange: both m_r2u (to users, by src) and
        # m_r2p (to prods, by dst) aggregate via the precomputed
        # per-partition plans. Own-partition sums accumulate locally
        # (no serialization); remote partials go straight to the object
        # store — the driver ships only refs, data moves shard-to-shard.
        # dst partials are only remote when hub splitting rerouted hub
        # prods' edges by src (degree-aware skew handling).
        self._local_sums = np.zeros(self.n_local)
        staged: dict[int, list] = {}
        for side, msgs in (("src", self.m_r2u), ("dst", self.m_r2p)):
            order, bounds, local_sorted, groups = self.plans[side]
            msgs_sorted = self._t2
            np.take(msgs, order, out=msgs_sorted)
            for q in range(self.P):
                sl = slice(bounds[q], bounds[q + 1])
                if sl.start >= sl.stop:
                    continue
                uniq, inv = groups[q]
                n_q = len(range(q, self.N, self.P))
                if q == self.p:
                    # dense accumulate straight off the raw local indices
                    self._local_sums += np.bincount(
                        local_sorted[sl], weights=msgs_sorted[sl], minlength=self.n_local
                    )
                elif len(uniq) * 3 > n_q:
                    # DENSE partial (8 B/owned-vertex): when most of the
                    # peer's vertices are touched, (uniq, sums) pairs
                    # triple the bytes and at high fill the exchange
                    # volume caused plasma eviction churn (measured:
                    # 160M-edge run, 2.7 GB/superstep of sparse partials)
                    staged.setdefault(q, []).append(
                        ("d", np.bincount(local_sorted[sl], weights=msgs_sorted[sl], minlength=n_q))
                    )
                else:
                    sums = np.bincount(inv, weights=msgs_sorted[sl], minlength=len(uniq))
                    staged.setdefault(q, []).append(("s", (uniq, sums)))
        # ONE object-store put per shard (P² small puts cost ~1ms each
        # and dominate superstep overhead at high P); arrays come back
        # zero-copy, so each owner only touches its own slices
        self._partials = ray.put(staged) if staged else None
        t_partial = time.perf_counter() - t0
        return {
            "delta": float(delta),
            "partials": self._partials,
            "t_fetch": t_fetch, "t_gather": t_gather,
            "t_kernel": t_kernel, "t_partial": t_partial,
        }

    def apply(self, partial_refs: list) -> np.ndarray:
        S = self.prior_v + self._local_sums
        for peer_dict in ray.get(list(partial_refs)):
            parts = peer_dict.get(self.p) if peer_dict else None
            for kind, payload in parts or ():
                if kind == "d":
                    S += payload
                else:
                    idx, vals = payload
                    np.add.at(S, idx, vals)
        self.S = S
        # NOTE: _partials is intentionally NOT cleared here — peer
        # shards' apply() may still be fetching from us concurrently;
        # the next compute() overwrites it.
        # Returning S lets the driver feed apply FUTURES straight into
        # the next compute() round — no apply barrier, no per-step
        # get_state round; each shard's compute blocks only on its
        # peers' apply, shard-to-shard through the object store.
        return S

    # ---- read-outs ------------------------------------------------------
    @staticmethod
    def _sigmoid(d: np.ndarray) -> np.ndarray:
        # softmax[1] of the 2-class belief == sigmoid of its log-odds;
        # computed in log space for stability at extreme |d|
        return np.exp(d - np.logaddexp(0.0, d))

    def vertex_scores(self) -> pa.Table:
        return pa.table(
            {
                "vid": pa.array(self.vids),
                "kind": pa.array(self.kind),
                "score": pa.array(self._sigmoid(self.S)),
            }
        )

    def review_scores(self) -> pa.Table:
        b = self.prior_r + self.m_u2r + self.m_p2r
        return pa.table(
            {
                "src": pa.array(self.src),
                "dst": pa.array(self.dst),
                "score": pa.array(self._sigmoid(b)),
            }
        )

    # ---- checkpoint / resume --------------------------------------------
    def checkpoint(self, ckpt_dir: str, step: int) -> bool:
        d = os.path.join(ckpt_dir, f"step={step}")
        os.makedirs(d, exist_ok=True)
        cols = {"src": pa.array(self.src), "dst": pa.array(self.dst)}
        for name, arr in (
            ("u2r", self.m_u2r), ("p2r", self.m_p2r),
            ("r2u", self.m_r2u), ("r2p", self.m_r2p),
        ):
            cols[name] = pa.array(arr)
        pq.write_table(pa.table(cols), os.path.join(d, f"bp_edges_p{self.p}.parquet"))
        pq.write_table(
            pa.table({"vid": pa.array(self.vids), "s": pa.array(self.S)}),
            os.path.join(d, f"bp_vertex_p{self.p}.parquet"),
        )
        return True

    def restore(self, ckpt_dir: str, step: int) -> bool:
        d = os.path.join(ckpt_dir, f"step={step}")
        et = pq.read_table(os.path.join(d, f"bp_edges_p{self.p}.parquet"))
        for name, attr in (("u2r", "m_u2r"), ("p2r", "m_p2r"), ("r2u", "m_r2u"), ("r2p", "m_r2p")):
            setattr(self, attr, et[name].to_numpy(zero_copy_only=False).astype(np.float64))
        vt = pq.read_table(os.path.join(d, f"bp_vertex_p{self.p}.parquet"))
        self.S = vt["s"].to_numpy(zero_copy_only=False).astype(np.float64)
        return True


class SpEagleEngine:
    """Driver loop for the BP shard pool."""

    def __init__(self, layout, potentials: dict | None = None,
                 ckpt_dir: str | None = None, checkpoint_every: int = 0,
                 active_ref=None):
        self.layout = layout
        self.pot = potentials or default_potentials()
        self.ckpt_dir = ckpt_dir
        self.checkpoint_every = checkpoint_every
        self.active_ref = active_ref
        self.shards = [
            BPShard.remote(layout.path, p, self.pot, active_ref)
            for p in range(layout.P)
        ]
        self.metrics: list[dict] = []
        self.n_nodes = None  # set by caller for reference-style delta norm

    def run(self, max_iters: int, tol: float = 1e-3, resume: bool = False,
            n_nodes: int | None = None) -> dict:
        start = 0
        if resume and self.ckpt_dir:
            latest = self._latest_checkpoint()
            if latest is not None:
                ray.get([s.restore.remote(self.ckpt_dir, latest) for s in self.shards])
                start = latest + 1
        norm = float(n_nodes or self.layout.n_vertices)
        last = {}
        # bootstrap state refs once; afterwards each superstep's state
        # refs are the PREVIOUS apply futures (pipelined — the driver
        # never barriers on apply, exceptions surface at the next
        # compute's internal ray.get)
        state_refs = [s.get_state.remote() for s in self.shards]
        for it in range(start, max_iters):
            t0 = time.perf_counter()
            outs = ray.get([s.compute.remote(state_refs) for s in self.shards])
            delta = float(sum(o["delta"] for o in outs))
            # shard-to-shard partial exchange: compute() already put the
            # partials in the object store; the driver only routes refs
            # (one per shard; each owner picks its slice zero-copy)
            refs = [o["partials"] for o in outs if o["partials"] is not None]
            state_refs = [s.apply.remote(refs) for s in self.shards]
            dt = time.perf_counter() - t0
            mean_delta = delta / norm
            last = {"step": it, "seconds": dt, "delta": mean_delta}
            for key in ("t_fetch", "t_gather", "t_kernel", "t_partial"):
                last[key + "_max"] = max(o[key] for o in outs)
            self.metrics.append(last)
            if self.checkpoint_every and self.ckpt_dir and (it + 1) % self.checkpoint_every == 0:
                self._commit(it)
            if mean_delta < tol:
                break
        if self.ckpt_dir:
            os.makedirs(self.ckpt_dir, exist_ok=True)
            with open(os.path.join(self.ckpt_dir, "metrics.json"), "w") as f:
                json.dump(self.metrics, f)
        return last

    def _commit(self, step: int) -> None:
        ray.get([s.checkpoint.remote(self.ckpt_dir, step) for s in self.shards])
        with open(os.path.join(self.ckpt_dir, f"step_{step}.json"), "w") as f:
            json.dump({"step": step, "P": self.layout.P}, f)

    def _latest_checkpoint(self):
        if not self.ckpt_dir or not os.path.isdir(self.ckpt_dir):
            return None
        best = None
        for f in glob.glob(os.path.join(self.ckpt_dir, "step_*.json")):
            with open(f) as fh:
                s = json.load(fh)["step"]
            best = s if best is None else max(best, s)
        return best

    def refresh_shards(self, touched: list[int]) -> None:
        """Per-partition lineage invalidation after layout.append_edges —
        the engine analog of the reference's add_new_data
        (Detector/SpEagle.py:283-323): only touched shards reload; their
        messages reset to uniform and re-converge on the next run()
        while untouched shards keep state (cf. local_schedule,
        SpEagle.py:381-422)."""
        from ugfraud_ray.state.layout import GraphLayout

        self.layout = GraphLayout.load(self.layout.path)
        for p in touched:
            ray.kill(self.shards[p])
            self.shards[p] = BPShard.remote(self.layout.path, p, self.pot, self.active_ref)

    def vertex_scores(self) -> "ray.data.Dataset":
        return ray.data.from_arrow_refs([s.vertex_scores.remote() for s in self.shards])

    def review_scores(self) -> "ray.data.Dataset":
        return ray.data.from_arrow_refs([s.review_scores.remote() for s in self.shards])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


def speagle(
    edges_with_prior: "ray.data.Dataset",
    vertex_prior: "ray.data.Dataset",
    n_vertices: int,
    layout_dir: str,
    P: int = 4,
    potentials: dict | None = None,
    max_iters: int = 20,
    tol: float = 1e-3,
    hub_threshold: int | None = None,
    ckpt_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    early_stop_at: float = 1.0,
) -> tuple["ray.data.Dataset", "ray.data.Dataset", list[dict]]:
    """Run SpEagle BP to convergence.

    edges_with_prior: (src, dst, prior) review edges (prior = review
    prior in [0,1]); vertex_prior: (vid, prior, kind 1=user/0=prod).
    hub_threshold: in-degree above which a product's edges are spread
    by src across shards (two-level combine through the generic
    partial exchange — degree-aware skew splitting).
    early_stop_at: the reference's schedule-fraction cap
    (SpEagle.py:424-436) — only nodes inside the first
    ``int((N+E)·early_stop_at)`` slots of the degree-descending
    schedule update their OUTGOING messages; the rest keep the uniform
    init, exactly like the reference's untouched Node objects (Jacobi
    mapping: vertices fill the prefix first — reviews have degree 2
    and trail the schedule — and a review node is active iff its user
    is). 1.0 (default) disables the machinery entirely.
    Returns (vertex_scores, review_scores, metrics).
    """
    from ugfraud_ray.state.layout import build_layout

    layout = build_layout(
        edges_with_prior, n_vertices, layout_dir, P=P,
        edge_cols=["prior"], vertex_aux=vertex_prior,
        hub_threshold=hub_threshold,
    )
    active_ref = None
    if early_stop_at < 1.0:
        from ugfraud_ray.stages.graph_build import dense_degrees

        n_edges_pre = edges_with_prior.count()

        deg = dense_degrees(
            edges_with_prior.select_columns(["src", "dst"]), "src", n_vertices
        ) + dense_degrees(
            edges_with_prior.select_columns(["src", "dst"]), "dst", n_vertices
        )
        k_v = min(
            n_vertices, max(0, int((n_vertices + n_edges_pre) * early_stop_at))
        )
        order = np.lexsort((np.arange(n_vertices), -deg))  # deg desc, vid asc
        active_ref = ray.put(np.sort(order[:k_v]).astype(np.int64))
    eng = SpEagleEngine(layout, potentials, ckpt_dir=ckpt_dir,
                        checkpoint_every=checkpoint_every,
                        active_ref=active_ref)
    n_edges = edges_with_prior.count()
    eng.run(max_iters=max_iters, tol=tol, resume=resume,
            n_nodes=n_vertices + n_edges)
    vs = eng.vertex_scores().materialize()
    rs = eng.review_scores().materialize()
    eng.shutdown()
    return vs, rs, eng.metrics
