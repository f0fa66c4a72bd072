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

Scale shape, two paths (agreement-tested at 1e-9 — float summation
order differs between them):

- ≤ ``local_threshold`` edges: dense (n, |S|) driver matrices and a
  collected-edge ``np.add.at`` per round (the usual spin-up gate).
- above it: ``_BrandesProgram`` on the vid-sharded ``SuperstepEngine``
  (state/engine.py) — per-vertex state is the (dist, sigma, delta)
  triple per source (3|S| float64 columns), the graph is laid out ONCE
  symmetrized with a ``fwd`` direction flag edge column, forward
  supersteps send sigma along fwd edges and backward supersteps send
  the (1+delta)/sigma coefficient along the reversed ones; the driver
  holds no per-vertex arrays. |S| is the batching knob: at web scale
  sources are processed in fixed-width batches (no cross-column
  coupling), so per-shard memory is n_local·batch·24 bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


class _BrandesProgram:
    """Radius-bounded Brandes as 2R supersteps on the symmetrized
    fwd-flagged layout. state = (dist[S], sigma[S], delta[S]); forward
    steps 0..R−1 send sigma over fwd edges from the level-(r−1)
    frontier, backward steps R..2R−1 send (1+delta)/sigma over the
    reversed edges from level r, and apply folds agg·sigma into delta
    at level r−1. Per-shard step counters stay in sync because every
    shard applies every superstep (the MISProgram pattern)."""

    combine = "sum"
    edge_cols = ("fwd",)

    def __init__(self, sources: np.ndarray, radius: int):
        self.sources = np.asarray(sources, dtype=np.int64)
        self.S = len(self.sources)
        self.R = int(radius)
        self.state_dim = 3 * self.S
        self.msg_dim = self.S
        self.step = 0

    def init_state(self, vids: np.ndarray, shard) -> np.ndarray:
        S = self.S
        st = np.zeros((len(vids), 3 * S), dtype=np.float64)
        st[:, :S] = -1.0
        for s, sv in enumerate(self.sources.tolist()):
            m = vids == sv
            st[m, s] = 0.0
            st[m, S + s] = 1.0
        return st

    def prepare_edges(self, edge_table: pa.Table, shard) -> np.ndarray:
        return (
            edge_table["fwd"].to_numpy(zero_copy_only=False).astype(np.float64)[:, None]
        )

    def message(self, src_state: np.ndarray, edge_data, shard) -> np.ndarray:
        S, R = self.S, self.R
        dist = src_state[:, :S]
        sigma = src_state[:, S : 2 * S]
        if self.step < R:
            r = self.step + 1
            return np.where(dist == float(r - 1), sigma, 0.0) * edge_data
        r = 2 * R - self.step
        delta = src_state[:, 2 * S :]
        sig_safe = np.where(sigma > 0, sigma, 1.0)
        coef = np.where(dist == float(r), (1.0 + delta) / sig_safe, 0.0)
        return coef * (1.0 - edge_data)

    def apply(self, vids, old, agg, have_msg, aux, shard):
        S, R = self.S, self.R
        new = old.copy()
        dist = new[:, :S]
        if self.step < R:
            r = self.step + 1
            newly = (agg > 0) & (dist == -1.0)
            dist[newly] = float(r)
            new[:, S : 2 * S][newly] = agg[newly]
        else:
            r = 2 * R - self.step
            at_prev = dist == float(r - 1)
            new[:, 2 * S :] += np.where(at_prev, new[:, S : 2 * S] * agg, 0.0)
        self.step += 1
        return new, {"delta": 1.0}

    def init_stats(self, vids, state, shard) -> dict:
        return {}

    def reduce_stats(self, stats: list[dict]) -> dict:
        out: dict = {}
        for s in stats:
            for k_, v in s.items():
                out[k_] = out.get(k_, 0.0) + v
        return out


def _bc_sharded(
    edges: "ray.data.Dataset",
    n: int,
    sources: np.ndarray,
    radius: int,
    P: int,
    layout_dir: str | None,
) -> pa.Table:
    import tempfile

    from ugfraud_ray.functions.collect import collect_table
    from ugfraud_ray.state.engine import SuperstepEngine
    from ugfraud_ray.state.layout import build_layout

    e = edges.select_columns(["src", "dst"])

    def fwd(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "fwd": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    def rev(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t["dst"],
                "dst": t["src"],
                "fwd": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            }
        )

    flagged = e.map_batches(fwd, batch_format="pyarrow").union(
        e.map_batches(rev, batch_format="pyarrow")
    ).materialize()
    layout = build_layout(
        flagged,
        n,
        layout_dir or tempfile.mkdtemp(prefix="bc_"),
        P=P,
        edge_cols=["fwd"],
    )
    prog = _BrandesProgram(sources, radius)
    eng = SuperstepEngine(layout, prog)
    eng.run(max_iters=2 * radius, tol=None)
    S = prog.S
    src_cols = prog.sources

    def readout(t: pa.Table) -> pa.Table:
        vid = t["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
        delta = np.column_stack(
            [t[f"s{2 * S + s}"].to_numpy(zero_copy_only=False) for s in range(S)]
        )
        for s, sv in enumerate(src_cols.tolist()):  # Brandes sums s != v
            delta[vid == sv, s] = 0.0
        return pa.table({"vid": pa.array(vid), "betweenness": pa.array(delta.sum(axis=1))})

    rt = collect_table(eng.result_dataset().map_batches(readout, batch_format="pyarrow"))
    eng.shutdown()
    order = np.argsort(rt["vid"].to_numpy(zero_copy_only=False))
    return rt.take(pa.array(order))


def betweenness_subset(
    edges: "ray.data.Dataset",
    n_vertices: int,
    sources: np.ndarray,
    radius: int = 4,
    local_threshold: int = 5_000_000,
    approx_edges: int | None = None,
    P: int = 4,
    layout_dir: str | None = None,
) -> pa.Table:
    """bc(v) = Σ_{s∈sources, s≠v} delta_s(v) over shortest paths of
    length ≤ radius on the DIRECTED vid-domain edge table. Returns
    (vid, betweenness) for all n_vertices, ascending vid."""
    n = n_vertices
    # unknown size is treated as LARGE: collecting an unhinted input
    # to the driver is the one unrecoverable choice at scale
    if approx_edges is None or approx_edges > local_threshold:
        return _bc_sharded(edges, n, np.asarray(sources, np.int64), radius, P, layout_dir)

    S = len(sources)
    src_cols = np.asarray(sources, dtype=np.int64)
    dist = np.full((n, S), -1, dtype=np.int16)
    sigma = np.zeros((n, S), dtype=np.int64)
    dist[src_cols, np.arange(S)] = 0
    sigma[src_cols, np.arange(S)] = 1

    from ugfraud_ray.functions.collect import collect_table

    t = collect_table(edges.select_columns(["src", "dst"]))
    a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)

    # forward: levels 1..radius
    for r in range(1, radius + 1):
        active = dist == (r - 1)
        acc = np.zeros((n, S), dtype=np.int64)
        np.add.at(acc, b, sigma[a] * active[a])
        newly = (acc > 0) & (dist == -1)
        dist[newly] = r
        sigma[newly] = acc[newly]

    # backward: levels radius..1 (delta starts all-zero)
    delta = np.zeros((n, S), dtype=np.float64)
    sig_safe = np.where(sigma > 0, sigma, 1).astype(np.float64)
    for r in range(radius, 0, -1):
        coef = np.where(dist == r, (1.0 + delta) / sig_safe, 0.0)
        at_prev = dist == (r - 1)
        dacc = np.zeros((n, S), dtype=np.float64)
        np.add.at(dacc, a, sigma[a] * coef[b] * at_prev[a])
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
