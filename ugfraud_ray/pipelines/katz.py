"""Katz centrality as a superstep vertex program.

Reference analog: GANG's `pu_lbp` power iteration `x <- p + c A x`
(/root/reference Detector/GANG.py:114-137) IS the Katz recursion with
p = 1 and c = alpha — this pipeline runs the textbook attenuation form
(Katz 1953) over the directed web graph:

    x_{t+1}(v) = beta + alpha * sum_{u -> v} x_t(u),   x_0(v) = beta

for a FIXED number of supersteps (the practical form: alpha below the
spectral-radius bound, truncated series), so the SQL oracle replays it
as a recursive CTE exactly like the PageRank oracle. Next to PageRank
(out-degree-normalized) and HITS/SALSA (mutual reinforcement), Katz is
the unnormalized prestige ranking — hubs pumping many low-value links
score differently under each, which is why web-spam analysis wants all
three.

Scale shape: identical to PageRank minus the weight column and the
dangling channel — one `message = src_state` sum-combine per superstep
on the shared vid-sharded layout; no extra shuffle, no broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ugfraud_ray.state.engine import SuperstepEngine, VertexProgram
from ugfraud_ray.state.layout import GraphLayout, build_layout


class KatzProgram(VertexProgram):
    state_dim = 1
    combine = "sum"

    def __init__(self, alpha: float = 0.05, beta: float = 1.0):
        self.alpha = alpha
        self.beta = beta

    def init_state(self, vids, shard):
        return np.full((len(vids), 1), self.beta, dtype=np.float64)

    def message(self, src_state, edge_data, shard):
        return src_state[:, 0]

    def apply(self, vids, old, agg, have_msg, aux, shard):
        # sum-combine defaults to 0 where no in-edges, matching the
        # COALESCE(sum, 0) of the SQL replay
        new = self.beta + self.alpha * agg[:, 0]
        return new, {"delta": float(np.abs(new - old[:, 0]).sum())}


def katz_centrality(
    edges: "ray.data.Dataset",
    n_vertices: int,
    layout_dir: str,
    P: int = 4,
    alpha: float = 0.05,
    beta: float = 1.0,
    iters: int = 8,
    hub_threshold: int | None = None,
) -> tuple["ray.data.Dataset", list[dict]]:
    """Run `iters` fixed Katz supersteps over the DIRECTED edge table;
    returns (Dataset(vid, katz), per-superstep metrics)."""
    src = edges.select_columns(["src", "dst"])
    import ray.data as _rd

    if isinstance(edges, _rd.dataset.MaterializedDataset) and edges.count() <= 1_000_000:
        src = src.materialize()
    layout = build_layout(src, n_vertices, layout_dir, P=P, hub_threshold=hub_threshold)
    eng = SuperstepEngine(layout, KatzProgram(alpha=alpha, beta=beta))
    eng.run(max_iters=iters, tol=None)
    out = eng.result_dataset().rename_columns({"s0": "katz"}).materialize()
    eng.shutdown()
    return out, eng.metrics
