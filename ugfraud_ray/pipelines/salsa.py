"""SALSA (Stochastic Approach for Link-Structure Analysis, Lempel &
Moran 2000) as a superstep vertex program.

The degree-normalized sibling of HITS (`pipelines/hits.py`): instead of
plain adjacency power iteration, each step is one move of the
alternating random walk on the bipartite hub/authority view —

    a_t(v) = Σ_{u→v} h_{t-1}(u) / outdeg(u)
    h_t(u) = Σ_{u→v} a_{t-1}(v) / indeg(v)

Both operators are (sub-)stochastic, so the fixed-iteration loop needs
NO normalization channel — the only difference from HITS is a per-edge
weight 1/deg(source of the message). Reference analog: the same SpMV
superstep shape as GANG's `x <- A x` (/root/reference
Detector/GANG.py:114-137) with a column-stochastic A.

Scale shape: degrees come from `stages.graph_build.dense_degrees`
(bincount tree-reduce) and are broadcast ONCE via ``ray.put`` into the
weighted symmetrize pass — an n-sized float64 array, fine to ~100M
vertices per node; beyond that the weight attach becomes the same
bucketed degree join used by `pipelines/contraction.py`. Everything
else (hub splitting, dst-local aggregation, P-way vid sharding) rides
the engine unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.state.engine import SuperstepEngine, VertexProgram
from ugfraud_ray.state.layout import build_layout


class SALSAProgram(VertexProgram):
    state_dim = 2  # s0 = authority, s1 = hub
    combine = "sum"
    edge_cols = ("fwd", "w")

    def init_state(self, vids, shard):
        return np.ones((len(vids), 2), dtype=np.float64)

    def prepare_edges(self, edge_table: pa.Table, shard):
        fwd = edge_table["fwd"].to_numpy(zero_copy_only=False).astype(bool)
        w = edge_table["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        return fwd, w

    def message(self, src_state, prep, shard):
        fwd, w = prep
        m = np.zeros((len(fwd), 2), dtype=np.float64)
        # h(src)/outdeg(src) -> authority of dst along forward edges
        m[fwd, 0] = src_state[fwd, 1] * w[fwd]
        # a(src of reversed)/indeg(src) -> hub of dst along reversed edges
        m[~fwd, 1] = src_state[~fwd, 0] * w[~fwd]
        return m

    def apply(self, vids, old, agg, have_msg, aux, shard):
        # stochastic operator: the aggregate IS the next state (vertices
        # with no in-/out-edges decay to 0, matching the SQL COALESCE 0)
        new = agg.copy()
        return new, {"delta": float(np.abs(new - old).sum())}


def symmetrize_with_weights(
    edges: "ray.data.Dataset", n_vertices: int
) -> "ray.data.Dataset":
    """(src,dst) -> both directions with fwd∈{1,0} and the SALSA walk
    weight: forward edges carry 1/outdeg(src), reversed edges carry
    1/indeg(original dst) — i.e. always 1/deg of the vertex the message
    LEAVES. Degrees are dense bincounts broadcast once."""
    from ugfraud_ray.stages.graph_build import dense_degrees

    e = edges.select_columns(["src", "dst"]).materialize()
    outdeg = dense_degrees(e, "src", n_vertices).astype(np.float64)
    indeg = dense_degrees(e, "dst", n_vertices).astype(np.float64)
    out_ref = ray.put(np.where(outdeg > 0, outdeg, 1.0))
    in_ref = ray.put(np.where(indeg > 0, indeg, 1.0))

    def both(t: pa.Table) -> pa.Table:
        od = ray.get(out_ref)
        idg = ray.get(in_ref)
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(src)
        return pa.table(
            {
                "src": pa.array(np.concatenate([src, dst])),
                "dst": pa.array(np.concatenate([dst, src])),
                "fwd": pa.array(
                    np.concatenate(
                        [np.ones(n, dtype=np.int8), np.zeros(n, dtype=np.int8)]
                    )
                ),
                "w": pa.array(
                    np.concatenate([1.0 / od[src], 1.0 / idg[dst]])
                ),
            }
        )

    return e.map_batches(both, batch_format="pyarrow")


def salsa(
    edges: "ray.data.Dataset",
    n_vertices: int,
    layout_dir: str,
    P: int = 4,
    max_iters: int = 5,
    hub_threshold: int | None = None,
) -> tuple["ray.data.Dataset", list[dict]]:
    """Run ``max_iters`` SALSA walk steps from the all-ones start;
    returns (Dataset(vid, salsa_authority, salsa_hub), per-step
    metrics). Fixed iteration count, no normalization — the SQL oracle
    replays the identical recursion."""
    sym = symmetrize_with_weights(edges, n_vertices)
    import ray.data as _rd

    if isinstance(edges, _rd.dataset.MaterializedDataset) and edges.count() <= 1_000_000:
        sym = sym.materialize()
    layout = build_layout(
        sym,
        n_vertices,
        layout_dir,
        P=P,
        hub_threshold=hub_threshold,
        edge_cols=["fwd", "w"],
    )
    eng = SuperstepEngine(layout, SALSAProgram())
    eng.run(max_iters=max_iters, tol=None)

    def readout(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": t["vid"],
                "salsa_authority": t["s0"],
                "salsa_hub": t["s1"],
            }
        )

    out = eng.result_dataset().map_batches(readout, batch_format="pyarrow").materialize()
    eng.shutdown()
    return out, eng.metrics
