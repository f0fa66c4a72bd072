"""HITS (hubs & authorities) as a superstep vertex program.

The natural companion to PageRank on a web link graph (SURVEY §2.12):
the reference's GANG/SpEagle SpMV supersteps generalize directly —
HITS is power iteration on the bipartite operator [[0, Aᵀ], [A, 0]]
(reference analog: Detector/GANG.py:114-137 runs the same
`x <- A x` shape per superstep).

Synchronous (Jacobi) update with delayed normalization:

    a_t(v) = Σ_{u→v} h_{t-1}(u) / ||h_{t-1}||₂
    h_t(u) = Σ_{u→v} a_{t-1}(v) / ||a_{t-1}||₂

The ℓ2 norms are GLOBAL sums of squares — per-shard partials travel on
the engine's stats channel (reduced by the driver, fed back as `aux`
on the next superstep), exactly the dangling-mass pattern in
`pipelines/pagerank.py`. Because the message kernel is linear in the
source state, dividing the *aggregate* by the previous step's norm is
bit-equivalent to normalizing the state before sending — so the stored
state stays O(spectral norm) bounded without a mid-step barrier.

Both directions ride ONE layout: the edge table is symmetrized with a
`fwd` flag (u→v keeps fwd=1; the reversed copy v→u gets fwd=0), and
the message routes h along forward edges into the authority slot and a
along reversed edges into the hub slot. Hub splitting and the engine's
dst-local aggregation apply unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.state.engine import SuperstepEngine, VertexProgram
from ugfraud_ray.state.layout import build_layout


class HITSProgram(VertexProgram):
    state_dim = 2  # s0 = authority, s1 = hub
    combine = "sum"
    edge_cols = ("fwd",)

    def init_state(self, vids, shard):
        return np.ones((len(vids), 2), dtype=np.float64)

    def init_stats(self, vids, state, shard):
        # sums of squares of the all-ones initial state
        return {"sa": float(len(vids)), "sh": float(len(vids))}

    def prepare_edges(self, edge_table: pa.Table, shard):
        fwd = edge_table["fwd"].to_numpy(zero_copy_only=False).astype(bool)
        return fwd

    def message(self, src_state, fwd, shard):
        m = np.zeros((len(fwd), 2), dtype=np.float64)
        m[fwd, 0] = src_state[fwd, 1]  # h(src) -> authority of dst
        m[~fwd, 1] = src_state[~fwd, 0]  # a(src of reversed) -> hub of dst
        return m

    def apply(self, vids, old, agg, have_msg, aux, shard):
        nh = np.sqrt(aux.get("sh", 0.0)) or 1.0
        na = np.sqrt(aux.get("sa", 0.0)) or 1.0
        new = np.empty_like(old)
        new[:, 0] = agg[:, 0] / nh
        new[:, 1] = agg[:, 1] / na
        return new, {
            "delta": float(np.abs(new - old).sum()),
            "sa": float(np.square(new[:, 0]).sum()),
            "sh": float(np.square(new[:, 1]).sum()),
        }


def symmetrize_with_direction(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """(src,dst) -> both directions with a fwd∈{1,0} flag (one pass)."""

    def both(t: pa.Table) -> pa.Table:
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
            }
        )

    return edges.map_batches(both, batch_format="pyarrow")


def hits(
    edges: "ray.data.Dataset",
    n_vertices: int,
    layout_dir: str,
    P: int = 4,
    max_iters: int = 20,
    tol: float | None = None,
    hub_threshold: int | None = None,
) -> tuple["ray.data.Dataset", list[dict]]:
    """Run HITS; returns (Dataset(vid, authority, hub), per-step metrics).

    The readout is the standard unit-ℓ2 normalization of the final
    iterate (scale-invariant, so the delayed-normalization scheme and a
    textbook normalize-every-step loop agree exactly).
    """
    sym = symmetrize_with_direction(edges)
    import ray.data as _rd

    if isinstance(edges, _rd.dataset.MaterializedDataset) and edges.count() <= 1_000_000:
        sym = sym.materialize()
    layout = build_layout(
        sym, n_vertices, layout_dir, P=P, hub_threshold=hub_threshold, edge_cols=["fwd"]
    )
    eng = SuperstepEngine(layout, HITSProgram())
    final_aux = eng.run(max_iters=max_iters, tol=tol)
    na = np.sqrt(final_aux.get("sa", 0.0)) or 1.0
    nh = np.sqrt(final_aux.get("sh", 0.0)) or 1.0

    def readout(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": t["vid"],
                "authority": pa.array(
                    t["s0"].to_numpy(zero_copy_only=False) / na
                ),
                "hub": pa.array(t["s1"].to_numpy(zero_copy_only=False) / nh),
            }
        )

    out = eng.result_dataset().map_batches(readout, batch_format="pyarrow").materialize()
    eng.shutdown()
    return out, eng.metrics
