"""Semi-supervised label propagation as a superstep vertex program.

Reference analog: SpEagle's BP *is* weighted label propagation and GANG
is its linearized form (SURVEY §2.12). Standard k-class LP:

    f'_v = normalize( Σ_{u~v} w_uv f_u )   for unlabeled v
    f'_v = one_hot(y_v)                    for seeded v (clamped)

Deterministic: synchronous (Jacobi) updates, argmax with lowest-class
tie-break at readout. Seeds come from a (vid, label) table attached as
vertex aux; the graph is symmetrized by the driver function.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ugfraud_ray.state.engine import SuperstepEngine, VertexProgram
from ugfraud_ray.state.layout import build_layout, symmetrize


class LabelPropProgram(VertexProgram):
    combine = "sum"

    def __init__(self, n_classes: int):
        self.k = n_classes
        self.state_dim = n_classes

    def init_state(self, vids, shard):
        lab = shard.vertex_aux("seed_label", -1.0)
        state = np.full((len(vids), self.k), 1.0 / self.k)
        seeded = lab >= 0
        state[seeded] = 0.0
        state[seeded, lab[seeded].astype(np.int64)] = 1.0
        return state

    def message(self, src_state, edge_data, shard):
        return src_state

    def apply(self, vids, old, agg, have_msg, aux, shard):
        lab = shard.vertex_aux("seed_label", -1.0)
        seeded = lab >= 0
        sums = agg.sum(axis=1, keepdims=True)
        ok = (sums[:, 0] > 0) & have_msg & ~seeded
        new = old.copy()
        new[ok] = agg[ok] / sums[ok]
        return new, {"delta": float(np.abs(new - old).sum())}


def label_propagation(
    edges: "ray.data.Dataset",
    seeds: "ray.data.Dataset",
    n_vertices: int,
    n_classes: int,
    layout_dir: str,
    P: int = 4,
    max_iters: int = 30,
    tol: float = 1e-6,
    hub_threshold: int | None = None,
) -> tuple["ray.data.Dataset", list[dict]]:
    """seeds: Dataset(vid, seed_label in [0, n_classes)).

    Returns (Dataset(vid, label, score), metrics) where label is the
    argmax class (lowest class wins ties) and score its probability.
    """
    sym = symmetrize(edges.select_columns(["src", "dst"]))
    # small materialized inputs: materialize sym so build_layout's
    # driver-local write path applies (count is free only then)
    import ray.data as _rd

    if isinstance(edges, _rd.dataset.MaterializedDataset) and edges.count() * 2 <= 1_000_000:
        sym = sym.materialize()
    layout = build_layout(sym, n_vertices, layout_dir, P=P, hub_threshold=hub_threshold, vertex_aux=seeds)
    eng = SuperstepEngine(layout, LabelPropProgram(n_classes))
    eng.run(max_iters=max_iters, tol=tol)

    def readout(t: pa.Table) -> pa.Table:
        probs = np.column_stack(
            [t[f"s{j}"].to_numpy(zero_copy_only=False) for j in range(n_classes)]
        )
        label = probs.argmax(axis=1).astype(np.int64)
        score = probs[np.arange(len(label)), label]
        return pa.table({"vid": t["vid"], "label": pa.array(label), "score": pa.array(score)})

    out = eng.result_dataset().map_batches(readout, batch_format="pyarrow").materialize()
    eng.shutdown()
    return out, eng.metrics
