"""Weighted single/multi-source shortest paths (Bellman-Ford supersteps).

The weighted generalization of `pipelines/bfs.py` (SpEagle's
`local_schedule` IS a bounded Dijkstra over the review graph,
/root/reference Detector/SpEagle.py:381-422 — its distance map is this
kernel's output restricted to num_hops). Same min-plus shape: messages
carry dist(src) + w(edge) through the engine's `edge_cols` channel;
min combine; converges after (longest shortest path in hops) supersteps
for positive weights. Exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ugfraud_ray.state.engine import SuperstepEngine, VertexProgram
from ugfraud_ray.state.layout import build_layout, symmetrize

_UNREACHED = 1e18


class SSSPProgram(VertexProgram):
    state_dim = 1
    combine = "min"
    edge_cols = ("w",)

    def __init__(self, seed_vids: np.ndarray):
        self._seeds = np.asarray(seed_vids, dtype=np.int64)

    def init_state(self, vids, shard):
        d = np.full(len(vids), _UNREACHED, dtype=np.float64)
        d[np.isin(vids, self._seeds)] = 0.0
        return d[:, None]

    def prepare_edges(self, edge_table, shard):
        return edge_table["w"].to_numpy(zero_copy_only=False).astype(np.float64)

    def message(self, src_state, edge_data, shard):
        return src_state[:, 0] + edge_data

    def apply(self, vids, old, agg, have_msg, aux, shard):
        new = np.where(have_msg, np.minimum(old[:, 0], agg[:, 0]), old[:, 0])
        return new, {"delta": float((new != old[:, 0]).sum())}


def shortest_paths(
    edges: "ray.data.Dataset",
    n_vertices: int,
    seed_vids: np.ndarray,
    layout_dir: str,
    P: int = 4,
    max_iters: int = 500,
    directed: bool = False,
    hub_threshold: int | None = None,
) -> tuple["ray.data.Dataset", list[dict]]:
    """Weighted distances from the seed set over edges (src, dst,
    w:positive). Returns (Dataset(vid, dist:float64) restricted to
    REACHED vertices, metrics). Integer weights yield integer distances.
    """
    e = edges.select_columns(["src", "dst", "w"])
    if not directed:
        e = symmetrize(e)
        import ray.data as _rd

        if isinstance(edges, _rd.dataset.MaterializedDataset) and edges.count() * 2 <= 1_000_000:
            e = e.materialize()
    layout = build_layout(
        e, n_vertices, layout_dir, P=P, hub_threshold=hub_threshold, edge_cols=["w"]
    )
    eng = SuperstepEngine(layout, SSSPProgram(seed_vids))
    eng.run(max_iters=max_iters, tol=0.0)

    def readout(t: pa.Table) -> pa.Table:
        d = t["s0"].to_numpy(zero_copy_only=False)
        keep = d < _UNREACHED
        return pa.table(
            {
                "vid": t["vid"].filter(pa.array(keep)),
                "dist": pa.array(d[keep]),
            }
        )

    out = eng.result_dataset().map_batches(readout, batch_format="pyarrow").materialize()
    eng.shutdown()
    return out, eng.metrics
