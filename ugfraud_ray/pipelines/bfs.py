"""Multi-source BFS hop distance (single/multi-source shortest paths,
unweighted) via min-plus supersteps.

Reference analog: SpEagle's `schedule('bfs')` walks the graph in BFS
order to build its sweep schedule (/root/reference
Detector/SpEagle.py:354-379) and `local_schedule` re-propagates a
Dijkstra <= num_hops neighborhood after incremental growth
(SpEagle.py:381-422, SURVEY I5). The engine exposes the distance
computation itself as a first-class kernel: every vertex holds its
current best hop count (seeds 0, others +inf) and each superstep takes
``min(old, min_neighbors(dist) + 1)`` — the same partition-parallel
hash-min shape as connected components, so hub splitting and the
two-level min combine apply unchanged. Converges in diameter(G)
supersteps; exact hop distances (north-rule exact-match family).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ugfraud_ray.state.engine import SuperstepEngine, VertexProgram
from ugfraud_ray.state.layout import build_layout, symmetrize

_UNREACHED = 1e18


class BFSHopsProgram(VertexProgram):
    """dist(v) = 0 for seeds; superstep: dist = min(dist, min_in(dist)+1)."""

    state_dim = 1
    combine = "min"

    def __init__(self, seed_vids: np.ndarray):
        self._seeds = np.asarray(seed_vids, dtype=np.int64)

    def init_state(self, vids, shard):
        d = np.full(len(vids), _UNREACHED, dtype=np.float64)
        d[np.isin(vids, self._seeds)] = 0.0
        return d[:, None]

    def message(self, src_state, edge_data, shard):
        return src_state[:, 0] + 1.0

    def apply(self, vids, old, agg, have_msg, aux, shard):
        new = np.where(have_msg, np.minimum(old[:, 0], agg[:, 0]), old[:, 0])
        return new, {"delta": float((new != old[:, 0]).sum())}


def bfs_hops(
    edges: "ray.data.Dataset",
    n_vertices: int,
    seed_vids: np.ndarray,
    layout_dir: str,
    P: int = 4,
    max_iters: int = 64,
    directed: bool = False,
    hub_threshold: int | None = None,
) -> tuple["ray.data.Dataset", list[dict]]:
    """Hop distance from the seed set; returns (Dataset(vid, hops:int64)
    restricted to REACHED vertices, metrics). Exact (runs to fixpoint
    within max_iters; the fixpoint is reached after diameter steps)."""
    e = edges.select_columns(["src", "dst"])
    if not directed:
        e = symmetrize(e)
        import ray.data as _rd

        if isinstance(edges, _rd.dataset.MaterializedDataset) and edges.count() * 2 <= 1_000_000:
            e = e.materialize()
    layout = build_layout(e, n_vertices, layout_dir, P=P, hub_threshold=hub_threshold)
    eng = SuperstepEngine(layout, BFSHopsProgram(seed_vids))
    eng.run(max_iters=max_iters, tol=0.0)

    def readout(t: pa.Table) -> pa.Table:
        d = t["s0"].to_numpy(zero_copy_only=False)
        keep = d < _UNREACHED
        return pa.table(
            {
                "vid": t["vid"].filter(pa.array(keep)),
                "hops": pa.array(d[keep].astype(np.int64)),
            }
        )

    out = eng.result_dataset().map_batches(readout, batch_format="pyarrow").materialize()
    eng.shutdown()
    return out, eng.metrics


def double_sweep_diameter(
    edges: "ray.data.Dataset",
    n_vertices: int,
    layout_dir: str,
    P: int = 4,
    max_iters: int = 64,
) -> "ray.data.Dataset":
    """Double-sweep diameter lower bound (the standard practical
    estimator): BFS from the min vid, then BFS from the farthest vertex
    found (ties to min vid). One row: (v0, ecc0, v1, diameter_lb).
    Deterministic, exactly replayable — both sweeps are the bfs_hops
    kernel."""
    import os

    def farthest(hops_ds) -> tuple[int, int]:
        # per-block (max hops, min vid at max) partials merged on the
        # driver — O(blocks) driver state, the per-vertex hop table
        # never materializes on the driver
        @ray.remote
        def block_argmax(t: pa.Table) -> tuple[int, int]:
            if t.num_rows == 0:
                return -1, -1
            h = t["hops"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = t["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
            m = int(h.max())
            return int(v[h == m].min()), m

        parts = ray.get([block_argmax.remote(b) for b in hops_ds.to_arrow_refs()])
        parts = [p for p in parts if p[1] >= 0]
        ecc = max(p[1] for p in parts)
        v = min(p[0] for p in parts if p[1] == ecc)
        return v, ecc

    v0 = 0  # min vid: numbering is contiguous from 0
    h0, _ = bfs_hops(
        edges, n_vertices, np.array([v0], dtype=np.int64),
        os.path.join(layout_dir, "s1"), P=P, max_iters=max_iters,
    )
    v1, ecc0 = farthest(h0)
    h1, _ = bfs_hops(
        edges, n_vertices, np.array([v1], dtype=np.int64),
        os.path.join(layout_dir, "s2"), P=P, max_iters=max_iters,
    )
    _, diameter_lb = farthest(h1)
    return ray.data.from_arrow(
        pa.table(
            {
                "v0": pa.array([v0], pa.int64()),
                "ecc0": pa.array([ecc0], pa.int64()),
                "v1": pa.array([v1], pa.int64()),
                "diameter_lb": pa.array([diameter_lb], pa.int64()),
            }
        )
    )
