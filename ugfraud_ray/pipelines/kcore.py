"""k-core decomposition: iterated low-degree peeling to a fixpoint.

No direct reference implementation (like the §2.12 kernels); the
closest analog is FRAUDAR's greedy peel (`Detector/Fraudar.py:195-249`)
— k-core is its order-free cousin: instead of one sequential argmin
stream, EVERY vertex below the degree bound drops each round, so
rounds are Jacobi supersteps and trivially partition-parallel.

Semantics (pinned so the SQL oracle replays them exactly):
- the graph is the canonical undirected simple graph: directed edges
  collapse to deduped (min, max) pairs, self-loops excluded upstream;
- alive_0 = all vertices; alive_{i+1} = {v ∈ alive_i :
  deg_{alive_i}(v) ≥ k}, where deg counts only edges with BOTH
  endpoints alive;
- the loop stops at the first i with |alive_{i+1}| == |alive_i|
  (alive shrinks monotonically, so equal counts ⇒ equal sets) or at
  ``max_iters`` — the same post-hoc stop replay pattern as the GANG
  oracle.

Scale shape: ≤ local_threshold edges the loop runs driver-local
(bincount over the collected pair table — the usual shuffle-spin-up
gate); above it the peel runs as a ``KCoreProgram`` on the vid-sharded
``SuperstepEngine`` (state/engine.py): each shard owns its slice of
the alive state, messages are the src alive flags summed dst-local, so
the driver holds NO per-vertex arrays during the rounds (only the
final membership readout is assembled). Both paths compute the
identical Jacobi fixpoint (parity-tested).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table
from ugfraud_ray.stages.graph_build import dedup_pairs


def _canonical_undirected(
    edges: "ray.data.Dataset", approx_edges: int | None
) -> "ray.data.Dataset":
    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"src": pa.array(np.minimum(s, d)), "dst": pa.array(np.maximum(s, d))}
        )

    return dedup_pairs(
        edges.map_batches(canon, batch_format="pyarrow"), approx_rows=approx_edges
    )


class KCoreProgram:
    """Vertex program for the distributed peel: s0 = alive flag; each
    superstep sums neighbors' alive flags (deg within the alive
    subgraph for an alive vertex) and re-thresholds. delta = flips, so
    ``tol=0.0`` stops at the first count-stable round — the exact
    semantics the SQL oracle replays."""

    state_dim = 1
    combine = "sum"
    edge_cols: tuple = ()

    def __init__(self, k: int):
        self.k = k

    def init_state(self, vids: np.ndarray, shard) -> np.ndarray:
        return np.ones((len(vids), 1), dtype=np.float64)

    def prepare_edges(self, edge_table, shard):
        return None

    def message(self, src_state: np.ndarray, edge_data, shard) -> np.ndarray:
        return src_state[:, 0]

    def apply(self, vids, old, agg, have_msg, aux, shard):
        alive = old[:, 0] > 0.0
        new = (alive & (agg[:, 0] >= float(self.k))).astype(np.float64)
        return new, {"delta": float((new != old[:, 0]).sum())}

    def init_stats(self, vids, state, shard) -> dict:
        return {}

    def reduce_stats(self, stats: list[dict]) -> dict:
        out: dict = {}
        for s in stats:
            for k_, v in s.items():
                out[k_] = out.get(k_, 0.0) + v
        return out


def kcore_members(
    edges: "ray.data.Dataset",
    n_vertices: int,
    k: int = 2,
    max_iters: int = 30,
    approx_edges: int | None = None,
    local_threshold: int = 5_000_000,
    P: int = 4,
    layout_dir: str | None = None,
) -> np.ndarray:
    """Boolean (n_vertices,) mask of the k-core over int-vid edges."""
    und = _canonical_undirected(edges, approx_edges)
    alive = np.ones(n_vertices, dtype=bool)

    if approx_edges is not None and approx_edges <= local_threshold:
        t = collect_table(und)
        a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        for _ in range(max_iters):
            keep = alive[a] & alive[b]
            deg = np.bincount(a[keep], minlength=n_vertices) + np.bincount(
                b[keep], minlength=n_vertices
            )
            new = alive & (deg >= k)
            if new.sum() == alive.sum():
                break
            alive = new
        return alive

    # engine path: alive state lives in the vid-sharded shards; the
    # driver never holds or broadcasts per-vertex arrays mid-loop
    import tempfile

    from ugfraud_ray.state.engine import SuperstepEngine
    from ugfraud_ray.state.layout import build_layout, symmetrize

    sym = symmetrize(und.select_columns(["src", "dst"])).materialize()
    layout = build_layout(
        sym, n_vertices, layout_dir or tempfile.mkdtemp(prefix="kcore_"), P=P
    )
    eng = SuperstepEngine(layout, KCoreProgram(k))
    eng.run(max_iters=max_iters, tol=0.0)
    rt = collect_table(eng.result_dataset())
    eng.shutdown()
    alive = np.zeros(n_vertices, dtype=bool)
    vid = rt["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
    alive[vid] = rt["s0"].to_numpy(zero_copy_only=False) > 0.0
    return alive


def coreness(
    edges: "ray.data.Dataset",
    n_vertices: int,
    max_iters: int = 60,
    approx_edges: int | None = None,
    local_threshold: int = 5_000_000,
    P: int = 4,
    layout_dir: str | None = None,
) -> "ray.data.Dataset":
    """Full core decomposition: Dataset(id, coreness) for every vertex
    touched by an edge (coreness >= 1; isolated vertices emit nothing).

    coreness(v) = max k such that v survives the k-core peel. Computed
    as a sequential sweep k = 1, 2, ... (k-cores are nested, so each
    peel is independent and restartable from the full vertex set); the
    sweep stops at the first empty core. No SQL oracle — the peel-at-k
    fixpoint is value-anchored by the kcore_members oracle and the
    naive-mirror pytest (tests/test_hyperball.py::coreness cases).

    Scale shape: <= local_threshold edges runs the driver bincount peel
    (same gate as kcore_members); above it each k runs a KCoreProgram
    on ONE shared vid-sharded layout (built once, engines per k), the
    per-k membership stays a Dataset, and coreness is a union +
    groupby-max — the driver never holds a per-vertex array on the
    distributed path.
    """
    und = _canonical_undirected(edges, approx_edges)

    if approx_edges is not None and approx_edges <= local_threshold:
        t = collect_table(und)
        a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        touched = np.zeros(n_vertices, dtype=bool)
        touched[a] = True
        touched[b] = True
        alive = touched.copy()
        core = np.zeros(n_vertices, dtype=np.int64)
        k = 1
        while alive.any():
            for _ in range(max_iters):
                keep = alive[a] & alive[b]
                deg = np.bincount(a[keep], minlength=n_vertices) + np.bincount(
                    b[keep], minlength=n_vertices
                )
                new = alive & (deg >= k)
                if new.sum() == alive.sum():
                    break
                alive = new
            core[alive] = k
            k += 1
        ids = np.flatnonzero(touched)
        return ray.data.from_arrow(
            pa.table({"id": pa.array(ids), "coreness": pa.array(core[ids])})
        )

    import tempfile

    from ugfraud_ray.state.engine import SuperstepEngine
    from ugfraud_ray.state.layout import build_layout, symmetrize

    sym = symmetrize(und.select_columns(["src", "dst"])).materialize()
    layout = build_layout(
        sym, n_vertices, layout_dir or tempfile.mkdtemp(prefix="coreness_"), P=P
    )
    parts = []
    k = 1
    while True:
        eng = SuperstepEngine(layout, KCoreProgram(k))
        eng.run(max_iters=max_iters, tol=0.0)
        rd = eng.result_dataset().materialize()
        eng.shutdown()

        def alive_rows(t: pa.Table, _k=k) -> pa.Table:
            vid = t["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
            s = t["s0"].to_numpy(zero_copy_only=False) > 0.0
            return pa.table(
                {
                    "id": pa.array(vid[s]),
                    "coreness": pa.array(np.full(int(s.sum()), _k, dtype=np.int64)),
                }
            )

        alive_k = rd.map_batches(alive_rows, batch_format="pyarrow").materialize()
        if alive_k.count() == 0:
            break
        parts.append(alive_k)
        k += 1

    from ray.data.aggregate import Max

    if not parts:
        return ray.data.from_arrow(
            pa.table(
                {"id": pa.array([], pa.int64()), "coreness": pa.array([], pa.int64())}
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.groupby("id").aggregate(Max("coreness", alias_name="coreness"))
