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

Scale shape: the per-round degree is a dense bincount over
alive-filtered edge blocks + 8-way tree reduce (per-vertex hash
aggregates are the measured many-groups slow path); the alive bitmap
(1 byte/vertex) broadcasts once per round via ray.put. Same
driver-holds-(n,)-arrays assumption as dense_degrees — beyond ~10^9
vertices switch to vid-range-bucketed partials.
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


@ray.remote
def _alive_deg_block(t, alive: np.ndarray, n: int) -> np.ndarray:
    if isinstance(t, pa.Table):
        if t.num_rows == 0:
            return np.zeros(n, dtype=np.int64)
        a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    else:  # pandas block from a shuffle stage
        if len(t) == 0 or "src" not in getattr(t, "columns", []):
            return np.zeros(n, dtype=np.int64)
        a = np.asarray(t["src"]).astype(np.int64)
        b = np.asarray(t["dst"]).astype(np.int64)
    keep = alive[a] & alive[b]
    return np.bincount(a[keep], minlength=n) + np.bincount(b[keep], minlength=n)


@ray.remote
def _sum_deg(*parts: np.ndarray) -> np.ndarray:
    out = parts[0].copy()
    for p in parts[1:]:
        out += p
    return out


def kcore_members(
    edges: "ray.data.Dataset",
    n_vertices: int,
    k: int = 2,
    max_iters: int = 30,
    approx_edges: int | None = None,
) -> np.ndarray:
    """Boolean (n_vertices,) mask of the k-core over int-vid edges."""
    und = _canonical_undirected(edges, approx_edges)
    alive = np.ones(n_vertices, dtype=bool)

    if approx_edges is not None and approx_edges <= 5_000_000:
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

    blocks = und.materialize().to_arrow_refs()
    for _ in range(max_iters):
        alive_ref = ray.put(alive)
        refs = [_alive_deg_block.remote(bk, alive_ref, n_vertices) for bk in blocks]
        while len(refs) > 1:
            refs = [_sum_deg.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
        deg = ray.get(refs[0]) if refs else np.zeros(n_vertices, dtype=np.int64)
        new = alive & (deg >= k)
        if new.sum() == alive.sum():
            break
        alive = new
    return alive
