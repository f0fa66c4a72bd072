"""Minimum spanning forest via distributed Borůvka rounds.

No reference analog (a §2.12-style standard kernel); in a web corpus
the MSF over inverse-similarity weights is the classic single-linkage
clustering / backbone-extraction primitive. Genuinely non-SQL (each
round needs a component contraction — nested recursion), so the driver
query is rows-only and correctness is guarded by an exact Kruskal
oracle test (unique weights ⇒ the MSF edge set is unique).

Semantics:
- canonical undirected simple graph; per-edge weight defaults to a
  deterministic splitmix-style uint64 hash of the canonical pair
  (unique w.h.p., so the forest is unique and order-independent);
- round: every component picks its minimum-weight outgoing edge
  (ties impossible with unique weights); picked edges join the forest;
  components contract (driver-side union-find over picked edges —
  ≤ n−1 unions TOTAL across all rounds); O(log n) rounds.

Scale shape: per-block candidate tables (≤ one row per component
present in the block: lexsort by (component, weight), first-per-run) +
8-way tree reduce with the same first-per-run merge — the all-reduce
moves component-sized tables, never edge-sized. The component label
array (n,) broadcasts once per round via ray.put; same
driver-holds-(n,)-arrays assumption as dense_degrees.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table
from ugfraud_ray.pipelines.kcore import _canonical_undirected


def pair_weights(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic uint64 weight per canonical pair (vectorized mix)."""
    x = a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) ^ b.astype(np.uint64) * np.uint64(
        0xC2B2AE3D27D4EB4F
    )
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _candidates(a, b, w, comp):
    """First-per-component (comp, w, a, b) over cross-component edges,
    both endpoint components considered."""
    ca, cb = comp[a], comp[b]
    cross = ca != cb
    a, b, w, ca, cb = a[cross], b[cross], w[cross], ca[cross], cb[cross]
    if len(a) == 0:
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.uint64),
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int64),
        )
    c = np.concatenate([ca, cb])
    ww = np.concatenate([w, w])
    aa = np.concatenate([a, a])
    bb = np.concatenate([b, b])
    order = np.lexsort((ww, c))
    c, ww, aa, bb = c[order], ww[order], aa[order], bb[order]
    first = np.concatenate([[True], c[1:] != c[:-1]])
    return c[first], ww[first], aa[first], bb[first]


def _merge_candidates(parts):
    """Merge (comp, w, a, b) candidate tuples: global first-per-comp."""
    c = np.concatenate([p[0] for p in parts])
    w = np.concatenate([p[1] for p in parts])
    a = np.concatenate([p[2] for p in parts])
    b = np.concatenate([p[3] for p in parts])
    if len(c) == 0:
        return c, w, a, b
    order = np.lexsort((w, c))
    c, w, a, b = c[order], w[order], a[order], b[order]
    first = np.concatenate([[True], c[1:] != c[:-1]])
    return c[first], w[first], a[first], b[first]


@ray.remote
def _cand_block(t, comp: np.ndarray, weight_fn=None):
    if isinstance(t, pa.Table) and t.num_rows > 0:
        a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    elif not isinstance(t, pa.Table) and len(t) > 0 and "src" in getattr(t, "columns", []):
        a = np.asarray(t["src"]).astype(np.int64)
        b = np.asarray(t["dst"]).astype(np.int64)
    else:
        z = np.zeros(0, dtype=np.int64)
        return z, np.zeros(0, dtype=np.uint64), z, z
    wf = weight_fn or pair_weights
    return _candidates(a, b, wf(a, b), comp)


@ray.remote
def _merge_blocks(*parts):
    return _merge_candidates(list(parts))


class _UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, x: int, y: int) -> bool:
        rx, ry = self.find(x), self.find(y)
        if rx == ry:
            return False
        self.parent[max(rx, ry)] = min(rx, ry)
        return True


def minimum_spanning_forest(
    edges: "ray.data.Dataset",
    n_vertices: int,
    max_iters: int = 40,
    approx_edges: int | None = None,
    weight_fn=None,
) -> pa.Table:
    """(src, dst, weight) MSF edges (canonical src<dst, sorted), exact
    and unique under deterministic pair weights. weight_fn(a, b) ->
    uint64 array overrides the default splitmix pair hash (it must be a
    pure function of the canonical pair and collision-free on the input,
    or the forest loses uniqueness)."""
    wf = weight_fn or pair_weights
    und = _canonical_undirected(edges, approx_edges)
    comp = np.arange(n_vertices, dtype=np.int64)
    uf = _UnionFind(n_vertices)
    fa: list[np.ndarray] = []
    fb: list[np.ndarray] = []

    local = approx_edges is not None and approx_edges <= 5_000_000
    if local:
        t = collect_table(und)
        la = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        lb = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        lw = wf(la, lb)
    else:
        blocks = und.materialize().to_arrow_refs()

    for _ in range(max_iters):
        if local:
            c, w, a, b = _candidates(la, lb, lw, comp)
        else:
            comp_ref = ray.put(comp)
            refs = [_cand_block.remote(bk, comp_ref, weight_fn) for bk in blocks]
            while len(refs) > 1:
                refs = [_merge_blocks.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
            c, w, a, b = ray.get(refs[0]) if refs else _merge_candidates([])
        if len(c) == 0:
            break
        picked_a, picked_b = [], []
        for x, y in zip(a.tolist(), b.tolist()):
            if uf.union(x, y):
                picked_a.append(x)
                picked_b.append(y)
        if not picked_a:
            break
        fa.append(np.array(picked_a, dtype=np.int64))
        fb.append(np.array(picked_b, dtype=np.int64))
        # contract: relabel every vertex to its component root (two-step
        # vectorized pointer chase — roots are fixpoints of parent)
        p = uf.parent
        while True:
            np2 = p[p]
            if (np2 == p).all():
                break
            p = np2
        uf.parent = p
        comp = p[comp]

    if fa:
        a = np.concatenate(fa)
        b = np.concatenate(fb)
    else:
        a = np.zeros(0, dtype=np.int64)
        b = np.zeros(0, dtype=np.int64)
    w = wf(a, b)
    order = np.lexsort((b, a))
    return pa.table(
        {
            "src": pa.array(a[order]),
            "dst": pa.array(b[order]),
            "weight": pa.array(w[order]),
        }
    )
