"""Deterministic random-walk corpus generation (DeepWalk/node2vec input).

The standard graph-ML training-data op: emit fixed-length walks whose
next hop is chosen uniformly-pseudo-randomly among out-neighbors —
here the choice is the out-neighbor minimizing
``md5_low64(f"{wid}:{step}:{cur}:{dst}")`` (ties by smaller dst), the
engine's shared md5 convention (`pipelines/sketches._md5_low64` ==
DuckDB ``md5_number_upper``), so every hop is replayable bit-exactly
in SQL and across cluster sizes. A hash-argmin over neighbors IS a
uniform choice (md5 is uniform on the neighbor set) while keeping the
walk a pure function of (graph, wid) — no RNG state to coordinate.

Scale shape: the adjacency CSR is built once and broadcast via
``ray.put`` (read zero-copy by every task); walks then stream through
``map_batches`` — one pass over the walk dimension, no per-step
shuffle. This is the right layout while the CSR fits a node's object
store (tens of billions of edges); beyond that the same kernel runs
per-step on the vid-partitioned superstep layout (frontier routed by
cur % P), which `state/engine.py` already provides for the iterative
kernels. No reference analog (UGFraud has no sampling-based detector).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table


def _build_csr(edges: "ray.data.Dataset", n: int) -> tuple[np.ndarray, np.ndarray]:
    """(indptr, sorted nbrs) of the directed graph, nbrs ascending per src."""
    t = collect_table(edges.select_columns(["src", "dst"]))
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, dst


def _hash_low64(strings: list[str]) -> np.ndarray:
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
    return out


def random_walks(
    edges: "ray.data.Dataset",
    n_vertices: int,
    seed_vids: np.ndarray,
    walk_len: int = 8,
    wid_of: np.ndarray | None = None,
) -> "ray.data.Dataset":
    """Dataset(wid, step, vertex): one walk per seed (wid defaults to the
    seed vid; pass `wid_of` aligned with seed_vids to label walks, e.g.
    with original ids so the SQL replay keys match). step 0 is the seed;
    a walk stops early at a vertex with no out-neighbor."""
    indptr, nbrs = _build_csr(edges, n_vertices)
    csr_ref = ray.put((indptr, nbrs))
    wids = seed_vids.astype(np.int64) if wid_of is None else np.asarray(wid_of, np.int64)
    seeds = ray.data.from_arrow(
        pa.table(
            {
                "wid": pa.array(wids),
                "v0": pa.array(seed_vids.astype(np.int64)),
            }
        )
    )

    def walk(t: pa.Table) -> pa.Table:
        ip, nb = ray.get(csr_ref)
        wid = t["wid"].to_numpy(zero_copy_only=False).astype(np.int64)
        cur = t["v0"].to_numpy(zero_copy_only=False).astype(np.int64)
        alive = np.ones(len(cur), dtype=bool)
        out_w = [wid.copy()]
        out_s = [np.zeros(len(cur), dtype=np.int64)]
        out_v = [cur.copy()]
        for step in range(1, walk_len + 1):
            lo, hi = ip[cur], ip[cur + 1]
            alive = alive & (hi > lo)
            idx = np.flatnonzero(alive)
            if len(idx) == 0:
                break
            nxt = np.empty(len(idx), dtype=np.int64)
            for k, i in enumerate(idx):
                cand = nb[lo[i] : hi[i]]  # ascending dst
                h = _hash_low64(
                    [f"{wid[i]}:{step}:{cur[i]}:{d}" for d in cand]
                )
                nxt[k] = cand[np.argmin(h)]  # ascending cand: first min wins ties
            cur = cur.copy()
            cur[idx] = nxt
            out_w.append(wid[idx])
            out_s.append(np.full(len(idx), step, dtype=np.int64))
            out_v.append(cur[idx])
        return pa.table(
            {
                "wid": pa.array(np.concatenate(out_w)),
                "step": pa.array(np.concatenate(out_s)),
                "vertex": pa.array(np.concatenate(out_v)),
            }
        )

    return seeds.map_batches(walk, batch_format="pyarrow")
