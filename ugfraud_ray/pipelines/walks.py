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

Scale shape, two paths off one hop rule (bit-identical, parity-tested):

- ≤ ``local_threshold`` edges: the adjacency CSR is built once and
  broadcast via ``ray.put`` (read zero-copy by every task); walks then
  stream through ``map_batches`` — one pass over the walk dimension,
  no per-step shuffle.
- above it: NO whole-graph CSR anywhere. Out-edges are written once as
  src%P-partitioned parquet; P ``_WalkShard`` actors each load only
  their slice, walks RESIDE on the shard owning their current vertex,
  and each superstep every shard advances its resident walks locally
  (vectorized md5-argmin over the expanded neighbor lists) and routes
  the movers to their new owners as P direct actor-to-actor object
  refs — the driver forwards refs and a per-step alive count only,
  never per-walk arrays. Emitted (wid, step, vertex) rows accumulate
  shard-local and come back as one Arrow ref per shard.

No reference analog (UGFraud has no sampling-based detector).
"""

from __future__ import annotations

import hashlib
import os

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


def _flat_ranges(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """concatenate(arange(s, s+l) for s, l in zip(starts, lens)) without a loop."""
    if len(starts) == 0 or lens.sum() == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(lens)
    out = np.ones(int(ends[-1]), dtype=np.int64)
    out[0] = starts[0]
    out[ends[:-1]] = starts[1:] - (starts[:-1] + lens[:-1]) + 1
    return np.cumsum(out)


def _choose_next(
    wid: np.ndarray, cur: np.ndarray, step: int, lo: np.ndarray, hi: np.ndarray, nb: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(surviving walk indices, chosen next vertex) — vectorized
    md5-argmin of f"{wid}:{step}:{cur}:{dst}" over each walk's
    neighbor slice [lo, hi) of nb; ties by smaller dst."""
    deg = hi - lo
    idx = np.flatnonzero(deg > 0)
    if len(idx) == 0:
        return idx, np.empty(0, dtype=np.int64)
    degs = deg[idx]
    seg = np.repeat(np.arange(len(idx)), degs)
    cand = nb[_flat_ranges(lo[idx], degs)]
    ws, cs = wid[idx][seg].tolist(), cur[idx][seg].tolist()
    h = _hash_low64(
        [f"{w}:{step}:{c}:{d}" for w, c, d in zip(ws, cs, cand.tolist())]
    )
    order = np.lexsort((cand, h, seg))
    first = np.zeros(len(idx), dtype=np.int64)
    first[1:] = np.searchsorted(seg[order], np.arange(1, len(idx)))
    return idx, cand[order[first]]


@ray.remote
class _WalkShard:
    """Owns vids with vid % P == pid: their out-adjacency (CSR over the
    src%P parquet slice) and the walks currently AT those vids."""

    def __init__(self, pid: int, P: int, edge_dir: str):
        import glob

        import pyarrow.parquet as pq

        self.pid, self.P = pid, P
        files = sorted(glob.glob(os.path.join(edge_dir, f"part={pid}", "*.parquet")))
        if files:
            t = pa.concat_tables([pq.read_table(f, columns=["src", "dst"]) for f in files])
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            src = dst = np.empty(0, dtype=np.int64)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        loc = src // P  # owned-local index
        self.n_local = int(loc.max()) + 1 if len(loc) else 0
        self.indptr = np.zeros(self.n_local + 1, dtype=np.int64)
        np.add.at(self.indptr, loc + 1, 1)
        np.cumsum(self.indptr, out=self.indptr)
        self.nbrs = dst
        self.wid = np.empty(0, dtype=np.int64)
        self.cur = np.empty(0, dtype=np.int64)
        self.rows_w: list = []
        self.rows_s: list = []
        self.rows_v: list = []

    def _record(self, step: int, wid: np.ndarray, cur: np.ndarray) -> None:
        self.rows_w.append(wid)
        self.rows_s.append(np.full(len(wid), step, dtype=np.int64))
        self.rows_v.append(cur)

    def seed(self, wid: np.ndarray, cur: np.ndarray) -> None:
        self.wid, self.cur = wid.astype(np.int64), cur.astype(np.int64)
        self._record(0, self.wid, self.cur)

    def advance(self, step: int):
        """Move resident walks one hop; returns P routed (wid, nxt)
        payloads (dest owner = nxt % P) followed by the mover count."""
        loc = self.cur // self.P
        if self.n_local:
            cl = np.clip(loc, 0, self.n_local - 1)
            lo = np.where(loc < self.n_local, self.indptr[cl], 0)
            hi = np.where(loc < self.n_local, self.indptr[cl + 1], 0)
        else:
            lo = hi = np.zeros(len(self.cur), dtype=np.int64)
        idx, nxt = _choose_next(self.wid, self.cur, step, lo, hi, self.nbrs)
        wid = self.wid[idx]
        self.wid = np.empty(0, dtype=np.int64)
        self.cur = np.empty(0, dtype=np.int64)
        owner = nxt % self.P
        out = []
        for p in range(self.P):
            m = owner == p
            out.append((wid[m], nxt[m]))
        return (*out, len(nxt))

    def arrive(self, step: int, *payloads) -> None:
        wids = [p[0] for p in payloads] + [self.wid]
        curs = [p[1] for p in payloads] + [self.cur]
        self.wid = np.concatenate(wids)
        self.cur = np.concatenate(curs)
        self._record(step, self.wid, self.cur)

    def collect(self) -> pa.Table:
        return pa.table(
            {
                "wid": pa.array(np.concatenate(self.rows_w) if self.rows_w else np.empty(0, np.int64)),
                "step": pa.array(np.concatenate(self.rows_s) if self.rows_s else np.empty(0, np.int64)),
                "vertex": pa.array(np.concatenate(self.rows_v) if self.rows_v else np.empty(0, np.int64)),
            }
        )


def _walks_sharded(
    edges: "ray.data.Dataset",
    seed_vids: np.ndarray,
    wids: np.ndarray,
    walk_len: int,
    P: int,
    edge_dir: str | None,
) -> "ray.data.Dataset":
    import tempfile

    edge_dir = edge_dir or tempfile.mkdtemp(prefix="walks_")
    P_ = P

    def assign(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array((src % P_).astype(np.int64)))

    edges.select_columns(["src", "dst"]).map_batches(
        assign, batch_format="pyarrow"
    ).write_parquet(edge_dir, partition_cols=["part"])

    shards = [_WalkShard.remote(p, P, edge_dir) for p in range(P)]
    cur = seed_vids.astype(np.int64)
    owner = cur % P
    ray.get([shards[p].seed.remote(wids[owner == p], cur[owner == p]) for p in range(P)])
    for step in range(1, walk_len + 1):
        outs = [
            shards[i].advance.options(num_returns=P + 1).remote(step) for i in range(P)
        ]
        for j in range(P):
            shards[j].arrive.remote(step, *[outs[i][j] for i in range(P)])
        if sum(ray.get([outs[i][P] for i in range(P)])) == 0:
            break
    ds = ray.data.from_arrow_refs([s.collect.remote() for s in shards]).materialize()
    for s in shards:
        ray.kill(s)
    return ds


def random_walks(
    edges: "ray.data.Dataset",
    n_vertices: int,
    seed_vids: np.ndarray,
    walk_len: int = 8,
    wid_of: np.ndarray | None = None,
    approx_edges: int | None = None,
    local_threshold: int = 50_000_000,
    P: int = 4,
    edge_dir: str | None = None,
) -> "ray.data.Dataset":
    """Dataset(wid, step, vertex): one walk per seed (wid defaults to the
    seed vid; pass `wid_of` aligned with seed_vids to label walks, e.g.
    with original ids so the SQL replay keys match). step 0 is the seed;
    a walk stops early at a vertex with no out-neighbor.

    approx_edges > local_threshold routes to the sharded frontier path
    (no whole-graph CSR); otherwise the broadcast-CSR path runs."""
    wids_arr = (
        seed_vids.astype(np.int64) if wid_of is None else np.asarray(wid_of, np.int64)
    )
    # unknown size is treated as LARGE: collecting an unhinted input
    # to the driver is the one unrecoverable choice at scale
    if approx_edges is None or approx_edges > local_threshold:
        return _walks_sharded(edges, seed_vids, wids_arr, walk_len, P, edge_dir)
    indptr, nbrs = _build_csr(edges, n_vertices)
    csr_ref = ray.put((indptr, nbrs))
    seeds = ray.data.from_arrow(
        pa.table(
            {
                "wid": pa.array(wids_arr),
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
