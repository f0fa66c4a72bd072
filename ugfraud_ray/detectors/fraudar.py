"""FRAUDAR — dense-subgraph detection via greedy peeling.

Reference /root/reference/UGFraud/Detector/Fraudar.py:

- column weights w_j = 1/log(colSum_j + 5) (logWeightedAveDegree,
  Fraudar.py:165-172) — computed distributed here (grouped count).
- fastGreedyDecreasing (Fraudar.py:195-249): repeatedly delete the
  row/col with the minimal weighted-degree delta, tracking the best
  average score; ties: rows beat cols (``rowDelt <= colDelt``,
  Fraudar.py:217), and within a side the smallest index wins (MinTree
  descends left on ties, MinTree.py:26).
- detect_blocks (Fraudar.py:48-62): peel, remove the block's edges,
  repeat until the block score changes by < 0.01.

The greedy argmin-delete loop is inherently sequential (SURVEY §7.3
I4/O3). Engine strategy:
- column weights + candidate pre-filter are distributed Dataset ops;
- the peel itself runs on the driver over compact int arrays (CSR of
  the *candidate* subgraph, O(E) ints — the reference needs the same
  O(E) but as Python dict-of-dict objects). Tie-breaking replicates the
  reference exactly (lazy min-heaps keyed (delta, index)).
- for 10^12-edge inputs, ``peel_batched=True`` deletes every node whose
  delta is within ``batch_eps`` of the round minimum in one step — the
  documented known-approximation mode that keeps rounds O(log n).
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

import ray

from ugfraud_ray.functions.collect import collect_table
import ray.data
from ray.data.aggregate import Count


def _collect_edges(edges: "ray.data.Dataset") -> tuple[np.ndarray, np.ndarray]:
    t = collect_table(edges.select_columns(["src", "dst"]))
    return (
        t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
        t["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
    )


def column_weights(edges: "ray.data.Dataset", mode: str = "log") -> "ray.data.Dataset":
    """(dst, weight): 1/log(colSum+5) or 1/sqrt(colSum+5) (Fraudar.py:153-172)."""
    g = edges.groupby("dst").aggregate(Count(alias_name="colsum"))

    def w(t: pa.Table) -> pa.Table:
        c = t["colsum"].to_numpy(zero_copy_only=False).astype(np.float64)
        wv = 1.0 / np.log(c + 5) if mode == "log" else 1.0 / np.sqrt(c + 5)
        return pa.table({"dst": t["dst"], "weight": pa.array(wv)})

    return g.map_batches(w, batch_format="pyarrow")


def fast_greedy_decreasing(
    src: np.ndarray, dst: np.ndarray, col_w: np.ndarray,
    m: int | None = None, n: int | None = None,
) -> tuple[set, set, float]:
    """Exact reference peel over a compact edge list.

    src/dst are dense 0-based row/col indices; col_w[j] the column
    weight; m/n fix the matrix shape (the reference zeroes deleted
    edges but never shrinks the matrix). Returns (rowSet, colSet,
    bestAveScore) with the reference's deletion order and tie-breaking.
    """
    if m is None:
        m = int(src.max()) + 1 if len(src) else 0
    if n is None:
        n = int(dst.max()) + 1 if len(dst) else 0
    # CSR-ish adjacency in sorted order (reference lil rows are sorted)
    row_order = np.lexsort((dst, src))
    r_src, r_dst = src[row_order], dst[row_order]
    row_start = np.searchsorted(r_src, np.arange(m + 1))
    col_order = np.lexsort((src, dst))
    c_src, c_dst = src[col_order], dst[col_order]
    col_start = np.searchsorted(c_dst, np.arange(n + 1))

    w_edge = col_w[r_dst]
    row_delta = np.zeros(m)
    np.add.at(row_delta, r_src, w_edge)
    col_delta = np.zeros(n)
    np.add.at(col_delta, dst, col_w[dst])

    cur_score = float(w_edge.sum())
    alive_row = np.ones(m, dtype=bool)
    alive_col = np.ones(n, dtype=bool)
    n_rows, n_cols = m, n
    best_ave = cur_score / (m + n)
    best_deleted = 0
    deleted: list[tuple[int, int]] = []

    rheap = [(row_delta[i], i) for i in range(m)]
    cheap = [(col_delta[j], j) for j in range(n)]
    heapq.heapify(rheap)
    heapq.heapify(cheap)

    def pop_min(heap, delta, alive):
        while heap:
            v, i = heap[0]
            if not alive[i] or v != delta[i]:
                heapq.heappop(heap)
                continue
            return v, i
        return np.inf, -1

    while n_rows and n_cols:
        rdelt, ri = pop_min(rheap, row_delta, alive_row)
        cdelt, ci = pop_min(cheap, col_delta, alive_col)
        if rdelt <= cdelt:  # rows win ties (Fraudar.py:217)
            cur_score -= rdelt
            for e in range(row_start[ri], row_start[ri + 1]):
                j = r_dst[e]
                if alive_col[j]:
                    col_delta[j] -= col_w[j]
                    heapq.heappush(cheap, (col_delta[j], j))
            alive_row[ri] = False
            n_rows -= 1
            deleted.append((0, ri))
        else:
            cur_score -= cdelt
            wj = col_w[ci]
            for e in range(col_start[ci], col_start[ci + 1]):
                i = c_src[e]
                if alive_row[i]:
                    row_delta[i] -= wj
                    heapq.heappush(rheap, (row_delta[i], i))
            alive_col[ci] = False
            n_cols -= 1
            deleted.append((1, ci))
        if n_rows + n_cols == 0:
            break
        ave = cur_score / (n_rows + n_cols)
        if ave > best_ave:
            best_ave = ave
            best_deleted = len(deleted)

    row_set = set(range(m))
    col_set = set(range(n))
    for kind, idx in deleted[:best_deleted]:
        (row_set if kind == 0 else col_set).discard(idx)
    return row_set, col_set, float(best_ave)


def fast_greedy_decreasing_batched(
    src: np.ndarray,
    dst: np.ndarray,
    col_w: np.ndarray,
    m: int | None = None,
    n: int | None = None,
    batch_eps: float = 0.05,
    min_frac: float = 0.0,
) -> tuple[set, set, float]:
    """Known-approximation peel for 10^12-edge inputs (SURVEY §7.3):
    each round deletes EVERY node whose delta is within ``batch_eps`` of
    the round minimum, so the number of rounds is O(log) instead of
    O(m+n) sequential argmin steps, and every round is a vectorized
    O(E) pass (the per-round recompute distributes as a segment-sum per
    partition at scale). Deviates from the exact reference order —
    documented, not silent; use fast_greedy_decreasing for conformance.

    ``min_frac`` > 0 additionally floors the round threshold at the
    min_frac-quantile of the alive deltas, guaranteeing GEOMETRIC
    progress: on delta distributions with a long flat tail (random
    graphs) the eps-band alone can degenerate to a handful of
    deletions per round (measured: 11k rounds on a 2M-edge random
    bipartite graph), which at cluster scale means 11k RPC rounds.
    Still lowest-delta-first — a coarser cut of the same greedy order.
    """
    if m is None:
        m = int(src.max()) + 1 if len(src) else 0
    if n is None:
        n = int(dst.max()) + 1 if len(dst) else 0
    alive_r = np.ones(m, dtype=bool)
    alive_c = np.ones(n, dtype=bool)
    w_edge = col_w[dst]
    cur = float(w_edge.sum())
    best_ave = cur / (m + n) if (m + n) else 0.0
    best_r, best_c = alive_r.copy(), alive_c.copy()
    edge_alive = np.ones(len(src), dtype=bool)
    while alive_r.any() and alive_c.any():
        ea = edge_alive
        row_delta = np.bincount(src[ea], weights=w_edge[ea], minlength=m)
        col_delta = np.bincount(dst[ea], weights=w_edge[ea], minlength=n)
        rmin = row_delta[alive_r].min() if alive_r.any() else np.inf
        cmin = col_delta[alive_c].min() if alive_c.any() else np.inf
        thr = min(rmin, cmin) * (1.0 + batch_eps) + 1e-12
        if min_frac > 0.0:
            alive_deltas = np.concatenate(
                [row_delta[alive_r], col_delta[alive_c]]
            )
            k = max(1, int(len(alive_deltas) * min_frac))
            thr = max(thr, float(np.partition(alive_deltas, k - 1)[k - 1]))
        del_r = alive_r & (row_delta <= thr)
        del_c = alive_c & (col_delta <= thr)
        if not (del_r.any() or del_c.any()):
            break
        alive_r &= ~del_r
        alive_c &= ~del_c
        edge_alive = ea & alive_r[src] & alive_c[dst]
        cur = float(w_edge[edge_alive].sum())
        denom = int(alive_r.sum() + alive_c.sum())
        if denom == 0:
            break
        if cur / denom > best_ave:
            best_ave = cur / denom
            best_r, best_c = alive_r.copy(), alive_c.copy()
    return set(np.flatnonzero(best_r).tolist()), set(np.flatnonzero(best_c).tolist()), best_ave


# ---------------------------------------------------------------------------
# distributed peel (r5) — shard-resident edges, vertex-sized driver state
# ---------------------------------------------------------------------------


def _runs_gather(sorted_arr: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Indices of every occurrence of ``keys`` in ``sorted_arr`` —
    vectorized ragged-range gather over the contiguous runs a sorted
    array gives each key (no per-key Python loop, no scan of the whole
    array)."""
    if not len(keys):
        return np.zeros(0, dtype=np.int64)
    lo = np.searchsorted(sorted_arr, keys, side="left")
    hi = np.searchsorted(sorted_arr, keys, side="right")
    lens = hi - lo
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    cs = np.cumsum(lens)
    return (
        np.arange(total, dtype=np.int64)
        + np.repeat(lo, lens)
        - np.repeat(cs - lens, lens)
    )


@ray.remote
class _PeelShard:
    """One contiguous (src,dst)-sorted slice of the edge list.

    The shard owns its edges for the whole multi-block peel: an
    ``edge_alive`` bitmap plus CSR-by-row / CSC-by-col index arrays over
    the LOCAL slice. The driver never sees the edge list — only
    vertex-sized degree partials and per-deletion neighbor lists (whose
    cumulative volume over a full peel is O(E), streamed, never held).

    Because the global edge list is sorted by (src, dst) and split
    contiguously, concatenating per-shard replies in shard order
    reproduces the LOCAL peel's CSR/CSC iteration order, so the
    driver-side delta updates replay the exact arithmetic sequence of
    ``fast_greedy_decreasing`` (reference Fraudar.py:195-249 order;
    boundary rows split across two shards can differ in the last ulp of
    their initial delta — documented, covered by the parity pytest).
    """

    def __init__(self, blocks: list, n_cols: int):
        import numpy as _np
        import pyarrow as _pa

        # blocks arrive as a LIST of object refs (nested refs are not
        # auto-resolved by Ray) — resolve store-to-actor here, so the
        # driver never concatenates the edge list
        blocks = [ray.get(b) if isinstance(b, ray.ObjectRef) else b for b in blocks]
        tabs = [b if isinstance(b, _pa.Table) else _pa.Table.from_pandas(b) for b in blocks]
        tabs = [t for t in tabs if t.num_rows]
        if tabs:
            t = _pa.concat_tables(tabs)
            self.src = t["src"].to_numpy(zero_copy_only=False).astype(_np.int64)
            self.dst = t["dst"].to_numpy(zero_copy_only=False).astype(_np.int64)
        else:
            self.src = _np.zeros(0, dtype=_np.int64)
            self.dst = _np.zeros(0, dtype=_np.int64)
        order = _np.lexsort((self.dst, self.src))
        self.src, self.dst = self.src[order], self.dst[order]
        self.n_cols = n_cols
        self.col_order = _np.lexsort((self.src, self.dst))
        self.c_dst = self.dst[self.col_order]
        self.edge_alive = _np.ones(len(self.src), dtype=bool)

    def degree_partials(self):
        """Sparse col counts over alive edges + local edge count.
        Called once per block round (col-weight recompute)."""
        ea = self.edge_alive
        colsum = np.bincount(self.dst[ea], minlength=self.n_cols)
        cu = np.flatnonzero(colsum)
        return colsum[cu].astype(np.int64), cu, len(self.src)

    def set_col_weights(self, col_w):
        # col_w arrives as a top-level ray.put ref → auto-resolved
        self.col_w = np.asarray(col_w, dtype=np.float64)
        self.w_edge = self.col_w[self.dst]

    def row_delta_partial(self, m: int):
        """Dense O(m) partial — the driver accumulates these ONE AT A
        TIME (sequential ray.get) so peak driver memory is 2 partials,
        not num_shards of them."""
        ea = self.edge_alive
        rd = np.zeros(m, dtype=np.float64)
        np.add.at(rd, self.src[ea], self.w_edge[ea])
        return rd, float(self.w_edge[ea].sum())

    def delete_row(self, ri: int) -> np.ndarray:
        """Kill this shard's alive edges of row ri; return their dsts in
        CSR (dst-ascending) order."""
        lo = np.searchsorted(self.src, ri)
        hi = np.searchsorted(self.src, ri + 1)
        sl = slice(lo, hi)
        a = self.edge_alive[sl]
        out = self.dst[sl][a]
        self.edge_alive[sl] = False
        return out

    def delete_col(self, ci: int) -> np.ndarray:
        """Kill this shard's alive edges of col ci; return their srcs in
        CSC (src-ascending) order."""
        lo = np.searchsorted(self.c_dst, ci)
        hi = np.searchsorted(self.c_dst, ci + 1)
        idx = self.col_order[lo:hi]
        a = self.edge_alive[idx]
        idx = idx[a]
        out = self.src[idx]
        self.edge_alive[idx] = False
        return out

    def delete_nodes(self, del_rows: np.ndarray, del_cols: np.ndarray):
        """Batched kill via CSR/CSC run-gather: only the edges OF the
        deleted nodes are touched (not the whole local edge list), so
        per-round work telescopes to O(E) over the entire peel. Returns
        sparse decrement vectors for SURVIVING opposite endpoints plus
        the killed weight mass (for cur_score)."""
        # row side first: alive edges of deleted rows die
        ridx = _runs_gather(self.src, np.asarray(del_rows, dtype=np.int64))
        ra = ridx[self.edge_alive[ridx]]
        self.edge_alive[ra] = False
        # col side: alive edges of deleted cols (rows of these are alive
        # — a previously-deleted row would have killed the edge already,
        # and same-round-deleted rows were just killed above)
        cidx = self.col_order[
            _runs_gather(self.c_dst, np.asarray(del_cols, dtype=np.int64))
        ]
        ca = cidx[self.edge_alive[cidx]]
        self.edge_alive[ca] = False
        if not (len(ra) or len(ca)):
            return (np.zeros(0, np.int64), np.zeros(0), np.zeros(0, np.int64), np.zeros(0), 0.0)
        # decrement col_delta[j] for row-killed edges whose col survives
        # this round; every col-killed edge's row survives (see above)
        ck = ra[~np.isin(self.dst[ra], del_cols)] if len(ra) else ra
        cd_ids, cd_inv = np.unique(self.dst[ck], return_inverse=True)
        cd_vals = np.zeros(len(cd_ids))
        np.add.at(cd_vals, cd_inv, self.w_edge[ck])
        rd_ids, rd_inv = np.unique(self.src[ca], return_inverse=True)
        rd_vals = np.zeros(len(rd_ids))
        np.add.at(rd_vals, rd_inv, self.w_edge[ca])
        wkill = float(self.w_edge[ra].sum() + self.w_edge[ca].sum())
        return (cd_ids, cd_vals, rd_ids, rd_vals, wkill)

    def remove_block(self, row_set: np.ndarray, col_set: np.ndarray):
        """Between block rounds: permanently drop the found block's
        edges (src∈rows AND dst∈cols), revive everything else."""
        in_block = np.isin(self.src, row_set) & np.isin(self.dst, col_set)
        keep = ~in_block
        self.src, self.dst = self.src[keep], self.dst[keep]
        self.col_order = np.lexsort((self.src, self.dst))
        self.c_dst = self.dst[self.col_order]
        self.edge_alive = np.ones(len(self.src), dtype=bool)
        return len(self.src)

    def reset_alive(self):
        self.edge_alive = np.ones(len(self.src), dtype=bool)
        return True


def _eq_accum(counts: np.ndarray, w: np.ndarray, exact_max: int = 4096) -> np.ndarray:
    """fl-sequential sum of counts[j] copies of w[j] — the bit pattern
    ``np.add.at`` produces for repeated equal addends. Replayed exactly
    (masked vectorized loop) while max(count) <= exact_max; above that
    the closed form counts*w is used (last-ulp divergence possible —
    the scale path is the batched peel, where it is irrelevant)."""
    counts = counts.astype(np.int64)
    mx = int(counts.max()) if len(counts) else 0
    if mx > exact_max:
        return counts * w
    out = np.zeros(len(w), dtype=np.float64)
    remaining = counts.copy()
    while True:
        m = remaining > 0
        if not m.any():
            break
        out[m] += w[m]
        remaining[m] -= 1
    return out


class _ShardedPeelGraph:
    """Driver handle over the _PeelShard pool. Holds ONLY vertex-sized
    state; edges live in the actors."""

    def __init__(self, edges: "ray.data.Dataset", num_shards: int = 8):
        import ray.data as _rd

        e = edges.select_columns(["src", "dst"])
        n_e = e.count()
        self.m = int(e.max("src")) + 1 if n_e else 0
        self.n = int(e.max("dst")) + 1 if n_e else 0
        parts = e.sort(["src", "dst"]).split(num_shards)
        # to_arrow_refs hands over object REFS; the actor resolves them
        # in its constructor — blocks ship store-to-store, the driver
        # never concatenates the edge list
        self.shards = [
            _PeelShard.remote(p.to_arrow_refs(), self.n) for p in parts
        ]
        self.n_edges = None

    def col_weights(self, mode: str) -> np.ndarray:
        parts = ray.get([s.degree_partials.remote() for s in self.shards])
        colsum = np.zeros(self.n, dtype=np.int64)
        n_edges = 0
        for vals, ids, ne in parts:
            colsum[ids] += vals
            n_edges += ne
        self.n_edges = n_edges
        self.colsum = colsum
        with np.errstate(divide="ignore"):
            w = 1.0 / np.log(colsum + 5) if mode == "log" else 1.0 / np.sqrt(colsum + 5)
        return w

    def broadcast_weights(self, col_w: np.ndarray) -> None:
        ref = ray.put(col_w)
        ray.get([s.set_col_weights.remote(ref) for s in self.shards])

    def initial_deltas(self, col_w: np.ndarray) -> tuple[np.ndarray, np.ndarray, float]:
        refs = [s.row_delta_partial.remote(self.m) for s in self.shards]
        row_delta = np.zeros(self.m)
        total = 0.0
        for r in refs:  # sequential: peak driver memory = 2 partials
            vals, wsum = ray.get(r)
            row_delta += vals
            total += wsum
        col_delta = _eq_accum(self.colsum, col_w)
        col_delta[self.colsum == 0] = 0.0
        return row_delta, col_delta, total

    def shutdown(self):
        for s in self.shards:
            ray.kill(s)
        self.shards = []


def _peel_exact_distributed(
    g: _ShardedPeelGraph, col_w: np.ndarray
) -> tuple[set, set, float]:
    """Exact reference peel order over sharded edges: the driver owns
    the (delta, index) lazy min-heaps (reference MinTree.py:23-28
    tie-breaks) and per-deletion neighbor lists stream back from the
    shards — O(m+n) driver memory, O(E) actor memory, one shard-pool
    RPC round per deletion. Conformance-exact but round-latency-bound;
    the batched mode is the scale default (detect_blocks docstring)."""
    m, n = g.m, g.n
    g.broadcast_weights(col_w)
    row_delta, col_delta, cur_score = g.initial_deltas(col_w)
    alive_row = np.ones(m, dtype=bool)
    alive_col = np.ones(n, dtype=bool)
    n_rows, n_cols = m, n
    best_ave = cur_score / (m + n) if (m + n) else 0.0
    best_deleted = 0
    deleted: list[tuple[int, int]] = []

    rheap = [(row_delta[i], i) for i in range(m)]
    cheap_ = [(col_delta[j], j) for j in range(n)]
    heapq.heapify(rheap)
    heapq.heapify(cheap_)

    def pop_min(heap, delta, alive):
        while heap:
            v, i = heap[0]
            if not alive[i] or v != delta[i]:
                heapq.heappop(heap)
                continue
            return v, i
        return np.inf, -1

    while n_rows and n_cols:
        rdelt, ri = pop_min(rheap, row_delta, alive_row)
        cdelt, ci = pop_min(cheap_, col_delta, alive_col)
        if rdelt <= cdelt:  # rows win ties (Fraudar.py:217)
            cur_score -= rdelt
            neigh = np.concatenate(
                ray.get([s.delete_row.remote(int(ri)) for s in g.shards])
            )
            for j in neigh:  # CSR order preserved across shard concat
                col_delta[j] -= col_w[j]
                heapq.heappush(cheap_, (col_delta[j], int(j)))
            alive_row[ri] = False
            n_rows -= 1
            deleted.append((0, int(ri)))
        else:
            cur_score -= cdelt
            wj = col_w[ci]
            neigh = np.concatenate(
                ray.get([s.delete_col.remote(int(ci)) for s in g.shards])
            )
            for i in neigh:
                row_delta[i] -= wj
                heapq.heappush(rheap, (row_delta[i], int(i)))
            alive_col[ci] = False
            n_cols -= 1
            deleted.append((1, int(ci)))
        if n_rows + n_cols == 0:
            break
        ave = cur_score / (n_rows + n_cols)
        if ave > best_ave:
            best_ave = ave
            best_deleted = len(deleted)

    row_set = set(range(m))
    col_set = set(range(n))
    for kind, idx in deleted[:best_deleted]:
        (row_set if kind == 0 else col_set).discard(idx)
    return row_set, col_set, float(best_ave)


def _peel_batched_distributed(
    g: _ShardedPeelGraph, col_w: np.ndarray, batch_eps: float = 0.05,
    min_frac: float = 0.05, stats: dict | None = None,
) -> tuple[set, set, float]:
    """Distributed batched peel: each round deletes every node within
    ``batch_eps`` of the round-minimum delta (the documented
    known-approximation mode of fast_greedy_decreasing_batched), with
    deltas maintained INCREMENTALLY from per-shard sparse decrement
    replies — one shard-pool RPC round per peel round, O(log) rounds,
    driver memory O(m+n), total reply volume O(E) streamed over the
    run. Last-ulp drift vs the local recompute-per-round formulation is
    possible (documented); the parity pytest pins set agreement on the
    seeded fixtures."""
    m, n = g.m, g.n
    g.broadcast_weights(col_w)
    row_delta, col_delta, cur = g.initial_deltas(col_w)
    alive_r = np.ones(m, dtype=bool)
    alive_c = np.ones(n, dtype=bool)
    best_ave = cur / (m + n) if (m + n) else 0.0
    best_round = 0
    rounds: list[tuple[np.ndarray, np.ndarray]] = []
    while alive_r.any() and alive_c.any():
        rmin = row_delta[alive_r].min()
        cmin = col_delta[alive_c].min()
        thr = min(rmin, cmin) * (1.0 + batch_eps) + 1e-12
        if min_frac > 0.0:
            # geometric-progress floor (see fast_greedy_decreasing_batched):
            # without it a flat delta tail degenerates to ~1 deletion
            # per RPC round (measured 11k rounds / 2M edges)
            alive_deltas = np.concatenate(
                [row_delta[alive_r], col_delta[alive_c]]
            )
            k = max(1, int(len(alive_deltas) * min_frac))
            thr = max(thr, float(np.partition(alive_deltas, k - 1)[k - 1]))
        del_r = np.flatnonzero(alive_r & (row_delta <= thr))
        del_c = np.flatnonzero(alive_c & (col_delta <= thr))
        if not (len(del_r) or len(del_c)):
            break
        # ray.put once per round — passing the arrays by value would
        # serialize them per shard (num_shards copies of a possibly
        # multi-MB deletion set)
        dr_ref, dc_ref = ray.put(del_r), ray.put(del_c)
        replies = ray.get(
            [s.delete_nodes.remote(dr_ref, dc_ref) for s in g.shards]
        )
        for cd_ids, cd_vals, rd_ids, rd_vals, wkill in replies:
            np.subtract.at(col_delta, cd_ids, cd_vals)
            np.subtract.at(row_delta, rd_ids, rd_vals)
            cur -= wkill
        alive_r[del_r] = False
        alive_c[del_c] = False
        rounds.append((del_r, del_c))
        denom = int(alive_r.sum() + alive_c.sum())
        if denom == 0:
            break
        if cur / denom > best_ave:
            best_ave = cur / denom
            best_round = len(rounds)
    if stats is not None:
        stats["rounds"] = len(rounds)
    best_r = np.ones(m, dtype=bool)
    best_c = np.ones(n, dtype=bool)
    for dr, dc in rounds[:best_round]:
        best_r[dr] = False
        best_c[dc] = False
    return (
        set(np.flatnonzero(best_r).tolist()),
        set(np.flatnonzero(best_c).tolist()),
        float(best_ave),
    )


def _detect_blocks_distributed(
    edges: "ray.data.Dataset",
    mode: str,
    score_tol: float,
    max_blocks: int,
    peel: str,
    batch_eps: float,
    num_shards: int,
    min_frac: float = 0.05,
) -> list[tuple[set, set, float]]:
    g = _ShardedPeelGraph(edges, num_shards=num_shards)
    try:
        res: list[tuple[set, set, float]] = []
        for _ in range(max_blocks):
            col_w = g.col_weights(mode)
            if g.n_edges == 0:
                break
            if peel == "exact":
                row_set, col_set, score = _peel_exact_distributed(g, col_w)
            else:
                row_set, col_set, score = _peel_batched_distributed(
                    g, col_w, batch_eps=batch_eps, min_frac=min_frac
                )
            if res and abs(score - res[-1][2]) < score_tol:
                break
            res.append((row_set, col_set, score))
            rs = np.fromiter(row_set, dtype=np.int64) if row_set else np.zeros(0, np.int64)
            cs = np.fromiter(col_set, dtype=np.int64) if col_set else np.zeros(0, np.int64)
            remaining = sum(ray.get([s.remove_block.remote(rs, cs) for s in g.shards]))
            if not remaining:
                break
        return res
    finally:
        g.shutdown()


def detect_blocks(
    edges: "ray.data.Dataset",
    mode: str = "log",
    score_tol: float = 0.01,
    max_blocks: int = 50,
    local_threshold: int = 20_000_000,
    peel: str = "auto",
    batch_eps: float = 0.05,
    num_shards: int = 8,
    min_frac: float = 0.05,
) -> list[tuple[set, set, float]]:
    """Fraudar.py:48-62: peel, drop the found block's edges, repeat.

    Column weights are recomputed per round on the peeled matrix —
    replicating the reference (weights from the current remaining
    edges).

    Execution (r5): below ``local_threshold`` edges the exact peel runs
    on driver-local compact arrays (byte-identical to the reference —
    conformance gate 6). Above it edges stay SHARD-RESIDENT in a
    ``_PeelShard`` actor pool and the driver holds only vertex-sized
    delta arrays: ``peel="batched"`` (the ``auto`` default at scale)
    peels in O(log) vectorized rounds; ``peel="exact"`` keeps the
    reference deletion order at one RPC round per deletion (conformance
    over speed). ``peel`` also forces a branch below the gate, which is
    what the forced-distributed parity pytest does.
    """
    n_edges = edges.count()
    if peel == "auto":
        if n_edges > local_threshold:
            return _detect_blocks_distributed(
                edges, mode, score_tol, max_blocks, "batched", batch_eps,
                num_shards, min_frac,
            )
    elif peel in ("exact", "batched"):
        return _detect_blocks_distributed(
            edges, mode, score_tol, max_blocks, peel, batch_eps,
            num_shards, min_frac,
        )
    src, dst = _collect_edges(edges)
    res: list[tuple[set, set, float]] = []
    cur_src, cur_dst = src, dst
    m = int(src.max()) + 1 if len(src) else 0
    n = int(dst.max()) + 1 if len(dst) else 0
    for _ in range(max_blocks):
        if not len(cur_src):
            break
        colsum = np.bincount(cur_dst, minlength=n).astype(np.float64)
        col_w = 1.0 / np.log(colsum + 5) if mode == "log" else 1.0 / np.sqrt(colsum + 5)
        row_set, col_set, score = fast_greedy_decreasing(cur_src, cur_dst, col_w, m=m, n=n)
        if res and abs(score - res[-1][2]) < score_tol:
            break
        res.append((row_set, col_set, score))
        in_block = np.isin(cur_src, list(row_set)) & np.isin(cur_dst, list(col_set))
        cur_src, cur_dst = cur_src[~in_block], cur_dst[~in_block]
    return res


def detect_multiple(
    edges: "ray.data.Dataset", n_blocks: int, mode: str = "log"
) -> list[tuple[set, set, float]]:
    """Fraudar.py:35-45 detectMultiple: exactly n_blocks peel rounds
    (no score-delta stop), removing each found block's edges."""
    return detect_blocks(edges, mode=mode, score_tol=-1.0, max_blocks=n_blocks)


def block_jaccard(pred: tuple[set, set], actual: tuple[set, set]) -> float:
    """Fraudar.py:114-117 block-recovery Jaccard over rows+cols."""
    inter = len(pred[0] & actual[0]) + len(pred[1] & actual[1])
    union = len(pred[0] | actual[0]) + len(pred[1] | actual[1])
    return inter / union if union else 0.0


def block_precision(pred: tuple[set, set], actual: tuple[set, set]) -> float:
    """Fraudar.py:120-122."""
    denom = len(pred[0]) + len(pred[1])
    return (len(pred[0] & actual[0]) + len(pred[1] & actual[1])) / denom if denom else 0.0


def block_recall(pred: tuple[set, set], actual: tuple[set, set]) -> float:
    """Fraudar.py:125-127."""
    denom = len(actual[0]) + len(actual[1])
    return (len(pred[0] & actual[0]) + len(pred[1] & actual[1])) / denom if denom else 0.0


def block_fmeasure(pred: tuple[set, set], actual: tuple[set, set]) -> float:
    """Fraudar.py:130-134."""
    p, r = block_precision(pred, actual), block_recall(pred, actual)
    return 0.0 if p + r == 0 else 2 * p * r / (p + r)


def fraudar_scores(
    edges: "ray.data.Dataset", blocks: list[tuple[set, set, float]]
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """eval_Fraudar.py:73-113 read-out: user score = density-normalized
    weight of the FIRST block containing the user; reviews inherit their
    user's score; non-detected get 1e-6. Distributed via broadcast of
    the (small) detected-user dict."""
    detected: dict[int, float] = {}
    for row_set, _, weight in blocks:
        for u in row_set:
            detected.setdefault(int(u), weight)
    if blocks:
        max_den, min_den = blocks[0][2], blocks[-1][2]
        span = (max_den - min_den) or 1.0
        density = {u: (w - min_den) / span for u, w in detected.items()}
    else:
        density = {}
    dref = ray.put(density)

    def user_rows(t: pa.Table) -> pa.Table:
        d = ray.get(dref)
        u = t["src"].to_numpy(zero_copy_only=False)
        score = np.array([d.get(int(x), 1e-6) for x in u])
        return pa.table({"vid": t["src"], "score": pa.array(score)})

    users = (
        edges.select_columns(["src"])
        .groupby("src")
        .aggregate(Count(alias_name="_n"))
        .map_batches(
            lambda t: pa.table({"src": t["src"]}), batch_format="pyarrow"
        )
        .map_batches(user_rows, batch_format="pyarrow")
    )

    def review_rows(t: pa.Table) -> pa.Table:
        d = ray.get(dref)
        u = t["src"].to_numpy(zero_copy_only=False)
        score = np.array([d.get(int(x), 1e-6) for x in u])
        return pa.table({"src": t["src"], "dst": t["dst"], "score": pa.array(score)})

    reviews = edges.map_batches(review_rows, batch_format="pyarrow")
    return users, reviews


def inject_clique_camo(
    src: np.ndarray,
    dst: np.ndarray,
    n_rows: int,
    n_cols: int,
    m0: int,
    n0: int,
    p: float,
    seed: int = 17,
) -> tuple[np.ndarray, np.ndarray, set, set]:
    """Planted-dense-block generator (Fraudar.py:75-106 semantics,
    seeded): returns (src', dst', planted_rows, planted_cols)."""
    rng = np.random.default_rng(seed)
    rows = rng.choice(n_rows, size=m0, replace=False)
    cols = rng.choice(n_cols, size=n0, replace=False)
    new = {(int(s), int(d)) for s, d in zip(src, dst)}
    for r in rows:
        for c in cols:
            if rng.random() < p:
                new.add((int(r), int(c)))
    arr = np.array(sorted(new), dtype=np.int64)
    return arr[:, 0], arr[:, 1], set(map(int, rows)), set(map(int, cols))
