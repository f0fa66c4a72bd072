"""Distributed spectral core shared by fBox and the SVD detector.

The reference calls ``scipy.sparse.linalg.svds`` on the full matrix in
driver RAM (/root/reference/UGFraud/Detector/fBox.py:58,
Detector/SVD.py:54). Bipartite web/review matrices are tall-skinny
(users >> products), so the engine computes the exact truncated SVD via
the (n_prods x n_prods) Gram matrix:

    G = AᵀA            — ONE groupby(src) pass emitting per-user
                          co-occurrence pairs (sparse COO), one
                          groupby(pair) sum; G collects to the driver
                          (n_cols² doubles — small by construction;
                          at 10^12 docs pick the catalog side or switch
                          to randomized sketching)
    eigh(G) = V S² Vᵀ   — driver, exact
    right vecs = V_k, singular values s_k = sqrt(eig)
    row norms ‖U_k S_k‖ = ‖A V_k‖ — one distributed pass over edges
                          with V_k broadcast via ray.put

Exact (same spectrum as svds) and sign-invariant by construction since
only norms/values are consumed downstream (SURVEY §7.4 gates 5/7).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ugfraud_ray.stages.graph_build import join_partitions
from ray.data.aggregate import Sum


def local_gram(
    rows: np.ndarray, cols: np.ndarray, vals: np.ndarray | None, n_cols: int
) -> np.ndarray:
    """Driver-local exact G = AᵀA over compact COO arrays — the same
    per-row pair-product expansion the distributed path performs, fully
    vectorized (no Python loop over rows). O(Σ_r d_r²) work."""
    G = np.zeros((n_cols, n_cols))
    if not len(rows):
        return G
    order = np.argsort(rows, kind="stable")
    d_s = cols[order].astype(np.int64)
    v_s = None if vals is None else vals[order].astype(np.float64)
    _, counts = np.unique(rows[order], return_counts=True)
    seg_off = np.concatenate([[0], np.cumsum(counts)])[:-1]
    pair_counts = counts * counts
    total = int(pair_counts.sum())
    pair_row = np.repeat(np.arange(len(counts)), pair_counts)
    block_start = np.concatenate([[0], np.cumsum(pair_counts)])[:-1]
    idx = np.arange(total) - block_start[pair_row]
    c = counts[pair_row]
    L = seg_off[pair_row] + idx // c
    R = seg_off[pair_row] + idx % c
    pv = np.ones(total) if v_s is None else v_s[L] * v_s[R]
    np.add.at(G, (d_s[L], d_s[R]), pv)
    return G


def gram_matrix(
    edges: "ray.data.Dataset",
    n_cols: int,
    col_id: str = "dst",
    row_id: str = "src",
    value: str | None = None,
    approx_edges: int | None = None,
    local_threshold: int = 2_000_000,
) -> np.ndarray:
    """Exact G = AᵀA for the (implicit) row_id x col_id matrix.

    value=None -> binary matrix. G[i,j] = Σ_rows A[r,i]·A[r,j] is the
    co-occurrence count: a hash self-join of the edge table on row_id
    (fully vectorized, no per-group Python) expands each row's pair
    products, one groupby-sum reduces them, the driver densifies.
    Scale note: pair volume is Σ_r d_r² — bounded for bipartite
    review/link shapes where the row side is low-degree; split or cap
    pathological heavy rows before calling.

    approx_edges: caller-known upper bound on the edge count. At or
    below ``local_threshold`` the self-join's fixed shuffle-pool
    spin-up (~2-7 s) dwarfs the compute, so the edges collect to the
    driver and run the identical pair-expansion kernel (``local_gram``)
    locally; the distributed path is unchanged for scale.
    """
    if approx_edges is not None and approx_edges <= local_threshold:
        from ugfraud_ray.functions.collect import collect_table

        cols_needed = [row_id, col_id] + ([value] if value else [])
        t = collect_table(edges.select_columns(cols_needed))
        return local_gram(
            t[row_id].to_numpy(zero_copy_only=False),
            t[col_id].to_numpy(zero_copy_only=False).astype(np.int64),
            None if value is None else t[value].to_numpy(zero_copy_only=False),
            n_cols,
        )
    left_cols = [row_id, col_id] + ([value] if value else [])
    left = edges.select_columns(left_cols).rename_columns(
        {col_id: "gi", **({value: "vi"} if value else {})}
    )
    right = edges.select_columns(left_cols).rename_columns(
        {col_id: "gj", **({value: "vj"} if value else {})}
    )
    joined = left.join(right, join_type="inner", num_partitions=join_partitions(), on=(row_id,))

    @ray.remote
    def dense_partial(block: pa.Table) -> np.ndarray:
        G = np.zeros((n_cols, n_cols))
        gi = block["gi"].to_numpy(zero_copy_only=False).astype(np.int64)
        gj = block["gj"].to_numpy(zero_copy_only=False).astype(np.int64)
        if value is None:
            v = np.ones(len(gi))
        else:
            v = (
                block["vi"].to_numpy(zero_copy_only=False)
                * block["vj"].to_numpy(zero_copy_only=False)
            )
        np.add.at(G, (gi, gj), v)
        return G

    @ray.remote
    def tree_sum(*parts: np.ndarray) -> np.ndarray:
        out = parts[0].copy()
        for p in parts[1:]:
            out += p
        return out

    refs = [dense_partial.remote(b) for b in joined.to_arrow_refs()]
    # tree reduce: fan-in 8 to keep driver out of the data path
    while len(refs) > 1:
        refs = [tree_sum.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
    return ray.get(refs[0]) if refs else np.zeros((n_cols, n_cols))


def truncated_svd_from_gram(G: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(s_k desc, V_k) — exact top-k singular values / right vectors."""
    w, V = np.linalg.eigh(G)
    order = np.argsort(w)[::-1][:k]
    s = np.sqrt(np.maximum(w[order], 0.0))
    return s, V[:, order]


def row_recon_norms(
    edges: "ray.data.Dataset",
    Vk: np.ndarray,
    row_id: str = "src",
    col_id: str = "dst",
    value: str | None = None,
) -> "ray.data.Dataset":
    """(vid, rec) where rec = ‖(A V_k)[row]‖ — the reconstructed-degree
    norm fBox thresholds on (fBox.py:60-63). V_k broadcast once.

    Fully vectorized: each batch emits per-row partial k-vectors
    (segment-sum by row inside the batch), a k-column Sum aggregate
    combines them, then a map computes the norms — no per-group Python.
    """
    k = Vk.shape[1]
    v_ref = ray.put(np.ascontiguousarray(Vk))

    def partial(t: pa.Table) -> pa.Table:
        V = ray.get(v_ref)
        rows = t[row_id].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = t[col_id].to_numpy(zero_copy_only=False).astype(np.int64)
        contrib = V[cols]
        if value is not None:
            contrib = contrib * t[value].to_numpy(zero_copy_only=False).astype(np.float64)[:, None]
        uniq, inv = np.unique(rows, return_inverse=True)
        sums = np.zeros((len(uniq), k))
        np.add.at(sums, inv, contrib)
        out = {"vid": pa.array(uniq)}
        for j in range(k):
            out[f"c{j}"] = pa.array(sums[:, j])
        return pa.table(out)

    from ray.data.aggregate import Sum as _Sum

    agg = (
        edges.map_batches(partial, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(*[_Sum(f"c{j}", alias_name=f"c{j}") for j in range(k)])
    )

    def norms(t: pa.Table) -> pa.Table:
        mat = np.column_stack([t[f"c{j}"].to_numpy(zero_copy_only=False) for j in range(k)])
        return pa.table({"vid": t["vid"], "rec": pa.array(np.linalg.norm(mat, axis=1))})

    return agg.map_batches(norms, batch_format="pyarrow")


def col_recon_norms(s: np.ndarray, Vk: np.ndarray) -> np.ndarray:
    """‖(V_k S_k)[col]‖ per column (fBox.py:63) — driver, n_cols-sized."""
    return np.sqrt((Vk**2) @ (s**2))
