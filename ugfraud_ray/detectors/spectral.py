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
from ray.data.aggregate import Sum


def gram_matrix(
    edges: "ray.data.Dataset",
    n_cols: int,
    col_id: str = "dst",
    row_id: str = "src",
    value: str | None = None,
) -> np.ndarray:
    """Exact G = AᵀA for the (implicit) row_id x col_id matrix.

    value=None -> binary matrix. Rows are grouped per row_id; each
    group emits its upper-triangle co-occurrence COO rows (vectorized
    triu), a single groupby-sum reduces them, the driver densifies.
    """

    def pairs(g) -> pa.Table:
        cols = g[col_id].to_numpy().astype(np.int64)
        if value is None:
            vals = np.ones(len(cols))
        else:
            vals = g[value].to_numpy().astype(np.float64)
        order = np.argsort(cols)
        cols, vals = cols[order], vals[order]
        i, j = np.triu_indices(len(cols))
        return pa.table(
            {
                "gi": pa.array(cols[i]),
                "gj": pa.array(cols[j]),
                "v": pa.array(vals[i] * vals[j]),
            }
        )

    coo = (
        edges.groupby(row_id)
        .map_groups(pairs, batch_format="pandas")
        .groupby(["gi", "gj"])
        .aggregate(Sum("v", alias_name="v"))
    )
    t = pa.concat_tables([b for b in ray.get(coo.to_arrow_refs()) if b.num_rows])
    G = np.zeros((n_cols, n_cols))
    gi = t["gi"].to_numpy(zero_copy_only=False)
    gj = t["gj"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    G[gi, gj] = v
    G[gj, gi] = v
    return G


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
    norm fBox thresholds on (fBox.py:60-63). V_k broadcast once."""
    v_ref = ray.put(np.ascontiguousarray(Vk))

    def per_row(g) -> pa.Table:
        V = ray.get(v_ref)
        cols = g[col_id].to_numpy().astype(np.int64)
        if value is None:
            row = V[cols].sum(axis=0)
        else:
            row = (g[value].to_numpy().astype(np.float64)[:, None] * V[cols]).sum(axis=0)
        return pa.table(
            {"vid": pa.array([int(g[row_id].iloc[0])]), "rec": pa.array([float(np.linalg.norm(row))])}
        )

    return edges.groupby(row_id).map_groups(per_row, batch_format="pandas")


def col_recon_norms(s: np.ndarray, Vk: np.ndarray) -> np.ndarray:
    """‖(V_k S_k)[col]‖ per column (fBox.py:63) — driver, n_cols-sized."""
    return np.sqrt((Vk**2) @ (s**2))
