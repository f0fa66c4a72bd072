"""SVD detector — low-rank user embeddings from the rating matrix.

Reference /root/reference/UGFraud/Detector/SVD.py:16-55: dense
(n_users x n_prods) rating matrix (np.empty — B4: unset cells are
uninitialized; the engine uses zeros, the corrected semantics), then
``svds(matrix, k=int(round(min_dim * percent)))`` and U as the user
embedding. The reference then trains a scikit-learn SVM on U
(SVD.py:90-103) — sklearn is unavailable in this environment (the
reference itself cannot run that step here either, SURVEY §7.0), so the
engine exposes:

- ``svd_user_embedding``: (vid, e0..e{k-1}) — exact U_k via the Gram
  route (U_k = A V_k / s_k), distributed over edges;
- ``svd_singular_values``: exact s_k (conformance gate 7);
- ``svd_user_scores``: a deterministic centroid scorer on the embedding
  (distance-to-labeled-centroid ratio) replacing the SVM readout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ugfraud_ray.functions.collect import collect_table
import ray.data

from ugfraud_ray.detectors.spectral import gram_matrix, truncated_svd_from_gram


def svd_decompose(
    edges: "ray.data.Dataset",
    n_prods: int,
    percent: float = 0.9,
    value: str = "rating",
    approx_edges: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(s_k, V_k) of the rating matrix; k = int(round(n_prods*percent))
    clamped to >=1 (SVD.py:52). approx_edges gates gram_matrix's
    driver-local fast path for small inputs."""
    k = max(1, int(round(n_prods * percent)))
    k = min(k, n_prods)
    G = gram_matrix(edges, n_prods, value=value, approx_edges=approx_edges)
    return truncated_svd_from_gram(G, k)


def svd_user_embedding(
    edges: "ray.data.Dataset",
    s: np.ndarray,
    Vk: np.ndarray,
    value: str = "rating",
) -> "ray.data.Dataset":
    """(vid, emb: fixed_size_list<double, k>) — U_k rows = A V_k / s_k.

    Vectorized segmented sum: each block pre-combines its edges per
    unique src with ONE ``np.add.at`` over the (uniq, k) buffer (the
    projection matrix broadcast once via ``ray.put``), then a single
    k-column groupby-sum merges cross-block partials — never a
    per-user ``map_groups`` (the measured many-small-groups slow
    path). Determinism: each block's float partial is quantized to the
    1e-9 integer grid before the grouped sum (the engine's exact-sum
    pattern), so the cross-block merge is an order-free int64 sum and
    the embedding — and everything trained on it (svd_user_probs) — is
    bit-identical run to run regardless of Ray's block order. The
    ≤0.5e-9-per-block quantization error is far below the 1e-6
    reference-conformance tolerance (gate 11)."""
    from ray.data.aggregate import Sum

    s_safe = np.where(s > 0, s, 1.0)
    proj = Vk / s_safe[None, :]
    k = proj.shape[1]
    ref = ray.put(np.ascontiguousarray(proj))
    ecols = [f"e{j}" for j in range(k)]

    def partial(t: pa.Table) -> pa.Table:
        P = ray.get(ref)
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = t[value].to_numpy(zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(src, return_inverse=True)
        buf = np.zeros((len(uniq), P.shape[1]))
        np.add.at(buf, inv, vals[:, None] * P[cols])
        grid = np.floor(buf * 1e9 + 0.5).astype(np.int64)
        out = {"vid": pa.array(uniq)}
        for j, c in enumerate(ecols):
            out[c] = pa.array(grid[:, j])
        return pa.table(out)

    summed = (
        edges.map_batches(partial, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(*[Sum(c, alias_name=c) for c in ecols])
    )

    def pack(t: pa.Table) -> pa.Table:
        m = (
            np.column_stack([t[c].to_numpy(zero_copy_only=False) for c in ecols])
            .astype(np.float64)
            / 1e9
        )
        return pa.table(
            {
                "vid": t["vid"],
                "emb": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.reshape(-1)), k
                ),
            }
        )

    return summed.map_batches(pack, batch_format="pyarrow")


def svd_user_scores(
    embedding: "ray.data.Dataset",
    labels: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """Deterministic replacement for the reference's SVM readout:
    score = d(neg centroid) / (d(pos centroid) + d(neg centroid)),
    centroids from the labeled subset (broadcast, tiny)."""
    lt = collect_table(labels)
    lab = dict(zip(lt["vid"].to_pylist(), lt["label"].to_pylist()))
    et = collect_table(embedding)
    vids = et["vid"].to_numpy(zero_copy_only=False)
    k = len(et["emb"][0])
    embs = np.asarray(et["emb"].combine_chunks().flatten().to_numpy(zero_copy_only=False)).reshape(len(vids), k)
    mask_pos = np.array([lab.get(int(v), 0) == 1 for v in vids])
    mask_neg = np.array([lab.get(int(v), 1) == 0 for v in vids])
    c_pos = embs[mask_pos].mean(axis=0) if mask_pos.any() else np.zeros(k)
    c_neg = embs[mask_neg].mean(axis=0) if mask_neg.any() else np.zeros(k)
    cref = ray.put((c_pos, c_neg))

    def score(t: pa.Table) -> pa.Table:
        cp, cn = ray.get(cref)
        kk = len(t["emb"][0])
        x = np.asarray(t["emb"].combine_chunks().flatten().to_numpy(zero_copy_only=False)).reshape(t.num_rows, kk)
        dp = np.linalg.norm(x - cp, axis=1)
        dn = np.linalg.norm(x - cn, axis=1)
        sc = dn / np.maximum(dp + dn, 1e-12)
        return pa.table({"vid": t["vid"], "score": pa.array(sc)})

    return embedding.map_batches(score, batch_format="pyarrow")
