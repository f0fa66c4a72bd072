"""fBox — spectral-reconstruction outlier detection.

Reference /root/reference/UGFraud/Detector/fBox.py:52-107: truncated
SVD (k), reconstructed out/in degree = row norms of U·S / V·S; for each
distinct ORIGINAL degree d, threshold = np.percentile(rec degrees of
nodes with degree d, tau); node suspicious iff its rec degree is
strictly below its degree's threshold.

Engine form: Gram-based exact truncated SVD (detectors/spectral.py),
degree table via grouped count (A1), per-degree exact percentile via
groupby(degree).map_groups (A4 — degree groups are skewed, d=1 giant;
np.percentile per group is vectorized and the group carries only its
rec-degree floats, not adjacency).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ugfraud_ray.functions.collect import collect_table
import ray.data
from ray.data.aggregate import Count

from ugfraud_ray.stages.graph_build import join_partitions
from ugfraud_ray.detectors.spectral import (
    col_recon_norms,
    gram_matrix,
    row_recon_norms,
    truncated_svd_from_gram,
)


def _percentile_thresholds(
    deg_rec: "ray.data.Dataset", tau: float
) -> "ray.data.Dataset":
    """(degree, threshold): exact per-degree percentile (fBox.py:72-76)."""

    def pct(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "degree": pa.array([int(g["degree"][0].as_py())]),
                "threshold": pa.array(
                    [float(np.percentile(g["rec"].to_numpy(zero_copy_only=False), tau))]
                ),
            }
        )

    return deg_rec.groupby("degree").map_groups(pct, batch_format="pyarrow")


def _flag_side(
    ids: np.ndarray, deg: np.ndarray, rec: np.ndarray, tau: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-degree percentile threshold + strict-below flag (fBox.py:72-76)
    over compact arrays — shared by the local fast path and the
    driver-side product read-out."""
    out_id, out_deg, out_rec, out_thr = [], [], [], []
    for d in np.unique(deg):
        m = deg == d
        th = float(np.percentile(rec[m], tau))
        bad = m & (rec < th)
        out_id.append(ids[bad])
        out_deg.append(deg[bad])
        out_rec.append(rec[bad])
        out_thr.append(np.full(int(bad.sum()), th))
    cat = lambda xs: np.concatenate(xs) if xs else np.array([])
    return cat(out_id), cat(out_deg), cat(out_rec), cat(out_thr)


def _fbox_local(
    src: np.ndarray, dst: np.ndarray, n_prods: int, tau: float, k: int,
    prod_offset: int,
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """Driver-local fBox over collected COO edges — identical kernels
    (local_gram → eigh → rec norms → per-degree percentile) without the
    4 shuffle spin-ups of the distributed read-out."""
    from ugfraud_ray.detectors.spectral import local_gram

    G = local_gram(src, dst, None, n_prods)
    k_eff = min(k, n_prods - 1 if n_prods > 1 else 1)
    s, Vk = truncated_svd_from_gram(G, k_eff)

    uniq_u, inv_u = np.unique(src, return_inverse=True)
    sums = np.zeros((len(uniq_u), k_eff))
    np.add.at(sums, inv_u, Vk[dst])
    rec_u = np.linalg.norm(sums, axis=1)
    deg_u = np.bincount(inv_u).astype(np.int64)
    ui, ud, ur, ut = _flag_side(uniq_u, deg_u, rec_u, tau)
    sus_users = pa.table(
        {
            "vid": pa.array(ui.astype(np.int64)),
            "degree": pa.array(ud.astype(np.int64)),
            "rec": pa.array(ur.astype(np.float64)),
            "threshold": pa.array(ut.astype(np.float64)),
        }
    )

    rec_p_full = col_recon_norms(s, Vk)
    uniq_p, pdeg = np.unique(dst, return_counts=True)
    pi, pd_, pr, pt = _flag_side(uniq_p, pdeg.astype(np.int64), rec_p_full[uniq_p], tau)
    sus_prods = pa.table(
        {
            "pid": pa.array(pi.astype(np.int64) + prod_offset),
            "degree": pa.array(pd_.astype(np.int64)),
            "rec": pa.array(pr.astype(np.float64)),
            "threshold": pa.array(pt.astype(np.float64)),
        }
    )
    return ray.data.from_arrow(sus_users), ray.data.from_arrow(sus_prods)


def fbox(
    edges: "ray.data.Dataset",
    n_prods: int,
    tau: float = 20.0,
    k: int = 50,
    prod_offset: int = 0,
    approx_edges: int | None = None,
    local_threshold: int = 2_000_000,
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """Run fBox on binary (src=user, dst=prod-index) edges.

    dst values must be in [prod_offset, prod_offset + n_prods). Returns
    (suspicious_users(vid, degree, rec, threshold),
     suspicious_prods(pid, degree, rec, threshold)).

    approx_edges: caller-known edge-count bound; at or below
    ``local_threshold`` the whole read-out runs driver-local on the
    collected edges with identical kernels (the distributed read-out
    pays ~4 shuffle-pool spin-ups that dwarf sub-million-row inputs).
    """
    e = edges.select_columns(["src", "dst"])
    if prod_offset:
        def shift(t: pa.Table) -> pa.Table:
            d = t["dst"].to_numpy(zero_copy_only=False) - prod_offset
            return pa.table({"src": t["src"], "dst": pa.array(d)})

        e = e.map_batches(shift, batch_format="pyarrow")

    if approx_edges is not None and approx_edges <= local_threshold:
        t = collect_table(e)
        return _fbox_local(
            t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
            n_prods, tau, k, prod_offset,
        )

    e = e.materialize()

    G = gram_matrix(e, n_prods)
    k_eff = min(k, n_prods - 1 if n_prods > 1 else 1)
    s, Vk = truncated_svd_from_gram(G, k_eff)

    # users: rec out-degree + original out-degree
    rec_u = row_recon_norms(e, Vk)
    deg_u = e.groupby("src").aggregate(Count(alias_name="degree")).rename_columns({"src": "vid"})
    du = rec_u.join(deg_u, join_type="inner", num_partitions=join_partitions(), on=("vid",)).materialize()
    thr_u = _percentile_thresholds(du, tau)
    tu = pa.concat_tables([b for b in ray.get(thr_u.to_arrow_refs()) if b.num_rows])
    thr_map = np.zeros(int(tu["degree"].to_numpy(zero_copy_only=False).max()) + 1)
    thr_map[tu["degree"].to_numpy(zero_copy_only=False)] = tu["threshold"].to_numpy(zero_copy_only=False)
    thr_ref = ray.put(thr_map)

    def flag(t: pa.Table) -> pa.Table:
        tm = ray.get(thr_ref)
        deg = t["degree"].to_numpy(zero_copy_only=False)
        rec = t["rec"].to_numpy(zero_copy_only=False)
        th = tm[deg]
        keep = rec < th
        return pa.table(
            {
                "vid": pa.array(t["vid"].to_numpy(zero_copy_only=False)[keep]),
                "degree": pa.array(deg[keep]),
                "rec": pa.array(rec[keep]),
                "threshold": pa.array(th[keep]),
            }
        )

    sus_users = du.map_batches(flag, batch_format="pyarrow")

    # products: driver-side (n_prods-sized)
    rec_p = col_recon_norms(s, Vk)
    dt = collect_table(e.groupby("dst").aggregate(Count(alias_name="degree")))
    pid = dt["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    pdeg = dt["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
    prec = rec_p[pid]
    sus_p_rows = {"pid": [], "degree": [], "rec": [], "threshold": []}
    for d in np.unique(pdeg):
        m = pdeg == d
        th = float(np.percentile(prec[m], tau))
        bad = m & (prec < th)
        sus_p_rows["pid"].extend((pid[bad] + prod_offset).tolist())
        sus_p_rows["degree"].extend(pdeg[bad].tolist())
        sus_p_rows["rec"].extend(prec[bad].tolist())
        sus_p_rows["threshold"].extend([th] * int(bad.sum()))
    sus_prods = pa.table(
        {
            "pid": pa.array(sus_p_rows["pid"], pa.int64()),
            "degree": pa.array(sus_p_rows["degree"], pa.int64()),
            "rec": pa.array(sus_p_rows["rec"], pa.float64()),
            "threshold": pa.array(sus_p_rows["threshold"], pa.float64()),
        }
    )
    return sus_users, ray.data.from_arrow(sus_prods)


def spectral_recon_matrix(
    deg_rec: "ray.data.Dataset", bins: int = 100
) -> tuple[pa.Table, np.ndarray]:
    """A9 get_srms analog (fBox.py:109-143): histogram the reconstructed
    degrees per original degree.

    Driver computes the global bin edges (min/max aggregate, linspace —
    the same edges np.histogram would produce); each batch digitizes
    vectorized and emits (bin, degree, n) partials; one small groupby
    sums them (bins x distinct-degrees groups — bounded). Returns the
    sparse COO table and the bin edges.
    """
    from ray.data.aggregate import Max, Min, Sum

    stats = deg_rec.aggregate(Min("rec", alias_name="mn"), Max("rec", alias_name="mx"))
    edges = np.linspace(float(stats["mn"]), float(stats["mx"]), bins + 1)
    edges_ref = ray.put(edges)

    def digitize(t: pa.Table) -> pa.Table:
        ed = ray.get(edges_ref)
        rec = t["rec"].to_numpy(zero_copy_only=False)
        deg = t["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.digitize(rec, ed)
        # per-batch (bin, degree) pair counts via lexsort runs
        order = np.lexsort((deg, b))
        bs, ds_ = b[order], deg[order]
        if len(bs):
            starts = np.flatnonzero(
                np.concatenate([[True], (np.diff(bs) != 0) | (np.diff(ds_) != 0)])
            )
            counts = np.diff(np.append(starts, len(bs)))
        else:
            starts = counts = np.zeros(0, dtype=np.int64)
        return pa.table(
            {
                "bin": pa.array(bs[starts]),
                "degree": pa.array(ds_[starts]),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    coo = (
        deg_rec.map_batches(digitize, batch_format="pyarrow")
        .groupby(["bin", "degree"])
        .aggregate(Sum("n", alias_name="n"))
    )
    from ugfraud_ray.functions.collect import collect_table

    return collect_table(coo), edges


def fbox_review_scores(
    edges: "ray.data.Dataset",
    review_prior_edges: "ray.data.Dataset",
    sus_users: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """eval_fBox.py:33-38 read-out: review score = review prior if the
    user is suspicious else 0 (broadcast semi-join, J5)."""
    st = collect_table(sus_users.select_columns(["vid"]))
    sus = set(st["vid"].to_pylist())
    sus_ref = ray.put(sus)

    def f(t: pa.Table) -> pa.Table:
        s = ray.get(sus_ref)
        src = t["src"].to_numpy(zero_copy_only=False)
        mask = np.array([int(x) in s for x in src])
        score = np.where(mask, t["prior"].to_numpy(zero_copy_only=False), 0.0)
        return pa.table({"src": t["src"], "dst": t["dst"], "score": pa.array(score)})

    return review_prior_edges.map_batches(f, batch_format="pyarrow")
