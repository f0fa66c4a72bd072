"""ROC-AUC / average-precision in pure numpy (sklearn is unavailable).

Implements the standard published definitions (the same quantities
`sklearn.metrics.roc_auc_score` / `average_precision_score` compute),
used by `evaluate` (reference Utils/helper.py:39-63, A10 in SURVEY §2.5).

- roc_auc: Mann-Whitney U statistic with midrank tie handling.
- average_precision: AP = sum_n (R_n - R_{n-1}) * P_n over descending
  score thresholds, ties collapsed into one threshold.
"""

from __future__ import annotations

import numpy as np


def _midranks(x: np.ndarray) -> np.ndarray:
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), dtype=np.float64)
    sx = x[order]
    i = 0
    n = len(x)
    rank_vals = np.arange(1, n + 1, dtype=np.float64)
    # average ranks over tie groups
    boundaries = np.flatnonzero(np.diff(sx)) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [n]])
    for s, e in zip(starts, ends):
        rank_vals[s:e] = 0.5 * (s + 1 + e)
    ranks[order] = rank_vals
    return ranks


def roc_auc(y_true, y_score) -> float:
    y = np.asarray(y_true, dtype=np.int64)
    s = np.asarray(y_score, dtype=np.float64)
    n_pos = int(y.sum())
    n_neg = len(y) - n_pos
    if n_pos == 0 or n_neg == 0:
        raise ValueError("roc_auc needs both classes present")
    ranks = _midranks(s)
    u = ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def average_precision(y_true, y_score) -> float:
    y = np.asarray(y_true, dtype=np.int64)
    s = np.asarray(y_score, dtype=np.float64)
    order = np.argsort(-s, kind="mergesort")
    y = y[order]
    s = s[order]
    n_pos = int(y.sum())
    if n_pos == 0:
        return 0.0
    tps = np.cumsum(y)
    fps = np.cumsum(1 - y)
    # threshold at the last element of each tie group of scores
    distinct = np.flatnonzero(np.diff(s))
    idx = np.concatenate([distinct, [len(s) - 1]])
    tps_t = tps[idx].astype(np.float64)
    fps_t = fps[idx].astype(np.float64)
    precision = tps_t / (tps_t + fps_t)
    recall = tps_t / n_pos
    recall_prev = np.concatenate([[0.0], recall[:-1]])
    return float(np.sum((recall - recall_prev) * precision))
