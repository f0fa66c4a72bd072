"""Numpy kernels replacing the scipy/sklearn calls the reference makes.

scipy is not available in this environment (SURVEY §7.0); these are the
engine's own vectorized implementations, written against the public
definitions of the functions.
"""

from __future__ import annotations

import numpy as np


def logsumexp(a: np.ndarray, axis=None, keepdims=False) -> np.ndarray:
    """log(sum(exp(a))) computed stably (scipy.special.logsumexp equivalent).

    Used by SpEagle message updates (reference Detector/SpEagle.py:210-215)
    and ZooBP (Detector/ZooBP.py:144).
    """
    a = np.asarray(a, dtype=np.float64)
    amax = np.max(a, axis=axis, keepdims=True)
    amax = np.where(np.isfinite(amax), amax, 0.0)
    out = np.log(np.sum(np.exp(a - amax), axis=axis, keepdims=True)) + amax
    return out if keepdims else np.squeeze(out, axis=axis) if axis is not None else out.reshape(())[()]


def safe_log(x: np.ndarray, eps: float = 1e-10) -> np.ndarray:
    """log with additive smoothing (reference Detector/SpEagle.py:325-328)."""
    return np.log(np.asarray(x, dtype=np.float64) + eps)
