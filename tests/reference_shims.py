"""Minimal scipy/sklearn shims so the UNMODIFIED reference code at
/root/reference can execute in this environment (scipy and sklearn are
not installed; networkx is). Used ONLY by the conformance tests to
produce golden outputs by running the reference itself (SURVEY §7.4
gate 10). Nothing here is imported by the engine.

The shims are dense-numpy-backed implementations of exactly the API
surface the reference touches:
- sklearn.metrics.roc_auc_score / average_precision_score
- scipy.special.logsumexp
- scipy.sparse.lil_matrix (setitem, tocsr) and csr (dot) for GANG
"""

from __future__ import annotations

import sys
import types

import numpy as np


def install_reference_shims() -> None:
    if "sklearn" in sys.modules and "scipy" in sys.modules:
        return

    from ugfraud_ray.functions.metrics import average_precision, roc_auc
    from ugfraud_ray.functions.numerics import logsumexp

    sk = types.ModuleType("sklearn")
    skm = types.ModuleType("sklearn.metrics")
    skm.roc_auc_score = lambda y, s: roc_auc(y, s)
    skm.average_precision_score = lambda y, s: average_precision(y, s)
    sk.metrics = skm

    # sklearn.svm.SVC -> the engine's deterministic LinearSVC, so the
    # reference's evaluate_SVD (Detector/SVD.py:90-138) executes here
    # end-to-end; constructor kwargs (C, tol, probability) are accepted
    # and ignored — the stray SVC(C=100, tol=1e-5) at SVD.py:93 is
    # discarded by the reference itself, so defaults rule both sides.
    from ugfraud_ray.detectors.svdclf import LinearSVC

    class _SVC:
        def __init__(self, **kwargs):
            self._m = LinearSVC()

        def fit(self, X, y):
            self._m.fit(np.asarray(X), np.asarray(y))
            return self

        def predict(self, X):
            return self._m.predict(np.asarray(X))

        def predict_proba(self, X):
            return self._m.predict_proba(np.asarray(X))

    sksvm = types.ModuleType("sklearn.svm")
    sksvm.SVC = _SVC
    sk.svm = sksvm
    sys.modules.setdefault("sklearn", sk)
    sys.modules.setdefault("sklearn.metrics", skm)
    sys.modules.setdefault("sklearn.svm", sksvm)

    class _DenseMat:
        """scipy.sparse stand-in: dense backing, matrix-style ops —
        exactly the surface the reference detectors touch (lil/csr/coo
        setitem, tocsr/tolil/todok, dot/__mul__ = MATMUL, transpose,
        sum returning np.matrix like scipy, .rows adjacency lists,
        comparison + astype, +/- for ZooBP's M = P - Q + I)."""

        def __init__(self, shape):
            self.A = np.zeros(shape)

        @classmethod
        def from_array(cls, a):
            out = cls(a.shape)
            out.A = np.array(a, dtype=np.float64)
            return out

        def __setitem__(self, idx, value):
            self.A[idx] = np.asarray(value).reshape(np.shape(self.A[idx])) if np.ndim(value) else value

        def __getitem__(self, idx):
            return self.A[idx]

        def tocsr(self):
            return self

        def tolil(self):
            return self

        def todok(self):
            return self

        def tocsc(self):
            return self

        def asfptype(self):
            return self

        def copy(self):
            return _DenseMat.from_array(self.A)

        def astype(self, dt):
            return _DenseMat.from_array(self.A.astype(dt))

        def dot(self, other):
            other_a = other.A if isinstance(other, _DenseMat) else np.asarray(other)
            return self.A @ other_a

        def __mul__(self, other):
            if isinstance(other, _DenseMat):
                return _DenseMat.from_array(self.A @ other.A)
            if np.isscalar(other):
                return _DenseMat.from_array(self.A * other)
            return self.A @ np.asarray(other)

        def __rmul__(self, other):
            if np.isscalar(other):
                return _DenseMat.from_array(self.A * other)
            return np.asarray(other) @ self.A

        def __add__(self, other):
            other_a = other.A if isinstance(other, _DenseMat) else np.asarray(other)
            return _DenseMat.from_array(self.A + other_a)

        def __sub__(self, other):
            other_a = other.A if isinstance(other, _DenseMat) else np.asarray(other)
            return _DenseMat.from_array(self.A - other_a)

        def __gt__(self, x):
            return _DenseMat.from_array((self.A > x).astype(np.float64))

        @property
        def shape(self):
            return self.A.shape

        def sum(self, axis=None):
            if axis is None:
                return self.A.sum()
            return np.matrix(self.A.sum(axis=axis, keepdims=True))

        def transpose(self):
            return _DenseMat.from_array(self.A.T)

        def nonzero(self):
            return np.nonzero(self.A)

        def setdiag(self, values):
            np.fill_diagonal(self.A, np.asarray(values).reshape(-1))

        @property
        def rows(self):
            # lil_matrix.rows: per-row sorted column-index lists
            return [np.flatnonzero(self.A[i]).tolist() for i in range(self.A.shape[0])]

    def _coo_matrix(arg, shape=None, dtype=None):
        if isinstance(arg, tuple) and len(arg) == 2 and np.isscalar(arg[0]):
            return _DenseMat(arg)  # empty (m, n)
        data, (rows, cols) = arg
        m = _DenseMat(shape)
        np.add.at(m.A, (np.asarray(rows, np.int64), np.asarray(cols, np.int64)),
                  np.asarray(data, np.float64))
        return m

    def _csr_matrix(arg, shape=None):
        return _coo_matrix(arg, shape=shape)

    def _kron(a, b):
        aa = a.A if isinstance(a, _DenseMat) else np.asarray(a)
        bb = b.A if isinstance(b, _DenseMat) else np.asarray(b)
        return _DenseMat.from_array(np.kron(aa, bb))

    def _stack(parts, axis):
        arrs = [p.A if isinstance(p, _DenseMat) else np.asarray(p) for p in parts]
        return _DenseMat.from_array(np.concatenate(arrs, axis=axis))

    def _svds(mat, k=6):
        a = mat.A if isinstance(mat, _DenseMat) else np.asarray(mat)
        u, s, vt = np.linalg.svd(a, full_matrices=False)
        # scipy.svds returns the top-k in ASCENDING order
        return u[:, :k][:, ::-1], s[:k][::-1], vt[:k][::-1]

    sp = types.ModuleType("scipy")
    sp_sparse = types.ModuleType("scipy.sparse")
    sp_sparse.lil_matrix = lambda shape: _DenseMat(shape)
    sp_sparse.coo_matrix = _coo_matrix
    sp_sparse.csr_matrix = _csr_matrix
    sp_sparse.kron = _kron
    sp_sparse.hstack = lambda parts: _stack(parts, 1)
    sp_sparse.vstack = lambda parts: _stack(parts, 0)
    sp_sparse.diags = lambda v: _DenseMat.from_array(np.diag(np.asarray(v).reshape(-1)))
    sp_sparse.eye = lambda n: _DenseMat.from_array(np.eye(int(n)))
    sp_sparse_linalg = types.ModuleType("scipy.sparse.linalg")
    sp_sparse_linalg.svds = _svds
    sp_sparse.linalg = sp_sparse_linalg
    sp_special = types.ModuleType("scipy.special")
    sp_special.logsumexp = logsumexp
    sp.sparse = sp_sparse
    sp.special = sp_special
    sys.modules.setdefault("scipy", sp)
    sys.modules.setdefault("scipy.sparse", sp_sparse)
    sys.modules.setdefault("scipy.sparse.linalg", sp_sparse_linalg)
    sys.modules.setdefault("scipy.special", sp_special)

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def build_reference_graph(src, dst, rating, u_prior, p_prior, r_prior, U, Pn):
    """networkx graph in the reference's exact format (demo_pre.py:44-96):
    products numbered '0'..'Pn-1' FIRST, users 'Pn'.. (GANG.py:100-155
    indexes the matrix by int(node_id) with products before users).

    src/dst come from tests' _mini_review_graph (users 0..U-1,
    prods U..U+Pn-1) and are relabeled accordingly.
    """
    import networkx as nx

    G = nx.Graph()
    # users inserted FIRST so nx reports edges as (user, prod) — the
    # key orientation SpEagle's review_priors lookup assumes
    # (demo_pre.py builds graphs user-first)
    for u in range(U):
        G.add_node(str(Pn + u), types="user", prior=float(u_prior[u]), label=0)
    for p in range(Pn):
        G.add_node(str(p), types="prod", prior=float(p_prior[p]))
    for e in range(len(src)):
        u_id = str(Pn + int(src[e]))
        p_id = str(int(dst[e]) - U)
        G.add_edge(
            u_id, p_id,
            types="review", prior=float(r_prior[e]),
            rating=int(rating[e]), label=0,
        )
    return G
