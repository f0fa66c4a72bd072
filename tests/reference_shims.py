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
    sys.modules.setdefault("sklearn", sk)
    sys.modules.setdefault("sklearn.metrics", skm)

    class _DenseMat:
        """lil/csr stand-in: dense backing, matrix-style ops."""

        def __init__(self, shape):
            self.A = np.zeros(shape)

        def __setitem__(self, idx, value):
            self.A[idx] = value

        def __getitem__(self, idx):
            return self.A[idx]

        def tocsr(self):
            return self

        def tolil(self):
            return self

        def dot(self, other):
            other_a = other.A if isinstance(other, _DenseMat) else np.asarray(other)
            return self.A @ other_a

        def __mul__(self, other):
            return self.dot(other)

        @property
        def shape(self):
            return self.A.shape

        def sum(self, axis=None):
            return self.A.sum(axis=axis)

        def transpose(self):
            out = _DenseMat(self.A.T.shape)
            out.A = self.A.T.copy()
            return out

    sp = types.ModuleType("scipy")
    sp_sparse = types.ModuleType("scipy.sparse")
    sp_sparse.lil_matrix = lambda shape: _DenseMat(shape)
    sp_special = types.ModuleType("scipy.special")
    sp_special.logsumexp = logsumexp
    sp.sparse = sp_sparse
    sp.special = sp_special
    sys.modules.setdefault("scipy", sp)
    sys.modules.setdefault("scipy.sparse", sp_sparse)
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
