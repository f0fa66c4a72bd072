"""ZooBP — linearized BP over a signed bipartite graph.

Two modes (SURVEY §2.11 B2/B3):

- ``zoobp``: the *paper-correct* iteration (ZooBP, Eskin et al., eqs
  12-14; reference analog /root/reference/UGFraud/Detector/ZooBP.py:93-146
  before its bugs):

      B <- E + P·B − 0.25·ε²·kron(D, H)·B

  per vertex v (2-dim centered beliefs, H symmetric 2x2):
      B_v <- E_v + 0.5·ε·Σ_{(v,w)} s_vw · H @ B_w − 0.25·ε²·d_v · H @ B_v
  with s = +1 for positive edges, −1 for negative; stop when
  Σ|ΔB| ≤ 1e-8. Runs as a 2-dim superstep program.

- ``zoobp_reference_degenerate``: bit-faithful replication of the
  reference's actual behavior: the numpy view bug (ZooBP.py:81-89)
  collapses A+ / A− to single cells, and the scalar logsumexp
  (ZooBP.py:144) makes the update B <- E + logsumexp(M·B) — a scalar c
  added to centered priors; at the unique fixed point B* = E + c*.
  This is a driver-side scalar fixed-point solve; the per-vertex output
  is prior − 0.5 + c* (rank order identical to the prior, as measured
  in the survey).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.numerics import logsumexp
from ugfraud_ray.state.engine import SuperstepEngine, VertexProgram
from ugfraud_ray.state.layout import build_layout, symmetrize


class ZooBPProgram(VertexProgram):
    state_dim = 2
    combine = "sum"
    edge_cols = ("sign",)

    def __init__(self, ep: float, H: np.ndarray):
        self.ep = ep
        self.H = np.asarray(H, dtype=np.float64)

    def init_state(self, vids, shard):
        # E_v: centered priors stacked (p, -p) like ZooBP.py:104-109;
        # beliefs start AT the priors (random init washes out at the
        # unique fixed point — ZooBP.py:15-37 note).
        p = shard.vertex_aux("prior_centered", 0.0)
        return np.column_stack([p, -p])

    def prepare_edges(self, edge_table: pa.Table, shard):
        return edge_table["sign"].to_numpy(zero_copy_only=False).astype(np.float64)

    def message(self, src_state, sign, shard):
        # 0.5 * ep * s * H @ B_src  (vectorized over edges)
        hb = src_state @ self.H.T
        return 0.5 * self.ep * sign[:, None] * hb

    def apply(self, vids, old, agg, have_msg, aux, shard):
        p = shard.vertex_aux("prior_centered", 0.0)
        E = np.column_stack([p, -p])
        deg = shard.vertex_aux("degree", 0.0)
        new = E + agg - 0.25 * self.ep**2 * deg[:, None] * (old @ self.H.T)
        return new, {"delta": float(np.abs(new - old).sum())}


def zoobp(
    edges: "ray.data.Dataset",
    vertex_prior: "ray.data.Dataset",
    n_vertices: int,
    layout_dir: str,
    ep: float = 0.01,
    H: np.ndarray | None = None,
    P: int = 4,
    max_iters: int = 200,
    tol: float = 1e-8,
    hub_threshold: int | None = None,
) -> tuple["ray.data.Dataset", list[dict]]:
    """Paper-correct ZooBP; returns (Dataset(vid, belief), metrics).

    edges: (src, dst, rating) user->prod, rating 1=pos / 2=neg;
    vertex_prior: (vid, prior).
    """
    if H is None:
        H = np.array([[0.5, -0.5], [-0.5, 0.5]])

    def sign_col(t: pa.Table) -> pa.Table:
        r = t["rating"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.where(r == 1, 1.0, -1.0)
        return pa.table({"src": t["src"], "dst": t["dst"], "sign": pa.array(s)})

    signed = edges.map_batches(sign_col, batch_format="pyarrow")
    # materialized once: consumed by dense_degrees AND build_layout (a
    # lazy lineage would execute twice); also enables build_layout's
    # driver-local write path for small graphs
    sym = symmetrize(signed).materialize()

    def center(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": t["vid"],
                "prior_centered": pa.array(
                    t["prior"].to_numpy(zero_copy_only=False) - 0.5, pa.float64()
                ),
            }
        )

    # dense degree array broadcast once + vectorized take — the previous
    # groupby-Count + hash join cost two shuffle-pool spin-ups per call
    from ugfraud_ray.stages.graph_build import dense_degrees

    dv = dense_degrees(sym, "dst", n_vertices).astype(np.float64)
    dv_ref = ray.put(dv)

    def with_degree(t: pa.Table) -> pa.Table:
        d = ray.get(dv_ref)
        vid = t["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"vid": t["vid"], "prior_centered": t["prior_centered"], "degree": pa.array(d[vid])}
        )

    vaux = vertex_prior.map_batches(center, batch_format="pyarrow").map_batches(
        with_degree, batch_format="pyarrow"
    ).materialize()

    layout = build_layout(
        sym, n_vertices, layout_dir, P=P, hub_threshold=hub_threshold,
        edge_cols=["sign"], vertex_aux=vaux,
    )
    eng = SuperstepEngine(layout, ZooBPProgram(ep, H))
    eng.run(max_iters=max_iters, tol=tol)
    out = eng.result_dataset().rename_columns({"s0": "belief", "s1": "belief_neg"}).materialize()
    eng.shutdown()
    return out, eng.metrics


def zoobp_reference_degenerate(
    u_priors: dict, p_priors: dict, n_pos_edges: int, n_neg_edges: int, ep: float = 0.01
) -> tuple[dict, dict]:
    """Conformance mode: the reference's measured fixed point (B2+B3).

    After the view bug, Apos = {(0,0): n_pos}, Aneg = {(0,0): n_neg}
    (all collapsed rows land on the same cell after the −1 shift on
    all-1/all-2 rows: pos rows become (0,0), neg rows (1,1)).
    The scalar-logsumexp update's fixed point is B* = E + c*, where
    c* = logsumexp(M·(E + c*)); solved by scalar iteration here
    (converges because the map is a contraction for small ε).

    Output: centered beliefs b_v = prior_v − 0.5 + c*[component] — we
    return prior−0.5+c_user for users, matching the survey's measured
    result that rank order equals prior order.
    """
    un = np.array(list(u_priors.values())) - 0.5
    pn = np.array(list(p_priors.values())) - 0.5
    n_user, n_prod = len(un), len(pn)
    H = np.array([[0.5, -0.5], [-0.5, 0.5]])
    # degenerate matrices: Apos has n_pos at (0,0); Aneg has n_neg at (1,1)
    from numpy import zeros

    Apos = zeros((n_user, n_prod))
    Aneg = zeros((n_user, n_prod))
    if n_user and n_prod:
        Apos[0, 0] = n_pos_edges
        if n_user > 1 and n_prod > 1:
            Aneg[1, 1] = n_neg_edges
        else:
            Aneg[0, 0] += 0.0
    R = np.kron(Apos - Aneg, ep * H)
    P_ = np.vstack(
        [
            np.hstack([np.zeros((2 * n_user, 2 * n_user)), 0.5 * R]),
            np.hstack([0.5 * R.T, np.zeros((2 * n_prod, 2 * n_prod))]),
        ]
    ).T
    D12 = np.diag((Apos + Aneg).sum(axis=1))
    D21 = np.diag((Apos + Aneg).sum(axis=0))
    Q = np.vstack(
        [
            np.hstack([np.eye(2 * n_user) + 0.25 * ep * ep * np.kron(D12, H),
                       np.zeros((2 * n_user, 2 * n_prod))]),
            np.hstack([np.zeros((2 * n_prod, 2 * n_user)),
                       np.eye(2 * n_prod) + 0.25 * ep * ep * np.kron(D21, H)]),
        ]
    )
    M = (P_ - Q + np.eye(2 * (n_user + n_prod))).T
    E = np.concatenate(
        [np.column_stack([un, -un]).reshape(-1), np.column_stack([pn, -pn]).reshape(-1)]
    )[:, None]
    B = E.copy()
    for _ in range(10000):
        c = logsumexp((M @ B).reshape(-1))
        Bn = E + c
        if np.abs(Bn - B).sum() <= 1e-8:
            B = Bn
            break
        B = Bn
    user_out = dict(zip(u_priors.keys(), B[: 2 * n_user : 2, 0]))
    prod_out = dict(zip(p_priors.keys(), B[2 * n_user :: 2, 0]))
    return user_out, prod_out
