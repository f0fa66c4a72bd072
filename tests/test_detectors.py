"""Detector conformance tests vs independent driver-side oracles.

Each oracle below is written independently from the engine (dict/dense
per-node loops, Gauss–Seidel where the reference sweeps) implementing
the published update equations — the engine runs Jacobi partitioned
supersteps, so agreement at convergence is a real check of the fixed
point, not an implementation self-compare (SURVEY §7.4 gates 2-4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data


def _mini_review_graph(seed=7, n_users=40, n_prods=8, n_edges=120):
    """Deterministic bipartite review graph: users 0..U-1, prods U..U+P-1."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_users, n_edges)
    dst = n_users + rng.integers(0, n_prods, n_edges)
    pairs = sorted({(int(s), int(d)) for s, d in zip(src, dst)})
    src = np.array([p[0] for p in pairs], dtype=np.int64)
    dst = np.array([p[1] for p in pairs], dtype=np.int64)
    rating = rng.integers(1, 3, len(src)).astype(np.int64)
    u_prior = rng.uniform(0.05, 0.95, n_users)
    p_prior = rng.uniform(0.05, 0.95, n_prods)
    r_prior = np.where(rating == 2, 0.9, 0.1).astype(np.float64)
    return src, dst, rating, u_prior, p_prior, r_prior, n_users, n_prods


def test_gang_matches_dense_oracle(tmp_path, ray_session):
    from ugfraud_ray.detectors.gang import GANG_WEIGHT, gang

    src, dst, rating, u_prior, p_prior, r_prior, U, P_ = _mini_review_graph()
    N = U + P_
    # dense oracle: x <- prior + 2*0.008 * A x, stop |Δsum| < 0.1
    A = np.zeros((N, N))
    A[src, dst] = 1
    A[dst, src] = 1
    prior = np.concatenate([u_prior, p_prior]) - 0.5
    x = np.zeros(N)
    for _ in range(1000):
        s0 = x.sum()
        x = prior + GANG_WEIGHT * (A @ x)
        if abs(x.sum() - s0) < 0.1:
            break

    edges = ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    vp = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(np.arange(N, dtype=np.int64)),
                "prior": pa.array(np.concatenate([u_prior, p_prior])),
                "kind": pa.array((np.arange(N) < U).astype(np.int8)),
            }
        )
    )
    out, metrics = gang(edges, vp, N, str(tmp_path / "gang"), P=3)
    df = out.to_pandas().sort_values("vid")
    assert np.allclose(df["posterior"].to_numpy(), x, atol=1e-6)


def test_zoobp_matches_dense_oracle(tmp_path, ray_session):
    from ugfraud_ray.detectors.zoobp import zoobp

    src, dst, rating, u_prior, p_prior, r_prior, U, P_ = _mini_review_graph(seed=11)
    N = U + P_
    ep = 0.01
    H = np.array([[0.5, -0.5], [-0.5, 0.5]])
    # dense oracle on the full 2N system, per-vertex update form
    sign = np.where(rating == 1, 1.0, -1.0)
    prior = np.concatenate([u_prior, p_prior]) - 0.5
    E = np.column_stack([prior, -prior])
    deg = np.zeros(N)
    np.add.at(deg, src, 1)
    np.add.at(deg, dst, 1)
    B = E.copy()
    for _ in range(500):
        agg = np.zeros_like(B)
        np.add.at(agg, dst, 0.5 * ep * sign[:, None] * (B[src] @ H.T))
        np.add.at(agg, src, 0.5 * ep * sign[:, None] * (B[dst] @ H.T))
        Bn = E + agg - 0.25 * ep * ep * deg[:, None] * (B @ H.T)
        if np.abs(Bn - B).sum() <= 1e-8:
            B = Bn
            break
        B = Bn

    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst), "rating": pa.array(rating)})
    )
    vp = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(np.arange(N, dtype=np.int64)),
                "prior": pa.array(np.concatenate([u_prior, p_prior])),
            }
        )
    )
    out, metrics = zoobp(edges, vp, N, str(tmp_path / "zoobp"), ep=ep, H=H, P=3)
    df = out.to_pandas().sort_values("vid")
    assert np.allclose(df["belief"].to_numpy(), B[:, 0], atol=1e-6)
    assert np.allclose(df["belief_neg"].to_numpy(), B[:, 1], atol=1e-6)


def _speagle_oracle(src, dst, u_prior, p_prior, r_prior, U, Pn, potentials, sweeps=200, tol=1e-10):
    """Independent Gauss–Seidel sum-product oracle (dict messages,
    per-node sequential sweeps — the reference's execution style)."""
    eps = 1e-5

    def logp(p):
        p = min(max(p, eps), 1 - eps)
        return np.log(np.array([1 - p, p]))

    def msg(v, logH):
        a = logH + v[None, :]
        m = a.max()
        out = np.log(np.exp(a - m).sum(axis=1)) + m
        z = np.log(np.exp(out - out.max()).sum()) + out.max()
        return out - z

    E = len(src)
    nodes = {}
    for u in range(U):
        nodes[("u", u)] = {"prior": logp(u_prior[u]), "nbrs": []}
    for p in range(Pn):
        nodes[("p", p)] = {"prior": logp(p_prior[p]), "nbrs": []}
    for e in range(E):
        nodes[("r", e)] = {"prior": logp(r_prior[e]), "nbrs": []}
        nodes[("u", src[e])]["nbrs"].append(("r", e))
        nodes[("p", dst[e] - U)]["nbrs"].append(("r", e))
        nodes[("r", e)]["nbrs"].append(("u", src[e]))
        nodes[("r", e)]["nbrs"].append(("p", dst[e] - U))
    M = {}
    for n, d in nodes.items():
        for j in d["nbrs"]:
            M[(n, j)] = np.zeros(2)
    order = list(nodes.keys())
    for it in range(sweeps):
        delta = 0.0
        for n in order:
            d = nodes[n]
            total = d["prior"].copy()
            for j in d["nbrs"]:
                total = total + M[(j, n)]
            for j in d["nbrs"]:
                et = n[0] + "_" + j[0]
                out = msg(total - M[(j, n)], potentials[et])
                delta += np.abs(out - M[(n, j)]).sum()
                M[(n, j)] = out
        if delta / len(order) < tol:
            break
    beliefs = {}
    for n, d in nodes.items():
        b = d["prior"].copy()
        for j in d["nbrs"]:
            b = b + M[(j, n)]
        e = np.exp(b - b.max())
        beliefs[n] = (e / e.sum())[1]
    return beliefs


def test_speagle_matches_gauss_seidel_oracle(tmp_path, ray_session):
    from ugfraud_ray.detectors.speagle import default_potentials, speagle

    src, dst, rating, u_prior, p_prior, r_prior, U, Pn = _mini_review_graph(seed=3, n_users=25, n_prods=6, n_edges=70)
    N = U + Pn
    pot = default_potentials()
    oracle = _speagle_oracle(src, dst, u_prior, p_prior, r_prior, U, Pn, pot)

    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst), "prior": pa.array(r_prior)})
    )
    vp = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(np.arange(N, dtype=np.int64)),
                "prior": pa.array(np.concatenate([u_prior, p_prior])),
                "kind": pa.array((np.arange(N) < U).astype(np.int8)),
            }
        )
    )
    vs, rs, metrics = speagle(edges, vp, N, str(tmp_path / "sp"), P=3,
                              max_iters=300, tol=1e-10)
    vdf = vs.to_pandas().sort_values("vid")
    for i in range(N):
        want = oracle[("u", i)] if i < U else oracle[("p", i - U)]
        got = vdf[vdf.vid == i]["score"].iloc[0]
        assert abs(got - want) < 1e-6, (i, got, want)
    rdf = rs.to_pandas()
    for e in range(len(src)):
        got = rdf[(rdf.src == src[e]) & (rdf.dst == dst[e])]["score"].iloc[0]
        assert abs(got - oracle[("r", e)]) < 1e-6


def test_speagle_checkpoint_resume(tmp_path, ray_session):
    """Mid-iteration resume must reach the same fixed point."""
    from ugfraud_ray.detectors.speagle import speagle

    src, dst, rating, u_prior, p_prior, r_prior, U, Pn = _mini_review_graph(seed=5, n_users=20, n_prods=5, n_edges=50)
    N = U + Pn
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst), "prior": pa.array(r_prior)})
    )
    vp = ray.data.from_arrow(
        pa.table({"vid": pa.array(np.arange(N, dtype=np.int64)),
                  "prior": pa.array(np.concatenate([u_prior, p_prior])),
                  "kind": pa.array((np.arange(N) < U).astype(np.int8))})
    )
    # full run
    vs_full, _, _ = speagle(edges, vp, N, str(tmp_path / "a"), P=2, max_iters=50, tol=1e-12)
    # interrupted run: 3 iters with checkpoints, then resume to convergence
    ck = str(tmp_path / "ck")
    speagle(edges, vp, N, str(tmp_path / "b"), P=2, max_iters=3, tol=0.0,
            ckpt_dir=ck, checkpoint_every=1)
    vs_res, _, _ = speagle(edges, vp, N, str(tmp_path / "c"), P=2, max_iters=50,
                           tol=1e-12, ckpt_dir=ck, resume=True)
    a = vs_full.to_pandas().sort_values("vid")["score"].to_numpy()
    b = vs_res.to_pandas().sort_values("vid")["score"].to_numpy()
    assert np.allclose(a, b, atol=1e-9)


def test_prior_scale_matches_dict(ray_session):
    from ugfraud_ray.detectors.priors import prior_review_scores
    from ugfraud_ray.stages.normalize import scale_value

    src, dst, rating, *_ = _mini_review_graph(seed=13)
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst), "rating": pa.array(rating)})
    )
    got = prior_review_scores(edges).to_pandas()
    d = {(int(s), int(t)): (0.9 if r == 2 else 0.1) for s, t, r in zip(src, dst, rating)}
    want = scale_value(d)
    for _, row in got.iterrows():
        assert abs(row["score"] - want[(row["src"], row["dst"])]) < 1e-12


def test_gang_norflg_false_matches_dict_oracle(tmp_path, ray_session):
    from ugfraud_ray.detectors.gang import GANG_WEIGHT, gang
    from ugfraud_ray.stages.normalize import nor_priors

    src, dst, rating, u_prior, p_prior, r_prior, U, P_ = _mini_review_graph(seed=17)
    N = U + P_
    # dict oracle: nor_priors normalization + median centering, then LBP
    u_d = {i: float(u_prior[i]) for i in range(U)}
    p_d = {i: float(p_prior[i]) for i in range(P_)}
    r_d = {i: float(r_prior[i]) for i in range(len(src))}
    normed, meds = nor_priors([u_d, r_d, p_d])
    u_mean, r_mean, p_mean = meds  # descending-sort median AFTER normalize
    prior = np.concatenate(
        [
            np.array([normed[0][i] for i in range(U)]) - u_mean,
            np.array([normed[2][i] for i in range(P_)]) - p_mean,
        ]
    )
    A = np.zeros((N, N))
    A[src, dst] = 1
    A[dst, src] = 1
    x = np.zeros(N)
    for _ in range(1000):
        s0 = x.sum()
        x = prior + GANG_WEIGHT * (A @ x)
        if abs(x.sum() - s0) < 0.1:
            break

    edges = ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    vp = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(np.arange(N, dtype=np.int64)),
                "prior": pa.array(np.concatenate([u_prior, p_prior])),
                "kind": pa.array((np.arange(N) < U).astype(np.int8)),
            }
        )
    )
    out, _ = gang(edges, vp, N, str(tmp_path / "gg"), P=3, nor_flg=False)
    df = out.to_pandas().sort_values("vid")
    assert np.allclose(df["posterior"].to_numpy(), x, atol=1e-6)


def test_zoobp_reference_degenerate_mode():
    """B2/B3 conformance: converged beliefs = centered prior + constant
    (rank order identical to the prior, as measured in SURVEY §2.11)."""
    from ugfraud_ray.detectors.zoobp import zoobp_reference_degenerate

    rng = np.random.default_rng(9)
    u = {str(i): float(v) for i, v in enumerate(rng.uniform(0.1, 0.9, 12))}
    p = {str(i): float(v) for i, v in enumerate(rng.uniform(0.1, 0.9, 4))}
    u_out, p_out = zoobp_reference_degenerate(u, p, n_pos_edges=30, n_neg_edges=10)
    uv = np.array(list(u_out.values()))
    pri = np.array(list(u.values())) - 0.5
    diffs = uv - pri
    assert np.allclose(diffs, diffs[0], atol=1e-9)  # prior + constant
    assert np.array_equal(np.argsort(uv), np.argsort(pri))


def test_scale_value_reference_bug_semantics():
    """B1 (helper.py:77-86): the for/else truncation keeps only entries
    normalizing to exactly 0 or 1, plus the final iterated key."""
    from ugfraud_ray.stages.normalize import scale_value, scale_value_reference

    d = {"a": 1.0, "b": 5.0, "c": 3.0, "d": 2.0, "e": 4.0}
    ref = scale_value_reference(d)
    # min ('a') -> 1e-7, max ('b') -> 1-1e-7, last key ('e') -> raw norm
    assert set(ref) == {"a", "b", "e"}
    assert ref["a"] == 1e-7 and ref["b"] == 1 - 1e-7
    assert abs(ref["e"] - 0.75) < 1e-12
    # intended mode keeps everything
    full = scale_value(d)
    assert set(full) == set(d) and abs(full["c"] - 0.5) < 1e-12


def test_speagle_early_stop_at(tmp_path, ray_session):
    """SpEagle.py:424-436 schedule-fraction cap, Jacobi mapping: frozen
    nodes' OUTGOING messages never leave the uniform init. With
    early_stop_at=0 every message is frozen, so every belief equals its
    prior exactly; a mid fraction must differ from the full run."""
    from ugfraud_ray.detectors.speagle import speagle

    src, dst, rating, u_prior, p_prior, r_prior, U, Pn = _mini_review_graph(
        seed=9, n_users=20, n_prods=5, n_edges=60
    )
    N = U + Pn
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst), "prior": pa.array(r_prior)})
    )
    vp = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(np.arange(N, dtype=np.int64)),
                "prior": pa.array(np.concatenate([u_prior, p_prior])),
                "kind": pa.array((np.arange(N) < U).astype(np.int8)),
            }
        )
    )
    vs0, rs0, _ = speagle(edges, vp, N, str(tmp_path / "s0"), P=2,
                          max_iters=50, tol=1e-10, early_stop_at=0.0)
    v0 = vs0.to_pandas().sort_values("vid")["score"].to_numpy()
    np.testing.assert_allclose(v0, np.concatenate([u_prior, p_prior]), atol=1e-12)
    r0 = rs0.to_pandas().sort_values(["src", "dst"])["score"].to_numpy()
    order = np.lexsort((dst, src))
    np.testing.assert_allclose(r0, r_prior[order], atol=1e-12)

    vs1, _, _ = speagle(edges, vp, N, str(tmp_path / "s1"), P=2,
                        max_iters=50, tol=1e-10)
    vsh, _, _ = speagle(edges, vp, N, str(tmp_path / "sh"), P=2,
                        max_iters=50, tol=1e-10, early_stop_at=0.15)
    v1 = vs1.to_pandas().sort_values("vid")["score"].to_numpy()
    vh = vsh.to_pandas().sort_values("vid")["score"].to_numpy()
    assert not np.allclose(v1, vh)  # the cap has an effect
    assert np.isfinite(vh).all()
