"""Conformance vs the ACTUAL reference implementation, executed here.

The unmodified code at /root/reference runs on a deterministic fixture
(scipy/sklearn shimmed with the engine's own numpy kernels — see
reference_shims.py); engine outputs must match the reference's at
convergence (SURVEY §7.4 gates 2/3/8/10). This is the strongest parity
evidence available in this sandbox: same inputs, the reference's own
Python, compared end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from tests.reference_shims import build_reference_graph, install_reference_shims
from tests.test_detectors import _mini_review_graph


@pytest.fixture(scope="module")
def fixture_graph():
    install_reference_shims()
    src, dst, rating, u_prior, p_prior, r_prior, U, Pn = _mini_review_graph(
        seed=83, n_users=30, n_prods=7, n_edges=90
    )
    G = build_reference_graph(src, dst, rating, u_prior, p_prior, r_prior, U, Pn)
    return src, dst, rating, u_prior, p_prior, r_prior, U, Pn, G


def test_reference_speagle_matches_engine(fixture_graph, ray_session, tmp_path):
    src, dst, rating, u_prior, p_prior, r_prior, U, Pn, G = fixture_graph
    from UGFraud.Detector.SpEagle import SpEagle

    from ugfraud_ray.detectors.speagle import default_potentials, speagle

    pot = default_potentials()
    model = SpEagle(G, pot, message=None, max_iters=200)
    model.schedule(schedule_type="bfs")
    model.run_bp(start_iter=0, max_iters=200, tol=1e-12)
    user_b, review_b, prod_b = model.classify()

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
    vs, rs, _ = speagle(edges, vp, N, str(tmp_path / "sp"), P=3, max_iters=400, tol=1e-12)
    vdf = vs.to_pandas().set_index("vid")
    # engine vids: users 0..U-1 <-> reference user ids str(Pn+u);
    # prods U..U+Pn-1 <-> reference prod ids str(p)
    for u in range(U):
        ref = user_b[str(Pn + u)]
        got = vdf.loc[u, "score"]
        assert abs(got - ref) < 1e-6, (u, got, ref)
    for p in range(Pn):
        ref = prod_b[str(p)]
        got = vdf.loc[U + p, "score"]
        assert abs(got - ref) < 1e-6, (p, got, ref)
    rdf = rs.to_pandas()
    for e in range(len(src)):
        ref = review_b[(str(Pn + src[e]), str(dst[e] - U))]
        got = rdf[(rdf.src == src[e]) & (rdf.dst == dst[e])]["score"].iloc[0]
        assert abs(got - ref) < 1e-6


def test_reference_gang_matches_engine(fixture_graph, ray_session, tmp_path):
    src, dst, rating, u_prior, p_prior, r_prior, U, Pn, G = fixture_graph
    from UGFraud.Detector.GANG import GANG

    from ugfraud_ray.detectors.gang import gang

    model = GANG(G, {}, 0.1, nor_flg=True, sup_flg=False)
    model.pu_lbp(1000)
    ref_post = np.asarray(model.res_pu_spam_post_vector).reshape(-1)

    # engine graph: same vid layout as the reference matrix
    # (prods 0..Pn-1, users Pn..Pn+U-1)
    N = U + Pn
    e_src = (src + Pn).astype(np.int64)  # users shifted behind prods
    e_dst = (dst - U).astype(np.int64)
    edges = ray.data.from_arrow(pa.table({"src": pa.array(e_src), "dst": pa.array(e_dst)}))
    vp = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(np.arange(N, dtype=np.int64)),
                "prior": pa.array(np.concatenate([p_prior, u_prior])),
                "kind": pa.array((np.arange(N) >= Pn).astype(np.int8)),
            }
        )
    )
    out, _ = gang(edges, vp, N, str(tmp_path / "g"), P=3, nor_flg=True)
    got = out.to_pandas().sort_values("vid")["posterior"].to_numpy()
    assert np.allclose(got, ref_post, atol=1e-6)


def test_reference_scale_value_matches(fixture_graph):
    """B1 conformance against the reference's own scale_value."""
    _, _, _, _, _, r_prior, _, _, G = fixture_graph
    from UGFraud.Utils.helper import scale_value as ref_scale_value

    from ugfraud_ray.stages.normalize import scale_value_reference

    d = {f"k{i}": float(v) + 0.001 * i for i, v in enumerate(r_prior[:40])}
    ref = ref_scale_value(dict(d))
    got = scale_value_reference(dict(d))
    assert set(ref) == set(got)
    for k in ref:
        assert abs(ref[k] - got[k]) < 1e-12


def test_reference_nor_priors_matches(fixture_graph):
    """B7 median semantics against the reference's own nor_priors."""
    src, dst, rating, u_prior, p_prior, r_prior, U, Pn, G = fixture_graph
    from UGFraud.Utils.helper import nor_priors as ref_nor_priors

    from ugfraud_ray.stages.normalize import nor_priors

    u = {str(i): float(v) for i, v in enumerate(u_prior)}
    r = {str(i): float(v) + 1e-4 * i for i, v in enumerate(r_prior)}
    p = {str(i): float(v) for i, v in enumerate(p_prior)}
    import copy

    ref_normed, ref_means = ref_nor_priors(copy.deepcopy([u, r, p]))
    got_normed, got_means = nor_priors([u, r, p])
    assert np.allclose(ref_means, got_means)
    for a, b in zip(ref_normed, got_normed):
        for k in a:
            assert abs(a[k] - b[k]) < 1e-12


def test_reference_create_ground_truth_matches(fixture_graph):
    src, dst, rating, *_ , U, Pn, G = fixture_graph
    from UGFraud.Utils.helper import create_ground_truth

    # reference input: user_data dict of review tuples with label -1=spam
    rng = np.random.default_rng(5)
    labels = rng.choice([-1, 1], size=len(src))
    user_data = {}
    for e in range(len(src)):
        user_data.setdefault(str(src[e]), []).append(
            (str(dst[e]), 4, int(labels[e]), "2020-01-01")
        )
    ref_u, ref_r = create_ground_truth(user_data)
    # engine semantics (M9): user label = max over review labels (1=spam)
    want_u = {}
    for e in range(len(src)):
        k = str(src[e])
        want_u[k] = max(want_u.get(k, 0), 1 if labels[e] == -1 else 0)
    assert ref_u == want_u


def test_reference_fraudar_peel_matches_engine(fixture_graph):
    """Gate 6: the exact peel (order + tie-breaks) vs the reference's
    fastGreedyDecreasing/MinTree run on the same matrix."""
    src, dst, rating, u_prior, p_prior, r_prior, U, Pn, G = fixture_graph
    from UGFraud.Detector.Fraudar import listToSparseMatrix, logWeightedAveDegree

    from ugfraud_ray.detectors.fraudar import fast_greedy_decreasing

    rows = src.astype(int).tolist()
    cols = (dst - U).astype(int).tolist()
    M = listToSparseMatrix(rows, cols)
    (ref_rows, ref_cols), ref_score = logWeightedAveDegree(M)

    m = max(rows) + 1
    n = max(cols) + 1
    import numpy as _np

    dedup = _np.array(sorted({(r, c) for r, c in zip(rows, cols)}), dtype=_np.int64)
    colsum = _np.bincount(dedup[:, 1], minlength=n).astype(_np.float64)
    col_w = 1.0 / _np.log(colsum + 5)
    got_rows, got_cols, got_score = fast_greedy_decreasing(
        dedup[:, 0], dedup[:, 1], col_w, m=m, n=n
    )
    assert got_rows == set(ref_rows) and got_cols == set(ref_cols)
    assert abs(got_score - ref_score) < 1e-9


def test_reference_fbox_matches_engine(fixture_graph, ray_session):
    """Gate 5: suspicious user/product sets vs the reference fBox."""
    src, dst, rating, u_prior, p_prior, r_prior, U, Pn, G = fixture_graph
    from UGFraud.Detector.fBox import fBox

    from ugfraud_ray.detectors.fbox import fbox

    model = fBox(G)
    tau, k = 20.0, 3
    sus_u_by_deg, sus_p_by_deg = model.run(tau, k)
    ref_users = {u for lst in sus_u_by_deg.values() for u in lst}
    ref_prods = {p for lst in sus_p_by_deg.values() for p in lst}

    # the reference indexes by FIRST-SEEN edge order; suspicious sets are
    # id sets, so only membership must match. Engine runs on the same
    # bipartite matrix (users = src, prods = dst-U).
    e = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst - U)})
    )
    got_u, got_p = fbox(e, Pn, tau=tau, k=k)
    got_users = {str(Pn + v) for v in got_u.to_pandas()["vid"]}
    got_prods = {str(p) for p in got_p.to_pandas()["pid"]}
    assert got_users == ref_users
    assert got_prods == ref_prods


def test_reference_zoobp_degenerate_matches(fixture_graph):
    """Gates 3/4: the reference ZooBP (with its B2 view bug and B3
    scalar-logsumexp update) vs the engine's explicit degenerate mode."""
    src, dst, rating, u_prior, p_prior, r_prior, U, Pn, G = fixture_graph
    import numpy as _np

    from UGFraud.Detector.ZooBP import ZooBP

    from ugfraud_ray.detectors.zoobp import zoobp_reference_degenerate

    H = _np.array([[0.5, -0.5], [-0.5, 0.5]])
    model = ZooBP(G, 0.01, H)
    ref_user_beliefs, ref_prod_beliefs = model.run()

    # engine conformance mode on the same dicts
    u_ids = [n for n, d in G.nodes(data=True) if d["types"] == "user"]
    p_ids = [n for n, d in G.nodes(data=True) if d["types"] == "prod"]
    u_priors = {n: G.nodes[n]["prior"] for n in u_ids}
    p_priors = {n: G.nodes[n]["prior"] for n in p_ids}
    ratings = _np.array([d["rating"] for _, _, d in G.edges(data=True)])
    n_pos = int((ratings == 1).sum())
    n_neg = int((ratings == 2).sum())
    got_u, got_p = zoobp_reference_degenerate(u_priors, p_priors, n_pos, n_neg, ep=0.01)
    for k_ in ref_user_beliefs:
        assert abs(ref_user_beliefs[k_] - got_u[k_]) < 1e-6, k_


def test_reference_svd_classifier_matches_engine(ray_session):
    """Gate 11: the reference's evaluate_SVD (SVD.py:90-138) executed
    here with sklearn.svm shimmed to the engine's LinearSVC, vs the
    engine's svd_decompose -> svd_user_embedding ->
    svd_classifier_probs on the SAME split (the reference's own
    random_split, replayed by re-seeding numpy).

    The fixture is FULLY DENSE (every user rated every product) so the
    reference's np.empty rating matrix (B4: uninitialized cells) has no
    unset entries and the run is deterministic."""
    import networkx as nx

    install_reference_shims()
    from UGFraud.Detector.SVD import SVD

    from ugfraud_ray.detectors.svd import svd_decompose, svd_user_embedding
    from ugfraud_ray.detectors.svdclf import svd_classifier_probs

    U, Pn = 20, 5
    # users 0..7 all rating 1 (neg class); users 8+ mixed -> pos
    src, dst, rating = [], [], []
    for u in range(U):
        for p in range(Pn):
            src.append(u)
            dst.append(p)
            rating.append(2 if (u >= 8 and (u + p) % 2 == 0) else 1)
    G = nx.Graph()
    for u in range(U):
        G.add_node(str(Pn + u), types="user", prior=0.5)
    for p in range(Pn):
        G.add_node(str(p), types="prod", prior=0.5)
    for s, d, r in zip(src, dst, rating):
        # demo remap (demo_pre.py:49-52): label 0 <=> spam review
        G.add_edge(str(Pn + s), str(d), types="review", rating=int(r),
                   label=0 if r == 2 else 1)

    model = SVD(G)
    svd_output = model.run(0.4)  # k = round(5*0.4) = 2
    np.random.seed(99)
    ref_uids, ref_probs = model.evaluate_SVD(svd_output, G)
    ref = {int(ref_uids[j]) - Pn: ref_probs[j] for j in range(len(ref_uids))}

    # replay the identical split (same seed, same call sequence)
    np.random.seed(99)
    tr_pos, tr_neg, te_pos, te_neg = model.random_split(G)
    train_ids = {int(s) - Pn for s in tr_pos | tr_neg}
    test_ids = {int(s) - Pn for s in te_pos | te_neg}

    eb = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "rating": pa.array([float(r) for r in rating]),
            }
        )
    )
    s_, Vk = svd_decompose(eb, Pn, percent=0.4, approx_edges=len(src))
    emb = svd_user_embedding(eb, s_, Vk)
    pos_users = {u for u, r in zip(src, rating) if r == 2}
    labels = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(range(U), pa.int64()),
                "label": pa.array(
                    [1 if u in pos_users else 0 for u in range(U)], pa.int8()
                ),
            }
        )
    )
    got = svd_classifier_probs(
        emb, labels, train_ids=train_ids, test_ids=test_ids
    ).to_pandas()
    assert set(got["vid"]) == test_ids == set(ref)
    for _, row in got.iterrows():
        assert abs(row["prob"] - ref[int(row["vid"])]) < 1e-6, int(row["vid"])


def test_reference_node_link_json_round_trip(fixture_graph, ray_session, tmp_path):
    """Gate 12: the reference's save_graph/load_graph (helper.py:363-400)
    round-trips through the engine's node-link reader/writer."""
    import networkx as nx

    from UGFraud.Utils.helper import load_graph, save_graph

    from ugfraud_ray.sources.node_link import (
        read_node_link_json,
        write_node_link_json,
    )

    src, dst, rating, u_prior, p_prior, r_prior, U, Pn, G = fixture_graph
    p1 = str(tmp_path / "ref_graph_data.json")
    save_graph(G, p1)

    nodes, edges, meta = read_node_link_json(p1)
    nt = nodes.to_pandas().set_index("id")
    et = edges.to_pandas()
    assert meta["directed"] is False and meta["multigraph"] is False
    assert len(nt) == G.number_of_nodes()
    assert len(et) == G.number_of_edges()
    for nid, attrs in G.nodes(data=True):
        for k, v in attrs.items():
            assert nt.loc[nid, k] == v, (nid, k)
    eset = {(r["src"], r["dst"]) for _, r in et.iterrows()}
    for a, b in G.edges():
        assert (a, b) in eset or (b, a) in eset
    row = et.iloc[0]
    ref_attrs = G.edges[(row["src"], row["dst"])]
    for k in ("types", "prior", "rating", "label"):
        assert row[k] == ref_attrs[k]

    # engine write -> reference load
    p2 = str(tmp_path / "eng_graph_data.json")
    write_node_link_json(nodes, edges, p2, directed=False, multigraph=False)
    G2 = load_graph(p2)
    assert nx.utils.graphs_equal(G, G2)
