"""Distributed metrics, checksums, srms, and incremental SpEagle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data


def test_auc_ap_ds_match_numpy(ray_session):
    from ugfraud_ray.functions.metrics import average_precision, roc_auc
    from ugfraud_ray.stages.evaluate import ap_ds, auc_ds

    rng = np.random.default_rng(61)
    # discretized scores -> plenty of ties (exercises midrank handling)
    s = np.round(rng.uniform(0, 1, 3000), 2)
    y = (rng.uniform(0, 1, 3000) < 0.3 + 0.4 * s).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"score": pa.array(s), "label": pa.array(y)}))
    assert abs(auc_ds(ds) - roc_auc(y, s)) < 1e-12
    assert abs(ap_ds(ds) - average_precision(y, s)) < 1e-12


def test_dataset_md5_order_independent(ray_session):
    from ugfraud_ray.stages.graph_build import dataset_md5

    texts = [f"doc number {i}" for i in range(200)]
    a = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))
    b = ray.data.from_arrow(
        pa.table({"text": pa.array(list(reversed(texts)))})
    ).repartition(7)
    h1, h2 = dataset_md5(a, "text"), dataset_md5(b, "text")
    assert h1 == h2
    c = ray.data.from_arrow(pa.table({"text": pa.array(texts[:-1] + ["changed"])}))
    assert dataset_md5(c, "text") != h1


def test_validate_pages_schema(ray_session):
    from ugfraud_ray.sources.pages import PagesSpec, synthesize_pages
    from ugfraud_ray.stages.graph_build import validate_pages_schema

    t, _ = synthesize_pages(PagesSpec(n_users=5, n_prods=2, n_edges=10))
    validate_pages_schema(ray.data.from_arrow(t))  # ok
    bad = ray.data.from_arrow(t.drop_columns(["html"]))
    with pytest.raises(ValueError, match="html"):
        validate_pages_schema(bad)


def test_spectral_recon_matrix_matches_numpy(ray_session):
    from ugfraud_ray.detectors.fbox import spectral_recon_matrix

    rng = np.random.default_rng(67)
    rec = rng.uniform(0, 10, 500)
    deg = rng.integers(1, 6, 500)
    ds = ray.data.from_arrow(
        pa.table({"vid": pa.array(np.arange(500, dtype=np.int64)),
                  "rec": pa.array(rec), "degree": pa.array(deg)})
    ).repartition(4)
    coo, edges = spectral_recon_matrix(ds, bins=10)
    # numpy oracle: same digitize per distinct degree (fBox.py:118-126)
    _, want_edges = np.histogram(rec, bins=10)
    assert np.allclose(edges, want_edges)
    want: dict = {}
    for d in np.unique(deg):
        for b in np.digitize(rec[deg == d], want_edges):
            want[(int(b), int(d))] = want.get((int(b), int(d)), 0) + 1
    got = {
        (int(b), int(d)): int(n)
        for b, d, n in zip(coo["bin"].to_pylist(), coo["degree"].to_pylist(), coo["n"].to_pylist())
    }
    assert got == want


def test_speagle_incremental_refresh(tmp_path, ray_session):
    """append_edges + BP refresh re-converges to the full-rebuild fixed point."""
    from tests.test_detectors import _mini_review_graph

    from ugfraud_ray.detectors.speagle import SpEagleEngine
    from ugfraud_ray.state.layout import append_edges, build_layout

    src, dst, rating, u_prior, p_prior, r_prior, U, Pn = _mini_review_graph(
        seed=71, n_users=20, n_prods=5, n_edges=50
    )
    N = U + Pn
    vp = pa.table(
        {
            "vid": pa.array(np.arange(N, dtype=np.int64)),
            "prior": pa.array(np.concatenate([u_prior, p_prior])),
            "kind": pa.array((np.arange(N) < U).astype(np.int8)),
        }
    )
    # hold out the last 5 edges, run, then append them incrementally
    hold = 5
    base = pa.table({"src": pa.array(src[:-hold]), "dst": pa.array(dst[:-hold]),
                     "prior": pa.array(r_prior[:-hold])})
    extra = pa.table({"src": pa.array(src[-hold:]), "dst": pa.array(dst[-hold:]),
                      "prior": pa.array(r_prior[-hold:])})
    lay = build_layout(ray.data.from_arrow(base), N, str(tmp_path / "a"), P=3,
                       edge_cols=["prior"], vertex_aux=ray.data.from_arrow(vp))
    eng = SpEagleEngine(lay)
    eng.run(max_iters=100, tol=1e-12)
    touched = append_edges(lay, ray.data.from_arrow(extra))
    eng.refresh_shards(touched)
    eng.run(max_iters=200, tol=1e-12)
    inc = eng.vertex_scores().to_pandas().sort_values("vid")["score"].to_numpy()
    eng.shutdown()

    full_lay = build_layout(
        ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst),
                                      "prior": pa.array(r_prior)})),
        N, str(tmp_path / "b"), P=3, edge_cols=["prior"],
        vertex_aux=ray.data.from_arrow(vp),
    )
    eng2 = SpEagleEngine(full_lay)
    eng2.run(max_iters=200, tol=1e-12)
    full = eng2.vertex_scores().to_pandas().sort_values("vid")["score"].to_numpy()
    eng2.shutdown()
    assert np.allclose(inc, full, atol=1e-8)


def test_speagle_hub_splitting_invariant(tmp_path, ray_session):
    """Hub-routed edges (two-level combine) must not change the fixed point."""
    from tests.test_detectors import _mini_review_graph

    from ugfraud_ray.detectors.speagle import speagle

    src, dst, rating, u_prior, p_prior, r_prior, U, Pn = _mini_review_graph(
        seed=91, n_users=40, n_prods=4, n_edges=150
    )
    N = U + Pn
    edges = pa.table({"src": pa.array(src), "dst": pa.array(dst), "prior": pa.array(r_prior)})
    vp = pa.table(
        {
            "vid": pa.array(np.arange(N, dtype=np.int64)),
            "prior": pa.array(np.concatenate([u_prior, p_prior])),
            "kind": pa.array((np.arange(N) < U).astype(np.int8)),
        }
    )
    a, _, _ = speagle(ray.data.from_arrow(edges), ray.data.from_arrow(vp), N,
                      str(tmp_path / "a"), P=3, max_iters=100, tol=1e-12)
    b, _, _ = speagle(ray.data.from_arrow(edges), ray.data.from_arrow(vp), N,
                      str(tmp_path / "b"), P=3, max_iters=100, tol=1e-12,
                      hub_threshold=5)  # every prod is a hub at this size
    av = a.to_pandas().sort_values("vid")["score"].to_numpy()
    bv = b.to_pandas().sort_values("vid")["score"].to_numpy()
    assert np.allclose(av, bv, atol=1e-9)


def test_evaluate_collected_matches_dict(ray_session):
    from ugfraud_ray.stages.evaluate import evaluate_collected, evaluate_dict

    rng = np.random.default_rng(7)
    keys = np.arange(500, dtype=np.int64)
    s = np.round(rng.uniform(0, 1, 500), 3)
    scores = ray.data.from_arrow(
        pa.table({"vid": pa.array(keys), "score": pa.array(s)})
    ).repartition(5)
    lab_keys = keys[::2]  # semi-join keeps only labeled keys
    y = (rng.uniform(0, 1, len(lab_keys)) < 0.4).astype(np.int64)
    labels = ray.data.from_arrow(
        pa.table({"vid": pa.array(lab_keys), "label": pa.array(y)})
    )
    auc, ap = evaluate_collected(scores, labels)
    want_auc, want_ap = evaluate_dict(
        dict(zip(lab_keys.tolist(), y.tolist())),
        dict(zip(keys.tolist(), s.tolist())),
    )
    assert abs(auc - want_auc) < 1e-12
    assert abs(ap - want_ap) < 1e-12


def test_profile_table_with_nulls(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.stages.profile import profile_table

    t = pa.table(
        {
            "a": pa.array([1, 2, 2, None, 5], pa.int64()),
            "b": pa.array(["x", None, None, "y", "x"], pa.string()),
        }
    )
    out = profile_table(ray.data.from_arrow(t).repartition(3), ["a", "b"]).to_pandas()
    row = out.set_index("column")
    assert row.loc["a", "n_rows"] == 5 and row.loc["a", "n_nulls"] == 1
    assert row.loc["a", "n_distinct"] == 3
    assert row.loc["a", "min_val"] == "1" and row.loc["a", "max_val"] == "5"
    assert row.loc["b", "n_nulls"] == 2 and row.loc["b", "n_distinct"] == 2
    assert row.loc["b", "min_val"] == "x" and row.loc["b", "max_val"] == "y"
