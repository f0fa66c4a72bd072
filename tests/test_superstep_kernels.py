"""M3/M4: superstep engine kernels vs dense numpy / networkx oracles."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ugfraud_ray.sources.pages import PagesSpec, _spec_edges
from ugfraud_ray.pipelines.pagerank import pagerank
from ugfraud_ray.pipelines.components import connected_components
from ugfraud_ray.pipelines.labelprop import label_propagation


def _graph(spec: PagesSpec):
    """(src, dst) int64 edges: prods 0..n_p-1, users n_p.. (directed user->prod)."""
    e = _spec_edges(spec)
    n_p = spec.n_prods * spec.n_components
    n_u = spec.n_users * spec.n_components
    src = e[:, 0] + n_p  # users after prods
    dst = e[:, 1]
    used = np.union1d(src, dst)
    n = n_p + n_u
    return src, dst, n


def _edges_ds(src, dst):
    return ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))


def _pagerank_oracle(src, dst, n, d=0.85, iters=200, tol=1e-9):
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    x = np.full(n, 1.0 / n)
    w = 1.0 / np.where(outdeg > 0, outdeg, 1.0)
    for _ in range(iters):
        agg = np.bincount(dst, weights=x[src] * w[src], minlength=n)
        dang = x[outdeg == 0].sum()
        new = (1 - d) / n + d * agg + d * dang / n
        if np.abs(new - x).sum() <= tol:
            x = new
            break
        x = new
    return x


def test_pagerank_matches_dense_oracle(tmp_path):
    spec = PagesSpec(n_users=50, n_prods=8, n_edges=150, seed=11)
    src, dst, n = _graph(spec)
    got, metrics = pagerank(
        _edges_ds(src, dst), n, str(tmp_path / "pr"), P=2, max_iters=100, tol=1e-12
    )
    gp = got.to_pandas().sort_values("vid")
    want = _pagerank_oracle(src, dst, n, iters=200, tol=1e-12)
    np.testing.assert_allclose(gp["rank"].to_numpy(), want, atol=1e-8)
    assert abs(gp["rank"].sum() - 1.0) < 1e-6
    assert len(metrics) > 2


def test_pagerank_with_hub_splitting_identical(tmp_path):
    spec = PagesSpec(n_users=50, n_prods=8, n_edges=150, seed=11, zipf_a=2.0)
    src, dst, n = _graph(spec)
    a, _ = pagerank(_edges_ds(src, dst), n, str(tmp_path / "a"), P=2, max_iters=60, tol=1e-12)
    b, _ = pagerank(
        _edges_ds(src, dst), n, str(tmp_path / "b"), P=2, max_iters=60, tol=1e-12,
        hub_threshold=5,
    )
    pa_, pb = a.to_pandas().sort_values("vid"), b.to_pandas().sort_values("vid")
    np.testing.assert_allclose(pa_["rank"].to_numpy(), pb["rank"].to_numpy(), atol=1e-12)


def test_connected_components_exact(tmp_path):
    spec = PagesSpec(n_users=30, n_prods=5, n_edges=60, seed=9, n_components=3)
    src, dst, n = _graph(spec)
    got, _ = connected_components(_edges_ds(src, dst), n, str(tmp_path / "cc"), P=2)
    gp = got.to_pandas().sort_values("vid")

    import networkx as nx

    G = nx.Graph()
    G.add_nodes_from(range(n))
    G.add_edges_from(zip(src.tolist(), dst.tolist()))
    want = np.empty(n, dtype=np.int64)
    for comp in nx.connected_components(G):
        rep = min(comp)
        for v in comp:
            want[v] = rep
    np.testing.assert_array_equal(gp["component"].to_numpy(), want)
    # really multiple components
    assert gp["component"].nunique() >= 3


def test_label_propagation_matches_dense(tmp_path):
    spec = PagesSpec(n_users=40, n_prods=6, n_edges=120, seed=21)
    src, dst, n = _graph(spec)
    rng = np.random.default_rng(0)
    seed_vids = rng.choice(n, size=8, replace=False)
    seed_labels = rng.integers(0, 2, size=8)
    seeds = ray.data.from_arrow(
        pa.table({"vid": pa.array(seed_vids.astype(np.int64)),
                  "seed_label": pa.array(seed_labels.astype(np.float64))})
    )
    iters = 12
    got, _ = label_propagation(
        _edges_ds(src, dst), seeds, n, 2, str(tmp_path / "lp"), P=2,
        max_iters=iters, tol=-1.0,
    )
    gp = got.to_pandas().sort_values("vid")

    # dense oracle, same Jacobi schedule
    A = np.zeros((n, n))
    A[src, dst] = 1.0
    A = np.maximum(A, A.T)
    f = np.full((n, 2), 0.5)
    clamp = np.zeros(n, dtype=bool)
    clamp[seed_vids] = True
    f[seed_vids] = 0.0
    f[seed_vids, seed_labels] = 1.0
    for _ in range(iters):
        agg = A.T @ f
        s = agg.sum(axis=1, keepdims=True)
        ok = (s[:, 0] > 0) & ~clamp
        nf = f.copy()
        nf[ok] = agg[ok] / s[ok]
        f = nf
    want_label = f.argmax(axis=1)
    np.testing.assert_array_equal(gp["label"].to_numpy(), want_label)


def test_pagerank_checkpoint_resume(tmp_path):
    spec = PagesSpec(n_users=30, n_prods=5, n_edges=80, seed=4)
    src, dst, n = _graph(spec)
    full, _ = pagerank(
        _edges_ds(src, dst), n, str(tmp_path / "full"), P=2, max_iters=20, tol=-1.0
    )
    # run 1: stop early at 10 steps with checkpoints
    half, _ = pagerank(
        _edges_ds(src, dst), n, str(tmp_path / "g1"), P=2, max_iters=10, tol=-1.0,
        ckpt_dir=str(tmp_path / "ck"), checkpoint_every=5,
    )
    # run 2: resume from the committed step and continue to 20
    resumed, metrics = pagerank(
        _edges_ds(src, dst), n, str(tmp_path / "g2"), P=2, max_iters=20, tol=-1.0,
        ckpt_dir=str(tmp_path / "ck"), checkpoint_every=5, resume=True,
    )
    f = full.to_pandas().sort_values("vid")["rank"].to_numpy()
    r = resumed.to_pandas().sort_values("vid")["rank"].to_numpy()
    np.testing.assert_allclose(r, f, atol=1e-12)
    # resumed run actually skipped the first steps
    assert metrics[0]["step"] == 10


def test_layout_local_and_distributed_paths_agree(tmp_path, ray_session):
    """The driver-local small-side layout write and the distributed
    partitioned write must produce identical engine results (a lazy
    input forces the distributed path)."""
    import numpy as np
    import pyarrow as pa

    import ray
    import ray.data
    from ugfraud_ray.pipelines.pagerank import pagerank

    rng = np.random.default_rng(53)
    n, ne = 500, 3000
    t = pa.table(
        {
            "src": pa.array(rng.integers(0, n, ne)),
            "dst": pa.array(rng.integers(0, n, ne)),
        }
    )
    mat = ray.data.from_arrow(t)  # materialized -> local write path
    lazy = mat.map_batches(lambda b: b, batch_format="pyarrow")  # -> distributed
    r1, _ = pagerank(mat, n, str(tmp_path / "a"), P=3, max_iters=8, tol=None)
    r2, _ = pagerank(lazy, n, str(tmp_path / "b"), P=3, max_iters=8, tol=None)
    a = r1.to_pandas().sort_values("vid")["rank"].to_numpy()
    b = r2.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert np.allclose(a, b, atol=1e-12)

    from ugfraud_ray.pipelines.components import connected_components

    c1, _ = connected_components(mat, n, str(tmp_path / "ca"), P=3)
    c2, _ = connected_components(lazy, n, str(tmp_path / "cb"), P=3)
    ca = c1.to_pandas().sort_values("vid")["component"].to_numpy()
    cb = c2.to_pandas().sort_values("vid")["component"].to_numpy()
    assert (ca == cb).all()


def test_kcore_both_paths_match_naive_peel(ray_session):
    from ugfraud_ray.pipelines.kcore import kcore_members

    rng = np.random.default_rng(59)
    n, m, k = 300, 2400, 8
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).repartition(6)

    # naive oracle: repeatedly delete any vertex with undirected simple
    # degree < k (order-free fixpoint)
    a, b = np.minimum(src, dst), np.maximum(src, dst)
    pairs = np.unique(a * np.int64(10**6) + b)
    a, b = pairs // 10**6, pairs % 10**6
    alive = np.ones(n, dtype=bool)
    while True:
        keep = alive[a] & alive[b]
        deg = np.bincount(a[keep], minlength=n) + np.bincount(b[keep], minlength=n)
        new = alive & (deg >= k)
        if new.sum() == alive.sum():
            break
        alive = new

    got_local = kcore_members(ds, n, k=k, approx_edges=len(src))
    got_dist = kcore_members(ds, n, k=k, approx_edges=None)
    assert (got_local == alive).all()
    assert (got_dist == alive).all()
    assert 0 < alive.sum() < n  # the fixture actually peels something


def _hits_oracle(src, dst, n, iters):
    """Dense synchronous HITS with delayed normalization + final unit-l2."""
    a = np.ones(n)
    h = np.ones(n)
    for _ in range(iters):
        na = np.sqrt((a * a).sum())
        nh = np.sqrt((h * h).sum())
        a_new = np.bincount(dst, weights=h[src], minlength=n) / nh
        h_new = np.bincount(src, weights=a[dst], minlength=n) / na
        a, h = a_new, h_new
    a /= np.sqrt((a * a).sum()) or 1.0
    h /= np.sqrt((h * h).sum()) or 1.0
    return a, h


def test_hits_matches_dense_oracle(tmp_path):
    from ugfraud_ray.pipelines.hits import hits

    spec = PagesSpec(n_users=50, n_prods=8, n_edges=150, seed=7)
    src, dst, n = _graph(spec)
    got, metrics = hits(_edges_ds(src, dst), n, str(tmp_path / "hits"), P=2, max_iters=12)
    gp = got.to_pandas().sort_values("vid")
    wa, wh = _hits_oracle(src, dst, n, iters=12)
    np.testing.assert_allclose(gp["authority"].to_numpy(), wa, atol=1e-10)
    np.testing.assert_allclose(gp["hub"].to_numpy(), wh, atol=1e-10)
    assert abs(np.square(gp["authority"]).sum() - 1.0) < 1e-9
    assert len(metrics) == 12


def test_hits_partition_invariant_and_hub_split(tmp_path):
    from ugfraud_ray.pipelines.hits import hits

    spec = PagesSpec(n_users=60, n_prods=6, n_edges=220, seed=3, zipf_a=2.0)
    src, dst, n = _graph(spec)
    a1, _ = hits(_edges_ds(src, dst), n, str(tmp_path / "h1"), P=1, max_iters=8)
    a4, _ = hits(
        _edges_ds(src, dst), n, str(tmp_path / "h4"), P=4, max_iters=8, hub_threshold=30
    )
    p1 = a1.to_pandas().sort_values("vid").reset_index(drop=True)
    p4 = a4.to_pandas().sort_values("vid").reset_index(drop=True)
    np.testing.assert_allclose(p1["authority"], p4["authority"], atol=1e-12)
    np.testing.assert_allclose(p1["hub"], p4["hub"], atol=1e-12)


def _ppr_oracle(src, dst, n, seeds, d=0.85, iters=60):
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    e = np.zeros(n)
    e[seeds] = 1.0 / len(seeds)
    w = 1.0 / np.where(outdeg > 0, outdeg, 1.0)
    x = e.copy()
    for _ in range(iters):
        agg = np.bincount(dst, weights=x[src] * w[src], minlength=n)
        dang = x[outdeg == 0].sum()
        x = (1 - d) * e + d * agg + d * dang * e
    return x


def test_personalized_pagerank_matches_dense_oracle(tmp_path):
    from ugfraud_ray.pipelines.pagerank import personalized_pagerank

    spec = PagesSpec(n_users=50, n_prods=8, n_edges=150, seed=23)
    src, dst, n = _graph(spec)
    seeds = np.array([0, 3, 17])
    got, _ = personalized_pagerank(
        _edges_ds(src, dst), n, seeds, str(tmp_path / "ppr"), P=3, max_iters=60, tol=None
    )
    gp = got.to_pandas().sort_values("vid")
    want = _ppr_oracle(src, dst, n, seeds, iters=60)
    np.testing.assert_allclose(gp["rank"].to_numpy(), want, atol=1e-10)
    # mass concentrates near seeds; non-seed-reachable stays ~0
    assert gp["rank"].to_numpy()[seeds].sum() > 0.2


def test_bfs_hops_matches_networkx(tmp_path):
    from ugfraud_ray.pipelines.bfs import bfs_hops

    spec = PagesSpec(n_users=40, n_prods=6, n_edges=110, seed=17, n_components=2)
    src, dst, n = _graph(spec)
    rng = np.random.default_rng(5)
    seeds = rng.choice(n, size=3, replace=False).astype(np.int64)
    got, metrics = bfs_hops(_edges_ds(src, dst), n, seeds, str(tmp_path / "bfs"), P=2)
    gp = got.to_pandas().sort_values("vid")

    import networkx as nx

    G = nx.Graph()
    G.add_nodes_from(range(n))
    G.add_edges_from(zip(src.tolist(), dst.tolist()))
    want = nx.multi_source_dijkstra_path_length(G, set(seeds.tolist()))
    want_sorted = dict(sorted(want.items()))
    assert gp["vid"].tolist() == list(want_sorted)
    assert gp["hops"].tolist() == [int(v) for v in want_sorted.values()]
    # unreached vertices are genuinely excluded (2 components, seeds random)
    assert len(gp) <= n
    assert len(metrics) >= 2


def test_bfs_hops_directed_vs_undirected(tmp_path):
    from ugfraud_ray.pipelines.bfs import bfs_hops

    # path 0 -> 1 -> 2; directed BFS from {2} reaches only itself,
    # undirected reaches all three
    src = np.array([0, 1], dtype=np.int64)
    dst = np.array([1, 2], dtype=np.int64)
    seeds = np.array([2], dtype=np.int64)
    und, _ = bfs_hops(_edges_ds(src, dst), 3, seeds, str(tmp_path / "u"), P=2)
    assert sorted(und.to_pandas()["hops"].tolist()) == [0, 1, 2]
    dird, _ = bfs_hops(
        _edges_ds(src, dst), 3, seeds, str(tmp_path / "d"), P=2, directed=True
    )
    assert dird.to_pandas()["hops"].tolist() == [0]


def _nx_scc_labels(src, dst, n):
    import networkx as nx

    G = nx.DiGraph()
    G.add_nodes_from(range(n))
    G.add_edges_from(zip(src.tolist(), dst.tolist()))
    want = np.empty(n, dtype=np.int64)
    for comp in nx.strongly_connected_components(G):
        rep = min(comp)
        for v in comp:
            want[v] = rep
    return want


def test_scc_local_matches_networkx():
    from ugfraud_ray.pipelines.scc import strongly_connected_components

    rng = np.random.default_rng(19)
    n, m = 60, 150
    src = rng.integers(0, n, size=m).astype(np.int64)
    dst = rng.integers(0, n, size=m).astype(np.int64)
    got = (
        strongly_connected_components(_edges_ds(src, dst), n, "/tmp/unused-scc-l")
        .to_pandas().sort_values("vid")
    )
    want = _nx_scc_labels(src, dst, n)
    np.testing.assert_array_equal(got["scc"].to_numpy(), want)
    # non-trivial: at least one SCC bigger than a singleton
    assert (np.bincount(want) > 1).any()


def test_scc_distributed_matches_networkx(tmp_path):
    from ugfraud_ray.pipelines.scc import strongly_connected_components

    rng = np.random.default_rng(29)
    n, m = 40, 120
    src = rng.integers(0, n, size=m).astype(np.int64)
    dst = rng.integers(0, n, size=m).astype(np.int64)
    got = (
        strongly_connected_components(
            _edges_ds(src, dst), n, str(tmp_path / "scc"), P=2, local_threshold=0
        )
        .to_pandas().sort_values("vid")
    )
    want = _nx_scc_labels(src, dst, n)
    np.testing.assert_array_equal(got["scc"].to_numpy(), want)


def test_scc_hand_case():
    from ugfraud_ray.pipelines.scc import strongly_connected_components

    # cycle 0->1->2->0, chain 2->3, mutual 3<->4, isolated-ish 5->0
    src = np.array([0, 1, 2, 2, 3, 4, 5], dtype=np.int64)
    dst = np.array([1, 2, 0, 3, 4, 3, 0], dtype=np.int64)
    got = (
        strongly_connected_components(_edges_ds(src, dst), 6, "/tmp/unused-scc-h")
        .to_pandas().sort_values("vid")
    )
    assert got["scc"].tolist() == [0, 0, 0, 3, 3, 5]


def test_sssp_matches_networkx(tmp_path):
    from ugfraud_ray.pipelines.sssp import shortest_paths

    rng = np.random.default_rng(41)
    n, m = 45, 140
    src = rng.integers(0, n, size=m).astype(np.int64)
    dst = rng.integers(0, n, size=m).astype(np.int64)
    w = ((src * 31 + dst) % 9 + 1).astype(np.float64)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst), "w": pa.array(w)})
    )
    seeds = np.array([3, 17], dtype=np.int64)
    got, _ = shortest_paths(ds, n, seeds, str(tmp_path / "sp"), P=2)
    gp = got.to_pandas().sort_values("vid")

    import networkx as nx

    G = nx.Graph()
    G.add_nodes_from(range(n))
    for s, d, ww in zip(src.tolist(), dst.tolist(), w.tolist()):
        # undirected: keep the SMALLER weight on parallel/reverse edges
        # (symmetrize emits both directed rows; min-plus takes the min)
        if G.has_edge(s, d):
            G[s][d]["weight"] = min(G[s][d]["weight"], ww)
        else:
            G.add_edge(s, d, weight=ww)
    want = nx.multi_source_dijkstra_path_length(G, set(seeds.tolist()))
    want = dict(sorted(want.items()))
    assert gp["vid"].tolist() == list(want)
    np.testing.assert_allclose(gp["dist"].to_numpy(), np.array(list(want.values())), atol=0)
    assert (gp["dist"].to_numpy() > 0).sum() > 10


def test_sssp_directed_hand_case(tmp_path):
    from ugfraud_ray.pipelines.sssp import shortest_paths

    # 0 -(5)-> 1 -(1)-> 2 ; 0 -(2)-> 2 ; directed
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 1, 0], pa.int64()),
                "dst": pa.array([1, 2, 2], pa.int64()),
                "w": pa.array([5.0, 1.0, 2.0]),
            }
        )
    )
    got, _ = shortest_paths(ds, 3, np.array([0]), str(tmp_path / "d"), P=2, directed=True)
    gp = got.to_pandas().sort_values("vid")
    assert gp["vid"].tolist() == [0, 1, 2]
    assert gp["dist"].tolist() == [0.0, 5.0, 2.0]


def test_random_walks_deterministic_and_correct():
    from ugfraud_ray.pipelines.walks import random_walks
    import hashlib

    rng = np.random.default_rng(77)
    n, m = 25, 80
    src = rng.integers(0, n, size=m).astype(np.int64)
    dst = rng.integers(0, n, size=m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ds = _edges_ds(src, dst)
    seeds = np.array([0, 7, 13], dtype=np.int64)
    got = (
        random_walks(ds, n, seeds, walk_len=5)
        .to_pandas().sort_values(["wid", "step"]).reset_index(drop=True)
    )

    # independent python oracle
    adj = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        adj.setdefault(s, set()).add(d)

    def h(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")

    rows = []
    for w in seeds.tolist():
        cur = w
        rows.append((w, 0, cur))
        for step in range(1, 6):
            cand = sorted(adj.get(cur, ()))
            if not cand:
                break
            cur = min(cand, key=lambda d: (h(f"{w}:{step}:{cur}:{d}"), d))
            rows.append((w, step, cur))
    want = sorted(rows)
    assert list(map(tuple, got[["wid", "step", "vertex"]].to_numpy())) == want
    # rerun: identical (pure function of the graph)
    again = (
        random_walks(ds, n, seeds, walk_len=5)
        .to_pandas().sort_values(["wid", "step"]).reset_index(drop=True)
    )
    assert (got == again).all().all()
    # walks actually move
    assert (got["step"] > 0).sum() >= 10


def test_random_walks_sharded_parity(tmp_path):
    """The frontier-routed shard path is bit-identical to the
    broadcast-CSR path (the walk is a pure function of (graph, wid))."""
    from ugfraud_ray.pipelines.walks import random_walks

    rng = np.random.default_rng(31)
    n, m = 40, 160
    src = rng.integers(0, n, size=m).astype(np.int64)
    dst = rng.integers(0, n, size=m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ds = _edges_ds(src, dst)
    seeds = np.array([0, 3, 7, 13, 22, 39], dtype=np.int64)
    local = (
        random_walks(ds, n, seeds, walk_len=6)
        .to_pandas().sort_values(["wid", "step"]).reset_index(drop=True)
    )
    sharded = (
        random_walks(
            ds, n, seeds, walk_len=6,
            approx_edges=len(src), local_threshold=0, P=3,
            edge_dir=str(tmp_path / "w"),
        )
        .to_pandas().sort_values(["wid", "step"]).reset_index(drop=True)
    )
    assert (local == sharded).all().all()


def test_component_sizes_matches_networkx(tmp_path):
    from ugfraud_ray.pipelines.components import component_sizes

    spec = PagesSpec(n_users=30, n_prods=5, n_edges=60, seed=9, n_components=3)
    src, dst, n = _graph(spec)
    got = (
        component_sizes(_edges_ds(src, dst), n, str(tmp_path / "csz"), P=2)
        .to_pandas().sort_values("component").reset_index(drop=True)
    )

    import networkx as nx

    G = nx.Graph()
    G.add_nodes_from(range(n))
    G.add_edges_from(zip(src.tolist(), dst.tolist()))
    G.remove_edges_from(nx.selfloop_edges(G))
    want = sorted(
        (min(c), len(c), G.subgraph(c).number_of_edges())
        for c in nx.connected_components(G)
    )
    assert list(map(tuple, got.to_numpy())) == want
    assert len(got) >= 3


def test_double_sweep_diameter(tmp_path):
    from ugfraud_ray.pipelines.bfs import double_sweep_diameter

    # path graph 0-1-2-3-4: true diameter 4, found from either sweep
    src = np.array([0, 1, 2, 3], dtype=np.int64)
    dst = np.array([1, 2, 3, 4], dtype=np.int64)
    got = double_sweep_diameter(_edges_ds(src, dst), 5, str(tmp_path / "dm"), P=2).to_pandas()
    assert got["v0"].tolist() == [0]
    assert got["ecc0"].tolist() == [4]
    assert got["v1"].tolist() == [4]
    assert got["diameter_lb"].tolist() == [4]

    spec = PagesSpec(n_users=40, n_prods=6, n_edges=110, seed=3)
    src, dst, n = _graph(spec)
    got = double_sweep_diameter(_edges_ds(src, dst), n, str(tmp_path / "dm2"), P=2).to_pandas()

    import networkx as nx

    G = nx.Graph()
    G.add_nodes_from(range(n))
    G.add_edges_from(zip(src.tolist(), dst.tolist()))
    comp = nx.node_connected_component(G, 0)
    true_diam = max(
        nx.eccentricity(G.subgraph(comp)).values()
    )
    lb = int(got["diameter_lb"].iloc[0])
    assert int(got["ecc0"].iloc[0]) <= lb <= true_diam
    assert lb >= 1


def test_contract_graph_matches_dict_oracle():
    from ugfraud_ray.pipelines.contraction import contract_graph

    rng = np.random.default_rng(7)
    src = rng.integers(0, 40, 500).astype(np.int64)
    dst = rng.integers(0, 40, 500).astype(np.int64)
    gid = rng.integers(0, 6, 40).astype(np.int64)
    gm = ray.data.from_arrow(
        pa.table({"id": pa.array(np.arange(40, dtype=np.int64)), "gid": pa.array(gid)})
    )
    got = (
        contract_graph(_edges_ds(src, dst), gm, approx_rows=500)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    want: dict[tuple[int, int], int] = {}
    for s, t in zip(gid[src], gid[dst]):
        if s != t:
            want[(int(s), int(t))] = want.get((int(s), int(t)), 0) + 1
    assert len(got) == len(want)
    for _, row in got.iterrows():
        assert want[(row["src"], row["dst"])] == row["weight"]


def test_contract_graph_join_path_agrees():
    from ugfraud_ray.pipelines.contraction import contract_graph

    rng = np.random.default_rng(13)
    src = rng.integers(0, 60, 800).astype(np.int64)
    dst = rng.integers(0, 60, 800).astype(np.int64)
    gid = rng.integers(0, 9, 60).astype(np.int64)
    gm = ray.data.from_arrow(
        pa.table({"id": pa.array(np.arange(60, dtype=np.int64)), "gid": pa.array(gid)})
    )
    a = (
        contract_graph(_edges_ds(src, dst), gm, approx_rows=800)
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    )
    b = (
        contract_graph(_edges_ds(src, dst), gm, approx_rows=800, broadcast_threshold=0)
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    )
    assert a.equals(b)


def test_weighted_pagerank_matches_dense_oracle(tmp_path):
    from ugfraud_ray.pipelines.contraction import weighted_pagerank

    rng = np.random.default_rng(23)
    m, n = 300, 35
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.integers(1, 9, len(src)).astype(np.int64)
    e = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst), "weight": pa.array(w)})
    )
    got, _ = weighted_pagerank(e, n, str(tmp_path / "wpr"), P=2, max_iters=60, tol=None)
    gt = got.to_pandas().sort_values("vid")
    wout = np.bincount(src, weights=w.astype(np.float64), minlength=n)
    x = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(60):
        msg = x[src] * (w / np.where(wout[src] > 0, wout[src], 1.0))
        agg = np.bincount(dst, weights=msg, minlength=n)
        dang = x[wout == 0].sum()
        x = (1 - d) / n + d * agg + d * dang / n
    assert np.allclose(gt["rank"].to_numpy(), x, atol=1e-9)


def test_mis_independent_and_maximal():
    from ugfraud_ray.pipelines.mis import mis_members

    rng = np.random.default_rng(31)
    n, m = 200, 600
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    mask = mis_members(_edges_ds(src, dst), n, approx_edges=len(src))
    # independence: no edge with both endpoints in the MIS
    assert not (mask[src] & mask[dst]).any()
    # maximality: every vertex outside has a neighbor inside
    nbr_in = np.zeros(n, dtype=bool)
    nbr_in[dst[mask[src]]] = True
    nbr_in[src[mask[dst]]] = True
    assert (mask | nbr_in).all()


def test_mis_local_vs_distributed_agree():
    from ugfraud_ray.pipelines.mis import mis_members

    rng = np.random.default_rng(37)
    n, m = 120, 300
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    a = mis_members(_edges_ds(src, dst), n, approx_edges=len(src))
    b = mis_members(_edges_ds(src, dst), n, approx_edges=None)
    assert (a == b).all()


def test_coloring_proper_and_converged():
    from ugfraud_ray.pipelines.mis import coloring

    rng = np.random.default_rng(41)
    n, m = 150, 500
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    color = coloring(_edges_ds(src, dst), n, approx_edges=len(src))
    assert (color >= 0).all()
    # proper: no monochromatic edge
    assert not (color[src] == color[dst]).any()
    # colors used are contiguous from 0
    used = np.unique(color)
    assert (used == np.arange(len(used))).all()
    # distributed path agrees
    d = coloring(_edges_ds(src, dst), n, approx_edges=None)
    assert (color == d).all()


def test_msf_matches_kruskal_oracle():
    from ugfraud_ray.pipelines.msf import minimum_spanning_forest, pair_weights

    rng = np.random.default_rng(47)
    n, m = 120, 400
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    got = minimum_spanning_forest(_edges_ds(src, dst), n, approx_edges=len(src)).to_pandas()

    # Kruskal on the canonical simple graph with the same weights
    a, b = np.minimum(src, dst), np.maximum(src, dst)
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    a, b = pairs[:, 0], pairs[:, 1]
    w = pair_weights(a, b)
    order = np.argsort(w)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    want = set()
    for i in order:
        ra, rb = find(int(a[i])), find(int(b[i]))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            want.add((int(a[i]), int(b[i])))

    got_set = set(zip(got["src"].tolist(), got["dst"].tolist()))
    assert got_set == want

    # distributed Borůvka (joins + bucketed min + hash-min CC contraction)
    # finds the identical forest (unique weights => unique MSF)
    dist = minimum_spanning_forest(
        _edges_ds(src, dst), n, approx_edges=len(src), local_threshold=0, P=3
    ).to_pandas()
    assert set(zip(dist["src"].tolist(), dist["dst"].tolist())) == want


def _salsa_oracle(src, dst, n, iters):
    """Dense synchronous SALSA: alternating 1/deg-weighted walk steps,
    no normalization (the operator is sub-stochastic)."""
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    indeg = np.bincount(dst, minlength=n).astype(np.float64)
    ow = 1.0 / np.where(outdeg > 0, outdeg, 1.0)
    iw = 1.0 / np.where(indeg > 0, indeg, 1.0)
    a = np.ones(n)
    h = np.ones(n)
    for _ in range(iters):
        a_new = np.bincount(dst, weights=h[src] * ow[src], minlength=n)
        h_new = np.bincount(src, weights=a[dst] * iw[dst], minlength=n)
        a, h = a_new, h_new
    return a, h


def test_salsa_matches_dense_oracle(tmp_path):
    from ugfraud_ray.pipelines.salsa import salsa

    spec = PagesSpec(n_users=50, n_prods=8, n_edges=150, seed=13)
    src, dst, n = _graph(spec)
    got, metrics = salsa(_edges_ds(src, dst), n, str(tmp_path / "sl"), P=2, max_iters=6)
    gp = got.to_pandas().sort_values("vid")
    wa, wh = _salsa_oracle(src, dst, n, iters=6)
    np.testing.assert_allclose(gp["salsa_authority"].to_numpy(), wa, atol=1e-12)
    np.testing.assert_allclose(gp["salsa_hub"].to_numpy(), wh, atol=1e-12)
    assert len(metrics) == 6
    # stochastic operator: total authority mass == number of non-dangling
    # sources after the first step stays bounded by n
    assert gp["salsa_authority"].to_numpy().sum() <= n + 1e-9


def test_salsa_partition_invariant_and_hub_split(tmp_path):
    from ugfraud_ray.pipelines.salsa import salsa

    spec = PagesSpec(n_users=60, n_prods=6, n_edges=220, seed=29, zipf_a=2.0)
    src, dst, n = _graph(spec)
    a1, _ = salsa(_edges_ds(src, dst), n, str(tmp_path / "s1"), P=1, max_iters=5)
    a4, _ = salsa(
        _edges_ds(src, dst), n, str(tmp_path / "s4"), P=4, max_iters=5, hub_threshold=30
    )
    p1 = a1.to_pandas().sort_values("vid").reset_index(drop=True)
    p4 = a4.to_pandas().sort_values("vid").reset_index(drop=True)
    np.testing.assert_allclose(p1["salsa_authority"], p4["salsa_authority"], atol=1e-12)
    np.testing.assert_allclose(p1["salsa_hub"], p4["salsa_hub"], atol=1e-12)


def test_partition_modularity_matches_networkx(tmp_path):
    """Per-community q_terms sum to networkx's modularity of the same
    partition on the same undirected multigraph convention."""
    import ray.data as rd

    from ugfraud_ray.pipelines.modularity import partition_modularity

    rng = np.random.default_rng(31)
    n, m = 40, 160
    src = rng.integers(0, n, size=m).astype(np.int64)
    dst = rng.integers(0, n, size=m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    labels = (np.arange(n, dtype=np.int64) * 7919) % 4  # deterministic 4-way
    lab_t = pa.table({"id": pa.array(np.arange(n, dtype=np.int64)), "label": pa.array(labels)})
    edges = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)})).repartition(5)
    got = partition_modularity(edges, lab_t).to_pandas()
    # exact integer cross-check
    in_c = np.zeros(4, dtype=np.int64)
    deg_c = np.zeros(4, dtype=np.int64)
    for a, b in zip(labels[src], labels[dst]):
        if a == b:
            in_c[a] += 1
        deg_c[a] += 1
        deg_c[b] += 1
    assert list(got["in_edges"]) == list(in_c)
    assert list(got["deg_sum"]) == list(deg_c)
    assert list(got["n_vertices"]) == list(np.bincount(labels, minlength=4))
    mm = float(len(src))
    want_q = in_c / mm - (deg_c / (2 * mm)) ** 2
    np.testing.assert_allclose(got["q_term"].to_numpy(), want_q, atol=1e-15)
    # networkx agreement on the summed Q (undirected multigraph view)
    try:
        import networkx as nx
    except ImportError:
        return
    G = nx.MultiGraph()
    G.add_nodes_from(range(n))
    G.add_edges_from(zip(src.tolist(), dst.tolist()))
    comms = [set(np.flatnonzero(labels == c).tolist()) for c in range(4)]
    want = nx.algorithms.community.modularity(G, comms)
    assert abs(got["q_term"].sum() - want) < 1e-12


def test_betweenness_matches_networkx(tmp_path):
    """All-sources, radius >= diameter ==> exact Brandes betweenness
    (networkx, directed, unnormalized)."""
    import ray.data as rd

    from ugfraud_ray.pipelines.betweenness import betweenness_subset

    rng = np.random.default_rng(41)
    n = 30
    src = rng.integers(0, n, size=90).astype(np.int64)
    dst = rng.integers(0, n, size=90).astype(np.int64)
    keep = src != dst
    e = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    src, dst = e[:, 0], e[:, 1]
    edges = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    got = betweenness_subset(
        edges, n, np.arange(n, dtype=np.int64), radius=n, approx_edges=len(src)
    ).to_pandas()
    import networkx as nx

    G = nx.DiGraph()
    G.add_nodes_from(range(n))
    G.add_edges_from(zip(src.tolist(), dst.tolist()))
    want = nx.betweenness_centrality(G, normalized=False)
    np.testing.assert_allclose(
        got.sort_values("vid")["betweenness"].to_numpy(),
        np.array([want[i] for i in range(n)]),
        atol=1e-9,
    )


def test_betweenness_local_vs_distributed(tmp_path):
    import ray.data as rd

    from ugfraud_ray.pipelines.betweenness import betweenness_subset

    rng = np.random.default_rng(43)
    n = 50
    src = rng.integers(0, n, size=200).astype(np.int64)
    dst = rng.integers(0, n, size=200).astype(np.int64)
    keep = src != dst
    e = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(e[:, 0]), "dst": pa.array(e[:, 1])})
    )
    sources = np.arange(0, n, 5, dtype=np.int64)
    loc = betweenness_subset(edges, n, sources, radius=3, approx_edges=len(e))
    dist = betweenness_subset(
        edges.repartition(7),
        n,
        sources,
        radius=3,
        approx_edges=len(e),
        local_threshold=0,  # force the superstep-engine path
        P=3,
        layout_dir=str(tmp_path / "bc"),
    )
    lp = loc.to_pandas().sort_values("vid").reset_index(drop=True)
    dp = dist.to_pandas().sort_values("vid").reset_index(drop=True)
    # forward partials are integer-exact; backward sums only reorder
    np.testing.assert_allclose(lp["betweenness"], dp["betweenness"], atol=1e-9)


def test_mis_coloring_external_priorities_engine_parity(tmp_path):
    """The queries pass EXTERNAL md5 priorities (of original ids); the
    engine path must consume them via the layout's vertex-aux files and
    reach the same fixpoint as the local rounds."""
    import hashlib

    from ugfraud_ray.pipelines.mis import coloring, mis_members

    rng = np.random.default_rng(5)
    n = 60
    src = rng.integers(0, n, 250).astype(np.int64)
    dst = rng.integers(0, n, 250).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ds = _edges_ds(src, dst)
    prio = np.array(
        [
            int.from_bytes(hashlib.md5(str(v * 31 + 7).encode()).digest()[:8], "little")
            for v in range(n)
        ],
        dtype=np.uint64,
    )
    a = mis_members(ds, n, approx_edges=len(src), priorities=prio)
    b = mis_members(
        ds, n, approx_edges=len(src), priorities=prio,
        local_threshold=0, P=3, layout_dir=str(tmp_path / "m"),
    )
    assert (a == b).all()
    ca = coloring(ds, n, approx_edges=len(src), priorities=prio)
    cb = coloring(
        ds, n, approx_edges=len(src), priorities=prio,
        local_threshold=0, P=3, layout_dir=str(tmp_path / "c"),
    )
    assert (ca == cb).all()


def test_betweenness_engine_path_vs_duckdb_oracle(tmp_path, ray_session):
    """ADVICE r2: the DuckDB oracle was only ever exercised against the
    driver-local Brandes path (the driver SFs sit below the 5M-edge
    gate). Replay the betweenness_subset QUERY with the engine path
    FORCED (local_threshold=0) at sf0.001 and compare to the oracle SQL
    at the driver's own tolerance, so the re-associated backward sums
    are value-verified against SQL, not just against the local path."""
    import duckdb

    import __ray_entry__ as entrymod
    from ugfraud_ray.pipelines.betweenness import betweenness_subset
    from ugfraud_ray.pipelines.testdata_graph import (
        general_edges,
        number_int_vertices,
        unmap_vids,
    )

    sf_dir = "/root/testdata/sf0.001"
    ge = general_edges(sf_dir)
    e, vmap, n = number_int_vertices(ge)
    vt = vmap.to_pandas().sort_values("vid")
    sources = (
        vt.loc[vt["id"] % entrymod.BETW_SEED_MOD == 0, "vid"].to_numpy().astype(np.int64)
    )
    t = betweenness_subset(
        e,
        n,
        sources,
        radius=entrymod.BETW_RADIUS,
        approx_edges=ge.count(),
        local_threshold=0,  # force the superstep-engine path
        P=3,
        layout_dir=str(tmp_path / "bc_oracle"),
    )
    got = (
        unmap_vids(ray.data.from_arrow(t), vmap, vid_col="vid", out_col="id")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    got["betweenness"] = np.round(got["betweenness"].to_numpy(), 9)

    con = duckdb.connect()
    for tab in ("orders",):
        con.execute(
            f"CREATE VIEW {tab} AS SELECT * FROM read_parquet('{sf_dir}/{tab}.parquet')"
        )
    want = (
        con.execute(entrymod.oracle_sql()["betweenness_subset"])
        .df()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert got["id"].tolist() == want["id"].tolist()
    np.testing.assert_allclose(
        got["betweenness"].to_numpy(),
        want["betweenness"].to_numpy(),
        rtol=1e-9,
        atol=1e-12,
    )


def test_coreness_both_paths_match_naive_sweep(ray_session):
    from ugfraud_ray.pipelines.kcore import coreness

    rng = np.random.default_rng(61)
    n, m = 200, 1400
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).repartition(5)

    # naive sweep: exact coreness via repeated peel at k = 1, 2, ...
    a, b = np.minimum(src, dst), np.maximum(src, dst)
    pairs = np.unique(a * np.int64(10**6) + b)
    a, b = pairs // 10**6, pairs % 10**6
    touched = np.zeros(n, dtype=bool)
    touched[a] = True
    touched[b] = True
    alive = touched.copy()
    core = np.zeros(n, dtype=np.int64)
    k = 1
    while alive.any():
        while True:
            kp = alive[a] & alive[b]
            deg = np.bincount(a[kp], minlength=n) + np.bincount(b[kp], minlength=n)
            new = alive & (deg >= k)
            if new.sum() == alive.sum():
                break
            alive = new
        core[alive] = k
        k += 1

    want = {int(i): int(core[i]) for i in np.flatnonzero(touched)}

    loc = coreness(ds, n, approx_edges=len(src)).to_pandas()
    got_local = dict(zip(loc["id"], loc["coreness"]))
    assert got_local == want

    dist = coreness(ds, n, approx_edges=None).to_pandas()
    got_dist = dict(zip(dist["id"].astype(int), dist["coreness"].astype(int)))
    assert got_dist == want


# ---------------------------------------------------------------------------
# Katz centrality (pipelines/katz.py)
# ---------------------------------------------------------------------------


def _katz_oracle(src, dst, n, alpha=0.05, beta=1.0, iters=8):
    x = np.full(n, beta, dtype=np.float64)
    for _ in range(iters):
        agg = np.bincount(dst, weights=x[src], minlength=n)
        x = beta + alpha * agg
    return x


def test_katz_matches_dense_oracle(tmp_path):
    from ugfraud_ray.pipelines.katz import katz_centrality

    spec = PagesSpec(n_users=50, n_prods=8, n_edges=150, seed=11)
    src, dst, n = _graph(spec)
    got, metrics = katz_centrality(
        _edges_ds(src, dst), n, str(tmp_path / "katz"), P=2, alpha=0.05, iters=8
    )
    gp = got.to_pandas().sort_values("vid")
    want = _katz_oracle(src, dst, n, alpha=0.05, iters=8)
    np.testing.assert_allclose(gp["katz"].to_numpy(), want, atol=1e-12)
    assert len(metrics) == 8
    # the prestige ranking must differ from uniform: some vertex gained
    assert gp["katz"].max() > 1.0


def test_katz_hub_split_identical(tmp_path):
    from ugfraud_ray.pipelines.katz import katz_centrality

    spec = PagesSpec(n_users=50, n_prods=8, n_edges=150, seed=11, zipf_a=2.0)
    src, dst, n = _graph(spec)
    a, _ = katz_centrality(_edges_ds(src, dst), n, str(tmp_path / "a"), P=2, iters=6)
    b, _ = katz_centrality(
        _edges_ds(src, dst), n, str(tmp_path / "b"), P=3, iters=6, hub_threshold=5
    )
    pa_, pb = a.to_pandas().sort_values("vid"), b.to_pandas().sort_values("vid")
    np.testing.assert_allclose(pa_["katz"].to_numpy(), pb["katz"].to_numpy(), atol=1e-12)


# ---------------------------------------------------------------------------
# Weighted PageRank (pagerank.weighted_pagerank)
# ---------------------------------------------------------------------------


def _wpr_oracle(src, dst, wr, n, d=0.85, iters=10):
    W = np.bincount(src, weights=wr.astype(np.float64), minlength=n)
    inv = np.zeros(n)
    inv[W > 0] = 1.0 / W[W > 0]
    w = wr.astype(np.float64) * inv[src]
    x = np.full(n, 1.0 / n)
    dangling = W == 0
    for _ in range(iters):
        dang = x[dangling].sum()
        agg = np.bincount(dst, weights=x[src] * w, minlength=n)
        x = (1.0 - d) / n + d * agg + d * dang / n
    return x


def test_weighted_pagerank_matches_dense_oracle(tmp_path):
    from ugfraud_ray.pipelines.contraction import weighted_pagerank

    spec = PagesSpec(n_users=60, n_prods=9, n_edges=180, seed=7)
    src, dst, n = _graph(spec)
    wr = (1 + (src + dst) % 5).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst), "wr": pa.array(wr)})
    ).materialize()
    got, metrics = weighted_pagerank(
        ds, n, str(tmp_path / "wpr"), weight_col="wr", P=3, damping=0.85,
        max_iters=10, tol=None,
    )
    gp = got.to_pandas().sort_values("vid")
    want = _wpr_oracle(src, dst, wr, n, d=0.85, iters=10)
    np.testing.assert_allclose(gp["rank"].to_numpy(), want, atol=1e-12)
    assert abs(gp["rank"].sum() - 1.0) < 1e-9  # stochastic: mass conserved
    # uniform weights == plain pagerank (sanity of the normalization)
    ones = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "wr": pa.array(np.ones(len(src), dtype=np.int64)),
            }
        )
    ).materialize()
    got_u, _ = weighted_pagerank(
        ones, n, str(tmp_path / "wpr_u"), weight_col="wr", P=2, damping=0.85,
        max_iters=6, tol=None,
    )
    pr_u, _ = pagerank(
        _edges_ds(src, dst).materialize(), n, str(tmp_path / "pr_u"),
        P=2, damping=0.85, max_iters=6, tol=None,
    )
    a = got_u.to_pandas().sort_values("vid")["rank"].to_numpy()
    b = pr_u.to_pandas().sort_values("vid")["rank"].to_numpy()
    np.testing.assert_allclose(a, b, atol=1e-12)


# ---------------------------------------------------------------------------
# Greedy maximal matching (pipelines/matching.py)
# ---------------------------------------------------------------------------


def _matching_naive(src, dst, n, rounds=30):
    import numpy as np

    edges = set()
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            edges.add((min(s, d), max(s, d)))
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    active = set(adj)
    partner = {}
    for _ in range(rounds):
        if not active:
            break
        m = {}
        for v in active:
            nb = [u for u in adj[v] if u in active]
            if nb:
                m[v] = min(nb)
        done = {v for v in active if v not in m}
        matched = {v for v, u in m.items() if m.get(u) == v}
        for v in matched:
            partner[v] = m[v]
        active -= matched | done
    return partner


def test_maximal_matching_local_engine_and_naive(tmp_path):
    from ugfraud_ray.pipelines.matching import maximal_matching

    rng = np.random.default_rng(31)
    n = 80
    src = rng.integers(0, n, 300).astype(np.int64)
    dst = rng.integers(0, n, 300).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ds = _edges_ds(src, dst).materialize()

    want = _matching_naive(src, dst, n)
    want_pairs = sorted((v, u) for v, u in want.items() if v < u)

    loc = maximal_matching(ds, n, approx_edges=len(src)).to_pandas()
    got_loc = sorted(zip(loc["id"].astype(int), loc["partner"].astype(int)))
    assert got_loc == want_pairs

    eng = maximal_matching(
        ds, n, approx_edges=None, P=3, layout_dir=str(tmp_path / "match")
    ).to_pandas()
    got_eng = sorted(zip(eng["id"].astype(int), eng["partner"].astype(int)))
    assert got_eng == want_pairs

    # matching is valid and maximal
    used = set()
    for a, b in got_loc:
        assert a not in used and b not in used
        used.update((a, b))
    pairs = {(min(a, b), max(a, b)) for a, b in zip(src.tolist(), dst.tolist())}
    for a, b in pairs:
        assert a in used or b in used, "not maximal"


def test_coarsen_by_matching_naive(ray_session):
    from ugfraud_ray.pipelines.matching import coarsen_by_matching, maximal_matching

    rng = np.random.default_rng(77)
    n = 50
    src = rng.integers(0, n, 160).astype(np.int64)
    dst = rng.integers(0, n, 160).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ds = _edges_ds(src, dst).materialize()
    m = maximal_matching(ds, n, approx_edges=len(src))
    mp = dict(zip(m.to_pandas()["id"], m.to_pandas()["partner"]))
    g = {}
    for a, b in mp.items():
        g[a] = a
        g[b] = a
    want: dict[tuple, int] = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        gs, gd = g.get(s, s), g.get(d, d)
        if gs != gd:
            want[(gs, gd)] = want.get((gs, gd), 0) + 1
    out = coarsen_by_matching(ds, n, m, approx_edges=len(src)).to_pandas()
    got = {
        (int(r.src), int(r.dst)): int(r.weight) for r in out.itertuples(index=False)
    }
    assert got == want
    # contraction really merged something
    assert len({*g.values()}) < len(g)


def test_pagerank_warm_start_matches_cold_and_dense(tmp_path):
    from ugfraud_ray.pipelines.pagerank import pagerank, pagerank_warm

    spec = PagesSpec(n_users=50, n_prods=8, n_edges=150, seed=13)
    src, dst, n = _graph(spec)
    ds = _edges_ds(src, dst).materialize()

    # unchanged graph: 6 cold + 4 warm supersteps == 10 cold supersteps
    r6, _ = pagerank(ds, n, str(tmp_path / "c6"), P=2, max_iters=6, tol=None)
    r10, _ = pagerank(ds, n, str(tmp_path / "c10"), P=2, max_iters=10, tol=None)
    w4, _ = pagerank_warm(ds, n, str(tmp_path / "w4"), r6, P=3, max_iters=4, tol=None)
    a = w4.to_pandas().sort_values("vid")["rank"].to_numpy()
    b = r10.to_pandas().sort_values("vid")["rank"].to_numpy()
    np.testing.assert_allclose(a, b, atol=1e-15)

    # grown graph: warm run == dense oracle started from r6
    extra = 40
    rng = np.random.default_rng(5)
    s2 = np.concatenate([src, rng.integers(0, n, extra)]).astype(np.int64)
    d2 = np.concatenate([dst, rng.integers(0, n, extra)]).astype(np.int64)
    keep = s2 != d2
    s2, d2 = s2[keep], d2[keep]
    grown = _edges_ds(s2, d2).materialize()
    wg, _ = pagerank_warm(grown, n, str(tmp_path / "wg"), r6, P=2, max_iters=4, tol=None)

    r0 = r6.to_pandas().sort_values("vid")["rank"].to_numpy()
    outdeg = np.bincount(s2, minlength=n).astype(np.float64)
    w = 1.0 / np.where(outdeg > 0, outdeg, 1.0)
    x = r0.copy()
    d_ = 0.85
    for _ in range(4):
        dang = x[outdeg == 0].sum()
        agg = np.bincount(d2, weights=x[s2] * w[s2], minlength=n)
        x = (1 - d_) / n + d_ * agg + d_ * dang / n
    got = wg.to_pandas().sort_values("vid")["rank"].to_numpy()
    np.testing.assert_allclose(got, x, atol=1e-12)
