import numpy as np
import pyarrow as pa
import ray.data

from ugfraud_ray.pipelines.triangles import triangle_count


def _random_graph(n=60, m=300, seed=13):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=m)
    dst = rng.integers(0, n, size=m)
    return src.astype(np.int64), dst.astype(np.int64)


def test_triangle_count_matches_networkx():
    src, dst = _random_graph()
    ds = ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    got = triangle_count(ds)

    import networkx as nx

    G = nx.Graph()
    G.add_edges_from(zip(src.tolist(), dst.tolist()))
    G.remove_edges_from(nx.selfloop_edges(G))
    want = sum(nx.triangles(G).values()) // 3
    assert got == want
    assert got > 0


def test_triangle_count_known_small():
    # K4 has 4 triangles
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array([a for a, _ in edges], pa.int64()),
                  "dst": pa.array([b for _, b in edges], pa.int64())})
    )
    assert triangle_count(ds) == 4


def test_local_clustering_matches_networkx():
    from ugfraud_ray.pipelines.clustering import local_clustering

    src, dst = _random_graph(n=50, m=260, seed=7)
    ds = ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    got = local_clustering(ds).to_pandas().sort_values("vid").reset_index(drop=True)

    import networkx as nx

    G = nx.Graph()
    G.add_edges_from(zip(src.tolist(), dst.tolist()))
    G.remove_edges_from(nx.selfloop_edges(G))
    tri = nx.triangles(G)
    cc = nx.clustering(G)
    want_vids = sorted(G.nodes())
    assert got["vid"].tolist() == want_vids
    assert got["triangles"].tolist() == [tri[v] for v in want_vids]
    np.testing.assert_allclose(
        got["clustering"].to_numpy(), [cc[v] for v in want_vids], atol=1e-9
    )
    assert got["triangles"].sum() > 0


def test_local_clustering_local_vs_distributed_agree():
    from ugfraud_ray.pipelines.clustering import local_clustering

    src, dst = _random_graph(n=80, m=500, seed=23)
    ds = ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    a = local_clustering(ds, local_threshold=1_000_000).to_pandas().sort_values("vid")
    b = local_clustering(ds, local_threshold=0).to_pandas().sort_values("vid")
    assert a["vid"].tolist() == b["vid"].tolist()
    assert a["triangles"].tolist() == b["triangles"].tolist()
    np.testing.assert_array_equal(a["clustering"].to_numpy(), b["clustering"].to_numpy())


def test_degree_histogram_and_reciprocity():
    from ugfraud_ray.pipelines.graphstats import degree_histogram, reciprocity

    # directed graph: 0->1, 1->0 (mutual), 1->2, 2->3, 3->2 (mutual), 0->2
    src = np.array([0, 1, 1, 2, 3, 0], dtype=np.int64)
    dst = np.array([1, 0, 2, 3, 2, 2], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))

    h = degree_histogram(ds, 4, kind="total").to_pandas().sort_values("degree")
    # total degrees: v0=3, v1=3, v2=4, v3=2
    assert dict(zip(h["degree"], h["n_vertices"])) == {2: 1, 3: 2, 4: 1}
    hi = degree_histogram(ds, 4, kind="in").to_pandas()
    # in-degrees: v0=1, v1=1, v2=3, v3=1
    assert dict(zip(hi["degree"], hi["n_vertices"])) == {1: 3, 3: 1}

    r = reciprocity(ds).to_pandas().iloc[0]
    assert r["n_edges"] == 6
    assert r["n_mutual_pairs"] == 2
    assert r["n_reciprocal"] == 4


def test_reciprocity_local_vs_distributed_agree():
    from ugfraud_ray.pipelines.graphstats import reciprocity

    rng = np.random.default_rng(11)
    src = rng.integers(0, 30, size=400).astype(np.int64)
    dst = rng.integers(0, 30, size=400).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    a = reciprocity(ds, local_threshold=1_000_000).to_pandas().iloc[0]
    b = reciprocity(ds, local_threshold=0).to_pandas().iloc[0]
    assert a["n_edges"] == b["n_edges"]
    assert a["n_mutual_pairs"] == b["n_mutual_pairs"]
    assert a["n_mutual_pairs"] > 0


def _nx_ktruss_edges(src, dst, k):
    import networkx as nx

    G = nx.Graph()
    G.add_edges_from(zip(src.tolist(), dst.tolist()))
    G.remove_edges_from(nx.selfloop_edges(G))
    T = nx.k_truss(G, k)
    return sorted((min(u, v), max(u, v)) for u, v in T.edges())


def test_ktruss_matches_networkx():
    from ugfraud_ray.pipelines.truss import ktruss

    rng = np.random.default_rng(33)
    n, m = 40, 320
    src = rng.integers(0, n, size=m).astype(np.int64)
    dst = rng.integers(0, n, size=m).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    for k in (3, 4, 5):
        got = ktruss(ds, k=k).to_pandas()
        want = _nx_ktruss_edges(src, dst, k)
        assert list(map(tuple, got.to_numpy())) == want, k
    assert len(_nx_ktruss_edges(src, dst, 4)) > 0


def test_ktruss_local_vs_distributed_agree():
    from ugfraud_ray.pipelines.truss import ktruss

    rng = np.random.default_rng(53)
    n, m = 35, 260
    src = rng.integers(0, n, size=m).astype(np.int64)
    dst = rng.integers(0, n, size=m).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    a = ktruss(ds, k=4, local_threshold=1_000_000).to_pandas()
    b = ktruss(ds, k=4, local_threshold=0).to_pandas()
    assert a["a"].tolist() == b["a"].tolist()
    assert a["b"].tolist() == b["b"].tolist()
    assert len(a) > 0


def test_assortativity_matches_networkx(ray_session):
    import networkx as nx

    from ugfraud_ray.pipelines.graphstats import assortativity

    rng = np.random.default_rng(43)
    n, m = 80, 250
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    e = ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    ns, sx, sxx, sxy = assortativity(e, n)
    r = float(ns * sxy - sx * sx) / float(ns * sxx - sx * sx)

    G = nx.Graph()
    G.add_edges_from(zip(src.tolist(), dst.tolist()))
    want = nx.degree_assortativity_coefficient(G)
    assert abs(r - want) < 1e-9


def test_butterfly_count_matches_bruteforce(ray_session):
    from ugfraud_ray.pipelines.butterflies import butterfly_count

    rng = np.random.default_rng(53)
    n_u, n_p, m = 40, 15, 200
    src = rng.integers(0, n_u, m).astype(np.int64)
    dst = (rng.integers(0, n_p, m) + 1000).astype(np.int64)
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    e = ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))

    # brute force: per product-pair common-user counts
    from collections import defaultdict

    prods = defaultdict(set)
    for u, p in zip(src.tolist(), dst.tolist()):
        prods[p].add(u)
    ps = sorted(prods)
    want_b = want_w = want_p = 0
    for i in range(len(ps)):
        for j in range(i + 1, len(ps)):
            c = len(prods[ps[i]] & prods[ps[j]])
            if c:
                want_w += c
                want_p += 1
                want_b += c * (c - 1) // 2

    got = butterfly_count(e, degree_cap=1000, approx_edges=len(src))
    assert got == (want_w, want_p, want_b)
    # distributed path agrees
    assert butterfly_count(e, degree_cap=1000, approx_edges=None) == got
    # degree cap actually filters: with cap 1 no user emits wedges
    assert butterfly_count(e, degree_cap=1, approx_edges=len(src)) == (0, 0, 0)


def test_transitivity_matches_networkx(ray_session):
    import networkx as nx
    import ray.data as rd

    from ugfraud_ray.pipelines.triangles import transitivity

    rng = np.random.default_rng(17)
    n = 40
    src = rng.integers(0, n, size=150).astype(np.int64)
    dst = rng.integers(0, n, size=150).astype(np.int64)
    keep = src != dst
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})
    )
    got = transitivity(edges).to_pandas().iloc[0]
    G = nx.Graph()
    G.add_edges_from(zip(src[keep].tolist(), dst[keep].tolist()))
    assert got["n_triangles"] == sum(nx.triangles(G).values()) // 3
    want_w = sum(d * (d - 1) // 2 for _, d in G.degree())
    assert got["n_wedges"] == want_w
    assert abs(got["transitivity"] - nx.transitivity(G)) < 1e-12


def test_rich_club_matches_networkx(ray_session):
    import networkx as nx
    import ray.data as rd

    from ugfraud_ray.pipelines.graphstats import rich_club

    rng = np.random.default_rng(23)
    n = 50
    src = rng.integers(0, n, size=300).astype(np.int64)
    dst = rng.integers(0, n, size=300).astype(np.int64)
    keep = src != dst
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})
    )
    got = rich_club(edges, ks=(1, 2, 4, 8)).to_pandas().set_index("k")
    G = nx.Graph()
    G.add_edges_from(zip(src[keep].tolist(), dst[keep].tolist()))
    want = nx.rich_club_coefficient(G, normalized=False)
    for k in (1, 2, 4, 8):
        if k in want:
            assert abs(got.loc[k, "phi"] - want[k]) < 1e-12
        # exact integer cross-check
        rich = {v for v, d in G.degree() if d > k}
        assert got.loc[k, "n_rich"] == len(rich)
        assert got.loc[k, "n_rich_edges"] == sum(
            1 for u, v in G.edges() if u in rich and v in rich
        )
    # distributed path (threshold=0) agrees exactly with the local path
    dist = (
        rich_club(edges, ks=(1, 2, 4, 8), local_threshold=0)
        .to_pandas()
        .set_index("k")
    )
    for k in (1, 2, 4, 8):
        for col in ("n_rich", "n_rich_edges", "phi"):
            assert dist.loc[k, col] == got.loc[k, col]


def test_triangles_per_vertex_both_paths_match_networkx(ray_session):
    from ugfraud_ray.pipelines.triangles import triangles_per_vertex

    src, dst = _random_graph(n=80, m=500, seed=21)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).repartition(5)

    import networkx as nx

    G = nx.Graph()
    G.add_edges_from(zip(src.tolist(), dst.tolist()))
    G.remove_edges_from(nx.selfloop_edges(G))
    want = {v: c for v, c in nx.triangles(G).items() if c > 0}

    loc = triangles_per_vertex(ds).to_pandas()
    got_local = dict(zip(loc["id"].astype(int), loc["triangles"].astype(int)))
    assert got_local == want

    dist = triangles_per_vertex(ds, local_threshold=0).to_pandas()
    got_dist = dict(zip(dist["id"].astype(int), dist["triangles"].astype(int)))
    assert got_dist == want


def test_adjacency_docs_matches_naive_and_bucketed_path(ray_session):
    from ugfraud_ray.pipelines.graphstats import adjacency_docs

    rng = np.random.default_rng(5)
    src = rng.integers(0, 40, size=300).astype(np.int64)
    dst = rng.integers(100, 160, size=300).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).repartition(6)

    want = {}
    for s in np.unique(src):
        ds_ = np.unique(dst[src == s])
        want[int(s)] = " ".join(str(x) for x in ds_)

    got = adjacency_docs(ds).to_pandas()
    assert dict(zip(got["doc_id"].astype(int), got["text"])) == want

    forced = adjacency_docs(ds, local_threshold=0).to_pandas()
    assert dict(zip(forced["doc_id"].astype(int), forced["text"])) == want


def test_adjacency_docs_guards_wide_ids(ray_session):
    from ugfraud_ray.pipelines.graphstats import adjacency_docs

    ds = ray.data.from_arrow(
        pa.table({"src": pa.array([1 << 31], pa.int64()), "dst": pa.array([5], pa.int64())})
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="31 bits"):
        adjacency_docs(ds).materialize()


def test_mirror_pairs_recover_planted_mirrors(ray_session):
    """Planted exact mirrors must come back at jaccard 1.0 via the LSH
    chain over adjacency docs (the graph_mirror_pairs composition)."""
    from ugfraud_ray.pipelines.dedup import minhash_lsh_candidates, ngram_jaccard_pairs
    from ugfraud_ray.pipelines.graphstats import adjacency_docs

    rng = np.random.default_rng(13)
    src = np.repeat(np.arange(20, dtype=np.int64), 6)
    dst = rng.integers(1000, 1100, size=len(src)).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    adj = adjacency_docs(ds)
    t = pa.concat_tables(ray.get(adj.to_arrow_refs()))
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    texts = t["text"].to_pylist()
    planted = [(int(i), int(i) + 500) for i in ids if i % 4 == 0]
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    list(ids) + [b for _, b in planted], pa.int64()
                ),
                "text": pa.array(
                    texts + [texts[list(ids).index(a)] for a, _ in planted],
                    pa.string(),
                ),
            }
        )
    ).materialize()
    out = ngram_jaccard_pairs(docs, minhash_lsh_candidates(docs), threshold=0.5)
    got = {
        (int(a), int(b)): j
        for a, b, j in zip(
            out.to_pandas()["id_a"], out.to_pandas()["id_b"], out.to_pandas()["jaccard"]
        )
    }
    for a, b in planted:
        assert got.get((a, b)) == 1.0


def test_local_clustering_matches_networkx(ray_session):
    import networkx as nx
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.triangles import local_clustering

    rng = np.random.default_rng(19)
    src = rng.integers(0, 60, 400).astype(np.int64)
    dst = rng.integers(0, 60, 400).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).repartition(3)

    G = nx.Graph()
    G.add_edges_from(zip(src.tolist(), dst.tolist()))
    want = {
        v: (
            G.degree(v),
            nx.triangles(G, v),
            np.floor(nx.clustering(G, v) * 1e9 + 0.5) / 1e9,
        )
        for v in G.nodes
        if G.degree(v) >= 2
    }
    out = local_clustering(ds).to_pandas()
    got = {
        int(r.id): (int(r.degree), int(r.triangles), float(r.cc))
        for r in out.itertuples(index=False)
    }
    assert got.keys() == want.keys()
    for v in want:
        assert got[v][:2] == want[v][:2], (v, got[v], want[v])
        assert abs(got[v][2] - want[v][2]) < 2e-9
