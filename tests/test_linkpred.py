"""Link-prediction scores vs a naive set-based oracle; local == distributed."""

import numpy as np
import pyarrow as pa
import ray.data

from ugfraud_ray.pipelines.linkpred import link_prediction_scores


def _naive(src, dst, n, top_n, max_degree):
    nbrs = [set() for _ in range(n)]
    edges = set()
    for s, d in zip(src, dst):
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        edges.add((a, b))
        nbrs[a].add(b)
        nbrs[b].add(a)
    deg = [len(x) for x in nbrs]
    scores = {}
    for w in range(n):
        if deg[w] < 2 or deg[w] > max_degree:
            continue
        ns = sorted(nbrs[w])
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                p = (ns[i], ns[j])
                cn, aa = scores.get(p, (0, 0.0))
                scores[p] = (cn + 1, aa + 1.0 / np.log(deg[w]))
    rows = [
        (u, v, cn, aa)
        for (u, v), (cn, aa) in scores.items()
        if (u, v) not in edges
    ]
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:top_n]


def test_linkpred_matches_naive_and_paths_agree(ray_session):
    rng = np.random.default_rng(5)
    n = 120
    src = rng.integers(0, n, 700)
    dst = rng.integers(0, n, 700)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    want = _naive(src, dst, n, top_n=50, max_degree=1000)

    local = link_prediction_scores(ds, n, top_n=50, max_degree=1000)
    dist = link_prediction_scores(
        ds, n, top_n=50, max_degree=1000, local_threshold=0, n_buckets=8
    )
    for got in (local, dist):
        g = got.to_pandas()
        assert len(g) == len(want)
        for row, (u, v, cn, aa) in zip(g.itertuples(index=False), want):
            assert (row.u, row.v, row.cn) == (u, v, cn)
            assert abs(row.aa - aa) < 1e-9


def test_linkpred_degree_cap_excludes_hubs(ray_session):
    # star: hub 0 connected to 1..20, plus a single wedge 1-21-2
    src = [0] * 20 + [21, 21]
    dst = list(range(1, 21)) + [1, 2]
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    out = link_prediction_scores(ds, 22, top_n=500, max_degree=5).to_pandas()
    # hub 0 (deg 20) is capped out as a common neighbor, so no pair among
    # 1..20 appears. Vertices 1 and 2 (deg 2) each emit (0,21) -> cn=2;
    # w=21 (deg 2) emits (1,2) -> cn=1.
    assert [tuple(r) for r in out[["u", "v", "cn"]].to_numpy()] == [
        (0, 21, 2),
        (1, 2, 1),
    ]
    assert abs(out.aa[0] - 2.0 / np.log(2)) < 1e-12
    assert abs(out.aa[1] - 1.0 / np.log(2)) < 1e-12
