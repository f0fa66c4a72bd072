"""HyperBall neighborhood function: exact-BFS-ball HLL oracle, path parity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _graph(seed=7, n=120, m=420):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=m)
    dst = rng.integers(0, n, size=m)
    keep = src != dst
    e = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    # original ids deliberately non-contiguous (hash identity is the
    # ORIGINAL id string)
    ids = (np.arange(n, dtype=np.int64) * 17 + 3).astype(np.int64)
    return e[:, 0], e[:, 1], ids


def _bfs_ball(src, dst, n, v, r):
    """Exact out-ball {u : dist(v→u) <= r} by BFS."""
    adj = {}
    for a, b in zip(src.tolist(), dst.tolist()):
        adj.setdefault(a, []).append(b)
    seen = {v}
    frontier = [v]
    for _ in range(r):
        nxt = []
        for x in frontier:
            for y in adj.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    nxt.append(y)
        frontier = nxt
    return seen


def test_hyperball_matches_exact_ball_sketch(ray_session):
    """regs after r supersteps == elementwise-max of the init rows of the
    exact BFS ball members — per vertex, per radius, registers AND the
    derived (n_registers, s_hll, approx) triple."""
    from ugfraud_ray.pipelines.hyperball import (
        _estimates,
        init_registers,
        neighborhood_function,
    )

    src, dst, ids = _graph()
    n = len(ids)
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    radius = 3
    got = neighborhood_function(edges, ids, radius=radius, approx_edges=len(src))
    df = got.to_pandas().set_index(["id", "r"]).sort_index()
    assert len(df) == n * (radius + 1)

    base = init_registers(ids)
    for v in range(0, n, 7):  # spot-check every 7th vertex, all radii
        for r in range(radius + 1):
            ball = _bfs_ball(src, dst, n, v, r)
            regs = np.zeros((1, base.shape[1]), dtype=np.uint8)
            for u in ball:
                np.maximum(regs[0], base[u], out=regs[0])
            nz, s_f, est = _estimates(regs)
            row = df.loc[(int(ids[v]), r)]
            assert int(row["n_registers"]) == int(nz[0])
            assert float(row["s_hll"]) == float(s_f[0])
            assert float(row["approx"]) == float(est[0])


def test_hyperball_local_vs_distributed(ray_session, tmp_path):
    """The register-sharded actor path produces the identical table to
    the local-numpy path (max-union is order-free), whatever P."""
    from ugfraud_ray.pipelines.hyperball import neighborhood_function

    src, dst, ids = _graph(seed=13, n=80, m=300)
    t = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    loc = neighborhood_function(
        ray.data.from_arrow(t), ids, radius=2, approx_edges=len(src)
    ).to_pandas()
    dist = neighborhood_function(
        ray.data.from_arrow(t).repartition(9),
        ids,
        radius=2,
        approx_edges=len(src),
        local_threshold=0,  # force the register-sharded actor path
        P=3,
        edge_dir=str(tmp_path / "hb"),
    ).to_pandas()
    key = ["id", "r"]
    assert loc.sort_values(key).reset_index(drop=True).equals(
        dist.sort_values(key).reset_index(drop=True)
    )


def test_hyperball_ball_growth_monotone(ray_session):
    """n_registers (set-union cardinality proxy) never shrinks with r,
    and the radius-0 estimate counts exactly one element per vertex."""
    from ugfraud_ray.pipelines.hyperball import neighborhood_function

    src, dst, ids = _graph(seed=3, n=60, m=200)
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    df = neighborhood_function(edges, ids, radius=3, approx_edges=len(src)).to_pandas()
    piv = df.pivot(index="id", columns="r", values="n_registers")
    assert (piv.diff(axis=1).iloc[:, 1:] >= 0).all().all()
    r0 = df[df["r"] == 0]
    assert (r0["n_registers"] == 1).all()
    # linear-counting regime at a single element: m*ln(m/(m-1)) ≈ 1.0
    assert (r0["approx"] == 1.0).all()


def test_harmonic_centrality_readout(ray_session):
    """harmonic_centrality == per-vertex Σ_r (approx_r − approx_{r−1})/r
    computed independently from the nf table, with the summation replayed
    in the same ascending-r order (bit-exact, not just allclose)."""
    from ugfraud_ray.pipelines.hyperball import (
        harmonic_centrality,
        neighborhood_function,
    )

    src, dst, ids = _graph(seed=11, n=80, m=300)
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    nf = neighborhood_function(edges, ids, radius=3, approx_edges=len(src))
    got = harmonic_centrality(nf).to_pandas().set_index("id")["harmonic"]
    piv = nf.to_pandas().pivot(index="id", columns="r", values="approx")
    want = np.zeros(len(piv))
    for r in range(1, 4):
        want = want + (piv[r].to_numpy() - piv[r - 1].to_numpy()) / float(r)
    assert list(got.index) == list(piv.index)
    assert (got.to_numpy() == want).all()
    # sanity: all non-negative, isolated-ish vertices can be 0
    assert (got.to_numpy() >= -1e-12).all()


def test_distance_readouts(ray_session):
    """distance_distribution totals equal column sums of the pivoted
    approx matrix on the 0.01 grid; effective diameter is the
    interpolated 0.9-crossing of those totals; closeness matches an
    independent per-vertex replay with the same association order."""
    from ugfraud_ray.pipelines.hyperball import (
        closeness_centrality,
        distance_distribution,
        effective_diameter,
        neighborhood_function,
    )

    src, dst, ids = _graph(seed=5, n=70, m=260)
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    nf = neighborhood_function(edges, ids, radius=3, approx_edges=len(src))
    piv = nf.to_pandas().pivot(index="id", columns="r", values="approx")

    dist = distance_distribution(nf).to_pandas()
    assert list(dist["r"]) == [0, 1, 2, 3]
    want_tot = [
        float(np.floor(piv[r].to_numpy() * 100.0 + 0.5).astype(np.int64).sum()) / 100.0
        for r in range(4)
    ]
    assert list(dist["n_pairs"]) == want_tot
    assert dist["n_pairs"].is_monotonic_increasing

    ed = effective_diameter(nf, alpha=0.9).to_pandas()
    t = dist["n_pairs"].to_numpy()
    target = 0.9 * t[-1]
    d = ed["effective_diameter"].iloc[0]
    assert 0.0 <= d <= 3.0
    if d > 0:
        r = int(np.ceil(d)) if d != int(d) else int(d)
        r = max(r, 1)
        assert t[r - 1] < target <= t[r]
        assert d == float(r - 1) + (target - t[r - 1]) / (t[r] - t[r - 1])

    cl = closeness_centrality(nf).to_pandas().set_index("id")["closeness"]
    s = np.zeros(len(piv))
    for r in range(1, 4):
        s = s + (piv[r].to_numpy() - piv[r - 1].to_numpy()) * float(r)
    reach = piv[3].to_numpy() - 1.0
    want = np.where(s > 0.0, reach / np.where(s > 0.0, s, 1.0), 0.0)
    assert (cl.to_numpy() == want).all()
    assert (cl.to_numpy() >= 0.0).all()
