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


def test_hyperball_local_vs_distributed(ray_session):
    """The Ray-blocked union path produces the identical table to the
    local-numpy path (max-union is order-free), whatever the blocking."""
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
        approx_edges=None,  # force the distributed block-union path
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
