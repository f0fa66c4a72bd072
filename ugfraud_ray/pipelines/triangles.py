"""Exact triangle counting (north-rule kernel; no reference analog —
SURVEY §2.12 "the one genuinely new shuffle-heavy kernel").

Edge-iterator algorithm with degree orientation:

1. undirected-dedup edges, drop self-loops (canonical (lo, hi) form)
2. degree table (A1); orient each edge from the lower-(degree, vid)
   endpoint to the higher one — every vertex's out-adjacency is then
   O(sqrt(m)) even for hubs (the classic skew bound)
3. wedges: groupby(oriented src) -> emit candidate pairs (b, c) for each
   pair of out-neighbors (vectorized np.triu per group)
4. count wedges whose closing edge (b, c) exists: groupby the pair key
   over tagged union of wedges and edges.

Two shuffles total: the wedge groupby and the closing-edge groupby.
Per-group work is numpy; the degree orientation bounds the largest
group's pair blowup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ugfraud_ray.functions.collect import collect_table
import ray.data
from ray.data.aggregate import Count


def _canonical_edges(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        m = s != d
        s, d = s[m], d[m]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        return pa.table({"a": pa.array(lo), "b": pa.array(hi)})

    e = edges.map_batches(canon, batch_format="pyarrow")
    from ugfraud_ray.stages.graph_build import dedup_pairs

    return dedup_pairs(e, a="a", b="b")


def triangle_count(edges: "ray.data.Dataset", P: int = 8) -> int:
    """Exact global triangle count of the undirected simple graph."""
    e = _canonical_edges(edges).materialize()

    # degree of each endpoint (on the deduped simple graph)
    deg_ds = (
        e.select_columns(["a"]).rename_columns({"a": "v"})
        .union(e.select_columns(["b"]).rename_columns({"b": "v"}))
        .groupby("v")
        .aggregate(Count(alias_name="deg"))
    )
    dt = collect_table(deg_ds)
    deg_ref = ray.put(dict(zip(dt["v"].to_pylist(), dt["deg"].to_pylist())))

    def orient(t: pa.Table) -> pa.Table:
        dg = ray.get(deg_ref)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        da = np.array([dg[int(v)] for v in a])
        db = np.array([dg[int(v)] for v in b])
        # orient from lower (deg, vid) to higher
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        return pa.table({"u": pa.array(src), "w": pa.array(dst)})

    oriented = e.map_batches(orient, batch_format="pyarrow")

    def wedges(g: pd.DataFrame) -> pa.Table:
        nb = np.sort(g["w"].to_numpy())
        if len(nb) < 2:
            return pa.table({"x": pa.array([], pa.int64()), "y": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.int8())})
        i, j = np.triu_indices(len(nb), k=1)
        return pa.table({"x": pa.array(nb[i]), "y": pa.array(nb[j]),
                         "kind": pa.array(np.zeros(len(i), np.int8))})

    wedge_ds = oriented.groupby("u").map_groups(wedges, batch_format="pandas")

    def edge_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {"x": t["a"], "y": t["b"], "kind": pa.array(np.ones(n, np.int8))}
        )

    tagged_edges = e.map_batches(edge_rows, batch_format="pyarrow")

    # per (x,y): wedge count = #kind-0 rows, closing edge present = max(kind);
    # triangles = Σ wedges where an edge closes the pair. Pure hash
    # aggregates — no per-group Python (the pair-key group count is huge).
    from ray.data.aggregate import Max, Sum

    def wedge_flag(t: pa.Table) -> pa.Table:
        kind = t["kind"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "x": t["x"],
                "y": t["y"],
                "w": pa.array((kind == 0).astype(np.int64)),
                "kind": t["kind"],
            }
        )

    tagged = wedge_ds.union(tagged_edges).map_batches(wedge_flag, batch_format="pyarrow")
    closed = tagged.groupby(["x", "y"]).aggregate(
        Sum("w", alias_name="n_wedges"), Max("kind", alias_name="has_edge")
    )

    def tri(t: pa.Table) -> pa.Table:
        n = t["n_wedges"].to_numpy(zero_copy_only=False)
        he = t["has_edge"].to_numpy(zero_copy_only=False)
        return pa.table({"t": pa.array([int(n[he == 1].sum())], pa.int64())})

    total = closed.map_batches(tri, batch_format="pyarrow").aggregate(
        Sum("t", alias_name="total")
    )
    return int(total["total"])
