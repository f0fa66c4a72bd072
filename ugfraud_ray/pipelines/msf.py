"""Minimum spanning forest via distributed Borůvka rounds.

No reference analog (a §2.12-style standard kernel); in a web corpus
the MSF over inverse-similarity weights is the classic single-linkage
clustering / backbone-extraction primitive. Genuinely non-SQL (each
round needs a component contraction — nested recursion), so the driver
query is rows-only and correctness is guarded by an exact Kruskal
oracle test (unique weights ⇒ the MSF edge set is unique).

Semantics:
- canonical undirected simple graph; per-edge weight defaults to a
  deterministic splitmix-style uint64 hash of the canonical pair
  (unique w.h.p., so the forest is unique and order-independent);
- round: every component picks its minimum-weight outgoing edge
  (ties impossible with unique weights); picked edges join the forest;
  components contract (driver-side union-find over picked edges —
  ≤ n−1 unions TOTAL across all rounds); O(log n) rounds.

Scale shape, two paths (identical forest by uniqueness of weights,
parity-tested):

- ≤ ``local_threshold`` edges: collected edges, driver union-find (the
  usual shuffle-spin-up gate; the forest output is edge-sized anyway).
- above it: textbook distributed Borůvka with NO driver per-vertex
  state and NO union-find. Labels live as a Dataset(vid, comp); each
  round (a) relabels edges by two hash joins against the label table,
  (b) takes the min-weight edge per component with ONE bucketed
  shuffle (both endpoints emitted; per-bucket lexsort + first-run),
  (c) dedupes mutual picks by canonical pair (unique weights ⇒ the
  picked set is a forest — no cycle check needed), (d) contracts by
  running the in-repo distributed hash-min CC kernel over the picked
  (ca, cb) component graph and composing it into the label table with
  one more join. O(log n) rounds, each a constant number of shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table
from ugfraud_ray.pipelines.kcore import _canonical_undirected


def pair_weights(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic uint64 weight per canonical pair (vectorized mix)."""
    x = a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) ^ b.astype(np.uint64) * np.uint64(
        0xC2B2AE3D27D4EB4F
    )
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _candidates(a, b, w, comp):
    """First-per-component (comp, w, a, b) over cross-component edges,
    both endpoint components considered."""
    ca, cb = comp[a], comp[b]
    cross = ca != cb
    a, b, w, ca, cb = a[cross], b[cross], w[cross], ca[cross], cb[cross]
    if len(a) == 0:
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.uint64),
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int64),
        )
    c = np.concatenate([ca, cb])
    ww = np.concatenate([w, w])
    aa = np.concatenate([a, a])
    bb = np.concatenate([b, b])
    order = np.lexsort((ww, c))
    c, ww, aa, bb = c[order], ww[order], aa[order], bb[order]
    first = np.concatenate([[True], c[1:] != c[:-1]])
    return c[first], ww[first], aa[first], bb[first]


class _UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, x: int, y: int) -> bool:
        rx, ry = self.find(x), self.find(y)
        if rx == ry:
            return False
        self.parent[max(rx, ry)] = min(rx, ry)
        return True


def _msf_distributed(
    und: "ray.data.Dataset",
    n: int,
    max_iters: int,
    wf,
    P: int,
    scratch_dir: str | None,
) -> pa.Table:
    import os
    import tempfile

    import pyarrow.compute as pc

    from ugfraud_ray.functions.bucketing import (
        int_hash_bucket,
        n_coarse_buckets,
        pair_hash_bucket,
    )
    from ugfraud_ray.pipelines.components import connected_components

    scratch = scratch_dir or tempfile.mkdtemp(prefix="msf_")
    edges = und.select_columns(["src", "dst"]).materialize()
    n_edges = edges.count()
    NP = max(4, P)
    labels = ray.data.range(n).map_batches(
        lambda t: pa.table({"vid": t["id"], "comp": t["id"]}),
        batch_format="pyarrow",
    ).materialize()

    nb = n_coarse_buckets(2 * n_edges)

    def emit_candidates(t: pa.Table) -> pa.Table:
        a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        ca = t["ca"].to_numpy(zero_copy_only=False).astype(np.int64)
        cb = t["cb"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = wf(a, b)
        w = np.concatenate([w, w])
        comp = np.concatenate([ca, cb])
        return pa.table(
            {
                "_cb": pa.array(int_hash_bucket(comp, nb)),
                "comp": pa.array(comp),
                "whi": pa.array((w >> np.uint64(32)).astype(np.int64)),
                "wlo": pa.array((w & np.uint64(0xFFFFFFFF)).astype(np.int64)),
                "a": pa.array(np.concatenate([a, a])),
                "b": pa.array(np.concatenate([b, b])),
                "ca": pa.array(np.concatenate([ca, ca])),
                "cb": pa.array(np.concatenate([cb, cb])),
            }
        )

    def min_per_comp(t: pa.Table) -> pa.Table:
        comp = t["comp"].to_numpy(zero_copy_only=False)
        whi = t["whi"].to_numpy(zero_copy_only=False)
        wlo = t["wlo"].to_numpy(zero_copy_only=False)
        order = np.lexsort((wlo, whi, comp))
        first = np.concatenate([[True], comp[order][1:] != comp[order][:-1]])
        keep = order[first]
        return t.take(pa.array(keep)).select(["a", "b", "ca", "cb"])

    def dedupe_pairs(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        aa, bb = a[order], b[order]
        first = np.concatenate([[True], (aa[1:] != aa[:-1]) | (bb[1:] != bb[:-1])])
        return t.take(pa.array(order[first]))

    forest_parts: list[pa.Table] = []
    from ugfraud_ray.functions.collect import collect_table

    for r in range(max_iters):
        live = (
            edges.join(
                labels.rename_columns({"vid": "src", "comp": "ca"}),
                join_type="inner",
                on=("src",),
                num_partitions=NP,
            )
            .join(
                labels.rename_columns({"vid": "dst", "comp": "cb"}),
                join_type="inner",
                on=("dst",),
                num_partitions=NP,
            )
            .filter(expr="ca != cb")
            .materialize()
        )
        if live.count() == 0:
            break
        cand = (
            live.map_batches(emit_candidates, batch_format="pyarrow")
            .groupby("_cb")
            .map_groups(min_per_comp, batch_format="pyarrow")
        )

        def pair_bucket(t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            return t.append_column("_pb", pa.array(pair_hash_bucket(a, b, nb)))

        picked = (
            cand.map_batches(pair_bucket, batch_format="pyarrow")
            .groupby("_pb")
            .map_groups(dedupe_pairs, batch_format="pyarrow")
            .select_columns(["a", "b", "ca", "cb"])
            .materialize()
        )
        if picked.count() == 0:
            break
        forest_parts.append(collect_table(picked.select_columns(["a", "b"])))
        ccl, _ = connected_components(
            picked.select_columns(["ca", "cb"]).rename_columns(
                {"ca": "src", "cb": "dst"}
            ),
            n,
            layout_dir=os.path.join(scratch, f"cc{r}"),
            P=P,
        )
        labels = (
            labels.join(
                ccl.rename_columns({"vid": "comp", "component": "newc"}),
                join_type="inner",
                on=("comp",),
                num_partitions=NP,
            )
            .select_columns(["vid", "newc"])
            .rename_columns({"newc": "comp"})
            .materialize()
        )

    if forest_parts:
        ft = pa.concat_tables(forest_parts)
        a = ft["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = ft["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        a = np.zeros(0, dtype=np.int64)
        b = np.zeros(0, dtype=np.int64)
    w = wf(a, b)
    order = np.lexsort((b, a))
    return pa.table(
        {
            "src": pa.array(a[order]),
            "dst": pa.array(b[order]),
            "weight": pa.array(w[order]),
        }
    )


def minimum_spanning_forest(
    edges: "ray.data.Dataset",
    n_vertices: int,
    max_iters: int = 40,
    approx_edges: int | None = None,
    weight_fn=None,
    local_threshold: int = 5_000_000,
    P: int = 4,
    scratch_dir: str | None = None,
) -> pa.Table:
    """(src, dst, weight) MSF edges (canonical src<dst, sorted), exact
    and unique under deterministic pair weights. weight_fn(a, b) ->
    uint64 array overrides the default splitmix pair hash (it must be a
    pure function of the canonical pair and collision-free on the input,
    or the forest loses uniqueness)."""
    wf = weight_fn or pair_weights
    und = _canonical_undirected(edges, approx_edges)
    # unknown size is treated as LARGE: collecting an unhinted input
    # to the driver is the one unrecoverable choice at scale
    if approx_edges is None or approx_edges > local_threshold:
        return _msf_distributed(und, n_vertices, max_iters, wf, P, scratch_dir)

    comp = np.arange(n_vertices, dtype=np.int64)
    uf = _UnionFind(n_vertices)
    fa: list[np.ndarray] = []
    fb: list[np.ndarray] = []

    t = collect_table(und)
    la = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    lb = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    lw = wf(la, lb)

    for _ in range(max_iters):
        c, w, a, b = _candidates(la, lb, lw, comp)
        if len(c) == 0:
            break
        picked_a, picked_b = [], []
        for x, y in zip(a.tolist(), b.tolist()):
            if uf.union(x, y):
                picked_a.append(x)
                picked_b.append(y)
        if not picked_a:
            break
        fa.append(np.array(picked_a, dtype=np.int64))
        fb.append(np.array(picked_b, dtype=np.int64))
        # contract: relabel every vertex to its component root (two-step
        # vectorized pointer chase — roots are fixpoints of parent)
        p = uf.parent
        while True:
            np2 = p[p]
            if (np2 == p).all():
                break
            p = np2
        uf.parent = p
        comp = p[comp]

    if fa:
        a = np.concatenate(fa)
        b = np.concatenate(fb)
    else:
        a = np.zeros(0, dtype=np.int64)
        b = np.zeros(0, dtype=np.int64)
    w = wf(a, b)
    order = np.lexsort((b, a))
    return pa.table(
        {
            "src": pa.array(a[order]),
            "dst": pa.array(b[order]),
            "weight": pa.array(w[order]),
        }
    )
