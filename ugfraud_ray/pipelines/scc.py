"""Strongly connected components (directed) via FW-BW coloring rounds.

No reference analog (UGFraud's review graph is bipartite-undirected;
SURVEY §2.12 covers the undirected hash-min CC) — SCC is the directed
completion of that family, the standard web-link-graph structure pass
(link farms are dense SCCs).

Algorithm (Orzan/FW-BW coloring, partition-parallel):

  round:
    1. color(v) := v for unassigned v; propagate color FORWARD to
       fixpoint with a min combine (same kernel shape as hash-min CC).
    2. mark roots (color(v) == v); propagate marks BACKWARD to fixpoint:
       v becomes marked when some out-neighbor w is marked with
       color(w) == color(v). Because color only decreases along forward
       edges, every marked out-neighbor has color <= color(v), so a MAX
       combine over (marked ? color : -inf) equals color(v) iff a
       same-color marked out-neighbor exists — an exact single-float
       message (no per-dst filtering needed).
    3. marked vertices form complete SCCs: scc(v) := color(v); remove.

Each round assigns at least every color-class root, so rounds are
bounded by the longest chain of distinct SCCs (small for web graphs).
The two phases run on TWO SuperstepEngines over the same vid % P
partitioning — a forward layout and a reversed layout — so state
blocks transfer shard-to-shard via `set_state` with no driver copy of
the data path beyond the per-round reset/readout (O(V) driver state,
the same footprint as the engine's degree broadcasts).

Small graphs run the identical algorithm driver-local in numpy.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.functions.collect import collect_table
from ugfraud_ray.state.engine import SuperstepEngine, VertexProgram
from ugfraud_ray.state.layout import build_layout

_INF = np.float64(1e18)


def _scc_local(src: np.ndarray, dst: np.ndarray, n: int) -> np.ndarray:
    """Exact SCC ids (min member vid) via the same coloring rounds."""
    scc = np.full(n, -1, dtype=np.int64)
    for _ in range(n + 1):
        un = scc < 0
        if not un.any():
            break
        live = un[src] & un[dst]
        es, ed = src[live], dst[live]
        color = np.where(un, np.arange(n, dtype=np.int64), np.iinfo(np.int64).max)
        while True:
            old = color.copy()
            np.minimum.at(color, ed, color[es])
            if (color == old).all():
                break
        mark = un & (color == np.arange(n))
        while True:
            old = mark.copy()
            cand = mark[ed] & (color[es] == color[ed])
            np.logical_or.at(mark, es[cand], True)
            if (mark == old).all():
                break
        scc[mark] = color[mark]
    return scc


class _ColorForward(VertexProgram):
    """state = [color, mark, scc]; forward min-propagation of color
    among unassigned vertices (assigned vertices send +inf)."""

    state_dim = 3
    combine = "min"

    def __init__(self, init_ref=None):
        self._init_ref = init_ref

    def init_state(self, vids, shard):
        if self._init_ref is not None:
            return ray.get(self._init_ref)[shard.p]
        s = np.zeros((len(vids), 3))
        s[:, 0] = vids
        s[:, 2] = -1.0
        return s

    def message(self, src_state, edge_data, shard):
        out = np.full((len(src_state), 3), _INF)
        unassigned = src_state[:, 2] < 0
        out[unassigned, 0] = src_state[unassigned, 0]
        return out

    def apply(self, vids, old, agg, have_msg, aux, shard):
        new = old.copy()
        un = old[:, 2] < 0
        take = un & have_msg & (agg[:, 0] < old[:, 0])
        new[take, 0] = agg[take, 0]
        return new, {"delta": float(take.sum())}


class _MarkBackward(VertexProgram):
    """Runs on the REVERSED layout: a reversed edge w->v carries w's
    (marked ? color : -inf); max-combine == color(v) iff some forward
    out-neighbor is marked with v's color."""

    state_dim = 3
    combine = "max"

    def __init__(self, init_ref=None):
        self._init_ref = init_ref

    def init_state(self, vids, shard):
        if self._init_ref is not None:
            return ray.get(self._init_ref)[shard.p]
        s = np.zeros((len(vids), 3))
        s[:, 2] = -1.0
        return s

    def message(self, src_state, edge_data, shard):
        out = np.full((len(src_state), 3), -_INF)
        marked = (src_state[:, 1] > 0) & (src_state[:, 2] < 0)
        out[marked, 0] = src_state[marked, 0]
        return out

    def apply(self, vids, old, agg, have_msg, aux, shard):
        new = old.copy()
        un = old[:, 2] < 0
        take = un & (old[:, 1] == 0) & have_msg & (agg[:, 0] == old[:, 0])
        new[take, 1] = 1.0
        return new, {"delta": float(take.sum())}


def strongly_connected_components(
    edges: "ray.data.Dataset",
    n_vertices: int,
    layout_dir: str,
    P: int = 4,
    max_rounds: int = 100,
    max_iters: int = 200,
    local_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Dataset(vid, scc:int64) — scc id = min vid of the component.
    Exact (north-rule exact-match family)."""
    e = edges.select_columns(["src", "dst"]).materialize()
    ne = e.count()
    if ne <= local_threshold:
        t = collect_table(e)
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        scc = _scc_local(src, dst, n_vertices)
        return ray.data.from_arrow(
            pa.table(
                {
                    "vid": pa.array(np.arange(n_vertices, dtype=np.int64)),
                    "scc": pa.array(scc),
                }
            )
        )

    rev = e.map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"]}),
        batch_format="pyarrow",
    )
    fwd_layout = build_layout(e, n_vertices, os.path.join(layout_dir, "fwd"), P=P)
    bwd_layout = build_layout(rev, n_vertices, os.path.join(layout_dir, "bwd"), P=P)
    eng_f = SuperstepEngine(fwd_layout, _ColorForward())
    eng_b = SuperstepEngine(bwd_layout, _MarkBackward())

    def fetch(eng) -> list[np.ndarray]:
        # copy: object-store arrays arrive read-only and the round
        # reset/assign steps mutate them driver-side
        return [b.copy() for b in ray.get([s.get_state.remote() for s in eng.shards])]

    def put(eng, blocks: list[np.ndarray]) -> None:
        ray.get(
            [s.set_state.remote(b) for s, b in zip(eng.shards, blocks)]
        )

    blocks = fetch(eng_f)  # initial: color=vid, mark=0, scc=-1
    for _ in range(max_rounds):
        remaining = sum(int((b[:, 2] < 0).sum()) for b in blocks)
        if remaining == 0:
            break
        # round reset: color=vid (unassigned) / +inf (assigned), mark=roots later
        for b, shard_p in zip(blocks, range(P)):
            un = b[:, 2] < 0
            vids = np.arange(shard_p, n_vertices, P, dtype=np.int64)
            b[:, 0] = np.where(un, vids.astype(np.float64), _INF)
            b[:, 1] = 0.0
        put(eng_f, blocks)
        eng_f.run(max_iters=max_iters, tol=0.0)
        blocks = fetch(eng_f)
        # mark roots among unassigned
        for b, shard_p in zip(blocks, range(P)):
            vids = np.arange(shard_p, n_vertices, P, dtype=np.float64)
            b[:, 1] = ((b[:, 2] < 0) & (b[:, 0] == vids)).astype(np.float64)
        put(eng_b, blocks)
        eng_b.run(max_iters=max_iters, tol=0.0)
        blocks = fetch(eng_b)
        # assign marked
        for b in blocks:
            done = (b[:, 2] < 0) & (b[:, 1] > 0)
            b[done, 2] = b[done, 0]

    eng_f.shutdown()
    eng_b.shutdown()
    remaining = sum(int((b[:, 2] < 0).sum()) for b in blocks)
    if remaining:
        # FW-BW coloring retires >=1 SCC per round; a directed chain of
        # more than max_rounds SCCs exhausts the loop with unassigned
        # vertices. Fail loudly instead of returning silent -1 labels
        # (the local path is n-bounded and never truncates).
        raise RuntimeError(
            f"SCC FW-BW coloring did not converge within max_rounds="
            f"{max_rounds}: {remaining} vertices unassigned — raise "
            "max_rounds (bounded by the number of SCCs on the longest "
            "directed chain)"
        )
    out_vid = np.concatenate(
        [np.arange(p, n_vertices, P, dtype=np.int64) for p in range(P)]
    )
    out_scc = np.concatenate([b[:, 2].astype(np.int64) for b in blocks])
    order = np.argsort(out_vid)
    return ray.data.from_arrow(
        pa.table({"vid": pa.array(out_vid[order]), "scc": pa.array(out_scc[order])})
    )


def bowtie_decomposition(
    edges: "ray.data.Dataset",
    n_vertices: int,
    layout_dir: str,
    P: int = 4,
    local_threshold: int = 2_000_000,
    max_bfs_iters: int = 256,
) -> "ray.data.Dataset":
    """Broder bow-tie decomposition of a directed web graph (Broder et
    al. 2000, "Graph structure in the Web"): Dataset(vid, cls) with
    cls in {'core', 'in', 'out', 'other'} — CORE is the LARGEST SCC
    (ties to the smallest scc id), OUT is forward-reachable from the
    core, IN reaches the core, OTHER is tendrils + disconnected mass.

    Composition of engine passes: SCC (FW-BW coloring), then TWO
    multi-source directed BFS sweeps (forward layout and reversed
    layout) seeded with the core members, then ONE flag-OR classify
    pass: the three (vid, flag-bit) streams union into a vid-bucketed
    groupby — no per-vertex driver array in the classify step. The
    core-seed vid list ships once to the P shard actors via ``ray.put``
    (the engine's documented O(core) broadcast footprint, same as its
    degree tables). Top-1 SCC selection is per-block partials + a tiny
    driver merge — no global sort.
    """
    from ray.data.aggregate import Count
    from ugfraud_ray.functions.bucketing import n_coarse_buckets
    from ugfraud_ray.pipelines.bfs import bfs_hops

    comp = strongly_connected_components(
        edges, n_vertices, os.path.join(layout_dir, "scc"), P=P,
        local_threshold=local_threshold,
    ).materialize()
    sizes = comp.groupby("scc").aggregate(Count(alias_name="c"))

    def top1(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["scc"].to_numpy(zero_copy_only=False).astype(np.int64)
        best = np.lexsort((s, -c))[0]
        return pa.table({"scc": pa.array(s[best : best + 1]), "c": pa.array(c[best : best + 1])})

    cand = collect_table(sizes.map_batches(top1, batch_format="pyarrow"))
    cs = cand["scc"].to_numpy(zero_copy_only=False)
    cc = cand["c"].to_numpy(zero_copy_only=False)
    core_id = int(cs[np.lexsort((cs, -cc))[0]])

    core_members = collect_table(
        comp.filter(expr=f"scc == {core_id}").select_columns(["vid"])
    )["vid"].to_numpy(zero_copy_only=False).astype(np.int64)

    def _reach(e, tag):
        out, metrics = bfs_hops(
            e, n_vertices, core_members, os.path.join(layout_dir, tag),
            P=P, max_iters=max_bfs_iters, directed=True,
        )
        if metrics and metrics[-1].get("delta", 0.0) > 0.0:
            # the frontier was still advancing at the cap: classifying
            # now would silently mislabel >max_bfs_iters-hop vertices
            raise RuntimeError(
                f"bowtie_decomposition: {tag} reachability BFS did not "
                f"converge within max_bfs_iters={max_bfs_iters} — raise it "
                "(bounded by the graph's directed eccentricity from the core)"
            )
        return out

    fwd = _reach(edges, "fwd")
    rev = edges.select_columns(["src", "dst"]).map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"]}),
        batch_format="pyarrow",
    )
    bwd = _reach(rev, "bwd")

    CORE, FWD, BWD = 4, 2, 1

    def flag_rows(flag: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "vid": t["vid"],
                    "flag": pa.array(np.full(len(t), flag, dtype=np.int64)),
                }
            )

        return f

    core_flags = comp.map_batches(
        lambda t: pa.table(
            {
                "vid": t["vid"],
                "flag": pa.array(
                    np.where(
                        t["scc"].to_numpy(zero_copy_only=False) == core_id, CORE, 0
                    ).astype(np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )
    tagged = core_flags.union(
        fwd.map_batches(flag_rows(FWD), batch_format="pyarrow"),
        bwd.map_batches(flag_rows(BWD), batch_format="pyarrow"),
    )

    from ugfraud_ray.functions.bucketing import bucket_by_int_col

    bucketize = bucket_by_int_col("vid", n_coarse_buckets(n_vertices))

    def classify(g: pa.Table) -> pa.Table:
        v = g["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
        fl = g["flag"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(v, kind="stable")
        v, fl = v[order], fl[order]
        first = np.ones(len(v), dtype=bool)
        first[1:] = v[1:] != v[:-1]
        starts = np.flatnonzero(first)
        agg = np.bitwise_or.reduceat(fl, starts) if len(starts) else fl[:0]
        names = np.array(["other", "in", "out", "out", "core", "core", "core", "core"], dtype=object)
        return pa.table(
            {
                "vid": pa.array(v[starts]),
                "cls": pa.array(names[agg], pa.string()),
            }
        )

    return (
        tagged.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(classify, batch_format="pyarrow")
    )
