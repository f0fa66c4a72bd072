"""PageRank as a superstep vertex program.

Reference analog: GANG's `pu_lbp` is literally the same SpMV power
iteration `x <- p + c A x` (/root/reference Detector/GANG.py:114-137;
SURVEY §2.12). Standard damped PageRank with dangling-mass
redistribution:

    x'_v = (1-d)/N + d * Σ_{u→v} x_u / outdeg(u) + d * dangling_sum / N

- per-edge weight `w = 1/outdeg(src)` attached at graph-build time
  (grouped count + broadcast lookup — never recomputed per superstep)
- dangling_sum is a per-shard partial reduced by the driver (the engine's
  stats channel), fed back as `aux` next superstep
- delta = Σ|x'-x| L1; converged when <= tol.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count

from ugfraud_ray.state.engine import SuperstepEngine, VertexProgram
from ugfraud_ray.state.layout import GraphLayout, build_layout


class PageRankProgram(VertexProgram):
    state_dim = 1
    combine = "sum"
    edge_cols = ("w",)

    def __init__(self, damping: float = 0.85):
        self.d = damping

    def init_state(self, vids, shard):
        n = shard.N
        return np.full((len(vids), 1), 1.0 / n)

    def init_stats(self, vids, state, shard):
        dangling = shard.vertex_aux("outdeg", 0.0) == 0
        return {"dangling_sum": float(state[dangling, 0].sum())}

    def prepare_edges(self, edge_table: pa.Table, shard):
        return edge_table["w"].to_numpy(zero_copy_only=False).astype(np.float64)

    def message(self, src_state, w, shard):
        return src_state[:, 0] * w

    def apply(self, vids, old, agg, have_msg, aux, shard):
        n = shard.N
        dang = aux.get("dangling_sum", 0.0)
        new = (1.0 - self.d) / n + self.d * agg[:, 0] + self.d * dang / n
        dangling = shard.vertex_aux("outdeg", 0.0) == 0
        return new, {
            "delta": float(np.abs(new - old[:, 0]).sum()),
            "dangling_sum": float(new[dangling].sum()),
        }


def attach_edge_weights(
    edges: "ray.data.Dataset", n_vertices: int
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """edges(src,dst) -> (edges + w=1/outdeg(src), outdeg table).

    Degree via dense bincount partials + tree reduce (A1 — a per-vertex
    hash aggregate degrades at millions of groups), then the dense
    inverse-degree array is broadcast once (ray.put) and applied as a
    vectorized take per batch.
    """
    from ugfraud_ray.stages.graph_build import dense_degrees

    deg = dense_degrees(edges, "src", n_vertices)
    inv = np.zeros(n_vertices, dtype=np.float64)
    nz = deg > 0
    inv[nz] = 1.0 / deg[nz]
    lookup_ref = ray.put(inv)

    def add_w(t: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("w", pa.array(lk[src]))

    nz_ids = np.flatnonzero(nz)
    outdeg_v = ray.data.from_arrow(
        pa.table({"vid": pa.array(nz_ids), "outdeg": pa.array(deg[nz].astype(np.float64))})
    )
    return edges.map_batches(add_w, batch_format="pyarrow"), outdeg_v


def pagerank(
    edges: "ray.data.Dataset",
    n_vertices: int,
    layout_dir: str,
    P: int = 4,
    damping: float = 0.85,
    max_iters: int = 50,
    tol: float = 1e-9,
    hub_threshold: int | None = None,
    ckpt_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = False,
) -> tuple["ray.data.Dataset", list[dict]]:
    """Run PageRank; returns (Dataset(vid, rank), per-superstep metrics)."""
    weighted, outdeg_v = attach_edge_weights(edges, n_vertices)
    # small materialized inputs: materialize the weighted edges so
    # build_layout's driver-local write path applies (count is
    # metadata-free only on materialized datasets)
    import ray.data as _rd

    if isinstance(edges, _rd.dataset.MaterializedDataset) and edges.count() <= 1_000_000:
        weighted = weighted.materialize()
    layout = build_layout(
        weighted,
        n_vertices,
        layout_dir,
        P=P,
        hub_threshold=hub_threshold,
        edge_cols=["w"],
        vertex_aux=outdeg_v,
    )
    return pagerank_on_layout(
        layout, damping=damping, max_iters=max_iters, tol=tol,
        ckpt_dir=ckpt_dir, checkpoint_every=checkpoint_every, resume=resume,
    )


def pagerank_on_layout(
    layout: GraphLayout,
    damping: float = 0.85,
    max_iters: int = 50,
    tol: float = 1e-9,
    ckpt_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = False,
) -> tuple["ray.data.Dataset", list[dict]]:
    eng = SuperstepEngine(
        layout, PageRankProgram(damping), ckpt_dir=ckpt_dir, checkpoint_every=checkpoint_every
    )
    eng.run(max_iters=max_iters, tol=tol, resume=resume)
    out = eng.result_dataset().rename_columns({"s0": "rank"})
    out = out.materialize()
    eng.shutdown()
    return out, eng.metrics


class PersonalizedPageRankProgram(PageRankProgram):
    """Random walk with restart to a seed set (PPR).

        x'_v = (1-d)·e_v + d · Σ_{u→v} x_u/outdeg(u) + d · dangling_sum · e_v

    where e is uniform over the seeds (teleport AND dangling mass both
    return to the seeds — the standard formulation). The seed set is
    definitionally small (a query's personalization vector), so it ships
    inside the program object to every shard; e is materialized once per
    shard over its owned vids in `init_state`.
    """

    def __init__(self, seeds: np.ndarray, damping: float = 0.85):
        super().__init__(damping)
        self.seeds = np.asarray(seeds, dtype=np.int64)
        if len(self.seeds) == 0:
            raise ValueError("personalized pagerank needs a non-empty seed set")

    def _e(self, vids: np.ndarray) -> np.ndarray:
        e = np.zeros(len(vids), dtype=np.float64)
        e[np.isin(vids, self.seeds)] = 1.0 / len(self.seeds)
        return e

    def init_state(self, vids, shard):
        return self._e(vids)[:, None].copy()

    def apply(self, vids, old, agg, have_msg, aux, shard):
        dang = aux.get("dangling_sum", 0.0)
        e = self._e(vids)
        new = (1.0 - self.d) * e + self.d * agg[:, 0] + self.d * dang * e
        dangling = shard.vertex_aux("outdeg", 0.0) == 0
        return new, {
            "delta": float(np.abs(new - old[:, 0]).sum()),
            "dangling_sum": float(new[dangling].sum()),
        }


def personalized_pagerank(
    edges: "ray.data.Dataset",
    n_vertices: int,
    seeds: np.ndarray,
    layout_dir: str,
    P: int = 4,
    damping: float = 0.85,
    max_iters: int = 50,
    tol: float | None = 1e-9,
    hub_threshold: int | None = None,
) -> tuple["ray.data.Dataset", list[dict]]:
    """Run PPR from `seeds`; returns (Dataset(vid, rank), metrics)."""
    weighted, outdeg_v = attach_edge_weights(edges, n_vertices)
    import ray.data as _rd

    if isinstance(edges, _rd.dataset.MaterializedDataset) and edges.count() <= 1_000_000:
        weighted = weighted.materialize()
    layout = build_layout(
        weighted, n_vertices, layout_dir, P=P, hub_threshold=hub_threshold,
        edge_cols=["w"], vertex_aux=outdeg_v,
    )
    eng = SuperstepEngine(layout, PersonalizedPageRankProgram(seeds, damping))
    eng.run(max_iters=max_iters, tol=tol)
    out = eng.result_dataset().rename_columns({"s0": "rank"}).materialize()
    eng.shutdown()
    return out, eng.metrics


def spam_mass(
    pr: "ray.data.Dataset",
    tr: "ray.data.Dataset",
    n_vertices: int,
) -> "ray.data.Dataset":
    """TrustRank spam mass (Gyongyi et al. 2004, "Combating Web Spam
    with TrustRank" §5): given global PageRank ``pr`` and seeded
    personalized/TrustRank ``tr`` — both Dataset(vid, rank) over the
    same vertex set — emit (vid, pr, tr, spam_mass) where
    spam_mass = (pr - tr) / pr, the fraction of a page's rank that does
    NOT flow from the trusted seeds. High spam mass + high pr = the
    classic link-spam candidate.

    Both inputs are rounded to the repo's 9-decimal grid BEFORE the
    ratio (their individually-verified values), so the division runs on
    identical doubles on the engine and oracle sides. The combine is
    ONE vid-bucketed union groupby — no driver-side vertex array.
    """
    import pyarrow.compute as _pc

    from ugfraud_ray.functions.bucketing import n_coarse_buckets

    def tag(which: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "vid": t["vid"],
                    "rank": _pc.round(t["rank"], ndigits=9),
                    "which": pa.array(np.full(len(t), which, dtype=np.int64)),
                }
            )

        return f

    tagged = pr.map_batches(tag(0), batch_format="pyarrow").union(
        tr.map_batches(tag(1), batch_format="pyarrow")
    )
    from ugfraud_ray.functions.bucketing import bucket_by_int_col

    bucketize = bucket_by_int_col("vid", n_coarse_buckets(n_vertices))

    def combine(g: pa.Table) -> pa.Table:
        v = g["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = g["rank"].to_numpy(zero_copy_only=False)
        w = g["which"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, v))
        v, r, w = v[order], r[order], w[order]
        # exactly two rows per vid (w=0 then w=1)
        if len(v) % 2 or not ((v[::2] == v[1::2]).all() and (w[::2] == 0).all()):
            raise ValueError("spam_mass: inputs do not cover the same vertex set")
        prv, trv = r[::2], r[1::2]
        sm = np.round((prv - trv) / prv, 9)
        return pa.table(
            {
                "vid": pa.array(v[::2]),
                "pr": pa.array(prv),
                "tr": pa.array(trv),
                "spam_mass": pa.array(sm),
            }
        )

    return (
        tagged.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(combine, batch_format="pyarrow")
    )


class WarmPageRankProgram(PageRankProgram):
    """PageRank warm-started from a prior rank vector (the incremental
    rank-maintenance pattern: re-rank a grown crawl from last month's
    converged ranks instead of uniform — far fewer supersteps to the
    same tolerance). Initial state comes from the layout's static
    vertex-aux channel (column ``r0``); vertices unseen by the prior
    run fall back to uniform 1/N."""

    def init_state(self, vids, shard):
        r0 = shard.vertex_aux("r0", 1.0 / shard.N)
        return r0[:, None].copy()


def _merge_vertex_aux(
    outdeg_v: "ray.data.Dataset", init_ranks: "ray.data.Dataset", n_vertices: int
) -> "ray.data.Dataset":
    """(vid, outdeg, r0) — outer-union of the nonzero-outdeg table and
    the full prior-rank vector via ONE vid-bucketed combine (absent
    cells fill 0; every vid appears in init_ranks so r0 is total)."""
    from ugfraud_ray.functions.bucketing import bucket_by_int_col, n_coarse_buckets

    def tag_deg(t: pa.Table) -> pa.Table:
        z = np.zeros(t.num_rows, dtype=np.float64)
        return pa.table(
            {"vid": t["vid"], "outdeg": t["outdeg"], "r0": pa.array(z)}
        )

    def tag_rank(t: pa.Table) -> pa.Table:
        z = np.zeros(t.num_rows, dtype=np.float64)
        return pa.table(
            {"vid": t["vid"], "outdeg": pa.array(z), "r0": t["rank"]}
        )

    tagged = outdeg_v.map_batches(tag_deg, batch_format="pyarrow").union(
        init_ranks.map_batches(tag_rank, batch_format="pyarrow")
    )
    bucketize = bucket_by_int_col("vid", n_coarse_buckets(n_vertices))

    def combine(g: pa.Table) -> pa.Table:
        v = g["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = g["outdeg"].to_numpy(zero_copy_only=False)
        r = g["r0"].to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, d, r = v[order], d[order], r[order]
        starts = np.flatnonzero(np.concatenate([[True], v[1:] != v[:-1]]))
        return pa.table(
            {
                "vid": pa.array(v[starts]),
                "outdeg": pa.array(np.add.reduceat(d, starts)),
                "r0": pa.array(np.add.reduceat(r, starts)),
            }
        )

    return (
        tagged.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(combine, batch_format="pyarrow")
    )


def pagerank_warm(
    edges: "ray.data.Dataset",
    n_vertices: int,
    layout_dir: str,
    init_ranks: "ray.data.Dataset",
    P: int = 4,
    damping: float = 0.85,
    max_iters: int = 5,
    tol: float | None = None,
    hub_threshold: int | None = None,
) -> tuple["ray.data.Dataset", list[dict]]:
    """Incremental PageRank: continue the power iteration on (grown)
    ``edges`` from ``init_ranks`` (Dataset(vid, rank) over the same vid
    domain). Same program arithmetic as :func:`pagerank`, different
    initial state only — so a warm run on an unchanged graph is
    bit-identical to the corresponding cold supersteps."""
    weighted, outdeg_v = attach_edge_weights(edges, n_vertices)
    import ray.data as _rd

    if isinstance(edges, _rd.dataset.MaterializedDataset) and edges.count() <= 1_000_000:
        weighted = weighted.materialize()
    aux = _merge_vertex_aux(outdeg_v, init_ranks, n_vertices).materialize()
    layout = build_layout(
        weighted, n_vertices, layout_dir, P=P, hub_threshold=hub_threshold,
        edge_cols=["w"], vertex_aux=aux,
    )
    eng = SuperstepEngine(layout, WarmPageRankProgram(damping))
    eng.run(max_iters=max_iters, tol=tol)
    out = eng.result_dataset().rename_columns({"s0": "rank"}).materialize()
    eng.shutdown()
    return out, eng.metrics
