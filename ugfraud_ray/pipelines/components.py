"""Connected components via hash-min label propagation supersteps.

Reference analog: SpEagle's BFS `schedule()` discovers components
sequentially (/root/reference Detector/SpEagle.py:354-379); here every
vertex starts labeled with its own vid and repeatedly takes the min of
its neighbors' labels (combine='min') until no label changes — the
classic partition-parallel hash-min algorithm. Exact-match criterion
(north rule): labels are component representatives (min vid).

The input edge table is symmetrized by the caller/driver function so
undirected semantics hold.
"""

from __future__ import annotations

import numpy as np

import ray.data

from ugfraud_ray.state.engine import SuperstepEngine, VertexProgram
from ugfraud_ray.state.layout import build_layout, symmetrize


class HashMinProgram(VertexProgram):
    state_dim = 1
    combine = "min"

    def init_state(self, vids, shard):
        return vids.astype(np.float64)[:, None]

    def message(self, src_state, edge_data, shard):
        return src_state[:, 0]

    def apply(self, vids, old, agg, have_msg, aux, shard):
        new = np.where(have_msg, np.minimum(old[:, 0], agg[:, 0]), old[:, 0])
        return new, {"delta": float((new != old[:, 0]).sum())}


def connected_components(
    edges: "ray.data.Dataset",
    n_vertices: int,
    layout_dir: str,
    P: int = 4,
    max_iters: int = 100,
    hub_threshold: int | None = None,
    ckpt_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = False,
) -> tuple["ray.data.Dataset", list[dict]]:
    """Returns (Dataset(vid, component:int64), metrics). Exact labels."""
    sym = symmetrize(edges.select_columns(["src", "dst"]))
    # small materialized inputs: materialize sym so build_layout's
    # driver-local write path applies (count is free only then)
    import ray.data as _rd

    if isinstance(edges, _rd.dataset.MaterializedDataset) and edges.count() * 2 <= 1_000_000:
        sym = sym.materialize()
    layout = build_layout(sym, n_vertices, layout_dir, P=P, hub_threshold=hub_threshold)
    eng = SuperstepEngine(layout, HashMinProgram(), ckpt_dir=ckpt_dir, checkpoint_every=checkpoint_every)
    eng.run(max_iters=max_iters, tol=0.0, resume=resume)

    import pyarrow as pa

    def to_int(t: pa.Table) -> pa.Table:
        comp = t["s0"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"vid": t["vid"], "component": pa.array(comp)})

    out = eng.result_dataset().map_batches(to_int, batch_format="pyarrow").materialize()
    eng.shutdown()
    return out, eng.metrics


def component_sizes(
    edges: "ray.data.Dataset",
    n_vertices: int,
    layout_dir: str,
    P: int = 4,
) -> "ray.data.Dataset":
    """(component, n_vertices, n_edges) per connected component: the CC
    labels joined back onto the UNDIRECTED SIMPLE edge set (self-loops
    dropped, (lo,hi)-deduped — both endpoints share a label so either
    endpoint keys the count). Labels are broadcast once (ray.put) and
    probed per batch — the per-vertex label table is the small side of
    this join by construction."""
    import pyarrow as pa

    from ugfraud_ray.functions.collect import collect_table

    comp_ds, _ = connected_components(edges, n_vertices, layout_dir, P=P)
    ct = collect_table(comp_ds)
    labels = np.zeros(n_vertices, dtype=np.int64)
    labels[ct["vid"].to_numpy(zero_copy_only=False)] = ct["component"].to_numpy(
        zero_copy_only=False
    )
    lab_ref = ray.put(labels)

    from ugfraud_ray.pipelines.triangles import _canonical_edges

    try:
        hint = edges.count()
    except Exception:
        hint = None
    e = _canonical_edges(edges.select_columns(["src", "dst"]), approx_rows=hint)

    def partial(t: pa.Table) -> pa.Table:
        lab = ray.get(lab_ref)
        c = lab[t["a"].to_numpy(zero_copy_only=False)]
        u, n = np.unique(c, return_counts=True)
        return pa.table({"component": pa.array(u), "ne": pa.array(n.astype(np.int64))})

    from ray.data.aggregate import Sum

    ecounts = (
        e.map_batches(partial, batch_format="pyarrow")
        .groupby("component")
        .aggregate(Sum("ne", alias_name="n_edges"))
    )
    et = collect_table(ecounts)
    ne_of = dict(
        zip(
            et["component"].to_numpy(zero_copy_only=False).tolist(),
            et["n_edges"].to_numpy(zero_copy_only=False).tolist(),
        )
    )
    comps = np.unique(labels)
    nv = np.bincount(labels)[comps]
    return ray.data.from_arrow(
        pa.table(
            {
                "component": pa.array(comps.astype(np.int64)),
                "n_vertices": pa.array(nv.astype(np.int64)),
                "n_edges": pa.array(
                    np.array([ne_of.get(int(c), 0) for c in comps], dtype=np.int64)
                ),
            }
        )
    )
