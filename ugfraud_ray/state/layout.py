"""Partitioned on-disk graph layout for the superstep engine.

The pair (edge table, vertex table) IS the graph (SURVEY §1.2). For the
iterative kernels we pin ONE partitioning and reuse it across stages
(north-rule "pick one partitioning key"): vertex `vid` is assigned to
partition ``vid % P``; edges live with their *destination*'s partition
(gather-side locality: every aggregate-to-dst is partition-local, no
cross-partition combine), except edges pointing at *hub* vertices
(in-degree > hub_threshold), which are spread by ``src % P`` and
combined in a second, tiny reduce round (degree-aware skew splitting;
SURVEY §4 "hub splitting", reference has none).

Everything is written as Parquet partitioned by `part` so (a) shard
actors read only their own files, (b) a rerun reuses the layout, and
(c) the layout doubles as the graph checkpoint. The manifest records P,
n_vertices and the hub list so resume is stable.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data
from ray.data.aggregate import Count


@dataclass
class GraphLayout:
    path: str
    P: int
    n_vertices: int
    hub_vids: list = field(default_factory=list)
    directed: bool = True

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.path, "manifest.json")

    def save(self) -> None:
        with open(self.manifest_path, "w") as f:
            json.dump(
                {
                    "P": self.P,
                    "n_vertices": self.n_vertices,
                    "hub_vids": list(map(int, self.hub_vids)),
                    "directed": self.directed,
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "GraphLayout":
        with open(os.path.join(path, "manifest.json")) as f:
            m = json.load(f)
        return cls(path=path, P=m["P"], n_vertices=m["n_vertices"], hub_vids=m["hub_vids"], directed=m["directed"])

    def part_sizes(self) -> list[int]:
        return [len(range(p, self.n_vertices, self.P)) for p in range(self.P)]


def symmetrize(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Directed edge table -> both directions (for undirected kernels)."""
    cols = edges.schema().names

    def flip(t: pa.Table) -> pa.Table:
        out = {"src": t["dst"], "dst": t["src"]}
        for c in cols:
            if c not in ("src", "dst"):
                out[c] = t[c]
        return pa.table(out)

    rev = edges.map_batches(flip, batch_format="pyarrow")
    return edges.select_columns(cols).union(rev.select_columns(cols))


def build_layout(
    edges: "ray.data.Dataset",
    n_vertices: int,
    path: str,
    P: int = 8,
    hub_threshold: int | None = None,
    directed: bool = True,
    edge_cols: list[str] | None = None,
    vertex_aux: "ray.data.Dataset | None" = None,
) -> GraphLayout:
    """Write the partitioned edge layout and its manifest.

    edges: (src:int64, dst:int64, ...). If hub_threshold is set, dst
    vertices with in-degree above it are routed by src instead (their
    per-shard partial aggregates get a second combine round at runtime).
    """
    os.makedirs(path, exist_ok=True)
    keep = ["src", "dst"] + [c for c in (edge_cols or []) if c not in ("src", "dst")]
    keep = [c for c in keep if c in edges.schema().names]

    # Driver-local layout write for small MATERIALIZED edge tables (count
    # is metadata-free only then — a lazy lineage must never execute
    # twice; checked BEFORE select_columns, which would wrap the dataset
    # lazily): the distributed partitioned write costs ~1-2 s of fixed
    # overhead per call, which dominates small-graph pagerank/cc runs.
    import ray.data as _rd

    if (
        isinstance(edges, _rd.dataset.MaterializedDataset)
        and edges.count() <= 1_000_000
        and (vertex_aux is None or isinstance(vertex_aux, _rd.dataset.MaterializedDataset))
    ):
        from ugfraud_ray.functions.collect import collect_table

        t = collect_table(edges).select(keep)
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        hub_vids_l: list[int] = []
        part = dst % P
        if hub_threshold is not None and len(dst):
            indeg = np.bincount(dst, minlength=n_vertices)
            hub_vids_l = np.flatnonzero(indeg > int(hub_threshold)).tolist()
            if hub_vids_l:
                is_hub = np.isin(dst, np.array(hub_vids_l, dtype=np.int64))
                part = np.where(is_hub, src % P, part)
        order = np.argsort(part, kind="stable")
        bounds = np.concatenate([[0], np.cumsum(np.bincount(part, minlength=P))]).astype(np.int64)
        sorted_t = t.take(pa.array(order))
        for p in range(P):
            d = os.path.join(path, "edges", f"part={p}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                sorted_t.slice(int(bounds[p]), int(bounds[p + 1] - bounds[p])),
                os.path.join(d, "data.parquet"),
            )
        if vertex_aux is not None:
            vt = collect_table(vertex_aux)
            vid = vt["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
            vpart = vid % P
            vorder = np.argsort(vpart, kind="stable")
            vbounds = np.concatenate(
                [[0], np.cumsum(np.bincount(vpart, minlength=P))]
            ).astype(np.int64)
            vsorted = vt.take(pa.array(vorder))
            for p in range(P):
                d = os.path.join(path, "vertex", f"part={p}")
                os.makedirs(d, exist_ok=True)
                pq.write_table(
                    vsorted.slice(int(vbounds[p]), int(vbounds[p + 1] - vbounds[p])),
                    os.path.join(d, "data.parquet"),
                )
        layout = GraphLayout(
            path=path, P=P, n_vertices=n_vertices, hub_vids=hub_vids_l, directed=directed
        )
        layout.save()
        return layout

    edges = edges.select_columns(keep)
    hub_vids: list[int] = []
    if hub_threshold is not None:
        from ugfraud_ray.stages.graph_build import dense_degrees

        indeg = dense_degrees(edges, "dst", n_vertices)
        hub_vids = np.flatnonzero(indeg > int(hub_threshold)).tolist()
    hub_arr = np.array(hub_vids, dtype=np.int64)
    hub_ref = ray.put(hub_arr)  # broadcast once, read per task
    n_hubs = len(hub_vids)
    P_ = P

    def assign(t: pa.Table) -> pa.Table:
        dst = t["dst"].to_numpy(zero_copy_only=False)
        src = t["src"].to_numpy(zero_copy_only=False)
        part = dst % P_
        if n_hubs:
            is_hub = np.isin(dst, ray.get(hub_ref))
            part = np.where(is_hub, src % P_, part)
        return t.append_column("part", pa.array(part.astype(np.int64)))

    with_part = edges.map_batches(assign, batch_format="pyarrow")
    edir = os.path.join(path, "edges")
    with_part.write_parquet(edir, partition_cols=["part"])

    if vertex_aux is not None:
        def vassign(t: pa.Table) -> pa.Table:
            vid = t["vid"].to_numpy(zero_copy_only=False)
            return t.append_column("part", pa.array((vid % P_).astype(np.int64)))

        vertex_aux.map_batches(vassign, batch_format="pyarrow").write_parquet(
            os.path.join(path, "vertex"), partition_cols=["part"]
        )

    layout = GraphLayout(path=path, P=P, n_vertices=n_vertices, hub_vids=hub_vids, directed=directed)
    layout.save()
    return layout


def append_edges(
    layout: GraphLayout,
    new_edges: "ray.data.Dataset",
    n_vertices: int | None = None,
    vertex_aux: "ray.data.Dataset | None" = None,
) -> list[int]:
    """Incremental graph growth (reference `add_new_data`,
    Detector/SpEagle.py:283-323; SURVEY §2.9 I5): append new edge rows
    into the existing partitioned layout and report which partitions
    were touched — the per-partition lineage unit. Engines rebuild ONLY
    the touched shards; untouched partitions keep their files (and any
    checkpoints keyed to them) verbatim.

    New vertices are allowed: pass the grown ``n_vertices`` (vids must
    keep the same ``vid % P`` partitioning). Hub routing is preserved
    for the existing hub list; newly-hot vertices keep normal routing
    until the next full rebuild (documented approximation).
    """
    P_ = layout.P
    hub_arr = np.array(layout.hub_vids, dtype=np.int64)
    hub_ref = ray.put(hub_arr)
    n_hubs = len(hub_arr)

    def assign(t: pa.Table) -> pa.Table:
        dst = t["dst"].to_numpy(zero_copy_only=False)
        src = t["src"].to_numpy(zero_copy_only=False)
        part = dst % P_
        if n_hubs:
            is_hub = np.isin(dst, ray.get(hub_ref))
            part = np.where(is_hub, src % P_, part)
        return t.append_column("part", pa.array(part.astype(np.int64)))

    with_part = new_edges.map_batches(assign, batch_format="pyarrow").materialize()
    touched = sorted(
        r["part"]
        for r in with_part.groupby("part").count().select_columns(["part"]).take_all()
    )
    with_part.write_parquet(os.path.join(layout.path, "edges"), partition_cols=["part"])
    if vertex_aux is not None:
        def vassign(t: pa.Table) -> pa.Table:
            vid = t["vid"].to_numpy(zero_copy_only=False)
            return t.append_column("part", pa.array((vid % P_).astype(np.int64)))

        va = vertex_aux.map_batches(vassign, batch_format="pyarrow").materialize()
        for r in va.groupby("part").count().select_columns(["part"]).take_all():
            if r["part"] not in touched:
                touched.append(r["part"])
        va.write_parquet(os.path.join(layout.path, "vertex"), partition_cols=["part"])
        touched = sorted(touched)
    if n_vertices is not None and n_vertices != layout.n_vertices:
        layout.n_vertices = n_vertices
        layout.save()
    return touched
