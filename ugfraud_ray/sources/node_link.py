"""Node-link JSON graph interchange (the reference's only on-disk format).

Reference /root/reference/UGFraud/Utils/helper.py:363-400:
``save_graph`` dumps ``networkx.json_graph.node_link_data`` to one JSON
document ({nodes: [{...attrs, id}], links: [{...attrs, source,
target}], directed, multigraph, graph}); ``load_graph`` reads it back.
This module reads/writes that exact format into the engine's native
(nodes table, edges table) pair so existing ``*_graph_data.json``
artifacts migrate without touching networkx.

Scale note: node-link JSON is a single in-memory JSON document — a
MIGRATION format, not a pipeline format (the parquet ``GraphLayout`` is
the at-scale representation). Reading therefore parses one file per
task (``flat_map`` over a file list for many shards) and should be
followed immediately by a parquet write. Attribute values survive
round-trip as columns; nodes/links with heterogeneous attribute sets
get nulls for the attrs they lack (networkx semantics).
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data


def _records_table(records: list[dict], keys: list[str]) -> pa.Table:
    cols = {k: [r.get(k) for r in records] for k in keys}
    return pa.table({k: pa.array(v) for k, v in cols.items()})


def _ordered_keys(records: list[dict], first: list[str]) -> list[str]:
    seen = list(first)
    for r in records:
        for k in r:
            if k not in seen:
                seen.append(k)
    return seen


def read_node_link_json(
    paths: "str | list[str]",
) -> tuple["ray.data.Dataset", "ray.data.Dataset", dict]:
    """(nodes, edges, meta) from node-link JSON file(s).

    nodes: (id, ...node attrs); edges: (src, dst, ...edge attrs) with
    ``source``/``target`` renamed. meta carries {directed, multigraph,
    graph} from the first file. Multiple files union (a sharded dump).
    """
    if isinstance(paths, str):
        paths = [paths]
    node_tables: list[pa.Table] = []
    edge_tables: list[pa.Table] = []
    meta: dict = {}

    @ray.remote
    def parse(path: str) -> tuple[pa.Table, pa.Table, dict]:
        with open(path) as f:
            data = json.load(f)
        nodes = data.get("nodes", [])
        # networkx renamed the edge-list key "links" -> "edges" (3.x);
        # legacy reference dumps use "links" — accept either
        links = data.get("links") or data.get("edges") or []
        nt = _records_table(nodes, _ordered_keys(nodes, ["id"]))
        lt = _records_table(links, _ordered_keys(links, ["source", "target"]))
        lt = lt.rename_columns(
            ["src" if c == "source" else "dst" if c == "target" else c for c in lt.column_names]
        )
        m = {k: data.get(k) for k in ("directed", "multigraph", "graph")}
        return nt, lt, m

    parts = ray.get([parse.remote(p) for p in paths])
    for nt, lt, m in parts:
        node_tables.append(nt)
        edge_tables.append(lt)
        if not meta:
            meta = m
    nodes = ray.data.from_arrow(pa.concat_tables(node_tables, promote_options="default"))
    edges = ray.data.from_arrow(pa.concat_tables(edge_tables, promote_options="default"))
    return nodes, edges, meta


def write_node_link_json(
    nodes: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    path: str,
    directed: bool = False,
    multigraph: bool = False,
) -> None:
    """Inverse of ``read_node_link_json`` — emits a document the
    reference's ``load_graph`` (helper.py:384-400) parses unchanged.
    Null attr cells are omitted per record (networkx never stores a
    missing attr as None)."""
    from ugfraud_ray.functions.collect import collect_table

    nt = collect_table(nodes)
    et = collect_table(edges)

    def records(t: pa.Table, renames: dict) -> list[dict]:
        cols = {renames.get(c, c): t[c].to_pylist() for c in t.column_names}
        names = list(cols)
        out = []
        for i in range(t.num_rows):
            out.append({k: cols[k][i] for k in names if cols[k][i] is not None})
        return out

    link_records = records(et, {"src": "source", "dst": "target"})
    data = {
        "directed": bool(directed),
        "multigraph": bool(multigraph),
        "graph": {},
        "nodes": records(nt, {}),
        # both edge-list keys: legacy readers (and the reference's
        # load_graph on old networkx) want "links", networkx 3.x wants
        # "edges"; extra keys are ignored by either
        "links": link_records,
        "edges": link_records,
    }
    with open(path, "w") as f:
        json.dump(data, f)
