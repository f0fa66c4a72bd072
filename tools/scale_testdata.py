"""Deterministic scale-up of the driver testdata star schema.

Tiles every table of a base sf dir K times with per-domain key offsets
(offset = max base key + 1 per id domain, so foreign keys stay
consistent: a replicated lineitem row still joins its replicated order,
which still joins its replicated customer). region/nation are
dimension tables and copy through unchanged. Text/vector payloads are
kept byte-identical across replicas on purpose — a 10x corpus where 90%
of documents are exact duplicates is exactly the shape a web crawl
feeds the dedup stages.

Usage: python tools/scale_testdata.py [K] [base_dir] [out_dir]
       (defaults: 10 /root/testdata/sf0.1 /tmp/sf1)

Writes one parquet per table; never touches the read-only testdata.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# id domain of every key column (same domain => same offset everywhere)
DOMAIN_COLS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "cust"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
DOMAIN_BASE = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}


def scale(k: int, base: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    strides = {
        dom: int(pc.max(pq.read_table(os.path.join(base, f"{t}.parquet"), columns=[c])[c]).as_py()) + 1
        for dom, (t, c) in DOMAIN_BASE.items()
    }
    for t in TABLES:
        src = pq.read_table(os.path.join(base, f"{t}.parquet"))
        if t in ("region", "nation"):
            pq.write_table(src, os.path.join(out, f"{t}.parquet"))
            continue
        doms = DOMAIN_COLS[t]
        # stream one replica per row group — at K=100 (sf10) holding all
        # replicas for a concat would need ~100x the base table in RAM
        writer = pq.ParquetWriter(os.path.join(out, f"{t}.parquet"), src.schema)
        for i in range(k):
            rep = src
            for col, dom in doms.items():
                typ = rep.schema.field(col).type
                shifted = pc.add(rep[col], i * strides[dom])
                rep = rep.set_column(
                    rep.schema.get_field_index(col), col, pc.cast(shifted, typ)
                )
            writer.write_table(rep)
        writer.close()
        print(f"{t}: {src.num_rows} -> {src.num_rows * k}")


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1"
    scale(k, base, out)
