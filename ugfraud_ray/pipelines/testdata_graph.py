"""Canonical graph derivations over the driver's TPC-H-ish testdata.

The engine's native input is the Common-Crawl-style `pages` table
(sources/pages.py); the driver's correctness gate runs over the fixed
parquet tables in ``/root/testdata/sf*``. This module pins ONE
deterministic, SQL-expressible mapping from those tables to the two
graph shapes the engine operates on, so every graph operator can be
checked against a DuckDB oracle (``__ray_entry__.oracle_sql``):

- **review graph** (bipartite user->product, the reference's shape,
  /root/reference Utils/helper.py:123-202): customers review parts.
  ``src = o_custkey``, ``dst = l_partkey + PART_OFFSET`` via
  orders ⋈ lineitem on the order key; ``rating`` 1 (pos) / 2 (neg) from
  the discount (the reference bins ratings >=4 -> 1, <4 -> 2 at
  helper.py:192-196); ``label`` 1 (spam) if the line was returned
  (l_returnflag='R'), else 0 (reference: -1 -> spam remapped to
  binary, helper.py:20-34). Multi-edges collapse via
  groupby(src,dst) -> (min rating, max label) — deterministic.
- **general graph** (for PageRank / CC / triangles): a directed graph
  on the customer-id domain, ``src = o_custkey``,
  ``dst = o_orderkey mod (max custkey + 1)``, self-loops dropped,
  exact-deduped.

All reads are column-pruned; joins use the hash-partitioned
``Dataset.join``; id-numbering holds only per-block row counts on the
driver (stages/graph_build.py:with_row_index).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ugfraud_ray.functions.collect import collect_table
import ray.data
from ray.data.aggregate import Count, Max, Min

from ugfraud_ray.stages.graph_build import join_partitions, with_row_index

PART_OFFSET = 1_000_000


def _read(sf_dir: str, table: str, columns: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def review_edges(sf_dir: str) -> "ray.data.Dataset":
    """(src, dst, rating:int8, label:int8) deduped bipartite review edges."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_discount", "l_returnflag"])
    n_ord = orders.count()  # parquet metadata — free

    if n_ord <= 10_000_000:
        # broadcast join: the order→customer map ships ONCE via ray.put
        # and each lineitem batch probes a dense int array — Ray's hash
        # join spins a shuffle pool (~7 s fixed at sf0.1) that dwarfs a
        # small build side. Inner-join semantics kept via the -1 mask.
        ot = collect_table(orders)
        ok = ot["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        oc = ot["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        lk = np.full(int(ok.max()) + 1 if len(ok) else 1, -1, dtype=np.int64)
        lk[ok] = oc
        lk_ref = ray.put(lk)

        def project_bcast(t: pa.Table) -> pa.Table:
            m = ray.get(lk_ref)
            lo = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            cust = np.where(lo < len(m), m[np.minimum(lo, len(m) - 1)], -1)
            keep = cust >= 0
            tk = t.filter(pa.array(keep))
            rating = pc.if_else(
                pc.greater_equal(tk["l_discount"], 0.05),
                pa.scalar(2, pa.int8()),
                pa.scalar(1, pa.int8()),
            )
            label = pc.if_else(
                pc.equal(tk["l_returnflag"], "R"), pa.scalar(1, pa.int8()), pa.scalar(0, pa.int8())
            )
            return pa.table(
                {
                    "src": pa.array(cust[keep]),
                    "dst": pc.add(tk["l_partkey"], PART_OFFSET),
                    "rating": rating,
                    "label": label,
                }
            )

        e = lineitem.map_batches(project_bcast, batch_format="pyarrow")
    else:
        joined = lineitem.join(
            orders.rename_columns({"o_orderkey": "l_orderkey"}),
            join_type="inner",
            num_partitions=join_partitions(),
            on=("l_orderkey",),
        )

        def project(t: pa.Table) -> pa.Table:
            rating = pc.if_else(
                pc.greater_equal(t["l_discount"], 0.05),
                pa.scalar(2, pa.int8()),
                pa.scalar(1, pa.int8()),
            )
            label = pc.if_else(
                pc.equal(t["l_returnflag"], "R"), pa.scalar(1, pa.int8()), pa.scalar(0, pa.int8())
            )
            return pa.table(
                {
                    "src": t["o_custkey"],
                    "dst": pc.add(t["l_partkey"], PART_OFFSET),
                    "rating": rating,
                    "label": label,
                }
            )

        e = joined.map_batches(project, batch_format="pyarrow")
    # D5 exact dedup (Fraudar.py:18-20 multi-edge collapse), deterministic
    # combine; bucket-partitioned (per-pair hash aggregates are the
    # measured many-groups slow path, see graph_build.dedup_pairs).
    # Row bound for the small-side local path: the inner join emits at
    # most one row per lineitem row (parquet metadata count — free).
    from ugfraud_ray.stages.graph_build import dedup_pairs

    n_li = _read(sf_dir, "lineitem", ["l_orderkey"]).count()
    return dedup_pairs(e, extra={"rating": "min", "label": "max"}, approx_rows=n_li)


def general_edges(sf_dir: str) -> "ray.data.Dataset":
    """(src, dst) simple directed graph on the customer-id domain."""
    # materialized once: consumed by the max() aggregate AND the
    # projection pass (otherwise the parquet read re-executes per branch)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).materialize()
    mod = int(orders.max("o_custkey")) + 1

    def project(t: pa.Table) -> pa.Table:
        src = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = (t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)) % mod
        keep = src != dst
        return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

    e = orders.map_batches(project, batch_format="pyarrow")
    from ugfraud_ray.stages.graph_build import dedup_pairs

    return dedup_pairs(e, approx_rows=orders.count())


def number_int_vertices(
    edges: "ray.data.Dataset", broadcast_threshold: int = 5_000_000
) -> tuple["ray.data.Dataset", "ray.data.Dataset", int]:
    """Arbitrary-int-id edges -> (edges with contiguous vids, vertex map, N).

    The vertex map Dataset has (id:int64 original, vid:int64 contiguous),
    numbered in ascending original-id order (order-preserving, so
    min-vid component representatives translate back to min original id).
    Mirrors number_vertices (graph_build.py) for the int-keyed case;
    T3 in SURVEY §2.3 — the reference builds these id maps as driver
    dicts (Detector/fBox.py:20-47).
    """
    # consumed by three branches (src ids, dst ids, remap) — materialize
    # once so the upstream lineage (e.g. the orders ⋈ lineitem join)
    # doesn't re-execute per branch.
    edges = edges.materialize()
    n_edges = edges.count()  # metadata on a materialized dataset — free
    if n_edges <= broadcast_threshold:
        # small-side fast path: distinct ids via per-block np.unique +
        # ONE driver merge — the union→groupby→sort→row-index chain
        # spins up hash-shuffle pools and costs ~12 s of fixed overhead
        # for a 15k-id result (measured at sf0.1). The driver holds
        # only the distinct-id array, which the broadcast remap below
        # needs anyway at this size.
        def block_ids(t: pa.Table) -> pa.Table:
            u = np.unique(
                np.concatenate(
                    [
                        t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                        t["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
                    ]
                )
            )
            return pa.table({"id": pa.array(u)})

        ut = collect_table(edges.map_batches(block_ids, batch_format="pyarrow"))
        orig = np.unique(ut["id"].to_numpy(zero_copy_only=False).astype(np.int64))
        vid = np.arange(len(orig), dtype=np.int64)
        vmap = ray.data.from_arrow(pa.table({"id": pa.array(orig), "vid": pa.array(vid)}))
        n = len(orig)
        lk = np.full(int(orig.max()) + 1 if n else 1, -1, dtype=np.int64)
        lk[orig] = vid
        lk_ref = ray.put(lk)

        def remap(t: pa.Table) -> pa.Table:
            m = ray.get(lk_ref)
            cols = {c: t[c] for c in t.column_names}
            cols["src"] = pa.array(m[t["src"].to_numpy(zero_copy_only=False)])
            cols["dst"] = pa.array(m[t["dst"].to_numpy(zero_copy_only=False)])
            return pa.table(cols)

        return edges.map_batches(remap, batch_format="pyarrow"), vmap, n

    # Distributed numbering WITHOUT a fine-grained groupby or global
    # sort (measured 58 s + 18 s for 12M rows / 350k ids on 32 cpus —
    # the many-groups slow path): per-block np.unique partials, then ONE
    # coarse shuffle into RANGE buckets (bucket = id // step, so bucket
    # order == id order and the contiguous-ascending-vid contract
    # holds), per-bucket distinct+rank, and driver-side prefix offsets
    # over the ≤ n_buckets (bucket, count) pairs. Same input: 6.4 s.
    # Range (not hash) buckets can skew if ids concentrate in one
    # stripe; bucket count scales with the data so a stripe stays
    # worker-heap-sized for any uniform-ish id domain.
    from ugfraud_ray.functions.bucketing import n_coarse_buckets

    mx = max(int(edges.max("src")), int(edges.max("dst")))
    nb = n_coarse_buckets(n_edges)
    step = mx // nb + 1

    def block_distinct(t: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                    t["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
                ]
            )
        )
        return pa.table({"id": pa.array(u), "_rb": pa.array(u // step)})

    def per_bucket(g: pa.Table) -> pa.Table:
        u = np.unique(g["id"].to_numpy(zero_copy_only=False))
        b = int(g["_rb"][0].as_py())
        return pa.table(
            {
                "id": pa.array(u),
                "_rb": pa.array(np.full(len(u), b, dtype=np.int64)),
                "_rank": pa.array(np.arange(len(u), dtype=np.int64)),
                "_cnt": pa.array(np.full(len(u), len(u), dtype=np.int64)),
            }
        )

    bucketed = (
        edges.map_batches(block_distinct, batch_format="pyarrow")
        .groupby("_rb")
        .map_groups(per_bucket, batch_format="pyarrow")
        .materialize()
    )

    def bucket_counts(t: pa.Table) -> pa.Table:
        rb = t["_rb"].to_numpy(zero_copy_only=False)
        cnt = t["_cnt"].to_numpy(zero_copy_only=False)
        first = np.flatnonzero(np.concatenate([[True], np.diff(rb) != 0]))
        return pa.table({"_rb": pa.array(rb[first]), "_cnt": pa.array(cnt[first])})

    # ≤ n_buckets × blocks rows land on the driver — never O(ids)
    ct = collect_table(bucketed.map_batches(bucket_counts, batch_format="pyarrow"))
    rb_u, rb_first = np.unique(
        ct["_rb"].to_numpy(zero_copy_only=False), return_index=True
    )
    cnts = ct["_cnt"].to_numpy(zero_copy_only=False)[rb_first]
    offsets = dict(
        zip(rb_u.tolist(), np.concatenate([[0], np.cumsum(cnts)[:-1]]).tolist())
    )
    off_ref = ray.put(offsets)

    def assign_vid(t: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        rb = t["_rb"].to_numpy(zero_copy_only=False)
        base = np.array([off[b] for b in rb.tolist()], dtype=np.int64)
        return pa.table(
            {
                "id": t["id"],
                "vid": pa.array(base + t["_rank"].to_numpy(zero_copy_only=False)),
            }
        )

    vmap = bucketed.map_batches(assign_vid, batch_format="pyarrow").materialize()
    # empty range buckets leave columnless zero-row blocks behind the
    # shuffle; Arrow's hash join rejects them ("no match for key field"),
    # so rebuild the dataset from the nonempty block refs (driver holds
    # refs + per-block counts only)
    from ugfraud_ray.stages.graph_build import _nrows

    refs = vmap.to_arrow_refs()
    counts_per_block = ray.get([_nrows.remote(r) for r in refs])
    keep = [r for r, c in zip(refs, counts_per_block) if c]
    if keep:
        vmap = ray.data.from_arrow_refs(keep)
    n = int(np.sum(cnts))
    if n <= broadcast_threshold:
        vt = collect_table(vmap)
        orig = vt["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vid = vt["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
        # dense-array broadcast lookup (ray.put once, read per task)
        lk = np.full(int(orig.max()) + 1, -1, dtype=np.int64)
        lk[orig] = vid
        lk_ref = ray.put(lk)

        def remap(t: pa.Table) -> pa.Table:
            m = ray.get(lk_ref)
            cols = {c: t[c] for c in t.column_names}
            cols["src"] = pa.array(m[t["src"].to_numpy(zero_copy_only=False)])
            cols["dst"] = pa.array(m[t["dst"].to_numpy(zero_copy_only=False)])
            return pa.table(cols)

        return edges.map_batches(remap, batch_format="pyarrow"), vmap, n

    e = edges.join(
        vmap.rename_columns({"id": "src"}),
        join_type="inner", num_partitions=join_partitions(), on=("src",),
    ).drop_columns(["src"]).rename_columns({"vid": "src"})
    e = e.join(
        vmap.rename_columns({"id": "dst"}),
        join_type="inner", num_partitions=join_partitions(), on=("dst",),
    ).drop_columns(["dst"]).rename_columns({"vid": "dst"})
    return e, vmap, n


def unmap_vids(result: "ray.data.Dataset", vmap: "ray.data.Dataset", vid_col: str = "vid",
               out_col: str = "id", local_threshold: int = 10_000_000) -> "ray.data.Dataset":
    """Translate contiguous vids in `result` back to original ids.

    Below ``local_threshold`` vertices the (vid -> id) array broadcasts
    once via ``ray.put`` and every batch does a vectorized gather; above
    it the O(V) map never lands on the driver — one hash join on the vid
    column does the translation (same size gate as every other
    broadcast-vs-join site; join branch parity-forced in tests)."""
    if vmap.count() > local_threshold:
        # temp column names so a result that already carries an "id"
        # column (e.g. the second unmap of a (id, component) table)
        # can't collide with the probe side
        probe = vmap.select_columns(["vid", "id"]).rename_columns(
            {"vid": vid_col, "id": "__orig_id"}
            if vid_col != "vid"
            else {"id": "__orig_id"}
        )
        return (
            result.join(
                probe,
                join_type="inner",
                num_partitions=join_partitions(),
                on=(vid_col,),
            )
            .drop_columns([vid_col])
            .rename_columns({"__orig_id": out_col})
        )
    vt = collect_table(vmap)
    rev = np.zeros(len(vt), dtype=np.int64)
    rev[vt["vid"].to_numpy(zero_copy_only=False)] = vt["id"].to_numpy(zero_copy_only=False)
    rev_ref = ray.put(rev)

    def back(t: pa.Table) -> pa.Table:
        m = ray.get(rev_ref)
        cols = {}
        for c in t.column_names:
            if c == vid_col:
                cols[out_col] = pa.array(m[t[c].to_numpy(zero_copy_only=False)])
            else:
                cols[c] = t[c]
        return pa.table(cols)

    return result.map_batches(back, batch_format="pyarrow")


def seed_vids(vmap: "ray.data.Dataset", mod: int) -> np.ndarray:
    """vids whose ORIGINAL id satisfies ``id % mod == 0`` — the seed
    sets every query derives deterministically. Streamed: the filter
    runs inside map_batches and only the (1/mod-sized) matching set
    lands on the driver, never the full vertex table (r5 — replaces
    the ``vmap.to_pandas()`` readout pattern)."""

    def pick(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False)
        keep = ids % mod == 0
        return pa.table({"vid": t["vid"].filter(pa.array(keep))})

    t = collect_table(vmap.map_batches(pick, batch_format="pyarrow"))
    return np.sort(t["vid"].to_numpy(zero_copy_only=False).astype(np.int64))


def vid_to_id_array(
    vmap: "ray.data.Dataset", local_threshold: int = 10_000_000
) -> np.ndarray:
    """Dense (vid -> original id) gather array for kernels that
    genuinely need original ids as a driver-resident array (md5
    priority init, bounded top-N gathers). GATED like every other
    broadcast-vs-join site: above ``local_threshold`` vertices it
    raises loudly — restructure the readout onto ``unmap_vids``' join
    path instead of collecting a web-scale vertex table."""
    n = vmap.count()
    if n > local_threshold:
        raise ValueError(
            f"vid_to_id_array: vertex table has {n} rows > gate "
            f"{local_threshold}; use unmap_vids (distributed join) instead"
        )
    vt = collect_table(vmap)
    rev = np.zeros(n, dtype=np.int64)
    rev[vt["vid"].to_numpy(zero_copy_only=False)] = vt["id"].to_numpy(
        zero_copy_only=False
    )
    return rev
