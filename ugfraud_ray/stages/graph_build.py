"""M2 — edge-url table -> numbered graph tables.

Covers (reference citations into /root/reference):
- exact edge dedup (D5, `Detector/Fraudar.py:18-20` multi-edge collapse;
  needed anyway for Common-Crawl multi-links): groupby(src,dst) keep-first.
- vertex numbering (T3, `Detector/fBox.py:20-47` id-index maps;
  `Detector/GANG.py:100-112` and `Detector/ZooBP.py:52,94-99` *require*
  contiguous int ids): url -> contiguous int64 vid, products (link
  targets) numbered before users like the reference corpus layout
  (prods `0..P-1`, users `P..`, FIXTURES.md §2).
- degree table (A1, the most reused aggregate: `SpEagle.py:112-113`,
  `GANG.py:100-104`, `fBox.py:65-66`, `Fraudar.py:205-206`).
- attribute join (J1/M4, `Utils/helper.py:250-274`): hash join or
  broadcast small-side lookup.

All stages are Dataset ops (map_batches / groupby / sort); the only
driver-side state is per-block row *counts* (metadata) used to assign
contiguous ids — O(num_blocks), never O(rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ugfraud_ray.functions.collect import collect_table
from ugfraud_ray.functions.bucketing import n_coarse_buckets, pair_hash_bucket
import ray.data
from ray.data.aggregate import Count, Min


def right_size_blocks(
    ds: "ray.data.Dataset",
    approx_rows: int | None,
    rows_per_block: int = 100_000,
    max_small: int = 50_000_000,
) -> "ray.data.Dataset":
    """Coalesce a SMALL dataset into sensibly-sized blocks before an
    all-to-all. Ray's read heuristics split small inputs into hundreds
    of sub-MB blocks (e.g. 336 x 0.5 MB for a 6M-row parquet at sf1)
    and the sort-based shuffle's per-block overhead then dominates:
    measured 11.2 s -> 4.1 s for the same coarse-bucket pair dedup
    after repartitioning to ~100k-row blocks — the repartition pass
    included. Above ``max_small`` rows this is a NO-OP: large inputs
    already carry target-size blocks and an extra all-to-all pass would
    be pure waste at 100 TB; unknown sizes are left untouched too."""
    if approx_rows is None or approx_rows > max_small:
        return ds
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    target = max(2 * ncpu, -(-int(approx_rows) // int(rows_per_block)))
    return ds.repartition(target)


def join_partitions(floor_: int = 8, cap: int = 4096) -> int:
    """Hash-join/shuffle partition count sized to the cluster.

    Ray's hash-shuffle aggregator actors reserve 0.125 CPU each and the
    join HANGS (not degrades) when the pool can't fully schedule — a
    fixed num_partitions=64 needs 8 whole CPUs regardless of data size,
    so the count must NEVER be derived from data size alone (e.g.
    num_blocks of a big input on a small cluster). 2× the cluster CPU
    count keeps aggregators at ~1/4 of the cluster while giving skew
    headroom at any cluster size."""
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return max(floor_, min(cap, ncpu * 2))


@ray.remote
def _nrows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _add_index(t: pa.Table, start: int, column: str) -> pa.Table:
    return t.append_column(column, pa.array(np.arange(start, start + t.num_rows), pa.int64()))


def with_row_index(ds: "ray.data.Dataset", column: str = "row_id", offset: int = 0) -> "ray.data.Dataset":
    """Append a contiguous int64 index column in current block order.

    Driver holds only per-block row counts (metadata); the index columns
    are appended by parallel tasks. This is the distributed analog of the
    reference's sequential id-assignment scan (`fBox.py:33-41`).
    """
    refs = ds.to_arrow_refs()
    counts = ray.get([_nrows.remote(r) for r in refs])
    starts = offset + np.concatenate([[0], np.cumsum(counts)[:-1]]) if counts else []
    out = [_add_index.remote(r, int(s), column) for r, s in zip(refs, starts)]
    return ray.data.from_arrow_refs(out)


def dataset_md5(ds: "ray.data.Dataset", col: str) -> str:
    """Order-independent content checksum of a column (S6 analog of the
    reference's whole-file md5 gate, Utils/helper.py:118-120 /
    Demo/demo_pre.py:16-29).

    Per-block: md5 per row (vectorized loop), then the block's sorted
    digests; driver merges the (small) per-block digest lists, sorts
    globally, and hashes the concatenation — deterministic regardless
    of partitioning/order. Matches the DuckDB oracle
    ``md5(string_agg(md5(col), '' ORDER BY md5(col)))``.
    """
    import hashlib

    def block_digests(t: pa.Table) -> pa.Table:
        vals = t[col].to_pylist()
        digs = sorted(hashlib.md5(str(v).encode("utf-8")).hexdigest() for v in vals)
        return pa.table({"d": pa.array(digs, pa.string())})

    from ugfraud_ray.functions.collect import collect_table

    dt = collect_table(ds.map_batches(block_digests, batch_format="pyarrow"))
    all_digs = sorted(dt["d"].to_pylist())
    return hashlib.md5("".join(all_digs).encode("ascii")).hexdigest()


PAGES_SCHEMA_COLS = {
    "url": pa.string(),
    "warc_ts": pa.timestamp("us"),
    "html": pa.binary(),
    "text": pa.string(),
    "lang": pa.string(),
}


def validate_pages_schema(ds: "ray.data.Dataset") -> None:
    """M2 data_checker analog (Utils/helper.py:205-233): an Arrow schema
    assertion at read time, NOT a data pass. Raises ValueError naming
    every missing/mistyped column."""
    schema = ds.schema()
    errs = []
    for name, typ in PAGES_SCHEMA_COLS.items():
        if name not in schema.names:
            errs.append(f"missing column {name}:{typ}")
        else:
            got = schema.base_schema.field(name).type if hasattr(schema, "base_schema") else None
            try:
                got = dict(zip(schema.names, schema.types))[name]
            except Exception:
                got = None
            if got is not None and got != typ and not (
                name == "text" and got in (pa.string(), pa.large_string())
            ):
                errs.append(f"column {name} has type {got}, expected {typ}")
    if errs:
        raise ValueError("pages schema invalid: " + "; ".join(errs))


def _reduce_runs(v: np.ndarray, starts: np.ndarray, how: str) -> np.ndarray:
    if len(starts) == 0:
        return v[:0]
    if how == "min":
        return np.minimum.reduceat(v, starts)
    if how == "max":
        return np.maximum.reduceat(v, starts)
    if how == "sum":
        return np.add.reduceat(v, starts)
    raise ValueError(f"unknown combine {how!r}")


def dedup_pairs(
    ds: "ray.data.Dataset",
    a: str = "src",
    b: str = "dst",
    extra: dict | None = None,
    n_buckets: int | None = None,
    approx_rows: int | None = None,
    local_threshold: int = 1_000_000,
) -> "ray.data.Dataset":
    """Exact (a, b) pair dedup with optional per-column min/max combine.

    A per-pair hash aggregate creates one group per distinct pair —
    millions of groups, the measured Ray slow path. Instead the pair key
    is hashed into coarse buckets (ONE shuffle; bucket count sized to the
    cluster AND the data by ``n_coarse_buckets`` — never a fixed 64-task
    ceiling) and each bucket deduplicates vectorized (lexsort +
    run-boundary reduceat). extra maps column -> 'min' | 'max' | 'sum'
    ('sum' is exact for integer columns; pre-aggregation inside the
    coarse buckets keeps the combine associative across block orders).

    approx_rows: caller-known upper bound on the input row count. When
    it is ≤ local_threshold the dedup runs driver-local on the collected
    table (the coarse-bucket shuffle has ~2-4 s fixed pool-spin-up cost
    that dwarfs small inputs); the distributed path is unchanged.
    """
    extra = extra or {}

    if approx_rows is not None and approx_rows <= local_threshold:
        from ugfraud_ray.functions.collect import collect_table

        t = collect_table(ds)
        av = t[a].to_numpy(zero_copy_only=False).astype(np.int64)
        bv = t[b].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((bv, av))
        av, bv = av[order], bv[order]
        if len(av):
            starts = np.flatnonzero(
                np.concatenate([[True], (np.diff(av) != 0) | (np.diff(bv) != 0)])
            )
        else:
            starts = np.zeros(0, dtype=np.int64)
        out = {a: pa.array(av[starts]), b: pa.array(bv[starts])}
        for col, how in extra.items():
            v = t[col].to_numpy(zero_copy_only=False)[order]
            red = _reduce_runs(v, starts, how)
            out[col] = pa.array(red)
        return ray.data.from_arrow(pa.table(out))

    nb = n_buckets if n_buckets is not None else n_coarse_buckets(approx_rows)
    ds = right_size_blocks(ds, approx_rows)

    def bucketize(t: pa.Table) -> pa.Table:
        av = t[a].to_numpy(zero_copy_only=False)
        bv = t[b].to_numpy(zero_copy_only=False)
        return t.append_column("_bucket", pa.array(pair_hash_bucket(av, bv, nb)))

    def dedup_bucket(g) -> pa.Table:
        av = g[a].to_numpy().astype(np.int64)
        bv = g[b].to_numpy().astype(np.int64)
        order = np.lexsort((bv, av))
        av, bv = av[order], bv[order]
        if len(av):
            starts = np.flatnonzero(
                np.concatenate([[True], (np.diff(av) != 0) | (np.diff(bv) != 0)])
            )
        else:
            starts = np.zeros(0, dtype=np.int64)
        out = {a: pa.array(av[starts]), b: pa.array(bv[starts])}
        for col, how in extra.items():
            v = g[col].to_numpy()[order]
            red = _reduce_runs(v, starts, how)
            out[col] = pa.array(red)
        return pa.table(out)

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(dedup_bucket, batch_format="pyarrow")
    )


def dedup_edges(
    edge_urls: "ray.data.Dataset", approx_rows: int | None = None
) -> "ray.data.Dataset":
    """Exact (src_url, dst_url) dedup keeping the min ts (deterministic).

    D5: `Fraudar.py:18-20` (`M > 0 -> 1`). Hash-bucketed like
    dedup_pairs (string keys: Arrow-buffer-native vectorized hash +
    per-bucket Arrow hash aggregate, r5 — no pandas object conversion)
    — a per-pair hash aggregate is the many-groups slow path.
    Bucket count is cluster/data-proportional (``n_coarse_buckets``).
    """
    from ugfraud_ray.functions.bucketing import hash_string_column

    nb = np.uint64(n_coarse_buckets(approx_rows))

    def bucketize(t: pa.Table) -> pa.Table:
        h = hash_string_column(t["src_url"]) ^ hash_string_column(
            t["dst_url"]
        ) * np.uint64(0x9E3779B97F4A7C15)
        return t.append_column("_cb", pa.array((h % nb).astype(np.int64)))

    def per_bucket(g: pa.Table) -> pa.Table:
        gg = pa.TableGroupBy(
            g.select(["src_url", "dst_url", "ts"]), ["src_url", "dst_url"]
        ).aggregate([("ts", "min")])
        return gg.rename_columns(["src_url", "dst_url", "ts"])

    return (
        edge_urls.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def number_vertices(
    edge_urls: "ray.data.Dataset", small_threshold: int = 5_000_000
) -> "ray.data.Dataset":
    """Distinct urls -> vertex table (url, kind, vid).

    kind=0 for link *targets* ("products" in the reference's bipartite
    corpus), kind=1 for source-only pages ("users"); targets are numbered
    first so detector math that slices `[:n_prods]` (GANG.py:150-155)
    has the reference's layout. Deterministic: sorted by (kind, url).

    Small edge tables (≤ small_threshold rows) take a per-block-distinct
    + driver-merge fast path — the bucketed shuffle + distributed sort +
    row-index chain costs ~9 s of fixed overhead for a 100k-url result
    (measured). Large tables use the hash-bucketed shuffle (one shuffle
    over cluster/data-proportional coarse groups, per-bucket vectorized
    pandas dedup) — a per-url hash aggregate builds one group per page,
    the measured slow path.
    """
    try:
        n_rows = edge_urls.count()
    except Exception:
        n_rows = None
    if n_rows is not None and n_rows <= small_threshold:
        import pandas as pd

        def block_urls(t: pa.Table) -> pa.Table:
            dst_u = np.unique(t["dst_url"].to_numpy(zero_copy_only=False))
            src_u = np.unique(t["src_url"].to_numpy(zero_copy_only=False))
            return pa.table(
                {
                    "url": pa.array(np.concatenate([dst_u, src_u]), pa.string()),
                    "is_dst": pa.array(
                        np.concatenate(
                            [np.ones(len(dst_u), np.int8), np.zeros(len(src_u), np.int8)]
                        )
                    ),
                }
            )

        from ugfraud_ray.functions.collect import collect_table

        ut = collect_table(
            edge_urls.map_batches(block_urls, batch_format="pyarrow")
        ).to_pandas()
        gb = ut.groupby("url", sort=False)["is_dst"].max()
        df = pd.DataFrame(
            {"url": gb.index.to_numpy(), "kind": np.where(gb.to_numpy() == 1, 0, 1).astype(np.int8)}
        ).sort_values(["kind", "url"], kind="mergesort", ignore_index=True)
        return ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array(df["url"].to_numpy(dtype=object), pa.string()),
                    "kind": pa.array(df["kind"].to_numpy()),
                    "vid": pa.array(np.arange(len(df), dtype=np.int64)),
                }
            )
        )
    dsts = edge_urls.select_columns(["dst_url"]).rename_columns({"dst_url": "url"})
    srcs = edge_urls.select_columns(["src_url"]).rename_columns({"src_url": "url"})
    is_dst = dsts.map_batches(
        lambda t: t.append_column("is_dst", pa.array(np.ones(t.num_rows, np.int8))),
        batch_format="pyarrow",
    )
    is_src = srcs.map_batches(
        lambda t: t.append_column("is_dst", pa.array(np.zeros(t.num_rows, np.int8))),
        batch_format="pyarrow",
    )
    tagged = is_dst.union(is_src)

    nb = np.uint64(n_coarse_buckets(2 * n_rows if n_rows is not None else None))

    from ugfraud_ray.functions.bucketing import hash_string_column

    def bucketize(t: pa.Table) -> pa.Table:
        # Arrow-buffer-native string hashing (r5); correctness doesn't
        # depend on the bucket fn — only spreading
        h = hash_string_column(t["url"])
        return t.append_column("_cb", pa.array((h % nb).astype(np.int64)))

    def per_bucket(g: pa.Table) -> pa.Table:
        gb = pa.TableGroupBy(g.select(["url", "is_dst"]), "url").aggregate(
            [("is_dst", "max")]
        )
        kind = np.where(
            gb["is_dst_max"].to_numpy(zero_copy_only=False) == 1, 0, 1
        ).astype(np.int8)
        return pa.table({"url": gb["url"], "kind": pa.array(kind)})

    verts = (
        tagged.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    verts = verts.sort(["kind", "url"])
    return with_row_index(verts, column="vid")


def _MaxI8(col: str, name: str):
    from ray.data.aggregate import Max

    return Max(col, alias_name=name)


def map_edges_to_vids(
    edge_urls: "ray.data.Dataset",
    vertices: "ray.data.Dataset",
    broadcast_threshold: int = 5_000_000,
) -> "ray.data.Dataset":
    """(src_url, dst_url, ts) -> (src, dst, ts) int64 edges.

    Small vertex tables are broadcast once via ``ray.put`` and looked up
    inside ``map_batches`` (no shuffle); large ones use the
    hash-partitioned ``Dataset.join`` twice. J1/J2 in SURVEY §2.4.
    """
    n = vertices.count()
    if n <= broadcast_threshold:
        vt = collect_table(vertices)
        # broadcast the (url -> vid) columns once via ray.put; per batch
        # the lookup is a vectorized pc.index_in against the url array
        # (urls are pre-sorted by number_vertices, vid is positional
        # after a take), never a per-row Python dict probe
        urls = vt["url"].combine_chunks()
        vids = vt["vid"].combine_chunks()
        lookup_ref = ray.put((urls, vids))

        def map_ids(t: pa.Table) -> pa.Table:
            u, v = ray.get(lookup_ref)
            src = pc.take(v, pc.index_in(t["src_url"], value_set=u))
            dst = pc.take(v, pc.index_in(t["dst_url"], value_set=u))
            cols = {"src": pc.cast(src, pa.int64()), "dst": pc.cast(dst, pa.int64())}
            for name in t.column_names:
                if name not in ("src_url", "dst_url"):
                    cols[name] = t[name]
            cols["src_url"] = t["src_url"]
            cols["dst_url"] = t["dst_url"]
            return pa.table(cols)

        return edge_urls.map_batches(map_ids, batch_format="pyarrow")

    # large-side path: two hash joins
    v = vertices.select_columns(["url", "vid"])
    e = edge_urls.join(
        v.rename_columns({"url": "src_url", "vid": "src"}),
        join_type="inner",
        num_partitions=join_partitions(),
        on=("src_url",),
    )
    e = e.join(
        v.rename_columns({"url": "dst_url", "vid": "dst"}),
        join_type="inner",
        num_partitions=join_partitions(),
        on=("dst_url",),
    )
    return e


@ray.remote
def _bincount_block(t, col: str, n: int) -> np.ndarray:
    # blocks may arrive as Arrow tables OR pandas frames (Ray hands back
    # whatever format the upstream stage produced), and empty shuffle
    # blocks can be columnless
    if isinstance(t, pa.Table):
        if t.num_rows == 0:
            return np.zeros(n, dtype=np.int64)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        if len(t) == 0 or col not in getattr(t, "columns", []):
            return np.zeros(n, dtype=np.int64)
        v = np.asarray(t[col]).astype(np.int64)
    return np.bincount(v, minlength=n)


@ray.remote
def _sum_blocks(*parts: np.ndarray) -> np.ndarray:
    out = parts[0].copy()
    for p in parts[1:]:
        out += p
    return out


def dense_degrees(edges: "ray.data.Dataset", col: str, n_vertices: int) -> np.ndarray:
    """Dense (n_vertices,) int64 degree array via per-block bincount
    partials + 8-way tree reduce.

    Ray's hash aggregate degrades badly when the group count is in the
    millions (one group per vertex); per-block dense partials are one
    vectorized pass and the reduce moves only n_vertices-sized arrays.
    Scale note: at vertex counts where a dense array per task no longer
    fits (>~10^9), switch to vid-range-bucketed partials (two-level
    combine over range shards) — same shape, chunked.
    """
    refs = [_bincount_block.remote(b, col, n_vertices) for b in edges.to_arrow_refs()]
    while len(refs) > 1:
        refs = [_sum_blocks.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
    return ray.get(refs[0]) if refs else np.zeros(n_vertices, dtype=np.int64)


def degree_table(edges: "ray.data.Dataset", direction: str = "both") -> "ray.data.Dataset":
    """Per-vertex degree via grouped count (A1).

    direction: 'in' (by dst), 'out' (by src), 'both' (undirected sum).
    """
    if direction == "in":
        return edges.groupby("dst").aggregate(Count(alias_name="degree")).rename_columns({"dst": "vid"})
    if direction == "out":
        return edges.groupby("src").aggregate(Count(alias_name="degree")).rename_columns({"src": "vid"})
    out_d = edges.select_columns(["src"]).rename_columns({"src": "vid"})
    in_d = edges.select_columns(["dst"]).rename_columns({"dst": "vid"})
    return out_d.union(in_d).groupby("vid").aggregate(Count(alias_name="degree"))


def build_graph(pages: "ray.data.Dataset") -> dict:
    """pages -> {edges (int vids), vertices, n_vertices}.

    The end-to-end M1+M2 slice: extract -> dedup -> number -> map ids.
    """
    from ugfraud_ray.stages.extract import extract_edges

    raw = extract_edges(pages)
    # materialize the deduped url-edge table once: it is consumed by three
    # downstream branches (numbering, id-mapping, degree) and re-running
    # the extract lineage per branch would re-parse every page each time.
    deduped = dedup_edges(raw).materialize()
    vertices = number_vertices(deduped).materialize()
    edges = map_edges_to_vids(deduped, vertices)
    return {
        "edges": edges,
        "vertices": vertices,
        "n_vertices": vertices.count(),
    }
