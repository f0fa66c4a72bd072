"""Similarity search over an embedding column (`list<float>`).

Training-data-pipeline addition (no reference analog; closest is fBox's
dense spectral reconstruction, /root/reference Detector/fBox.py:58-107).

- ``brute_force_topk``: exact cosine top-k. The (small) query matrix is
  broadcast once via ``ray.put``; every batch does ONE numpy matmul
  against it and keeps its local top-k per query; a final
  groupby(query_id) merge keeps the global top-k. Per-batch cost is
  O(batch × dim × n_queries); driver never sees the corpus.
- ``ivf_topk``: the scale path — k-means-ish coarse quantizer (seeded,
  built from a sample), vectors bucketed by nearest centroid (ONE
  shuffle), queries probe only `n_probe` buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ugfraud_ray.functions.collect import collect_table
import ray.data

from ugfraud_ray.functions.pools import actor_pool_size


def _vecs_from_column(col: pa.ChunkedArray | pa.Array, n_rows: int) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.flatten().to_numpy(zero_copy_only=False), dtype=np.float64)
    return flat.reshape(n_rows, flat.size // n_rows)


def _normalize(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1)
    n[n == 0] = 1.0
    return x / n[:, None]


def brute_force_topk(
    emb: "ray.data.Dataset",
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
) -> "ray.data.Dataset":
    """Exact cosine top-k: (query_id, neighbor_id, sim, rnk).

    Ties broken (sim desc, neighbor_id asc); self-matches excluded.
    """
    qset = set(int(q) for q in query_ids)

    def pick_queries(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        mask = np.isin(ids, list(qset))
        return t.filter(pa.array(mask))

    qt = pa.concat_tables(
        ray.get(emb.map_batches(pick_queries, batch_format="pyarrow").to_arrow_refs())
    )
    q_ids = qt[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    q_mat = _normalize(_vecs_from_column(qt[vec_col], len(qt)))
    q_ref = ray.put((q_ids, q_mat))

    def local_topk(t: pa.Table) -> pa.Table:
        qi, qm = ray.get(q_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _normalize(_vecs_from_column(t[vec_col], t.num_rows))
        sims = qm @ x.T  # (n_q, batch)
        out_q, out_n, out_s = [], [], []
        kk = min(k, x.shape[0])
        for r in range(len(qi)):
            s = sims[r]
            valid = ids != qi[r]
            cand = np.flatnonzero(valid)
            if len(cand) == 0:
                continue
            sv = s[cand]
            # local top-k by (sim desc, id asc)
            order = np.lexsort((ids[cand], -sv))[:kk]
            out_q.append(np.full(len(order), qi[r]))
            out_n.append(ids[cand][order])
            out_s.append(sv[order])
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    partial = emb.map_batches(local_topk, batch_format="pyarrow")

    def merge(g) -> pa.Table:
        sims = g["sim"].to_numpy().astype(np.float64)
        nid = g["neighbor_id"].to_numpy().astype(np.int64)
        qid = int(g["query_id"][0].as_py())
        order = np.lexsort((nid, -sims))[:k]
        s = sims[order]
        if round_to is not None:
            s = np.round(s, round_to)
        return pa.table(
            {
                "query_id": pa.array(np.full(len(order), qid)),
                "neighbor_id": pa.array(nid[order]),
                "sim": pa.array(s),
                "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return partial.groupby("query_id").map_groups(merge, batch_format="pyarrow")


class _IVFAssign:
    """Actor-pool stage: centroid matrix shipped once per actor."""

    def __init__(self, centroids_ref, id_col: str, vec_col: str):
        self.centroids = _normalize(ray.get(centroids_ref))
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        x = _normalize(_vecs_from_column(t[self.vec_col], t.num_rows))
        assign = (x @ self.centroids.T).argmax(axis=1).astype(np.int64)
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "bucket": pa.array(assign),
                self.vec_col: t[self.vec_col],
            }
        )


def ivf_topk(
    emb: "ray.data.Dataset",
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 5,
    sample_size: int = 4096,
) -> "ray.data.Dataset":
    """IVF approximate top-k: bucket by nearest of `n_centroids` sampled
    centroids (one shuffle), probe the `n_probe` nearest buckets per query.

    Partitioning assumption: bucket sizes are balanced enough that one
    bucket's vectors fit a map_groups task — at 100 TB raise n_centroids
    so corpus/n_centroids stays task-sized.
    """
    centroids = _train_centroids(emb, n_centroids, vec_col, seed, sample_size)
    cent_ref = ray.put(centroids)

    bucketed = emb.map_batches(
        _IVFAssign,
        fn_constructor_args=(cent_ref, id_col, vec_col),
        batch_format="pyarrow",
        concurrency=actor_pool_size(2),
    ).materialize()

    # queries + their probe buckets
    qset = [int(q) for q in query_ids]

    def pick(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(ids, qset)))

    qt = collect_table(bucketed.map_batches(pick, batch_format="pyarrow"))
    q_ids = qt[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    q_mat = _normalize(_vecs_from_column(qt[vec_col], len(qt)))
    probes = np.argsort(-(q_mat @ _normalize(centroids).T), axis=1)[:, :n_probe]
    probe_map: dict[int, list[tuple[int, np.ndarray]]] = {}
    for r in range(len(q_ids)):
        for b in probes[r]:
            probe_map.setdefault(int(b), []).append((int(q_ids[r]), q_mat[r]))
    pm_ref = ray.put(probe_map)

    def search_bucket(g) -> pa.Table:
        pm = ray.get(pm_ref)
        b = int(g["bucket"][0].as_py())
        qs = pm.get(b)
        empty = pa.table(
            {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
             "sim": pa.array([], pa.float64())}
        )
        if not qs:
            return empty
        ids = g[id_col].to_numpy().astype(np.int64)
        x = _normalize(np.stack(g[vec_col].to_numpy()).astype(np.float64))
        out_q, out_n, out_s = [], [], []
        for qid, qv in qs:
            s = x @ qv
            valid = ids != qid
            cand = np.flatnonzero(valid)
            if not len(cand):
                continue
            order = np.lexsort((ids[cand], -s[cand]))[: min(k, len(cand))]
            out_q.append(np.full(len(order), qid))
            out_n.append(ids[cand][order])
            out_s.append(s[cand][order])
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    partial = bucketed.groupby("bucket").map_groups(search_bucket, batch_format="pyarrow")

    def merge(g) -> pa.Table:
        sims = g["sim"].to_numpy().astype(np.float64)
        nid = g["neighbor_id"].to_numpy().astype(np.int64)
        qid = int(g["query_id"][0].as_py())
        order = np.lexsort((nid, -sims))[:k]
        return pa.table(
            {
                "query_id": pa.array(np.full(len(order), qid)),
                "neighbor_id": pa.array(nid[order]),
                "sim": pa.array(sims[order]),
                "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return partial.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def lsh_topk(
    emb: "ray.data.Dataset",
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 4,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> "ray.data.Dataset":
    """LSH-bucketed approximate cosine top-k — the SQL-replicable scale
    path (vs ``ivf_topk``'s k-means quantizer): candidates are ONLY the
    vectors whose seeded random-hyperplane sign bucket equals the
    query's bucket, so each batch scans ~corpus/2^n_planes rows per
    query instead of the full corpus, with no shuffle at all (the
    bucket filter happens inside map_batches; only per-batch top-k
    partials leave the task).

    Ranking is by (sim ROUNDED to ``round_to`` desc, neighbor_id asc)
    so ordering and the oracle's are float-implementation independent.
    Returns (query_id, neighbor_id, sim, rnk).
    """
    qset = [int(q) for q in query_ids]

    def pick_queries(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(ids, qset)))

    qt = collect_table(emb.map_batches(pick_queries, batch_format="pyarrow"))
    q_ids = qt[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    q_raw = _vecs_from_column(qt[vec_col], len(qt))
    dim = q_raw.shape[1]
    planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
    q_buckets = ((q_raw @ planes) > 0).astype(np.int64) @ (1 << np.arange(n_planes))
    q_mat = _normalize(q_raw)
    q_ref = ray.put((q_ids, q_mat, q_buckets, planes))

    def local_topk(t: pa.Table) -> pa.Table:
        qi, qm, qb, P = ray.get(q_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        raw = _vecs_from_column(t[vec_col], t.num_rows)
        buckets = ((raw @ P) > 0).astype(np.int64) @ (1 << np.arange(P.shape[1]))
        x = _normalize(raw)
        out_q, out_n, out_s = [], [], []
        for r in range(len(qi)):
            cand = np.flatnonzero((buckets == qb[r]) & (ids != qi[r]))
            if not len(cand):
                continue
            sv = np.round(x[cand] @ qm[r], round_to)
            order = np.lexsort((ids[cand], -sv))[: min(k, len(cand))]
            out_q.append(np.full(len(order), qi[r]))
            out_n.append(ids[cand][order])
            out_s.append(sv[order])
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    partial = emb.map_batches(local_topk, batch_format="pyarrow")

    def merge(g) -> pa.Table:
        sims = g["sim"].to_numpy().astype(np.float64)
        nid = g["neighbor_id"].to_numpy().astype(np.int64)
        qid = int(g["query_id"][0].as_py())
        order = np.lexsort((nid, -sims))[:k]
        return pa.table(
            {
                "query_id": pa.array(np.full(len(order), qid)),
                "neighbor_id": pa.array(nid[order]),
                "sim": pa.array(sims[order]),
                "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return partial.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def label_centroids(
    embeddings: "ray.data.Dataset",
    vec_col: str = "embedding",
    label_col: str = "label",
    grid: int = 10_000,
) -> "ray.data.Dataset":
    """Per-label mean embedding: (label, dim, centroid) — the grouped
    VECTOR aggregate (class prototypes / IVF seeding / label-centroid
    classification). Values are quantized half-up onto a 1/grid grid
    first, so partial sums are int64 and the result is bit-exact vs the
    SQL replay regardless of block order (the same integer-units trick
    as revenue_by_nation); centroid = (qsum/grid)/n rounded to 9.

    One pass: per-block dense (labels x dims) int64 partials emitted as
    rows, then a (label, dim)-keyed sum — the group domain is
    labels*dims (tiny), never the row count.
    """
    def partials(t: pa.Table) -> pa.Table:
        v = _vecs_from_column(t[vec_col], t.num_rows).astype(np.float64)
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.floor(v * grid + 0.5).astype(np.int64)
        ulab, inv = np.unique(lab, return_inverse=True)
        k, d = len(ulab), v.shape[1]
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv)
        return pa.table(
            {
                "label": pa.array(np.repeat(ulab, d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
                "qsum": pa.array(sums.reshape(-1)),
                "n": pa.array(np.repeat(cnt.astype(np.int64), d)),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        embeddings.select_columns([label_col, vec_col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("qsum", alias_name="qsum"), Sum("n", alias_name="n"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        qs = t["qsum"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = np.round((qs / grid) / n, 9)
        return pa.table(
            {"label": t["label"], "dim": t["dim"], "centroid": pa.array(c)}
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def quantize_embeddings(
    embeddings: "ray.data.Dataset",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Per-vector symmetric int8 quantization (the standard 4x storage
    shrink for ANN indexes): q = floor(x / scale * 127 + 0.5) with
    scale = max|x|. Pure per-row math — embarrassing parallel, zero
    shuffle. Output keeps the compact EXACT readout (scale, q_sum,
    q_min, q_max, n_dims) rather than the int8 list itself so the SQL
    replay compares scalars; every op (float32->double, /, *127,
    floor+0.5) is mirrored op-for-op in DuckDB."""

    def f(t: pa.Table) -> pa.Table:
        v = _vecs_from_column(t[vec_col], t.num_rows).astype(np.float64)
        scale = np.abs(v).max(axis=1)
        safe = np.where(scale > 0, scale, 1.0)
        q = np.floor(v / safe[:, None] * 127.0 + 0.5)
        return pa.table(
            {
                id_col: t[id_col],
                "scale": pa.array(np.round(scale, 9)),
                "n_dims": pa.array(np.full(t.num_rows, v.shape[1], dtype=np.int64)),
                "q_sum": pa.array(q.sum(axis=1).astype(np.int64)),
                "q_min": pa.array(q.min(axis=1).astype(np.int64)),
                "q_max": pa.array(q.max(axis=1).astype(np.int64)),
            }
        )

    return embeddings.select_columns([id_col, vec_col]).map_batches(
        f, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# IVF index persistence — build once, query many
# ---------------------------------------------------------------------------


def _train_centroids(
    emb: "ray.data.Dataset",
    n_centroids: int,
    vec_col: str,
    seed: int,
    sample_size: int,
) -> np.ndarray:
    """Seeded k-means|sample coarse quantizer (5 Lloyd rounds on a
    bounded sample) — shared by ivf_topk and build_ivf_index so an
    index built on disk reproduces the in-line path exactly."""
    st = collect_table(emb.limit(sample_size))
    xs = _normalize(_vecs_from_column(st[vec_col], len(st)))
    rng = np.random.default_rng(seed)
    centroids = xs[rng.choice(len(xs), size=min(n_centroids, len(xs)), replace=False)]
    for _ in range(5):
        a = (xs @ centroids.T).argmax(axis=1)
        for c in range(len(centroids)):
            m = a == c
            if m.any():
                v = xs[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


def build_ivf_index(
    emb: "ray.data.Dataset",
    index_dir: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 5,
    sample_size: int = 4096,
) -> dict:
    """Persist an IVF index: ``centroids.parquet`` + vectors written as
    bucket-partitioned parquet (one directory per inverted list, so a
    query run reads ONLY its probe buckets — partition pruning at the
    read — and a failed build can re-run; the assignment pass is an
    actor-pool map with the centroid matrix shipped once). Returns the
    manifest (also written to ``manifest.json``)."""
    import json
    import os

    import pyarrow.parquet as pq

    centroids = _train_centroids(emb, n_centroids, vec_col, seed, sample_size)
    os.makedirs(index_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "centroid_id": pa.array(range(len(centroids)), pa.int64()),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(centroids.reshape(-1)), centroids.shape[1]
                ),
            }
        ),
        os.path.join(index_dir, "centroids.parquet"),
    )
    cent_ref = ray.put(centroids)

    def assign_keep(t: pa.Table) -> pa.Table:
        x = _normalize(_vecs_from_column(t[vec_col], t.num_rows))
        b = (x @ _normalize(ray.get(cent_ref)).T).argmax(axis=1).astype(np.int64)
        # bucket twice: `bucket` becomes the partition path (dropped
        # from the files), `b` stays a regular column for the reader
        return pa.table(
            {
                id_col: t[id_col],
                vec_col: t[vec_col],
                "b": pa.array(b),
                "bucket": pa.array(b),
            }
        )

    emb.map_batches(assign_keep, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "vectors"), partition_cols=["bucket"]
    )
    manifest = {
        "n_centroids": int(len(centroids)),
        "dim": int(centroids.shape[1]),
        "id_col": id_col,
        "vec_col": vec_col,
        "seed": seed,
    }
    with open(os.path.join(index_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def ivf_index_query(
    index_dir: str,
    query_ids: "list[int] | np.ndarray",
    query_vecs: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
) -> pa.Table:
    """Query a persisted IVF index: probe the ``n_probe`` nearest
    inverted lists per query, reading ONLY those bucket directories.
    (query_id, neighbor_id, sim, rnk) — identical output (same
    centroids, probes, and tie rule) to the in-line ``ivf_topk`` when
    the index was built with the same parameters (parity-tested)."""
    import json
    import os

    import pyarrow.parquet as pq

    with open(os.path.join(index_dir, "manifest.json")) as f:
        man = json.load(f)
    id_col, vec_col = man["id_col"], man["vec_col"]
    ct = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    centroids = _vecs_from_column(ct["vec"], ct.num_rows)
    q_ids = np.asarray(query_ids, dtype=np.int64)
    q_mat = _normalize(np.asarray(query_vecs, dtype=np.float64))
    probes = np.argsort(-(q_mat @ _normalize(centroids).T), axis=1)[:, :n_probe]
    needed = sorted({int(b) for row in probes for b in row})
    probe_map: dict[int, list[tuple[int, np.ndarray]]] = {}
    for r in range(len(q_ids)):
        for b in probes[r]:
            probe_map.setdefault(int(b), []).append((int(q_ids[r]), q_mat[r]))
    pm_ref = ray.put(probe_map)

    import glob

    paths = [
        f
        for b in needed
        for f in sorted(
            glob.glob(os.path.join(index_dir, "vectors", f"bucket={b}", "*.parquet"))
        )
    ]
    if not paths:
        return pa.table(
            {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
             "sim": pa.array([], pa.float64()), "rnk": pa.array([], pa.int64())}
        )
    ds = ray.data.read_parquet(paths)

    def search(t: pa.Table) -> pa.Table:
        pm = ray.get(pm_ref)
        bs = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _normalize(_vecs_from_column(t[vec_col], t.num_rows))
        out_q, out_n, out_s = [], [], []
        for b in np.unique(bs):
            qs = pm.get(int(b))
            if not qs:
                continue
            m = bs == b
            bi, bx = ids[m], x[m]
            for qid, qv in qs:
                s = bx @ qv
                cand = np.flatnonzero(bi != qid)
                if not len(cand):
                    continue
                order = np.lexsort((bi[cand], -s[cand]))[: min(k, len(cand))]
                out_q.append(np.full(len(order), qid))
                out_n.append(bi[cand][order])
                out_s.append(s[cand][order])
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    cand = collect_table(ds.map_batches(search, batch_format="pyarrow"))
    qv = cand["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    nv = cand["neighbor_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    sv = cand["sim"].to_numpy(zero_copy_only=False).astype(np.float64)
    out_q, out_n, out_s, out_r = [], [], [], []
    for qid in np.unique(qv):
        m = qv == qid
        # dedupe (a neighbor may appear in several probed buckets only
        # if buckets overlapped — they don't — but batches may split a
        # bucket, so per-pair keep the single sim value)
        order = np.lexsort((nv[m], -sv[m]))[:k]
        out_q.append(np.full(len(order), qid))
        out_n.append(nv[m][order])
        out_s.append(sv[m][order])
        out_r.append(np.arange(1, len(order) + 1, dtype=np.int64))
    if not out_q:
        return pa.table(
            {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
             "sim": pa.array([], pa.float64()), "rnk": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_n)),
            "sim": pa.array(np.concatenate(out_s)),
            "rnk": pa.array(np.concatenate(out_r)),
        }
    )


def label_affinity(
    embeddings: "ray.data.Dataset",
    vec_col: str = "embedding",
    label_col: str = "label",
    grid: int = 10_000,
) -> pa.Table:
    """(label_a, label_b, cosine) for every label pair a < b: cosine
    between the per-label MEAN embeddings — the class-drift /
    source-affinity diagnostic. Means never materialize: cosine is
    scale-invariant, so cos = Σ_d Sa_d·Sb_d / √(ΣSa²·ΣSb²) over the
    EXACT integer grid sums S (the label_centroids quantization), all
    products merged as Python ints; ONE float expression at readout
    (float(int) is correctly rounded, mirroring SQL's VARCHAR→DOUBLE
    route), floored to the 1e-9 grid."""
    import math

    from ray.data.aggregate import Sum

    from ugfraud_ray.functions.collect import collect_table

    def partials(t: pa.Table) -> pa.Table:
        v = _vecs_from_column(t[vec_col], t.num_rows).astype(np.float64)
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.floor(v * grid + 0.5).astype(np.int64)
        ulab, inv = np.unique(lab, return_inverse=True)
        k, d = len(ulab), v.shape[1]
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, inv, q)
        return pa.table(
            {
                "label": pa.array(np.repeat(ulab, d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
                "qsum": pa.array(sums.reshape(-1)),
            }
        )

    agg = collect_table(
        embeddings.select_columns([label_col, vec_col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("qsum", alias_name="qsum"))
    )
    labs = agg["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    dims = agg["dim"].to_numpy(zero_copy_only=False).astype(np.int64)
    qs = agg["qsum"].to_numpy(zero_copy_only=False).astype(np.int64)
    ulab = np.unique(labs)
    D = int(dims.max()) + 1 if len(dims) else 0
    S = {}
    for lb in ulab.tolist():
        m = labs == lb
        row = np.zeros(D, dtype=object)
        row[dims[m]] = [int(x) for x in qs[m]]
        S[lb] = row
    n2 = {lb: sum(int(x) * int(x) for x in S[lb]) for lb in ulab.tolist()}
    la_out, lb_out, cos_out = [], [], []
    for i, a in enumerate(ulab.tolist()):
        for b in ulab.tolist()[i + 1 :]:
            num = sum(int(x) * int(y) for x, y in zip(S[a], S[b]))
            denom = math.sqrt(float(n2[a]) * float(n2[b]))
            c = float(num) / denom if denom > 0 else 0.0
            la_out.append(a)
            lb_out.append(b)
            cos_out.append(math.floor(c * 1e9 + 0.5) / 1e9)
    return pa.table(
        {
            "label_a": pa.array(la_out, pa.int64()),
            "label_b": pa.array(lb_out, pa.int64()),
            "cosine": pa.array(cos_out, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# Distributed k-means (Lloyd) — exact-integer arithmetic end to end
# ---------------------------------------------------------------------------


def _quantize_block(
    t: pa.Table, vec_col: str, grid: int, shift: int
) -> np.ndarray:
    """float list column -> shifted int64 grid: q = floor(x*grid+0.5) + shift*grid.

    The shift keeps every quantity non-negative so truncating and floor
    division coincide (DuckDB ``//`` truncates toward zero; numpy ``//``
    floors — they only agree on non-negative operands). Distances are
    shift-invariant, so clustering is unaffected.
    """
    v = _vecs_from_column(t[vec_col], t.num_rows)
    q = np.floor(v * grid + 0.5).astype(np.int64) + shift * grid
    if q.min(initial=0) < 0:
        raise ValueError(
            f"embedding values below -{shift}; raise kmeans(shift=...)"
        )
    return q


def _kmeans_seeds(
    emb: "ray.data.Dataset", k: int, id_col: str, vec_col: str, grid: int, shift: int
) -> np.ndarray:
    """Deterministic seeding: the k vectors with the smallest
    (md5-low64(id), id) key — a seeded uniform draw both sides can
    replay (DuckDB: ORDER BY md5_number_upper(CAST(id AS VARCHAR)), id).
    Per-block top-k partials -> driver merge of <= k x blocks rows;
    the corpus never leaves the cluster."""
    from ugfraud_ray.pipelines.sketches import _md5_low64

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _md5_low64(ids.tolist())
        order = np.lexsort((ids, h))[:k]
        q = _quantize_block(t, vec_col, grid, shift)[order]
        return pa.table(
            {
                "h": pa.array(h[order].astype(np.uint64)),
                "id": pa.array(ids[order]),
                "q": pa.array(q.tolist()),
            }
        )

    top = collect_table(
        emb.select_columns([id_col, vec_col]).map_batches(
            partial, batch_format="pyarrow"
        )
    )
    h = top["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = top["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, h))[:k]
    return np.array(top["q"].to_pylist(), dtype=np.int64)[order]


def kmeans(
    emb: "ray.data.Dataset",
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    grid: int = 1000,
    cgrid: int = 1000,
    shift: int = 8,
) -> "ray.data.Dataset":
    """Distributed Lloyd k-means over an embedding column; returns
    Dataset(id_col, cluster, d2) — the final assignment and its exact
    squared distance in integer grid units.

    Every quantity is an exact integer, so the result is bit-identical
    to the SQL replay regardless of block order or parallelism:

    - inputs quantized once per pass onto a 1/grid grid and shifted
      non-negative (see ``_quantize_block``);
    - centroids live on a 1/(grid*cgrid) grid: C = half-up(mean(q)*cgrid)
      via non-negative integer division (qsum*2*cgrid + n) // (2*n),
      merged on the driver with Python ints (k*dim values — no overflow
      whatever the per-cluster count);
    - distances D_j = sum_d (q_d*cgrid - C_jd)^2 expanded as
      |Q|^2 - 2 Q.C + |C|^2 with int64 matmuls (bounds: |x|<=shift,
      dim<=~500 keep every term < 2^62); argmin ties go to the lowest
      cluster id on both sides;
    - empty clusters keep their previous centroid (SQL: COALESCE against
      the prior iteration's centroid table).

    Scale shape: iters+1 streaming passes over the (pruned id+vec)
    dataset; per pass ONE tiny groupby over k*dim partial rows; the
    (k x dim) centroid matrix is the only broadcast (ray.put per round).
    Reference analog: none (UGFraud has no clustering); this is the
    training-data-curation operator (corpus bucketing / diversity
    sampling) built on the label_centroids exact-sum pattern.
    """
    src = emb.select_columns([id_col, vec_col])
    C = _kmeans_fit(emb, k, iters, id_col, vec_col, grid, cgrid, shift)
    cref = ray.put(C)

    def final(t: pa.Table, _cref=cref) -> pa.Table:
        Cm = ray.get(_cref)
        q = _quantize_block(t, vec_col, grid, shift)
        D = _dist2(q, Cm, cgrid)
        assign = np.argmin(D, axis=1)
        return pa.table(
            {
                id_col: t[id_col],
                "cluster": pa.array(assign.astype(np.int64)),
                "d2": pa.array(D[np.arange(len(q)), assign]),
            }
        )

    return src.map_batches(final, batch_format="pyarrow")


def _dist2(q: np.ndarray, C: np.ndarray, cgrid: int) -> np.ndarray:
    qq = (q * q).sum(axis=1) * (cgrid * cgrid)
    cross = (q @ C.T) * cgrid
    cc = (C * C).sum(axis=1)
    return qq[:, None] - 2 * cross + cc[None, :]


def _kmeans_fit(
    emb: "ray.data.Dataset",
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
    grid: int,
    cgrid: int,
    shift: int,
) -> np.ndarray:
    """The Lloyd fit loop of :func:`kmeans`, returning the final integer
    centroid matrix (k x dim, 1/(grid*cgrid) units) so other operators
    (``semdedup``) can assign clusters without re-deriving the chain."""
    from ray.data.aggregate import Sum

    C = _kmeans_seeds(emb, k, id_col, vec_col, grid, shift) * cgrid
    src = emb.select_columns([id_col, vec_col])

    def dist2(q: np.ndarray, C: np.ndarray) -> np.ndarray:
        return _dist2(q, C, cgrid)

    for _ in range(iters):
        cref = ray.put(C)

        def partials(t: pa.Table, _cref=cref) -> pa.Table:
            Cm = ray.get(_cref)
            q = _quantize_block(t, vec_col, grid, shift)
            assign = np.argmin(dist2(q, Cm), axis=1)
            d = q.shape[1]
            sums = np.zeros((len(Cm), d), dtype=np.int64)
            np.add.at(sums, assign, q)
            cnt = np.bincount(assign, minlength=len(Cm)).astype(np.int64)
            nz = np.flatnonzero(cnt)
            return pa.table(
                {
                    "cluster": pa.array(np.repeat(nz, d)),
                    "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(nz))),
                    "qsum": pa.array(sums[nz].reshape(-1)),
                    "n": pa.array(np.repeat(cnt[nz], d)),
                }
            )

        agg = collect_table(
            src.map_batches(partials, batch_format="pyarrow")
            .groupby(["cluster", "dim"])
            .aggregate(Sum("qsum", alias_name="qsum"), Sum("n", alias_name="n"))
        )
        newC = C.copy()
        for c_, d_, qs_, n_ in zip(
            agg["cluster"].to_pylist(),
            agg["dim"].to_pylist(),
            agg["qsum"].to_pylist(),
            agg["n"].to_pylist(),
        ):
            newC[c_, d_] = (int(qs_) * 2 * cgrid + int(n_)) // (2 * int(n_))
        C = newC

    return C


def semdedup(
    emb: "ray.data.Dataset",
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    grid: int = 1000,
    cgrid: int = 1000,
    shift: int = 8,
    sim2_num: int = 81,
    sim2_den: int = 100,
) -> "ray.data.Dataset":
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embeddings, then inside each
    cluster drop every vector that has a cosine-similar neighbour with a
    smaller id (keep-lowest-id greedy). Returns
    Dataset(id_col, cluster, kept) with kept in {0, 1}.

    Exactness: the cluster assignment is :func:`kmeans`'s integer chain;
    the cosine test is evaluated WITHOUT division or sqrt —
    ``cos(a, b) >= t``  (t^2 = sim2_num/sim2_den, default 0.9^2) iff
    ``s > 0 and s*s*sim2_den >= sim2_num * |a|^2 * |b|^2`` over the
    signed 1/grid quantization s = qa.qb, so both sides replay
    bit-exactly (SQL mirrors the same predicate on HUGEINTs). Zero
    vectors (s = 0) never drop and are never dropped.

    Scale shape: one k-means fit (iters+1 streaming passes), one
    assignment pass with the (k x dim) centroid matrix as the only
    broadcast, then ONE groupby(cluster) whose kernel is an
    O(|cluster|^2 dim) int64 matmul — the SemDeDup contract is that k
    is chosen so clusters stay small (paper: ~50k clusters for 600M
    docs); the all-pairs work never crosses clusters. int64 overflow is
    guarded: a cluster whose bound exceeds 2^62 falls back to exact
    Python-int (object dtype) arithmetic.

    Reference analog: none (UGFraud has no embedding ops); this is the
    training-data-curation operator next to exact/minhash dedup.
    """
    src = emb.select_columns([id_col, vec_col])
    C = _kmeans_fit(emb, k, iters, id_col, vec_col, grid, cgrid, shift)
    cref = ray.put(C)

    def assign(t: pa.Table, _cref=cref) -> pa.Table:
        Cm = ray.get(_cref)
        q = _quantize_block(t, vec_col, grid, shift)
        a = np.argmin(_dist2(q, Cm, cgrid), axis=1)
        return pa.table(
            {
                id_col: t[id_col],
                "cluster": pa.array(a.astype(np.int64)),
                # signed 1/grid quantization (same rounding, shift removed)
                "q": pa.array((q - shift * grid).tolist()),
            }
        )

    assigned = src.map_batches(assign, batch_format="pyarrow")

    def prune(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        q = np.array(g["q"].to_pylist(), dtype=np.int64)[order]
        n = len(ids)
        if n == 1:
            kept = np.ones(1, dtype=np.int64)
        else:
            qmax = int(np.abs(q).max(initial=0))
            dim = q.shape[1]
            s_bound = dim * qmax * qmax
            # every product below must stay < 2^62; else exact Python ints
            if max(s_bound * s_bound * sim2_den, sim2_num * s_bound * s_bound) < 2**62:
                S = q @ q.T
                n2 = (q * q).sum(axis=1)
                close = (S > 0) & (
                    S.astype(np.int64) ** 2 * sim2_den >= sim2_num * np.outer(n2, n2)
                )
            else:  # pragma: no cover - exercised by the overflow pytest
                qo = q.astype(object)
                S = qo @ qo.T
                n2 = (qo * qo).sum(axis=1)
                close = (S > 0) & (S * S * sim2_den >= sim2_num * np.outer(n2, n2))
            # drop j iff some i with a smaller id is close (strict lower tri)
            kept = (~np.tril(close, k=-1).any(axis=1)).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids),
                "cluster": g["cluster"].take(pa.array(order)),
                "kept": pa.array(kept),
            }
        )

    return assigned.groupby("cluster").map_groups(prune, batch_format="pyarrow")


def kcenter_sample(
    emb: "ray.data.Dataset",
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    grid: int = 1000,
) -> pa.Table:
    """Greedy farthest-point (Gonzalez) k-center coreset over an
    embedding column — the classic diversity-sampling / coreset
    selection pass of a curation pipeline. Returns a k-row table
    (rank, id, d2): the selection order and each pick's exact squared
    distance to the previously-chosen set (seed d2 = 0).

    Exact-integer end to end — vectors quantized to 1/grid, distances
    are int64 sums of squared differences, NO division anywhere — so
    the greedy trajectory is bit-identical to the SQL replay. Seed =
    smallest (md5-low64(id), id); each round picks the not-yet-chosen
    point with max min-distance to the chosen set, ties to lowest id.

    Scale shape: k-1 streaming passes; each pass recomputes min-dist
    against the <= k chosen vectors (tiny, shipped in the closure) and
    reduces per-block (argmax, id, qvec) partials — rows leaving a
    block: ONE. O(k^2 n d) total work, no shuffle at all.
    """
    from ugfraud_ray.pipelines.sketches import _md5_low64

    src = emb.select_columns([id_col, vec_col])

    def quant(t: pa.Table) -> np.ndarray:
        v = _vecs_from_column(t[vec_col], t.num_rows)
        return np.floor(v * grid + 0.5).astype(np.int64)

    # --- seed: min (md5, id), per-block partial -> driver merge
    def seed_partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _md5_low64(ids.tolist())
        j = np.lexsort((ids, h))[0]
        return pa.table(
            {
                "h": pa.array([h[j]], pa.uint64()),
                "id": pa.array([ids[j]]),
                "q": pa.array([quant(t)[j].tolist()]),
            }
        )

    top = collect_table(src.map_batches(seed_partial, batch_format="pyarrow"))
    j = np.lexsort(
        (
            top["id"].to_numpy(zero_copy_only=False).astype(np.int64),
            top["h"].to_numpy(zero_copy_only=False).astype(np.uint64),
        )
    )[0]
    chosen_ids = [int(top["id"][j].as_py())]
    chosen_q = [np.array(top["q"][j].as_py(), dtype=np.int64)]
    chosen_d2 = [0]

    for _ in range(1, k):
        C = np.stack(chosen_q)
        ids_arr = np.array(chosen_ids, dtype=np.int64)

        def far_partial(t: pa.Table, _C=C, _ids=ids_arr) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            q = quant(t)
            qq = (q * q).sum(axis=1)
            cc = (_C * _C).sum(axis=1)
            D = qq[:, None] - 2 * (q @ _C.T) + cc[None, :]
            dmin = D.min(axis=1)
            keep = ~np.isin(ids, _ids)
            if not keep.any():
                return pa.table(
                    {"d": pa.array([], pa.int64()), "id": pa.array([], pa.int64()),
                     "q": pa.array([], pa.list_(pa.int64()))}
                )
            ids, q, dmin = ids[keep], q[keep], dmin[keep]
            j = np.lexsort((ids, -dmin))[0]
            return pa.table(
                {"d": pa.array([dmin[j]]), "id": pa.array([ids[j]]),
                 "q": pa.array([q[j].tolist()])}
            )

        part = collect_table(src.map_batches(far_partial, batch_format="pyarrow"))
        d = part["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        pid = part["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(d) == 0:
            break
        j = np.lexsort((pid, -d))[0]
        chosen_ids.append(int(pid[j]))
        chosen_q.append(np.array(part["q"][j].as_py(), dtype=np.int64))
        chosen_d2.append(int(d[j]))

    return pa.table(
        {
            "rank": pa.array(np.arange(len(chosen_ids), dtype=np.int64)),
            id_col: pa.array(chosen_ids, pa.int64()),
            "d2": pa.array(chosen_d2, pa.int64()),
        }
    )


def embedding_covariance(
    emb: "ray.data.Dataset",
    vec_col: str = "embedding",
    grid: int = 1000,
) -> pa.Table:
    """Upper-triangle covariance matrix of the (1/grid-quantized)
    embedding column: rows (i, j, cov) for i <= j — the input stage of
    PCA / whitening / decorrelation over a corpus.

    Exact integer partials: per block ONE d x d int64 matmul (q.T @ q)
    plus the column sums; the driver merges <= d^2 Python ints (no
    overflow whatever n) and applies the single mirrored float readout
    cov = (n*S_ij - S_i*S_j) / (n^2 * grid^2), floored half-up to 1e-9.
    int64 partial bound: |x| <= 8 and grid=1000 keep per-block sums
    exact up to ~1e11 rows/block; beyond that split hi/lo like
    functions/numerics. No shuffle at all — one streaming pass, the
    only reduce is the d^2-row partials table.
    """
    src = emb.select_columns([vec_col])

    def partial(t: pa.Table) -> pa.Table:
        v = _vecs_from_column(t[vec_col], t.num_rows)
        q = np.floor(v * grid + 0.5).astype(np.int64)
        d = q.shape[1]
        S = q.T @ q
        iu, ju = np.triu_indices(d)
        sq = q.sum(axis=0)
        return pa.table(
            {
                "i": pa.array(np.concatenate([iu, np.arange(d), [-1]]).astype(np.int64)),
                "j": pa.array(np.concatenate([ju, np.full(d, -1), [-1]]).astype(np.int64)),
                "v": pa.array(
                    np.concatenate([S[iu, ju], sq, [t.num_rows]]).astype(np.int64)
                ),
            }
        )

    from ray.data.aggregate import Sum

    agg = collect_table(
        src.map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("v", alias_name="v"))
    )
    ii = agg["i"].to_numpy(zero_copy_only=False).astype(np.int64)
    jj = agg["j"].to_numpy(zero_copy_only=False).astype(np.int64)
    vv = [int(x) for x in agg["v"].to_pylist()]
    n = next(v for i_, j_, v in zip(ii, jj, vv) if i_ == -1 and j_ == -1)
    sums = {int(i_): v for i_, j_, v in zip(ii, jj, vv) if j_ == -1 and i_ >= 0}
    import math

    out_i, out_j, out_c = [], [], []
    denom = float(n) * float(n) * grid * grid
    for i_, j_, v in sorted(zip(ii.tolist(), jj.tolist(), vv)):
        if i_ < 0 or j_ < 0:
            continue
        num = n * v - sums[i_] * sums[j_]
        out_i.append(i_)
        out_j.append(j_)
        out_c.append(math.floor(float(num) / denom * 1e9 + 0.5) / 1e9)
    return pa.table(
        {
            "i": pa.array(out_i, pa.int64()),
            "j": pa.array(out_j, pa.int64()),
            "cov": pa.array(out_c, pa.float64()),
        }
    )


def pca_project(
    emb: "ray.data.Dataset",
    n_components: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    grid: int = 1000,
) -> "ray.data.Dataset":
    """Project every embedding onto the top principal components of the
    (1/grid-quantized) corpus: Dataset(id, pc0.., pc1..) — the
    visualization / decorrelation / whitening head on top of
    ``embedding_covariance``.

    Determinism: the covariance matrix is exact-integer (see
    embedding_covariance), the d x d eigendecomposition runs ONCE on the
    driver (np.linalg.eigh on the same float64 matrix every run), and
    each eigenvector's sign is pinned (largest-|component| entry made
    positive, first index on ties). Projection is one broadcast matmul
    per batch. No SQL oracle (eigh is not SQL-expressible) — rows-only
    query; pytest checks variance ordering + reconstruction against a
    direct numpy PCA.
    """
    cov_t = embedding_covariance(emb, vec_col=vec_col, grid=grid)
    ii = cov_t["i"].to_numpy(zero_copy_only=False).astype(np.int64)
    jj = cov_t["j"].to_numpy(zero_copy_only=False).astype(np.int64)
    cc = cov_t["cov"].to_numpy(zero_copy_only=False)
    d = int(ii.max()) + 1
    C = np.zeros((d, d), dtype=np.float64)
    C[ii, jj] = cc
    C[jj, ii] = cc
    w, v = np.linalg.eigh(C)
    order = np.argsort(-w)[:n_components]
    comps = v[:, order].T  # (n_components, d)
    for r in range(len(comps)):
        m = np.argmax(np.abs(np.round(comps[r], 12)))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    comps_ref = ray.put(np.ascontiguousarray(comps))

    def project(t: pa.Table) -> pa.Table:
        P = ray.get(comps_ref)
        x = _vecs_from_column(t[vec_col], t.num_rows)
        q = np.floor(x * grid + 0.5) / grid
        proj = q @ P.T
        cols = {id_col: t[id_col]}
        for r in range(proj.shape[1]):
            cols[f"pc{r}"] = pa.array(np.round(proj[:, r], 9))
        return pa.table(cols)

    return emb.select_columns([id_col, vec_col]).map_batches(
        project, batch_format="pyarrow"
    )


def product_quantize(
    emb: "ray.data.Dataset",
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    grid: int = 1000,
    cgrid: int = 1000,
    shift: int = 8,
) -> "ray.data.Dataset":
    """Product quantization (Jegou, Douze & Schmid 2011, the IVF-PQ ANN
    index workhorse): split the embedding into ``m`` contiguous
    subspaces, Lloyd-fit a ``k``-codeword codebook per subspace with the
    repo's exact-integer :func:`kmeans` chain (same deterministic
    md5-rank seeding, same half-up integer re-centering), then assign
    every vector its m codes. Returns
    Dataset(id_col, code_0..code_{m-1}, d2) where d2 is the EXACT
    integer squared reconstruction error (sum of per-subspace
    assignment distances on the 1/(grid*cgrid) lattice) — the
    compression-loss readout, m*log2(k) bits per vector.

    Everything stays integer, so the SQL oracle replays the full m-fold
    chain bit-exactly (argmin ties to the lowest codeword on both
    sides). Scale shape: m small fits (each iters+1 streaming passes
    over a dsub-wide slice; the codebooks are m*k*dsub ints broadcast
    once via ``ray.put``), then ONE assignment pass; nothing
    corpus-sized ever materializes.
    """
    first = emb.take(1)[0][vec_col]
    dim = len(first)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    src = emb.select_columns([id_col, vec_col])

    codebooks = []
    for s in range(m):
        lo = s * dsub

        def slice_s(t: pa.Table, _lo=lo) -> pa.Table:
            v = _vecs_from_column(t[vec_col], t.num_rows)
            return pa.table(
                {
                    id_col: t[id_col],
                    "sub": pa.array(v[:, _lo : _lo + dsub].tolist()),
                }
            )

        sliced = src.map_batches(slice_s, batch_format="pyarrow")
        codebooks.append(
            _kmeans_fit(sliced, k, iters, id_col, "sub", grid, cgrid, shift)
        )
    cref = ray.put(np.stack(codebooks))  # m x k x dsub ints

    def assign(t: pa.Table, _cref=cref) -> pa.Table:
        C = ray.get(_cref)
        q = _quantize_block(t, vec_col, grid, shift)
        cols = {id_col: t[id_col]}
        d2tot = np.zeros(t.num_rows, dtype=np.int64)
        for s in range(m):
            d2 = _dist2(q[:, s * dsub : (s + 1) * dsub], C[s], cgrid)
            code = np.argmin(d2, axis=1) if t.num_rows else np.zeros(0, np.int64)
            cols[f"code_{s}"] = pa.array(code.astype(np.int64))
            if t.num_rows:
                d2tot += d2[np.arange(len(code)), code]
        cols["d2"] = pa.array(d2tot)
        return pa.table(cols)

    return src.map_batches(assign, batch_format="pyarrow")


def ivf_pq_topk(
    emb: "ray.data.Dataset",
    query_ids: list[int],
    k: int = 10,
    kc: int = 4,
    nprobe: int = 2,
    m: int = 4,
    kpq: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    grid: int = 1000,
    cgrid: int = 1000,
    shift: int = 8,
) -> "ray.data.Dataset":
    """IVF-PQ approximate nearest neighbours (Jegou et al. 2011 §IV —
    the billion-vector ANN shape): coarse-quantize the corpus with the
    exact-integer :func:`kmeans` chain, probe the ``nprobe`` closest
    coarse cells per query, and rank ONLY the probed cells' vectors by
    the asymmetric PQ distance (query against each candidate's
    reconstructed codeword, the classic ADC table lookup). Everything
    stays on the integer lattice, so unlike the float IVF variant this
    composite is fully SQL-replayable — ties break (d2, vec_id).

    Returns (query_id, neighbor_id, d2, rnk), self-matches excluded.

    Scale shape: coarse centroids (kc x dim ints) and PQ codebooks
    (m x kpq x dsub ints) broadcast once; ONE corpus pass assigns the
    coarse cell + PQ codes per batch, keeps only probed-cell rows, and
    emits per-block top-k partials; the driver merges
    <= blocks x queries x k rows. The ADC tables are queries x m x kpq
    integers — independent of corpus size.
    """
    first = emb.take(1)[0][vec_col]
    dim = len(first)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    src = emb.select_columns([id_col, vec_col])

    # coarse codebook over the full dim range
    C = _kmeans_fit(src, kc, iters, id_col, vec_col, grid, cgrid, shift)

    # PQ codebooks per contiguous subspace
    books = []
    for s in range(m):
        lo = s * dsub

        def slice_s(t: pa.Table, _lo=lo) -> pa.Table:
            v = _vecs_from_column(t[vec_col], t.num_rows)
            return pa.table(
                {id_col: t[id_col], "sub": pa.array(v[:, _lo : _lo + dsub].tolist())}
            )

        books.append(
            _kmeans_fit(
                src.map_batches(slice_s, batch_format="pyarrow"),
                kpq, iters, id_col, "sub", grid, cgrid, shift,
            )
        )
    B = np.stack(books)  # m x kpq x dsub

    # query vectors (tiny): quantize, probe cells, build ADC tables
    qset = set(int(q) for q in query_ids)

    def pick_queries(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(ids, list(qset))))

    qt = collect_table(src.map_batches(pick_queries, batch_format="pyarrow"))
    q_ids = qt[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(q_ids)
    qt = qt.take(pa.array(order))
    q_ids = q_ids[order]
    qq = _quantize_block(qt, vec_col, grid, shift)  # nq x dim ints
    dc = _dist2(qq, C, cgrid)  # nq x kc
    # nprobe smallest cells, ties to lowest cluster id
    probe = np.argsort(dc, axis=1, kind="stable")[:, :nprobe]
    adc = np.zeros((len(q_ids), m, kpq), dtype=np.int64)
    for s in range(m):
        adc[:, s, :] = _dist2(qq[:, s * dsub : (s + 1) * dsub], B[s], cgrid)
    bc = ray.put((q_ids, probe, adc, C, B))

    def local_topk(t: pa.Table) -> pa.Table:
        qi, pr, ad, Cm, Bm = ray.get(bc)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        q = _quantize_block(t, vec_col, grid, shift)
        cell = np.argmin(_dist2(q, Cm, cgrid), axis=1)
        # PQ-code only rows some query probes (~nprobe/kc of the block);
        # unprobed rows never rank, so their codes would be wasted work
        probed = np.isin(cell, np.unique(pr))
        codes = np.zeros((len(ids), m), dtype=np.int64)
        if probed.any():
            qp = q[probed]
            for s in range(m):
                codes[probed, s] = np.argmin(
                    _dist2(qp[:, s * dsub : (s + 1) * dsub], Bm[s], cgrid), axis=1
                )
        out_q, out_n, out_d = [], [], []
        for qi_idx in range(len(qi)):
            cand = np.isin(cell, pr[qi_idx]) & (ids != qi[qi_idx])
            if not cand.any():
                continue
            cids = ids[cand]
            d2 = np.zeros(len(cids), dtype=np.int64)
            for s in range(m):
                d2 += ad[qi_idx, s, codes[cand, s]]
            sel = np.lexsort((cids, d2))[:k]
            out_q.append(np.full(len(sel), qi[qi_idx], dtype=np.int64))
            out_n.append(cids[sel])
            out_d.append(d2[sel])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "d2": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "d2": pa.array(np.concatenate(out_d)),
            }
        )

    parts = collect_table(src.map_batches(local_topk, batch_format="pyarrow"))
    qv = parts["query_id"].to_numpy(zero_copy_only=False)
    nv = parts["neighbor_id"].to_numpy(zero_copy_only=False)
    dv = parts["d2"].to_numpy(zero_copy_only=False)
    rows = {"query_id": [], "neighbor_id": [], "d2": [], "rnk": []}
    for qid in np.unique(qv):
        mask = qv == qid
        sel = np.lexsort((nv[mask], dv[mask]))[:k]
        rows["query_id"].extend([qid] * len(sel))
        rows["neighbor_id"].extend(nv[mask][sel].tolist())
        rows["d2"].extend(dv[mask][sel].tolist())
        rows["rnk"].extend(range(1, len(sel) + 1))
    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(rows["query_id"], pa.int64()),
                "neighbor_id": pa.array(rows["neighbor_id"], pa.int64()),
                "d2": pa.array(rows["d2"], pa.int64()),
                "rnk": pa.array(rows["rnk"], pa.int64()),
            }
        )
    )


def cluster_outliers(
    emb: "ray.data.Dataset",
    k: int = 4,
    iters: int = 2,
    topn: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    grid: int = 1000,
    cgrid: int = 1000,
    shift: int = 8,
) -> "ray.data.Dataset":
    """Per-cluster embedding outliers: the topn vectors FARTHEST from
    their assigned k-means centroid, per cluster — the data-cleaning
    readout of the kmeans chain (mislabeled / off-manifold candidates).
    Returns Dataset(cluster, id, d2, rnk) with rnk 1..topn ordered by
    (d2 DESC, id ASC).

    Exactness: d2 is :func:`kmeans`'s exact integer squared distance,
    so the selection key is an integer and the SQL replay (the kmeans
    CTE chain + one ROW_NUMBER window) is bit-identical.

    Scale shape: the assignment pass streams; top-n per cluster is a
    merge semilattice, so each block emits at most k*topn partial rows
    and ONE tiny groupby(cluster) finishes — no global sort, the corpus
    never concentrates.

    Reference analog: fBox's per-degree percentile outlier cut
    (/root/reference Detector/fBox.py:72-98) — same shape (grouped
    order-statistic readout), embedding domain.
    """
    assigned = kmeans(
        emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        grid=grid, cgrid=cgrid, shift=shift,
    )

    def topn_block(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = t["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        d2 = t["d2"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.zeros(0, dtype=np.int64)
        for c in np.unique(cl):
            m = np.flatnonzero(cl == c)
            order = np.lexsort((ids[m], -d2[m]))[:topn]
            keep = np.concatenate([keep, m[order]])
        return pa.table(
            {"cluster": pa.array(cl[keep]), id_col: pa.array(ids[keep]),
             "d2": pa.array(d2[keep])}
        )

    def finish(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d2 = g["d2"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, -d2))[:topn]
        return pa.table(
            {
                "cluster": g["cluster"].take(pa.array(order)),
                id_col: pa.array(ids[order]),
                "d2": pa.array(d2[order]),
                "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return (
        assigned.map_batches(topn_block, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(finish, batch_format="pyarrow")
    )


def knn_graph(
    emb: "ray.data.Dataset",
    k: int = 4,
    iters: int = 2,
    nn: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    grid: int = 1000,
    cgrid: int = 1000,
    shift: int = 8,
) -> "ray.data.Dataset":
    """Cluster-local k-nearest-neighbour graph: kmeans-partition the
    embeddings (the SemDeDup small-cluster contract), then inside each
    cluster connect every vector to its nn nearest neighbours by EXACT
    integer squared L2 distance on the signed 1/grid quantization
    (ties: lower d2, then lower neighbour id). Returns
    Dataset(id_col, nbr_id, d2, rnk) — the input graph for knn-based
    curation (graph clustering over embeddings, label smoothing,
    connectivity diagnostics).

    Like semdedup, all-pairs work never crosses clusters: the kernel is
    ONE O(|cluster|^2 dim) int64 matmul per cluster, and the (k x dim)
    centroid matrix is the only broadcast. Vectors in singleton
    clusters emit no rows (both sides). int64 bounds are guarded the
    same way (fallback to exact Python ints past 2^62).

    Reference analog: none (UGFraud has no embedding ops); next to
    ann_topk (query-vs-corpus) this is the corpus-vs-corpus variant.
    """
    src = emb.select_columns([id_col, vec_col])
    C = _kmeans_fit(emb, k, iters, id_col, vec_col, grid, cgrid, shift)
    cref = ray.put(C)

    def assign(t: pa.Table, _cref=cref) -> pa.Table:
        Cm = ray.get(_cref)
        q = _quantize_block(t, vec_col, grid, shift)
        a = np.argmin(_dist2(q, Cm, cgrid), axis=1)
        return pa.table(
            {
                id_col: t[id_col],
                "cluster": pa.array(a.astype(np.int64)),
                "q": pa.array((q - shift * grid).tolist()),
            }
        )

    assigned = src.map_batches(assign, batch_format="pyarrow")

    def local_knn(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        q = np.array(g["q"].to_pylist(), dtype=np.int64)[order]
        n = len(ids)
        empty = pa.table(
            {id_col: pa.array([], pa.int64()), "nbr_id": pa.array([], pa.int64()),
             "d2": pa.array([], pa.int64()), "rnk": pa.array([], pa.int64())}
        )
        if n <= 1:
            return empty
        qmax = int(np.abs(q).max(initial=0))
        dim = q.shape[1]
        if dim * qmax * qmax * 4 < 2**62:
            S = q @ q.T
            n2 = (q * q).sum(axis=1)
            D = n2[:, None] + n2[None, :] - 2 * S
        else:  # pragma: no cover - same guard as semdedup's overflow path
            qo = q.astype(object)
            S = qo @ qo.T
            n2 = (qo * qo).sum(axis=1)
            D = (n2[:, None] + n2[None, :] - 2 * S).astype(object)
        take = min(nn, n - 1)
        out_src, out_nbr, out_d2, out_rnk = [], [], [], []
        for i in range(n):
            row = D[i].astype(np.int64) if D.dtype == object else D[i]
            key = np.lexsort((ids, row))
            key = key[key != i][:take]
            out_src.append(np.full(take, ids[i]))
            out_nbr.append(ids[key])
            out_d2.append(row[key])
            out_rnk.append(np.arange(1, take + 1, dtype=np.int64))
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_src)),
                "nbr_id": pa.array(np.concatenate(out_nbr)),
                "d2": pa.array(np.concatenate(out_d2).astype(np.int64)),
                "rnk": pa.array(np.concatenate(out_rnk)),
            }
        )

    return assigned.groupby("cluster").map_groups(local_knn, batch_format="pyarrow")


def jl_project(
    emb: "ray.data.Dataset",
    k: int = 8,
    seed: int = 7,
    grid: int = 10_000,
) -> "ray.data.Dataset":
    """(vec_id, proj: list<int64>) — Johnson-Lindenstrauss sparse sign
    projection to ``k`` dimensions, INTEGER-EXACT: the projection
    matrix is ±1 per (i, j) from the shared md5-low64 parity of
    "jl-{seed}-{i}-{j}" (== DuckDB md5_number_upper % 2), inputs ride
    the half-up 1/grid quantization (label_centroids' convention), and
    each output coordinate is an exact int64 signed sum — order-free,
    bit-replayable, and the JL guarantee only needs the signs to be
    i.i.d.-ish, which a cryptographic hash gives deterministically.
    The k x d sign matrix builds once per batch from the hash (tiny);
    ONE streaming pass, zero shuffles.
    """
    from ugfraud_ray.pipelines.sketches import _md5_low64

    def f(t: pa.Table) -> pa.Table:
        v = _vecs_from_column(t["embedding"], t.num_rows).astype(np.float64)
        n, d = v.shape
        q = np.floor(v * grid + 0.5).astype(np.int64)
        signs = np.empty((d, k), dtype=np.int64)
        for j in range(k):
            h = _md5_low64([f"jl-{seed}-{i}-{j}" for i in range(d)])
            signs[:, j] = np.where((h % np.uint64(2)) == 1, 1, -1)
        proj = q @ signs  # exact int64
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, k)),
                "j": pa.array(np.tile(np.arange(k, dtype=np.int64), n)),
                "val": pa.array(proj.reshape(-1)),
            }
        )

    return emb.select_columns(["vec_id", "embedding"]).map_batches(
        f, batch_format="pyarrow"
    )


def filtered_topk(
    emb: "ray.data.Dataset",
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int | None = 4,
) -> "ray.data.Dataset":
    """Filtered vector search: exact cosine top-k restricted to corpus
    vectors sharing the QUERY's label — the metadata-predicate ANN
    every vector store exposes (pre-filter semantics: the predicate
    applies BEFORE ranking, so k survivors are guaranteed when the
    label stratum has k members; post-filtering a plain top-k would
    not). Same shape as ``brute_force_topk``: broadcast query matrix +
    per-batch matmul + per-block top-k partials + one per-query merge —
    the filter is ONE extra vectorized mask per batch.

    Output: (query_id, neighbor_id, sim, rnk).
    """
    qset = set(int(q) for q in query_ids)

    def pick_queries(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(ids, list(qset))))

    qt = pa.concat_tables(
        ray.get(emb.map_batches(pick_queries, batch_format="pyarrow").to_arrow_refs())
    )
    q_ids = qt[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    q_lab = qt[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
    q_mat = _normalize(_vecs_from_column(qt[vec_col], len(qt)))
    q_ref = ray.put((q_ids, q_lab, q_mat))

    def local_topk(t: pa.Table) -> pa.Table:
        qi, ql, qm = ray.get(q_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _normalize(_vecs_from_column(t[vec_col], t.num_rows))
        sims = qm @ x.T
        out_q, out_n, out_s = [], [], []
        for r in range(len(qi)):
            cand = np.flatnonzero((lab == ql[r]) & (ids != qi[r]))
            if len(cand) == 0:
                continue
            sv = sims[r][cand]
            order = np.lexsort((ids[cand], -sv))[: min(k, len(cand))]
            out_q.append(np.full(len(order), qi[r]))
            out_n.append(ids[cand][order])
            out_s.append(sv[order])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    partial = emb.map_batches(local_topk, batch_format="pyarrow")

    def merge(g) -> pa.Table:
        sims = g["sim"].to_numpy().astype(np.float64)
        nid = g["neighbor_id"].to_numpy().astype(np.int64)
        qid = int(g["query_id"][0].as_py())
        order = np.lexsort((nid, -sims))[:k]
        s = sims[order]
        if round_to is not None:
            s = np.round(s, round_to)
        return pa.table(
            {
                "query_id": pa.array(np.full(len(order), qid)),
                "neighbor_id": pa.array(nid[order]),
                "sim": pa.array(s),
                "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return partial.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def label_scatter(
    emb: "ray.data.Dataset", grid: int = 10_000
) -> "ray.data.Dataset":
    """(label, n_vecs, var_trace) — per-label scatter (trace of the
    within-class covariance, the label-space discriminability readout
    next to embedding_label_affinity): from EXACT integer moments on
    the half-up 1/grid quantization — Sxx = Σ‖q‖² and per-dim Sx — via
    var_trace = (Sxx − Σ_d Sx_d²/n) / n / grid², one pinned float
    chain over Python-int totals (float(int) == CAST(VARCHAR) double),
    1e-9 readout. Per-block int64 partials bounded by labels × dims."""
    from ugfraud_ray.functions.collect import collect_table

    def partial(t: pa.Table) -> pa.Table:
        v = _vecs_from_column(t["embedding"], t.num_rows).astype(np.float64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.floor(v * grid + 0.5).astype(np.int64)
        ulab, inv = np.unique(lab, return_inverse=True)
        k, d = len(ulab), q.shape[1]
        sx = np.zeros((k, d), dtype=np.int64)
        np.add.at(sx, inv, q)
        sxx = np.zeros(k, dtype=np.int64)
        np.add.at(sxx, inv, (q * q).sum(axis=1))
        cnt = np.bincount(inv).astype(np.int64)
        rows = {
            "label": pa.array(np.repeat(ulab, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
            "sx": pa.array(sx.reshape(-1)),
            "sxx": pa.array(np.repeat(sxx, d) * 0 + np.where(
                np.tile(np.arange(d), k) == 0, np.repeat(sxx, d), 0
            )),
            "n": pa.array(np.where(np.tile(np.arange(d), k) == 0,
                                   np.repeat(cnt, d), 0)),
        }
        return pa.table(rows)

    from ray.data.aggregate import Sum

    base = collect_table(
        emb.select_columns(["vec_id", "embedding", "label"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("sx", alias_name="sx"), Sum("sxx", alias_name="sxx"),
                   Sum("n", alias_name="n"))
    ).to_pandas()
    out_l, out_n, out_v = [], [], []
    for lab, g in base.groupby("label"):
        n = int(g["n"].sum())
        sxx = int(g["sxx"].sum())
        sx = g.sort_values("dim")["sx"].to_numpy().astype(object)
        sum_sq = sum(int(x) * int(x) for x in sx)
        var = (float(sxx) - float(sum_sq) / n) / n / (grid * grid)
        out_l.append(int(lab))
        out_n.append(n)
        out_v.append(float(np.floor(var * 1e9 + 0.5) / 1e9))
    return ray.data.from_arrow(
        pa.table(
            {
                "label": pa.array(out_l, pa.int64()),
                "n_vecs": pa.array(out_n, pa.int64()),
                "var_trace": pa.array(out_v),
            }
        )
    )
