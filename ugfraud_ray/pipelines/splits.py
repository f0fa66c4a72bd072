"""Deterministic dataset splitting (train/valid/test) by key hash.

Every large training pipeline needs a split that is (a) stable across
runs and cluster sizes, (b) computable per batch with no shuffle, and
(c) replayable by any other system. Bucket = md5-low64 of the string
key, mod `mod` (== DuckDB ``md5_number_upper(CAST(id AS VARCHAR)) %
mod`` — the engine's shared hash convention, `pipelines/sketches.py`).
Split boundaries are cumulative bucket ranges, so fractions are exact
in expectation and assignment is a pure per-row function: embarrassing
parallel, no state, no coordination.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ugfraud_ray.pipelines.sketches import _md5_low64


def assign_splits(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    buckets: dict[str, int] | None = None,
    mod: int = 1000,
) -> "ray.data.Dataset":
    """Label every row: (id_col, bucket, split).

    `buckets` maps split name -> number of buckets, assigned in dict
    order from bucket 0; the remainder is 'train'. Default: 10% test,
    10% valid, 80% train.
    """
    buckets = {"test": 100, "valid": 100} if buckets is None else buckets
    if sum(buckets.values()) > mod:
        raise ValueError("split buckets exceed mod")
    # cumulative upper bounds in dict order
    names, bounds = [], []
    acc = 0
    for name, n in buckets.items():
        acc += n
        names.append(name)
        bounds.append(acc)

    def label(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        b = (_md5_low64([str(i) for i in ids]) % np.uint64(mod)).astype(np.int64)
        split = np.full(len(b), "train", dtype=object)
        lo = 0
        for name, hi in zip(names, bounds):
            split[(b >= lo) & (b < hi)] = name
            lo = hi
        return pa.table(
            {
                id_col: t[id_col],
                "bucket": pa.array(b),
                "split": pa.array(split, pa.string()),
            }
        )

    return ds.map_batches(label, batch_format="pyarrow")


def take_split(
    ds: "ray.data.Dataset",
    split: str,
    id_col: str = "doc_id",
    buckets: dict[str, int] | None = None,
    mod: int = 1000,
) -> "ray.data.Dataset":
    """Filter to one split, keeping ALL original columns (streaming)."""
    buckets = {"test": 100, "valid": 100} if buckets is None else buckets
    lo = 0
    hi = None
    for name, n in buckets.items():
        if name == split:
            hi = lo + n
            break
        lo += n
    if hi is None:  # train = remainder
        lo = sum(buckets.values())
        hi = mod

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        b = (_md5_low64([str(i) for i in ids]) % np.uint64(mod)).astype(np.int64)
        return t.filter(pa.array((b >= lo) & (b < hi)))

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_sample_topk(
    ds: "ray.data.Dataset",
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 7,
) -> "ray.data.Dataset":
    """Deterministic weighted sampling without replacement — the
    Efraimidis–Spirakis top-k: draw u_i from the md5 hash of
    f"{seed}:{id}" and keep the k rows with the largest u^(1/w), i.e.
    the largest ln(u)/w. Inclusion probability is proportional to the
    weight; the draw is a pure per-row function (stable across runs and
    cluster sizes) — the standard quality-weighted corpus-mixing
    primitive. No reference analog (random.sample at J4 is unweighted).

    Numeric replay contract (SQL oracle): u = (h>>11 + 1)/2^53 keeps
    both the shift and the divide EXACT in float64 on both sides; the
    single ln + divide may differ by ulps between libms, so selection
    orders by (round(key, 6) DESC, id ASC) — ties broken by id, and a
    boundary flip needs two keys within 1e-6, i.e. ulp-noise-proof.
    Output: (id, weight, key6), the selected k rows.

    Scale shape: per-block top-k inside map_batches (no state), then
    one sort over the ≤ k·num_blocks survivors.
    """
    pre = f"{seed}:"

    def score(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        h = _md5_low64([pre + str(i) for i in ids])
        u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) / float(1 << 53)
        with np.errstate(divide="ignore"):
            key = np.where(w > 0, np.log(u) / np.where(w > 0, w, 1.0), -np.inf)
        key6 = np.floor(key * 1e6 + 0.5) / 1e6
        keep = w > 0
        out = pa.table(
            {
                id_col: t[id_col].filter(pa.array(keep)),
                "weight": pa.array(w[keep]),
                "key6": pa.array(key6[keep]),
            }
        )
        if out.num_rows > k:  # per-block pre-prune, same order rule
            kk = out["key6"].to_numpy(zero_copy_only=False)
            ii = np.asarray(out[id_col].to_pylist())
            order = np.lexsort((ii, -kk))[:k]
            out = out.take(pa.array(np.sort(order)))
        return out

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["key6", id_col], descending=[True, False])
        .limit(k)
    )


def token_budget_sample(
    ds: "ray.data.Dataset",
    group_col: str,
    weight_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Greedy budget-capped sample per group: walk each group's rows in
    deterministic md5(id) order and keep the prefix whose running
    ``weight_col`` total stays ≤ ``budget`` — the mixture-building step
    after a mixture report ("give me ~N tokens per language, chosen
    reproducibly"). Output: (id, group, weight, cum) for every kept row.

    Distributed shape (the packing two-level ordered scan, no global
    sort): rows land in RANGE buckets of the md5 key (bucket = high
    bits, so bucket order == hash order), each bucket computes local
    per-group prefix sums + a per-(bucket, group) total, the driver
    prefix-sums the ≤ n_buckets × n_groups totals into offsets, and a
    second streaming pass emits cum = offset + local prefix and filters
    cum ≤ budget. All-integer, replayed exactly by a SQL cumulative
    window (SUM OVER PARTITION BY group ORDER BY md5_number_upper(id)).
    """
    import ray

    from ugfraud_ray.functions.bucketing import n_coarse_buckets
    from ugfraud_ray.functions.collect import collect_table

    nb = n_buckets or n_coarse_buckets()
    shift = np.uint64(64 - int(nb - 1).bit_length() if nb > 1 else 64)

    def key_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        h = _md5_low64([str(i) for i in ids])
        return pa.table(
            {
                id_col: t[id_col],
                group_col: t[group_col],
                weight_col: t[weight_col],
                "_h": pa.array(h),
                "_rb": pa.array((h >> shift).astype(np.int64)),
            }
        )

    def local_scan(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        grp = np.asarray(g[group_col].to_pylist(), dtype=object)
        w = g[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = g["_h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        rb = int(g["_rb"][0].as_py())
        # per-group ordered prefix inside the bucket: sort by (group,
        # h, id), then cumsum minus each group-run's base
        gi, inv = np.unique(grp, return_inverse=True)
        order = np.lexsort((ids, h, inv))
        ids, grp, w, h, inv = ids[order], grp[order], w[order], h[order], inv[order]
        cs = np.cumsum(w)
        starts = np.flatnonzero(np.concatenate([[True], np.diff(inv) != 0]))
        base = np.repeat(cs[starts] - w[starts], np.diff(np.append(starts, len(w))))
        local = cs - base
        totals = local[np.append(starts[1:] - 1, len(w) - 1)]
        tot = np.repeat(totals, np.diff(np.append(starts, len(w))))
        return pa.table(
            {
                id_col: pa.array(ids),
                group_col: pa.array(grp, pa.string()),
                weight_col: pa.array(w),
                "_h": pa.array(h),
                "_rb": pa.array(np.full(len(w), rb, dtype=np.int64)),
                "_local": pa.array(local),
                "_gtotal": pa.array(tot),
            }
        )

    scanned = (
        ds.map_batches(key_rows, batch_format="pyarrow")
        .groupby("_rb")
        .map_groups(local_scan, batch_format="pyarrow")
        .materialize()
    )

    def bucket_totals(t: pa.Table) -> pa.Table:
        rb = t["_rb"].to_numpy(zero_copy_only=False)
        grp = np.asarray(t[group_col].to_pylist(), dtype=object)
        tot = t["_gtotal"].to_numpy(zero_copy_only=False)
        change = np.concatenate([[True], (np.diff(rb) != 0) | (grp[1:] != grp[:-1])])
        first = np.flatnonzero(change)
        return pa.table(
            {
                "_rb": pa.array(rb[first]),
                group_col: pa.array(grp[first], pa.string()),
                "_gtotal": pa.array(tot[first]),
            }
        )

    # ≤ n_buckets × n_groups × blocks rows on the driver
    ct = collect_table(scanned.map_batches(bucket_totals, batch_format="pyarrow"))
    rb_a = ct["_rb"].to_numpy(zero_copy_only=False).astype(np.int64)
    gr_a = np.asarray(ct[group_col].to_pylist(), dtype=object)
    to_a = ct["_gtotal"].to_numpy(zero_copy_only=False).astype(np.int64)
    # dedup (a bucket's output may split across blocks; totals repeat)
    seen: dict = {}
    for r, g0, t0 in zip(rb_a.tolist(), gr_a.tolist(), to_a.tolist()):
        seen[(r, g0)] = t0
    offsets: dict = {}
    running: dict = {}
    for r, g0 in sorted(seen):
        offsets[(r, g0)] = running.get(g0, 0)
        running[g0] = running.get(g0, 0) + seen[(r, g0)]
    off_ref = ray.put(offsets)

    def finish(t: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        rb = t["_rb"].to_numpy(zero_copy_only=False)
        grp = t[group_col].to_pylist()
        base = np.array([off[(int(r), g0)] for r, g0 in zip(rb, grp)], dtype=np.int64)
        cum = base + t["_local"].to_numpy(zero_copy_only=False)
        keep = cum <= budget
        return pa.table(
            {
                id_col: t[id_col].filter(pa.array(keep)),
                group_col: t[group_col].filter(pa.array(keep)),
                weight_col: t[weight_col].filter(pa.array(keep)),
                "cum": pa.array(cum[keep]),
            }
        )

    return scanned.map_batches(finish, batch_format="pyarrow")


def shuffle_shards(
    ds: "ray.data.Dataset",
    n_shards: int = 8,
    seed: int = 0,
    id_col: str = "doc_id",
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Deterministic global shuffle for training order: rank every row
    by (md5-low64(f"{seed}-{id}"), id) and emit (id, shard, pos) with
    shard = pos % n_shards — the reproducible interleaved shard
    assignment a trainer reads back in pos order. Changing ``seed``
    reshuffles; same seed + same ids => identical order on any cluster.

    Distributed shape (the token_budget_sample two-level ordered scan,
    NO global sort): rows land in RANGE buckets of the hash key (bucket
    = high bits, so bucket order == hash order), each bucket ranks
    locally, the driver prefix-sums <= n_buckets counts into offsets,
    and a second streaming pass emits pos = offset + local rank. SQL
    replay: ROW_NUMBER() OVER (ORDER BY md5_number_upper(...), id) - 1.
    """
    import ray

    from ugfraud_ray.functions.bucketing import n_coarse_buckets
    from ugfraud_ray.functions.collect import collect_table

    nb = n_buckets or n_coarse_buckets()
    shift = np.uint64(64 - int(nb - 1).bit_length() if nb > 1 else 64)

    def key_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        h = _md5_low64([f"{seed}-{i}" for i in ids])
        return pa.table(
            {
                id_col: t[id_col],
                "_h": pa.array(h),
                "_rb": pa.array((h >> shift).astype(np.int64)),
            }
        )

    def local_rank(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = g["_h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        rb = int(g["_rb"][0].as_py())
        order = np.lexsort((ids, h))
        inv = np.empty(len(order), dtype=np.int64)
        inv[order] = np.arange(len(order))
        return pa.table(
            {
                id_col: pa.array(ids),
                "_rb": pa.array(np.full(len(ids), rb, dtype=np.int64)),
                "_local": pa.array(inv),
            }
        )

    ranked = (
        ds.select_columns([id_col])
        .map_batches(key_rows, batch_format="pyarrow")
        .groupby("_rb")
        .map_groups(local_rank, batch_format="pyarrow")
        .materialize()  # id-only; read twice (counts, then finish)
    )

    def bucket_counts(t: pa.Table) -> pa.Table:
        rb, cnt = np.unique(
            t["_rb"].to_numpy(zero_copy_only=False).astype(np.int64),
            return_counts=True,
        )
        return pa.table(
            {"_rb": pa.array(rb), "_n": pa.array(cnt.astype(np.int64))}
        )

    ct = collect_table(ranked.map_batches(bucket_counts, batch_format="pyarrow"))
    totals: dict = {}
    for r, c in zip(ct["_rb"].to_pylist(), ct["_n"].to_pylist()):
        totals[r] = totals.get(r, 0) + c
    offsets: dict = {}
    run = 0
    for r in sorted(totals):
        offsets[r] = run
        run += totals[r]
    keys = np.array(sorted(offsets), dtype=np.int64)
    vals = np.array([offsets[k] for k in keys.tolist()], dtype=np.int64)
    off_ref = ray.put((keys, vals))

    def finish(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(off_ref)
        rb = t["_rb"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = vals[np.searchsorted(keys, rb)] + t["_local"].to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                id_col: t[id_col],
                "shard": pa.array(pos % n_shards),
                "pos": pa.array(pos),
            }
        )

    return ranked.map_batches(finish, batch_format="pyarrow")


def interleave_mixture(
    docs: "ray.data.Dataset",
    weights: dict[str, int],
    seed: int = 0,
    id_col: str = "doc_id",
    source_col: str = "source",
    scale: int = 1_000_000,
) -> "ray.data.Dataset":
    """Deterministic mixture-interleave schedule: assign every document
    a schedule key so that streaming the corpus in (sched_key, source,
    id) order interleaves sources PROPORTIONALLY to their integer
    ``weights`` (weight 2 appears twice as densely as weight 1) — the
    data-mixing schedule of multi-source LLM training, reproducible on
    any cluster. Within a source the order is the seeded hash shuffle
    (md5-low64(f"{seed}-{id}"), id); the key is

        sched_key = (src_rank * scale) // weight[source]

    — all integers, so the SQL replay is exact. Output (id_col,
    source, src_rank, sched_key); unknown sources get weight 1.

    Scale shape: the per-source rank is the shuffle_shards two-level
    scan run per (source, hash-range bucket) — local ranks + a driver
    prefix over |sources| x n_buckets counts. No global sort; the
    schedule key is emitted in one streaming pass.
    """
    from ugfraud_ray.functions.bucketing import n_coarse_buckets
    from ugfraud_ray.functions.collect import collect_table

    nb = n_coarse_buckets()
    shift = np.uint64(64 - int(nb - 1).bit_length() if nb > 1 else 64)

    def key_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        h = _md5_low64([f"{seed}-{i}" for i in ids])
        return pa.table(
            {
                id_col: t[id_col],
                source_col: t[source_col],
                "_h": pa.array(h),
                "_rb": pa.array((h >> shift).astype(np.int64)),
            }
        )

    def local_rank(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.asarray(g[source_col].to_pylist(), dtype=object)
        h = g["_h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        rb = int(g["_rb"][0].as_py())
        # local rank WITHIN each source of this bucket, in (h, id) order
        order = np.lexsort((ids, h, src))
        s_o = src[order]
        first = np.ones(len(s_o), dtype=bool)
        first[1:] = s_o[1:] != s_o[:-1]
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, len(s_o)))
        local = np.arange(len(s_o)) - np.repeat(starts, lens)
        inv = np.empty(len(order), dtype=np.int64)
        inv[order] = local
        return pa.table(
            {
                id_col: pa.array(ids),
                source_col: pa.array(src.tolist(), pa.string()),
                "_rb": pa.array(np.full(len(ids), rb, dtype=np.int64)),
                "_local": pa.array(inv),
            }
        )

    ranked = (
        docs.select_columns([id_col, source_col])
        .map_batches(key_rows, batch_format="pyarrow")
        .groupby("_rb")
        .map_groups(local_rank, batch_format="pyarrow")
        .materialize()  # (id, source, rb, local) ints+source only
    )

    def counts(t: pa.Table) -> pa.Table:
        src = np.asarray(t[source_col].to_pylist(), dtype=object)
        rb = t["_rb"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.char.add(np.char.add(src.astype(str), "\x1f"), rb.astype(str))
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                source_col: pa.array([s.split("\x1f")[0] for s in u], pa.string()),
                "_rb": pa.array([int(s.split("\x1f")[1]) for s in u], pa.int64()),
                "_n": pa.array(c.astype(np.int64)),
            }
        )

    ct = collect_table(ranked.map_batches(counts, batch_format="pyarrow"))
    tot: dict = {}
    for s, r, c in zip(
        ct[source_col].to_pylist(), ct["_rb"].to_pylist(), ct["_n"].to_pylist()
    ):
        tot[(s, r)] = tot.get((s, r), 0) + c
    offsets: dict = {}
    run: dict = {}
    for s, r in sorted(tot):
        offsets[(s, r)] = run.get(s, 0)
        run[s] = run.get(s, 0) + tot[(s, r)]
    import ray as _ray

    oref = _ray.put((offsets, dict(weights)))

    def finish(t: pa.Table) -> pa.Table:
        offs, w = _ray.get(oref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.asarray(t[source_col].to_pylist(), dtype=object)
        rb = t["_rb"].to_numpy(zero_copy_only=False).astype(np.int64)
        loc = t["_local"].to_numpy(zero_copy_only=False).astype(np.int64)
        rank = np.array(
            [offs[(s, r)] for s, r in zip(src, rb)], dtype=np.int64
        ) + loc
        wv = np.array([int(w.get(s, 1)) for s in src], dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids),
                source_col: pa.array(src.tolist(), pa.string()),
                "src_rank": pa.array(rank),
                "sched_key": pa.array((rank * scale) // wv),
            }
        )

    return ranked.map_batches(finish, batch_format="pyarrow")
