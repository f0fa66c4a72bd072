"""Deduplication operators for large-scale document corpora.

The reference's only dedup is exact edge/id dedup (SURVEY §2.7 D1/D5,
/root/reference Detector/Fraudar.py:18-20, Detector/fBox.py:33-41); a
100 TB training-data engine also needs near-dup families. All operators
are Dataset-native:

- ``exact_dedup``           hash(text) -> groupby -> keep min-id row.
- ``minhash_lsh_dedup``     shingle -> minhash -> band -> bucket
                            groupby -> candidate pairs -> union-find
                            components on the driver's (small) pair set.
- ``simhash_dedup``         64-bit simhash -> band buckets (4x16-bit) ->
                            hamming check inside buckets.
- ``ngram_jaccard_pairs``   exact n-gram Jaccard for candidate pairs.
- ``embedding_cosine_dedup``cosine near-dup over an embedding column
                            (LSH random-hyperplane buckets).

Hashing is deterministic (md5 / splitmix-style mixing, fixed seeds) so
every operator is reproducible across runs and cluster sizes. The
shuffle per operator is ONE groupby on the bucket key; per-batch work is
numpy-vectorized over token arrays.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ugfraud_ray.functions.pools import actor_pool_size
from ray.data.aggregate import Count, Min

from ugfraud_ray.functions.collect import collect_table
from ugfraud_ray.functions.bucketing import n_coarse_buckets

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _md5_hex(texts: list[str]) -> list[str]:
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def exact_dedup(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    approx_rows: int | None = None,
) -> "ray.data.Dataset":
    """(text_hash, doc_id=min id, n_copies) — hash-partition + per-group first.

    D1 semantics (`if k not in u_id2idx`, fBox.py:33-41): the survivor is
    the smallest id, which equals first-occurrence for ordered ids.

    Hashing is always distributed (map_batches over the full text); only
    the tiny (hash, id) grouping drops to the driver when the caller's
    ``approx_rows`` hint says the shuffle-pool spin-up (~2-7 s fixed)
    would dominate.
    """

    def add_hash(t: pa.Table) -> pa.Table:
        h = _md5_hex(t[key].to_pylist())
        return pa.table({"text_hash": pa.array(h, pa.string()), id_col: t[id_col]})

    hashed = docs.map_batches(add_hash, batch_format="pyarrow")
    if approx_rows is not None and approx_rows <= 2_000_000:
        t = collect_table(hashed)
        g = t.group_by("text_hash").aggregate([(id_col, "min"), ("text_hash", "count")])
        return ray.data.from_arrow(
            pa.table(
                {
                    "text_hash": g["text_hash"],
                    id_col: g[f"{id_col}_min"],
                    "n_copies": g["text_hash_count"],
                }
            )
        )
    return hashed.groupby("text_hash").aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="n_copies")
    )


# ---------------------------------------------------------------------------
# token / shingle hashing (shared by minhash + jaccard)
# ---------------------------------------------------------------------------


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — deterministic 64-bit mixing."""
    x = x.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & _MASK64
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & _MASK64
    return x ^ (x >> np.uint64(31))


_TOKEN_CACHE_CAP = 1 << 20  # ≈1M distinct tokens; clear-on-overflow bounds memory
# approximate-bytes bound (r5): each dict entry costs ~120 B of CPython
# overhead plus the key string, so a count-only cap could still grow to
# hundreds of MB per worker on a long-token corpus — track cumulative
# estimated bytes and clear on whichever bound trips first
_TOKEN_CACHE_MAX_BYTES = 64 << 20
_TOKEN_ENTRY_OVERHEAD = 120
_token_cache: dict[str, int] = {}
_token_cache_bytes = 0


def _tok_hash_cached(tok: str) -> int:
    """md5-low64 of a token, memoized per process. Natural-language
    vocabulary is tiny relative to the token stream, so md5-per-token
    amortizes to md5-per-distinct-token; the entry-count AND
    approximate-bytes caps bound the per-worker footprint at web scale
    (a full clear beats LRU bookkeeping here — hot tokens repopulate
    within one batch)."""
    global _token_cache_bytes
    h = _token_cache.get(tok)
    if h is None:
        if (
            len(_token_cache) >= _TOKEN_CACHE_CAP
            or _token_cache_bytes >= _TOKEN_CACHE_MAX_BYTES
        ):
            _token_cache.clear()
            _token_cache_bytes = 0
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
        _token_cache[tok] = h
        _token_cache_bytes += _TOKEN_ENTRY_OVERHEAD + len(tok)
    return h


def _token_hashes(text: str) -> np.ndarray:
    """Stable 64-bit hash per whitespace token (md5-low64, cached)."""
    toks = text.split()
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    return np.fromiter(
        (_tok_hash_cached(t) for t in toks), dtype=np.uint64, count=len(toks)
    )


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """Hashes of word n-gram shingles via rolling combination of token hashes."""
    th = _token_hashes(text)
    if len(th) < n:
        return _mix64(th) if len(th) else np.zeros(0, dtype=np.uint64)
    # combine n consecutive token hashes positionally, then mix
    acc = np.zeros(len(th) - n + 1, dtype=np.uint64)
    for j in range(n):
        acc = (acc * np.uint64(1099511628211) + th[j : len(th) - n + 1 + j]) & _MASK64
    return _mix64(acc)


def minhash_signature(shingles: np.ndarray, num_perm: int, seed: int = 7) -> np.ndarray:
    """(num_perm,) uint64 minhash via universal hashing a*x+b over shingle set."""
    if len(shingles) == 0:
        return np.full(num_perm, _MASK64, dtype=np.uint64)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 61, size=num_perm, dtype=np.uint64)
    # (num_perm, n_shingles) without materializing huge products: loop perms
    vals = (shingles[None, :] * a[:, None] + b[:, None]) & _MASK64
    return _mix64(vals).min(axis=1)


class _MinHasher:
    """Actor-pool stage: permutation constants built once per actor;
    token→md5 memoization rides the module-level _TOKEN_CACHE_CAP-bounded
    cache (per actor process)."""

    def __init__(
        self,
        num_perm: int,
        ngram: int,
        seed: int,
        id_col: str,
        key: str,
        extra_cols: tuple = (),
    ):
        self.num_perm = num_perm
        self.ngram = ngram
        self.seed = seed
        self.id_col = id_col
        self.key = key
        self.extra_cols = tuple(extra_cols)
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 61, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
        self.b = rng.integers(0, 1 << 61, size=num_perm, dtype=np.uint64)

    def _shingles(self, text: str) -> np.ndarray:
        # token→hash memoization rides the module-level capped cache
        # (per actor process), shared with the non-actor _token_hashes path
        toks = text.split()
        if not toks:
            return np.zeros(0, dtype=np.uint64)
        th = np.fromiter((_tok_hash_cached(t) for t in toks), dtype=np.uint64, count=len(toks))
        n = self.ngram
        if len(th) < n:
            return _mix64(th)
        acc = np.zeros(len(th) - n + 1, dtype=np.uint64)
        for j in range(n):
            acc = (acc * np.uint64(1099511628211) + th[j : len(th) - n + 1 + j]) & _MASK64
        return _mix64(acc)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        sigs = np.empty((t.num_rows, self.num_perm), dtype=np.uint64)
        for i, text in enumerate(t[self.key].to_pylist()):
            sh = self._shingles(text)
            if len(sh) == 0:
                sigs[i] = _MASK64
            else:
                vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) & _MASK64
                sigs[i] = _mix64(vals).min(axis=1)
        cols = {
            self.id_col: pa.array(ids),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1).astype(np.uint64)), self.num_perm
            ),
        }
        # opt-in passthrough columns (e.g. a corpus/new kind tag)
        for c in self.extra_cols:
            cols[c] = t[c]
        return pa.table(cols)


def minhash_band_rows(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    seed: int = 7,
    concurrency: int = 4,
    extra_cols: tuple = (),
) -> "ray.data.Dataset":
    """(id, band, bucket[, *extra_cols]) LSH band rows: shingle ->
    minhash (actor pool, constants in __init__) -> FNV-rolled per-band
    bucket key. The shared front half of every banded-LSH operator
    (candidates, dedup, agreement, incremental); ``extra_cols`` ride
    along through the signature stage and the xbands row expansion."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands

    sigs = docs.map_batches(
        _MinHasher,
        fn_constructor_args=(num_perm, ngram, seed, id_col, key, extra_cols),
        batch_format="pyarrow",
        concurrency=actor_pool_size(concurrency),
    )

    def band_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = t[id_col].to_numpy(zero_copy_only=False)
        sig = np.asarray(t["sig"].combine_chunks().flatten().to_numpy(zero_copy_only=False)).reshape(n, -1)
        out_id = np.repeat(ids, bands)
        band_idx = np.tile(np.arange(bands, dtype=np.int64), n)
        bucket = np.empty(n * bands, dtype=np.uint64)
        for bdx in range(bands):
            seg = sig[:, bdx * rows_per_band : (bdx + 1) * rows_per_band]
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(rows_per_band):
                acc = (acc * np.uint64(1099511628211) + seg[:, j]) & _MASK64
            bucket[bdx::bands] = _mix64(acc)
        cols = {
            id_col: pa.array(out_id),
            "band": pa.array(band_idx),
            "bucket": pa.array(bucket.view(np.int64)),
        }
        # passthrough columns survive the xbands row expansion
        for c in extra_cols:
            cols[c] = pa.array(
                np.repeat(t[c].to_numpy(zero_copy_only=False), bands)
            )
        return pa.table(cols)

    return sigs.map_batches(band_rows, batch_format="pyarrow")


def minhash_lsh_candidates(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    seed: int = 7,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Candidate near-dup pairs (id_a < id_b) via banded minhash LSH.

    shingle -> minhash (actor pool, constants in __init__) -> per-band
    bucket key -> ONE groupby(band, bucket) -> per-group pair emission
    -> exact pair dedup.
    """
    banded = minhash_band_rows(
        docs,
        key=key,
        id_col=id_col,
        num_perm=num_perm,
        bands=bands,
        ngram=ngram,
        seed=seed,
        concurrency=concurrency,
    )
    # ONE shuffle over coarse buckets (a per-(band,bucket) map_groups
    # pays Python dispatch per LSH bucket — tens of thousands of them);
    # within a coarse bucket the per-bucket pair emission is a numpy
    # run loop over lexsorted keys. Small corpora skip the shuffle
    # entirely (driver-local run loop; n_docs from parquet metadata).
    n_banded = docs.count() * bands
    pairs = _bucketed_pair_emit(banded, ["band", "bucket"], id_col, approx_rows=n_banded)
    from ugfraud_ray.stages.graph_build import dedup_pairs as _dp

    return _dp(pairs, a="id_a", b="id_b", approx_rows=n_banded)


def _pairs_to_cluster_map(
    pairs: "ray.data.Dataset", local_threshold: int
) -> tuple[np.ndarray, np.ndarray]:
    """Candidate pairs (id_a, id_b) -> sorted (doc, cluster) arrays with
    cluster = min id of the connected component. <= local_threshold
    pairs: driver union-find (O(pairs), tiny vs the corpus); above it
    the distributed hash-min CC kernel — the pair table never lands on
    the driver, only the colliding-doc map does. Shared by the minhash
    and simhash cluster assigners."""
    from ugfraud_ray.functions.collect import collect_table

    n_pairs = pairs.count()
    if n_pairs <= local_threshold:
        pair_t = collect_table(pairs)
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in zip(pair_t["id_a"].to_pylist(), pair_t["id_b"].to_pylist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = {x: find(x) for x in parent}
        mk = np.array(sorted(roots), dtype=np.int64)
        mv = np.array([roots[k] for k in mk.tolist()], dtype=np.int64)
        return mk, mv
    import tempfile

    from ugfraud_ray.pipelines.components import connected_components
    from ugfraud_ray.pipelines.testdata_graph import number_int_vertices, unmap_vids

    e, vmap, n = number_int_vertices(
        pairs.rename_columns({"id_a": "src", "id_b": "dst"})
    )
    comp, _ = connected_components(e, n, tempfile.mkdtemp(prefix="lshcc_"), P=4)
    # numbering is ascending-original-id order-preserving, so the
    # min-vid component representative unmaps to the min doc_id
    out = unmap_vids(comp, vmap, vid_col="vid", out_col="id")
    out = unmap_vids(out, vmap, vid_col="component", out_col="cluster")
    mt = collect_table(out.select_columns(["id", "cluster"]))
    mk = mt["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mv = mt["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(mk)
    return mk[order], mv[order]


def minhash_lsh_dedup(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    seed: int = 7,
    local_threshold: int = 5_000_000,
) -> "ray.data.Dataset":
    """(doc_id, cluster) near-dup clusters: LSH candidates + connected
    components; cluster = min doc_id of the candidate component
    (order-free, so both paths agree bit-exactly).

    ≤ local_threshold candidate pairs: collected driver union-find —
    O(pairs), tiny vs the corpus. Above it (boilerplate-heavy corpora
    can explode the pair set): the distributed hash-min CC kernel
    (pipelines/components.py) over the candidate edge table, so the
    pair table never lands on the driver; only the final
    (colliding doc -> cluster) map does (O(colliding docs), broadcast
    once for the vectorized assign pass).
    """
    from ugfraud_ray.functions.collect import collect_table

    pairs = minhash_lsh_candidates(
        docs, key, id_col, num_perm, bands, ngram, seed
    ).materialize()
    mk, mv = _pairs_to_cluster_map(pairs, local_threshold)
    map_ref = ray.put((mk, mv))

    def assign(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(map_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(keys):
            pos = np.clip(np.searchsorted(keys, ids), 0, len(keys) - 1)
            hit = keys[pos] == ids
            cl = np.where(hit, vals[pos], ids)
        else:
            cl = ids
        return pa.table({id_col: t[id_col], "cluster": pa.array(cl, pa.int64())})

    return docs.select_columns([id_col]).map_batches(assign, batch_format="pyarrow")


def minhash_verified_dedup(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    seed: int = 7,
    threshold: float = 0.5,
    local_threshold: int = 5_000_000,
) -> "ray.data.Dataset":
    """(doc_id, cluster) VERIFIED near-dup clusters — the production
    near-dedup shape (RefinedWeb / SlimPajama style): banded-LSH
    candidate generation, then every candidate pair VERIFIED by exact
    n-gram Jaccard >= ``threshold`` before clustering. Banded LSH's
    false-positive collision rate grows with corpus size at fixed
    (bands, rows); without the verify stage those spurious edges chain
    unrelated documents into one giant cluster at web scale — here they
    are dropped before the component step, so clusters only ever merge
    through genuinely similar pairs. Same cluster convention as
    minhash_lsh_dedup (min doc_id of the verified component).

    Scale shape: candidates from the banded bucket shuffle (colliding
    docs only), exact Jaccard via broadcast shingle sets of ONLY the
    colliding docs (ngram_jaccard_pairs), pair->cluster via the shared
    _pairs_to_cluster_map gate (driver union-find below / distributed
    hash-min CC above). The threshold compare runs on the raw IEEE
    double intersection/union ratio — int/int division is exact and
    identical in numpy and SQL, so the oracle replays the filter
    bit-for-bit.

    Reference analog: none (UGFraud has no text dedup); this is the
    scale-robust sibling of minhash_lsh_dedup.
    """
    pairs = minhash_lsh_candidates(
        docs, key, id_col, num_perm, bands, ngram, seed
    ).materialize()
    ver = ngram_jaccard_pairs(
        docs, pairs, key=key, id_col=id_col, ngram=ngram, threshold=threshold
    ).select_columns(["id_a", "id_b"]).materialize()
    mk, mv = _pairs_to_cluster_map(ver, local_threshold)
    map_ref = ray.put((mk, mv))

    def assign(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(map_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(keys):
            pos = np.clip(np.searchsorted(keys, ids), 0, len(keys) - 1)
            hit = keys[pos] == ids
            cl = np.where(hit, vals[pos], ids)
        else:
            cl = ids
        return pa.table({id_col: t[id_col], "cluster": pa.array(cl, pa.int64())})

    return docs.select_columns([id_col]).map_batches(assign, batch_format="pyarrow")


def _ragged_arange(lens: np.ndarray) -> np.ndarray:
    """[0..lens[0]), [0..lens[1]), ... concatenated — no Python loop."""
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    cs = np.cumsum(lens)
    return np.arange(total, dtype=np.int64) - np.repeat(cs - lens, lens)


def segment_pairs(starts: np.ndarray, ends: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Global (left, right) index arrays of every within-run ordered
    pair across runs [starts[r], ends[r]) — the fully vectorized form
    of `for each run: np.triu_indices(L, k=1)` (r5: the per-run Python
    loop dominated pair emission once duplicate-heavy corpora produced
    thousands of 100+-member runs per bucket). Pair order per run is
    identical to triu_indices (left position ascending, right ascending
    within each left), so outputs are byte-identical to the old loop.
    """
    lens = (ends - starts).astype(np.int64)
    keep = lens >= 2
    s, L = starts[keep].astype(np.int64), lens[keep]
    if not len(s):
        z = np.zeros(0, dtype=np.int64)
        return z, z
    el = L - 1  # left-position count per run
    left_elem = np.repeat(s, el) + _ragged_arange(el)
    mult = np.repeat(s + L - 1, el) - left_elem  # rights per left elem
    left = np.repeat(left_elem, mult)
    right = left + _ragged_arange(mult) + 1
    return left, right


def _bucketed_pair_emit(
    ds: "ray.data.Dataset", key_cols: list[str], id_col: str, n_buckets: int | None = None,
    carry: list[str] | None = None,
    approx_rows: int | None = None, local_threshold: int = 1_000_000,
) -> "ray.data.Dataset":
    """Emit all unordered id pairs sharing the exact key tuple.

    Shuffle = one groupby over cluster/data-proportional coarse hash
    buckets (``n_coarse_buckets``, never a fixed ceiling); inside a
    bucket, lexsort by the key tuple and expand each run's triangle.
    Optional `carry` columns are taken from the first row of each run's
    id_a side... (not needed yet; reserved).

    approx_rows ≤ local_threshold runs the identical run-loop
    driver-local on the collected table (skips the shuffle pool's
    fixed spin-up, the dominant cost for small inputs).
    """

    nb = np.uint64(n_buckets if n_buckets is not None else n_coarse_buckets(approx_rows))

    def bucketize(t: pa.Table) -> pa.Table:
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for c in key_cols:
            v = t[c].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = (h * np.uint64(0x100000001B3)) ^ (v * np.uint64(0x9E3779B97F4A7C15))
        h ^= h >> np.uint64(31)
        return t.append_column("_cb", pa.array((h % nb).astype(np.int64)))

    def emit(g) -> pa.Table:
        keys = [g[c].to_numpy() for c in key_cols]
        ids = g[id_col].to_numpy().astype(np.int64)
        order = np.lexsort((ids, *reversed(keys)))
        keys = [k[order] for k in keys]
        ids = ids[order]
        if len(ids):
            change = np.zeros(len(ids) - 1, dtype=bool)
            for k in keys:
                change |= np.diff(k) != 0
            starts = np.flatnonzero(np.concatenate([[True], change]))
            ends = np.append(starts[1:], len(ids))
        else:
            starts = ends = np.zeros(0, dtype=np.int64)
        li, ri = segment_pairs(starts, ends)
        return pa.table({"id_a": pa.array(ids[li]), "id_b": pa.array(ids[ri])})

    if approx_rows is not None and approx_rows <= local_threshold:
        from ugfraud_ray.functions.collect import collect_table

        return ray.data.from_arrow(emit(collect_table(ds)))

    from ugfraud_ray.stages.graph_build import right_size_blocks

    return (
        right_size_blocks(ds, approx_rows)
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(emit, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit simhash over whitespace-token hashes (deterministic)."""
    th = _token_hashes(text)
    if len(th) == 0:
        return 0
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    v = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for k in np.flatnonzero(v > 0):
        out |= np.uint64(1) << np.uint64(k)
    return int(out)


def simhash_dedup(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> "ray.data.Dataset":
    """Candidate near-dup pairs by simhash banding (4×16-bit chunks).

    Two docs within hamming distance 3 share at least one of the four
    16-bit chunks (pigeonhole); ONE groupby on (chunk_idx, chunk_value)
    then exact hamming check inside each bucket.
    """

    def sim_rows(t: pa.Table) -> pa.Table:
        ids, chunk_idx, chunk_val, full = [], [], [], []
        for i, text in zip(t[id_col].to_pylist(), t[key].to_pylist()):
            h = simhash64(text)
            for c in range(4):
                ids.append(i)
                chunk_idx.append(c)
                chunk_val.append((h >> (16 * c)) & 0xFFFF)
                full.append(h)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "chunk": pa.array(chunk_idx, pa.int8()),
                "val": pa.array(chunk_val, pa.int64()),
                "sim": pa.array(np.array(full, dtype=np.uint64).view(np.int64)),
            }
        )

    banded = docs.map_batches(sim_rows, batch_format="pyarrow")

    _POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)

    def popcount64(x: np.ndarray) -> np.ndarray:
        return _POP[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)

    def check(g) -> pa.Table:
        # coarse bucket: runs of (chunk, val) after lexsort; pairs +
        # vectorized xor-popcount per run (no per-LSH-bucket dispatch)
        chunk = g["chunk"].to_numpy().astype(np.int64)
        val = g["val"].to_numpy().astype(np.int64)
        ids = g[id_col].to_numpy().astype(np.int64)
        sims = g["sim"].to_numpy().astype(np.int64)
        order = np.lexsort((ids, val, chunk))
        chunk, val, ids, sims = chunk[order], val[order], ids[order], sims[order]
        if len(ids):
            change = (np.diff(chunk) != 0) | (np.diff(val) != 0)
            starts = np.flatnonzero(np.concatenate([[True], change]))
            ends = np.append(starts[1:], len(ids))
        else:
            starts = ends = np.zeros(0, dtype=np.int64)
        li, ri = segment_pairs(starts, ends)
        if not len(li):
            return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        su = sims.view(np.uint64)
        ham = popcount64(su[li] ^ su[ri])
        keep = ham <= max_hamming
        return pa.table(
            {
                "id_a": pa.array(ids[li][keep]),
                "id_b": pa.array(ids[ri][keep]),
                "hamming": pa.array(ham[keep]),
            }
        )

    n_banded = docs.count() * 4
    nb = np.uint64(n_coarse_buckets(n_banded))

    def bucketize(t: pa.Table) -> pa.Table:
        c = t["chunk"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t["val"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (c * np.uint64(0x100000001B3)) ^ (v * np.uint64(0x9E3779B97F4A7C15))
        h ^= h >> np.uint64(31)
        return t.append_column("_cb", pa.array((h % nb).astype(np.int64)))
    if n_banded <= 1_000_000:
        from ugfraud_ray.functions.collect import collect_table

        pairs = ray.data.from_arrow(check(collect_table(banded)))
    else:
        pairs = (
            banded.map_batches(bucketize, batch_format="pyarrow")
            .groupby("_cb")
            .map_groups(check, batch_format="pyarrow")
        )
    from ugfraud_ray.stages.graph_build import dedup_pairs as _dp

    return _dp(pairs, a="id_a", b="id_b", extra={"hamming": "min"}, approx_rows=n_banded)


# ---------------------------------------------------------------------------
# exact n-gram jaccard on candidate pairs
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    threshold: float = 0.0,
    approx_pairs: int | None = None,
    local_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Exact n-gram Jaccard similarity for a candidate pair table.

    Below ``local_threshold`` candidate pairs the colliding docs'
    shingle sets broadcast once as a dict (ray.put) and pairs stream
    through a vectorized set-intersect kernel. Above it NOTHING lands
    on the driver (r4 — the broadcast dict is colliding-doc-sized,
    which a boilerplate-heavy 100 TB corpus can push past worker
    memory): colliding docs are semi-joined from the pair id set, their
    DISTINCT shingles explode to (doc, sh) rows, same-shingle pairs
    emit once per shared shingle through the coarse sh-bucket shuffle
    (multiplicity == intersection size), an outer hash join keeps
    exactly the candidate pairs, and jaccard resolves from two
    size-table joins with the IDENTICAL int/int IEEE division — both
    paths agree bit-for-bit (forced-parity pytest). Hot-shingle
    quadratic blowup carries the same df-cap caveat as
    exact_shingle_jaccard (documented there).

    Candidate pairs are CANONICALIZED first in both branches: each row
    becomes (min(id_a,id_b), max(id_a,id_b)), self-pairs (id_a==id_b)
    are dropped, and exact duplicates collapse to one row — so a
    reversed or repeated pair scores identically whichever branch the
    gate picks (r5; previously the distributed branch silently scored
    reversed pairs 0.0).
    """
    if approx_pairs is None:
        # callers hand in lazy candidate pipelines; pin them before the
        # gate count so neither branch re-executes the LSH chain
        pairs = pairs.materialize()
        n_pairs = pairs.count()
    else:
        n_pairs = approx_pairs
    if n_pairs > local_threshold:
        return _ngram_jaccard_distributed(docs, pairs, key, id_col, ngram, threshold)
    pt_blocks = [b for b in ray.get(pairs.to_arrow_refs()) if b.num_rows]
    if not pt_blocks:
        return ray.data.from_arrow(
            pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
        )
    pt = pa.concat_tables(pt_blocks)
    _a = pt["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    _b = pt["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    _lo, _hi = np.minimum(_a, _b), np.maximum(_a, _b)
    _m = _lo != _hi
    _uniq = np.unique(np.stack([_lo[_m], _hi[_m]], axis=1), axis=0)
    pt = pa.table({"id_a": pa.array(_uniq[:, 0]), "id_b": pa.array(_uniq[:, 1])})
    if not pt.num_rows:
        return ray.data.from_arrow(
            pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
        )
    pairs = ray.data.from_arrow(pt)
    needed = set(pt["id_a"].to_pylist()) | set(pt["id_b"].to_pylist())
    needed_ref = ray.put(needed)

    def collect_shingles(t: pa.Table) -> pa.Table:
        want = ray.get(needed_ref)
        ids, sh = [], []
        for i, text in zip(t[id_col].to_pylist(), t[key].to_pylist()):
            if i in want:
                ids.append(i)
                sh.append(_shingle_hashes(text, ngram).tobytes())
        return pa.table({id_col: pa.array(ids, pa.int64()), "sh": pa.array(sh, pa.binary())})

    st = pa.concat_tables(
        [b for b in ray.get(docs.map_batches(collect_shingles, batch_format="pyarrow").to_arrow_refs()) if b.num_rows]
    )
    shingle_map = {
        i: np.unique(np.frombuffer(b, dtype=np.uint64))
        for i, b in zip(st[id_col].to_pylist(), st["sh"].to_pylist())
    }
    sm_ref = ray.put(shingle_map)

    def jac(t: pa.Table) -> pa.Table:
        sm = ray.get(sm_ref)
        a_ids = t["id_a"].to_pylist()
        b_ids = t["id_b"].to_pylist()
        out = np.empty(len(a_ids), dtype=np.float64)
        for r, (a, b) in enumerate(zip(a_ids, b_ids)):
            sa, sb = sm.get(a), sm.get(b)
            if sa is None or sb is None or (len(sa) == 0 and len(sb) == 0):
                out[r] = 0.0
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            out[r] = inter / (len(sa) + len(sb) - inter)
        tbl = pa.table({"id_a": t["id_a"], "id_b": t["id_b"], "jaccard": pa.array(out)})
        return tbl.filter(pa.compute.greater_equal(tbl["jaccard"], threshold))

    return pairs.map_batches(jac, batch_format="pyarrow")


def _ngram_jaccard_distributed(
    docs: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    key: str,
    id_col: str,
    ngram: int,
    threshold: float,
) -> "ray.data.Dataset":
    """Driver-free branch of ngram_jaccard_pairs (see its docstring).

    JOIN-FREE by design: each exploded (doc, shingle) row carries its
    doc's shingle-set size, the sh-bucket triangle emission carries
    (na, nb) on every emitted pair row (row multiplicity == |A ∩ B|),
    and the candidate pairs union in as zero-marker rows — ONE grouped
    merge keyed by the pair resolves (nint, na, nb, is_cand). A
    candidate pair sharing no shingle has nint == 0 and scores 0.0
    exactly like the broadcast branch (its sizes are irrelevant:
    0/union == 0.0, and both-sets-empty is the same 0.0 via the
    union == 0 guard), so NO size lookup is ever needed for it. The
    jaccard itself is the identical int/int IEEE division. (Only
    groupby machinery is used: Ray 2.49 deadlocks a CHAIN of joins
    whose aggregator pools jointly oversubscribe the cluster — the
    left being itself a join output keeps both pools alive at once.
    Repro + retirement trigger:
    tests/test_ray_join_regression.py::
    test_chained_join_oversubscribed_pools_deadlock — unskip it on a
    Ray upgrade; a pass means this join-free design can be revisited.)
    """
    from ray.data.aggregate import Max, Sum

    from ugfraud_ray.functions.bucketing import n_coarse_buckets
    from ugfraud_ray.pipelines.relational import semi_anti_join

    def flat_ids(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({id_col: pa.array(np.unique(np.concatenate([a, b])))})

    ids = pairs.map_batches(flat_ids, batch_format="pyarrow")
    colliding = semi_anti_join(docs.select_columns([id_col, key]), ids, id_col)

    def explode(t: pa.Table) -> pa.Table:
        ids_out, sh_out, sz_out = [], [], []
        for i, text in zip(t[id_col].to_pylist(), t[key].to_pylist()):
            hs = np.unique(_shingle_hashes(text, ngram))
            if len(hs):
                ids_out.append(np.full(len(hs), i, dtype=np.int64))
                sh_out.append(hs.view(np.int64))
                sz_out.append(np.full(len(hs), len(hs), dtype=np.int64))
        if not ids_out:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "sh": pa.array([], pa.int64()),
                 "nsz": pa.array([], pa.int64())}
            )
        return pa.table(
            {id_col: pa.array(np.concatenate(ids_out)),
             "sh": pa.array(np.concatenate(sh_out)),
             "nsz": pa.array(np.concatenate(sz_out))}
        )

    exploded = colliding.map_batches(explode, batch_format="pyarrow")

    nb_buckets = np.uint64(n_coarse_buckets(None))

    def bucketize(t: pa.Table) -> pa.Table:
        v = t["sh"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = v * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(31)
        return t.append_column("_cb", pa.array((h % nb_buckets).astype(np.int64)))

    def emit(g) -> pa.Table:
        sh = g["sh"].to_numpy().astype(np.int64)
        gid = g[id_col].to_numpy().astype(np.int64)
        gsz = g["nsz"].to_numpy().astype(np.int64)
        order = np.lexsort((gid, sh))
        sh, gid, gsz = sh[order], gid[order], gsz[order]
        if len(sh):
            starts = np.flatnonzero(np.concatenate([[True], np.diff(sh) != 0]))
            ends = np.append(starts[1:], len(sh))
        else:
            starts = ends = np.zeros(0, dtype=np.int64)
        li, ri = segment_pairs(starts, ends)
        if not len(li):
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "na": pa.array([], pa.int64()), "nb": pa.array([], pa.int64()),
                 "nint": pa.array([], pa.int64()), "cand": pa.array([], pa.int64())}
            )
        n = len(li)
        return pa.table(
            {"id_a": pa.array(gid[li]), "id_b": pa.array(gid[ri]),
             "na": pa.array(gsz[li]), "nb": pa.array(gsz[ri]),
             "nint": pa.array(np.ones(n, dtype=np.int64)),
             "cand": pa.array(np.zeros(n, dtype=np.int64))}
        )

    pair_rows = (
        exploded.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(emit, batch_format="pyarrow")
    )

    def cand_rows(t: pa.Table) -> pa.Table:
        # canonicalize to (min, max) and drop self-pairs so reversed /
        # duplicate candidates merge onto the ascending-keyed triangle
        # rows (the grouped Max(cand) dedupes repeats for free)
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        m = lo != hi
        lo, hi = lo[m], hi[m]
        z = np.zeros(len(lo), dtype=np.int64)
        return pa.table(
            {"id_a": pa.array(lo), "id_b": pa.array(hi), "na": pa.array(z),
             "nb": pa.array(z), "nint": pa.array(z),
             "cand": pa.array(np.ones(len(lo), dtype=np.int64))}
        )

    marked = pairs.select_columns(["id_a", "id_b"]).map_batches(
        cand_rows, batch_format="pyarrow"
    )

    merged = pair_rows.union(marked).groupby(["id_a", "id_b"]).aggregate(
        Sum("nint", alias_name="nint"), Max("na", alias_name="na"),
        Max("nb", alias_name="nb"), Max("cand", alias_name="cand"),
    )

    def finish(t: pa.Table) -> pa.Table:
        keep = t["cand"].to_numpy(zero_copy_only=False).astype(np.int64) == 1
        t = t.filter(pa.array(keep))
        ii = t["nint"].to_numpy(zero_copy_only=False).astype(np.int64)
        na = t["na"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.int64)
        union = na + nb - ii
        jac = np.where(union == 0, 0.0, ii / np.maximum(union, 1))
        out = pa.table({"id_a": t["id_a"], "id_b": t["id_b"], "jaccard": pa.array(jac)})
        return out.filter(pa.array(jac >= threshold))

    return merged.map_batches(finish, batch_format="pyarrow")


def exact_shingle_jaccard(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    threshold: float = 0.0,
    approx_docs: int | None = None,
) -> "ray.data.Dataset":
    """Exact n-gram Jaccard for every pair sharing >= 1 shingle.

    distinct-shingle explode -> exact-key pair emission (ONE groupby
    over coarse hash buckets, runs expanded vectorized) -> pair dedup
    -> broadcast-set Jaccard (`ngram_jaccard_pairs`). This is the
    exact, oracle-checkable baseline for the LSH candidate path
    (`minhash_lsh_candidates`), the same exact/approx pairing as
    `embedding_cosine_pairs_exact` vs the LSH near-dup variant.

    At corpus scale a document-frequency cap on shingles (drop
    stop-shingles from the inverted index before pair emission) bounds
    the quadratic blowup of hot keys; the testdata vocabulary is tiny,
    the pair table stays ~docs-squared-small, and the cap is left off
    so the SQL oracle matches term-for-term.
    """

    def explode(t: pa.Table) -> pa.Table:
        ids_out, sh_out = [], []
        for i, text in zip(t[id_col].to_pylist(), t[key].to_pylist()):
            if len(text.split()) < ngram:
                continue
            hs = np.unique(_shingle_hashes(text, ngram))
            ids_out.append(np.full(len(hs), i, dtype=np.int64))
            sh_out.append(hs.view(np.int64))
        if not ids_out:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "sh": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(ids_out)),
                "sh": pa.array(np.concatenate(sh_out)),
            }
        )

    exploded = docs.map_batches(explode, batch_format="pyarrow")
    n_exp = approx_docs * 128 if approx_docs is not None else None
    pairs = _bucketed_pair_emit(exploded, ["sh"], id_col, approx_rows=n_exp)
    from ugfraud_ray.stages.graph_build import dedup_pairs as _dp

    cands = _dp(pairs, a="id_a", b="id_b", approx_rows=n_exp)
    return ngram_jaccard_pairs(
        docs, cands, key=key, id_col=id_col, ngram=ngram, threshold=threshold
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_cosine_pairs_exact(
    emb: "ray.data.Dataset",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    round_to: int = 4,
) -> "ray.data.Dataset":
    """ALL pairs (id_a < id_b) with round(cosine, round_to) >= threshold.

    Exact O(n²) baseline for the LSH variant below: the normalized
    matrix is broadcast ONCE via ``ray.put`` and every block does one
    numpy matmul of its rows against it (block × corpus). Use this as
    the ground-truth/small-side path; at 100 TB the corpus no longer
    broadcasts — use ``embedding_cosine_dedup`` (bucketed LSH) there.
    Thresholding happens on the ROUNDED value so the decision is
    reproducible across float implementations (matches the SQL oracle).
    """
    from ugfraud_ray.functions.collect import collect_table

    t = collect_table(emb.select_columns([id_col, vec_col]))
    all_ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    flat = np.asarray(
        t[vec_col].combine_chunks().flatten().to_numpy(zero_copy_only=False), dtype=np.float64
    )
    x = flat.reshape(len(all_ids), -1)
    norms = np.linalg.norm(x, axis=1)
    norms[norms == 0] = 1.0
    mat_ref = ray.put((all_ids, x / norms[:, None]))

    def block_pairs(t: pa.Table) -> pa.Table:
        ids_all, nv = ray.get(mat_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        flat = np.asarray(
            t[vec_col].combine_chunks().flatten().to_numpy(zero_copy_only=False),
            dtype=np.float64,
        )
        xb = flat.reshape(len(ids), -1)
        nb = np.linalg.norm(xb, axis=1)
        nb[nb == 0] = 1.0
        sims = np.round((xb / nb[:, None]) @ nv.T, round_to)  # (block, corpus)
        # only emit (block_row, corpus_col) with id_row < id_col — each
        # unordered pair is produced by exactly one block
        keep = (sims >= threshold) & (ids[:, None] < ids_all[None, :])
        bi, ci = np.nonzero(keep)
        return pa.table(
            {
                "id_a": pa.array(ids[bi]),
                "id_b": pa.array(ids_all[ci]),
                "cosine": pa.array(sims[bi, ci]),
            }
        )

    return emb.map_batches(block_pairs, batch_format="pyarrow")


def embedding_cosine_dedup(
    emb: "ray.data.Dataset",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 11,
) -> "ray.data.Dataset":
    """Near-dup pairs (cosine >= threshold) via random-hyperplane LSH.

    Bucket key = sign pattern of `n_planes` random projections (built
    once per actor); ONE groupby(bucket); exact cosine inside buckets.
    Recall is per-bucket — callers wanting higher recall union several
    plane seeds (documented partitioning assumption).
    """

    class Bucketer:
        def __init__(self):
            self.planes = None
            self.seed = seed

        def __call__(self, t: pa.Table) -> pa.Table:
            arr = np.asarray(t[vec_col].combine_chunks().flatten().to_numpy(zero_copy_only=False), dtype=np.float64)
            dim = arr.size // t.num_rows
            x = arr.reshape(t.num_rows, dim)
            if self.planes is None:
                self.planes = np.random.default_rng(self.seed).standard_normal((dim, n_planes))
            signs = (x @ self.planes) > 0
            bucket = np.zeros(t.num_rows, dtype=np.int64)
            for k in range(n_planes):
                bucket |= signs[:, k].astype(np.int64) << k
            return pa.table(
                {
                    id_col: t[id_col],
                    "bucket": pa.array(bucket),
                    vec_col: t[vec_col],
                }
            )

    bucketed = emb.map_batches(
        Bucketer, batch_format="pyarrow", concurrency=actor_pool_size(2)
    )

    def pairs_in_bucket(g) -> pa.Table:
        ids = g[id_col].to_numpy()
        vecs = np.stack(g[vec_col].to_numpy())
        order = np.argsort(ids)
        ids, vecs = ids[order], vecs[order].astype(np.float64)
        if len(ids) < 2:
            return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        nv = vecs / norms[:, None]
        sims = nv @ nv.T
        i, j = np.triu_indices(len(ids), k=1)
        keep = sims[i, j] >= threshold
        return pa.table(
            {
                "id_a": pa.array(ids[i][keep]),
                "id_b": pa.array(ids[j][keep]),
                "cosine": pa.array(sims[i, j][keep]),
            }
        )

    return bucketed.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pyarrow")


def cluster_size_histogram(
    clusters: "ray.data.Dataset", cluster_col: str = "cluster"
) -> "ray.data.Dataset":
    """(cluster_size, n_clusters) over a (id, cluster) assignment — the
    dedup-quality dashboard readout (how much of the corpus sits in
    2-copy pairs vs 1000-copy boilerplate blobs). Two tiny grouped sums
    over per-block np.unique partials; the row count entering each
    shuffle is bounded by the distinct-cluster count, never the corpus.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(
            t[cluster_col].to_numpy(zero_copy_only=False).astype(np.int64),
            return_counts=True,
        )
        return pa.table({cluster_col: pa.array(u), "_c": pa.array(c.astype(np.int64))})

    sizes = (
        clusters.map_batches(partial, batch_format="pyarrow")
        .groupby(cluster_col)
        .aggregate(Sum("_c", alias_name="sz"))
    )

    def partial2(t: pa.Table) -> pa.Table:
        u, c = np.unique(
            t["sz"].to_numpy(zero_copy_only=False).astype(np.int64), return_counts=True
        )
        return pa.table(
            {"cluster_size": pa.array(u), "_n": pa.array(c.astype(np.int64))}
        )

    return (
        sizes.map_batches(partial2, batch_format="pyarrow")
        .groupby("cluster_size")
        .aggregate(Sum("_n", alias_name="n_clusters"))
    )


def incremental_exact_dedup(
    corpus: "ray.data.Dataset",
    new: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    approx_new: int | None = None,
    approx_corpus: int | None = None,
) -> "ray.data.Dataset":
    """Continuous-crawl dedup: drop new docs whose text already exists
    in the corpus snapshot OR earlier (lower id) in the new batch.
    Returns the surviving (text_hash, doc_id, n_copies) rows — the
    exact_dedup survivors of the new batch anti-filtered by the corpus
    hash set.

    Composition of two scale-audited blocks: ``exact_dedup`` (hash
    always distributed, tiny grouping gated) and
    ``relational.semi_anti_join`` (corpus HASHES — never texts —
    broadcast below the key-row gate, Ray hash anti-join above). The
    corpus streams through one md5 map; nothing corpus-sized lands on
    the driver on the join path.
    """
    from ugfraud_ray.pipelines.relational import semi_anti_join

    surv = exact_dedup(new, key=key, id_col=id_col, approx_rows=approx_new)

    def hash_only(t: pa.Table) -> pa.Table:
        return pa.table({"text_hash": pa.array(_md5_hex(t[key].to_pylist()), pa.string())})

    corp = corpus.select_columns([key]).map_batches(hash_only, batch_format="pyarrow")
    return semi_anti_join(
        surv, corp, "text_hash", anti=True, approx_right_rows=approx_corpus
    )


def minhash_agreement(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    seed: int = 7,
    local_threshold: int = 5_000_000,
) -> "ray.data.Dataset":
    """Per-candidate-pair signature agreement (id_a, id_b, n_agree):
    the number of minhash positions on which the two docs' signatures
    coincide — n_agree/num_perm is the unbiased Jaccard estimate the
    banded LSH thresholds on, so this is the dedup tuning/QA readout
    (est vs the exact doc_ngram_jaccard over the same pairs).

    Shape: signatures via the _MinHasher actor pool, candidates via the
    shared LSH chain. <= local_threshold candidate pairs: the pair set
    plus ONLY the colliding docs' signatures land on the driver
    (O(pairs + colliding docs), corpus never moves). Above it: two
    union + coarse-bucket resolve shuffles route each pair row to its
    endpoints' signature rows (NO hash join — chained Dataset.joins
    deadlock small aggregator pools; both paths parity-tested).
    """
    sigs = docs.map_batches(
        _MinHasher,
        fn_constructor_args=(num_perm, ngram, seed, id_col, key),
        batch_format="pyarrow",
        concurrency=actor_pool_size(4),
    )
    pairs = minhash_lsh_candidates(
        docs, key, id_col, num_perm, bands, ngram, seed
    ).materialize()
    n_pairs = pairs.count()

    if n_pairs <= local_threshold:
        pair_t = collect_table(pairs)
        ia = pair_t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        ib = pair_t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        involved = np.unique(np.concatenate([ia, ib]))
        inv_ref = ray.put(involved)

        def keep_involved(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return t.filter(pa.array(np.isin(ids, ray.get(inv_ref))))

        st = collect_table(sigs.map_batches(keep_involved, batch_format="pyarrow"))
        ids = st[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sig = np.asarray(
            st["sig"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ).reshape(len(st), -1)
        order = np.argsort(ids)
        ids, sig = ids[order], sig[order]
        pa_idx = np.searchsorted(ids, ia)
        pb_idx = np.searchsorted(ids, ib)
        agree = (sig[pa_idx] == sig[pb_idx]).sum(axis=1).astype(np.int64)
        return ray.data.from_arrow(
            pa.table(
                {
                    "id_a": pa.array(ia),
                    "id_b": pa.array(ib),
                    "n_agree": pa.array(agree),
                }
            )
        )

    # distributed path: NO hash join (chained Dataset.joins deadlock
    # the aggregator pools on small clusters, and Arrow joins reject
    # fixed_size_list payloads anyway) and the signature stream is
    # consumed exactly ONCE (a second consumer would spawn a second
    # _MinHasher actor pool in the same DAG and overcommit small CPU
    # budgets). Shape: each pair row is emitted twice (keyed by each
    # endpoint), unioned with the signature rows, ONE coarse-bucket
    # shuffle attaches the endpoint's blob, then ONE pair-keyed bucket
    # shuffle zips the two halves and counts agreements.
    from ugfraud_ray.functions.bucketing import int_hash_bucket, n_coarse_buckets

    nb = n_coarse_buckets(None)

    def sig_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        sig = np.asarray(
            t["sig"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ).reshape(n, -1)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_k": pa.array(ids),
                "id_a": pa.array(np.full(n, -1, dtype=np.int64)),
                "id_b": pa.array(np.full(n, -1, dtype=np.int64)),
                "half": pa.array(np.zeros(n, np.int8)),
                "blob": pa.array([s.tobytes() for s in sig], pa.binary()),
                "kind": pa.array(np.ones(n, np.int8)),
            }
        )

    def pair_rows(t: pa.Table) -> pa.Table:
        ia = t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        ib = t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ia)
        return pa.table(
            {
                "_k": pa.array(np.concatenate([ia, ib])),
                "id_a": pa.array(np.tile(ia, 2)),
                "id_b": pa.array(np.tile(ib, 2)),
                "half": pa.array(
                    np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])
                ),
                "blob": pa.array([b""] * (2 * n), pa.binary()),
                "kind": pa.array(np.zeros(2 * n, np.int8)),
            }
        )

    def bucketize(t: pa.Table) -> pa.Table:
        k = t["_k"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_cb", pa.array(int_hash_bucket(k, nb)))

    def attach(g: pa.Table) -> pa.Table:
        k = g["_k"].to_numpy(zero_copy_only=False).astype(np.int64)
        kind = g["kind"].to_numpy(zero_copy_only=False)
        blobs = g["blob"].to_numpy(zero_copy_only=False)
        is_sig = kind == 1
        sk = k[is_sig]
        order = np.argsort(sk)
        sk, sig_blobs = sk[order], blobs[is_sig][order]
        pr = np.flatnonzero(~is_sig)
        if len(pr) == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "half": pa.array([], pa.int8()),
                    "blob": pa.array([], pa.binary()),
                }
            )
        idx = np.searchsorted(sk, k[pr])
        return pa.table(
            {
                "id_a": pa.array(g["id_a"].to_numpy(zero_copy_only=False)[pr]),
                "id_b": pa.array(g["id_b"].to_numpy(zero_copy_only=False)[pr]),
                "half": pa.array(g["half"].to_numpy(zero_copy_only=False)[pr]),
                "blob": pa.array([bytes(sig_blobs[i]) for i in idx], pa.binary()),
            }
        )

    halves = (
        pairs.map_batches(pair_rows, batch_format="pyarrow")
        .union(sigs.map_batches(sig_rows, batch_format="pyarrow"))
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(attach, batch_format="pyarrow")
    )

    def bucket_pair(t: pa.Table) -> pa.Table:
        ia = t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        ib = t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = int_hash_bucket(ia, nb) ^ int_hash_bucket(ib, nb)
        return t.append_column("_cb", pa.array(h % nb))

    def zip_compare(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "n_agree": pa.array([], pa.int64()),
                }
            )
        ia = g["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        ib = g["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        half = g["half"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((half, ib, ia))
        ia, ib, half = ia[order], ib[order], half[order]
        blobs = g["blob"].to_numpy(zero_copy_only=False)[order]
        a_rows = np.arange(0, len(ia), 2)
        flat = np.frombuffer(b"".join(bytes(b) for b in blobs), dtype=np.uint64).reshape(
            len(ia), -1
        )
        agree = (flat[a_rows] == flat[a_rows + 1]).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "id_a": pa.array(ia[a_rows]),
                "id_b": pa.array(ib[a_rows]),
                "n_agree": pa.array(agree),
            }
        )

    return (
        halves.map_batches(bucket_pair, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(zip_compare, batch_format="pyarrow")
    )


def incremental_minhash_dedup(
    corpus: "ray.data.Dataset",
    new: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    seed: int = 7,
    local_threshold: int = 5_000_000,
    approx_corpus: int | None = None,
    approx_new: int | None = None,
) -> "ray.data.Dataset":
    """Continuous-crawl NEAR-dedup: the LSH sibling of
    :func:`incremental_exact_dedup`. A new-batch doc drops when it
    shares any LSH band bucket with (a) a snapshot doc or (b) a
    lower-id doc of its own batch — the SemDeDup-style "no earlier
    candidate neighbour" greedy (same keep rule as
    ``similarity.semdedup``), at candidate granularity (what a
    production MinhashLSH index check approximates). Returns one row
    per new doc: (id, has_corpus_cand, has_prior_cand, kept).

    Scale shape: the decision is a PER-BUCKET predicate — "does this
    bucket hold any corpus row / any lower new id" — so NO candidate
    pair ever materializes: band rows (kind-tagged) take ONE
    (band, bucket)-keyed coarse shuffle, each group emits per-new-doc
    boolean partials, and a (doc_id) groupby-max ORs them. Below the
    gate the lexsort-run kernel runs driver-local on the collected
    band rows (bands x docs, bounded) — identical results,
    parity-tested by forcing local_threshold=0.
    """
    from ray.data.aggregate import Max

    def _tag(kind_val: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    id_col: t[id_col],
                    key: t[key],
                    "kind": pa.array(np.full(t.num_rows, kind_val, np.int64)),
                }
            )

        return f

    # ONE MinHasher pool over the kind-tagged union — two separate
    # actor pools in a single union DAG can grab every CPU and starve
    # the downstream tasks (the fixed-pool deadlock regime)
    tagged = corpus.map_batches(_tag(0), batch_format="pyarrow").union(
        new.map_batches(_tag(1), batch_format="pyarrow")
    )
    allb = minhash_band_rows(
        tagged,
        key=key,
        id_col=id_col,
        num_perm=num_perm,
        bands=bands,
        ngram=ngram,
        seed=seed,
        extra_cols=("kind",),
    )

    def flags_sorted(
        ids: np.ndarray, band: np.ndarray, bucket: np.ndarray, kind: np.ndarray
    ):
        """Per-new-doc (id, c_flag, p_flag) from lexsorted-run segments."""
        order = np.lexsort((ids, bucket, band))
        ids, band, bucket, kind = (
            ids[order],
            band[order],
            bucket[order],
            kind[order],
        )
        if not len(ids):
            z = np.zeros(0, dtype=np.int64)
            return z, z, z
        change = (band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1])
        seg = np.concatenate([[0], np.cumsum(change)]).astype(np.int64)
        nseg = seg[-1] + 1
        anyc = np.zeros(nseg, dtype=bool)
        np.logical_or.at(anyc, seg, kind == 0)
        minnew = np.full(nseg, np.iinfo(np.int64).max, dtype=np.int64)
        newm = kind == 1
        np.minimum.at(minnew, seg[newm], ids[newm])
        c = anyc[seg[newm]].astype(np.int64)
        p = (ids[newm] > minnew[seg[newm]]).astype(np.int64)
        return ids[newm], c, p

    n_c = approx_corpus if approx_corpus is not None else corpus.count()
    n_n = approx_new if approx_new is not None else new.count()
    n_rows = (n_c + n_n) * bands

    if n_rows <= local_threshold:
        from ugfraud_ray.functions.collect import collect_table

        t = collect_table(allb)
        ids, c, p = flags_sorted(
            t[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
            t["band"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["kind"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        u, inv = np.unique(ids, return_inverse=True)
        cc = np.zeros(len(u), dtype=np.int64)
        pp = np.zeros(len(u), dtype=np.int64)
        np.maximum.at(cc, inv, c)
        np.maximum.at(pp, inv, p)
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array(u),
                    "has_corpus_cand": pa.array(cc),
                    "has_prior_cand": pa.array(pp),
                    "kept": pa.array(((cc == 0) & (pp == 0)).astype(np.int64)),
                }
            )
        )

    from ugfraud_ray.functions.bucketing import n_coarse_buckets

    nbk = np.uint64(n_coarse_buckets(n_rows))

    def bucketize(t: pa.Table) -> pa.Table:
        band = t["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = t["bucket"].to_numpy(zero_copy_only=False).view(np.uint64)
        cb_ = (band * np.uint64(0x9E3779B97F4A7C15) ^ bucket) % nbk
        return t.append_column("_cb", pa.array(cb_.astype(np.int64)))

    def per_bucket(g: pa.Table) -> pa.Table:
        ids, c, p = flags_sorted(
            g[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
            g["band"].to_numpy(zero_copy_only=False).astype(np.int64),
            g["bucket"].to_numpy(zero_copy_only=False).astype(np.int64),
            g["kind"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        return pa.table(
            {id_col: pa.array(ids), "c": pa.array(c), "p": pa.array(p)}
        )

    agg = (
        allb.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Max("c", alias_name="c"), Max("p", alias_name="p"))
    )

    def finish(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = t["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "has_corpus_cand": pa.array(c),
                "has_prior_cand": pa.array(p),
                "kept": pa.array(((c == 0) & (p == 0)).astype(np.int64)),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# corpus-wide duplicate-line removal (C4 / CCNet paragraph dedup)
# ---------------------------------------------------------------------------

_LINE_PACK = 1 << 21  # pack = doc_id * 2^21 + line_no; docs with >=2M lines fail loudly


def _explode_lines(t: pa.Table, key: str, id_col: str):
    """(ids_per_line, line_no, flat_lines) for the exact '\\n' split.

    Mirrors Python ``text.split('\\n')`` / DuckDB ``string_split(text,
    chr(10))``: an empty document is ONE empty line on both sides.
    """
    import pyarrow.compute as pc

    lists = pc.split_pattern(t[key], "\n")
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lists)
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    rows = np.repeat(np.arange(len(lens)), lens)
    starts = np.repeat(np.cumsum(lens) - lens, lens)
    line_no = np.arange(len(rows), dtype=np.int64) - starts
    if len(line_no) and line_no.max() >= _LINE_PACK:
        raise ValueError("line_dedup: a document has >= 2^21 lines; packed key overflows")
    return ids[rows], line_no, flat


def _line_pack_key(ids: np.ndarray, line_no: np.ndarray) -> np.ndarray:
    if len(ids) and (ids.max() >= (1 << 42) or ids.min() < 0):
        # negative ids would collide with the distributed path's -1
        # family-row sentinel and break the MIN packed-key ordering
        raise ValueError("line_dedup: doc_id outside [0, 2^42) breaks the packed key")
    return ids * np.int64(_LINE_PACK) + line_no


def _join_kept_lines(
    ids: np.ndarray, keep: np.ndarray, flat: pa.Array, id_col: str
) -> pa.Table:
    """Per-doc reassembly: kept lines joined by '\\n', counts per doc.

    ``ids`` must be doc-contiguous and line-ordered (true inside an
    exploded batch and after the per-doc sort in the distributed path).
    Joining is one vectorized ``pc.binary_join`` over a rebuilt
    ListArray — no Python loop over lines.
    """
    import pyarrow.compute as pc

    first = np.ones(len(ids), dtype=bool)
    first[1:] = ids[1:] != ids[:-1]
    doc_ids = ids[first]
    n_lines = np.diff(np.append(np.flatnonzero(first), len(ids))).astype(np.int64)
    # kept lines, grouped per doc in order
    doc_idx = np.cumsum(first) - 1
    n_kept = np.zeros(len(doc_ids), dtype=np.int64)
    np.add.at(n_kept, doc_idx[keep], 1)
    kept_vals = flat.filter(pa.array(keep))
    if isinstance(kept_vals, pa.ChunkedArray):
        kept_vals = kept_vals.combine_chunks()
    offsets = np.concatenate(([0], np.cumsum(n_kept)))
    lists = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), kept_vals)
    joined = pc.binary_join(lists, "\n")
    return pa.table(
        {
            id_col: pa.array(doc_ids),
            "n_lines": pa.array(n_lines),
            "n_kept": pa.array(n_kept),
            "text_dedup": pc.cast(joined, pa.string()),
        }
    )


def line_dedup(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    approx_docs: int | None = None,
    local_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Corpus-wide duplicate-LINE removal — the C4 / CCNet paragraph-dedup
    shape (Raffel et al. 2020 §2.2; Wenzek et al. 2020): every line that
    occurs more than once in the whole corpus is kept only at its first
    occurrence, ordered by (doc_id, line_no), and dropped everywhere else.
    Output per document: (doc_id, n_lines, n_kept, text_dedup) where
    text_dedup is the surviving lines re-joined by '\\n'.

    No reference analog (the reference dedups whole records only,
    Fraudar.py:18-20); this is the training-data-pipeline sibling of
    ``exact_dedup`` at line granularity.

    Line identity is md5-low64 (== DuckDB ``md5_number_upper``), so the
    SQL oracle replays the exact grouping including any collision. The
    first-occurrence winner is MIN(doc_id * 2^21 + line_no) — integer,
    order-free, overflow-guarded.

    Scale shape: pass 1 emits per-block uniqued (h, min_pack, n)
    partials — never raw lines. Only hashes with corpus count > 1 form
    the duplicate-family map (web boilerplate lines — far smaller than
    the corpus). Below ``local_threshold`` docs the map merges on the
    driver and broadcasts once (ray.put of two sorted arrays); pass 2
    then decides keep/drop INSIDE each source batch, so no text ever
    shuffles. Above it, the map comes from a hash-keyed groupby and the
    decision runs in ONE h-bucketed union shuffle (the lm_surprisal
    pattern), followed by one doc-keyed reassembly groupby.
    """
    from ray.data.aggregate import Min, Sum

    from ugfraud_ray.pipelines.sketches import _md5_low64

    def fam_partial(t: pa.Table) -> pa.Table:
        ids, line_no, flat = _explode_lines(t, key, id_col)
        h = _md5_low64(flat.to_pylist()).view(np.int64)
        pack = _line_pack_key(ids, line_no)
        order = np.argsort(h, kind="stable")
        hs, ps = h[order], pack[order]
        firsts = np.ones(len(hs), dtype=bool)
        firsts[1:] = hs[1:] != hs[:-1]
        starts = np.flatnonzero(firsts)
        n = np.diff(np.append(starts, len(hs))).astype(np.int64)
        mp = np.minimum.reduceat(ps, starts) if len(starts) else ps[:0]
        return pa.table(
            {"h": pa.array(hs[firsts]), "mp": pa.array(mp), "n": pa.array(n)}
        )

    partials = docs.map_batches(fam_partial, batch_format="pyarrow")
    n_docs = approx_docs if approx_docs is not None else docs.count()

    if n_docs <= local_threshold:
        t = collect_table(partials)
        h = t["h"].to_numpy(zero_copy_only=False)
        mp = t["mp"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        uh, inv = np.unique(h, return_inverse=True)
        tot = np.zeros(len(uh), dtype=np.int64)
        np.add.at(tot, inv, n)
        mins = np.full(len(uh), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mins, inv, mp)
        dup = tot > 1
        dup_ref = ray.put((uh[dup], mins[dup]))

        def dedup_batch(t: pa.Table) -> pa.Table:
            dh, dmp = ray.get(dup_ref)
            ids, line_no, flat = _explode_lines(t, key, id_col)
            h = _md5_low64(flat.to_pylist()).view(np.int64)
            pack = _line_pack_key(ids, line_no)
            pos = np.clip(np.searchsorted(dh, h), 0, max(len(dh) - 1, 0))
            hit = (dh[pos] == h) if len(dh) else np.zeros(len(h), dtype=bool)
            keep = ~hit | (pack == (dmp[pos] if len(dh) else pack))
            return _join_kept_lines(ids, keep, flat, id_col)

        return docs.select_columns([id_col, key]).map_batches(
            dedup_batch, batch_format="pyarrow"
        )

    fam = (
        partials.groupby("h")
        .aggregate(Min("mp", alias_name="mp"), Sum("n", alias_name="n"))
        .filter(expr="n > 1")
    )

    def fam_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h": t["h"],
                "pack": t["mp"],
                id_col: pa.array(np.full(len(t), -1, dtype=np.int64)),
                "line_no": pa.array(np.zeros(len(t), dtype=np.int64)),
                "line": pa.array([""] * len(t), pa.string()),
            }
        )

    def line_rows(t: pa.Table) -> pa.Table:
        ids, line_no, flat = _explode_lines(t, key, id_col)
        h = _md5_low64(flat.to_pylist()).view(np.int64)
        return pa.table(
            {
                "h": pa.array(h),
                "pack": pa.array(_line_pack_key(ids, line_no)),
                id_col: pa.array(ids),
                "line_no": pa.array(line_no),
                "line": pc.cast(flat, pa.string())
                if isinstance(flat, pa.Array)
                else flat,
            }
        )

    import pyarrow.compute as pc

    nb = n_coarse_buckets(n_docs)
    union = fam.map_batches(fam_rows, batch_format="pyarrow").union(
        docs.select_columns([id_col, key]).map_batches(line_rows, batch_format="pyarrow")
    )

    def bucketize(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column("bucket", pa.array((h % np.uint64(nb)).astype(np.int64)))

    def decide(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        is_fam = ids == -1
        h = g["h"].to_numpy(zero_copy_only=False)
        pack = g["pack"].to_numpy(zero_copy_only=False)
        dh, dmp = h[is_fam], pack[is_fam]
        order = np.argsort(dh, kind="stable")
        dh, dmp = dh[order], dmp[order]
        lh, lp = h[~is_fam], pack[~is_fam]
        pos = np.clip(np.searchsorted(dh, lh), 0, max(len(dh) - 1, 0))
        hit = (dh[pos] == lh) if len(dh) else np.zeros(len(lh), dtype=bool)
        keep = ~hit | (lp == (dmp[pos] if len(dh) else lp))
        lines = g["line"].filter(pa.array(~is_fam))
        kept_line = pa.compute.if_else(pa.array(keep), lines.combine_chunks(), "")
        return pa.table(
            {
                id_col: pa.array(ids[~is_fam]),
                "line_no": g["line_no"].filter(pa.array(~is_fam)),
                "keep": pa.array(keep),
                "line": kept_line,
            }
        )

    decided = (
        union.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(decide, batch_format="pyarrow")
    )

    def reassemble(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        ln = g["line_no"].to_numpy(zero_copy_only=False)
        keep = g["keep"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ln, ids))
        flat = g["line"].combine_chunks().take(pa.array(order))
        return _join_kept_lines(ids[order], keep[order], flat, id_col)

    return decided.groupby(id_col).map_groups(reassemble, batch_format="pyarrow")


def source_dup_rate(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    approx_docs: int | None = None,
) -> "ray.data.Dataset":
    """Per-source exact-duplication rate — the curation diagnostic that
    tells you WHICH feed is flooding the corpus with copies: (source,
    n_docs, n_dups) where a doc is a dup iff its text hash has a
    smaller-id copy anywhere in the corpus (exact_dedup's keep-min
    rule, so n_dups == docs exact_dedup would drop, attributed to the
    source that contributed them).

    Text identity is md5-low64 (== DuckDB md5_number_upper). Scale
    shape: per-block uniqued (h, source, min_doc, n) partials — never
    raw text — into ONE h-coarse-bucket shuffle whose kernel resolves
    global keepers with lexsort/reduceat (no per-hash groups), then a
    source-sized groupby-sum.
    """
    from ray.data.aggregate import Sum

    from ugfraud_ray.pipelines.sketches import _md5_low64

    def partial(t: pa.Table) -> pa.Table:
        h = _md5_low64(t[key].to_pylist()).view(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.asarray(t[source_col].to_pylist(), dtype=object)
        order = np.lexsort((ids, src, h))
        h, ids, src = h[order], ids[order], src[order]
        first = np.ones(len(h), dtype=bool)
        first[1:] = (h[1:] != h[:-1]) | (src[1:] != src[:-1])
        starts = np.flatnonzero(first)
        n = np.diff(np.append(starts, len(h))).astype(np.int64)
        return pa.table(
            {
                "h": pa.array(h[starts]),
                "source": pa.array(src[starts].tolist(), pa.string()),
                "min_doc": pa.array(ids[starts]),
                "n": pa.array(n),
            }
        )

    n_docs = approx_docs if approx_docs is not None else docs.count()
    nb = np.uint64(n_coarse_buckets(n_docs))

    def bucketize(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column("_cb", pa.array((h % nb).astype(np.int64)))

    def resolve(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy(zero_copy_only=False)
        src = np.asarray(g["source"].to_pylist(), dtype=object)
        md = g["min_doc"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((md, h))
        h, src, md, n = h[order], src[order], md[order], n[order]
        first = np.ones(len(h), dtype=bool)
        first[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(first)
        gidx = np.cumsum(first) - 1
        keeper_pos = starts[gidx]  # row of the global min_doc per hash
        is_keeper_row = np.arange(len(h)) == keeper_pos
        dups = n - is_keeper_row.astype(np.int64)
        order2 = np.argsort(src, kind="stable")
        s2, n2, d2 = src[order2], n[order2], dups[order2]
        f2 = np.ones(len(s2), dtype=bool)
        f2[1:] = s2[1:] != s2[:-1]
        st2 = np.flatnonzero(f2)
        return pa.table(
            {
                "source": pa.array(s2[f2].tolist(), pa.string()),
                "n_docs": pa.array(np.add.reduceat(n2, st2) if len(st2) else n2[:0]),
                "n_dups": pa.array(np.add.reduceat(d2, st2) if len(st2) else d2[:0]),
            }
        )

    return (
        docs.select_columns([id_col, key, source_col])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(resolve, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_dups", alias_name="n_dups"))
    )


def _explode_ws_tokens(t: pa.Table, key: str, id_col: str):
    """(ids:int64 per doc-row, rows, flat_tokens:object) for the VERBATIM
    whitespace tokenization (no lowercasing — dedup must reconstruct the
    original tokens): split on \\s+, empties dropped. Mirrors DuckDB
    ``list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')``.
    """
    import pyarrow.compute as pc

    lists = pc.split_pattern_regex(pc.cast(t[key], pa.string()), r"\s+")
    flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    rows = np.repeat(np.arange(len(lens)), lens)
    keep = flat != ""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    return ids, rows[keep], flat[keep]


def _window_occurrences(rows: np.ndarray, flat: np.ndarray, window: int):
    """(start_flat_idx, win_hash:int64, tok_pos:int64) of every in-doc
    token window of length ``window``. Window identity = md5-low64 of
    the chr(31)-joined tokens (the repo's collision-stable key)."""
    from ugfraud_ray.pipelines.sketches import _md5_low64

    n = len(flat)
    if n < window:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    # token position within its doc
    docstarts = np.flatnonzero(np.concatenate([[True], rows[1:] != rows[:-1]]))
    base = np.repeat(docstarts, np.diff(np.append(docstarts, n)))
    pos = np.arange(n, dtype=np.int64) - base
    if pos.max() >= _LINE_PACK:
        raise ValueError("substring_dedup: a document has >= 2^21 tokens")
    same = rows[: n - window + 1] == rows[window - 1 :]
    starts = np.flatnonzero(same).astype(np.int64)
    if len(starts) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    acc = flat[starts].copy()
    for k in range(1, window):
        acc = acc + "\x1f"
        acc = acc + flat[starts + k]
    h = _md5_low64(acc.tolist()).view(np.int64)
    return starts, h, pos[starts]


def _cut_covered(
    ids: np.ndarray,
    rows: np.ndarray,
    flat: np.ndarray,
    dup_start_flat: np.ndarray,
    window: int,
    id_col: str,
) -> pa.Table:
    """Remove every token covered by a duplicated window occurrence and
    reassemble: (doc_id, n_tokens, n_removed, text_dedup) for EVERY doc
    row (empty docs emit n_tokens=0, text_dedup=''). Coverage via the
    +1/-1 prefix trick over the flat token index — windows never cross
    a doc boundary, so coverage stays inside the owning doc."""
    import pyarrow.compute as pc

    n = len(flat)
    delta = np.zeros(n + window + 1, dtype=np.int64)
    if len(dup_start_flat):
        np.add.at(delta, dup_start_flat, 1)
        np.add.at(delta, dup_start_flat + window, -1)
    covered = np.cumsum(delta[:n]) > 0
    keep = ~covered
    n_rows = len(ids)
    n_tok = np.bincount(rows, minlength=n_rows).astype(np.int64)
    n_kept = np.bincount(rows[keep], minlength=n_rows).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(n_kept)))
    lists = pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), pa.array(flat[keep], pa.large_string())
    )
    joined = pc.binary_join(lists, pa.scalar(" ", pa.large_string()))
    return pa.table(
        {
            id_col: pa.array(ids),
            "n_tokens": pa.array(n_tok),
            "n_removed": pa.array(n_tok - n_kept),
            "text_dedup": pc.cast(joined, pa.string()),
        }
    )


def substring_dedup(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    approx_docs: int | None = None,
    local_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Exact substring deduplication at token-window granularity — the
    ExactSubstr shape of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"): every length-``window`` token
    sequence that occurs more than once in the corpus survives only at
    its FIRST occurrence (min doc_id * 2^21 + start, line_dedup's packed
    winner); every other occurrence's tokens are cut from their doc and
    the survivors re-join with single spaces (whitespace-normalizing,
    documented). Overlapping duplicated windows merge into spans via a
    +1/-1 coverage scan, so a long verbatim repeat is removed wholesale,
    not window by window. Output: (doc_id, n_tokens, n_removed,
    text_dedup) for EVERY document.

    Window identity = md5-low64 of the chr(31)-joined VERBATIM tokens
    (no lowercasing — reconstruction must preserve the original), ==
    DuckDB md5_number_upper over array_to_string(slice, chr(31)), so
    the SQL replay is collision-exact.

    Scale shape (line_dedup's, one level up): pass 1 emits per-block
    uniqued (h, min_pack, n) window partials — text never leaves its
    block; only windows with corpus count > 1 form the duplicate map.
    Below the doc gate the map broadcasts once and pass 2 decides +
    cuts + reassembles INSIDE each source batch (zero shuffles). Above
    it, the map comes from a hash groupby; decision runs in ONE
    h-bucketed union shuffle emitting only the (doc, start) duplicate
    occurrences (tokens do NOT ride the shuffle, unlike line_dedup —
    windows are W-fold bigger than their text), and the cut runs in ONE
    doc-bucketed union of source docs + their dup starts.

    No reference analog (reference dedups whole records,
    Fraudar.py:18-20).
    """
    from ray.data.aggregate import Min, Sum

    if window < 2:
        raise ValueError("substring_dedup needs window >= 2")

    def fam_partial(t: pa.Table) -> pa.Table:
        ids, rows, flat = _explode_ws_tokens(t, key, id_col)
        starts, h, pos = _window_occurrences(rows, flat, window)
        if len(starts) == 0:
            return pa.table(
                {
                    "h": pa.array([], pa.int64()),
                    "mp": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        pack = _line_pack_key(ids[rows[starts]], pos)
        order = np.argsort(h, kind="stable")
        hs, ps = h[order], pack[order]
        firsts = np.ones(len(hs), dtype=bool)
        firsts[1:] = hs[1:] != hs[:-1]
        fidx = np.flatnonzero(firsts)
        n = np.diff(np.append(fidx, len(hs))).astype(np.int64)
        mp = np.minimum.reduceat(ps, fidx)
        return pa.table(
            {"h": pa.array(hs[firsts]), "mp": pa.array(mp), "n": pa.array(n)}
        )

    src = docs.select_columns([id_col, key])
    partials = src.map_batches(fam_partial, batch_format="pyarrow")
    n_docs = approx_docs if approx_docs is not None else docs.count()

    if n_docs <= local_threshold:
        t = collect_table(partials)
        h = t["h"].to_numpy(zero_copy_only=False)
        mp = t["mp"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        uh, inv = np.unique(h, return_inverse=True)
        tot = np.zeros(len(uh), dtype=np.int64)
        np.add.at(tot, inv, n)
        mins = np.full(len(uh), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mins, inv, mp)
        dup = tot > 1
        dup_ref = ray.put((uh[dup], mins[dup]))

        def cut_batch(t: pa.Table) -> pa.Table:
            dh, dmp = ray.get(dup_ref)
            ids, rows, flat = _explode_ws_tokens(t, key, id_col)
            starts, hh, pos = _window_occurrences(rows, flat, window)
            if len(starts) and len(dh):
                pack = _line_pack_key(ids[rows[starts]], pos)
                at = np.clip(np.searchsorted(dh, hh), 0, len(dh) - 1)
                is_dup = (dh[at] == hh) & (pack != dmp[at])
                dup_starts = starts[is_dup]
            else:
                dup_starts = np.zeros(0, dtype=np.int64)
            return _cut_covered(ids, rows, flat, dup_starts, window, id_col)

        return src.map_batches(cut_batch, batch_format="pyarrow")

    fam = (
        partials.groupby("h")
        .aggregate(Min("mp", alias_name="mp"), Sum("n", alias_name="n"))
        .filter(expr="n > 1")
    )

    # --- decision shuffle: family rows + occurrence rows, keyed by h ---
    def fam_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h": t["h"],
                "pack": t["mp"],
                id_col: pa.array(np.full(len(t), -1, dtype=np.int64)),
                "i": pa.array(np.zeros(len(t), dtype=np.int64)),
            }
        )

    def occ_rows(t: pa.Table) -> pa.Table:
        ids, rows, flat = _explode_ws_tokens(t, key, id_col)
        starts, h, pos = _window_occurrences(rows, flat, window)
        return pa.table(
            {
                "h": pa.array(h),
                "pack": pa.array(
                    _line_pack_key(ids[rows[starts]], pos)
                    if len(starts)
                    else np.zeros(0, dtype=np.int64)
                ),
                id_col: pa.array(
                    ids[rows[starts]] if len(starts) else np.zeros(0, dtype=np.int64)
                ),
                "i": pa.array(pos),
            }
        )

    nb = n_coarse_buckets(n_docs)
    union = fam.map_batches(fam_rows, batch_format="pyarrow").union(
        src.map_batches(occ_rows, batch_format="pyarrow")
    )

    def bucketize_h(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column(
            "bucket", pa.array((h % np.uint64(nb)).astype(np.int64))
        )

    def decide(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        is_fam = ids == -1
        h = g["h"].to_numpy(zero_copy_only=False)
        pack = g["pack"].to_numpy(zero_copy_only=False)
        dh, dmp = h[is_fam], pack[is_fam]
        order = np.argsort(dh, kind="stable")
        dh, dmp = dh[order], dmp[order]
        oh, op = h[~is_fam], pack[~is_fam]
        if len(dh):
            at = np.clip(np.searchsorted(dh, oh), 0, len(dh) - 1)
            is_dup = (dh[at] == oh) & (op != dmp[at])
        else:
            is_dup = np.zeros(len(oh), dtype=bool)
        return pa.table(
            {
                id_col: pa.array(ids[~is_fam][is_dup]),
                "i": pa.array(
                    g["i"].to_numpy(zero_copy_only=False)[~is_fam][is_dup]
                ),
            }
        )

    dupocc = (
        union.map_batches(bucketize_h, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(decide, batch_format="pyarrow")
    )

    # --- cut shuffle: source docs + their dup starts, keyed by doc ---
    def doc_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col],
                "i": pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
                key: pc.cast(t[key], pa.string()),
            }
        )

    def occ_tag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col],
                "i": t["i"],
                key: pa.array([""] * t.num_rows, pa.string()),
            }
        )

    union2 = src.map_batches(doc_rows, batch_format="pyarrow").union(
        dupocc.map_batches(occ_tag, batch_format="pyarrow")
    )

    def bucketize_doc(t: pa.Table) -> pa.Table:
        d = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        hh = d * np.uint64(0x9E3779B97F4A7C15)
        hh ^= hh >> np.uint64(29)
        return t.append_column(
            "bucket", pa.array((hh % np.uint64(nb)).astype(np.int64))
        )

    def cut_bucket(g: pa.Table) -> pa.Table:
        i = g["i"].to_numpy(zero_copy_only=False)
        is_doc = i == -1
        dt = g.filter(pa.array(is_doc))
        ids, rows, flat = _explode_ws_tokens(dt, key, id_col)
        od = g[id_col].to_numpy(zero_copy_only=False)[~is_doc]
        oi = i[~is_doc]
        if len(od):
            # map (doc, tok_pos) -> flat index: docs present are exactly
            # dt's rows; find each doc's first flat index
            docstarts = np.flatnonzero(
                np.concatenate([[True], rows[1:] != rows[:-1]])
            )
            doc_of_start = ids[rows[docstarts]] if len(docstarts) else ids[:0]
            order = np.argsort(doc_of_start, kind="stable")
            sdocs = doc_of_start[order]
            sflat = docstarts[order]
            at = np.searchsorted(sdocs, od)
            dup_starts = sflat[at] + oi
        else:
            dup_starts = np.zeros(0, dtype=np.int64)
        return _cut_covered(ids, rows, flat, dup_starts, window, id_col)

    return (
        union2.map_batches(bucketize_doc, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cut_bucket, batch_format="pyarrow")
    )


def cross_source_dup_matrix(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    local_threshold: int = 5_000_000,
) -> "ray.data.Dataset":
    """(source_a, source_b, n_pairs) — which feeds duplicate each other:
    MinHash-LSH candidate near-dup pairs classified by the unordered
    pair of contributing sources (lexicographic source_a <= source_b ==
    SQL LEAST/GREATEST). The diagonal is within-feed boilerplate; a fat
    off-diagonal cell means two feeds crawl the same sites (mirror
    feeds) — the near-dup sibling of ``source_dup_rate``.

    Scale shape: pairs come from the shared bit-exact LSH chain. Below
    ``local_threshold`` pairs, the (id -> source) lookup is built from
    the PAIR-PARTICIPANT ids only (metadata filtered by an isin
    broadcast, then collected — O(colliding docs), the minhash_lsh_dedup
    contract, never the corpus); above it, two hash joins against the
    metadata classify endpoints without anything corpus-sized on the
    driver.
    """
    from ray.data.aggregate import Sum

    cands = minhash_lsh_candidates(docs, key=key, id_col=id_col).materialize()
    n_pairs = cands.count()
    meta = docs.select_columns([id_col, source_col])

    def classify_np(sa: np.ndarray, sb: np.ndarray) -> pa.Table:
        swap = sa > sb
        lo = np.where(swap, sb, sa)
        hi = np.where(swap, sa, sb)
        pk = np.char.add(np.char.add(lo.astype(str), "\x1f"), hi.astype(str))
        u, cnt = np.unique(pk, return_counts=True)
        parts = np.char.partition(u, "\x1f")
        return pa.table(
            {
                "source_a": pa.array(parts[:, 0].astype(object), pa.string()),
                "source_b": pa.array(parts[:, 2].astype(object), pa.string()),
                "n_pairs": pa.array(cnt.astype(np.int64)),
            }
        )

    if n_pairs <= local_threshold:
        pt = collect_table(cands)
        ia = pt["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        ib = pt["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ia) == 0:
            return ray.data.from_arrow(
                pa.table(
                    {
                        "source_a": pa.array([], pa.string()),
                        "source_b": pa.array([], pa.string()),
                        "n_pairs": pa.array([], pa.int64()),
                    }
                )
            )
        participants = np.unique(np.concatenate([ia, ib]))
        part_ref = ray.put(participants)

        def only_participants(t: pa.Table) -> pa.Table:
            p = ray.get(part_ref)
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return t.filter(pa.array(np.isin(ids, p)))

        mt = collect_table(
            meta.map_batches(only_participants, batch_format="pyarrow")
        )
        mid = mt[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        msrc = np.asarray(mt[source_col].to_pylist(), dtype=object)
        order = np.argsort(mid, kind="stable")
        mid, msrc = mid[order], msrc[order]
        sa = msrc[np.searchsorted(mid, ia)]
        sb = msrc[np.searchsorted(mid, ib)]
        return ray.data.from_arrow(classify_np(sa, sb))

    from ugfraud_ray.stages.graph_build import _nrows, join_partitions

    def _nonempty(ds: "ray.data.Dataset") -> "ray.data.Dataset | None":
        # drop columnless empty blocks — Arrow's hash join rejects them
        # ("no match for key field", the number_int_vertices workaround);
        # needed on BOTH join inputs that came through a shuffle
        refs = ds.to_arrow_refs()
        counts = ray.get([_nrows.remote(r) for r in refs])
        keep_refs = [r for r, c in zip(refs, counts) if c]
        return ray.data.from_arrow_refs(keep_refs) if keep_refs else None

    empty_out = pa.table(
        {
            "source_a": pa.array([], pa.string()),
            "source_b": pa.array([], pa.string()),
            "n_pairs": pa.array([], pa.int64()),
        }
    )
    cands = _nonempty(cands)
    if cands is None:
        return ray.data.from_arrow(empty_out)
    j1 = _nonempty(
        cands.join(
            meta.rename_columns({id_col: "id_a", source_col: "sa"}),
            join_type="inner", num_partitions=join_partitions(), on=("id_a",),
        ).materialize()
    )
    if j1 is None:
        return ray.data.from_arrow(empty_out)
    j = j1.join(
        meta.rename_columns({id_col: "id_b", source_col: "sb"}),
        join_type="inner", num_partitions=join_partitions(), on=("id_b",),
    )

    def classify_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source_a": pa.array([], pa.string()),
                    "source_b": pa.array([], pa.string()),
                    "n_pairs": pa.array([], pa.int64()),
                }
            )
        sa = np.asarray(t["sa"].to_pylist(), dtype=object)
        sb = np.asarray(t["sb"].to_pylist(), dtype=object)
        return classify_np(sa, sb)

    return (
        j.map_batches(classify_batch, batch_format="pyarrow")
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))
    )


def lsh_tuning_table(num_perm: int = 64) -> pa.Table:
    """(bands, rows_per_band, threshold) — the banded-LSH operating
    curve: for every divisor split b x r = num_perm, the similarity
    threshold where collision probability crosses 1/2, t = (1/b)^(1/r)
    (Leskovec-Rajaraman-Ullman, "Mining of Massive Datasets" ch. 3).
    The tuning readout behind minhash_lsh_candidates' (bands=16, r=4)
    default; float chain pinned to POWER both sides, 1e-9 grid."""
    bands = [b for b in range(1, num_perm + 1) if num_perm % b == 0]
    rows = [num_perm // b for b in bands]
    thr = [
        float(np.floor((1.0 / b) ** (1.0 / r) * 1e9 + 0.5) / 1e9)
        for b, r in zip(bands, rows)
    ]
    return pa.table(
        {
            "bands": pa.array(np.array(bands, dtype=np.int64)),
            "rows_per_band": pa.array(np.array(rows, dtype=np.int64)),
            "threshold": pa.array(thr),
        }
    )


def lsh_quality_report(
    docs: "ray.data.Dataset",
    threshold: float = 0.3,
    approx_docs: int | None = None,
) -> pa.Table:
    """(n_truth, n_cand, n_hit, recall, precision) — the LSH quality
    audit: ground truth = exact shingle-Jaccard pairs >= ``threshold``,
    candidates = the production banded-LSH chain; recall tells you what
    the bands MISS at this threshold (the lsh_tuning_table curve made
    measurable on real data), precision what they over-generate. Pair
    sets pack to int64 keys and intersect on the driver — both tables
    are the pair-scale outputs the LSH contract already broadcasts.
    """
    truth = exact_shingle_jaccard(
        docs, threshold=threshold, approx_docs=approx_docs
    )
    cand = minhash_lsh_candidates(docs)

    def pack(t: pa.Table) -> np.ndarray:
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) and (a.max() >= (1 << 31) or b.max() >= (1 << 31)):
            raise ValueError("lsh_quality_report: ids exceed the 2^31 pack")
        return a * np.int64(1 << 32) + b

    tp = np.unique(pack(collect_table(truth)))
    cp = np.unique(pack(collect_table(cand)))
    n_hit = int(np.isin(tp, cp).sum())
    n_truth, n_cand = len(tp), len(cp)
    recall = (
        float(np.floor(n_hit / n_truth * 1e9 + 0.5) / 1e9) if n_truth else 0.0
    )
    precision = (
        float(np.floor(n_hit / n_cand * 1e9 + 0.5) / 1e9) if n_cand else 0.0
    )
    return pa.table(
        {
            "n_truth": pa.array([n_truth], pa.int64()),
            "n_cand": pa.array([n_cand], pa.int64()),
            "n_hit": pa.array([n_hit], pa.int64()),
            "recall": pa.array([recall]),
            "precision": pa.array([precision]),
        }
    )


def simhash_clusters(
    docs: "ray.data.Dataset",
    key: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    local_threshold: int = 5_000_000,
) -> "ray.data.Dataset":
    """(doc_id, cluster) — near-dup clusters over the SIMHASH candidate
    pairs (4x16-bit chunk banding + exact hamming <= max_hamming),
    cluster = min doc_id of the connected component: the simhash
    sibling of ``minhash_lsh_dedup``, sharing ``_pairs_to_cluster_map``
    (driver union-find below the pair gate, distributed hash-min CC
    above) and the broadcast assign pass."""
    pairs = simhash_dedup(docs, key=key, id_col=id_col, max_hamming=max_hamming)
    pairs = pairs.select_columns(["id_a", "id_b"]).materialize()
    mk, mv = _pairs_to_cluster_map(pairs, local_threshold)
    map_ref = ray.put((mk, mv))

    def assign(t: pa.Table) -> pa.Table:
        k, v = ray.get(map_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(k):
            pos = np.clip(np.searchsorted(k, ids), 0, len(k) - 1)
            hit = k[pos] == ids
            cl = np.where(hit, v[pos], ids)
        else:
            cl = ids
        return pa.table({id_col: pa.array(ids), "cluster": pa.array(cl)})

    return docs.select_columns([id_col]).map_batches(assign, batch_format="pyarrow")


def top_duplicated_texts(
    docs: "ray.data.Dataset",
    k: int = 10,
    key: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """(rnk, n_copies, first_doc, text) — the k most-duplicated exact
    texts (the boilerplate report a crawl review starts with), ranked
    (n_copies DESC, first_doc ASC). Hash-level resolution first —
    per-block uniqued (h, n, min_doc) partials into an h-keyed grouped
    merge (text never shuffles); only the k winners' texts are then
    fetched by a broadcast id probe. md5-low64 identity, collision-
    stable both sides."""
    from ray.data.aggregate import Min, Sum

    from ugfraud_ray.functions.collect import collect_table
    from ugfraud_ray.pipelines.sketches import _md5_low64

    def partial(t: pa.Table) -> pa.Table:
        h = _md5_low64(t[key].to_pylist()).view(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(h, kind="stable")
        hs, ds_ = h[order], ids[order]
        starts = np.flatnonzero(np.concatenate([[True], hs[1:] != hs[:-1]]))
        n = np.diff(np.append(starts, len(hs))).astype(np.int64)
        md = np.minimum.reduceat(ds_, starts)
        return pa.table(
            {"h": pa.array(hs[starts]), "n": pa.array(n), "md": pa.array(md)}
        )

    agg = collect_table(
        docs.select_columns([id_col, key])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("n", alias_name="n"), Min("md", alias_name="md"))
    )
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    md = agg["md"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((md, -n))[:k]
    win_md = md[order]
    win_n = n[order]
    want = np.sort(win_md)
    ref = ray.put(want)

    def fetch(t: pa.Table) -> pa.Table:
        w = ray.get(ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(w, ids), 0, len(w) - 1)
        return t.filter(pa.array(w[pos] == ids))

    tt = collect_table(
        docs.select_columns([id_col, key]).map_batches(fetch, batch_format="pyarrow")
    )
    tmap = dict(zip(
        tt[id_col].to_numpy(zero_copy_only=False).astype(np.int64).tolist(),
        tt[key].to_pylist(),
    ))
    return pa.table(
        {
            "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "n_copies": pa.array(win_n),
            "first_doc": pa.array(win_md),
            "text": pa.array([tmap[int(d)] for d in win_md], pa.string()),
        }
    )
