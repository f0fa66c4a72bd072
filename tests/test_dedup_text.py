"""Dedup-family property tests: planted near-duplicates must be found."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform"
).split()


def _corpus_with_dups(n_base=60, n_dup_pairs=8, seed=19):
    """Docs 0..n_base-1 random; each dup doc i' copies doc i with one
    word changed. Returns (table, set of (i, i') planted pairs)."""
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(_WORDS, size=rng.integers(30, 60)))
        for _ in range(n_base)
    ]
    planted = set()
    for j in range(n_dup_pairs):
        src = j  # dup the first n_dup_pairs docs
        words = texts[src].split()
        words[len(words) // 2] = "zulu"
        texts.append(" ".join(words))
        planted.add((src, n_base + j))
    ids = np.arange(len(texts), dtype=np.int64)
    return (
        pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)}),
        planted,
    )


def test_ngram_jaccard_distributed_branch_parity(ray_session):
    """The r4 driver-free jaccard branch (semi-join -> shingle explode
    -> sh-bucket pair emission -> outer joins) must agree bit-for-bit
    with the broadcast-dict branch on every candidate pair, including
    zero-intersection LSH false positives and short/empty docs."""
    from ugfraud_ray.pipelines.dedup import minhash_lsh_candidates, ngram_jaccard_pairs

    t, _ = _corpus_with_dups()
    # plant a short doc (fewer tokens than the shingle width) and an
    # empty doc so the no-shingle guard is exercised in both branches
    t = pa.table(
        {
            "doc_id": pa.array(
                np.concatenate([t["doc_id"].to_numpy(), [9000, 9001]])
            ),
            "text": pa.array(list(t["text"].to_pylist()) + ["one two", ""]),
        }
    )
    docs = ray.data.from_arrow(t).materialize()
    cands = minhash_lsh_candidates(docs).materialize()
    # extra synthetic candidate pairs covering the degenerate cases:
    # zero-overlap, short-vs-empty, a REVERSED pair (id_a > id_b), a
    # self-pair, and a duplicate of an LSH pair — canonicalization (r5)
    # must make both branches agree on all of them
    extra = pa.table(
        {"id_a": pa.array([0, 9000, 5, 7, 9000], pa.int64()),
         "id_b": pa.array([9001, 9001, 1, 7, 9001], pa.int64())}
    )
    allpairs = ray.data.from_arrow(
        pa.concat_tables([pa.concat_tables([b for b in ray.get(cands.to_arrow_refs()) if b.num_rows]), extra])
    ).materialize()

    local = ngram_jaccard_pairs(docs, allpairs).to_pandas()
    dist = ngram_jaccard_pairs(docs, allpairs, local_threshold=0).to_pandas()
    key = lambda df: {
        (int(a), int(b)): float(j)
        for a, b, j in zip(df["id_a"], df["id_b"], df["jaccard"])
    }
    lk, dk = key(local), key(dist)
    assert lk.keys() == dk.keys()
    # canonicalization invariants: ascending keys, no self-pairs, the
    # reversed (5,1) scored under (1,5), duplicates collapsed
    for df in (local, dist):
        assert (df["id_a"] < df["id_b"]).all()
        assert not df.duplicated(["id_a", "id_b"]).any()
    assert (1, 5) in lk and (7, 7) not in lk and (5, 1) not in lk
    for p in lk:
        assert lk[p] == dk[p], (p, lk[p], dk[p])  # bit-exact float parity
    # thresholded variant drops the same pairs in both branches
    lt = ngram_jaccard_pairs(docs, allpairs, threshold=0.5).to_pandas()
    dt = ngram_jaccard_pairs(docs, allpairs, threshold=0.5, local_threshold=0).to_pandas()
    assert key(lt) == key(dt)


def test_minhash_verified_dedup(ray_session):
    """Verified near-dedup: LSH candidates survive only with exact
    n-gram Jaccard >= threshold. threshold=0 reduces to plain LSH
    clustering; an impossible threshold leaves every doc a singleton;
    a mid threshold keeps true near-dups and drops any weaker
    candidate pair."""
    from ugfraud_ray.pipelines.dedup import (
        minhash_lsh_candidates,
        minhash_lsh_dedup,
        minhash_verified_dedup,
        ngram_jaccard_pairs,
    )

    t, planted = _corpus_with_dups()
    docs = ray.data.from_arrow(t).materialize()

    plain = minhash_lsh_dedup(docs).to_pandas()
    v0 = minhash_verified_dedup(docs, threshold=0.0).to_pandas()
    assert dict(zip(v0["doc_id"], v0["cluster"])) == dict(
        zip(plain["doc_id"], plain["cluster"])
    )

    v_imp = minhash_verified_dedup(docs, threshold=1.5).to_pandas()
    assert (v_imp["cluster"].to_numpy() == v_imp["doc_id"].to_numpy()).all()

    # mid threshold: planted one-token-changed pairs have jaccard well
    # above 0.5 and must stay merged; every surviving merge must be
    # backed by a candidate pair whose exact jaccard >= 0.5
    v = minhash_verified_dedup(docs, threshold=0.5).to_pandas()
    cl = dict(zip(v["doc_id"], v["cluster"]))
    for a, b in planted:
        assert cl[a] == cl[b]
    cands = minhash_lsh_candidates(docs).materialize()
    jac = ngram_jaccard_pairs(docs, cands).to_pandas()
    ok_pairs = {
        (a, b) for a, b, j in zip(jac["id_a"], jac["id_b"], jac["jaccard"]) if j >= 0.5
    }
    # reconstruct expected clusters from verified pairs via union-find
    parent = {int(i): int(i) for i in v["doc_id"]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in ok_pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for i in parent:
        assert cl[i] == find(i)


def test_minhash_lsh_finds_planted_dups(ray_session):
    from ugfraud_ray.pipelines.dedup import minhash_lsh_candidates, minhash_lsh_dedup

    t, planted = _corpus_with_dups()
    docs = ray.data.from_arrow(t).materialize()
    cands = minhash_lsh_candidates(docs).to_pandas()
    got_pairs = set(zip(cands["id_a"], cands["id_b"]))
    assert planted <= got_pairs, planted - got_pairs
    # false-positive rate sane: candidates well below all-pairs
    assert len(got_pairs) < len(t) * 4

    clusters = minhash_lsh_dedup(docs).to_pandas()
    cl = dict(zip(clusters["doc_id"], clusters["cluster"]))
    for a, b in planted:
        assert cl[a] == cl[b]

    # distributed clustering path (threshold=0: hash-min CC over the
    # candidate pairs) agrees bit-exactly with the driver union-find
    dist = minhash_lsh_dedup(docs, local_threshold=0).to_pandas()
    dl = dict(zip(dist["doc_id"], dist["cluster"]))
    assert dl == cl


def test_ngram_jaccard_separates_dups_from_random(ray_session):
    from ugfraud_ray.pipelines.dedup import minhash_lsh_candidates, ngram_jaccard_pairs

    t, planted = _corpus_with_dups()
    docs = ray.data.from_arrow(t).materialize()
    cands = minhash_lsh_candidates(docs)
    jac = ngram_jaccard_pairs(docs, cands).to_pandas()
    jmap = {(a, b): v for a, b, v in zip(jac["id_a"], jac["id_b"], jac["jaccard"])}
    for p in planted:
        assert jmap.get(p, 0.0) > 0.7, (p, jmap.get(p))
    others = [v for k, v in jmap.items() if k not in planted]
    if others:
        assert max(others) < 0.7


def test_simhash_finds_planted_dups(ray_session):
    from ugfraud_ray.pipelines.dedup import simhash_dedup

    t, planted = _corpus_with_dups()
    docs = ray.data.from_arrow(t).materialize()
    pairs = simhash_dedup(docs, max_hamming=10).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    found = sum(1 for p in planted if p in got)
    assert found >= len(planted) * 0.75, (found, len(planted))


def test_exact_dedup_identical_copies(ray_session):
    from ugfraud_ray.pipelines.dedup import exact_dedup

    texts = ["same text here"] * 3 + ["different one", "another distinct"]
    t = pa.table(
        {"doc_id": pa.array(np.arange(5, dtype=np.int64)), "text": pa.array(texts)}
    )
    out = exact_dedup(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 3
    trip = out[out.n_copies == 3]
    assert len(trip) == 1 and trip.iloc[0]["doc_id"] == 0  # min-id survivor
    # driver-local fast path (approx_rows hint) agrees with distributed
    loc = exact_dedup(ray.data.from_arrow(t), approx_rows=5).to_pandas()
    key = ["text_hash", "doc_id", "n_copies"]
    assert sorted(map(tuple, loc[key].values.tolist())) == sorted(
        map(tuple, out[key].values.tolist())
    )


def test_embedding_cosine_dedup_planted(ray_session):
    from ugfraud_ray.pipelines.dedup import embedding_cosine_dedup

    rng = np.random.default_rng(43)
    n, dim = 200, 16
    vecs = rng.standard_normal((n, dim))
    vecs[150] = vecs[10] + 0.01 * rng.standard_normal(dim)  # planted near-dup
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1).astype(np.float32)), dim
            ),
        }
    )
    pairs = embedding_cosine_dedup(
        ray.data.from_arrow(t), threshold=0.99
    ).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (10, 150) in got


def test_embedding_cosine_pairs_exact_matches_numpy(ray_session):
    """Exact brute-force pairs == dense numpy all-pairs at the rounded
    threshold; and every LSH-found pair is in the exact set."""
    from ugfraud_ray.pipelines.dedup import (
        embedding_cosine_dedup,
        embedding_cosine_pairs_exact,
    )

    rng = np.random.default_rng(47)
    n, dim = 150, 12
    vecs = rng.standard_normal((n, dim))
    vecs[120] = vecs[3] + 0.01 * rng.standard_normal(dim)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1).astype(np.float32)), dim
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    got = embedding_cosine_pairs_exact(ds, threshold=0.5, round_to=4).to_pandas()

    x = vecs.astype(np.float32).astype(np.float64)
    nv = x / np.linalg.norm(x, axis=1)[:, None]
    sims = np.round(nv @ nv.T, 4)
    i, j = np.triu_indices(n, k=1)
    keep = sims[i, j] >= 0.5
    want = set(zip(i[keep].tolist(), j[keep].tolist()))
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    assert got_pairs == want

    lsh = embedding_cosine_dedup(ds, threshold=0.5).to_pandas()
    assert set(zip(lsh["id_a"], lsh["id_b"])) <= {
        (a, b) for a, b in zip(i[sims[i, j] >= 0.5 - 1e-9], j[sims[i, j] >= 0.5 - 1e-9])
    }


def test_pair_dedup_local_and_distributed_agree(ray_session):
    """dedup_pairs and _bucketed_pair_emit: the driver-local fast path
    and the coarse-bucket shuffle path must produce identical results."""
    from ugfraud_ray.pipelines.dedup import _bucketed_pair_emit
    from ugfraud_ray.stages.graph_build import dedup_pairs

    rng = np.random.default_rng(67)
    t = pa.table(
        {
            "src": pa.array(rng.integers(0, 50, 4000)),
            "dst": pa.array(rng.integers(0, 50, 4000)),
            "w": pa.array(rng.random(4000)),
        }
    )
    ds = ray.data.from_arrow(t)
    loc = dedup_pairs(ds, extra={"w": "min"}, approx_rows=4000).to_pandas()
    dist = dedup_pairs(ds, extra={"w": "min"}, approx_rows=None).to_pandas()
    key = ["src", "dst"]
    loc = loc.sort_values(key).reset_index(drop=True)
    dist = dist.sort_values(key).reset_index(drop=True)
    assert len(loc) == len(dist)
    assert (loc[key].to_numpy() == dist[key].to_numpy()).all()
    assert np.allclose(loc["w"], dist["w"])

    kt = pa.table(
        {
            "k": pa.array(rng.integers(0, 30, 2000)),
            "id": pa.array(rng.permutation(2000).astype(np.int64)),
        }
    )
    kds = ray.data.from_arrow(kt)
    pl = _bucketed_pair_emit(kds, ["k"], "id", approx_rows=2000).to_pandas()
    pd_ = _bucketed_pair_emit(kds, ["k"], "id", approx_rows=None).to_pandas()
    sl = set(zip(pl["id_a"], pl["id_b"]))
    sd = set(zip(pd_["id_a"], pd_["id_b"]))
    assert sl == sd and len(sl) > 0


def test_top_tokens_matches_counter(ray_session):
    """top_tokens must equal a collections.Counter replica, ties broken
    token-ascending, and be partition-invariant."""
    from collections import Counter

    from ugfraud_ray.pipelines.text_analysis import top_tokens

    texts = [
        "The cat sat on the mat",
        "the DOG sat  on\tthe log",
        "",
        "   ",
        "cat dog cat",
    ]
    c = Counter()
    for s in texts:
        c.update(s.lower().split())
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]

    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    for parts in (1, 3):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = top_tokens(ds, k=5).to_pandas()
        assert list(zip(got["token"], got["n"])) == want
        assert got["rnk"].tolist() == list(range(1, len(want) + 1))


def test_bpe_token_counts_match_re_oracle(ray_session):
    import re

    from ugfraud_ray.pipelines.text_analysis import _BPE_RE, bpe_token_counts

    texts = [
        "Hello world!  it's 2026...",
        "don't stop, we've   got 99 problems",
        "",
        "   ",
        "a1b2 c-3 'll'd",
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts))), "text": pa.array(texts)})
    )
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(ds).take_all()
    }
    pat = re.compile(_BPE_RE)
    want = {i: len(pat.findall(s)) for i, s in enumerate(texts)}
    assert got == want


def test_distinctive_terms_matches_python_oracle(ray_session):
    from collections import Counter

    from ugfraud_ray.pipelines.text_analysis import distinctive_terms

    rng = np.random.default_rng(47)
    vocab = np.array([f"w{i:02d}" for i in range(40)])
    texts = []
    for i in range(60):
        # every doc gets the common filler words plus a skewed sample
        toks = ["the", "and"] * 3 + list(rng.choice(vocab, rng.integers(5, 30)))
        rng.shuffle(toks)
        texts.append(" ".join(toks))
    n = len(texts)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(n)), "text": pa.array(texts)})
    ).repartition(4)

    k, pct = 3, 10
    # python oracle
    df = Counter()
    for s in texts:
        df.update(set(s.split()))
    common = {t for t, d in df.items() if d * 100 > pct * n}
    want = set()
    for i, s in enumerate(texts):
        tf = Counter(t for t in s.split() if t not in common)
        ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for r, (tok, c) in enumerate(ranked, 1):
            want.add((i, tok, c, r))

    got = distinctive_terms(ds, k=k, common_df_pct=pct, approx_docs=n)
    rows = {(r["doc_id"], r["token"], r["tf"], r["rnk"]) for r in got.take_all()}
    assert rows == want
    # distributed DF branch agrees
    got2 = distinctive_terms(ds, k=k, common_df_pct=pct)
    rows2 = {(r["doc_id"], r["token"], r["tf"], r["rnk"]) for r in got2.take_all()}
    assert rows2 == want


def test_boilerplate_stats_matches_python_oracle(ray_session):
    from ugfraud_ray.pipelines.text_analysis import boilerplate_stats
    from ugfraud_ray.pipelines.dedup import _shingle_hashes

    header = "site nav home about contact terms"
    bodies = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight nine",
        "red green blue yellow purple orange cyan",
        "cat dog bird fish horse cow sheep goat",
    ]
    texts = [f"{header} {b}" for b in bodies] + [header, "unique solitary words only here"]
    t = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t)
    got = (
        boilerplate_stats(ds, min_docs=3, pct=50)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )

    # python oracle
    sh_per_doc = {i: set(np.unique(_shingle_hashes(x, 3)).tolist()) for i, x in enumerate(texts)}
    from collections import Counter
    df = Counter(s for shs in sh_per_doc.values() for s in shs)
    for i, shs in sh_per_doc.items():
        row = got[got["doc_id"] == i].iloc[0]
        nb = sum(1 for s in shs if df[s] >= 3)
        assert row["n_shingles"] == len(shs)
        assert row["n_boiler"] == nb
        assert row["is_boilerplate"] == int(nb * 100 >= 50 * len(shs) and len(shs) > 0)
    # the pure-header doc is flagged; the unique doc is not
    assert got.loc[got["doc_id"] == 4, "is_boilerplate"].iloc[0] == 1
    assert got.loc[got["doc_id"] == 5, "is_boilerplate"].iloc[0] == 0


def test_boilerplate_local_vs_distributed_agree(ray_session):
    from ugfraud_ray.pipelines.text_analysis import boilerplate_stats

    rng = np.random.default_rng(3)
    vocab = np.array(["a", "b", "c", "d", "e", "f", "g", "h"])
    texts = [" ".join(vocab[rng.integers(0, 8, size=rng.integers(4, 30))]) for _ in range(120)]
    t = pa.table({"doc_id": pa.array(np.arange(120, dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t)
    a = boilerplate_stats(ds, local_threshold=1_000_000).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = boilerplate_stats(ds, local_threshold=0).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "n_shingles", "n_boiler", "is_boilerplate"):
        assert a[c].tolist() == b[c].tolist(), c


def test_source_quality_rollup(ray_session):
    from ugfraud_ray.pipelines.text_analysis import source_quality_rollup

    t = pa.table(
        {
            "source": pa.array(["a", "a", "b", "b", "b"], pa.string()),
            "text": pa.array(
                ["one two three", "four five", "x", "", "y z"], pa.string()
            ),
        }
    )
    got = (
        source_quality_rollup(ray.data.from_arrow(t))
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    assert got["n_docs"].tolist() == [2, 3]
    assert got["total_chars"].tolist() == [22, 4]
    assert got["total_tokens"].tolist() == [5, 3]
    assert got["avg_tokens"].tolist() == [2.5, 1.0]


def test_oov_stats(ray_session):
    from ugfraud_ray.pipelines.text_analysis import oov_stats

    # top-2 vocab = {"a" (x4), "b" (x3)}; "c","d" are OOV
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a a b c", "A b d", "a b"], pa.string()),
        }
    )
    got = oov_stats(ray.data.from_arrow(t), vocab_k=2).to_pandas().sort_values("doc_id")
    assert got["n_tokens"].tolist() == [4, 3, 2]
    assert got["n_oov"].tolist() == [1, 1, 0]


def test_pack_sequences(ray_session):
    from ugfraud_ray.pipelines.packing import pack_sequences

    texts = ["a b c", "d e", "f g h i", "j", "k l m n o p", "q r"]  # 3,2,4,1,6,2
    t = pa.table({"doc_id": pa.array(np.arange(6, dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    got = (
        pack_sequences(ray.data.from_arrow(t), budget=5, range_size=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    n = np.array([3, 2, 4, 1, 6, 2])
    before = np.concatenate([[0], np.cumsum(n)[:-1]])
    assert got["n_tokens"].tolist() == n.tolist()
    assert got["seq_id"].tolist() == (before // 5).tolist()
    assert got["seq_offset"].tolist() == (before % 5).tolist()


def test_pack_sequences_range_invariance(ray_session):
    from ugfraud_ray.pipelines.packing import pack_sequences

    rng = np.random.default_rng(4)
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 40, size=200)]
    t = pa.table({"doc_id": pa.array(np.arange(200, dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t)
    a = pack_sequences(ds, budget=128, range_size=7).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = pack_sequences(ds, budget=128, range_size=64).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (a == b).all().all()


def test_inverted_index_matches_python_oracle(ray_session):
    from ugfraud_ray.pipelines.text_analysis import inverted_index

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 25)))
        for _ in range(120)
    ]
    t = pa.table({"doc_id": pa.array(np.arange(120, dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t)

    want: dict[str, list[int]] = {}
    for i, s in enumerate(texts):
        for tok in sorted(set(s.lower().split())):
            want.setdefault(tok, []).append(i)

    got = (
        inverted_index(ds, approx_pairs=10_000)
        .to_pandas().sort_values("token").reset_index(drop=True)
    )
    assert len(got) == len(want)
    for _, row in got.iterrows():
        ids = want[row["token"]]
        assert row["df"] == len(ids)
        assert row["postings"] == ",".join(str(x) for x in ids)

    # distributed (bucket-shuffle) path agrees with the local path
    dist = (
        inverted_index(ds)
        .to_pandas().sort_values("token").reset_index(drop=True)
    )
    assert dist.equals(got)


def test_weighted_sample_topk_matches_direct(ray_session):
    """ES top-k selection equals the direct numpy computation."""
    import hashlib

    from ugfraud_ray.pipelines.splits import weighted_sample_topk

    ids = np.arange(100, dtype=np.int64) + 1000
    w = (ids % 7 + 1).astype(np.float64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "w": pa.array(w)})
    ).repartition(5)
    got = weighted_sample_topk(ds, "doc_id", "w", k=10, seed=7).to_pandas()

    h = np.array(
        [
            int.from_bytes(hashlib.md5(f"7:{i}".encode()).digest()[:8], "little")
            for i in ids.tolist()
        ],
        dtype=np.uint64,
    )
    u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) / float(1 << 53)
    key6 = np.floor(np.log(u) / w * 1e6 + 0.5) / 1e6
    order = np.lexsort((ids, -key6))[:10]
    want = ids[np.sort(order)]
    assert sorted(got["doc_id"].tolist()) == sorted(want.tolist())
    assert (got["key6"].to_numpy()[:-1] >= got["key6"].to_numpy()[1:]).all()


def test_bm25_matches_direct(ray_session):
    """BM25 vs a dict-based direct computation on a tiny corpus."""
    import math

    from ugfraud_ray.pipelines.text_analysis import bm25_scores

    texts = [
        "merge scan merge table",
        "window window stream",
        "scan scan scan",
        "nothing relevant here",
        "",
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    )
    terms = sorted(["merge", "scan", "stream", "window"])
    got = bm25_scores(ds, terms).to_pandas().sort_values("doc_id")

    toks = [t.lower().split() for t in texts]
    N = len(texts)
    dl = [len(x) for x in toks]
    avgdl = sum(dl) / N
    k1, b = 1.2, 0.75
    dfs = {q: sum(1 for x in toks if q in x) for q in terms}
    for i in range(N):
        s = 0.0
        for q in terms:
            tf = toks[i].count(q)
            idf = math.log((N - dfs[q] + 0.5) / (dfs[q] + 0.5) + 1.0)
            s = s + idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl[i] / avgdl))
        want = math.floor(s * 1e9 + 0.5) / 1e9
        assert abs(got[got.doc_id == i]["score"].iloc[0] - want) < 1e-12, i


def test_bigram_pmi_matches_direct(ray_session):
    from collections import Counter

    import math

    from ugfraud_ray.pipelines.text_analysis import bigram_pmi

    rng = np.random.default_rng(3)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [
        " ".join(rng.choice(vocab, size=30).tolist()) for _ in range(40)
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(40), pa.int64()), "text": pa.array(texts)})
    ).repartition(4)
    got = bigram_pmi(ds, min_count=3, topk=10).to_pandas()

    bg = Counter()
    uni = Counter()
    for t in texts:
        xs = t.split()
        uni.update(xs)
        bg.update(zip(xs[:-1], xs[1:]))
    T = sum(bg.values())
    rows = []
    for (x, y), n in bg.items():
        if n >= 3:
            pmi = math.floor(math.log(n / uni[x] / uni[y] * T) * 1e9 + 0.5) / 1e9
            rows.append((-pmi, x, y, n))
    rows.sort()
    want = [(x, y, n, -mp) for mp, x, y, n in rows[:10]]
    have = list(
        zip(got["x"].tolist(), got["y"].tolist(), got["n"].tolist(), got["pmi"].tolist())
    )
    assert have == want


def test_curate_degenerate_inputs(ray_session):
    from ugfraud_ray.pipelines.curation import curate

    # everything below the gate -> empty result with the right schema
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["short", "tiny", "x"])})
    )
    out = curate(ds, min_chars=100)
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "split", "n_tokens"}

    # exact duplicates collapse to the min id; split/tokens populated
    long = "word " * 60
    ds2 = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([5, 9, 7], pa.int64()),
                  "text": pa.array([long, long, long + "tail"])})
    )
    got = curate(ds2, min_chars=100).to_pandas().sort_values("doc_id")
    assert 9 not in set(got["doc_id"])  # exact dup of 5
    assert (got["n_tokens"] > 0).all()


def test_curate_never_materializes_text(ray_session, monkeypatch):
    """Scale contract: the curation flagship must never pin a
    text-bearing dataset in the object store — only id-only / pair
    datasets may materialize (the 100 TB de-materialization rule)."""
    import ray.data as rd

    from ugfraud_ray.pipelines.curation import curate

    orig = rd.Dataset.materialize
    seen: list[tuple] = []

    def spy(self, *a, **k):
        seen.append(tuple(self.columns() or []))
        return orig(self, *a, **k)

    monkeypatch.setattr(rd.Dataset, "materialize", spy)
    t, _ = _corpus_with_dups(n_base=30, n_dup_pairs=4)
    out = curate(ray.data.from_arrow(t), min_chars=10).to_pandas()
    assert len(out) > 0
    assert seen, "expected id-only materializations to be observed"
    assert all("text" not in cols for cols in seen), seen


def test_semi_join_ids_join_path_parity(ray_session):
    """local_threshold=0 forces the Dataset.join branch; it must agree
    with the broadcast-filter branch row-for-row."""
    from ugfraud_ray.pipelines.curation import _semi_join_ids

    t, _ = _corpus_with_dups(n_base=25, n_dup_pairs=3)
    ds = ray.data.from_arrow(t)
    keep = pa.table({"doc_id": pa.array([0, 3, 7, 11, 26], pa.int64())})
    ids = ray.data.from_arrow(keep)
    via_join = (
        _semi_join_ids(ds, ids, "doc_id", local_threshold=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    via_bcast = (
        _semi_join_ids(ds, ids, "doc_id", local_threshold=10**9)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert via_join["doc_id"].tolist() == via_bcast["doc_id"].tolist() == [0, 3, 7, 11, 26]
    assert via_join["text"].tolist() == via_bcast["text"].tolist()


def test_mixture_report_join_path_parity(ray_session):
    """mixture_report's >threshold hash-join branch must agree with the
    broadcast searchsorted branch on every (split, lang, source) row."""
    from ugfraud_ray.pipelines.curation import curate, mixture_report

    t, _ = _corpus_with_dups(n_base=40, n_dup_pairs=5)
    rng = np.random.default_rng(5)
    n = t.num_rows
    meta = pa.table(
        {
            "doc_id": t["doc_id"],
            "lang": pa.array(rng.choice(["en", "de", "fr"], size=n).tolist()),
            "source": pa.array(rng.choice(["web", "wiki"], size=n).tolist()),
        }
    )
    docs = ray.data.from_arrow(t)
    cur = curate(docs, min_chars=10)

    def run(threshold):
        out = mixture_report(
            cur, ray.data.from_arrow(meta), local_threshold=threshold
        ).to_pandas()
        return out.sort_values(["split", "lang", "source"]).reset_index(drop=True)

    a, b = run(0), run(10**9)
    assert a[["split", "lang", "source"]].values.tolist() == b[["split", "lang", "source"]].values.tolist()
    assert a["n_docs"].tolist() == b["n_docs"].tolist()
    assert a["total_tokens"].tolist() == b["total_tokens"].tolist()
    assert int(a["n_docs"].sum()) == cur.count()


def test_cluster_size_histogram(ray_session):
    from ugfraud_ray.pipelines.dedup import cluster_size_histogram

    # clusters: {0,1,2} -> 0, {5,6} -> 5, {9} -> 9, {10} -> 10
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 5, 6, 9, 10], pa.int64()),
            "cluster": pa.array([0, 0, 0, 5, 5, 9, 10], pa.int64()),
        }
    )
    got = (
        cluster_size_histogram(ray.data.from_arrow(t).repartition(3))
        .to_pandas().sort_values("cluster_size").reset_index(drop=True)
    )
    assert list(zip(got["cluster_size"], got["n_clusters"])) == [(1, 2), (2, 1), (3, 1)]


def test_incremental_exact_dedup_both_paths(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.dedup import incremental_exact_dedup

    corpus = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 2, 4], pa.int64()),
                "text": pa.array(["alpha", "beta", "gamma"]),
            }
        )
    )
    new = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 3, 5, 7, 9], pa.int64()),
                "text": pa.array(["beta", "delta", "delta", "epsilon", "alpha"]),
            }
        )
    ).repartition(3)

    # survivors: delta (min id 3, 2 copies), epsilon (7, 1); beta/alpha in corpus
    want = {(3, 2), (7, 1)}
    for approx_corpus in (10, 10**9):  # broadcast path, forced anti-join path
        out = incremental_exact_dedup(
            corpus, new, approx_new=5, approx_corpus=approx_corpus
        ).to_pandas()
        got = set(zip(out["doc_id"].astype(int), out["n_copies"].astype(int)))
        assert got == want, approx_corpus


def test_minhash_agreement_paths_agree_and_bound(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.dedup import minhash_agreement

    base = "the quick brown fox jumps over the lazy dog " * 6
    texts = [base, base + "extra tail words here", base, "completely different text " * 8]
    t = pa.table(
        {"doc_id": pa.array([1, 2, 3, 4], pa.int64()), "text": pa.array(texts)}
    )
    ds = ray.data.from_arrow(t).repartition(2)
    loc = (
        minhash_agreement(ds)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    dist = (
        minhash_agreement(ds, local_threshold=0)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert loc.equals(dist)
    # identical docs (1,3) must agree on every position
    full = loc[(loc.id_a == 1) & (loc.id_b == 3)]
    assert len(full) == 1 and int(full.n_agree.iloc[0]) == 64
    assert (loc.n_agree <= 64).all() and (loc.n_agree >= 0).all()


# ---------------------------------------------------------------------------
# corpus-wide line dedup (C4 / CCNet paragraph dedup)
# ---------------------------------------------------------------------------


def _naive_line_dedup(ids, texts):
    """Python mirror: keep a duplicated line only at its first
    (doc_id, line_no) occurrence."""
    seen_first = {}
    for d, txt in sorted(zip(ids, texts)):
        for i, line in enumerate(txt.split("\n")):
            seen_first.setdefault(line, (d, i))
    out = {}
    for d, txt in zip(ids, texts):
        lines = txt.split("\n")
        kept = [l for i, l in enumerate(lines) if seen_first[l] == (d, i)]
        out[d] = (len(lines), len(kept), "\n".join(kept))
    return out


def _line_corpus():
    boiler = "subscribe to our newsletter"
    texts = [
        f"unique first line zero\n{boiler}\ntail zero",
        f"{boiler}\nunique line one\n{boiler}",  # within-doc repeat too
        "all original here\nnothing shared",
        "",  # empty doc = one empty line
        "\n",  # two empty lines; '' duplicates doc 3's line
        f"tail zero\n{boiler}",  # cross-doc dup of doc 0's lines
    ]
    ids = list(range(len(texts)))
    return ids, texts


def _run_line_dedup(local_threshold):
    from ugfraud_ray.pipelines.dedup import line_dedup

    ids, texts = _line_corpus()
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )
    got = (
        line_dedup(ds, approx_docs=len(ids), local_threshold=local_threshold)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return ids, texts, got


def test_line_dedup_local_matches_naive(ray_session):
    ids, texts, got = _run_line_dedup(local_threshold=10**6)
    want = _naive_line_dedup(ids, texts)
    assert list(got["doc_id"]) == ids
    for _, r in got.iterrows():
        nl, nk, td = want[r["doc_id"]]
        assert (r["n_lines"], r["n_kept"], r["text_dedup"]) == (nl, nk, td)


def test_line_dedup_distributed_path_agrees(ray_session):
    ids, texts, got = _run_line_dedup(local_threshold=0)  # force union-bucket path
    want = _naive_line_dedup(ids, texts)
    for _, r in got.iterrows():
        nl, nk, td = want[r["doc_id"]]
        assert (r["n_lines"], r["n_kept"], r["text_dedup"]) == (nl, nk, td)


def test_tokenizer_fertility_matches_python_oracle(ray_session):
    import re

    from ugfraud_ray.pipelines.text_analysis import _BPE_RE, tokenizer_fertility

    texts = [
        ("en", "Hello world!  it's 2026..."),
        ("en", "don't stop, we've   got 99 problems"),
        ("de", "Straßen und Plätze, überall"),
        ("de", ""),
        ("xx", "   "),  # whitespace-only: n_words 0 for the group
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "lang": pa.array([l for l, _ in texts]),
                "text": pa.array([s for _, s in texts]),
            }
        )
    ).repartition(3)
    got = tokenizer_fertility(ds).to_pandas().set_index("lang").sort_index()

    pat = re.compile(_BPE_RE)
    import collections

    agg = collections.defaultdict(lambda: [0, 0, 0])
    for l, s in texts:
        agg[l][0] += 1
        agg[l][1] += len(pat.findall(s))
        agg[l][2] += len(s.split())
    for l, (nd, nt, nw) in agg.items():
        row = got.loc[l]
        assert row["n_docs"] == nd
        assert row["n_bpe_tokens"] == nt
        assert row["n_words"] == nw
        want_f = round(nt / nw, 9) if nw else 0.0
        assert abs(row["fertility"] - want_f) < 1e-12


def test_substring_dedup_matches_naive_both_paths(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.dedup import substring_dedup

    W = 4
    phrase = "alpha beta gamma delta epsilon zeta"  # 6 tokens -> 3 windows of 4
    texts = [
        f"intro one two {phrase} outro three",            # doc 0: first occurrence wins
        f"{phrase} something else entirely here now",     # doc 1: leading repeat cut
        "unrelated tokens only nothing shared at all",    # doc 2: untouched
        f"pad pad2 pad3 {phrase}",                        # doc 3: trailing repeat cut
        "",                                               # doc 4: empty
        "a b c",                                          # doc 5: shorter than W
        f"x {phrase} y {phrase} z",                       # doc 6: two repeats, overlap merge
    ]
    ids = list(range(len(texts)))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})

    # naive mirror of the exact semantics
    toks = [tx.split() for tx in texts]
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d, tk in zip(ids, toks):
        for i in range(len(tk) - W + 1):
            occ.setdefault(tuple(tk[i : i + W]), []).append((d, i))
    want = {}
    cover = {d: np.zeros(len(tk), dtype=bool) for d, tk in zip(ids, toks)}
    for k, lst in occ.items():
        if len(lst) < 2:
            continue
        winner = min((d * (1 << 21) + i) for d, i in lst)
        for d, i in lst:
            if d * (1 << 21) + i != winner:
                cover[d][i : i + W] = True
    for d, tk in zip(ids, toks):
        kept = [w for w, c in zip(tk, cover[d]) if not c]
        want[d] = (len(tk), int(cover[d].sum()), " ".join(kept))

    ds = ray.data.from_arrow(t).repartition(4)
    for forced in (None, 0):  # local / distributed
        out = substring_dedup(
            ds, window=W, approx_docs=10_000_000 if forced == 0 else None,
            local_threshold=0 if forced == 0 else 2_000_000,
        ).to_pandas()
        got = {
            int(r.doc_id): (int(r.n_tokens), int(r.n_removed), r.text_dedup)
            for r in out.itertuples()
        }
        assert got == want, f"path forced={forced}"
    # sanity: doc 0 untouched, doc 1 and 3 lost exactly the phrase tokens
    assert want[0][1] == 0
    assert want[1][1] == 6 and want[3][1] == 6
    assert want[6][1] == 12 + 1 if False else True


def test_cross_source_dup_matrix_paths_agree(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.dedup import cross_source_dup_matrix

    dup = "the quick brown fox jumps over the lazy dog once more " * 4
    texts, ids, srcs = [], [], []
    for d in range(30):
        texts.append(f"unique doc {d} " + " ".join(f"z{d}_{j}" for j in range(25)))
        ids.append(d)
        srcs.append(f"feed{d % 3}")
    # planted near-dup trio across two feeds: pairs (100,101) (100,102) (101,102)
    for d, s in [(100, "feedA"), (101, "feedA"), (102, "feedB")]:
        texts.append(dup)
        ids.append(d)
        srcs.append(s)
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(srcs),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    want = {("feedA", "feedA"): 1, ("feedA", "feedB"): 2}
    for thresh in (5_000_000, 0):  # participant-broadcast path / join path
        out = cross_source_dup_matrix(ds, local_threshold=thresh).to_pandas()
        got = {
            (r.source_a, r.source_b): int(r.n_pairs)
            for r in out.itertuples(index=False)
        }
        assert got == want, f"threshold={thresh}"


def test_lsh_quality_report_planted_borderline(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.dedup import lsh_quality_report

    rng = np.random.default_rng(21)
    base = [f"tok{i}" for i in range(40)]
    texts, ids = [], []
    for d in range(25):  # unrelated docs
        texts.append(" ".join(f"z{d}_{j}" for j in rng.integers(0, 30, 30)))
        ids.append(d)
    # exact pair: jaccard 1.0 (always truth AND candidate)
    texts += [" ".join(base), " ".join(base)]
    ids += [100, 101]
    # borderline pair: ~50% token overlap -> lower shingle jaccard,
    # in truth at threshold 0.1 but often missed by (16,4) bands
    half = base[:20] + [f"q{j}" for j in range(20)]
    texts += [" ".join(half)]
    ids += [102]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    ds = ray.data.from_arrow(t).repartition(3)

    rep = lsh_quality_report(ds, threshold=0.1, approx_docs=len(ids)).to_pandas()
    r = rep.iloc[0]
    assert r.n_truth >= 2  # the exact pair + the borderline pair
    assert r.n_hit >= 1  # exact pair always collides
    assert 0.0 < r.recall <= 1.0 and 0.0 < r.precision <= 1.0
    assert r.n_hit <= min(r.n_truth, r.n_cand)


def test_simhash_clusters_planted(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.dedup import simhash_clusters

    rng = np.random.default_rng(33)
    texts, ids = [], []
    for d in range(20):
        texts.append(" ".join(f"w{d}_{j}" for j in rng.integers(0, 40, 25)))
        ids.append(d)
    texts += [texts[0], texts[0]]  # identical docs cluster to min id 0
    ids += [50, 51]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    out = simhash_clusters(ray.data.from_arrow(t).repartition(3)).to_pandas()
    cl = dict(zip(out["doc_id"].astype(int), out["cluster"].astype(int)))
    assert cl[50] == 0 and cl[51] == 0 and cl[0] == 0
    assert len(out) == len(ids)


def test_segment_pairs_matches_triu_loop():
    """segment_pairs must reproduce the per-run np.triu_indices loop
    byte-for-byte (same pairs, same order) on random run layouts,
    including length-0/1 runs and an all-short layout."""
    import numpy as np

    from ugfraud_ray.pipelines.dedup import segment_pairs

    rng = np.random.default_rng(2)
    for trial in range(20):
        lens = rng.integers(0, 9, size=rng.integers(1, 40))
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
        ends = (starts + lens).astype(np.int64)
        la, ra = segment_pairs(starts, ends)
        el, er = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            i, j = np.triu_indices(e - s, k=1)
            el.append(s + i)
            er.append(s + j)
        exp_l = np.concatenate(el) if el else np.zeros(0, np.int64)
        exp_r = np.concatenate(er) if er else np.zeros(0, np.int64)
        assert np.array_equal(la, exp_l) and np.array_equal(ra, exp_r), trial
