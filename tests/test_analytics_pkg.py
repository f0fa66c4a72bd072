"""Unit tests for the analytics moved from the driver contract into the
package (VERDICT r2 item 3): zipf_slope, length_histogram,
top_anomalies, temporal_degree_snapshots, coreview_pairs — each against
a naive numpy/pandas oracle, imported from ugfraud_ray."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _doc_table(seed=3, n=40):
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    # Zipf-ish frequencies: word i with weight 1/(i+1)
    p = 1.0 / np.arange(1, len(words) + 1)
    p /= p.sum()
    texts = [
        " ".join(rng.choice(words, size=rng.integers(5, 40), p=p))
        for _ in range(n - 1)
    ] + [""]
    return pa.table(
        {"doc_id": pa.array(np.arange(n, dtype=np.int64)), "text": pa.array(texts)}
    )


def test_zipf_slope_matches_numpy_ols(ray_session):
    from ugfraud_ray.pipelines.text_analysis import zipf_slope

    t = _doc_table()
    out = zipf_slope(ray.data.from_arrow(t), k=5)
    assert out["k"][0].as_py() == 5
    # naive oracle: counts of the top-5 tokens, plain OLS
    from collections import Counter

    c = Counter()
    for txt in t["text"].to_pylist():
        c.update(txt.lower().split())
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    y = np.log([n for _, n in top])
    x = np.log(np.arange(1, 6, dtype=np.float64))
    slope = np.polyfit(x, y, 1)[0]
    assert abs(out["slope"][0].as_py() - slope) < 1e-6


def test_length_histogram_matches_bincount(ray_session):
    from ugfraud_ray.pipelines.text_analysis import length_histogram

    t = _doc_table()
    got = (
        length_histogram(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    want: dict[int, int] = {}
    for txt in t["text"].to_pylist():
        n = len(txt.lower().split())
        want[n.bit_length()] = want.get(n.bit_length(), 0) + 1
    assert dict(zip(got["bucket"], got["n_docs"])) == want
    assert int(got["n_docs"].sum()) == t.num_rows


def test_top_anomalies_equals_global_sort(ray_session):
    from ugfraud_ray.pipelines.events import top_anomalies

    rng = np.random.default_rng(11)
    n = 500
    z = np.round(rng.normal(0, 3, n), 9)
    z[7] = z[13] = 50.0  # tie on |z| -> id ascending breaks it
    z[21] = -50.0
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "event_type": pa.array(["t"] * n),
            "robust_z": pa.array(z),
        }
    )
    # many small blocks so the per-block partial path is exercised
    ds = ray.data.from_arrow(t).repartition(16)
    got = top_anomalies(ds, k=20)
    order = np.lexsort((np.arange(n), -np.abs(z)))[:20]
    assert got["event_id"].to_pylist() == order.tolist()
    assert got["abs_z"].to_pylist() == np.abs(z)[order].tolist()
    assert {7, 13, 21} <= set(got["event_id"].to_pylist())


def test_temporal_degree_snapshots(ray_session):
    from ugfraud_ray.pipelines.graphstats import temporal_degree_snapshots

    # month 600 = 2020-01; user 3 has degree 3, user 1 degree 3 (tie ->
    # smaller id wins); month 601 has a single edge
    months = [600] * 6 + [601]
    srcs = [3, 3, 3, 1, 1, 1, 9]
    ds = ray.data.from_arrow(
        pa.table(
            {"month": pa.array(months, pa.int64()), "src": pa.array(srcs, pa.int64())}
        )
    )
    got = (
        temporal_degree_snapshots(ds)
        .to_pandas()
        .sort_values("month")
        .reset_index(drop=True)
    )
    assert got["month"].tolist() == ["2020-01", "2020-02"]
    assert got["n_edges"].tolist() == [6, 1]
    assert got["n_users"].tolist() == [2, 1]
    assert got["top_user"].tolist() == [1, 9]  # tie at degree 3 -> min id
    assert got["top_degree"].tolist() == [3, 1]


def test_coreview_pairs_planted_and_domain_guard(ray_session):
    from ugfraud_ray.pipelines.linkpred import coreview_pairs

    off = 100
    # users 0,1 co-review products 100,101,102; user 2 reviews 100 only
    src = [0, 0, 0, 1, 1, 1, 2]
    dst = [100, 101, 102, 100, 101, 102, 100]
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    got = coreview_pairs(ds, off, top_n=10)
    rows = list(
        zip(got["u"].to_pylist(), got["v"].to_pylist(), got["common_prods"].to_pylist())
    )
    assert rows[0] == (0, 1, 3)
    assert (0, 2, 1) in rows and (1, 2, 1) in rows
    aa = dict(zip(rows, got["aa"].to_pylist()))
    # product 100 has degree 3, 101/102 degree 2
    want_01 = round(1 / np.log(3) + 2 / np.log(2), 9)
    assert abs(aa[(0, 1, 3)] - want_01) < 1e-9

    bad = ray.data.from_arrow(
        pa.table({"src": pa.array([150], pa.int64()), "dst": pa.array([100], pa.int64())})
    )
    import pytest

    with pytest.raises(ValueError, match="overlaps the product vid"):
        coreview_pairs(bad, off)


def test_rarity_scores_local_distributed_and_mirror(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.text_analysis import rarity_scores

    texts = [
        "the cat sat on the mat",
        "the dog sat",
        "  ",  # zero-token doc: emits nothing
        "unique singleton tokens here",
        "the the the cat",
    ]
    t = pa.table({"doc_id": pa.array(range(10, 15), pa.int64()), "text": pa.array(texts)})
    ds = ray.data.from_arrow(t).repartition(3)
    local = rarity_scores(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    dist = (
        rarity_scores(ds, local_vocab_threshold=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert local.equals(dist)

    # naive mirror
    toks = [tx.lower().split() for tx in texts]
    df = {}
    for tk in toks:
        for w in set(tk):
            df[w] = df.get(w, 0) + 1
    want = {
        i + 10: (len(tk), sum(10**9 // df[w] for w in tk))
        for i, tk in enumerate(toks)
        if tk
    }
    got = {r.doc_id: (r.n_tokens, r.rarity) for r in local.itertuples(index=False)}
    assert got == want


def test_trigram_counts_paths_and_mirror(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.text_analysis import trigram_counts

    texts = [
        "a b c a b c",        # (a,b,c)x2 (b,c,a) (c,a,b)
        "  a b c  ",          # (a,b,c) -> total 3
        "x y",                # too short
        "a b c d",            # (a,b,c) -> total 4; (b,c,d)
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": pa.array(texts)})
    ds = ray.data.from_arrow(t).repartition(3)
    key = ["w1", "w2", "w3"]
    loc = trigram_counts(ds).to_pandas().sort_values(key).reset_index(drop=True)
    dist = (
        trigram_counts(ds, local_threshold=0)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert loc.equals(dist)
    got = {(r.w1, r.w2, r.w3): r.n for r in loc.itertuples(index=False)}
    assert got == {("a", "b", "c"): 4}


def test_source_coverage_lorenz(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.curation import source_coverage

    texts = (
        ["a b c d e"] * 4       # src0: 20 tokens
        + ["w x"] * 3           # src1: 6 tokens
        + ["solo"]              # src2: 1 token
        + [""]                  # src3: 0 tokens (empty doc)
        + ["t1 t2 t3"] * 2      # src4: 6 tokens (ties src1; name order)
    )
    srcs = ["s0"] * 4 + ["s1"] * 3 + ["s2"] + ["s3"] + ["s11"] * 2
    ds = ray.data.from_arrow(
        pa.table({"source": pa.array(srcs), "text": pa.array(texts)})
    ).repartition(3)
    out = source_coverage(ds).to_pandas().sort_values("rnk")
    assert list(out["source"]) == ["s0", "s1", "s11", "s2", "s3"]
    assert list(out["n_tokens"]) == [20, 6, 6, 1, 0]
    assert list(out["cum_tokens"]) == [20, 26, 32, 33, 33]
    assert list(out["rnk"]) == [1, 2, 3, 4, 5]


def test_powerlaw_alpha_matches_numpy(ray_session):
    """Hill estimator vs a direct numpy mirror on a planted graph."""
    from ugfraud_ray.pipelines.graphstats import powerlaw_alpha

    rng = np.random.default_rng(7)
    # heavy-tailed degrees: a few hubs, many leaves
    src = rng.zipf(1.8, size=4000) % 97
    dst = (rng.zipf(1.8, size=4000) % 89) + 100
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src.astype(np.int64)), "dst": pa.array(dst.astype(np.int64))})
    ).repartition(5)
    got = powerlaw_alpha(ds, dmin=3).to_pandas()

    deg = np.bincount(np.concatenate([src, dst + 0]).astype(np.int64))
    deg = deg[deg > 0]
    tail = deg[deg >= 3]
    alpha = 1.0 + len(tail) / np.sum(np.log(tail / 3.0))
    assert int(got["n_tail"].iloc[0]) == len(tail)
    assert abs(float(got["alpha"].iloc[0]) - round(alpha, 9)) < 1e-9
    assert int(got["dmin"].iloc[0]) == 3


def test_edge_churn_local_and_bucketed_match_naive(ray_session):
    from ugfraud_ray.pipelines.graphstats import edge_churn

    rng = np.random.default_rng(13)
    n = 3000
    months = rng.integers(0, 7, size=n)      # 7 snapshots, some edges repeat
    src = rng.integers(0, 40, size=n)
    dst = rng.integers(100, 160, size=n)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "month": pa.array(months.astype(np.int64)),
                "src": pa.array(src.astype(np.int64)),
                "dst": pa.array(dst.astype(np.int64)),
            }
        )
    ).repartition(4)

    def naive():
        per_m = {m: set() for m in range(7)}
        for m, s, d in zip(months, src, dst):
            per_m[m].add((s, d))
        out = []
        ms = sorted(per_m)
        for prev, cur in zip(ms, ms[1:]):
            a, b = per_m[prev], per_m[cur]
            out.append((cur, len(b - a), len(a - b), len(a & b)))
        return out

    want = naive()
    for thresh in (10**6, 0):  # driver-local and forced bucketed paths
        got = edge_churn(ds, local_threshold=thresh).to_pandas()
        rows = list(zip(got["month"], got["n_added"], got["n_removed"], got["n_common"]))
        assert rows == want, f"threshold={thresh}"


def test_gopher_rules_hand_cases(ray_session):
    from ugfraud_ray.pipelines.text_analysis import gopher_rules

    good = "the words flow and have that calm shape with " + " ".join(
        f"word{i}" for i in range(60)
    )
    texts = [
        good,                                   # passes everything
        "short text",                           # fails word count + stopwords
        good + "\nfirst…\nsecond...\nthird...", # >30% ellipsis lines? 3 of 4 lines
        good + " " + "#" * 40,                  # hash symbols vs words
        "- a\n- b\n- c",                        # all bullet lines
        ("xx " * 60) + "the be",                # mean word len ok, alpha ok, stop=2
    ]
    ids = list(range(len(texts)))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )
    got = gopher_rules(ds, min_words=10).to_pandas().sort_values("doc_id")
    g = {r.doc_id: r for r in got.itertuples()}
    assert g[0].keep == 1
    assert g[1].r_word_count == 0 and g[1].r_stop == 0 and g[1].keep == 0
    assert g[2].r_ellipsis == 0 and g[2].keep == 0
    assert g[3].r_hash == 0 and g[3].keep == 0
    assert g[4].r_bullet == 0 and g[4].keep == 0
    assert g[5].r_stop == 1 and g[5].r_alpha == 1


def test_bowtie_matches_networkx(ray_session, tmp_path):
    import networkx as nx

    from ugfraud_ray.pipelines.scc import bowtie_decomposition

    rng = np.random.default_rng(5)
    n = 120
    # planted core cycle 0..19, plus random sparse edges
    core = [(i, (i + 1) % 20) for i in range(20)]
    rand = list(zip(rng.integers(0, n, 300), rng.integers(0, n, 300)))
    edges = [(int(a), int(b)) for a, b in core + rand if a != b]
    g = nx.DiGraph(edges)
    g.add_nodes_from(range(n))
    sccs = list(nx.strongly_connected_components(g))
    core_set = max(sccs, key=lambda s: (len(s), -min(s)))
    out_set = set()
    in_set = set()
    for c in core_set:
        out_set |= nx.descendants(g, c)
        in_set |= nx.ancestors(g, c)
    want = {}
    for v in range(n):
        if v in core_set:
            want[v] = "core"
        elif v in out_set:
            want[v] = "out"
        elif v in in_set:
            want[v] = "in"
        else:
            want[v] = "other"

    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    ).repartition(3)
    got = bowtie_decomposition(ds, n, str(tmp_path / "bt"), P=2).to_pandas()
    gmap = dict(zip(got["vid"], got["cls"]))
    assert gmap == want


def test_spam_mass_matches_numpy(ray_session, tmp_path):
    """Planted link-spam ring gets high spam mass; trusted seed low."""
    from ugfraud_ray.pipelines.pagerank import pagerank, personalized_pagerank, spam_mass

    # trusted cluster 0-4 interlinked; spam ring 10-14 linking to 15
    edges = [(i, j) for i in range(5) for j in range(5) if i != j]
    edges += [(i, 15) for i in range(10, 15)] + [(15, i) for i in range(10, 15)]
    edges += [(0, 10)]  # weak path from trusted side
    n = 16
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    pr, _ = pagerank(ds, n, str(tmp_path / "pr"), P=2, max_iters=8, tol=None)
    tr, _ = personalized_pagerank(
        ds, n, np.array([0, 1, 2, 3, 4]), str(tmp_path / "tr"), P=2, max_iters=8, tol=None
    )
    out = spam_mass(pr, tr, n).to_pandas().sort_values("vid").reset_index(drop=True)
    assert len(out) == n
    prv = np.round(pr.to_pandas().sort_values("vid")["rank"].to_numpy(), 9)
    trv = np.round(tr.to_pandas().sort_values("vid")["rank"].to_numpy(), 9)
    want = np.round((prv - trv) / prv, 9)
    assert np.allclose(out["spam_mass"].to_numpy(), want, atol=1e-12)
    # the spam hub keeps far more untrusted mass than the trusted seed
    assert out.loc[15, "spam_mass"] > out.loc[0, "spam_mass"]


def test_source_dup_rate_planted(ray_session):
    from ugfraud_ray.pipelines.dedup import source_dup_rate

    texts = ["aaa", "bbb", "aaa", "ccc", "aaa", "bbb"]
    srcs = ["s1", "s1", "s2", "s2", "s1", "s2"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": pa.array(texts),
                "source": pa.array(srcs),
            }
        )
    ).repartition(3)
    got = source_dup_rate(ds, approx_docs=6).to_pandas().set_index("source")
    # keepers: doc0 (aaa), doc1 (bbb), doc3 (ccc)
    # s1 docs {0,1,4}: dup = 4          -> 1 dup of 3
    # s2 docs {2,3,5}: dups = 2, 5      -> 2 dups of 3
    assert got.loc["s1", "n_docs"] == 3 and got.loc["s1", "n_dups"] == 1
    assert got.loc["s2", "n_docs"] == 3 and got.loc["s2", "n_dups"] == 2


def test_vocab_growth_naive(ray_session):
    from ugfraud_ray.pipelines.text_analysis import vocab_growth

    texts = ["a b c", "a b d", "e", "", "a f g h"]
    ids = [10, 20, 30, 40, 50]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    ).repartition(2)
    got = vocab_growth(ds, n_checkpoints=5).to_pandas()
    # thresholds: 10,20,30,40,50
    toks = {i: t.split() for i, t in zip(ids, texts)}
    for k, th in enumerate([10, 20, 30, 40, 50], start=1):
        n_tok = sum(len(v) for i, v in toks.items() if i <= th)
        vocab = set().union(*[set(v) for i, v in toks.items() if i <= th])
        row = got[got["k"] == k].iloc[0]
        assert row["threshold_doc"] == th
        assert row["n_tokens"] == n_tok
        assert row["n_distinct"] == len(vocab)


def test_powerlaw_alpha_degenerate_tail_fails_loudly(ray_session):
    import pytest as _pytest

    from ugfraud_ray.pipelines.graphstats import powerlaw_alpha

    # directed cycle: every vertex has total degree exactly 2 == dmin
    n = 12
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(np.arange(n, dtype=np.int64)),
                "dst": pa.array((np.arange(n, dtype=np.int64) + 1) % n),
            }
        )
    )
    with _pytest.raises(ValueError, match="degenerate degree tail"):
        powerlaw_alpha(ds, dmin=2)


def test_ngram_novelty_matches_naive_both_paths(ray_session):
    from ugfraud_ray.pipelines.text_analysis import ngram_novelty

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts, ids = [], []
    for d in range(60):
        n = int(rng.integers(0, 14))
        texts.append(" ".join(vocab[int(i)] for i in rng.integers(0, 30, n)))
        ids.append(d)
    # docs 60/61: a fixed long doc and its verbatim repeat (zero novelty)
    texts.append("w0 w1 w2 w3 w4 w5 w6")
    ids.append(60)
    texts.append(texts[60])
    ids.append(61)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})

    # naive mirror
    first: dict[tuple, int] = {}
    per_doc: dict[int, set] = {}
    for d, txt in zip(ids, texts):
        toks = [w for w in txt.lower().split() if w]
        tris = {tuple(toks[i : i + 3]) for i in range(len(toks) - 2)}
        if not tris:
            continue
        per_doc[d] = tris
        for tri in tris:
            first.setdefault(tri, d)  # ids ascend, so first write is min
    want = {}
    for d, tris in per_doc.items():
        nov = sum(1 for tri in tris if first[tri] == d)
        want[d] = (len(tris), nov, np.floor(nov / len(tris) * 1e9 + 0.5) / 1e9)

    ds = ray.data.from_arrow(t).repartition(1)  # docs whole per row; 1 rp keeps order irrelevant anyway
    for forced in (None, 0):  # local path / forced bucketed path
        out = ngram_novelty(
            ds, approx_docs=forced if forced is None else 10_000_000
        ).to_pandas()
        got = {
            int(r.doc_id): (int(r.n_tri_distinct), int(r.n_novel), float(r.novelty))
            for r in out.itertuples()
        }
        assert got == want
    assert want[61][1] == 0  # the verbatim repeat is zero-novel


def test_char_entropy_matches_naive_incl_unicode(ray_session):
    from collections import Counter

    from ugfraud_ray.pipelines.text_analysis import char_entropy

    texts = [
        "aaaa",                      # single distinct char -> 0.0
        "abab cdcd",                 # mixed ascii
        "héllo wörld héé",           # multi-byte utf-8
        "",                          # empty -> no row
        "x",                         # one char
        "the quick brown fox jumps", # natural-ish
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    out = char_entropy(ray.data.from_arrow(t).repartition(3)).to_pandas()
    got = {
        int(r.doc_id): (int(r.n_chars), int(r.n_distinct), float(r.h_nats))
        for r in out.itertuples()
    }
    want = {}
    for d, s in enumerate(texts):
        if not s:
            continue
        cnt = Counter(s)
        n = len(s)
        terms = sorted(cnt.items())  # codepoint order
        h = -sum((c / n) * np.log(c / n) for _, c in terms)
        hq = 0.0 if len(cnt) == 1 else float(np.floor(h * 1e9 + 0.5) / 1e9)
        want[d] = (n, len(cnt), hq)
    assert got.keys() == want.keys()
    for d in want:
        assert got[d][:2] == want[d][:2], (d, got[d], want[d])
        assert abs(got[d][2] - want[d][2]) < 2e-9, (d, got[d], want[d])
    assert got[0][2] == 0.0


def test_feature_correlation_matches_numpy(ray_session):
    from ugfraud_ray.pipelines.text_analysis import feature_correlation

    rng = np.random.default_rng(23)
    texts = [
        " ".join(f"w{i}" for i in rng.integers(0, 50, rng.integers(2, 40)))
        + ("!" * int(rng.integers(0, 5)))
        + ("7" * int(rng.integers(0, 3)))
        for _ in range(200)
    ]
    t = pa.table({"doc_id": pa.array(range(200), pa.int64()), "text": pa.array(texts)})
    out = feature_correlation(ray.data.from_arrow(t).repartition(4)).to_pandas()
    feats = {
        "n_chars": np.array([len(s) for s in texts], dtype=np.float64),
        "n_digits": np.array([sum(c.isdigit() for c in s) for s in texts], dtype=np.float64),
        "n_spaces": np.array([sum(c == " " for c in s) for s in texts], dtype=np.float64),
        "n_punct": np.array([sum(c in "!" for c in s) for s in texts], dtype=np.float64),
    }
    for row in out.itertuples(index=False):
        want = np.corrcoef(feats[row.feat_a], feats[row.feat_b])[0, 1]
        assert abs(row.r - want) < 1e-9, (row.feat_a, row.feat_b, row.r, want)
    # chars and spaces strongly correlate in whitespace-token text
    rmap = {(r.feat_a, r.feat_b): r.r for r in out.itertuples(index=False)}
    assert rmap[("n_chars", "n_spaces")] > 0.9


def test_edge_hygiene_counts(ray_session):
    from ugfraud_ray.pipelines.graphstats import edge_hygiene

    t = pa.table(
        {
            "src": pa.array([1, 1, 2, 3, 3, 4, 4], pa.int64()),
            "dst": pa.array([2, 2, 1, 3, 4, 3, 5], pa.int64()),
        }
    )
    out = edge_hygiene(ray.data.from_arrow(t).repartition(3)).to_pandas().iloc[0]
    # raw 7; self-loop (3,3); duplicates (1,2)x2; reciprocal (1,2)/(2,1) and (3,4)/(4,3)
    assert out.n_raw == 7 and out.n_self_loops == 1
    assert out.n_directed_distinct == 5  # (1,2),(2,1),(3,4),(4,3),(4,5)
    assert out.n_undirected_distinct == 3  # {1,2},{3,4},{4,5}
    assert out.n_reciprocal_pairs == 2
