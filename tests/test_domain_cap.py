"""Per-source quality cap (curation.domain_cap) vs a pandas window
mirror, on both the driver-local and the forced bucket-shuffle path."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ugfraud_ray.pipelines.curation import _quality_selkey, domain_cap


def _naive(df: pd.DataFrame, k: int) -> pd.DataFrame:
    q = _quality_selkey(pa.table({"text": pa.array(df["text"])}))
    d = df.assign(qsel=q).sort_values(["source", "qsel", "doc_id"],
                                      ascending=[True, False, True])
    d["rnk"] = d.groupby("source").cumcount() + 1
    d = d[d["rnk"] <= k]
    return pd.DataFrame(
        {
            "doc_id": d["doc_id"].to_numpy(),
            "source": d["source"].to_numpy(),
            "quality": d["qsel"].to_numpy() / 1_000_000.0,
            "rnk": d["rnk"].to_numpy().astype(np.int64),
        }
    ).sort_values(["source", "rnk"]).reset_index(drop=True)


def _mkdocs(n=120, seed=5):
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(
            "".join(rng.choice(list("abcde.,!? ")) for _ in range(rng.integers(1, 9)))
            for _ in range(rng.integers(1, 40))
        )
        for _ in range(n)
    ]
    if n > 12:
        # duplicated texts force qsel ties -> the doc_id tiebreak matters
        texts[10] = texts[11] = texts[12]
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64) * 3 + 1,
            "source": [f"d{i % 7}.example" for i in range(n)],
            "text": texts,
        }
    )


def _run(df, k, **kw):
    ds = ray.data.from_pandas(df).repartition(6)
    out = domain_cap(ds, k=k, **kw).to_pandas()
    return out.sort_values(["source", "rnk"]).reset_index(drop=True)


def test_domain_cap_local_matches_window_mirror(ray_session):
    df = _mkdocs()
    got = _run(df, k=4)
    pd.testing.assert_frame_equal(got, _naive(df, 4))
    assert got.groupby("source").size().max() <= 4


def test_domain_cap_forced_bucket_path_parity(ray_session):
    df = _mkdocs(n=150, seed=9)
    got = _run(df, k=3, local_threshold=0)
    pd.testing.assert_frame_equal(got, _naive(df, 3))


def test_domain_cap_small_sources_keep_everything(ray_session):
    df = _mkdocs(n=10, seed=2)  # 7 sources, each has <= 2 docs < k
    got = _run(df, k=5)
    assert len(got) == 10 and (got["rnk"] <= 2).all()


def test_quality_percentile_matches_naive_rank(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ugfraud_ray.pipelines.curation import _quality_selkey, quality_percentile

    texts = [
        "a good clean sentence with words.",
        "x",
        "!!!! ???? ;;;;",
        "normal text goes here, twice. normal text goes here.",
        "",
        "    spaced     out     tokens    ",
        "word " * 200,
    ]
    ids = np.arange(len(texts), dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t).repartition(3)

    got = quality_percentile(ds, n_buckets=4).to_pandas().sort_values("doc_id")

    q = _quality_selkey(t)
    order = np.lexsort((ids, q))
    pos = np.empty(len(ids), dtype=np.int64)
    pos[order] = np.arange(len(ids))
    want = np.round(pos / (len(ids) - 1), 9)
    np.testing.assert_allclose(got["pct_rank"].to_numpy(), want, atol=0)
    assert got["qsel"].tolist() == q.tolist()


def test_quality_percentile_singleton_is_zero(ray_session):
    import pyarrow as pa
    import ray.data

    from ugfraud_ray.pipelines.curation import quality_percentile

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([7]), "text": pa.array(["only doc"])})
    )
    got = quality_percentile(ds).to_pandas()
    assert got["pct_rank"].tolist() == [0.0]


def test_split_leakage_planted_identical_docs(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.curation import split_leakage
    from ugfraud_ray.pipelines.sketches import _md5_low64

    dup = "the quick brown fox jumps over the lazy dog again and again " * 5
    texts, ids = [], []
    for d in range(40):  # unique fillers -> no candidate pairs
        texts.append(f"filler doc {d} " + " ".join(f"tok{d}_{j}" for j in range(30)))
        ids.append(d)
    clones = [100, 101, 102]
    for d in clones:  # planted identical trio -> 3 candidate pairs
        texts.append(dup)
        ids.append(d)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})

    out = split_leakage(ray.data.from_arrow(t).repartition(4)).to_pandas()
    got = {
        (r.split_a, r.split_b): int(r.n_pairs)
        for r in out.itertuples(index=False)
    }

    def split_of(i: int) -> str:
        b = int(_md5_low64([str(i)])[0] % np.uint64(1000))
        return "test" if b < 100 else ("valid" if b < 200 else "train")

    want: dict[tuple, int] = {}
    for i in range(3):
        for j in range(i + 1, 3):
            k = tuple(sorted((split_of(clones[i]), split_of(clones[j]))))
            want[k] = want.get(k, 0) + 1
    assert got == want
    assert sum(got.values()) == 3


def test_doc_cube_levels_consistent(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.curation import doc_cube

    t = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array(
                ["a b c", "d e", "", "x  y", "one two three four", "z"]
            ),
            "lang": pa.array(["en", "en", "fr", "fr", "en", "de"]),
            "source": pa.array(["s1", "s2", "s1", "s1", "s1", "s2"]),
        }
    )
    out = doc_cube(ray.data.from_arrow(t).repartition(3)).to_pandas()
    cell = out.set_index(["lang", "source"])
    # base cells
    assert cell.loc[("en", "s1"), "n_docs"] == 2
    assert cell.loc[("en", "s1"), "n_tokens"] == 3 + 4
    assert cell.loc[("fr", "s1"), "n_tokens"] == 0 + 2  # empty doc + "x  y"
    # marginals are exact re-sums
    assert cell.loc[("ALL", "ALL"), "n_docs"] == 6
    assert cell.loc[("ALL", "ALL"), "n_tokens"] == 3 + 2 + 0 + 2 + 4 + 1
    assert cell.loc[("en", "ALL"), "n_docs"] == 3
    assert cell.loc[("ALL", "s2"), "n_tokens"] == 2 + 1
    # every level present: base(4 distinct pairs) + langs(3) + sources(2) + 1
    assert len(out) == 4 + 3 + 2 + 1


def test_mixture_drift_naive(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.curation import mixture_drift

    ids = list(range(100))
    srcs = ["s1" if i % 2 == 0 else ("s2" if i < 60 else "s3") for i in ids]
    t = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "source": pa.array(srcs)}
    )
    out = mixture_drift(ray.data.from_arrow(t).repartition(4)).to_pandas()
    r = out.set_index("source")
    # even half: all s1 (50 docs). odd half: s2 (30) + s3 (20).
    assert r.loc["s1", "n_a"] == 50 and r.loc["s1", "n_b"] == 0
    assert r.loc["s2", "n_b"] == 30 and r.loc["s3", "n_b"] == 20
    assert r.loc["s1", "share_a"] == 1.0 and r.loc["s1", "abs_delta"] == 1.0
    tv = 0.5 * out["abs_delta"].sum()
    assert abs(tv - 1.0) < 1e-9  # disjoint supports -> max drift
