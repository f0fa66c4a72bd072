"""Deterministic splits: coverage, determinism, take_split == label filter."""

import numpy as np
import pyarrow as pa
import ray.data

from ugfraud_ray.pipelines.splits import assign_splits, take_split


def _ds(n=500):
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "payload": pa.array([f"p{i}" for i in range(n)])})
    )


def test_assign_splits_partition_and_determinism(ray_session):
    ds = _ds()
    a = assign_splits(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = assign_splits(ds.repartition(7)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (a["split"] == b["split"]).all() and (a["bucket"] == b["bucket"]).all()
    # every row labeled; three splits present; roughly 10/10/80
    assert set(a["split"]) == {"train", "valid", "test"}
    frac_test = (a["split"] == "test").mean()
    assert 0.04 < frac_test < 0.2
    assert ((a["bucket"] >= 0) & (a["bucket"] < 1000)).all()


def test_take_split_matches_labels_and_keeps_columns(ray_session):
    ds = _ds()
    labels = assign_splits(ds).to_pandas()
    want = set(labels.loc[labels["split"] == "valid", "doc_id"])
    got = take_split(ds, "valid").to_pandas()
    assert set(got["doc_id"]) == want
    assert list(got.columns) == ["doc_id", "payload"]
    train = take_split(ds, "train").to_pandas()
    test = take_split(ds, "test").to_pandas()
    assert len(train) + len(test) + len(got) == 500


def test_token_budget_sample_matches_naive(ray_session):
    """Greedy per-group budget prefix in md5(id) order — distributed
    two-level scan vs a naive driver walk, with a tiny bucket count to
    force cross-bucket offsets."""
    import pyarrow as pa

    from ugfraud_ray.pipelines.sketches import _md5_low64
    from ugfraud_ray.pipelines.splits import token_budget_sample

    rng = np.random.default_rng(23)
    n = 300
    ids = np.arange(n, dtype=np.int64)
    grp = rng.choice(["en", "de", "fr"], n)
    w = rng.integers(1, 50, n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids),
                "lang": pa.array(grp.tolist()),
                "n_chars": pa.array(w),
            }
        )
    ).repartition(7)
    budget = 200
    got = (
        token_budget_sample(ds, "lang", "n_chars", budget, n_buckets=4)
        .to_pandas()
        .sort_values(["lang", "cum"])
        .reset_index(drop=True)
    )

    h = _md5_low64([str(i) for i in ids])
    want = []
    for g in ("de", "en", "fr"):
        m = grp == g
        order = np.lexsort((ids[m], h[m]))
        cum = np.cumsum(w[m][order])
        keep = cum <= budget
        for i, c in zip(ids[m][order][keep], cum[keep]):
            want.append((g, int(i), int(c)))
    want.sort(key=lambda t: (t[0], t[2]))
    have = list(zip(got["lang"], got["doc_id"].astype(int), got["cum"].astype(int)))
    assert have == want
    assert len(want) > 0
