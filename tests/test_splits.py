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
