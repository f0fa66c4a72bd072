"""JSONL / CSV interchange round-trips over the documents and events
shapes (sources/interchange.py)."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ugfraud_ray.sources.interchange import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)


def _docs_table():
    return pa.table(
        {
            "doc_id": pa.array(np.arange(40, dtype=np.int64)),
            "text": pa.array(
                [f"doc {i} body with words {i * 3}" for i in range(40)]
            ),
            "lang": pa.array(["en", "de", "fr", "es"] * 10),
            "n_chars": pa.array(np.arange(40, dtype=np.int64) * 7),
        }
    )


def _roundtrip(writer, reader, **read_kw):
    t = _docs_table()
    ds = ray.data.from_arrow(t).repartition(3)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "out")
        writer(ds, path)
        assert len(os.listdir(path)) >= 1
        back = (
            reader(path, **read_kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    exp = t.to_pandas()
    assert list(back.columns.sort_values()) == list(exp.columns.sort_values())
    for c in exp.columns:
        assert back[c].tolist() == exp[c].tolist(), c
    assert str(back["doc_id"].dtype) == "int64"
    assert str(back["n_chars"].dtype) == "int64"


def test_jsonl_roundtrip(ray_session):
    _roundtrip(write_jsonl, read_jsonl)


def test_csv_roundtrip_pinned_schema(ray_session):
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    _roundtrip(write_csv, read_csv, schema=schema)


def test_jsonl_feeds_a_pipeline(ray_session):
    from ugfraud_ray.pipelines.text_analysis import token_counts

    ds = ray.data.from_arrow(_docs_table()).repartition(2)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "docs")
        write_jsonl(ds, path)
        out = token_counts(read_jsonl(path)).to_pandas()
    assert len(out) == 40
    assert out.sort_values("doc_id")["n_tokens"].iloc[0] == 6


def test_read_parquet_evolving_null_fills_and_casts(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    from ugfraud_ray.sources.interchange import read_parquet_evolving

    old = pa.table({"id": pa.array([1, 2], pa.int32()), "v": pa.array([10, 20], pa.int64())})
    new = pa.table(
        {
            "id": pa.array([3], pa.int32()),
            "v": pa.array([30], pa.int64()),
            "lang": pa.array(["en"], pa.string()),
        }
    )
    pq.write_table(old, str(tmp_path / "old.parquet"))
    pq.write_table(new, str(tmp_path / "new.parquet"))

    schema = pa.schema(
        [("id", pa.int64()), ("v", pa.int64()), ("lang", pa.string())]
    )
    out = (
        read_parquet_evolving(
            [str(tmp_path / "old.parquet"), str(tmp_path / "new.parquet")], schema
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert out["id"].tolist() == [1, 2, 3]  # int32 widened to int64
    assert out["id"].dtype == "int64"
    assert out["lang"].tolist()[:2] == [None, None] and out["lang"].tolist()[2] == "en"
