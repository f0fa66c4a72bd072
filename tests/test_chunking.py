"""Overlapping window chunking (text_analysis.chunk_documents) vs a
python-slicing naive mirror — exercises the Arrow-buffer codepoint
table (multi-byte UTF-8, empties, exact-boundary docs)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ugfraud_ray.pipelines.text_analysis import chunk_documents


def _naive(texts, size, stride):
    out = []
    for i, s in enumerate(texts):
        k = 0
        while k * stride < len(s):
            out.append((i, k, k * stride, s[k * stride : k * stride + size]))
            k += 1
    return out


def _run(texts, size, stride, blocks=3):
    t = pa.table(
        {"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
         "text": pa.array(texts)}
    )
    ds = ray.data.from_arrow(t).repartition(blocks)
    out = chunk_documents(ds, size=size, stride=stride).to_pandas()
    out = out.sort_values(["doc_id", "chunk_id"])
    return list(out.itertuples(index=False, name=None))


def test_chunks_match_python_slicing(ray_session):
    texts = [
        "hello world, this is a test",
        "",
        "héllo🌍ab€cdef",            # multi-byte codepoints
        "short",
        "x" * 17,                     # len % stride == boundary cases
        "y" * 15,                     # exact multiple of stride
        "🌍" * 9,                     # every char is 4 bytes
    ]
    assert _run(texts, 7, 5) == _naive(texts, 7, 5)


def test_chunks_non_overlapping_and_degenerate(ray_session):
    texts = ["abcdefghij", "k", ""]
    # stride == size: a partition, no overlap
    assert _run(texts, 4, 4) == _naive(texts, 4, 4)
    # stride > size: gaps are allowed and well-defined
    assert _run(texts, 2, 5) == _naive(texts, 2, 5)


def test_chunks_rejects_bad_params(ray_session):
    with pytest.raises(ValueError):
        chunk_documents(ray.data.from_items([{"doc_id": 0, "text": "a"}]),
                        size=0, stride=1)
