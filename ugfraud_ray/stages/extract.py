"""S2 — pages -> link edges + extracted text.

Reference analog: the gzip line parser `Utils/helper.py:123-202` turns one
input record into edge rows; here one *page* record becomes (a) its
outgoing `(src_url, dst_url)` link edges and (b) its extracted text, which
must be byte-identical to the ground-truth `text` column (the north-rule
per-row invariant).

Ray-Data shape: a stateless-per-batch actor-pool stage —
``map_batches(LinkTextExtractor, batch_format="pyarrow", ...)`` — the
regexes are compiled once per actor in ``__init__``, each batch is a
zero-copy Arrow table, the wide ``html:binary`` column is dropped in the
same stage so it never flows further down the pipeline.
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pyarrow as pa

import ray.data

_HREF = re.compile(rb'<a href="([^"]+)">')
_MAIN = re.compile(rb"<main>(.*?)</main>", re.DOTALL)


def _page_views(col):
    """Zero-copy memoryview per row of a (large_)binary column.

    Slices the value buffer directly via the offsets buffer — no
    per-row ``as_py()`` bytes copy. ``re`` accepts memoryviews and
    still returns bytes groups."""
    arrs = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    for a in arrs:
        if a.null_count:
            raise ValueError("html column must be non-null")
        dt = np.int64 if pa.types.is_large_binary(a.type) else np.int32
        off = np.frombuffer(a.buffers()[1], dtype=dt)[a.offset : a.offset + len(a) + 1]
        data = memoryview(a.buffers()[2])
        for j in range(len(a)):
            yield data[off[j] : off[j + 1]]


class LinkTextExtractor:
    """pages batch -> flat edge rows (src_url, dst_url, warc_ts).

    One output row per extracted link. Pure bytes -> bytes,
    deterministic. Vectorized assembly: per-page ``findall`` extends ONE
    flat list, src urls / timestamps are gathered Arrow-side with
    ``pc.take`` over ``np.repeat``-ed row indices (urls and timestamps
    never round-trip through Python), and the link bytes convert to
    strings with a single vectorized binary->string cast.
    """

    def __init__(self) -> None:
        self.href = _HREF

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        counts = np.zeros(n, dtype=np.int64)
        flat: list[bytes] = []
        for i, page in enumerate(_page_views(batch["html"])):
            links = self.href.findall(page)
            if links:
                counts[i] = len(links)
                flat.extend(links)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), counts))
        return pa.table(
            {
                "src_url": pc.take(batch["url"].combine_chunks(), idx),
                "dst_url": pa.array(flat, pa.binary()).cast(pa.string()),
                "ts": pc.take(batch["warc_ts"].combine_chunks(), idx).cast(
                    pa.timestamp("us")
                ),
            }
        )


class TextExtractor:
    """pages batch -> (url, text) with text extracted from the html bytes.

    ``text`` is recovered by unescaping the ``<main>`` payload; the
    conformance gate (tests) checks it equals the ground-truth column
    byte-for-byte per url. The regex scans zero-copy memoryview slices;
    unescape+decode stays per-row (inherently Python), everything else
    is Arrow.
    """

    def __init__(self) -> None:
        self.main = _MAIN

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = []
        for page in _page_views(batch["html"]):
            m = self.main.search(page)
            texts.append(_html.unescape(m.group(1).decode("utf-8")) if m else "")
        return pa.table(
            {
                "url": batch["url"],
                "extracted_text": pa.array(texts, pa.string()),
                "lang": batch["lang"],
            }
        )


def extract_edges(pages: "ray.data.Dataset", concurrency: int | None = None) -> "ray.data.Dataset":
    """pages Dataset -> (src_url, dst_url, ts) edge Dataset.

    Stateless task-pool stage by default (the regexes are compiled at
    module import, so tasks pay no per-batch setup). Pass ``concurrency``
    to pin an actor pool instead — but note an actor pool *reserves* its
    CPUs for the lifetime of the stage; in a plan that chains several
    pools plus shuffles, size the pools so they never sum to the whole
    cluster or the shuffle tasks starve.
    """
    kwargs: dict = {}
    fn = LinkTextExtractor if concurrency else LinkTextExtractor()
    if concurrency:
        kwargs["concurrency"] = concurrency
    return pages.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=1024, **kwargs
    )


def text_conformance_mismatches(pages: "ray.data.Dataset") -> int:
    """North-rule per-row invariant: extracted text byte-identical to the
    ground-truth `text` column per url. One streaming pass; returns the
    global mismatch count (0 = conformant)."""
    extractor = TextExtractor()

    def check(batch: pa.Table) -> pa.Table:
        got = extractor(batch)["extracted_text"]
        import pyarrow.compute as pc

        bad = pc.sum(pc.cast(pc.not_equal(got, batch["text"]), pa.int64())).as_py() or 0
        return pa.table({"mismatches": pa.array([bad], pa.int64())})

    from ray.data.aggregate import Sum

    out = pages.map_batches(check, batch_format="pyarrow", zero_copy_batch=True)
    return int(out.aggregate(Sum("mismatches", alias_name="m"))["m"])


def extract_text(pages: "ray.data.Dataset", concurrency: int | None = None) -> "ray.data.Dataset":
    """pages Dataset -> (url, extracted_text, lang) Dataset."""
    kwargs: dict = {}
    fn = TextExtractor if concurrency else TextExtractor()
    if concurrency:
        kwargs["concurrency"] = concurrency
    return pages.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=1024, **kwargs
    )
