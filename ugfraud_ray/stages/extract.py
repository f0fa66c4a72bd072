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

import pyarrow as pa

import ray.data

_HREF = re.compile(rb'<a href="([^"]+)">')
_MAIN = re.compile(rb"<main>(.*?)</main>", re.DOTALL)


class LinkTextExtractor:
    """pages batch -> flat edge rows (src_url, dst_url, warc_ts).

    One output row per extracted link. Pure bytes -> bytes, deterministic.
    """

    def __init__(self) -> None:
        self.href = _HREF

    def __call__(self, batch: pa.Table) -> pa.Table:
        html_col = batch["html"]
        urls = batch["url"].to_pylist()
        ts = batch["warc_ts"].to_pylist()
        src, dst, ts_out = [], [], []
        for i in range(len(batch)):
            page = html_col[i].as_py()
            links = self.href.findall(page)
            if not links:
                continue
            u, t = urls[i], ts[i]
            for link in links:
                src.append(u)
                dst.append(link.decode("utf-8"))
                ts_out.append(t)
        return pa.table(
            {
                "src_url": pa.array(src, pa.string()),
                "dst_url": pa.array(dst, pa.string()),
                "ts": pa.array(ts_out, pa.timestamp("us")),
            }
        )


class TextExtractor:
    """pages batch -> (url, text) with text extracted from the html bytes.

    ``text`` is recovered by unescaping the ``<main>`` payload; the
    conformance gate (tests) checks it equals the ground-truth column
    byte-for-byte per url.
    """

    def __init__(self) -> None:
        self.main = _MAIN

    def __call__(self, batch: pa.Table) -> pa.Table:
        html_col = batch["html"]
        texts = []
        for i in range(len(batch)):
            page = html_col[i].as_py()
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
