"""Deterministic synthetic Common-Crawl-style `pages` tables.

Schema (per BASELINE.json input_hint):
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

The html is constructed so that extraction is *exactly invertible*:

- every outlink appears as ``<a href="URL">...</a>`` inside ``<nav>``
- the ground-truth text appears html-escaped inside ``<main>...</main>``;
  ``html.unescape(html.escape(text))`` round-trips byte-identically, which
  is the per-row invariant the extractor (stages/extract.py) is checked
  against.

Graph shapes mirror the reference corpus (UGFraud YelpChi: bipartite
user->product reviews with ~1000x product-degree hub skew, see
/root/reference Utils/helper.py:123-202 and SURVEY FIXTURES.md) plus
optional planted dense blocks (Detector/Fraudar.py:75-106 semantics) and
multiple components for connected-components tests.

Everything is a pure function of (seed, sizes) — no wall clock, no RNG
without a seed.
"""

from __future__ import annotations

import html as _html
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

_WORDS = (
    "web graph page link node edge rank spam review fraud signal crawl "
    "index score vertex partition shuffle stream batch arrow parquet "
    "cluster actor message belief prior degree dense block spectral"
).split()

_LANGS = ("en", "de", "fr", "es", "it")

_EPOCH_US = 1_600_000_000 * 1_000_000  # fixed base so warc_ts is deterministic


def user_url(i: int) -> str:
    return f"https://site{i % 97}.example/u/{i}"


def prod_url(j: int) -> str:
    return f"https://catalog.example/p/{j}"


def _text_for(rng: np.random.Generator, n_words: int) -> str:
    idx = rng.integers(0, len(_WORDS), size=n_words)
    words = [_WORDS[k] for k in idx]
    # sprinkle characters that exercise escaping round-trips
    if n_words > 4:
        words[2] = "a<b&c>d"
        words[4] = 'quote"mark'
    return " ".join(words) + "\nline two & tail."


def render_html(url: str, lang: str, outlinks: list[str], text: str) -> bytes:
    links = "\n".join(f'<a href="{u}">out</a>' for u in outlinks)
    doc = (
        "<!doctype html>\n"
        f'<html lang="{lang}">\n'
        f"<head><meta charset=\"utf-8\"><title>{url}</title></head>\n"
        "<body>\n<nav>\n"
        f"{links}\n"
        "</nav>\n<main>"
        f"{_html.escape(text, quote=False)}"
        "</main>\n</body>\n</html>\n"
    )
    return doc.encode("utf-8")


def build_pages_table(
    urls: list[str],
    outlinks: dict[str, list[str]],
    seed: int = 42,
    langs: list[str] | None = None,
) -> pa.Table:
    """Assemble the pages table for explicit urls + adjacency."""
    rng = np.random.default_rng(seed)
    texts, htmls, lang_col, ts = [], [], [], []
    for i, u in enumerate(urls):
        lang = langs[i] if langs else _LANGS[int(rng.integers(0, len(_LANGS)))]
        text = _text_for(rng, int(rng.integers(8, 40)))
        texts.append(text)
        lang_col.append(lang)
        htmls.append(render_html(u, lang, outlinks.get(u, []), text))
        ts.append(_EPOCH_US + i * 1_000_000)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang_col, pa.string()),
        }
    )


@dataclass
class PagesSpec:
    """Seeded description of a synthetic link graph."""

    n_users: int = 200
    n_prods: int = 20
    n_edges: int = 600
    seed: int = 42
    zipf_a: float = 1.5  # product popularity skew (hub products)
    n_components: int = 1  # extra disconnected clone components
    planted_blocks: list[tuple[int, int, float]] = field(default_factory=list)
    # each planted block: (m0 users, n0 prods, density p) — Fraudar-style


def _spec_edges(spec: PagesSpec) -> np.ndarray:
    """Deterministic (user_idx, prod_idx) int64 edge array, deduped."""
    rng = np.random.default_rng(spec.seed)
    users = rng.integers(0, spec.n_users, size=spec.n_edges)
    # zipf-ish product popularity: rank-based weights ~ 1/rank^a
    ranks = np.arange(1, spec.n_prods + 1, dtype=np.float64)
    w = ranks ** (-spec.zipf_a)
    w /= w.sum()
    prods = rng.choice(spec.n_prods, size=spec.n_edges, p=w)
    edges = {(int(u), int(p)) for u, p in zip(users, prods)}
    for m0, n0, dens in spec.planted_blocks:
        bu = rng.choice(spec.n_users, size=m0, replace=False)
        bp = rng.choice(spec.n_prods, size=n0, replace=False)
        for u in bu:
            for p in bp:
                if rng.random() < dens:
                    edges.add((int(u), int(p)))
    base = np.array(sorted(edges), dtype=np.int64)
    if spec.n_components > 1:
        # clone the component with shifted ids for CC tests
        out = [base]
        for c in range(1, spec.n_components):
            shift_u = c * spec.n_users
            shift_p = c * spec.n_prods
            out.append(base + np.array([shift_u, shift_p]))
        base = np.concatenate(out)
    return base


def synthesize_pages(spec: PagesSpec) -> tuple[pa.Table, np.ndarray]:
    """pages table + ground-truth (user_idx, prod_idx) edges.

    User pages link to the product pages they review (directed
    user->product, like the reference's review edges); product pages
    have no outlinks.
    """
    edges = _spec_edges(spec)
    n_u = spec.n_users * spec.n_components
    n_p = spec.n_prods * spec.n_components
    urls = [user_url(i) for i in range(n_u)] + [prod_url(j) for j in range(n_p)]
    out: dict[str, list[str]] = {}
    for u, p in edges:
        out.setdefault(user_url(int(u)), []).append(prod_url(int(p)))
    table = build_pages_table(urls, out, seed=spec.seed)
    return table, edges


def pages_from_edge_urls(
    edge_urls: list[tuple[str, str]], seed: int = 42
) -> pa.Table:
    """Pages table for an arbitrary (src_url, dst_url) edge list."""
    out: dict[str, list[str]] = {}
    urls: dict[str, None] = {}
    for s, d in edge_urls:
        urls.setdefault(s)
        urls.setdefault(d)
        out.setdefault(s, []).append(d)
    return build_pages_table(list(urls), out, seed=seed)


def write_pages_parquet(table: pa.Table, path: str) -> str:
    import pyarrow.parquet as pq

    pq.write_table(table, path)
    return path


def synthesize_pages_distributed(
    out_dir: str,
    n_users: int,
    n_prods: int,
    edges_per_user: int = 5,
    seed: int = 42,
    shard_rows: int = 10_000,
    resume: bool = True,
) -> int:
    """Distributed, RESUMABLE synthetic corpus writer.

    One Ray task per shard of `shard_rows` pages; each shard is a pure
    function of (seed, shard index) and lands as
    ``out_dir/shard={i}/pages.parquet`` with an adjacent ``_DONE``
    marker — a rerun skips finished shards (the partitioned-output /
    skip-finished pattern every 100 TB job needs). User pages link to
    seeded product urls; product pages fill the tail shards.

    Returns the number of shards written this call.
    """
    import os

    import ray

    n_pages = n_users + n_prods
    n_shards = (n_pages + shard_rows - 1) // shard_rows

    @ray.remote
    def write_shard(i: int) -> int:
        lo = i * shard_rows
        hi = min(lo + shard_rows, n_pages)
        d = os.path.join(out_dir, f"shard={i}")
        marker = os.path.join(d, "_DONE")
        if resume and os.path.exists(marker):
            return 0
        os.makedirs(d, exist_ok=True)
        rng = np.random.default_rng((seed, i))
        urls, outlinks = [], {}
        for idx in range(lo, hi):
            if idx < n_users:
                u = user_url(idx)
                urls.append(u)
                prods = rng.integers(0, n_prods, size=edges_per_user)
                outlinks[u] = [prod_url(int(p)) for p in prods]
            else:
                urls.append(prod_url(idx - n_users))
        t = build_pages_table(urls, outlinks, seed=seed + i)
        import pyarrow.parquet as pq

        pq.write_table(t, os.path.join(d, "pages.parquet"))
        with open(marker, "w") as f:
            f.write("ok")
        return 1

    written = sum(ray.get([write_shard.remote(i) for i in range(n_shards)]))
    return written
