"""Regex redaction / scrubbing over a text column (PII removal).

A large-scale training-data pipeline scrubs emails, phone numbers and
IPs before anything else sees the text. This is a pure vectorized
Arrow stage: `pyarrow.compute.replace_substring_regex` +
`count_substring_regex` (both RE2) per batch — no Python row loop, no
shuffle, no state. DuckDB's regexp functions are also RE2, so the SQL
oracle replays the exact patterns verbatim.

Patterns apply IN ORDER; each pattern's match count is measured on the
text as produced by the previous pattern (the oracle nests its
`regexp_replace` calls identically).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# Shared verbatim with the SQL oracle in __ray_entry__.py (RE2 syntax —
# no lookarounds, no backrefs).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?[0-9][0-9()\-\. ]{6,}[0-9]"
IPV4_PATTERN = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

# IP before phone: the dotted-digit runs of an IPv4 address would
# otherwise be swallowed by the broader phone pattern.
PII_PATTERNS: list[tuple[str, str]] = [
    (EMAIL_PATTERN, "<EMAIL>"),
    (IPV4_PATTERN, "<IP>"),
    (PHONE_PATTERN, "<PHONE>"),
]


def regex_redact(
    docs: "ray.data.Dataset",
    patterns: list[tuple[str, str]],
    key: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """(id, redacted text, n_redacted) — patterns applied in order."""

    def scrub(t: pa.Table) -> pa.Table:
        txt = t[key]
        total = None
        for pat, repl in patterns:
            cnt = pc.count_substring_regex(txt, pat)
            total = cnt if total is None else pc.add(total, cnt)
            txt = pc.replace_substring_regex(txt, pat, repl)
        return pa.table(
            {
                id_col: t[id_col],
                key: txt,
                "n_redacted": pc.cast(total, pa.int64()),
            }
        )

    return docs.map_batches(scrub, batch_format="pyarrow")


def pii_redact(
    docs: "ray.data.Dataset", key: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Scrub emails, then phone numbers, then IPv4 addresses."""
    return regex_redact(docs, PII_PATTERNS, key=key, id_col=id_col)
