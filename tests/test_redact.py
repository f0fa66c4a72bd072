"""PII redaction: pyarrow RE2 output == DuckDB RE2 replay, exact."""

import duckdb
import pyarrow as pa
import ray.data

from ugfraud_ray.pipelines.redact import PII_PATTERNS, pii_redact, regex_redact

TEXTS = [
    "contact me at bob.smith+spam@example.co.uk or call +1 (415) 555-0199 now",
    "server at 192.168.0.1 and 10.0.0.255, backup none",
    "no pii here at all",
    "a@b.io x 415-555-0199 y 8.8.8.8",
    "",
    "double a@b.cc c@d.ee and 1.2.3.4 5.6.7.8",
]


def _table():
    return pa.table(
        {"doc_id": pa.array(range(len(TEXTS)), pa.int64()), "text": pa.array(TEXTS)}
    )


def _oracle(t: pa.Table, patterns):
    con = duckdb.connect()
    con.register("d", t)
    expr = "text"
    cnt = []
    for pat, repl in patterns:
        cnt.append(f"LEN(regexp_extract_all({expr}, '{pat}'))")
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return con.execute(
        f"SELECT doc_id, {expr} AS text, {'+'.join(cnt)} AS n_redacted FROM d ORDER BY doc_id"
    ).df()


def test_pii_redact_matches_duckdb_exactly(ray_session):
    t = _table()
    got = pii_redact(ray.data.from_arrow(t)).to_pandas().sort_values("doc_id")
    want = _oracle(t, PII_PATTERNS)
    assert list(got["text"]) == list(want["text"])
    assert list(got["n_redacted"]) == list(want["n_redacted"])
    # IPs come out as <IP>, not <PHONE>
    assert got["text"].iloc[1] == "server at <IP> and <IP>, backup none"
    assert got["n_redacted"].iloc[3] == 3


def test_regex_redact_counts_on_intermediate_text(ray_session):
    # second pattern matches the first pattern's replacement token
    t = pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["xx yy"])})
    pats = [("xx", "yy"), ("yy", "zz")]
    got = regex_redact(ray.data.from_arrow(t), pats).to_pandas()
    assert got["text"].iloc[0] == "zz zz"
    assert got["n_redacted"].iloc[0] == 3  # 1 xx + 2 yy (post-first-replace)
