"""normalize_text (text_analysis) vs a pure-Python mirror and the
utf8proc properties the oracle relies on (NFC composition, unicode
lower, whitespace-run collapse, edge trim)."""

import re
import unicodedata

import numpy as np
import pyarrow as pa

import ray.data

from ugfraud_ray.pipelines.text_analysis import normalize_text


def _naive(s: str) -> str:
    # NFC -> lower -> collapse \s+ (RE2 \s == Python [ \t\n\r\f\v] on
    # ASCII inputs; the unicode-space cases are asserted separately)
    out = re.sub(r"\s+", " ", unicodedata.normalize("NFC", s).lower())
    return out.strip(" ")


def _run(texts):
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    out = normalize_text(ray.data.from_arrow(t).repartition(2)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_normalize_matches_python(ray_session):
    texts = [
        "  Héllo\t\nWORLD  ",
        "éclair  X",  # decomposed e+combining-acute -> NFC é
        "",
        "   ",
        "already lower",
        "tabs\t\t\tand\nnewlines\r\n",
        "UPPER MiXeD 123",
    ]
    out = _run(texts)
    for i, s in enumerate(texts):
        exp = _naive(s)
        assert out.loc[i, "norm_text"] == exp
        assert out.loc[i, "changed"] == int(exp != s)
        assert out.loc[i, "n_chars_norm"] == len(exp)


def test_normalize_nfc_composes(ray_session):
    # decomposed and precomposed forms normalize to the same bytes
    out = _run(["Café", "Café"])
    assert out.loc[0, "norm_text"] == out.loc[1, "norm_text"] == "café"
    assert list(out["changed"]) == [1, 1]
