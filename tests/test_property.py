"""Hypothesis property tests over the pure (no-Ray) kernels: codec
round-trips, the md5-low64 <-> DuckDB md5_number_upper identity that
every oracle depends on, and the minhash union law."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays


@settings(max_examples=30, deadline=None)
@given(
    arrays(np.int16, st.integers(0, 500)),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_round_trip_property(samples, rate):
    from ugfraud_ray.pipelines.multimodal import decode_wav, encode_wav

    got, r = decode_wav(encode_wav(samples, rate))
    assert r == rate
    np.testing.assert_array_equal(got, samples)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 2**32 - 1),
)
def test_bmp_round_trip_property(h, w, seed):
    from ugfraud_ray.pipelines.multimodal import decode_bmp, encode_bmp_gray8

    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    np.testing.assert_array_equal(decode_bmp(encode_bmp_gray8(img)), img)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 30), st.integers(1, 30), st.booleans(), st.integers(0, 2**32 - 1))
def test_ppm_round_trip_property(h, w, rgb, seed):
    from ugfraud_ray.pipelines.multimodal import decode_ppm, encode_ppm

    shape = (h, w, 3) if rgb else (h, w)
    img = np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(codec="ascii", exclude_characters="'\x00"), max_size=40), min_size=1, max_size=20))
def test_md5_low64_matches_duckdb(strings):
    """The engine's hash identity: _md5_low64(s) == DuckDB
    md5_number_upper(s) — the bridge every hash-keyed oracle crosses."""
    import duckdb

    from ugfraud_ray.pipelines.sketches import _md5_low64

    eng = _md5_low64(strings)
    con = duckdb.connect()
    for s, h in zip(strings, eng.tolist()):
        (want,) = con.execute("SELECT md5_number_upper(?)", [s]).fetchone()
        assert int(want) == h, s


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=50),
    st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=50),
)
def test_minhash_union_law(a, b):
    """sig(A ∪ B) == elementwise min(sig(A), sig(B)) — the algebra the
    banded LSH relies on."""
    from ugfraud_ray.pipelines.dedup import minhash_signature

    a = np.array(a, dtype=np.uint64)
    b = np.array(b, dtype=np.uint64)
    u = np.union1d(a, b)
    sa = minhash_signature(a, num_perm=16)
    sb = minhash_signature(b, num_perm=16)
    su = minhash_signature(u, num_perm=16)
    np.testing.assert_array_equal(su, np.minimum(sa, sb))
