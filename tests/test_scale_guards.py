"""Round-4 scale-regression guards (VERDICT r3 punch list #1-#4, #7):

- a grep gate asserting no row-at-a-time ``filter(lambda`` survives in
  the package (Ray executes those one Python row at a time — the r3
  verdict found four corpus-scale instances),
- forced-distributed-path parity for the GANG B7 prior median
  (the established threshold-0 pattern),
- the bounded token-hash cache,
- exact_rank vs a local sort,
- top_orders per-block-partial merge vs a global sort.
"""

import os
import re

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

PKG = os.path.join(os.path.dirname(__file__), "..", "ugfraud_ray")


def test_no_row_at_a_time_filter_lambda_in_package():
    hits = []
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if not f.endswith(".py"):
                continue
            p = os.path.join(root, f)
            with open(p) as fh:
                src = fh.read()
            # whole-file regex (\s* spans newlines) so a line-wrapped
            # ".filter(\n    lambda" from black/ruff can't evade the gate
            for m in re.finditer(r"\.filter\(\s*lambda", src):
                i = src.count("\n", 0, m.start()) + 1
                hits.append(f"{p}:{i}: {m.group(0)!r}")
    assert hits == [], "row-at-a-time filter(lambda) reintroduced:\n" + "\n".join(hits)


def test_no_vertex_table_driver_pandas_in_entry():
    """r5 gate (VERDICT r4 wrong-item #2): query readouts must translate
    vids through seed_vids / vid_to_id_array / unmap_vids — never by
    collecting the vertex map with ``vmap.to_pandas()`` (a vertex-table-
    sized driver materialization that invites copy-paste into
    production paths)."""
    entry = os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py")
    with open(entry) as fh:
        src = fh.read()
    hits = []
    for m in re.finditer(r"vmap\s*\.\s*to_pandas\s*\(", src):
        hits.append(f"line {src.count(chr(10), 0, m.start()) + 1}")
    assert hits == [], "vmap.to_pandas() readout reintroduced at: " + ", ".join(hits)


def _naive_b7_centering(kind: np.ndarray, prior: np.ndarray):
    """Driver replay of nor_priors (reference Utils/helper.py:89-115):
    per-kind min-max normalize, then subtract the RAW value at
    DESCENDING index int(n/2)."""
    out = np.empty_like(prior)
    for k in np.unique(kind):
        m = kind == k
        v = prior[m]
        med = np.sort(v)[::-1][len(v) // 2]
        span = (v.max() - v.min()) or 1.0
        out[m] = (v - v.min()) / span - med
    return out


@pytest.mark.parametrize("force_distributed", [False, True])
def test_gang_prior_median_paths_agree(ray_session, monkeypatch, force_distributed):
    from ugfraud_ray.detectors import gang as gang_mod
    from ugfraud_ray.functions import quantiles

    if force_distributed:
        # threshold-0: the histogram-select machinery must run even on
        # a tiny input and still pin the exact B7 rank
        monkeypatch.setattr(quantiles, "_LOCAL_ROWS", 0)

    rng = np.random.default_rng(11)
    n = 501
    kind = rng.integers(0, 2, size=n).astype(np.int64)
    prior = np.round(rng.random(n), 6)
    # inject heavy ties so descending-index vs ascending-rank equivalence
    # is exercised on a non-distinct multiset
    prior[rng.random(n) < 0.3] = 0.25
    vp = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(np.arange(n)),
                "prior": pa.array(prior),
                "kind": pa.array(kind),
            }
        )
    )
    out = gang_mod.normalize_priors_by_kind(vp).to_pandas().sort_values("vid")
    expect = _naive_b7_centering(kind, prior)
    np.testing.assert_allclose(
        out["prior_centered"].to_numpy(), expect, rtol=0, atol=1e-12
    )


def test_token_cache_cap_bounds_memory(monkeypatch):
    from ugfraud_ray.pipelines import dedup

    monkeypatch.setattr(dedup, "_TOKEN_CACHE_CAP", 8)
    dedup._token_cache.clear()
    toks = [f"tok{i}" for i in range(30)]
    ref = {t: dedup._tok_hash_cached(t) for t in toks}
    assert len(dedup._token_cache) <= 8
    # values stay stable across the clear-on-overflow
    for t in toks:
        assert dedup._tok_hash_cached(t) == ref[t]
    # and match the uncached md5 definition
    import hashlib

    for t in toks[:5]:
        assert ref[t] == int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
    dedup._token_cache.clear()
    dedup._token_cache_bytes = 0
    # the approximate-bytes bound trips independently of the count cap:
    # with a tiny byte budget, long tokens force clears long before the
    # (restored) huge entry cap would
    monkeypatch.setattr(dedup, "_TOKEN_CACHE_CAP", 1 << 22)
    monkeypatch.setattr(dedup, "_TOKEN_CACHE_MAX_BYTES", 1000)
    long_toks = ["x" * 400 + str(i) for i in range(20)]
    ref2 = {t: dedup._tok_hash_cached(t) for t in long_toks}
    assert len(dedup._token_cache) < 20  # clears happened
    assert dedup._token_cache_bytes <= 1000 + dedup._TOKEN_ENTRY_OVERHEAD + 500
    for t in long_toks:
        assert dedup._tok_hash_cached(t) == ref2[t]
    dedup._token_cache.clear()
    dedup._token_cache_bytes = 0


@pytest.mark.parametrize("force_distributed", [False, True])
def test_exact_rank_matches_local_sort(ray_session, monkeypatch, force_distributed):
    from ugfraud_ray.functions import quantiles

    if force_distributed:
        monkeypatch.setattr(quantiles, "_LOCAL_ROWS", 0)
    rng = np.random.default_rng(3)
    v = np.round(rng.normal(size=400), 4)
    v[rng.random(400) < 0.2] = 1.5  # ties
    ds = ray.data.from_arrow(pa.table({"x": pa.array(v)}))
    sv = np.sort(v)
    for r in [0, 1, 199, 200, 398, 399]:
        got = quantiles.exact_rank(ds, "x", r, len(v), approx_rows=len(v))
        assert got == sv[r], (r, got, sv[r])
    with pytest.raises(ValueError):
        quantiles.exact_rank(ds, "x", 400, 400)


def test_day_pack_guard_rejects_out_of_range(ray_session):
    """ADVICE r3: rolling_active_users/max_active_streak pack epoch-day
    into 21 bits; pre-1970 timestamps or negative ids must raise, not
    silently corrupt counts."""
    from ugfraud_ray.pipelines import events as ev

    ok_u = np.array([1, 2], dtype=np.int64)
    ok_d = np.array([100, 200], dtype=np.int64)
    ev._check_day_pack(ok_u, ok_d)  # in range: no raise
    with pytest.raises(ValueError):
        ev._check_day_pack(ok_u, np.array([-1, 5], dtype=np.int64))
    with pytest.raises(ValueError):
        ev._check_day_pack(ok_u, np.array([1 << 21, 5], dtype=np.int64))
    with pytest.raises(ValueError):
        ev._check_day_pack(np.array([-3, 1], dtype=np.int64), ok_d)

    # end-to-end: a pre-1970 event stream fails loudly
    t = pa.table(
        {
            "user_id": pa.array(np.array([1, 1, 2], dtype=np.int64)),
            "ts": pa.array(
                np.array([-86_400_000_000, 0, 86_400_000_000], dtype="datetime64[us]")
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    with pytest.raises(ValueError):
        ev.rolling_active_users(ds).to_pandas()


def test_top_orders_partial_merge_matches_global_sort(ray_session, tmp_path):
    from ugfraud_ray.pipelines.relational import top_orders

    rng = np.random.default_rng(5)
    n = 5000
    t = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
            # heavy ties so the orderkey tie-break matters
            "o_totalprice": pa.array(np.round(rng.random(n) * 10, 1)),
        }
    )
    import pyarrow.parquet as pq

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, sf / "orders.parquet")
    got = top_orders(str(sf), 25)
    expect = (
        ray.data.read_parquet(str(sf / "orders.parquet"))
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(25)
        .to_pandas()
    )
    gp = got.to_pandas().reset_index(drop=True)
    assert (gp["o_orderkey"].to_numpy() == expect["o_orderkey"].to_numpy()).all()
    assert (gp["o_totalprice"].to_numpy() == expect["o_totalprice"].to_numpy()).all()
