"""Resumable partitioned-parquet sink: exactly-once per partition,
skip-finished on resume, partial-dir cleanup."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa

import ray.data

from ugfraud_ray.sinks.partitioned_parquet import (
    read_partitioned,
    write_partitioned,
)


def _ds():
    n = 300
    return ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(np.arange(n, dtype=np.int64)),
                "part": pa.array((np.arange(n) % 3).astype(np.int64)),
                "v": pa.array(np.arange(n, dtype=np.int64) * 7),
            }
        )
    ).repartition(4)


def _files(out, part):
    d = os.path.join(out, f"part={part}")
    return sorted(os.listdir(d)) if os.path.isdir(d) else []


def test_write_resume_skips_finished_partitions(ray_session, tmp_path):
    out = str(tmp_path / "sink")
    r1 = write_partitioned(_ds(), out, "part")
    assert r1 == {"written": [0, 1, 2], "skipped": []}
    back = read_partitioned(out).to_pandas().sort_values("id").reset_index(drop=True)
    assert len(back) == 300 and back["v"].sum() == (np.arange(300) * 7).sum()

    before = {p: _files(out, p) for p in (0, 1, 2)}

    # simulate a crash: partition 1 incomplete (dir partially written,
    # manifest doesn't list it)
    m = json.load(open(os.path.join(out, "_manifest.json")))
    m["done"] = [0, 2]
    json.dump(m, open(os.path.join(out, "_manifest.json"), "w"))
    shutil.rmtree(os.path.join(out, "part=1"))
    os.makedirs(os.path.join(out, "part=1"))
    open(os.path.join(out, "part=1", "garbage.parquet"), "w").write("partial junk")

    r2 = write_partitioned(_ds(), out, "part")
    assert r2 == {"written": [1], "skipped": [0, 2]}
    # finished partitions untouched, pending one rebuilt without the junk
    assert _files(out, 0) == before[0]
    assert _files(out, 2) == before[2]
    assert "garbage.parquet" not in _files(out, 1)

    back = read_partitioned(out).to_pandas().sort_values("id").reset_index(drop=True)
    assert len(back) == 300
    assert (back["v"].to_numpy() == back["id"].to_numpy() * 7).all()


def test_write_no_resume_rewrites_everything(ray_session, tmp_path):
    out = str(tmp_path / "sink2")
    write_partitioned(_ds(), out, "part")
    r = write_partitioned(_ds(), out, "part", resume=False)
    assert r["written"] == [0, 1, 2]
    assert read_partitioned(out).count() == 300


def test_string_partition_values(ray_session, tmp_path):
    # string columns arrive as object-dtype numpy arrays (plain str
    # elements, no .item()) — the job.py curate sink partitions on the
    # string "split" column, so this path must round-trip
    out = str(tmp_path / "sink3")
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(np.arange(90, dtype=np.int64)),
                "split": pa.array(["train", "valid", "test"] * 30),
            }
        )
    ).repartition(3)
    r1 = write_partitioned(ds, out, "split")
    assert r1 == {"written": ["test", "train", "valid"], "skipped": []}
    r2 = write_partitioned(ds, out, "split")
    assert r2 == {"written": [], "skipped": ["test", "train", "valid"]}
    back = read_partitioned(out).to_pandas()
    assert len(back) == 90 and set(back["split"]) == {"train", "valid", "test"}


def test_read_requires_manifest(ray_session, tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        read_partitioned(str(tmp_path / "nope"))


def test_compact_partitions_atomic_and_lossless(ray_session, tmp_path):
    import os

    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.sinks.partitioned_parquet import (
        compact_partitions,
        read_partitioned,
        write_partitioned,
    )

    out = str(tmp_path / "sink")
    t = pa.table(
        {
            "k": pa.array(np.repeat([1, 2, 3], 200)),
            "v": pa.array(np.arange(600, dtype=np.int64)),
        }
    )
    # many small blocks -> many files per partition
    write_partitioned(ray.data.from_arrow(t).repartition(12), out, "k")
    before = read_partitioned(out).to_pandas().sort_values("v").reset_index(drop=True)
    n_files = sum(
        len([f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")])
        for d in os.listdir(out)
        if d.startswith("k=")
    )
    assert n_files > 3

    res = compact_partitions(out, "k", max_files=1)
    assert set(res["compacted"]) == {"1", "2", "3"} or set(res["compacted"]) == {1, 2, 3}
    assert res["files_after"] == 3  # one file per partition
    after = read_partitioned(out).to_pandas().sort_values("v").reset_index(drop=True)
    assert after.equals(before)  # lossless

    # idempotent: second compact skips everything
    res2 = compact_partitions(out, "k", max_files=1)
    assert not res2["compacted"] and res2["files_after"] == 3

    # a junk tmp dir from a crashed compact lives under the HIDDEN
    # _compact/ scratch root: whole-tree readers must not see it even
    # before the next compact cleans it up (ADVICE r3: the old sibling
    # layout leaked finished tmp dirs into read_partitioned)
    junk = os.path.join(out, "_compact", "k=1.tmp")
    os.makedirs(junk)
    open(os.path.join(junk, "garbage.parquet"), "w").close()
    mid = read_partitioned(out).to_pandas().sort_values("v").reset_index(drop=True)
    assert mid.equals(before)  # scratch leftovers are invisible to readers
    # force recompaction of k=1 by splitting it again
    import shutil

    shutil.rmtree(os.path.join(out, "k=1"))
    sub = ray.data.from_arrow(t.filter(pa.compute.equal(t["k"], 1))).repartition(5)
    sub.write_parquet(out, partition_cols=["k"])
    res3 = compact_partitions(out, "k", max_files=1)
    assert "1" in {str(x) for x in res3["compacted"]}
    final = read_partitioned(out).to_pandas().sort_values("v").reset_index(drop=True)
    assert final.equals(before)


def test_compact_crash_between_replaces_recovers(ray_session, tmp_path):
    """ADVICE r3: a crash between os.replace(pdir, old) and
    os.replace(tmp, pdir) left the partition absent at its canonical
    path with the data stranded in .old, and the next maintenance run
    raised on os.listdir. _recover_partition must restore it."""
    import os

    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.sinks.partitioned_parquet import (
        compact_partitions,
        read_partitioned,
        write_partitioned,
    )

    out = str(tmp_path / "sink")
    t = pa.table(
        {
            "k": pa.array(np.repeat([1, 2], 100)),
            "v": pa.array(np.arange(200, dtype=np.int64)),
        }
    )
    write_partitioned(ray.data.from_arrow(t).repartition(4), out, "k")
    before = read_partitioned(out).to_pandas().sort_values("v").reset_index(drop=True)

    # simulate the crash window: canonical dir moved to hidden .old,
    # replacement tmp not yet swapped in
    old = os.path.join(out, "_compact", "k=1.old")
    os.makedirs(os.path.dirname(old), exist_ok=True)
    os.replace(os.path.join(out, "k=1"), old)
    # a reader in the window sees k=1 missing but NEVER duplicated rows
    mid = read_partitioned(out).to_pandas()
    assert len(mid) == 100 and set(mid["k"].astype(str)) == {"2"}

    res = compact_partitions(out, "k", max_files=1)
    after = read_partitioned(out).to_pandas().sort_values("v").reset_index(drop=True)
    assert after.equals(before)
    assert not os.path.isdir(old)
    # delete_rows also recovers from the same window
    os.replace(os.path.join(out, "k=2"), os.path.join(out, "_compact", "k=2.old"))
    from ugfraud_ray.sinks.partitioned_parquet import delete_rows

    res2 = delete_rows(out, "k", "v", [0])
    assert res2["n_deleted"] == 1
    got = read_partitioned(out).to_pandas()
    assert len(got) == 199 and 0 not in set(got["v"])


def test_delete_rows_targeted_rewrite(ray_session, tmp_path):
    import os

    import numpy as np
    import pyarrow as pa

    import ray.data

    from ugfraud_ray.sinks.partitioned_parquet import (
        delete_rows,
        read_partitioned,
        write_partitioned,
    )

    out = str(tmp_path / "sink")
    t = pa.table(
        {
            "k": pa.array(np.repeat([1, 2, 3], 100)),
            "uid": pa.array(np.arange(300, dtype=np.int64)),
        }
    )
    write_partitioned(ray.data.from_arrow(t).repartition(6), out, "k")

    # record the k=3 files to prove they stay byte-identical
    d3 = os.path.join(out, "k=3")
    before3 = {
        f: os.path.getmtime(os.path.join(d3, f)) for f in os.listdir(d3)
    }
    res = delete_rows(out, "k", "uid", [5, 6, 150])  # hits k=1 and k=2 only
    assert res["n_deleted"] == 3
    assert set(map(str, res["rewritten"])) == {"1", "2"}
    assert set(map(str, res["untouched"])) == {"3"}
    after3 = {f: os.path.getmtime(os.path.join(d3, f)) for f in os.listdir(d3)}
    assert after3 == before3  # untouched partition not rewritten

    got = read_partitioned(out).to_pandas()
    assert len(got) == 297
    assert not set(got["uid"]) & {5, 6, 150}
