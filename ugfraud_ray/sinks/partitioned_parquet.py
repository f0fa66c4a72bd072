"""Resumable partitioned-parquet sink.

The 100 TB contract (brief: "Resumable output"): results are written as
one directory per partition value — never one giant file — with a
manifest recording which partitions completed, so a failed run re-runs
ONLY the missing partitions. Exactly-once per partition is guaranteed
by cleaning any partially-written pending directory before rewriting it
(Ray's write_parquet appends uniquely-named files, so a blind rewrite
would duplicate rows).

Layout on disk:

    out_dir/
      _manifest.json            {"done": [v1, v2, ...]}
      <partition_col>=v1/...parquet
      <partition_col>=v2/...parquet
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa

import ray
import ray.data

_MANIFEST = "_manifest.json"


def _distinct_values(ds: "ray.data.Dataset", col: str) -> list:
    """Distinct partition values via per-block unique partials + ONE
    driver merge — the partition domain is small by construction
    (shards / key ranges / dates), the rows never leave the cluster."""

    def u(t: pa.Table) -> pa.Table:
        return pa.table({col: pa.array(np.unique(t[col].to_numpy(zero_copy_only=False)))})

    parts = [
        t[col].to_numpy(zero_copy_only=False)
        for t in ray.get(ds.map_batches(u, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows
    ]
    if not parts:
        return []
    # string columns arrive as object-dtype arrays whose elements are
    # plain Python str (no .item()); numeric ones as numpy scalars
    return [v.item() if hasattr(v, "item") else v
            for v in np.unique(np.concatenate(parts))]


def _read_manifest(out_dir: str) -> set:
    p = os.path.join(out_dir, _MANIFEST)
    if not os.path.exists(p):
        return set()
    with open(p) as f:
        return set(json.load(f).get("done", []))


def _write_manifest(out_dir: str, done: set) -> None:
    p = os.path.join(out_dir, _MANIFEST)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"done": sorted(done)}, f)
    os.replace(tmp, p)  # atomic on POSIX


def write_partitioned(
    ds: "ray.data.Dataset",
    out_dir: str,
    partition_col: str,
    resume: bool = True,
) -> dict:
    """Write ``ds`` as partitioned parquet with a completion manifest.

    Returns {"written": [...], "skipped": [...]}. A re-run with
    ``resume=True`` writes only partitions absent from the manifest;
    partially-written pending directories are removed first so every
    partition is written exactly once. ``resume=False`` clears the
    output and writes everything.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = _read_manifest(out_dir) if resume else set()
    if not resume:
        for entry in os.listdir(out_dir):
            full = os.path.join(out_dir, entry)
            if entry.startswith(f"{partition_col}=") and os.path.isdir(full):
                shutil.rmtree(full)
        _write_manifest(out_dir, set())

    values = _distinct_values(ds, partition_col)
    pending = [v for v in values if v not in done]
    if not pending:
        return {"written": [], "skipped": sorted(done)}

    # clean partial leftovers of pending partitions (a previous run may
    # have died mid-write)
    for v in pending:
        d = os.path.join(out_dir, f"{partition_col}={v}")
        if os.path.isdir(d):
            shutil.rmtree(d)

    pend_arr = np.array(pending)

    def keep_pending(t: pa.Table) -> pa.Table:
        vals = t[partition_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(vals, pend_arr)))

    sub = ds.map_batches(keep_pending, batch_format="pyarrow") if done else ds
    sub.write_parquet(out_dir, partition_cols=[partition_col])
    _write_manifest(out_dir, done | set(pending))
    return {"written": sorted(pending), "skipped": sorted(done)}


def read_partitioned(out_dir: str, partition_col: str | None = None) -> "ray.data.Dataset":
    """Read a sink directory back (partition column restored by Ray's
    hive-style path parsing); raises if the manifest is absent."""
    if not os.path.exists(os.path.join(out_dir, _MANIFEST)):
        raise FileNotFoundError(f"no {_MANIFEST} in {out_dir} — not a finished sink")
    return ray.data.read_parquet(out_dir)


def compact_partitions(
    out_dir: str,
    partition_col: str,
    max_files: int = 1,
    target_rows_per_file: int = 5_000_000,
) -> dict:
    """Small-file compaction — the maintenance op every long-lived
    partitioned table needs (many incremental writes leave dozens of
    KB-sized files per partition; reads then pay per-file open/footer
    cost). Every finished partition holding more than ``max_files``
    parquet files is rewritten as one-file-per-``target_rows_per_file``
    rows, ATOMICALLY: the rewrite lands in a ``.compact.tmp`` sibling,
    the old directory is swapped out only after the rewrite completes,
    and the manifest is untouched throughout (readers using the
    manifest never observe a partition mid-rewrite; a crash mid-compact
    leaves either the old files or the finished tmp dir — never a mix).

    Returns {"compacted": [...], "skipped": [...], "files_before": n,
    "files_after": m}.
    """
    done = _read_manifest(out_dir)
    if not done:
        raise FileNotFoundError(f"no finished partitions in {out_dir}")
    compacted, skipped = [], []
    files_before = files_after = 0
    for v in sorted(done):
        pdir = os.path.join(out_dir, f"{partition_col}={v}")
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        files_before += len(files)
        if len(files) <= max_files:
            skipped.append(v)
            files_after += len(files)
            continue
        tmp = pdir + ".compact.tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)  # junk from a crashed compact
        part = ray.data.read_parquet(pdir)
        part.repartition(
            max(1, -(-part.count() // target_rows_per_file))
        ).write_parquet(tmp)
        old = pdir + ".compact.old"
        if os.path.isdir(old):  # pragma: no cover
            shutil.rmtree(old)
        os.replace(pdir, old)
        os.replace(tmp, pdir)
        shutil.rmtree(old)
        compacted.append(v)
        files_after += len([f for f in os.listdir(pdir) if f.endswith(".parquet")])
    return {
        "compacted": compacted,
        "skipped": skipped,
        "files_before": files_before,
        "files_after": files_after,
    }


def delete_rows(
    out_dir: str,
    partition_col: str,
    id_col: str,
    ids: list,
) -> dict:
    """Targeted row deletion (the GDPR / right-to-be-forgotten op):
    remove every row whose ``id_col`` is in ``ids`` by REWRITING ONLY
    the partitions that actually contain such rows — scanned partition
    by partition, swapped atomically with the compaction tmp-dir
    protocol, manifest untouched. Partitions without hits are not
    rewritten (their files stay byte-identical, so object-store caches
    and downstream resume logic keep working).

    Returns {"rewritten": [...], "untouched": [...], "n_deleted": n}.
    """
    import pyarrow.compute as _pc

    done = _read_manifest(out_dir)
    if not done:
        raise FileNotFoundError(f"no finished partitions in {out_dir}")
    id_set = pa.array(sorted(set(ids)))
    rewritten, untouched = [], []
    n_deleted = 0
    for v in sorted(done):
        pdir = os.path.join(out_dir, f"{partition_col}={v}")
        part = ray.data.read_parquet(pdir)

        def hit_count(t: pa.Table) -> pa.Table:
            m = _pc.fill_null(_pc.is_in(t[id_col], value_set=id_set), False)
            return pa.table({"n": pa.array([int(_pc.sum(_pc.cast(m, pa.int64())).as_py() or 0)], pa.int64())})

        hits = sum(
            r["n"][0].as_py()
            for r in ray.get(
                part.map_batches(hit_count, batch_format="pyarrow").to_arrow_refs()
            )
            if r.num_rows
        )
        if not hits:
            untouched.append(v)
            continue
        n_deleted += int(hits)

        def drop(t: pa.Table) -> pa.Table:
            m = _pc.fill_null(_pc.is_in(t[id_col], value_set=id_set), False)
            return t.filter(_pc.invert(m))

        tmp = pdir + ".compact.tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        part.map_batches(drop, batch_format="pyarrow").write_parquet(tmp)
        old = pdir + ".compact.old"
        if os.path.isdir(old):  # pragma: no cover
            shutil.rmtree(old)
        os.replace(pdir, old)
        os.replace(tmp, pdir)
        shutil.rmtree(old)
        rewritten.append(v)
    return {"rewritten": rewritten, "untouched": untouched, "n_deleted": n_deleted}
