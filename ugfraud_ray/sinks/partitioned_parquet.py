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
_SCRATCH = "_compact"  # leading "_": pyarrow dataset discovery ignores it


def _scratch_paths(out_dir: str, partition_col: str, v) -> tuple[str, str]:
    """tmp/old rewrite dirs for one partition, under ``out_dir/_compact/``.

    The leading underscore keeps them invisible to every whole-tree
    reader (pyarrow's default ``ignore_prefixes`` is ``['.', '_']``), so
    a reader racing a compact/delete — or scanning after a crash that
    left a finished tmp/old behind — never sees two copies of a
    partition or resurrected deleted rows."""
    base = os.path.join(out_dir, _SCRATCH)
    os.makedirs(base, exist_ok=True)
    stem = os.path.join(base, f"{partition_col}={v}")
    return stem + ".tmp", stem + ".old"


def _recover_partition(pdir: str, old: str) -> None:
    """Heal a crash between the two ``os.replace`` calls of a previous
    compact/delete: if the canonical dir is absent but its ``.old``
    sibling survives, restore it; if both exist the swap completed and
    the leftover ``.old`` is junk."""
    if os.path.isdir(old):
        if not os.path.isdir(pdir):
            os.replace(old, pdir)
        else:
            shutil.rmtree(old)


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
    rows, ATOMICALLY: the rewrite lands in a hidden
    ``_compact/<col>=<v>.tmp`` scratch dir (ignored by whole-tree
    readers — pyarrow skips ``_``-prefixed entries), the old directory
    is swapped out only after the rewrite completes, and the manifest
    is untouched throughout. A crash at ANY point leaves either the old
    files, the finished hidden tmp, or a missing canonical dir with its
    data in the hidden ``.old`` — the next run's ``_recover_partition``
    restores that last case; a reader never sees two copies of a row.

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
        tmp, old = _scratch_paths(out_dir, partition_col, v)
        _recover_partition(pdir, old)
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        files_before += len(files)
        if len(files) <= max_files:
            skipped.append(v)
            files_after += len(files)
            continue
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)  # junk from a crashed compact
        part = ray.data.read_parquet(pdir)
        part.repartition(
            max(1, -(-part.count() // target_rows_per_file))
        ).write_parquet(tmp)
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
        tmp, old = _scratch_paths(out_dir, partition_col, v)
        _recover_partition(pdir, old)
        part = ray.data.read_parquet(pdir)
        n_before = part.count()  # parquet footer metadata — no data read

        def drop(t: pa.Table) -> pa.Table:
            m = _pc.fill_null(_pc.is_in(t[id_col], value_set=id_set), False)
            return t.filter(_pc.invert(m))

        # cheap pre-filter: scan ONLY the id column and count hits, so
        # hit-free partitions pay one narrow read pass instead of a
        # full-table rewrite (sparse deletes over a large sink would
        # otherwise rewrite every byte of the sink per call)
        def count_hits(t: pa.Table) -> pa.Table:
            m = _pc.fill_null(_pc.is_in(t[id_col], value_set=id_set), False)
            return pa.table({"hits": pa.array([int(_pc.sum(m).as_py() or 0)], pa.int64())})

        hits = int(
            ray.data.read_parquet(pdir, columns=[id_col])
            .map_batches(count_hits, batch_format="pyarrow")
            .sum("hits")
            or 0
        )
        if not hits:
            untouched.append(v)
            continue
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        part.map_batches(drop, batch_format="pyarrow").write_parquet(tmp)
        assert n_before - ray.data.read_parquet(tmp).count() == hits
        n_deleted += int(hits)
        os.replace(pdir, old)
        os.replace(tmp, pdir)
        shutil.rmtree(old)
        rewritten.append(v)
    return {"rewritten": rewritten, "untouched": untouched, "n_deleted": n_deleted}
