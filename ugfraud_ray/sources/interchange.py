"""Text-interchange sources/sinks: JSONL and CSV for the tabular
surfaces (documents/events/edge tables).

The reference's only inputs are the ``metadata.gz`` review stream and
node-link JSON (`/root/reference/UGFraud/Utils/helper.py:363-400`,
``Demo/``); a usable data-processing engine also has to ingest the two
universal text-interchange formats. Both directions are the NATIVE Ray
Data operators (``read_json`` / ``read_csv`` / ``write_json`` /
``write_csv``), so reads parallelize per file and stream per block —
this module only pins the engine's schema conventions on top:

- JSONL: one object per line (``ray.data.read_json`` handles ``.jsonl``
  lines format natively, gz-compressed included via
  ``arrow_open_stream_args``).
- CSV: header row, int64/double/string inference pinned by an explicit
  ``convert_options`` schema when the caller passes one (CSV without a
  pinned schema mis-infers empty strings vs nulls — the round-trip
  tests cover the pinned path).

Column-ordering note: both writers emit the dataset's column order;
readers return whatever is on disk — callers normalize with
``select_columns`` like any other source.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def write_jsonl(ds: "ray.data.Dataset", path: str) -> None:
    """Write one JSON object per line, one file per block, under path/."""
    ds.write_json(path)


def read_jsonl(path: "str | list[str]", **kwargs) -> "ray.data.Dataset":
    """Read JSONL file(s)/dir: one object per line, parallel per file."""
    return ray.data.read_json(path, **kwargs)


def write_csv(ds: "ray.data.Dataset", path: str) -> None:
    """Write header+rows CSV, one file per block, under path/."""
    ds.write_csv(path)


def read_csv(
    path: "str | list[str]",
    schema: "pa.Schema | None" = None,
    **kwargs,
) -> "ray.data.Dataset":
    """Read CSV file(s)/dir. Pass ``schema`` to pin column types
    (recommended: CSV carries no types; inference can flip int64 vs
    double vs string on empty/exotic values)."""
    if schema is not None:
        from pyarrow import csv as pacsv

        kwargs = dict(kwargs)
        kwargs["convert_options"] = pacsv.ConvertOptions(
            column_types={f.name: f.type for f in schema}
        )
    return ray.data.read_csv(path, **kwargs)


def read_parquet_evolving(
    paths: "str | list[str]", schema: pa.Schema, **kwargs
) -> "ray.data.Dataset":
    """Schema-evolution-tolerant parquet read: files written before a
    column existed stream through with that column NULL-filled, and
    every block casts to the pinned target ``schema`` (safe casts only
    — a type CHANGE still fails loudly; widening int32 -> int64 etc.
    succeeds). The lakehouse reality check for any long-lived table the
    incremental sinks append to: old snapshots must stay readable after
    the writer adds a column.

    Implementation: one native streaming ``read_parquet`` (parallel per
    file); the harmonize step is a per-block Arrow cast — no Python
    rows, no driver materialization.
    """
    ds = ray.data.read_parquet(paths, **kwargs)

    def harmonize(t: pa.Table) -> pa.Table:
        cols = []
        for f in schema:
            if f.name in t.column_names:
                cols.append(t[f.name].cast(f.type))
            else:
                cols.append(pa.nulls(t.num_rows, f.type))
        return pa.table(dict(zip([f.name for f in schema], cols)))

    return ds.map_batches(harmonize, batch_format="pyarrow")
