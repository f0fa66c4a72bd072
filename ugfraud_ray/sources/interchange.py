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
