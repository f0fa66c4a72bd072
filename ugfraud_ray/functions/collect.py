"""Driver-side collection helper.

Ray aggregate/groupby outputs can contain zero-row blocks whose schema
differs from the data blocks; pa.concat_tables rejects the mix. And
``to_arrow_refs()`` does NOT convert blocks a pandas-producing stage
(map_groups) emitted — consumers receive raw pandas frames, including
empty columnless ones from shuffles. Every driver-side collect of a
SMALL dataset goes through here and handles both.
"""

from __future__ import annotations

import pyarrow as pa

import ray


def _as_arrow(block) -> pa.Table:
    if isinstance(block, pa.Table):
        return block
    return pa.Table.from_pandas(block, preserve_index=False)


def _n_rows(block) -> int:
    return block.num_rows if isinstance(block, pa.Table) else len(block)


def collect_table(ds) -> pa.Table:
    """Concatenate a (small) Dataset's blocks, skipping empty blocks.

    Returns an empty, schema-bearing table when all blocks are empty.
    """
    blocks = ray.get(ds.to_arrow_refs())
    nonempty = [_as_arrow(b) for b in blocks if _n_rows(b)]
    if nonempty:
        return pa.concat_tables(nonempty, promote_options="default")
    if blocks:
        return _as_arrow(blocks[0])
    return pa.table({})
