"""Driver-side collection helper.

Ray aggregate/groupby outputs can contain zero-row blocks whose schema
differs from the data blocks; pa.concat_tables rejects the mix. Every
driver-side collect of a SMALL dataset goes through here.
"""

from __future__ import annotations

import pyarrow as pa

import ray


def collect_table(ds) -> pa.Table:
    """Concatenate a (small) Dataset's blocks, skipping empty blocks.

    Returns an empty, schema-bearing table when all blocks are empty.
    """
    blocks = ray.get(ds.to_arrow_refs())
    nonempty = [b for b in blocks if b.num_rows]
    if nonempty:
        return pa.concat_tables(nonempty)
    if blocks:
        return blocks[0]
    return pa.table({})
