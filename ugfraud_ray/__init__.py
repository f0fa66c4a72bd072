"""ugfraud_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch rebuild of the capabilities of safe-graph/UGFraud
(reference at /root/reference, cited per-module as file:line) expressed
Ray-Data-first:

- input: Parquet of Common-Crawl-style web pages
  ``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``
- ``map_batches`` over zero-copy Arrow for every per-record stage
- hash-partitioned per-partition CSR shards held in actor pools for the
  iterative kernels (PageRank, connected components, label propagation,
  GANG/ZooBP/SpEagle belief propagation)
- groupby/aggregate shuffles with two-level combining for skew
- per-superstep Parquet checkpoints + metrics for mid-iteration resume

Library code NEVER calls ``ray.init`` / ``ray.shutdown`` — sessions are
owned by bench.py / test fixtures / the driver.
"""

__version__ = "0.1.0"
