"""Regression repro for the Ray 2.49 chained-join scheduling deadlock
(VERDICT r4 punch #9) — the bug behind the join-free design of
``dedup._ngram_jaccard_distributed``.

Trigger shape (isolated empirically on ray[data] 2.49.2):
- ONE ``Dataset.join`` with num_partitions > num_cpus completes fine
  (a single aggregator pool oversubscribes gracefully), and
- a CHAIN of two joins whose pools each fit (4+4 on 4 cpus) completes,
- but a chain of two joins whose pools each fit individually while
  their SUM exceeds the cluster (16+16 partitions on 4 cpus) HANGS:
  the streaming executor keeps join1's aggregator actors alive while
  join2's pool waits for slots that will never free — a scheduling
  deadlock whenever a join's LEFT SIDE is itself a join output and the
  combined pools oversubscribe. (>300 s on 2 input rows, reproduced.)

Engine-side mitigations that this test guards the retirement of:
- ``join_partitions()`` (stages/graph_build.py) sizes every pool to
  the cluster, never to the data, and
- ``_ngram_jaccard_distributed`` (pipelines/dedup.py) uses groupby
  machinery only — no join chains at all.

The deadlock test is SKIPPED BY DEFAULT (it would burn its full
timeout on every CI run while the bug exists). After a Ray upgrade,
unskip it: if it passes, chained join pools schedule correctly and the
join-free workaround can be reconsidered.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

_CHAIN_SNIPPET = textwrap.dedent(
    """
    import numpy as np
    import pyarrow as pa
    import ray, ray.data

    ray.init(address="local", num_cpus=4, include_dashboard=False)
    cand = ray.data.from_arrow(
        pa.table({"id_a": pa.array([1, 2]), "id_b": pa.array([3, 4])})
    )
    sizes = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(10)),
                  "nsz": pa.array(np.arange(10) * 10)})
    )
    j1 = cand.join(sizes, join_type="inner", num_partitions=%(p)d,
                   on=("id_a",), right_on=("doc_id",))
    j2 = j1.rename_columns({"nsz": "na"}).join(
        sizes, join_type="inner", num_partitions=%(p)d,
        on=("id_b",), right_on=("doc_id",))
    df = j2.to_pandas()
    assert len(df) == 2, df
    assert (df["na"] == df["id_a"] * 10).all()
    assert (df["nsz"] == df["id_b"] * 10).all()
    print("CHAIN_OK")
    ray.shutdown()
    """
)


def _run_chain(num_partitions: int, timeout: int) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", _CHAIN_SNIPPET % {"p": num_partitions}],
        capture_output=True, text=True, timeout=timeout,
        env={**os.environ, "RAY_DEDUP_LOGS": "0"},
    )


def test_chained_join_fitting_pools_works():
    """Control: the same chain with cluster-sized pools (4+4 on 4 cpus
    — what join_partitions() guarantees) completes correctly."""
    p = _run_chain(4, timeout=240)
    assert p.returncode == 0 and "CHAIN_OK" in p.stdout, p.stdout + p.stderr


@pytest.mark.skip(
    reason="Ray 2.49 deadlock: chained Dataset.join whose aggregator pools "
    "jointly oversubscribe the cluster hangs (left side = join output). "
    "Unskip after upgrading Ray; a pass means the join-free "
    "_ngram_jaccard_distributed design can be reconsidered "
    "(pipelines/dedup.py)."
)
def test_chained_join_oversubscribed_pools_deadlock():
    try:
        p = _run_chain(16, timeout=240)
    except subprocess.TimeoutExpired:
        pytest.fail(
            "Ray still deadlocks on chained joins with jointly "
            "oversubscribed aggregator pools — keep the join-free designs"
        )
    assert p.returncode == 0 and "CHAIN_OK" in p.stdout, p.stdout + p.stderr
