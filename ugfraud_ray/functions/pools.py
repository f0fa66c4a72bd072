"""Actor-pool sizing.

A FIXED-size pool (concurrency=N) placed downstream of a lazy AllToAll
(repartition / sort / groupby) in the same DAG deadlocks when the pool
occupies every cluster CPU: the actors hold their CPUs while the
shuffle tasks that feed them starve (measured: minhash over a lazy
repartition at num_cpus=4 hangs forever). Pure autoscaling
(concurrency=(1, N)) avoids that but ramps from ONE actor on big boxes
and costs seconds of warmup per stage (sf0.1 minhash 2.5 s -> 4+ s).

``actor_pool_size(n)`` picks per cluster: full fixed size when the
cluster has at least 2x the pool's CPUs (headroom for every upstream
task), autoscale-from-1 when the pool would occupy half the CPUs or
more.
"""

from __future__ import annotations

import ray


def actor_pool_size(n: int) -> tuple[int, int]:
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return (n if ncpu >= 2 * n else 1, n)
