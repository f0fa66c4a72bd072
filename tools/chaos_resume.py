"""Kill -9 resume chaos test for the superstep engine (r4 verdict #8).

Protocol (three OS processes, each owning its own local Ray session):
1. victim: PageRank on an sf1-scale synthetic graph (default 16M edges)
   with checkpoint_every=3; the parent watches the checkpoint dir and
   SIGKILLs the whole process group the moment a mid-run manifest
   (step >= kill_after) is committed — no atexit, no ray.shutdown, the
   exact crash the atomic-manifest protocol (state/engine.py) claims to
   survive.
2. resumed: resume=True from the same checkpoint dir, runs to
   max_iters, writes final ranks.
3. reference: uninterrupted run to max_iters in a fresh session.

Pass = resumed ranks BIT-IDENTICAL to the reference (exact float
equality — the engine's superstep arithmetic is deterministic given the
same layout, and restore loads the committed parquet state verbatim).

Usage:  python tools/chaos_resume.py [n_edges_millions=16]
Writes: CHAOS_RESUME_r5.json at the repo root.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAX_ITERS = 14
CKPT_EVERY = 3
KILL_AFTER_STEP = 5  # kill once a manifest for step >= this exists


def _worker(mode: str, n_edges: int, work: str) -> None:
    import numpy as np
    import pyarrow as pa

    import ray
    import ray.data

    sys.path.insert(0, REPO)
    from ugfraud_ray.pipelines.pagerank import pagerank

    ray.init(address="local", num_cpus=8, include_dashboard=False)
    n = n_edges // 10
    rng = np.random.default_rng(404)
    src = rng.integers(0, n, n_edges, dtype=np.int64)
    dst = rng.integers(0, n, n_edges, dtype=np.int64)
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).materialize()
    kw = dict(P=8, max_iters=MAX_ITERS, tol=None)
    if mode == "victim":
        pagerank(edges, n, os.path.join(work, "lay_v"), ckpt_dir=os.path.join(work, "ck"),
                 checkpoint_every=CKPT_EVERY, **kw)
        print("VICTIM_FINISHED_WITHOUT_KILL")  # parent treats this as failure
    elif mode == "resumed":
        ranks, metrics = pagerank(
            edges, n, os.path.join(work, "lay_r"), ckpt_dir=os.path.join(work, "ck"),
            checkpoint_every=CKPT_EVERY, resume=True, **kw)
        ranks.to_pandas().sort_values("vid").to_parquet(os.path.join(work, "resumed.parquet"))
        print("FIRST_RESUMED_STEP", metrics[0]["step"])
    else:
        ranks, _ = pagerank(edges, n, os.path.join(work, "lay_f"), **kw)
        ranks.to_pandas().sort_values("vid").to_parquet(os.path.join(work, "reference.parquet"))
    ray.shutdown()


def main() -> None:
    n_edges = int(sys.argv[1] if len(sys.argv) > 1 else 16) * 1_000_000
    import tempfile

    work = tempfile.mkdtemp(prefix="chaos_resume_")
    ck = os.path.join(work, "ck")

    # 1. victim, SIGKILLed mid-run on manifest watch
    victim = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", "victim",
         str(n_edges), work],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        start_new_session=True,
    )
    killed_at = None
    deadline = time.time() + 1800
    while time.time() < deadline:
        if victim.poll() is not None:
            raise SystemExit("victim finished before the kill — raise n_edges")
        steps = [
            int(f[5:-5]) for f in os.listdir(ck)
            if f.startswith("step_") and f.endswith(".json")
        ] if os.path.isdir(ck) else []
        if steps and max(steps) >= KILL_AFTER_STEP:
            killed_at = max(steps)
            os.killpg(os.getpgid(victim.pid), signal.SIGKILL)
            break
        time.sleep(0.25)
    victim.wait()
    assert killed_at is not None, "no checkpoint appeared within deadline"

    def run(mode: str) -> str:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", mode,
             str(n_edges), work],
            capture_output=True, text=True, timeout=1800,
        )
        if p.returncode != 0:
            raise SystemExit(f"{mode} worker failed:\n{p.stdout[-3000:]}\n{p.stderr[-3000:]}")
        return p.stdout

    resumed_out = run("resumed")
    run("reference")

    import pandas as pd

    r = pd.read_parquet(os.path.join(work, "resumed.parquet"))
    f = pd.read_parquet(os.path.join(work, "reference.parquet"))
    bit_identical = bool((r["rank"].to_numpy() == f["rank"].to_numpy()).all())
    max_abs = float(abs(r["rank"].to_numpy() - f["rank"].to_numpy()).max())
    first_step = next(
        (int(line.split()[1]) for line in resumed_out.splitlines()
         if line.startswith("FIRST_RESUMED_STEP")), None)
    out = {
        "n_edges": n_edges,
        "n_vertices": n_edges // 10,
        "max_iters": MAX_ITERS,
        "checkpoint_every": CKPT_EVERY,
        "sigkilled_after_committed_step": killed_at,
        "first_resumed_step": first_step,
        "bit_identical": bit_identical,
        "max_abs_diff": max_abs,
        "note": "victim driver+cluster SIGKILLed (whole process group) right "
                "after a mid-run manifest commit; resume run restores from "
                "the manifest and must match the uninterrupted run exactly",
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "CHAOS_RESUME_r5.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    assert bit_identical, f"resumed != reference (max abs diff {max_abs})"
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], int(sys.argv[3]), sys.argv[4])
    else:
        main()
