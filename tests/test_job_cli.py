"""The `ray job submit` entry point (ugfraud_ray/job.py) runs end to end.

The CLI owns its own Ray session, so it runs as a subprocess (fresh
process, RAY_ADDRESS=local) — exactly how `ray job submit` would invoke
it on a cluster head node.
"""

import json
import os
import subprocess
import sys

import pyarrow.dataset as pads

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_job_cli_pagerank_end_to_end(tmp_path):
    out_dir = tmp_path / "out"
    env = dict(os.environ, PYTHONPATH=REPO, RAY_ADDRESS="local")
    p = subprocess.run(
        [sys.executable, "-m", "ugfraud_ray.job",
         "--pipeline", "pagerank",
         "--pages", str(tmp_path / "pages"), "--synthesize", "1500,200",
         "--output", str(out_dir), "--max-iters", "5", "-P", "2",
         "--ckpt-dir", str(tmp_path / "ckpt"), "--checkpoint-every", "2"],
        capture_output=True, text=True, timeout=240, cwd=REPO, env=env,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    metrics = json.loads(p.stdout.strip().splitlines()[-1])
    assert metrics["pipeline"] == "pagerank"
    assert metrics["n_vertices"] == 1700
    assert metrics["supersteps"] == 5
    scores = pads.dataset(str(out_dir / "scores")).to_table()
    verts = pads.dataset(str(out_dir / "vertices")).to_table()
    assert scores.num_rows == 1700 == verts.num_rows
    assert set(scores.column_names) >= {"vid", "rank"}
    assert set(verts.column_names) >= {"url", "vid"}
    # checkpoint lineage landed (per-partition blocks + step manifest)
    assert any((tmp_path / "ckpt").iterdir())


def test_job_cli_substring_dedup_and_bpe(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array(
                [
                    "one two three four five six seven eight nine ten",
                    "one two three four five six seven eight nine ten",
                    "totally different words in this little document here now",
                    "low lower lowest low lower lowest",
                    "a b",
                    "",
                ]
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "docs.parquet"))
    env = dict(os.environ, PYTHONPATH=REPO, RAY_ADDRESS="local")

    p = subprocess.run(
        [sys.executable, "-m", "ugfraud_ray.job",
         "--pipeline", "substring-dedup",
         "--docs", str(tmp_path / "docs.parquet"),
         "--output", str(tmp_path / "dedup_out")],
        capture_output=True, text=True, timeout=240, cwd=REPO, env=env,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    m = json.loads(p.stdout.strip().splitlines()[-1])
    assert m["n_docs"] == 6 and m["n_tokens_removed"] >= 10
    t = pads.dataset(str(tmp_path / "dedup_out")).to_table()
    assert set(t.column_names) >= {"doc_id", "n_removed", "text_dedup"}

    p2 = subprocess.run(
        [sys.executable, "-m", "ugfraud_ray.job",
         "--pipeline", "bpe-train",
         "--docs", str(tmp_path / "docs.parquet"),
         "--output", str(tmp_path / "bpe_out"), "--n-merges", "6"],
        capture_output=True, text=True, timeout=240, cwd=REPO, env=env,
    )
    assert p2.returncode == 0, p2.stderr[-2000:]
    m2 = json.loads(p2.stdout.strip().splitlines()[-1])
    assert m2["n_merges"] == 6
    mt = pq.read_table(str(tmp_path / "bpe_out" / "merges.parquet"))
    assert mt.column_names == ["step", "left", "right", "n"]
