"""``ray job submit`` entry point for the engine's flagship pipelines.

Submit against a running multi-node cluster (the north-rule launch
surface — SURVEY.md §7.1 M9):

    ray job submit --working-dir . -- \
        python -m ugfraud_ray.job --pipeline pagerank \
        --pages /data/pages --output /data/out/pr \
        --ckpt-dir /data/ckpt/pr --checkpoint-every 5 --resume

or run locally in tests / single-node (``RAY_ADDRESS=local``).  The job
owns its Ray session (library code never calls ``ray.init``):

    pages parquet --> link extraction (actor-pool ``map_batches`` over
    zero-copy Arrow) --> edge dedup --> vertex numbering --> int-vid
    edge table --> iterative superstep pipeline (per-partition CSR
    shards, checkpoint lineage, ``--resume`` picks up the greatest
    committed superstep) --> partitioned parquet output
    (``output/scores`` + ``output/vertices`` vid<->url map) and ONE
    JSON metrics line on stdout.

``--synthesize U,P`` first writes a deterministic synthetic corpus with
the resumable shard writer (pure function of seed + shard index; reruns
skip finished shards), so the whole job is re-runnable end to end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _parse_args(argv: list[str]) -> argparse.Namespace:
    ap = argparse.ArgumentParser(prog="python -m ugfraud_ray.job")
    ap.add_argument("--pipeline", required=True,
                    choices=["pagerank", "components", "triangles", "curate",
                             "substring-dedup", "bpe-train"])
    ap.add_argument("--pages", help="input pages parquet dir/file "
                    "(url, warc_ts, html, text, lang)")
    ap.add_argument("--docs", help="input documents parquet dir/file "
                    "(doc_id, text) — required for --pipeline curate")
    ap.add_argument("--min-chars", type=int, default=100,
                    help="curate: length gate (characters)")
    ap.add_argument("--synthesize", metavar="U,P",
                    help="write a synthetic corpus of U user + P product "
                    "pages into --pages first (resumable shard writer)")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--partitions", "-P", type=int, default=0,
                    help="CSR shards (default: min(8, cluster CPUs))")
    ap.add_argument("--max-iters", type=int, default=50,
                    help="iteration cap for iterative pipelines "
                    "(pagerank/components/speagle)")
    ap.add_argument("--n-merges", type=int, default=200,
                    help="bpe-train: number of merge rules to learn "
                    "(vocabulary size minus the byte alphabet)")
    ap.add_argument("--tol", type=float, default=1e-9)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    return ap.parse_args(argv)


def run(args: argparse.Namespace) -> dict:
    """Build the graph from pages and run the requested pipeline.

    Assumes Ray is already initialized (the CLI ``main`` owns that).
    Returns the metrics dict that ``main`` prints as one JSON line.
    """
    import ray
    import ray.data

    from ugfraud_ray.stages.graph_build import build_graph

    metrics: dict = {"pipeline": args.pipeline}
    if args.pipeline == "substring-dedup":
        # ExactSubstr dedup: documents -> (doc_id, n_tokens, n_removed,
        # text_dedup) parquet
        from ugfraud_ray.pipelines.dedup import substring_dedup

        if not args.docs:
            raise SystemExit("--docs is required for --pipeline substring-dedup")
        docs = ray.data.read_parquet(args.docs, columns=["doc_id", "text"]).materialize()
        t0 = time.perf_counter()
        out = substring_dedup(docs, approx_docs=docs.count()).materialize()
        metrics["pipeline_s"] = round(time.perf_counter() - t0, 3)
        metrics["n_docs"] = out.count()
        metrics["n_tokens_removed"] = int(out.sum("n_removed"))
        out.write_parquet(args.output)
        return metrics
    if args.pipeline == "bpe-train":
        # BPE tokenizer training: documents -> merge table parquet
        import pyarrow.parquet as _pq

        from ugfraud_ray.pipelines.bpe import bpe_train

        if not args.docs:
            raise SystemExit("--docs is required for --pipeline bpe-train")
        docs = ray.data.read_parquet(args.docs, columns=["doc_id", "text"])
        t0 = time.perf_counter()
        merges = bpe_train(docs, n_merges=args.n_merges)
        metrics["pipeline_s"] = round(time.perf_counter() - t0, 3)
        metrics["n_merges"] = merges.num_rows
        os.makedirs(args.output, exist_ok=True)
        _pq.write_table(merges, os.path.join(args.output, "merges.parquet"))
        return metrics
    if args.pipeline == "curate":
        # corpus curation: documents -> (doc_id, split, n_tokens),
        # written as split-partitioned parquet (resumable consumers can
        # read one split dir at a time)
        from ugfraud_ray.pipelines.curation import curate

        if not args.docs:
            raise SystemExit("--docs is required for --pipeline curate")
        docs = ray.data.read_parquet(args.docs, columns=["doc_id", "text"])
        t0 = time.perf_counter()
        out = curate(docs, min_chars=args.min_chars).materialize()
        metrics["pipeline_s"] = round(time.perf_counter() - t0, 3)
        metrics["n_retained"] = out.count()
        os.makedirs(args.output, exist_ok=True)
        t0 = time.perf_counter()
        # resumable sink: a re-run after a crash writes ONLY the splits
        # whose directories are not in the completion manifest
        from ugfraud_ray.sinks.partitioned_parquet import write_partitioned

        wres = write_partitioned(
            out, os.path.join(args.output, "curated"), "split", resume=args.resume
        )
        metrics["write_s"] = round(time.perf_counter() - t0, 3)
        metrics["splits_written"] = wres["written"]
        metrics["splits_skipped"] = wres["skipped"]
        return metrics

    if args.synthesize:
        from ugfraud_ray.sources.pages import synthesize_pages_distributed

        n_users, n_prods = (int(x) for x in args.synthesize.split(","))
        t0 = time.perf_counter()
        synthesize_pages_distributed(args.pages, n_users=n_users, n_prods=n_prods)
        metrics["synthesize_s"] = round(time.perf_counter() - t0, 3)

    pages = ray.data.read_parquet(args.pages)
    P = args.partitions or min(8, int(ray.cluster_resources().get("CPU", 8)))

    t0 = time.perf_counter()
    g = build_graph(pages)
    edges, vertices, n = g["edges"].materialize(), g["vertices"], g["n_vertices"]
    metrics["build_graph_s"] = round(time.perf_counter() - t0, 3)
    metrics["n_vertices"] = n
    metrics["n_edges"] = edges.count()

    os.makedirs(args.output, exist_ok=True)
    layout_dir = os.path.join(args.output, "_layout")
    t0 = time.perf_counter()
    if args.pipeline == "pagerank":
        from ugfraud_ray.pipelines.pagerank import pagerank

        scores, step_metrics = pagerank(
            edges.select_columns(["src", "dst"]), n, layout_dir, P=P,
            damping=args.damping, max_iters=args.max_iters, tol=args.tol,
            ckpt_dir=args.ckpt_dir, checkpoint_every=args.checkpoint_every,
            resume=args.resume,
        )
    elif args.pipeline == "components":
        from ugfraud_ray.pipelines.components import connected_components

        scores, step_metrics = connected_components(
            edges, n, layout_dir, P=P, max_iters=args.max_iters,
            ckpt_dir=args.ckpt_dir, checkpoint_every=args.checkpoint_every,
            resume=args.resume,
        )
    else:  # triangles: scalar result, no per-vertex output
        from ugfraud_ray.pipelines.triangles import triangle_count

        metrics["triangles"] = triangle_count(edges, P=P)
        scores, step_metrics = None, []
    metrics["pipeline_s"] = round(time.perf_counter() - t0, 3)
    metrics["supersteps"] = len(step_metrics)

    t0 = time.perf_counter()
    if scores is not None:
        scores.write_parquet(os.path.join(args.output, "scores"))
        metrics["n_scores"] = metrics["n_vertices"]
    vertices.write_parquet(os.path.join(args.output, "vertices"))
    metrics["write_s"] = round(time.perf_counter() - t0, 3)
    return metrics


def main(argv: list[str] | None = None) -> None:
    args = _parse_args(sys.argv[1:] if argv is None else argv)
    if not args.pages and args.pipeline not in ("curate", "substring-dedup", "bpe-train"):
        raise SystemExit("--pages is required (with --synthesize to create it)")
    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster;
        # standalone runs fall back to a local session
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, ignore_reinit_error=True)
    try:
        print(json.dumps(run(args)))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
