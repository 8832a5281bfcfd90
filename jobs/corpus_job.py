"""Cluster job entry point for the TRAINING-DATA side of the engine —
``spark-submit --py-files graph500_bfs_spark.zip jobs/corpus_job.py <step>``.

The graph side ships through jobs/linkgraph_job.py; this is its corpus
twin: every document-pipeline operator a 100 TB pretraining-data run needs,
behind one CLI, reading a ``documents``-shaped parquet table (or, for the
``stream-*`` steps, a directory of arriving parquet files with the
``ingest_ts`` column) and writing results to the warehouse.

Steps:

* ``stats``        — per-document text analysis (tokens, stopwords,
                     quality, language guess, fingerprint).
* ``exact-dedup``  — exact-content duplicate groups.
* ``lsh-pairs``    — MinHash banded-LSH near-dup pairs, verified Jaccard;
                     bucket-cap drops printed, never silent.
* ``dedup-groups`` — near-dup CLUSTERS: LSH pairs → undirected graph →
                     connected components → canonical group ids.
* ``prep``         — the shipped composition: exact-dedup survivors that
                     pass the language + quality gates, with token counts.
* ``budget``       — token-budget selection over ``prep`` output
                     (histogram-cutoff two-phase; no global sort).
* ``stream-dedup`` — incremental exact dedup of NEW document files
                     (availableNow; first-writer-wins within the
                     watermark; drops counted via observed metrics).
* ``stream-lsh``   — incremental near-dup CANDIDATE pairs (bounded
                     per-bucket state; beyond-cap/replay drops counted).

Example (cluster):
    spark-submit --master yarn --num-executors 256 \\
        --py-files graph500_bfs_spark.zip jobs/corpus_job.py \\
        prep --docs s3://bucket/documents --warehouse s3://bucket/wh

Example (local sandbox):
    python jobs/corpus_job.py budget --docs /root/testdata/sf0.01/documents.parquet \\
        --budget-tokens 10000 --warehouse /tmp/wh
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def _prep(docs, lang: str, min_quality_ppm: int):
    """Survivor + language + quality composition (the corpus_prep gate)."""
    from graph500_bfs_spark.operators.dedup import exact_dup_groups
    from graph500_bfs_spark.operators.textstats import document_stats

    stats = document_stats(docs)
    groups = exact_dup_groups(docs)
    return (
        stats.join(groups, "doc_id")
        .filter(
            (F.col("doc_id") == F.col("canonical_id"))
            & (F.col("lang_guess") == lang)
            & (F.col("quality_ppm") >= min_quality_ppm)
        )
        .select("doc_id", "n_tokens", "quality_ppm")
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("step", choices=[
        "stats", "exact-dedup", "lsh-pairs", "dedup-groups", "prep",
        "budget", "stream-dedup", "stream-lsh",
    ])
    p.add_argument("--docs", required=True,
                   help="documents parquet path; for stream-* steps a glob "
                        "of arriving files with the ingest_ts column")
    p.add_argument("--warehouse", default="/tmp/spark_graft_wh")
    p.add_argument("--budget-tokens", type=int, default=1_000_000)
    p.add_argument("--min-quality-ppm", type=int, default=300_000)
    p.add_argument("--lang", default="en")
    p.add_argument("--minhash-k", type=int, default=16)
    p.add_argument("--bands", type=int, default=4)
    p.add_argument("--shingle-n", type=int, default=5)
    p.add_argument("--verify-threshold", type=float, default=0.5)
    p.add_argument("--max-bucket-size", type=int, default=10_000)
    p.add_argument("--watermark", default="1 hour")
    p.add_argument("--max-bucket-members", type=int, default=64)
    p.add_argument("--checkpoint-dir", default=None,
                   help="stream-* steps: streaming checkpoint location "
                        "(default <warehouse>/_ck_<step>)")
    args = p.parse_args(argv)

    from graph500_bfs_spark.session import get_spark

    spark = get_spark(app_name=f"corpus_{args.step}")
    t0 = time.monotonic()
    out_path = f"{args.warehouse}/{args.step.replace('-', '_')}"
    metrics = {"step": args.step, "out": out_path}

    if args.step.startswith("stream-"):
        from graph500_bfs_spark.streaming.dedup import (
            dedup_stream,
            lsh_candidates_stream,
            read_document_stream,
        )
        from graph500_bfs_spark.streaming.edges import drain_available

        stream = read_document_stream(spark, args.docs)
        if args.step == "stream-dedup":
            out = dedup_stream(stream, watermark=args.watermark)
            observed = ("dedup_in", "dedup_out")
        else:
            out = lsh_candidates_stream(
                stream,
                k=args.minhash_k,
                bands=args.bands,
                n=args.shingle_n,
                watermark=args.watermark,
                max_bucket_members=args.max_bucket_members,
            )
            observed = ("lsh_candidates",)
        q = (
            out.writeStream.format("parquet")
            .option("path", out_path)
            .option(
                "checkpointLocation",
                args.checkpoint_dir or f"{args.warehouse}/_ck_{args.step}",
            )
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        drain_available(q, timeout_s=3600)
        for p_ in q.recentProgress:
            for name in observed:
                m = p_.get("observedMetrics", {}).get(name)
                if m:
                    for field, v in m.asDict().items():
                        key = f"{name}.{field}"
                        metrics[key] = metrics.get(key, 0) + int(v or 0)
    else:
        docs = spark.read.parquet(args.docs)
        if args.step == "stats":
            from graph500_bfs_spark.operators.textstats import document_stats

            res = document_stats(docs)
        elif args.step == "exact-dedup":
            from graph500_bfs_spark.operators.dedup import exact_dup_groups

            res = exact_dup_groups(docs)
        elif args.step == "lsh-pairs":
            from graph500_bfs_spark.operators.dedup import minhash_lsh_pairs

            cap_stats = {}
            res = minhash_lsh_pairs(
                docs,
                k=args.minhash_k,
                bands=args.bands,
                n=args.shingle_n,
                verify_threshold=args.verify_threshold,
                max_bucket_size=args.max_bucket_size,
                cap_stats=cap_stats,
            )
            metrics.update(cap_stats)
        elif args.step == "dedup-groups":
            from graph500_bfs_spark.operators.components import connected_components
            from graph500_bfs_spark.operators.dedup import minhash_lsh_pairs
            from graph500_bfs_spark.operators.prep import symmetrize

            pairs = minhash_lsh_pairs(
                docs,
                k=args.minhash_k,
                bands=args.bands,
                n=args.shingle_n,
                verify_threshold=args.verify_threshold,
                max_bucket_size=args.max_bucket_size,
            )
            edges = symmetrize(
                pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
            )
            cc = connected_components(edges)
            res = (
                docs.select("doc_id")
                .join(cc.withColumnRenamed("v", "cv"),
                      F.col("doc_id") == F.col("cv"), "left")
                .select(
                    "doc_id",
                    F.coalesce(F.col("component"), F.col("doc_id")).alias("dup_group"),
                )
            )
        elif args.step == "prep":
            res = _prep(docs, args.lang, args.min_quality_ppm)
        else:  # budget
            from graph500_bfs_spark.operators.textstats import select_token_budget

            res = select_token_budget(
                _prep(docs, args.lang, args.min_quality_ppm), args.budget_tokens
            )
        res.write.mode("overwrite").parquet(out_path)

    # a no-op stream run may emit nothing: an empty sink dir has no schema
    # to infer, and that must not crash the job after a successful ingest
    # (the same guard the linkgraph job's --stream path has)
    try:
        metrics["n_rows"] = spark.read.parquet(out_path).count()
    except Exception:
        metrics["n_rows"] = 0
    metrics["wall_s"] = round(time.monotonic() - t0, 3)
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
