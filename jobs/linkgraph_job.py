"""Cluster job entry point — ``spark-submit --py-files graph500_bfs_spark.zip
jobs/linkgraph_job.py <algo> [options]`` (north-rule shipping contract).

Algorithms: derive-edges | bfs | corebfs | pagerank | cc | lpa | triangles |
graph500.  Input is either a transcript table (parquet/Iceberg path) or a
generated Kronecker graph; results and per-superstep metrics land in the
warehouse (Iceberg catalog if configured, parquet dirs otherwise).

Example (cluster):
    spark-submit --master yarn --num-executors 256 \\
        --py-files graph500_bfs_spark.zip jobs/linkgraph_job.py \\
        bfs --transcripts s3://bucket/transcripts --root auto \\
        --warehouse s3://bucket/wh --checkpoint-dir s3://bucket/ck

Example (local sandbox):
    python jobs/linkgraph_job.py graph500 --scale 16 --roots 4
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("algo", choices=[
        "derive-edges", "bfs", "msbfs", "corebfs", "pagerank", "cc", "lpa",
        "triangles", "graph500", "sssp",
    ])
    p.add_argument("--transcripts", help="transcript table path (input_hint schema)")
    p.add_argument("--edges", help="pre-derived edge table path (src,dst)")
    p.add_argument("--scale", type=int, default=16, help="Kronecker scale if no input")
    p.add_argument("--edgefactor", type=int, default=16)
    p.add_argument("--roots", type=int, default=4)
    p.add_argument("--root", default="auto")
    p.add_argument("--warehouse", default="/tmp/spark_graft_wh")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--run-id", default=None)
    p.add_argument("--max-iter", type=int, default=50)
    p.add_argument("--validation-level", type=int, choices=(0, 1, 2), default=None,
                   help="Graph500 -v: 0 pf_nedge table, 1 first-root, 2 every root")
    p.add_argument("--real-benchmark", action="store_true",
                   help="Graph500 -R spec bundle: forces 64 roots, "
                        "validation level 2, and a pre-exec warm-up")
    p.add_argument("--stream", action="store_true",
                   help="derive-edges only: incremental (availableNow) "
                        "derivation of new transcript files into "
                        "<warehouse>/edges_stream, resumable via the "
                        "streaming checkpoint")
    p.add_argument("--ship", choices=("dir", "spark"), default="spark",
                   help="msbfs CSR/bitmap channel: 'spark' = sc.addFile/SparkFiles "
                        "(cluster-real, no shared FS); 'dir' = shared directory")
    p.add_argument("--merge", choices=("driver", "spark", "adaptive"),
                   default="adaptive",
                   help="msbfs frontier merge: 'adaptive' (default) picks per "
                        "superstep from the exact pre-probe candidate bound -- "
                        "driver-side numpy merge below the byte threshold (no "
                        "shuffle stage), executor-side groupBy(r,vi).min(parent) "
                        "above it (driver collects only final winners); "
                        "'driver'/'spark' force one mode")
    p.add_argument("--blocks-dir", default="/tmp/g5_blocks",
                   help="msbfs CSR staging dir (driver-local under --ship spark)")
    p.add_argument("--driver-memory-budget", type=int, default=8 << 30,
                   help="msbfs driver-state budget in bytes (driver_state_bytes "
                        "formula); past it msbfs refuses and the join BFS is the "
                        "strategy — see operators/msbfs.bfs_roots")
    args = p.parse_args(argv)

    from graph500_bfs_spark.plans.checkpoint import CheckpointManager
    from graph500_bfs_spark.plans.warehouse import Warehouse
    from graph500_bfs_spark.session import get_spark

    spark = get_spark(app_name=f"linkgraph_{args.algo}")
    wh = Warehouse(spark, args.warehouse)
    ck = CheckpointManager(args.checkpoint_dir, spark) if args.checkpoint_dir else None

    from graph500_bfs_spark.operators.prep import out_degrees, symmetrize

    def load_edges():
        if args.edges:
            return spark.read.parquet(args.edges).select("src", "dst")
        if args.transcripts:
            from graph500_bfs_spark.sources.edges import derive_edges

            t = spark.read.parquet(args.transcripts)
            return derive_edges(t).select("src", "dst")
        from graph500_bfs_spark.sources.kronecker import kronecker_edges

        return kronecker_edges(spark, args.scale, args.edgefactor)

    t0 = time.perf_counter()
    result = {"algo": args.algo}

    if args.algo == "derive-edges":
        if args.stream:
            # incremental ingest: derive edges only for NEW transcript files
            # (streaming/edges.py — per-conversation state, stream ≡ batch);
            # re-running with the same checkpoint dir processes only files
            # added since the last run
            import os

            from graph500_bfs_spark.streaming.edges import (
                derive_edges_stream,
                drain_available,
                read_transcript_stream,
            )

            out_path = os.path.join(args.warehouse, "edges_stream")
            ck = args.checkpoint_dir or os.path.join(args.warehouse, "_edges_stream_ck")
            q = (
                derive_edges_stream(read_transcript_stream(spark, args.transcripts))
                .writeStream.format("parquet")
                .option("path", out_path)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            result["stream_self_terminated"] = drain_available(q)
            # observed drop counts (late/duplicate turns) from the last batch
            # that reported them — the streaming analog of dedup cap_stats
            dropped = 0
            for prog in q.recentProgress:
                om = (prog or {}).get("observedMetrics") or {}
                if "edge_deriver" in om:
                    dropped += int(om["edge_deriver"].get("dropped_turns") or 0)
            result["dropped_turns"] = dropped
            # a no-op ingest (no new files) emits nothing: an empty/missing
            # output dir has no inferable schema, so read with the explicit
            # edge schema and report 0 rather than crash after success
            from graph500_bfs_spark.streaming.edges import EDGE_SCHEMA

            if os.path.isdir(out_path):
                result["n_edges"] = (
                    spark.read.schema(EDGE_SCHEMA).parquet(out_path).count()
                )
            else:
                result["n_edges"] = 0
        else:
            from graph500_bfs_spark.sources.edges import derive_edges, derive_vertices

            t = spark.read.parquet(args.transcripts)
            e = derive_edges(t)
            wh.write("edges", e)
            wh.write("vertices", derive_vertices(t))
            result["n_edges"] = wh.read("edges").count()
    elif args.algo == "graph500":
        from graph500_bfs_spark.operators.graph500 import run_graph500_benchmark

        result.update(run_graph500_benchmark(
            spark, args.scale, args.edgefactor, args.roots,
            validation_level=args.validation_level,
            real_benchmark=args.real_benchmark,
        ))
    elif args.algo == "msbfs":
        # multi-source batch over the protocol roots, CSR + bitmaps shipped
        # through the channel picked by --ship (default: Spark file server —
        # cluster-real, no shared-filesystem assumption)
        import shutil

        import numpy as np

        from graph500_bfs_spark.operators.graph500 import sample_roots
        from graph500_bfs_spark.operators.msbfs import (
            bfs_multi,
            driver_state_bytes,
            export_blocks_indexed,
        )

        es = symmetrize(load_edges(), dedup=False).cache()
        m = es.count()
        deg = out_degrees(es).cache()
        n_total = deg.count()
        need = driver_state_bytes(n_total, args.roots, merge=args.merge)
        if need > args.driver_memory_budget:
            raise SystemExit(
                f"msbfs driver state would need ~{need} bytes for "
                f"{args.roots} roots x {n_total} vertices, over the "
                f"--driver-memory-budget ({args.driver_memory_budget} bytes). "
                f"Run `bfs` (the join strategy — nothing driver-resident "
                f"scales with |V|) or raise the budget."
            )
        dp = deg.orderBy("v").toPandas()
        dvs = dp["v"].to_numpy(np.int64)
        ddeg = dp["deg"].to_numpy(np.int64)
        shutil.rmtree(args.blocks_dir, ignore_errors=True)
        nblocks = max(spark.sparkContext.defaultParallelism, 16)
        export_blocks_indexed(es, nblocks, args.blocks_dir, dvs)
        roots = sample_roots(deg, args.roots, max_vertex=1 << args.scale)
        res, met = bfs_multi(spark, args.blocks_dir, nblocks, roots,
                             (dvs, ddeg), m, ship=args.ship, merge=args.merge,
                             checkpoint_dir=args.checkpoint_dir)
        for r, state in res.items():
            wh.write(f"msbfs_root_{r}", state)
        result.update({
            "roots": [int(r) for r in roots], "ship": args.ship,
            "merge": args.merge,
            "batch_aggregate_teps": met.teps(),
            "traversed_edges": met.traversed_edges,
            "supersteps": len(met.supersteps),
        })
    else:
        es = symmetrize(load_edges()).cache()
        if args.algo in ("bfs", "corebfs"):
            deg = out_degrees(es).cache()
            root = (
                int(deg.orderBy(F.desc("deg")).limit(1).collect()[0]["v"])
                if args.root == "auto"
                else int(args.root)
            )
            if args.algo == "bfs":
                from graph500_bfs_spark.operators.bfs import bfs

                state, met = bfs(
                    es, root, degrees=deg, checkpointer=ck,
                    run_id=args.run_id or f"bfs_{root}", resume=args.resume,
                )
            else:
                from graph500_bfs_spark.operators.components import bfs_with_corebfs

                state, met = bfs_with_corebfs(es, root)
            wh.write("bfs_result", state)
            result.update({"root": root, "reached": state.count(),
                           "teps": met.teps(), "supersteps": len(met.supersteps)})
        elif args.algo == "pagerank":
            from graph500_bfs_spark.operators.pagerank import pagerank

            pr = pagerank(es, max_iter=args.max_iter, tol=1e-8,
                          checkpointer=ck, run_id=args.run_id or "pagerank")
            wh.write("pagerank", pr)
            result["n_vertices"] = pr.count()
        elif args.algo == "cc":
            from graph500_bfs_spark.operators.components import connected_components

            cc = connected_components(es)
            wh.write("components", cc)
            result["n_components"] = cc.select("component").distinct().count()
        elif args.algo == "lpa":
            from graph500_bfs_spark.operators.label_propagation import label_propagation

            lp = label_propagation(es, max_iter=args.max_iter)
            wh.write("labels", lp)
            result["n_labels"] = lp.select("label").distinct().count()
        elif args.algo == "sssp":
            from graph500_bfs_spark.operators.sssp import sssp

            if args.edges or args.transcripts:
                # no weight column in external inputs: endpoint-derived
                # symmetric integer weights (same recipe the gate oracles)
                ew = es.withColumn("w", (F.col("src") + F.col("dst")) % 7 + 1)
            else:
                from graph500_bfs_spark.sources.kronecker import (
                    kronecker_edges_weighted,
                )

                w_e = kronecker_edges_weighted(spark, args.scale, args.edgefactor)
                pairs = w_e.filter(F.col("src") != F.col("dst")).groupBy(
                    "src", "dst"
                ).agg(F.min("w").alias("w"))
                ew = pairs.unionByName(
                    pairs.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst"), "w")
                ).groupBy("src", "dst").agg(F.min("w").alias("w")).cache()
            deg = out_degrees(ew.select("src", "dst")).cache()
            root = (
                int(deg.orderBy(F.desc("deg")).limit(1).collect()[0]["v"])
                if args.root == "auto"
                else int(args.root)
            )
            dist, n_iter = sssp(ew, root)
            wh.write("sssp_dist", dist)
            result.update({"root": root, "reached": dist.count(),
                           "iterations": n_iter})
        elif args.algo == "triangles":
            from graph500_bfs_spark.operators.triangles import triangle_count

            result["n_triangles"] = triangle_count(es)

    result["elapsed_s"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
