"""Benchmark harness — one JSON line with per-query seconds.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].  Scaling evidence
(local[8] vs local[32]) is produced by scripts/run_scaling.py →
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from graph500_bfs_spark import gate  # noqa: E402
from graph500_bfs_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "edges_symmetrize",
    "degree_top100",
    "bfs_levels",
    "pagerank10",
    "triangle_count",
    "connected_components_snr",
    "label_propagation_snr",
]


def run(sf_dir: str, master: str | None = None) -> dict:
    spark = get_spark(app_name="bench", master=master)
    queries = {
        "edges_symmetrize": gate.q_edges_symmetrize,
        "degree_top100": gate.q_degree_top100,
        "bfs_levels": gate.q_bfs_levels,
        "pagerank10": gate.q_pagerank10,
        "triangle_count": gate.q_triangle_count,
        "connected_components_snr": gate.q_connected_components_snr,
        "label_propagation_snr": gate.q_label_propagation_snr,
    }
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        if name == "bfs_levels":
            extras["bfs_reached"] = n
        spark.catalog.clearCache()  # queries are independent; drop leftovers
    # headline GTEPS: Graph500-protocol multi-source BFS batch on a
    # Kronecker graph (scale 18 keeps the per-round bench fast; the full
    # scale-22 ladder lives in BENCH/BASELINE.md)
    try:
        import shutil

        import numpy as np

        from graph500_bfs_spark.operators.graph500 import sample_roots_spec, teps_stats
        from graph500_bfs_spark.operators.msbfs import bfs_multi, export_blocks_indexed
        from graph500_bfs_spark.operators.prep import out_degrees, symmetrize
        from graph500_bfs_spark.sources.kronecker import kronecker_edges

        scale = 18
        # bit-exact Graph500 edge stream (sources/mrg.py) — spec-comparable
        es = symmetrize(kronecker_edges(spark, scale), dedup=False).cache()
        m = es.count()
        deg = out_degrees(es).cache()
        dp = deg.orderBy("v").toPandas()
        dvs = dp["v"].to_numpy(np.int64)
        ddeg = dp["deg"].to_numpy(np.int64)
        # ship="dir" + merge="driver" here: the per-round bench is a
        # SINGLE-NODE number kept comparable across rounds (merge="driver"
        # was the implicit default through round 4; round 5 made "adaptive"
        # the shipping default, which flips peak supersteps to the executor
        # merge — correct at cluster scale, a measured toll at scale 18 on
        # one node).  The cluster-real channel (ship="spark", sc.addFile/
        # SparkFiles — bit-identical results, no shared-FS assumption) is
        # benchmarked separately at scale 22 where its overhead is nil:
        # BENCH/scaling_msspark_s22_r32_1v4.json eff 0.811; the adaptive
        # merge's own scaling point is BENCH/scaling_msadaptive_s22_*.json.
        shm = "/dev/shm/g5_bench"
        shutil.rmtree(shm, ignore_errors=True)
        export_blocks_indexed(es, 32, shm, dvs)
        roots = sample_roots_spec(deg, scale, 16)  # TEST_BFS_ROOTS, parameters.h:89
        _, met = bfs_multi(spark, shm, 32, roots, (dvs, ddeg), m, merge="driver")  # warm
        _, met = bfs_multi(spark, shm, 32, roots, (dvs, ddeg), m, merge="driver")
        # multi-source BATCH-AGGREGATE throughput (Σ traversed edges over
        # concurrent roots / shared wall): NOT spec-comparable to per-root
        # Graph500 TEPS — named accordingly
        extras["msbfs_batch_agg_gteps_scale18"] = round(met.teps() / 1e9, 5)
        timings["msbfs_scale18_batch"] = round(met.total_time_s, 3)
        # spec-comparable leg: per-root single-source runs, harmonic-mean
        # TEPS with Norris stddev (reference logfile.h protocol)
        times, nedges = [], []
        for r in roots:
            _, met1 = bfs_multi(spark, shm, 32, [r], (dvs, ddeg), m, merge="driver")
            times.append(met1.total_time_s)
            nedges.append(met1.traversed_edges)
        st = teps_stats(nedges, times)
        extras["bfs_harmonic_mean_gteps_scale18"] = round(st["harmonic_mean_TEPS"] / 1e9, 5)
        extras["bfs_harmonic_stddev_gteps_scale18"] = round(
            st["harmonic_stddev_TEPS"] / 1e9, 5
        )
        extras["n_roots_scale18"] = len(roots)
        shutil.rmtree(shm, ignore_errors=True)
    except Exception as exc:  # never fail the bench on the extra leg
        extras["bfs_gteps_error"] = str(exc)[:200]

    sf = sf_dir.rstrip("/").split("sf")[-1]
    return {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **extras,
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    result = run(sf_dir)
    print(json.dumps(result))
