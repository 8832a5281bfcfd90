"""Two-parallelism scaling evidence → BENCH/BASELINE.md (north rule).

Runs the Graph500-style BFS benchmark (Kronecker graph ∪ transcript-derived
edges, harmonic-mean TEPS over sampled roots) at two parallelism levels on
IDENTICAL input and reports throughput at both plus scaling efficiency —
the in-sandbox stand-in for N vs 4N executors (the real cluster path is
``spark-submit --py-files`` with the same code; see README).

Usage: run_scaling.py [scale] [n_roots] [cores_lo] [cores_hi] [mode] [reps]
  mode: join (DataFrame BFS, default) | shm (shared-memory CSR BFS)
        | ms (multi-source batch, shared-dir shipping)
        | msspark (multi-source batch, sc.addFile/SparkFiles shipping —
          the CLUSTER-REAL channel with no shared-FS assumption; the
          staging dir is driver-local only)
        | msmerge (msspark + EXECUTOR-SIDE frontier merge, merge="spark":
          the driver collects only final winners — the fully cluster-real
          configuration with neither a shared FS nor a driver merge hub)
        | msadaptive (msspark + per-superstep merge choice from the exact
          pre-probe candidate bound: driver merge on small steps, executor
          merge on candidate-heavy steps — the shipping default)
        | pagerank | cc | lpa | tri (the north-rule analytics over the
          same graph; throughput = directed edges × supersteps / wall,
          n_roots ignored)
        | sssp (frontier Bellman-Ford over the same graph with the
          endpoint-derived integer weights w=(src+dst)%7+1, one source =
          the min vertex; throughput = directed edges × iterations / wall)

Mirrors the reference's run-benchmark.py orchestration role
(/root/reference/run-benchmark.py:104-200).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, os, shutil, sys, time
import numpy as np
sys.path.insert(0, {repo!r})
# Scaling legs measure the DISTRIBUTED plans: pin the round-6 driver-path
# budget to a cluster-like 2M rows so the whole-graph NumPy fast path never
# swallows a leg (it is core-count-independent and would fake eff=1.0),
# while the CC tail finish — part of the shipped operator and sized by the
# same budget — stays enabled exactly as it would be in production.
os.environ.setdefault("SPARK_GRAFT_DRIVER_GRAPH_ROWS", "2000000")
from pyspark.sql import functions as F
from graph500_bfs_spark.session import get_spark
from graph500_bfs_spark.sources.kronecker import kronecker_edges
from graph500_bfs_spark.sources.transcripts import synthesize_transcripts
from graph500_bfs_spark.sources.edges import derive_edges
from graph500_bfs_spark.operators.prep import symmetrize, out_degrees
from graph500_bfs_spark.operators.bfs import bfs, build_adjacency
from graph500_bfs_spark.operators.csr_shm import bfs_shm, export_blocks
from graph500_bfs_spark.operators.graph500 import sample_roots, teps_stats

cores = int(sys.argv[1])
scale = int(sys.argv[2])
n_roots = int(sys.argv[3])
mode = sys.argv[4]

spark = get_spark(app_name=f"scaling_{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores * 4,
                  extra_conf={{"spark.sql.adaptive.enabled": "false"}})

# identical input at both parallelism levels: Kronecker scale-S edges
# UNION transcript-derived edges (the north-rule graph composition)
kron = kronecker_edges(spark, scale=scale, edgefactor=16)
tr = synthesize_transcripts(spark, n_convs=2000, seed=42)
tedges = derive_edges(tr).select("src", "dst")
edges = kron.unionByName(tedges)
es = symmetrize(edges, dedup=False).repartition(cores * 4, "src").cache()
m_dir = es.count()
deg = out_degrees(es).cache()
n_total = deg.count()

times, nedges = [], []
if mode in ("ms", "msspark", "msmerge", "msadaptive"):
    from graph500_bfs_spark.operators.msbfs import bfs_multi, export_blocks_indexed

    ship = "spark" if mode in ("msspark", "msmerge", "msadaptive") else "dir"
    merge = {{"msmerge": "spark", "msadaptive": "adaptive"}}.get(mode, "driver")
    dp = deg.orderBy("v").toPandas()
    dvs = dp["v"].to_numpy(np.int64); ddeg = dp["deg"].to_numpy(np.int64)
    # msspark: DRIVER-LOCAL staging only — workers get every file through
    # sc.addFile/SparkFiles (one fetch per executor host), so nothing here
    # assumes a shared filesystem
    base_dir = "/tmp" if ship == "spark" else "/dev/shm"
    path = f"{{base_dir}}/g5_{{mode}}_scaling_{{scale}}_{{cores}}"
    shutil.rmtree(path, ignore_errors=True)
    nblocks = max(cores * 2, 16)
    export_blocks_indexed(es, nblocks, path, dvs)
    roots = sample_roots(deg, n_roots, max_vertex=1 << scale)
    res, met = bfs_multi(spark, path, nblocks, roots, (dvs, ddeg), m_dir,
                         ship=ship, merge=merge)  # warm
    res, met = bfs_multi(spark, path, nblocks, roots, (dvs, ddeg), m_dir,
                         ship=ship, merge=merge)
    shutil.rmtree(path, ignore_errors=True)
    print("RESULT " + json.dumps({{
        "cores": cores, "scale": scale, "n_roots": n_roots, "mode": mode,
        "n_vertices": n_total, "m_directed": m_dir,
        "metric": "msbfs_batch_aggregate_TEPS",
        "TEPS": met.teps(),
        "msbfs_batch_aggregate_TEPS": met.teps(),
        "times_s": [met.total_time_s], "traversed_edges": [met.traversed_edges]}}))
    sys.exit(0)
if mode == "sssp":
    from graph500_bfs_spark.operators.sssp import sssp

    # overflow-safe (src + dst) mod 7 (+1): transcript entity ids are
    # hash-derived int64s near the range edge, so add AFTER reducing mod 7
    ew = es.withColumn(
        "w", F.pmod(F.pmod(F.col("src"), F.lit(7)) + F.pmod(F.col("dst"), F.lit(7)), F.lit(7)) + 1
    )
    # root = the max-degree hub (giant component): min(src) can land on a
    # hash-id transcript vertex in a tiny component, making the timed run a
    # 4-iteration fixed-cost probe instead of a real traversal
    root = int(deg.orderBy(F.desc("deg"), F.asc("v")).first()["v"])

    def run_sssp():
        dist, n_iter = sssp(ew, root)
        dist.agg(F.count("*")).collect()
        return n_iter

    run_sssp()  # warm
    t0 = time.time()
    iters = run_sssp()
    wall = time.time() - t0
    print("RESULT " + json.dumps({{
        "cores": cores, "scale": scale, "mode": mode,
        "n_vertices": n_total, "m_directed": m_dir, "supersteps": iters,
        "metric": "processed_edges_per_sec",
        "TEPS": m_dir * iters / wall, "wall_s": wall}}))
    sys.exit(0)
if mode in ("pagerank", "cc", "lpa", "tri"):
    # north-rule analytics legs: same two-parallelism protocol, throughput
    # = directed edges × supersteps / wall (processed-edge rate — the
    # constant factor cancels in the efficiency ratio; what matters is
    # IDENTICAL input and work at both core counts).  One warm run (cache
    # fill), one timed run.
    from graph500_bfs_spark.operators.components import connected_components
    from graph500_bfs_spark.operators.label_propagation import label_propagation
    from graph500_bfs_spark.operators.pagerank import pagerank
    from graph500_bfs_spark.operators.triangles import triangle_count

    def run_analytics():
        if mode == "pagerank":
            pagerank(es, damping=0.85, max_iter=10, tol=None) \
                .agg(F.sum("score")).collect()
            return 10
        if mode == "cc":
            connected_components(es).agg(F.count("*")).collect()
            return 1
        if mode == "lpa":
            label_propagation(es, max_iter=2).agg(F.count("*")).collect()
            return 2
        triangle_count(es)
        return 1

    run_analytics()  # warm
    t0 = time.time()
    iters = run_analytics()
    wall = time.time() - t0
    print("RESULT " + json.dumps({{
        "cores": cores, "scale": scale, "mode": mode,
        "n_vertices": n_total, "m_directed": m_dir, "supersteps": iters,
        "metric": "processed_edges_per_sec",
        "TEPS": m_dir * iters / wall, "wall_s": wall}}))
    sys.exit(0)
if mode == "shm":
    dp = deg.orderBy("v").toPandas()
    dvs = dp["v"].to_numpy(np.int64); ddeg = dp["deg"].to_numpy(np.int64)
    path = f"/dev/shm/g5_scaling_{{scale}}"
    shutil.rmtree(path, ignore_errors=True)
    nblocks = max(cores * 2, 16)
    export_blocks(es, nblocks, path)
    roots = sample_roots(deg, n_roots, max_vertex=1 << scale)
    for r in roots:
        state, met = bfs_shm(spark, path, nblocks, r, (dvs, ddeg), m_dir)
        times.append(met.total_time_s); nedges.append(met.traversed_edges)
    shutil.rmtree(path, ignore_errors=True)
else:
    adj = build_adjacency(es, deg, partitions=cores * 4).cache()
    adj.count()
    roots = sample_roots(deg, n_roots, max_vertex=1 << scale)
    for r in roots:
        state, met = bfs(es, r, degrees=deg, n_vertices=n_total, m_edges=m_dir,
                         adjacency=adj)
        times.append(met.total_time_s); nedges.append(met.traversed_edges)

stats = teps_stats(nedges, times)
print("RESULT " + json.dumps({{
    "cores": cores, "scale": scale, "n_roots": n_roots, "mode": mode,
    "n_vertices": n_total, "m_directed": m_dir,
    "metric": "harmonic_mean_TEPS",
    "TEPS": stats["harmonic_mean_TEPS"],
    "harmonic_mean_TEPS": stats["harmonic_mean_TEPS"],
    "mean_TEPS": stats["mean"], "max_TEPS": stats["max"],
    "times_s": times, "traversed_edges": nedges}}))
"""


def run_one(cores: int, scale: int, n_roots: int, mode: str) -> dict:
    code = WORKER.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(scale), str(n_roots), mode],
        capture_output=True,
        text=True,
        timeout=7200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_roots = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    mode = sys.argv[5] if len(sys.argv) > 5 else "join"
    reps = int(sys.argv[6]) if len(sys.argv) > 6 else 1
    # This VM's throughput swings by 2× on timescales of tens of minutes
    # (documented in BENCH/BASELINE.md §noise), so sequential legs can land
    # in different noise regimes and fake (or hide) scaling.  With reps > 1
    # the legs INTERLEAVE (lo, hi, lo, hi, ...) so both core counts sample
    # the same windows, and the summary uses the per-leg MEDIAN.
    results: dict[int, dict] = {}
    samples: dict[int, list[float]] = {n_lo: [], n_hi: []}
    for rep in range(reps):
        for cores in (n_lo, n_hi):
            t0 = time.time()
            r = run_one(cores, scale, n_roots, mode)
            samples[cores].append(r["TEPS"])
            results[cores] = r  # last rep's detail rows
            print(f"rep{rep} local[{cores}]: TEPS={r['TEPS']:.3e} "
                  f"({time.time()-t0:.0f}s wall)", flush=True)
    med = {c: sorted(v)[len(v) // 2] for c, v in samples.items()}
    t_lo, t_hi = med[n_lo], med[n_hi]
    eff = t_hi / ((n_hi / n_lo) * t_lo)
    gteps = t_hi / 1e9
    # SPARK_GRAFT_SCALING_TAG (e.g. "_r6code") re-anchors a point without
    # overwriting the prior round's recorded artifact
    tag = os.environ.get("SPARK_GRAFT_SCALING_TAG", "")
    out = REPO / "BENCH" / f"scaling_{mode}_s{scale}_r{n_roots}_{n_lo}v{n_hi}{tag}.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps({"results": results, "efficiency": eff, "gteps_hi": gteps,
                               "reps": reps, "teps_samples": samples,
                               "teps_median": med}, indent=2))
    print(f"efficiency={eff:.3f} gteps_hi={gteps:.4f} → {out}")


if __name__ == "__main__":
    main()
