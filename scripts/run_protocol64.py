"""Full Graph500 64-root protocol run at scale 22 → BENCH/protocol64_s22.json.

Mirrors /root/reference/mpi/main.cc:393-714 with validation_level=1
semantics (mpi/main.cc:644-660): the FIRST root's result is checked against
the pf_nedge[scale] traversed-edge checksum (mpi/utils.hpp:3687-3733), then
every root's TEPS uses that count over its own measured wall time
(perf[i] = pf_nedge[SCALE] / t, mpi/main.cc:327).

The edge stream is the bit-exact Graph500 generator (sources/mrg.py) and the
64 roots come from the exact find_roots protocol, so every number here is
directly comparable to a reference run at the same scale.

Usage: run_protocol64.py [scale] [n_roots] [cores]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from graph500_bfs_spark.operators.graph500 import (  # noqa: E402
    NUM_BFS_ROOTS,
    PF_NEDGE,
    run_timed_roots,
    sample_roots_spec,
    teps_stats,
)
from graph500_bfs_spark.plans.checkpoint import ProtocolLog  # noqa: E402
from graph500_bfs_spark.operators.msbfs import bfs_multi, export_blocks_indexed  # noqa: E402
from graph500_bfs_spark.operators.prep import out_degrees, symmetrize  # noqa: E402
from graph500_bfs_spark.session import get_spark  # noqa: E402
from graph500_bfs_spark.sources.kronecker import kronecker_edges  # noqa: E402



def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n_roots = int(sys.argv[2]) if len(sys.argv) > 2 else NUM_BFS_ROOTS
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    spark = get_spark(
        app_name=f"protocol64_s{scale}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 4,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    from pyspark.sql import functions as F

    t_con = time.time()
    kron = kronecker_edges(spark, scale=scale, edgefactor=16)
    # Disk-lean construction past scale 23: at scale 26 the straightforward
    # cache+count+degree+blocks pipeline writes cache spill (~25 GB) plus a
    # repartition exchange, a degree exchange, and the block-build exchange
    # with its sort spills — measured ENOSPC on this box's ~70 GB of free
    # disk.  The lean path (a) never caches the 2·m edge list (each pass
    # regenerates the bit-exact stream — CPU, not disk), (b) derives
    # m_directed arithmetically (symmetrize(dedup=False) = every slot minus
    # self-loop slots, doubled — the loop counts are needed for the checksum
    # anyway), (c) runs construction shuffles over int32 vertex ids (exact
    # for scale ≤ 31 — halves every shuffle byte), and (d) drops the
    # cosmetic pre-repartition (generator partitions are already balanced).
    lean = scale >= 24
    # self-loop slot counts per vertex (symmetrize drops them; the pf_nedge
    # checksum counts every generated slot at a reached vertex incl. loops)
    loops = {
        int(r["src"]): int(r["n"])
        for r in kron.filter(F.col("src") == F.col("dst"))
        .groupBy("src")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    if lean:
        m_dir = 2 * ((1 << scale) * 16 - sum(loops.values()))
        es = symmetrize(kron, dedup=False).select(
            F.col("src").cast("int").alias("src"),
            F.col("dst").cast("int").alias("dst"),
        )
        dp = out_degrees(es).orderBy("v").toPandas()
        # rebuild the degree table driver-backed (38M rows ≈ 0.6 GB at s26)
        # so root sampling / the join leg never re-derive it from the
        # uncached 2·m stream
        deg = spark.createDataFrame(dp, "v long, deg long").cache()
        deg.count()
    else:
        es = symmetrize(kron, dedup=False).repartition(cores * 4, "src").cache()
        m_dir = es.count()
        deg = out_degrees(es).cache()
        dp = deg.orderBy("v").toPandas()
    dvs = dp["v"].to_numpy(np.int64)
    ddeg = dp["deg"].to_numpy(np.int64)
    construction_s = time.time() - t_con

    path = f"/dev/shm/g5_proto_s{scale}"
    shutil.rmtree(path, ignore_errors=True)
    # Block count scales with the graph, not the core count: each block is
    # one applyInPandas group during construction (≈ m/nblocks edges held in
    # one pandas frame), so at scale 26 (2.1e9 directed edges) 32 blocks
    # would mean ~540 MB Arrow cells — 128 keeps groups near 17M edges.
    nblocks = (
        int(sys.argv[4]) if len(sys.argv) > 4
        else max(cores, 16, 1 << max(0, scale - 19))
    )
    export_blocks_indexed(es, nblocks, path, dvs)
    roots = sample_roots_spec(deg, scale, n_roots)
    print(f"construction {construction_s:.0f}s; {len(roots)} protocol roots")

    # budget dispatch (operators/msbfs.driver_state_bytes): at large scale
    # the R-concurrent msbfs batch blows the driver budget BY DESIGN and
    # the dispatcher's beyond-budget strategy is the join BFS; single-root
    # msbfs stays in budget, so the per-root timed protocol keeps the
    # high-TEPS path.  Both decisions are recorded, and when the batch is
    # over budget the flip is EVIDENCED by running root0 through the join
    # path and checking it traverses the same edge count.
    from graph500_bfs_spark.operators.msbfs import driver_state_bytes

    budget = 8 << 30
    need_batch = driver_state_bytes(len(dvs), len(roots))
    need_single = driver_state_bytes(len(dvs), 1)
    dispatch = {
        "driver_memory_budget": budget,
        "batch_need_bytes": int(need_batch),
        "single_root_need_bytes": int(need_single),
        "batch_strategy": "msbfs" if need_batch <= budget else "join",
        "per_root_strategy": "msbfs" if need_single <= budget else "join",
    }
    print(f"dispatch: {dispatch}")

    # validation_level=1: first root full traversed-edge checksum
    res, met0 = bfs_multi(spark, path, nblocks, [roots[0]], (dvs, ddeg), m_dir)
    reached = {int(v) for v in res[roots[0]].select("v").toPandas()["v"]}
    loop_slots = sum(n for v, n in loops.items() if v in reached)
    checksum = met0.traversed_edges + loop_slots
    expected = PF_NEDGE.get(scale)
    print(f"root0 traversed={met0.traversed_edges} +loops={loop_slots} "
          f"= {checksum} vs pf_nedge[{scale}]={expected} "
          f"match={checksum == expected}")

    # timed per-root runs (warm after root0); TEPS = pf_nedge/t per spec.
    # Per-root resume (reference LOGFILE, mpi/main.cc:404-405): a killed run
    # restarted with the same scale/roots skips completed roots via the log.
    log = ProtocolLog(
        str(REPO / "BENCH" / f"protocol{n_roots}_s{scale}.log.jsonl"),
        {"scale": scale, "n_roots": n_roots, "cores": cores,
         "roots": [int(r) for r in roots]},
    )
    done_before = len(log.completed)
    if done_before:
        print(f"resuming: {done_before}/{len(roots)} roots already recorded")
    times = run_timed_roots(spark, path, nblocks, roots, (dvs, ddeg), m_dir, log=log)
    edge_count = checksum if expected is None else expected
    stats = teps_stats([edge_count] * len(roots), times)

    # batch-aggregate leg (all roots concurrently, MS-BFS) — only when the
    # R-concurrent driver state fits the budget; past it, the dispatcher's
    # strategy is the join BFS, evidenced on root0
    batch_leg: dict = {}
    if need_batch <= budget:
        _, metb = bfs_multi(spark, path, nblocks, roots, (dvs, ddeg), m_dir)  # warm
        _, metb = bfs_multi(spark, path, nblocks, roots, (dvs, ddeg), m_dir)
        batch_leg = {
            "msbfs_batch_aggregate_TEPS": metb.teps(),
            "msbfs_batch_wall_s": round(metb.total_time_s, 3),
        }
    else:
        from pyspark import StorageLevel

        from graph500_bfs_spark.operators.bfs import bfs as join_bfs

        if lean:
            # the join BFS re-scans the edge table every superstep; persist
            # it columnar-compressed on disk for this leg only (~15-20 GB at
            # s26 — the construction spills that forced the lean path are
            # long gone by now)
            es = es.persist(StorageLevel.DISK_ONLY)
        t_j = time.time()
        state_j, met_j = join_bfs(
            es, roots[0], degrees=deg, n_vertices=int(len(dvs)), m_edges=m_dir
        )
        join_s = time.time() - t_j
        batch_leg = {
            "batch_leg": "strategy_flip_join",
            "join_root0_wall_s": round(join_s, 3),
            "join_root0_TEPS": (edge_count / join_s),
            "join_root0_traversed_edges": int(met_j.traversed_edges),
            "join_matches_msbfs_traversed": bool(
                met_j.traversed_edges == met0.traversed_edges
            ),
        }
    shutil.rmtree(path, ignore_errors=True)

    out = {
        "scale": scale,
        "edgefactor": 16,
        "n_roots": len(roots),
        "cores": cores,
        "n_vertices": int(len(dvs)),
        "m_directed": int(m_dir),
        "construction_s": round(construction_s, 1),
        "pf_nedge_checksum": {
            "measured": int(checksum),
            "expected": expected,
            "match": bool(checksum == expected),
        },
        "bfs_times_s": [round(t, 4) for t in times],
        "harmonic_mean_TEPS": stats["harmonic_mean_TEPS"],
        "harmonic_stddev_TEPS": stats["harmonic_stddev_TEPS"],
        "min_TEPS": stats["min"],
        "max_TEPS": stats["max"],
        "dispatch": dispatch,
        **batch_leg,
    }
    dest = REPO / "BENCH" / f"protocol{n_roots}_s{scale}.json"
    dest.write_text(json.dumps(out, indent=2))
    print(json.dumps({k: v for k, v in out.items() if k != "bfs_times_s"}, indent=2))
    print(f"→ {dest}")


if __name__ == "__main__":
    main()
