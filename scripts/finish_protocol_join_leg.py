"""Finish an interrupted large-scale protocol run: assemble the final
BENCH/protocol{R}_s{scale}.json from the per-root ProtocolLog, then run the
strategy-flip evidence leg (join BFS on root0) with a DISK-LEAN adjacency.

Why this exists: at scale 26 the stock ``build_adjacency`` plan shuffles the
2.1e9-row edge table twice (degree joins) plus a repartition plus the cache
spill — past this box's ~80 GB of free disk (measured ENOSPC twice).  The
lean adjacency here (a) broadcasts the 38M-row degree table into both joins
(one explicit ``F.broadcast`` — ~0.6 GB, map-side, zero edge exchanges),
(b) keeps every column int32 (exact through scale 31 — halves shuffle and
cache bytes), and (c) pays exactly ONE exchange: the pre-partition on src
that the superstep loop reuses.  On a real cluster none of this is needed —
it is the single-box disk budget talking — but the PLAN SHAPE (broadcast
dim join + one co-located partitioning reused across supersteps) is the
100 TB shape anyway.

Usage: finish_protocol_join_leg.py [scale] [n_roots] [cores] [--bank-only]

``--bank-only`` assembles the final JSON (timed stats + the checksum and
dispatch lines parsed from the interrupted run's .out) without launching
Spark — used to bank the evidence before re-attempting the join leg.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from graph500_bfs_spark.operators.bfs import bfs as join_bfs  # noqa: E402
from graph500_bfs_spark.operators.graph500 import PF_NEDGE, teps_stats  # noqa: E402
from graph500_bfs_spark.operators.msbfs import driver_state_bytes  # noqa: E402
from graph500_bfs_spark.operators.prep import out_degrees, symmetrize  # noqa: E402
from graph500_bfs_spark.session import get_spark  # noqa: E402
from graph500_bfs_spark.sources.kronecker import kronecker_edges  # noqa: E402


def main():
    bank_only = "--bank-only" in sys.argv
    argv = [a for a in sys.argv if a != "--bank-only"]
    scale = int(argv[1]) if len(argv) > 1 else 26
    n_roots = int(argv[2]) if len(argv) > 2 else 64
    cores = int(argv[3]) if len(argv) > 3 else 32

    log_path = REPO / "BENCH" / f"protocol{n_roots}_s{scale}.log.jsonl"
    rows = [json.loads(ln) for ln in log_path.read_text().splitlines() if ln.strip()]
    header = rows[0]
    assert header["kind"] == "header" and header["scale"] == scale
    roots_rec = {r["i"]: r for r in rows[1:] if r.get("kind") == "root"}
    assert len(roots_rec) == n_roots, f"log has {len(roots_rec)}/{n_roots} roots"
    times = [roots_rec[i]["time_s"] for i in range(n_roots)]
    traversed0 = int(roots_rec[0]["traversed_edges"])
    expected = PF_NEDGE.get(scale)

    # the root0 validation-level-1 checksum line from the interrupted run:
    # "root0 traversed=T +loops=L = C vs pf_nedge[s]=E match=True"
    out_log = (REPO / "BENCH" / f"protocol{n_roots}_s{scale}.out").read_text(
        errors="replace"
    )
    import re

    mchk = re.search(
        r"root0 traversed=(\d+) \+loops=(\d+) = (\d+) vs pf_nedge\[\d+\]=(\d+) "
        r"match=(True|False)",
        out_log,
    )
    assert mchk, "checksum line not found in .out log"
    chk_measured, chk_expected = int(mchk.group(3)), int(mchk.group(4))
    chk_match = mchk.group(5) == "True" and chk_measured == chk_expected

    # the dispatch line the timed run printed before its first root:
    # "dispatch: {'driver_memory_budget': ..., 'batch_strategy': 'join', ...}"
    mdis = re.search(r"dispatch: (\{[^}]*\})", out_log)
    dispatch = eval(mdis.group(1), {"__builtins__": {}}) if mdis else None  # noqa: S307

    # step 1: bank the timed protocol + checksum + dispatch BEFORE
    # attempting the join leg (which has ENOSPC'd on this box)
    stats = teps_stats([expected] * n_roots, times)
    out = {
        "scale": scale,
        "edgefactor": 16,
        "n_roots": n_roots,
        "cores": header.get("cores", cores),
        "bfs_times_s": [round(t, 4) for t in times],
        "harmonic_mean_TEPS": stats["harmonic_mean_TEPS"],
        "harmonic_stddev_TEPS": stats["harmonic_stddev_TEPS"],
        "min_TEPS": stats["min"],
        "max_TEPS": stats["max"],
        "pf_nedge_checksum": {
            "measured": chk_measured,
            "expected": chk_expected,
            "match": chk_match,
            "note": "root0 msbfs traversed + self-loop slots at reached "
                    "vertices, from the timed run's validation line",
        },
        "dispatch": dispatch,
    }
    dest = REPO / "BENCH" / f"protocol{n_roots}_s{scale}.json"
    dest.write_text(json.dumps(out, indent=2))
    print(f"banked timed protocol → {dest}")
    if bank_only:
        return

    spark = get_spark(
        app_name=f"finish_s{scale}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 4,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            # disk budget: zstd shuffle/spill blocks are ~35% smaller than
            # lz4 on these int32 edge rows — the difference between the
            # peak superstep fitting this box's free disk or ENOSPC
            "spark.io.compression.codec": "zstd",
            "spark.cleaner.periodicGC.interval": "30s",
        },
    )

    t_con = time.time()
    kron = kronecker_edges(spark, scale=scale, edgefactor=16)
    loop_slots = (
        kron.filter(F.col("src") == F.col("dst")).count()
    )
    m_dir = 2 * ((1 << scale) * 16 - loop_slots)
    es = symmetrize(kron, dedup=False).select(
        F.col("src").cast("int").alias("src"),
        F.col("dst").cast("int").alias("dst"),
    )
    dp = out_degrees(es).orderBy("v").toPandas()
    n_total = len(dp)
    deg = spark.createDataFrame(dp, "v long, deg long").cache()
    deg.count()
    # lean adjacency: broadcast degree dim (int32), ONE exchange (the
    # pre-partition on src the superstep loop reuses), int32 throughout
    d32 = F.broadcast(
        deg.select(F.col("v").cast("int").alias("v"), F.col("deg").cast("int").alias("deg"))
    )
    adj = (
        es.join(d32.select(F.col("v").alias("_sv"), F.col("deg").alias("sdeg")),
                es["src"] == F.col("_sv"))
        .join(d32.select(F.col("v").alias("_dv"), F.col("deg").alias("ddeg")),
              es["dst"] == F.col("_dv"))
        .select("src", "dst", "sdeg", "ddeg")
        .repartition(cores * 4, "src")
        # clustering by src makes the columnar cache's src/sdeg columns
        # RLE/delta-encodable (hash partitioning is preserved; the sort adds
        # ~nothing to construction but halves the cache's disk spill)
        .sortWithinPartitions("src")
        .cache()
    )
    adj.count()
    construction_s = time.time() - t_con
    print(f"lean adjacency ready in {construction_s:.0f}s")

    root0 = int(header["roots"][0])
    t_j = time.time()
    _, met_j = join_bfs(
        es, root0, degrees=deg, n_vertices=n_total, m_edges=m_dir, adjacency=adj
    )
    join_s = time.time() - t_j
    out.update(
        {
            "n_vertices": n_total,
            "m_directed": int(m_dir),
            "dispatch": {
                "driver_memory_budget": 8 << 30,
                "batch_need_bytes": int(driver_state_bytes(n_total, n_roots)),
                "single_root_need_bytes": int(driver_state_bytes(n_total, 1)),
                "batch_strategy": "join",
                "per_root_strategy": "msbfs",
            },
            "batch_leg": "strategy_flip_join",
            "join_root0_wall_s": round(join_s, 3),
            "join_root0_TEPS": expected / join_s,
            "join_root0_traversed_edges": int(met_j.traversed_edges),
            "join_matches_msbfs_traversed": bool(
                met_j.traversed_edges == traversed0
            ),
        }
    )
    dest.write_text(json.dumps(out, indent=2))
    print(json.dumps({k: v for k, v in out.items() if k != "bfs_times_s"}, indent=2))
    print(f"→ {dest}")


if __name__ == "__main__":
    main()
