"""Same-session merge-mode comparison for the MS-BFS batch at scale 22.

The round-4 verdict flagged the executor merge's 2.6x absolute toll from
CROSS-RUN comparisons; round 5's first msadaptive scaling attempt was
contaminated by concurrent load on the box.  The defensible number is the
same-session interleave: one Spark session, one graph, one CSR export,
modes rotated rep by rep, so environment drift hits every mode equally.

Records per mode: batch wall, batch-aggregate GTEPS, and the per-step
merge-mode distribution (for "adaptive", how many steps actually flipped).

Usage:  python scripts/ab_merge_modes.py [scale] [n_roots] [reps] [adaptive_merge_bytes]
Writes: BENCH/ab_merge_modes_s{scale}_r{n_roots}[_amb{MiB}m].json

Round 6 (verdict #3): the optional ``adaptive_merge_bytes`` argument lowers
the adaptive flip threshold for ONE recorded run so a candidate-heavy step
actually crosses it mid-batch and ``step_modes`` shows a mixed histogram —
the flip path exercised on record, clearly labeled as a lowered-threshold
run (the default 1 GiB stays the shipping value).
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from graph500_bfs_spark.operators.graph500 import sample_roots  # noqa: E402
from graph500_bfs_spark.operators.msbfs import bfs_multi, export_blocks_indexed  # noqa: E402
from graph500_bfs_spark.operators.prep import out_degrees, symmetrize  # noqa: E402
from graph500_bfs_spark.session import get_spark  # noqa: E402
from graph500_bfs_spark.sources.kronecker import kronecker_edges  # noqa: E402

MODES = ("driver", "spark", "adaptive")


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n_roots = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    amb = int(sys.argv[4]) if len(sys.argv) > 4 else (1 << 30)
    repo = Path(__file__).resolve().parents[1]

    spark = get_spark(app_name="ab_merge_modes")
    es = symmetrize(kronecker_edges(spark, scale), dedup=False).cache()
    m = es.count()
    deg = out_degrees(es).cache()
    dp = deg.orderBy("v").toPandas()
    dvs = dp["v"].to_numpy(np.int64)
    ddeg = dp["deg"].to_numpy(np.int64)
    shm = f"/dev/shm/g5_abmerge_s{scale}"
    shutil.rmtree(shm, ignore_errors=True)
    export_blocks_indexed(es, 32, shm, dvs)
    roots = sample_roots(deg, n_roots, max_vertex=1 << scale)

    bfs_multi(spark, shm, 32, roots, (dvs, ddeg), m, merge="driver")  # warm

    out = {"scale": scale, "n_roots": n_roots, "reps": reps,
           "adaptive_merge_bytes": amb,
           "wall_s": {mo: [] for mo in MODES},
           "gteps": {mo: [] for mo in MODES},
           "step_modes": {mo: Counter() for mo in MODES}}
    for rep in range(reps):
        for mo in MODES:
            _, met = bfs_multi(spark, shm, 32, roots, (dvs, ddeg), m, merge=mo,
                               adaptive_merge_bytes=amb)
            out["wall_s"][mo].append(round(met.total_time_s, 3))
            out["gteps"][mo].append(round(met.teps() / 1e9, 5))
            out["step_modes"][mo].update(s["merge"] for s in met.supersteps)
            print(f"rep {rep} {mo}: {met.total_time_s:.1f}s "
                  f"{met.teps()/1e9:.4f} GTEPS", flush=True)

    out["step_modes"] = {mo: dict(c) for mo, c in out["step_modes"].items()}
    out["gteps_mean"] = {mo: round(float(np.mean(v)), 5) for mo, v in out["gteps"].items()}
    out["toll_spark_vs_driver"] = round(
        out["gteps_mean"]["driver"] / out["gteps_mean"]["spark"], 3)
    out["toll_adaptive_vs_driver"] = round(
        out["gteps_mean"]["driver"] / out["gteps_mean"]["adaptive"], 3)
    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    suffix = "" if amb == (1 << 30) else f"_amb{amb >> 20}m"
    dest = repo / "BENCH" / f"ab_merge_modes_s{scale}_r{n_roots}{suffix}.json"
    dest.write_text(json.dumps(out, indent=1))
    print(json.dumps({k: out[k] for k in
                      ("gteps_mean", "toll_spark_vs_driver",
                       "toll_adaptive_vs_driver", "step_modes")}))
    shutil.rmtree(shm, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
