"""Same-session A/B of the round-3 vs round-4 bfs_multi at scale 18.

Round-4 bench showed bfs_harmonic_mean_gteps_scale18 0.00205 -> 0.00120
(-42%) and msbfs_scale18_batch 2.40 -> 3.72 s (+55%) while the round-3
noise study certified these as the stable metrics (stddev 5e-05).  The
superstep path was refactored this round (BlockShip), so before believing
"environment", run BOTH code versions interleaved (ABAB) in ONE Spark
session on ONE graph export: any code-attributable delta shows as a
systematic A-vs-B gap; VM noise shows as shared drift.

Usage:  python scripts/ab_msbfs_r3r4.py [reps]
Writes: BENCH/ab_msbfs_r3r4.json
"""

from __future__ import annotations

import importlib.util
import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from graph500_bfs_spark.operators.graph500 import sample_roots_spec, teps_stats  # noqa: E402
from graph500_bfs_spark.operators import msbfs as msbfs_r4  # noqa: E402
from graph500_bfs_spark.operators.msbfs import export_blocks_indexed  # noqa: E402
from graph500_bfs_spark.operators.prep import out_degrees, symmetrize  # noqa: E402
from graph500_bfs_spark.session import get_spark  # noqa: E402
from graph500_bfs_spark.sources.kronecker import kronecker_edges  # noqa: E402

R3_COMMIT = "379db6c"
SCALE = 18
N_ROOTS = 16


def load_r3_module(repo: Path):
    src = subprocess.run(
        ["git", "-C", str(repo), "show", f"{R3_COMMIT}:graph500_bfs_spark/operators/msbfs.py"],
        check=True, capture_output=True, text=True,
    ).stdout
    p = Path("/tmp/msbfs_r3_ab.py")
    p.write_text(src)
    spec = importlib.util.spec_from_file_location("msbfs_r3_ab", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    repo = Path(__file__).resolve().parents[1]
    msbfs_r3 = load_r3_module(repo)

    spark = get_spark(app_name="ab_msbfs")
    es = symmetrize(kronecker_edges(spark, SCALE), dedup=False).cache()
    m = es.count()
    deg = out_degrees(es).cache()
    dp = deg.orderBy("v").toPandas()
    dvs = dp["v"].to_numpy(np.int64)
    ddeg = dp["deg"].to_numpy(np.int64)
    shm = "/dev/shm/g5_ab"
    shutil.rmtree(shm, ignore_errors=True)
    export_blocks_indexed(es, 32, shm, dvs)
    roots = sample_roots_spec(deg, SCALE, N_ROOTS)

    # warm both paths once (JIT, page cache, Spark lazy init)
    msbfs_r4.bfs_multi(spark, shm, 32, roots, (dvs, ddeg), m)
    msbfs_r3.bfs_multi(spark, shm, 32, roots, (dvs, ddeg), m)

    out = {"scale": SCALE, "n_roots": N_ROOTS, "reps": reps,
           "batch_s": {"r3": [], "r4": []},
           "harmonic_gteps": {"r3": [], "r4": []}}
    for rep in range(reps):
        for tag, mod in (("r4", msbfs_r4), ("r3", msbfs_r3)):
            _, met = mod.bfs_multi(spark, shm, 32, roots, (dvs, ddeg), m)
            out["batch_s"][tag].append(round(met.total_time_s, 3))
            times, nedges = [], []
            for r in roots:
                _, m1 = mod.bfs_multi(spark, shm, 32, [r], (dvs, ddeg), m)
                times.append(m1.total_time_s)
                nedges.append(m1.traversed_edges)
            st = teps_stats(nedges, times)
            out["harmonic_gteps"][tag].append(
                round(st["harmonic_mean_TEPS"] / 1e9, 5)
            )
            print(f"rep {rep} {tag}: batch {out['batch_s'][tag][-1]} s, "
                  f"harmonic {out['harmonic_gteps'][tag][-1]} GTEPS", flush=True)

    for k in ("batch_s", "harmonic_gteps"):
        out[f"{k}_mean"] = {t: round(float(np.mean(v)), 5) for t, v in out[k].items()}
    out["ratio_batch_r4_over_r3"] = round(
        out["batch_s_mean"]["r4"] / out["batch_s_mean"]["r3"], 3
    )
    out["ratio_harm_r4_over_r3"] = round(
        out["harmonic_gteps_mean"]["r4"] / out["harmonic_gteps_mean"]["r3"], 3
    )
    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    dest = repo / "BENCH" / "ab_msbfs_r3r4.json"
    dest.write_text(json.dumps(out, indent=1))
    print(json.dumps({k: v for k, v in out.items() if "mean" in k or "ratio" in k}))
    shutil.rmtree(shm, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
