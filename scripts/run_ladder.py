"""Core-count ladder for the MS-BFS benchmark → BENCH/ladder.json.

Runs the identical batch (same graph, same roots) at each parallelism level
with two timed repetitions (first warms the page cache — Graph500 likewise
excludes construction/warm-up from timed sections) and reports the best.
The ladder localizes the single-host saturation point; the N→4N efficiency
for the north rule is read off the unsaturated region, and the saturated
tail is the evidence for WHY a single box stops scaling (shared DRAM).

Usage: run_ladder.py [scale] [n_roots] [cores...]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, shutil, sys, time
import numpy as np
sys.path.insert(0, {repo!r})
from graph500_bfs_spark.session import get_spark
from graph500_bfs_spark.sources.kronecker import kronecker_edges
from graph500_bfs_spark.sources.transcripts import synthesize_transcripts
from graph500_bfs_spark.sources.edges import derive_edges
from graph500_bfs_spark.operators.prep import symmetrize, out_degrees
from graph500_bfs_spark.operators.msbfs import bfs_multi, export_blocks_indexed
from graph500_bfs_spark.operators.graph500 import sample_roots

cores = int(sys.argv[1]); scale = int(sys.argv[2]); n_roots = int(sys.argv[3])
spark = get_spark(app_name=f"ladder_{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=max(cores * 4, 8),
                  extra_conf={{"spark.sql.adaptive.enabled": "false"}})
kron = kronecker_edges(spark, scale=scale, edgefactor=16)
tr = synthesize_transcripts(spark, n_convs=2000, seed=42)
edges = kron.unionByName(derive_edges(tr).select("src", "dst"))
es = symmetrize(edges, dedup=False).repartition(max(cores * 4, 8), "src").cache()
m_dir = es.count()
deg = out_degrees(es).cache()
dp = deg.orderBy("v").toPandas()
dvs = dp["v"].to_numpy(np.int64); ddeg = dp["deg"].to_numpy(np.int64)
path = f"/dev/shm/g5_ladder"
shutil.rmtree(path, ignore_errors=True)
nblocks = max(cores * 2, 16)
export_blocks_indexed(es, nblocks, path, dvs)
roots = sample_roots(deg, n_roots, max_vertex=1 << scale)
runs = []
for rep in range(2):
    res, met = bfs_multi(spark, path, nblocks, roots, (dvs, ddeg), m_dir)
    runs.append({{"teps": met.teps(), "wall_s": met.total_time_s,
                  "traversed": met.traversed_edges}})
shutil.rmtree(path, ignore_errors=True)
best = max(runs, key=lambda r: r["teps"])
print("RESULT " + json.dumps({{"cores": cores, "scale": scale, "n_roots": n_roots,
    "runs": runs, "best_TEPS": best["teps"], "n_vertices": len(dvs),
    "m_directed": m_dir}}))
"""


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n_roots = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    ladder = [int(c) for c in sys.argv[3:]] or [1, 2, 4, 8, 16, 32]
    out = {}
    for cores in ladder:
        t0 = time.time()
        code = WORKER.format(repo=str(REPO))
        r = subprocess.run([sys.executable, "-c", code, str(cores), str(scale), str(n_roots)],
                           capture_output=True, text=True, timeout=3600)
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(f"cores={cores} FAILED\n{r.stdout[-1000:]}\n{r.stderr[-2000:]}")
            continue
        out[cores] = json.loads(line[0][7:])
        print(f"local[{cores}]: best_TEPS={out[cores]['best_TEPS']:.3e} "
              f"({time.time()-t0:.0f}s wall)")
    path = REPO / "BENCH" / f"ladder_ms_s{scale}.json"
    path.parent.mkdir(exist_ok=True)
    path.write_text(json.dumps(out, indent=2))
    print("→", path)


if __name__ == "__main__":
    main()
