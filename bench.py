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
