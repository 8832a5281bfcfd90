"""Supplementary benchmarks (round 6) — NOT part of the frozen bench.py
contract.  Adds the legs the round-5 verdict asked for (#4: sssp, plus the
corpus-prep composition) and runs every leg as interleaved repetitions with
per-leg medians (#5's regime-robust methodology, applied here because
bench.py itself is frozen for measurement).

Prints ONE JSON line: {"queries": {name: median_sec}, "samples": {...}}.
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

LEGS = {
    "sssp_dist": gate.q_sssp_dist,
    "corpus_prep": gate.q_corpus_prep,
    "token_budget_sample": gate.q_token_budget_sample,
    "dedup_groups_lsh": gate.q_dedup_groups_lsh,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_EXTRA_REPS", "3"))
    spark = get_spark(app_name="bench_extra")
    samples: dict[str, list[float]] = {k: [] for k in LEGS}
    for _ in range(reps):  # interleaved: every leg samples every regime window
        for name, fn in LEGS.items():
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples[name].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    med = {k: sorted(v)[len(v) // 2] for k, v in samples.items()}
    print(
        json.dumps(
            {
                "metric": "extra_queries_median_runtime",
                "unit": "sec",
                "queries": med,
                "samples": samples,
                "sf": sf_dir,
                "reps": reps,
            }
        )
    )


if __name__ == "__main__":
    main()
