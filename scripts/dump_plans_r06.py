"""Dump .explain('formatted') for the bench queries into plans/r06/."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graph500_bfs_spark import gate  # noqa: E402
from graph500_bfs_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"
QUERIES = {
    "edges_symmetrize": gate.q_edges_symmetrize,
    "degree_top100": gate.q_degree_top100,
    "bfs_levels": gate.q_bfs_levels,
    "pagerank10": gate.q_pagerank10,
    "triangle_count": gate.q_triangle_count,
    "connected_components_snr": gate.q_connected_components_snr,
    "label_propagation_snr": gate.q_label_propagation_snr,
}


def main(tag: str):
    spark = get_spark(app_name="dump_plans")
    out = Path("plans/r06")
    out.mkdir(parents=True, exist_ok=True)
    for name, fn in QUERIES.items():
        df = fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out / f"{name}_{tag}.txt").write_text(plan)
        print(f"{name}: {plan.count('Exchange')} Exchange mentions", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "before")
