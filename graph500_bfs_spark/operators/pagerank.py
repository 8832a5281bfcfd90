"""PageRank — power iteration with dangling-mass redistribution (SURVEY §2.7).

No reference analog (the reference is BFS-only); built Spark-first on the
same frontier/aggregation machinery: one superstep = edges ⋈ ranks →
groupBy(dst).sum — a hash aggregate with map-side partial combine, so hub
in-degree skew is absorbed before the shuffle.

Scale/efficiency notes:

* static structure ``links(src, dst, outdeg)`` is joined once and cached —
  per iteration there is exactly ONE shuffle (the contribution aggregate)
  plus one broadcast-sized join back to the vertex domain;
* exactly ONE driver action per iteration: a fused aggregate returning
  (L1 delta, next dangling mass) — the reference pattern of scalar
  allreduce on the master rank (/root/reference/mpi/bfs.hpp:3408-3416);
* lineage truncated per iteration via localCheckpoint (or persisted through
  the checkpoint manager for mid-run resume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 100,
    tol: float | None = 1e-8,
    checkpointer=None,
    run_id: str | None = None,
) -> DataFrame:
    """ranks(v, score) over the *directed* edge table (src, dst).

    ``tol``: stop when the L1 delta between iterations drops below it
    (distance to the true fixpoint is then ≤ tol·d/(1−d)); pass None to run
    exactly ``max_iter`` iterations (deterministic oracle-comparison mode).
    Σ score ≡ 1 throughout (dangling mass redistributed uniformly).
    """
    e = edges.select("src", "dst")
    vertices = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .cache()
    )
    n = vertices.count()
    outdeg = e.groupBy(F.col("src").alias("ov")).agg(F.count("*").alias("outdeg"))
    links = (
        e.join(outdeg, e["src"] == F.col("ov"))
        .select("src", "dst", "outdeg")
        .cache()
    )
    links.count()
    vdom = vertices.join(outdeg, vertices["v"] == F.col("ov"), "left").select(
        "v", F.col("outdeg").isNull().alias("is_dangling")
    ).cache()

    ranks = vdom.select("v", F.lit(1.0 / n).alias("score"), "is_dangling").localCheckpoint(True)
    dangling = float(
        ranks.filter("is_dangling").agg(F.coalesce(F.sum("score"), F.lit(0.0))).collect()[0][0]
    )

    for it in range(max_iter):
        contribs = (
            links.join(ranks.withColumnRenamed("v", "rv"), links["src"] == F.col("rv"))
            .select(F.col("dst").alias("cv"), (F.col("score") / F.col("outdeg")).alias("c"))
            .groupBy("cv")
            .agg(F.sum("c").alias("contrib"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        new_ranks = (
            ranks.join(contribs, ranks["v"] == F.col("cv"), "left")
            .select(
                ranks["v"],
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias(
                    "score"
                ),
                "is_dangling",
                ranks["score"].alias("old"),
            )
            .localCheckpoint(eager=True)
        )
        # ONE fused driver action: convergence delta + next-iteration dangling mass
        row = new_ranks.agg(
            F.sum(F.abs(F.col("score") - F.col("old"))).alias("delta"),
            F.coalesce(F.sum(F.when(F.col("is_dangling"), F.col("score"))), F.lit(0.0)).alias(
                "dangling"
            ),
        ).collect()[0]
        delta, dangling = float(row["delta"]), float(row["dangling"])
        ranks = new_ranks.drop("old")
        if checkpointer is not None:
            checkpointer.save_superstep(
                run_id or "pagerank", it + 1, ranks.drop("is_dangling"),
                {"superstep": it, "direction": "pagerank", "frontier_size": n,
                 "frontier_edges": 0, "elapsed_s": 0.0, "delta": delta},
            )
        if tol is not None and delta < tol:
            break
    vertices.unpersist()
    links.unpersist()
    vdom.unpersist()
    return ranks.select("v", "score")
