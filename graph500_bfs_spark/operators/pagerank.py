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

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from graph500_bfs_spark.operators import _smallgraph
from graph500_bfs_spark.operators._iter import mutable_side, sized_partitions
from graph500_bfs_spark.operators._mem import CheckpointScope


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 100,
    tol: float | None = 1e-8,
    checkpointer=None,
    run_id: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """ranks(v, score) over the *directed* edge table (src, dst).

    ``tol``: stop when the L1 delta between iterations drops below it
    (distance to the true fixpoint is then ≤ tol·d/(1−d)); pass None to run
    exactly ``max_iter`` iterations (deterministic oracle-comparison mode).
    Σ score ≡ 1 throughout (dangling mass redistributed uniformly).
    """
    scope = CheckpointScope(edges.sparkSession)
    e = edges.select("src", "dst")
    spark = edges.sparkSession
    # rule 3 (_iter): shuffle width follows the data for the loop —
    # m comes from a map-only scan, before the static side is built
    m = e.count()
    # round 6: below the driver graph budget the per-iteration fixed cost
    # (broadcast build + checkpoint job + AQE planning) dominates; run the
    # exact NumPy twin on the driver (same power iteration, same dangling
    # redistribution, same stop rule — see _smallgraph)
    if checkpointer is None and not resume and m <= _smallgraph.driver_graph_budget():
        import pandas as pd

        src, dst = _smallgraph.collect_edges(e)
        verts, scores = _smallgraph.pagerank_scores(src, dst, damping, max_iter, tol)
        return spark.createDataFrame(
            pd.DataFrame({"v": verts, "score": scores}), "v long, score double"
        )
    vertices = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .cache()
    )
    n = vertices.count()
    _old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(sized_partitions(spark, m, row_bytes=24)),
    )
    try:
        outdeg = e.groupBy(F.col("src").alias("ov")).agg(F.count("*").alias("outdeg"))
        # pre-partitioned on the join key: the per-iteration rank join then
        # exchanges only the rank vector — links is shuffled exactly once, here
        links = (
            e.join(outdeg, e["src"] == F.col("ov"))
            .select("src", "dst", "outdeg")
            .repartition("src")
            .cache()
        )
        links.count()
        vdom = vertices.join(outdeg, vertices["v"] == F.col("ov"), "left").select(
            "v", F.col("outdeg").isNull().cast("int").alias("dang")
        ).cache()

        # rank-vector join strategy (driver-known n, see _iter.mutable_side):
        # broadcast while it fits, shuffled-hash above — never sort-merge,
        # which would re-sort the cached links table every iteration

        ranks = vdom.select("v", F.lit(1.0 / n).alias("score"), "dang").localCheckpoint(True)
        start_iter = 0
        if resume and checkpointer is not None and run_id is not None:
            loaded = checkpointer.load_superstep(run_id)
            if loaded is not None:
                saved, step = loaded
                ranks = (
                    saved.select("v", "score")
                    .join(vdom.withColumnRenamed("v", "dv"), F.col("v") == F.col("dv"))
                    .select("v", "score", "dang")
                    .localCheckpoint(eager=True)
                )
                start_iter = step
        n_dangling = vdom.filter("dang = 1").count()
        dangling = n_dangling / n
        # fixed-iteration mode on a dangling-free graph needs NO scalar action
        # per iteration at all — the checkpoint materialization is the only job
        skip_scalar = tol is None and n_dangling == 0
        if n_dangling and start_iter:
            dangling = float(
                ranks.filter("dang = 1").agg(F.coalesce(F.sum("score"), F.lit(0.0))).collect()[0][0]
            )

        for it in range(start_iter, max_iter):
            base = (1.0 - damping) / n + damping * dangling / n
            r = mutable_side(ranks, n)
            # stacked union-aggregate: contribution rows and carry-over rows of
            # the old score collapse in ONE shuffle (no join back to the domain)
            contribs = (
                links.join(r.withColumnRenamed("v", "rv"), links["src"] == F.col("rv"))
                .select(
                    F.col("dst").alias("v"),
                    (F.col("score") / F.col("outdeg")).alias("c"),
                    F.lit(0.0).alias("o"),
                    F.lit(0).alias("dang"),
                )
            )
            carry = ranks.select("v", F.lit(0.0).alias("c"), F.col("score").alias("o"), "dang")
            new_ranks = (
                contribs.unionByName(carry)
                .groupBy("v")
                .agg(
                    (F.lit(base) + F.lit(damping) * F.sum("c")).alias("score"),
                    F.sum("o").alias("old"),
                    F.max("dang").alias("dang"),
                )
            )
            if skip_scalar:
                new_ranks = new_ranks.localCheckpoint(eager=True)  # the only action
                delta = float("inf")
            else:
                # round 6: the scalars (convergence delta + next dangling
                # mass) ride the SAME job as the checkpoint via observed
                # metrics (the bfs.py pattern) — one action per iteration
                obs = Observation()
                new_ranks = new_ranks.observe(
                    obs,
                    F.sum(F.abs(F.col("score") - F.col("old"))).alias("delta"),
                    F.coalesce(
                        F.sum(F.when(F.col("dang") == 1, F.col("score"))), F.lit(0.0)
                    ).alias("dangling"),
                ).localCheckpoint(eager=True)
                row = obs.get
                delta, dangling = float(row["delta"]), float(row["dangling"])
            ranks = new_ranks.drop("old")
            if checkpointer is not None:
                checkpointer.save_superstep(
                    run_id or "pagerank", it + 1, ranks.drop("dang"),
                    {"superstep": it, "direction": "pagerank", "frontier_size": n,
                     "frontier_edges": 0, "elapsed_s": 0.0, "delta": delta},
                )
            if tol is not None and delta < tol:
                break
        vertices.unpersist()
        links.unpersist()
        vdom.unpersist()
        return scope.finalize(ranks.select("v", "score"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", _old_sp)
