"""Synchronous label propagation with deterministic min-tie-break (SURVEY §2.7).

Each round every vertex adopts the most frequent label among its neighbors,
ties broken by smallest label — fully deterministic, so results are exactly
reproducible (the property the north rule requires and the reference's
race-based parent writes lack).

One round = two shuffles: (edges ⋈ labels) → count per (v, label) →
argmax per v via a second aggregate.  Both aggregates are algebraic
(map-side combinable) → hub skew is absorbed before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from graph500_bfs_spark.operators import _smallgraph
from graph500_bfs_spark.operators._iter import mutable_side, sized_partitions
from graph500_bfs_spark.operators._mem import CheckpointScope


def label_propagation(edges_sym: DataFrame, max_iter: int = 20) -> DataFrame:
    """labels(v, label) over a symmetrized edge table; init label = v."""
    scope = CheckpointScope(edges_sym.sparkSession)
    # static side cached pre-partitioned on the join key (see _iter): each
    # round's gather join then exchanges only the label vector
    spark = edges_sym.sparkSession
    # rule 3 (_iter): shuffle width follows the data for the loop
    m = edges_sym.count()
    # round 6: below the driver graph budget the two-shuffle round's fixed
    # cost dominates; run the exact NumPy twin (same synchronous update,
    # same min-label tie-break, same no-change early stop — _smallgraph)
    if m <= _smallgraph.driver_graph_budget():
        import pandas as pd

        src, dst = _smallgraph.collect_edges(edges_sym)
        verts, lab = _smallgraph.lpa_labels(src, dst, max_iter)
        return spark.createDataFrame(
            pd.DataFrame({"v": verts, "label": lab}), "v long, label long"
        )
    _old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(sized_partitions(spark, m, row_bytes=16)),
    )
    try:
        e = edges_sym.select("src", "dst").repartition("src").cache()
        labels = (
            e.select(F.col("src").alias("v"))
            .union(e.select(F.col("dst").alias("v")))
            .distinct()
            .select("v", F.col("v").alias("label"))
            .localCheckpoint(eager=True)
        )
        n = labels.count()
        for _ in range(max_iter):
            counts = (
                e.join(
                    mutable_side(labels.withColumnRenamed("v", "lv"), n),
                    e["src"] == F.col("lv"),
                )
                .groupBy(F.col("dst").alias("v"), F.col("label"))
                .agg(F.count("*").alias("cnt"))
            )
            # argmax with min-label tie-break via max_by on a (cnt, -label) pair:
            # struct ordering compares cnt first, then -label, so higher count
            # wins and, within equal counts, the smaller label wins.
            new_labels = counts.groupBy("v").agg(
                F.max_by("label", F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))).alias("label")
            )
            # round 6: the change count rides the SAME job as the round's
            # materialization via observed metrics (the bfs.py pattern) —
            # ONE action per round instead of checkpoint + scalar collect
            obs = Observation()
            merged = (
                labels.select(F.col("v"), F.col("label").alias("old"))
                .join(
                    mutable_side(new_labels.withColumnRenamed("v", "nv"), n),
                    F.col("v") == F.col("nv"),
                    "left",
                )
                .select("v", F.coalesce(F.col("label"), F.col("old")).alias("label"), F.col("old"))
                .observe(obs, F.sum((F.col("label") != F.col("old")).cast("long")).alias("changed"))
                .localCheckpoint(eager=True)
            )
            changed = obs.get["changed"]
            labels = merged.drop("old")
            if int(changed or 0) == 0:
                break
        e.unpersist()
        return scope.finalize(labels)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", _old_sp)
