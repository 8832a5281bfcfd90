"""Connected components (SURVEY §2.7) + 2-core forest pruning (§2.4 C1).

Two algorithms:

* :func:`connected_components` — HashMin label propagation with **pointer
  doubling** (label ← min over neighbors' labels ∪ own, plus a
  label-of-label shortcut step), converging in O(log d) rounds on most
  graphs rather than O(diameter).  Deterministic: component id = min vertex
  id in the component (matches the SciPy oracle after relabeling).
* :func:`prune_trees` — the reference's CoreBFS 2-core decomposition
  (/root/reference/external/indexed_bfs/bfs/corebfs/decomposition.hpp:350-480):
  iteratively strip degree-1 vertices, recording each leaf's single edge in
  ``tree_parents``; the survivor is the 2-core.  Shared preprocessing that
  shrinks the edge set for BFS/CC on forest-heavy graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph500_bfs_spark.operators._mem import CheckpointScope


def connected_components(edges_sym: DataFrame, max_iter: int = 100) -> DataFrame:
    """components(v, component) over a symmetrized edge table.

    Each round: gather min neighbor label (one shuffle with map-side min),
    then shortcut via label-of-label join (pointer doubling).  Convergence
    checked with a scalar count of changed labels (driver allreduce).
    """
    scope = CheckpointScope(edges_sym.sparkSession)
    labels = (
        edges_sym.select(F.col("src").alias("v"))
        .union(edges_sym.select(F.col("dst").alias("v")))
        .distinct()
        .select("v", F.col("v").alias("component"))
        .localCheckpoint(eager=True)
    )
    while max_iter > 0:
        max_iter -= 1
        nbr_min = (
            edges_sym.join(
                labels.withColumnRenamed("v", "lv"), edges_sym["src"] == F.col("lv")
            )
            .groupBy(F.col("dst").alias("v"))
            .agg(F.min("component").alias("nbr"))
        )
        # gather step materialized once (it feeds BOTH sides of the
        # pointer-doubling self-join — without this it would evaluate twice)
        merged = (
            labels.join(nbr_min.withColumnRenamed("v", "nv"), labels["v"] == F.col("nv"), "left")
            .select(
                labels["v"],
                F.least(F.col("component"), F.coalesce(F.col("nbr"), F.col("component"))).alias(
                    "component"
                ),
                labels["component"].alias("old"),
            )
            .localCheckpoint(eager=True)  # action 1
        )
        # pointer doubling: component ← label(component), then fused change
        # count in the same pass (action 2) — two actions per round total
        short = (
            merged.alias("a")
            .join(
                merged.select(F.col("v").alias("bv"), F.col("component").alias("bc")).alias("b"),
                F.col("a.component") == F.col("bv"),
                "left",
            )
            .select(
                F.col("a.v").alias("v"),
                F.least(F.col("a.component"), F.coalesce(F.col("bc"), F.col("a.component"))).alias(
                    "component"
                ),
                F.col("a.old").alias("old"),
            )
            .localCheckpoint(eager=True)  # action 2
        )
        changed = short.agg(
            F.sum((F.col("component") != F.col("old")).cast("long"))
        ).collect()[0][0]
        labels = short.drop("old")
        if int(changed or 0) == 0:
            break
    return scope.finalize(labels)


def prune_trees(edges_sym: DataFrame, max_iter: int = 32) -> tuple[DataFrame, DataFrame]:
    """CoreBFS C1 — returns (core_edges_sym, tree_parents).

    Loop (≤32 iters like the reference, decomposition.hpp:401): find
    degree-1 vertices, record their single incident edge as tree parent,
    delete those vertices' edges.  All DataFrame ops: a degree aggregate,
    a semi-join, an anti-join per round.
    """
    spark = edges_sym.sparkSession
    edges = edges_sym.localCheckpoint(eager=True)
    tree_parents = spark.createDataFrame([], "v long, parent long")
    for _ in range(max_iter):
        deg = edges.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("deg"))
        leaves = deg.filter(F.col("deg") == 1).select("v")
        if leaves.isEmpty():
            break
        twigs = edges.join(leaves.withColumnRenamed("v", "lv"), edges["src"] == F.col("lv")).select(
            F.col("src").alias("v"), F.col("dst").alias("parent")
        )
        # mutual-leaf tie-break (isolated K2): only the larger id is pruned,
        # the smaller survives as that micro-component's core root
        mutual = twigs.join(
            leaves.withColumnRenamed("v", "plv"), twigs["parent"] == F.col("plv"), "left_semi"
        ).filter(F.col("v") < F.col("parent"))
        twigs = twigs.exceptAll(mutual)
        tree_parents = tree_parents.unionByName(twigs).localCheckpoint(eager=True)
        lv = twigs.select(F.col("v").alias("lv"))
        edges = (
            edges.join(lv, edges["src"] == F.col("lv"), "left_anti")
            .join(lv, edges["dst"] == F.col("lv"), "left_anti")
            .localCheckpoint(eager=True)
        )
    return edges, tree_parents
