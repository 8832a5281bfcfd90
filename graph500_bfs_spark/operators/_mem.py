"""Bookkeeping for per-superstep localCheckpoint RDDs.

Iterative drivers create one persisted RDD per superstep; consolidating the
final result into a fresh checkpoint and freeing the intermediates keeps
long benchmark sessions (64 BFS roots, repeated analytics) from accumulating
O(runs × supersteps) persisted blocks.  The reference mirrors this with
per-root buffer reuse (/root/reference/mpi/bfs.hpp:315)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def persistent_ids(spark) -> set[int]:
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().keySet().iterator()
    ids = set()
    while it.hasNext():
        ids.add(int(it.next()))
    return ids


def unpersist_ids(spark, ids: set[int]) -> None:
    m = spark.sparkContext._jsc.sc().getPersistentRDDs()
    for i in ids:
        opt = m.get(i)
        if not opt.isEmpty():
            opt.get().unpersist(False)


class CheckpointScope:
    """Track checkpoints created inside an iterative operator and free all
    but the consolidated result on exit."""

    def __init__(self, spark):
        self.spark = spark
        self.start_ids = persistent_ids(spark)

    def finalize(self, result: DataFrame) -> DataFrame:
        before = persistent_ids(self.spark)
        out = result.localCheckpoint(eager=True)
        keep = persistent_ids(self.spark) - before
        unpersist_ids(self.spark, (before - self.start_ids) - keep)
        return out
