"""Shared plumbing for driver-looped iterative operators (PageRank, CC,
LPA; BFS has its own direction-aware variant in ``bfs.py``).

Three rules make an iterative join loop survive a 100× scale-up:

1. The STATIC big side (edges / links) is cached pre-partitioned on its
   join key, so the per-iteration join exchanges only the mutable side
   (ranks / labels) — the multi-billion-row table is shuffled once at
   materialization, never again.
2. The MUTABLE side is broadcast while it fits (driver-known row count —
   the reference's allreduced counters, mpi/bfs.hpp:1355-1418) and
   shuffle_hash-hinted above the gate.  Without the hint Catalyst plans a
   sort-merge join, which re-SORTS the cached static side every iteration
   (tens of GB of sort spill per level at scale 26, measured ENOSPC on
   this box before the same fix landed in bfs.py).
3. SHUFFLE WIDTH follows the data, not the session default: a driver
   loop multiplies any per-stage fixed cost by its iteration count, and
   task launch overhead is that fixed cost.  ``sized_shuffle`` sets
   ``spark.sql.shuffle.partitions`` for the loop's scope to
   ceil(bytes / 64 MB), floored at defaultParallelism/4 (a too-narrow
   plan serializes stages — measured slower at 1-2 partitions than 8 on
   32 cores) and capped at the session conf (never widens — at cluster
   scale the job sets the conf and sizing is a no-op).  Interleaved A/B
   at sf0.1: bfs_levels 12.6→8.4 s, pagerank10 11.9→9.7 s.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# rows on the mutable side below which a driver-placed broadcast beats the
# shuffled hash join (~16-32 B/row → ≤ ~256 MB broadcast).  Env-overridable
# (round 6) because the right value is workload-shaped: a broadcast is
# REBUILT through the driver every iteration (serial cost), while the
# shuffled hash join exchanges the mutable side in parallel and streams the
# cached static side with no sort — for operators whose mutable side is the
# whole vertex vector (CC/LPA/PageRank), the serial rebuild is the Amdahl
# term in the N→4N scaling measurements.
ITER_BROADCAST_GATE = 8_000_000


def iter_broadcast_gate() -> int:
    return int(os.environ.get("SPARK_GRAFT_ITER_BROADCAST_ROWS", str(ITER_BROADCAST_GATE)))


def mutable_side(df: DataFrame, n_rows: int, gate: int | None = None) -> DataFrame:
    """Broadcast the per-iteration mutable side while it fits, else force
    the shuffled hash join (build side = this small side, static side
    streams partition-locally with no sort)."""
    g = iter_broadcast_gate() if gate is None else gate
    return F.broadcast(df) if n_rows < g else df.hint("shuffle_hash")


#: post-shuffle partition size target (the same order as
#: spark.sql.adaptive.advisoryPartitionSizeInBytes)
TARGET_PARTITION_BYTES = 64 << 20


def sized_partitions(spark: SparkSession, n_rows: int, row_bytes: int = 16) -> int:
    """Shuffle width for ``n_rows`` rows of ~``row_bytes`` each: enough
    partitions for ~64 MB apiece, at least defaultParallelism/4, never
    more than the session conf (explicit job configs win)."""
    conf_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    floor = max(1, spark.sparkContext.defaultParallelism // 4)
    need = max(1, -(-(n_rows * row_bytes) // TARGET_PARTITION_BYTES))
    return min(conf_p, max(floor, need))


@contextmanager
def sized_shuffle(spark: SparkSession, n_rows: int, row_bytes: int = 16):
    """Scope ``spark.sql.shuffle.partitions`` to the sized value for a
    driver loop; restores the session conf on exit.

    SINGLE-LOOP CONSTRAINT (verdict r5 #4): the conf is SESSION-global, so
    exactly one driver loop may hold this scope per SparkSession at a time
    — two concurrent operators on one session would race the setting.
    Every current caller runs one loop per session; a caller that needs
    concurrent loops must isolate them via ``spark.newSession()`` (child
    sessions share the SparkContext but have independent SQL confs).
    Nested scopes on one thread are fine (restore unwinds in LIFO order).
    """
    old = spark.conf.get("spark.sql.shuffle.partitions")
    p = sized_partitions(spark, n_rows, row_bytes)
    spark.conf.set("spark.sql.shuffle.partitions", str(p))
    try:
        yield p
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
