"""Direction-optimizing level-synchronous BFS (SURVEY §2.3).

The superstep loop lives in the Python driver — exactly the role of
``run_bfs_core``'s level loop on the master rank
(/root/reference/mpi/bfs.hpp:3238-3609).  Each superstep is one declarative
DataFrame job; every MPI collective of the reference maps to a Spark
primitive:

* FOLD alltoall (top_down_send, /root/reference/mpi/bfs.hpp:1044-1353)
  → the Exchange produced by ``edges ⋈ frontier``;
* first-writer-wins pred update with CAS (…:1526-1698)
  → ``groupBy(dst).agg(min(parent))`` — *deterministic* winner, a
  strengthening of the reference's arbitrary-winner contract (any valid
  parent passes Graph500 validation; min makes runs reproducible);
* nq-stats Allreduce (…:1355-1418) → one tiny ``.agg().collect()``;
* direction switch alpha/beta (…:3413-3457, defaults
  /root/reference/mpi/parameters.h:96-98) → the same scalar formulas below.

Scale notes (1000-executor / 10^12-edge view):

* The frontier×edges join shuffles only candidate (dst,parent) pairs, and
  ``min`` is algebraic → map-side partial aggregation absorbs hub skew
  before the shuffle (the reference needs ~1k LoC of large-row splitting
  for the same effect, bfs.hpp:1076-1127).  AQE skew-join handles residual
  skew on the build side.
* Small frontiers broadcast (AQE / autoBroadcastJoinThreshold) — the analog
  of the reference's frontier-list allgather (bfs.hpp:680-696).
* ``state`` is localCheckpoint'ed per superstep to truncate lineage; at
  cluster scale the checkpoint manager (plans/checkpoint.py) persists it to
  the warehouse instead, giving mid-iteration resume.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_ALPHA = 10.0  # /root/reference/mpi/parameters.h:96
DEFAULT_BETA = 14.0  # /root/reference/mpi/parameters.h:97
DEFAULT_EDGEFACTOR = 16  # /root/reference/mpi/parameters.h:93


@dataclass
class BfsMetrics:
    """Per-superstep telemetry (reference: profiling slots mpi/main.cc:872-938)."""

    supersteps: list[dict] = field(default_factory=list)
    total_time_s: float = 0.0
    traversed_edges: int = 0

    def teps(self) -> float:
        return self.traversed_edges / self.total_time_s if self.total_time_s else 0.0


def bfs(
    edges_sym: DataFrame,
    root: int,
    degrees: DataFrame | None = None,
    alpha: float = DEFAULT_ALPHA,
    beta: float = DEFAULT_BETA,
    max_levels: int = 1000,
    checkpointer=None,
    run_id: str | None = None,
    resume: bool = False,
) -> tuple[DataFrame, BfsMetrics]:
    """BFS from ``root`` over a symmetrized edge table ``(src, dst)``.

    Returns ``(state, metrics)`` where ``state`` has schema
    ``(v long, parent long, level int)`` covering exactly the reached
    vertices (use :func:`complete_result` to add unreached rows).
    """
    spark = edges_sym.sparkSession
    from graph500_bfs_spark.operators.prep import out_degrees

    deg = degrees if degrees is not None else out_degrees(edges_sym)
    deg = deg.cache()

    stats = edges_sym.agg(
        F.count("*").alias("m"), F.count_distinct("src").alias("n")
    ).collect()[0]
    m_total = int(stats["m"])  # directed copies
    n_total = int(stats["n"])

    metrics = BfsMetrics()
    t0 = time.perf_counter()

    state = spark.createDataFrame(
        [(int(root), int(root), 0)], "v long, parent long, level int"
    ).localCheckpoint(eager=True)
    frontier = state
    level = 0
    direction = "top_down"
    visited_edges = 0  # Σ deg(visited) — proxy for remaining work

    if resume and checkpointer is not None and run_id is not None:
        loaded = checkpointer.load_superstep(run_id)
        if loaded is not None:
            state, _step = loaded
            state = state.localCheckpoint(eager=True)
            level = int(state.agg(F.max("level")).collect()[0][0])
            frontier = state.filter(F.col("level") == level).localCheckpoint(eager=True)
            # rebuild Σ deg over vertices visited *before* the current frontier
            visited_edges = int(
                state.filter(F.col("level") < level)
                .join(deg.withColumnRenamed("v", "dv"), F.col("v") == F.col("dv"), "left")
                .agg(F.coalesce(F.sum("deg"), F.lit(0)))
                .collect()[0][0]
            )
            direction = "top_down" if level == 0 else (
                checkpointer.metrics(run_id)[-1].get("direction", "top_down")
            )

    while level < max_levels:
        fstats = (
            frontier.join(deg, frontier["v"] == deg["v"], "left")
            .agg(
                F.count("*").alias("nq"),
                F.coalesce(F.sum("deg"), F.lit(0)).alias("nq_edges"),
            )
            .collect()[0]
        )
        nq, nq_edges = int(fstats["nq"]), int(fstats["nq_edges"])
        if nq == 0:
            break
        visited_edges += nq_edges

        # direction heuristic — same formulas as run_bfs_core
        # (/root/reference/mpi/bfs.hpp:3413-3457)
        if direction == "top_down":
            if nq_edges > (m_total - visited_edges) / alpha:
                direction = "bottom_up"
        else:
            if nq < n_total / (beta * DEFAULT_EDGEFACTOR * 2.0):
                direction = "top_down"

        ts = time.perf_counter()
        f_ids = frontier.select("v", "parent", "level").drop("parent", "level")
        f_parents = frontier.select(F.col("v").alias("fv"))

        if direction == "top_down":
            # B2/B3: expand from the frontier
            cand = edges_sym.join(
                f_parents, edges_sym["src"] == F.col("fv"), "inner"
            ).select(F.col("dst").alias("v"), F.col("src").alias("parent"))
        else:
            # B6/B7: drive from the unvisited side — join order puts the
            # (now small) unvisited set first so the big frontier is probed
            unvisited_edges = edges_sym.join(
                state.select("v"), edges_sym["src"] == state["v"], "left_anti"
            )
            cand = unvisited_edges.join(
                f_parents, unvisited_edges["dst"] == F.col("fv"), "inner"
            ).select(F.col("src").alias("v"), F.col("dst").alias("parent"))

        # deterministic first-writer-wins, map-side combined (hub-skew safe)
        winners = cand.groupBy("v").agg(F.min("parent").alias("parent"))
        new_frontier = (
            winners.join(state.select(F.col("v").alias("sv")), winners["v"] == F.col("sv"), "left_anti")
            .select("v", "parent", F.lit(level + 1).cast("int").alias("level"))
            .localCheckpoint(eager=True)
        )
        state = state.unionByName(new_frontier).localCheckpoint(eager=True)
        elapsed = time.perf_counter() - ts
        metrics.supersteps.append(
            {
                "superstep": level,
                "direction": direction,
                "frontier_size": nq,
                "frontier_edges": nq_edges,
                "elapsed_s": elapsed,
            }
        )
        if checkpointer is not None:
            checkpointer.save_superstep(run_id or f"bfs_{root}", level + 1, state, metrics.supersteps[-1])
        frontier = new_frontier
        level += 1

    metrics.total_time_s = time.perf_counter() - t0
    # V6-style traversed-edge count: Σ deg(v) over visited / 2
    metrics.traversed_edges = visited_edges // 2
    deg.unpersist()
    return state, metrics


def complete_result(state: DataFrame, vertices: DataFrame) -> DataFrame:
    """Join the vertex domain in: unreached vertices get parent=-1, level=-1."""
    return (
        vertices.select("v")
        .join(state.withColumnRenamed("v", "sv"), vertices["v"] == F.col("sv"), "left")
        .select(
            vertices["v"],
            F.coalesce(F.col("parent"), F.lit(-1)).alias("parent"),
            F.coalesce(F.col("level"), F.lit(-1)).cast("int").alias("level"),
        )
    )
