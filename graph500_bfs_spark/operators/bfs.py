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
* nq-stats Allreduce (…:1355-1418) → one tiny ``.agg().collect()`` per
  superstep, fused: the frontier carries its degree so size and edge
  count come from a single aggregate over already-materialized data;
* direction switch alpha/beta (…:3413-3457, defaults
  /root/reference/mpi/parameters.h:96-98) → the same scalar formulas below.

Superstep job budget: exactly TWO actions per level — (1) materialize the
new frontier (join + partial-agg'd min + anti-join, one shuffle chain),
(2) a scalar stats aggregate on the materialized frontier.  ``state`` is a
union of per-level localCheckpoint'ed frontiers, so its lineage stays
shallow without an O(|V|) rewrite per level.

Scale notes (1000-executor / 10^12-edge view):

* The frontier×edges join shuffles only candidate (dst,parent) pairs, and
  ``min`` is algebraic → map-side partial aggregation absorbs hub skew
  before the shuffle (the reference needs ~1k LoC of large-row splitting
  for the same effect, bfs.hpp:1076-1127).  AQE skew-join handles residual
  skew on the build side.
* Small frontiers broadcast (AQE / autoBroadcastJoinThreshold) — the analog
  of the reference's frontier-list allgather (bfs.hpp:680-696).
* At cluster scale the checkpoint manager (plans/checkpoint.py) persists
  state to the warehouse per superstep, giving mid-iteration resume.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import reduce

import numpy as np
from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from graph500_bfs_spark.operators._direction import (
    DEFAULT_ALPHA,
    DEFAULT_BETA,
    DEFAULT_EDGEFACTOR,
    DirectionGuard,
)


from graph500_bfs_spark.operators import _smallgraph
from graph500_bfs_spark.operators._iter import sized_partitions
from graph500_bfs_spark.operators._mem import CheckpointScope

# Driver-side broadcast gate (rows): frontiers/exclusion sets below this
# are hint-broadcast (the reference's frontier allgather, bfs.hpp:680-696);
# above it the join must shuffle — and there the hint matters just as
# much: without one Catalyst plans a sort-merge join, which re-SORTS the
# multi-billion-row cached adjacency every superstep (tens of GB of sort
# spill per level at scale 26, measured ENOSPC).  A shuffle_hash hint on
# the frontier side builds the per-partition hash map from the SMALL side
# and streams the adjacency partition-locally with no sort — the plan a
# 100 TB cluster needs.
BROADCAST_GATE = 8_000_000

# Cumulative candidate-edge volume between explicit shuffle cleanups.
# Exchange files from finished supersteps sit on executor-local disk until
# the driver JVM garbage-collects the RDD references (ContextCleaner's own
# periodic GC interval is 30 min — many supersteps at web scale), so a
# long iterative run can fill local disk with dead shuffles from levels
# whose frontiers are already checkpointed.  Once this many edges have
# flowed through the expand joins, a driver System.gc() lets the cleaner
# reclaim them; small graphs never hit the threshold.
SHUFFLE_CLEANUP_EDGE_BUDGET = 256_000_000


@dataclass
class BfsMetrics:
    """Per-superstep telemetry (reference: profiling slots mpi/main.cc:872-938)."""

    supersteps: list[dict] = field(default_factory=list)
    total_time_s: float = 0.0
    traversed_edges: int = 0

    def teps(self) -> float:
        return self.traversed_edges / self.total_time_s if self.total_time_s else 0.0


def build_adjacency(
    edges_sym: DataFrame, degrees: DataFrame, partitions: int | None = None
) -> DataFrame:
    """Degree-annotated adjacency (src, dst, sdeg, ddeg), built ONCE per
    graph and reused across roots/supersteps — the analog of the reference's
    one-time CSR construction carrying per-row degrees
    (/root/reference/mpi/graph_constructor.hpp:1009-1033).  Carrying both
    endpoint degrees lets every superstep skip the degree join: frontier
    stats ride along with the candidate tuples.

    The result is hash-partitioned by ``src`` (the construction's 2D
    redistribute, P1) so every per-superstep join keyed on src reuses the
    cached partitioning — the adjacency is NEVER reshuffled inside the
    superstep loop, mirroring the reference's fixed edge ownership."""
    d = degrees
    spark = edges_sym.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    return (
        edges_sym.join(
            d.select(F.col("v").alias("_sv"), F.col("deg").alias("sdeg")),
            edges_sym["src"] == F.col("_sv"),
        )
        .join(
            d.select(F.col("v").alias("_dv"), F.col("deg").alias("ddeg")),
            edges_sym["dst"] == F.col("_dv"),
        )
        .select("src", "dst", "sdeg", "ddeg")
        .repartition(p, "src")
    )


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
    n_vertices: int | None = None,
    m_edges: int | None = None,
    adjacency: DataFrame | None = None,
) -> tuple[DataFrame, BfsMetrics]:
    """BFS from ``root`` over a symmetrized edge table ``(src, dst)``.

    Returns ``(state, metrics)``; ``state`` has schema
    ``(v long, parent long, level int)`` covering exactly the reached
    vertices (use :func:`complete_result` to add unreached rows).
    Pass precomputed ``n_vertices``/``m_edges`` (and a cached ``degrees``)
    when running many roots over the same graph (Graph500 protocol).
    """
    spark = edges_sym.sparkSession
    from graph500_bfs_spark.operators.prep import out_degrees

    # round 6: below the driver graph budget the superstep loop's fixed
    # per-level cost dominates end to end, so run the exact NumPy twin on
    # the driver (same DirectionGuard, same min-parent contract, same
    # metrics counters — see _smallgraph).  m is driver-known before any
    # collect: either passed in or one map-only count.
    if checkpointer is None and not resume and degrees is None and adjacency is None:
        m_gate = m_edges if m_edges is not None else edges_sym.count()
        if m_gate <= _smallgraph.driver_graph_budget():
            return _bfs_driver(edges_sym, root, m_gate, alpha, beta, max_levels)

    own_deg = degrees is None
    deg = (degrees if degrees is not None else out_degrees(edges_sym)).cache()

    if n_vertices is None or m_edges is None:
        stats = deg.agg(F.count("*").alias("n"), F.sum("deg").alias("m")).collect()[0]
        n_total, m_total = int(stats["n"]), int(stats["m"])
    else:
        n_total, m_total = n_vertices, m_edges

    # rule 3 (_iter): shuffle width follows the data for the whole
    # superstep loop — a driver loop multiplies task-launch overhead
    # by its level count (never widens past the session conf)
    _old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(sized_partitions(spark, m_total, row_bytes=24)),
    )
    try:
        own_adj = adjacency is None
        adj = (adjacency if adjacency is not None else build_adjacency(edges_sym, deg)).cache()

        metrics = BfsMetrics()
        t0 = time.perf_counter()
        scope = CheckpointScope(spark)

        deg_b = deg.select(F.col("v").alias("dv"), F.col("deg"))
        frontier = (
            spark.createDataFrame([(int(root), int(root), 0)], "v long, parent long, level int")
            .join(deg_b, F.col("v") == F.col("dv"), "left")
            .select("v", "parent", "level", F.coalesce("deg", F.lit(0)).alias("deg"))
            .localCheckpoint(eager=True)
        )
        pieces = [frontier]
        level = 0
        # shared growing/shrinking direction state machine (operators/_direction.py,
        # reference bfs.hpp:3413-3457) — ONE implementation for all four strategies
        guard = DirectionGuard(n_total, m_total, alpha, beta)
        prev_frontier = None  # level-1 frontier — the exact anti-join set
        prev_nq = 0  # exact size of prev_frontier (driver counter, for broadcast gating)
        unvisited = None  # maintained incrementally while in bottom_up mode
        row = frontier.agg(F.count("*"), F.sum("deg")).collect()[0]
        nq, nq_edges = int(row[0]), int(row[1])
        visited_total = nq  # rows in state (the driver-side visited counter)

        edges_since_cleanup = 0  # triggers SHUFFLE_CLEANUP_EDGE_BUDGET GCs

        if resume and checkpointer is not None and run_id is not None:
            loaded = checkpointer.load_superstep(run_id)
            if loaded is not None:
                state_df, _step = loaded
                state_df = (
                    state_df.join(deg_b, state_df["v"] == F.col("dv"), "left")
                    .select("v", "parent", "level", F.coalesce("deg", F.lit(0)).alias("deg"))
                    .localCheckpoint(eager=True)
                )
                level = int(state_df.agg(F.max("level")).collect()[0][0])
                frontier = state_df.filter(F.col("level") == level).localCheckpoint(eager=True)
                pieces = [state_df.filter(F.col("level") < level).localCheckpoint(eager=True), frontier]
                if level > 0:
                    prev_frontier = state_df.filter(F.col("level") == level - 1).localCheckpoint(
                        eager=True
                    )
                    prev_nq = int(prev_frontier.count())
                row = (
                    pieces[0]
                    .agg(F.coalesce(F.sum("deg"), F.lit(0)))
                    .collect()[0]
                )
                guard.visited_edges = int(row[0])
                fr = frontier.agg(F.count("*"), F.coalesce(F.sum("deg"), F.lit(0))).collect()[0]
                nq, nq_edges = int(fr[0]), int(fr[1])
                visited_total = int(state_df.count())
                # rehydrate direction AND the one-way growing flag from the
                # recorded superstep metrics — a resumed run that already took
                # its single B2T switch must not re-enter bottom_up
                guard.restore_from_metrics(checkpointer.metrics(run_id))
                guard.prev_nq = prev_nq

        while level < max_levels and nq > 0:
            prev_direction = guard.direction
            direction = guard.step(nq, nq_edges)
            if prev_direction == "bottom_up" and direction == "top_down":
                unvisited = None  # recomputed if bottom_up re-engages

            ts = time.perf_counter()
            # carry the level THROUGH the join instead of stamping a literal:
            # literal-free plans keep the same generated code across supersteps
            # (a changing lit(level) forces a whole-stage codegen recompile per
            # level — measurable fixed cost in the superstep latency)
            f_ids = frontier.select(F.col("v").alias("fv"), (F.col("level") + 1).alias("nlvl"))
            # driver-placed broadcast hint: the driver knows the exact frontier
            # size (the reference's allreduced counter); Catalyst's estimate for
            # a checkpointed frontier can otherwise pick the multi-million-row
            # adjacency as broadcast side, rebuilding that broadcast per level
            f_small = (
                F.broadcast(f_ids) if nq < BROADCAST_GATE else f_ids.hint("shuffle_hash")
            )

            if direction == "top_down":
                # B2/B3: expand from the frontier; candidate carries the
                # destination's degree so no per-level degree join is needed.
                # adj is cached pre-partitioned by src → never reshuffled.
                cand = adj.join(f_small, adj["src"] == F.col("fv")).select(
                    F.col("dst").alias("v"),
                    F.col("src").alias("parent"),
                    F.col("ddeg").alias("deg"),
                    F.col("nlvl"),
                )
                # deterministic first-writer-wins, map-side combined (hub-skew safe)
                winners = cand.groupBy("v").agg(
                    F.min("parent").alias("parent"),
                    F.max("deg").alias("deg"),
                    F.max("nlvl").alias("nlvl"),
                )
                # BFS level property: a neighbor of a level-L vertex lies at
                # level L-1, L, or L+1 — so excluding frontier ∪ prev_frontier
                # leaves EXACTLY the new level.  This replaces the anti-join
                # against the O(|V|) visited state (whose per-level broadcast/
                # shuffle was the flat cost capping strong scaling).
                exclude = frontier.select("v")
                if prev_frontier is not None:
                    exclude = exclude.union(prev_frontier.select("v"))
                # size-gated broadcast: near the direction switch the exclusion
                # set (frontier ∪ prev_frontier) can be a large fraction of |V| —
                # an unconditional broadcast hint there OOMs driver/executors at
                # cluster scale.  The driver knows both sizes exactly, so reuse
                # the same budget as the expand-side f_small gate: hinted
                # broadcast below it, plain shuffle anti-join above.
                exclude = exclude.withColumnRenamed("v", "xv")
                if nq + prev_nq < BROADCAST_GATE:
                    exclude = F.broadcast(exclude)
                else:
                    exclude = exclude.hint("shuffle_hash")
                winners = winners.join(exclude, winners["v"] == F.col("xv"), "left_anti")
            else:
                # B6/B7: drive from the unvisited side.  unvisited is computed
                # once at the direction switch, then shrunk incrementally —
                # winners ⊆ unvisited, so no anti-join at all here.
                if unvisited is None:
                    state = pieces[0] if len(pieces) == 1 else reduce(DataFrame.unionByName, pieces)
                    unvisited = (
                        deg.select("v")
                        .join(
                            state.select(F.col("v").alias("sv")).hint("shuffle_hash"),
                            F.col("v") == F.col("sv"),
                            "left_anti",
                        )
                        .localCheckpoint(eager=True)
                    )
                uv = unvisited.select(F.col("v").alias("uv")).hint("shuffle_hash")
                unvisited_edges = adj.join(uv, adj["src"] == F.col("uv"), "left_semi")
                cand = unvisited_edges.join(f_small, unvisited_edges["dst"] == F.col("fv")).select(
                    F.col("src").alias("v"),
                    F.col("dst").alias("parent"),
                    F.col("sdeg").alias("deg"),
                    F.col("nlvl"),
                )
                winners = cand.groupBy("v").agg(
                    F.min("parent").alias("parent"),
                    F.max("deg").alias("deg"),
                    F.max("nlvl").alias("nlvl"),
                )

            obs = Observation(f"bfs_l{level}")
            new_frontier = (
                winners.select("v", "parent", F.col("nlvl").cast("int").alias("level"), "deg")
                # the nq-stats Allreduce rides the SAME job as the frontier
                # materialization via observed metrics — ONE action per superstep
                .observe(obs, F.count(F.lit(1)).alias("nq"), F.sum("deg").alias("nq_edges"))
                .localCheckpoint(eager=True)
            )
            stats = obs.get
            new_nq, new_nq_edges = int(stats["nq"] or 0), int(stats["nq_edges"] or 0)
            if unvisited is not None and direction == "bottom_up" and new_nq > 0:
                nf = new_frontier.select(F.col("v").alias("nv"))
                if new_nq < BROADCAST_GATE:
                    nf = F.broadcast(nf)
                else:
                    nf = nf.hint("shuffle_hash")
                unvisited = unvisited.join(
                    nf, unvisited["v"] == F.col("nv"), "left_anti"
                ).localCheckpoint(eager=True)

            elapsed = time.perf_counter() - ts
            metrics.supersteps.append(
                {
                    "superstep": level,
                    "direction": direction,
                    "frontier_repr": guard.frontier_repr,
                    "frontier_size": nq,
                    "frontier_edges": nq_edges,
                    "elapsed_s": elapsed,
                }
            )
            pieces.append(new_frontier)
            if checkpointer is not None:
                full = reduce(DataFrame.unionByName, pieces).select("v", "parent", "level")
                checkpointer.save_superstep(
                    run_id or f"bfs_{root}", level + 1, full, metrics.supersteps[-1]
                )
            prev_frontier = frontier
            prev_nq = nq
            frontier = new_frontier
            edges_since_cleanup += nq_edges
            nq, nq_edges = new_nq, new_nq_edges
            visited_total += new_nq
            level += 1
            if edges_since_cleanup >= SHUFFLE_CLEANUP_EDGE_BUDGET:
                # reclaim dead shuffle files from completed supersteps (see
                # SHUFFLE_CLEANUP_EDGE_BUDGET above); only the checkpointed
                # frontiers survive, so the cleaner can drop every exchange
                # older than the previous level
                spark.sparkContext._jvm.System.gc()
                edges_since_cleanup = 0

        metrics.total_time_s = time.perf_counter() - t0
        # V6-style traversed-edge count: Σ deg(v) over visited / 2
        metrics.traversed_edges = guard.visited_edges // 2
        if own_deg:
            deg.unpersist()
        if own_adj:
            adj.unpersist()
        # consolidate the result into ONE fresh checkpoint, then free every
        # per-superstep checkpoint this run created — without this, repeated
        # roots accumulate O(levels) persisted RDDs per run and GC pressure
        # degrades later runs (the reference reuses preallocated buffers per
        # root for the same reason, mpi/bfs.hpp:315)
        state = scope.finalize(reduce(DataFrame.unionByName, pieces).select("v", "parent", "level"))
        return state, metrics
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", _old_sp)


def _bfs_driver(
    edges_sym: DataFrame,
    root: int,
    m_total: int,
    alpha: float,
    beta: float,
    max_levels: int,
) -> tuple[DataFrame, BfsMetrics]:
    """Driver (NumPy) BFS twin: one Arrow collect, the shared DirectionGuard
    per superstep (fed the identical nq/nq_edges sequence, and its decision
    actually executed: top_down expands, bottom_up scans unvisited), the
    deterministic min-parent contract, identical metrics counters."""
    import time

    import pandas as pd

    spark = edges_sym.sparkSession
    metrics = BfsMetrics()
    t0 = time.perf_counter()
    src, dst = _smallgraph.collect_edges(edges_sym)
    n_total = int(np.unique(np.concatenate([src, dst])).size) if src.size else 0
    guard = DirectionGuard(n_total, m_total, alpha, beta)
    if src.size == 0 or not np.isin(np.int64(root), src).item() and not np.isin(
        np.int64(root), dst
    ).item():
        state = spark.createDataFrame(
            [(int(root), int(root), 0)], "v long, parent long, level int"
        )
        metrics.total_time_s = time.perf_counter() - t0
        return state, metrics
    (verts, parent, level, reached), supersteps = _smallgraph.bfs_arrays(
        src, dst, root, guard, max_levels
    )
    metrics.supersteps = supersteps
    metrics.total_time_s = time.perf_counter() - t0
    metrics.traversed_edges = guard.visited_edges // 2
    state = spark.createDataFrame(
        pd.DataFrame(
            {
                "v": verts[reached],
                "parent": parent[reached],
                "level": level[reached].astype("int32"),
            }
        ),
        "v long, parent long, level int",
    )
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
