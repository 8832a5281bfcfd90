"""Per-partition CSR adjacency blocks inside vectorized Arrow UDFs.

The reference's central data structure is the per-rank 2D CSR
(/root/reference/mpi/graph_constructor.hpp:115-333) scanned with array
kernels (top_down_parallel_section, /root/reference/mpi/bfs.hpp:1128-1353).
This module is its Spark restatement (SURVEY §4 decision 1):

* :func:`build_blocks` materializes one row per hash block —
  ``(block, srcs, indptr, dsts)`` packed NumPy arrays — via
  ``applyInPandas`` over ``groupBy(pmod(xxhash64(src), P))``.  Built ONCE
  (P7's scatterAndStore + sortEdges + constructFromWideCSR collapsed into
  one aggregation), cached/persisted, reused across every root and
  superstep.
* :func:`bfs_blocks` runs the superstep loop with the frontier shipped as
  a *broadcast* NumPy array into a ``mapInArrow`` scan over the cached
  blocks — the exact shape of the reference's expand-allgather + local
  CSR scan (B5 + B2): no shuffle of adjacency data, ever; the only
  exchange is the candidate (dst, parent) aggregation.
* Bottom-up supersteps broadcast the *visited* array instead and probe
  from unvisited rows (B6), with ``np.searchsorted`` standing in for the
  reference's O(1) bitmap probes (sorted-array membership = the hashed-id
  analog; a dense reorder map would recover true bitmaps).

STATUS (round 3): REFERENCE-ONLY strategy, not benchmarked.  A Spark
python broadcast is unpickled into a PRIVATE copy per worker process (N
copies + N disk reads per level) and the per-level ``toPandas`` frontier
collect adds a fixed driver round-trip — the exact costs the mmap'd-file
shipping of csr_shm.py/msbfs.py removes (PLANS.md item 8 measured
5-7 s/superstep for the broadcast path).  The module stays for (a) the
``build_blocks`` distributed CSR construction kernel every other strategy
reuses and (b) the strategy-equivalence tests; use bfs_shm/bfs_multi for
performance, operators/bfs.py beyond driver memory.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph500_bfs_spark.operators._mem import CheckpointScope
from graph500_bfs_spark.operators._direction import (
    DEFAULT_ALPHA,
    DEFAULT_BETA,
    DirectionGuard,
)
from graph500_bfs_spark.operators.bfs import BfsMetrics

BLOCK_SCHEMA = (
    "block int, srcs array<long>, indptr array<long>, dsts array<long>"
)


def build_blocks(edges_sym: DataFrame, num_blocks: int | None = None) -> DataFrame:
    """One CSR row per hash block.  The groupBy is the single shuffle of
    construction; inside each group plain NumPy builds (srcs, indptr, dsts).
    """
    spark = edges_sym.sparkSession
    p = num_blocks or spark.sparkContext.defaultParallelism

    def make_csr(pdf: pd.DataFrame) -> pd.DataFrame:
        block = int(pdf["block"].iloc[0])
        src = pdf["src"].to_numpy()
        dst = pdf["dst"].to_numpy()
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        srcs, starts = np.unique(src, return_index=True)
        indptr = np.append(starts, len(dst)).astype(np.int64)
        return pd.DataFrame(
            {
                "block": [block],
                "srcs": [srcs],
                "indptr": [indptr],
                "dsts": [dst],
            }
        )

    e = edges_sym.withColumn(
        "block", F.pmod(F.xxhash64("src"), F.lit(p)).cast("int")
    )
    return e.groupBy("block").applyInPandas(make_csr, BLOCK_SCHEMA)


def _gather_ranges(values: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    """Concatenate values[starts[i]:ends[i]] for all i, plus a row-id map —
    the vectorized 'enumerate CSR rows' kernel (no Python loop)."""
    lens = ends - starts
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=values.dtype), np.empty(0, dtype=np.int64)
    # index trick: ranges [s_i, e_i) flattened via cumulative offsets
    rep = np.repeat(np.arange(len(starts)), lens)
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
    idx = starts[rep] + (np.arange(total) - offsets[rep])
    return values[idx], rep


def bfs_blocks(
    blocks: DataFrame,
    root: int,
    n_vertices: int,
    m_edges: int,
    degrees: DataFrame,
    alpha: float = DEFAULT_ALPHA,
    beta: float = DEFAULT_BETA,
    max_levels: int = 1000,
) -> tuple[DataFrame, BfsMetrics]:
    """Direction-optimizing BFS over cached CSR blocks.

    Returns (state(v, parent, level), metrics) — same contract and same
    deterministic min-parent winners as operators.bfs.bfs.
    """
    spark = blocks.sparkSession
    sc = spark.sparkContext
    scope = CheckpointScope(spark)
    metrics = BfsMetrics()
    t0 = time.perf_counter()

    deg_map = degrees  # (v, deg), cached by caller
    out_schema = pa.schema([pa.field("v", pa.int64()), pa.field("parent", pa.int64())])

    # driver-held visited set (sorted) — the master-rank mirror of the
    # distributed state; at 10^12 scale this moves to the bitmap-over-
    # dense-ids form or the join-based fallback
    state_rows = [(int(root), int(root), 0)]
    visited = np.array([int(root)], dtype=np.int64)
    frontier = np.array([int(root)], dtype=np.int64)
    level = 0
    # shared growing/shrinking direction guard (operators/_direction.py)
    guard = DirectionGuard(n_vertices, m_edges, alpha, beta)
    root_deg = deg_map.filter(F.col("v") == root).collect()
    nq_edges = int(root_deg[0]["deg"]) if root_deg else 0

    state_df = spark.createDataFrame(state_rows, "v long, parent long, level int")
    pieces = [state_df.localCheckpoint(eager=True)]

    while level < max_levels and len(frontier) > 0:
        nq = len(frontier)
        direction = guard.step(nq, nq_edges)

        ts = time.perf_counter()
        bc_frontier = sc.broadcast(np.sort(frontier))
        bc_visited = sc.broadcast(visited)  # already sorted
        dir_now = direction

        def expand(batches, _f=bc_frontier, _v=bc_visited, _d=dir_now):
            fr = _f.value
            vis = _v.value
            if len(fr) == 0:
                return
            for batch in batches:
                tbl = batch
                srcs_l = tbl.column("srcs")
                indptr_l = tbl.column("indptr")
                dsts_l = tbl.column("dsts")
                for i in range(tbl.num_rows):
                    srcs = srcs_l[i].values.to_numpy(zero_copy_only=False).astype(np.int64)
                    indptr = indptr_l[i].values.to_numpy(zero_copy_only=False).astype(np.int64)
                    dsts = dsts_l[i].values.to_numpy(zero_copy_only=False).astype(np.int64)
                    if _d == "top_down":
                        # rows whose src is in the frontier (sorted probe)
                        pos = np.searchsorted(fr, srcs)
                        pos[pos >= len(fr)] = len(fr) - 1
                        hit = fr[pos] == srcs
                        rows = np.flatnonzero(hit)
                        out_d, rep = _gather_ranges(dsts, indptr[rows], indptr[rows + 1])
                        parents = srcs[rows][rep]
                        # local visited filter (shrinks the shuffle)
                        vpos = np.searchsorted(vis, out_d)
                        vpos[vpos >= len(vis)] = len(vis) - 1
                        keep = vis[vpos] != out_d
                        yield pa.RecordBatch.from_arrays(
                            [pa.array(out_d[keep]), pa.array(parents[keep])],
                            schema=out_schema,
                        )
                    else:
                        # bottom-up: unvisited rows probe the frontier
                        vpos = np.searchsorted(vis, srcs)
                        vpos[vpos >= len(vis)] = len(vis) - 1
                        unvis = np.flatnonzero(vis[vpos] != srcs)
                        out_d, rep = _gather_ranges(dsts, indptr[unvis], indptr[unvis + 1])
                        fpos = np.searchsorted(fr, out_d)
                        fpos[fpos >= len(fr)] = len(fr) - 1
                        hits = fr[fpos] == out_d
                        if not hits.any():
                            yield pa.RecordBatch.from_arrays(
                                [pa.array(np.empty(0, np.int64))] * 2, schema=out_schema
                            )
                            continue
                        hrows = rep[hits]
                        hparents = out_d[hits]
                        # min parent per row (deterministic contract)
                        order = np.lexsort((hparents, hrows))
                        hrows, hparents = hrows[order], hparents[order]
                        first = np.concatenate([[True], hrows[1:] != hrows[:-1]])
                        yield pa.RecordBatch.from_arrays(
                            [pa.array(srcs[unvis][hrows[first]]), pa.array(hparents[first])],
                            schema=out_schema,
                        )

        cand = blocks.mapInArrow(expand, "v long, parent long")
        winners = (
            cand.groupBy("v")
            .agg(F.min("parent").alias("parent"))
            .select("v", "parent", F.lit(level + 1).cast("int").alias("level"))
        )
        new_rows = winners.localCheckpoint(eager=True)
        # fused stats: count + Σdeg(new frontier) via degree join
        agg = (
            new_rows.join(deg_map.withColumnRenamed("v", "dv"), new_rows["v"] == F.col("dv"), "left")
            .agg(F.count("*"), F.coalesce(F.sum("deg"), F.lit(0)))
            .collect()[0]
        )
        new_nq, new_nq_edges = int(agg[0]), int(agg[1])
        # Arrow-path frontier gather (the reference's allgather, B5) — a
        # columnar batch transfer, not row objects
        new_frontier = np.sort(
            new_rows.select("v").toPandas()["v"].to_numpy(dtype=np.int64, copy=False)
        )

        bc_frontier.destroy()
        bc_visited.destroy()

        metrics.supersteps.append(
            {
                "superstep": level,
                "direction": direction,
                "frontier_size": nq,
                "frontier_edges": nq_edges,
                "elapsed_s": time.perf_counter() - ts,
            }
        )
        pieces.append(new_rows)
        visited = np.union1d(visited, new_frontier)
        frontier = new_frontier
        nq_edges = new_nq_edges
        level += 1

    metrics.total_time_s = time.perf_counter() - t0
    metrics.traversed_edges = guard.visited_edges // 2
    from functools import reduce

    state = scope.finalize(reduce(DataFrame.unionByName, pieces))
    return state, metrics
