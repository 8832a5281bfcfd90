"""Shared-memory CSR BFS — the single-node high-TEPS path.

The reference's throughput comes from a CSR that lives in RAM for the whole
benchmark and is scanned with array kernels per level
(/root/reference/mpi/graph_constructor.hpp:1009-1033;
/root/reference/mpi/bfs.hpp:1128-2183).  The DataFrame BFS re-scans /
re-shuffles per level; this module closes that gap within Spark's execution
model:

* :func:`export_blocks` — the distributed CSR build (build_blocks) writes
  each block as ``.npy`` files under a directory (``/dev/shm`` locally).
  ``np.load(mmap_mode='r')`` in every Python worker then maps the SAME
  physical pages — one in-RAM copy shared by all cores, the Spark-world
  equivalent of the reference's per-rank CSR arrays.
* :func:`bfs_shm` — supersteps are ``spark.range(num_blocks) →
  mapInArrow(probe)``: no adjacency shuffle, no adjacency decode per level,
  task count = block count.  Frontier and visited ship as sorted NumPy
  id arrays (the reference's allgathered bitmaps, B5); probes are
  ``np.searchsorted`` (the hashed-id analog of O(1) bitmap tests).
  Candidates pre-dedup per block, aggregate with the usual deterministic
  ``min(parent)``, and the winner set returns to the driver via Arrow.

Block + per-step-array distribution goes through the ONE shared channel in
operators/_ship.py (same implementation msbfs uses): ``ship="dir"`` mmaps
the staging dir directly (single-host), ``ship="spark"`` is the tested
cluster-real mode — every file travels via sc.addFile/SparkFiles with no
shared-filesystem assumption.

Driver memory holds O(|V|) id arrays — exactly the reference's per-rank
state budget; beyond driver memory the join BFS (operators/bfs.py) is the
fallback physical strategy (documented in README).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph500_bfs_spark.operators._direction import (
    DEFAULT_ALPHA,
    DEFAULT_BETA,
    DirectionGuard,
)
from graph500_bfs_spark.operators.bfs import BfsMetrics
from graph500_bfs_spark.operators.csr_blocks import _gather_ranges, build_blocks


def export_blocks(
    edges_sym: DataFrame, num_blocks: int, path: str
) -> int:
    """Distributed CSR build → one (srcs, indptr, dsts) .npy triple per block."""
    os.makedirs(path, exist_ok=True)
    blocks = build_blocks(edges_sym, num_blocks)

    def save(rows):
        for r in rows:
            b = int(r["block"])
            np.save(f"{path}/b{b}_srcs.npy", np.asarray(r["srcs"], dtype=np.int64))
            np.save(f"{path}/b{b}_indptr.npy", np.asarray(r["indptr"], dtype=np.int64))
            np.save(f"{path}/b{b}_dsts.npy", np.asarray(r["dsts"], dtype=np.int64))

    blocks.foreachPartition(save)
    return num_blocks


def _load_block(path: str, b: int, rp=lambda p: p):
    """Load one CSR block triple; ``rp`` resolves paths through the ship
    channel (identity for "dir", SparkFiles.get for "spark")."""
    return (
        np.load(rp(f"{path}/b{b}_srcs.npy"), mmap_mode="r"),
        np.load(rp(f"{path}/b{b}_indptr.npy"), mmap_mode="r"),
        np.load(rp(f"{path}/b{b}_dsts.npy"), mmap_mode="r"),
    )


def _in_sorted(sorted_arr: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Membership of values in a sorted array (vectorized probe)."""
    if len(sorted_arr) == 0 or len(values) == 0:
        return np.zeros(len(values), dtype=bool)
    pos = np.searchsorted(sorted_arr, values)
    pos[pos >= len(sorted_arr)] = len(sorted_arr) - 1
    return sorted_arr[pos] == values


def bfs_shm(
    spark: SparkSession,
    blocks_path: str,
    num_blocks: int,
    root: int,
    degrees_np: tuple[np.ndarray, np.ndarray],
    m_edges: int,
    alpha: float = DEFAULT_ALPHA,
    beta: float = DEFAULT_BETA,
    max_levels: int = 1000,
    ship: str = "dir",
) -> tuple[DataFrame, BfsMetrics]:
    """Direction-optimizing BFS over exported shared-memory CSR blocks.

    ``degrees_np`` = (sorted vertex ids, degrees) — collected once per
    graph; the driver plays master rank with O(|V|) arrays (visited set,
    per-level frontiers) exactly as each reference rank holds its bitmap
    slice.  ``ship`` ("dir" | "spark") selects the shared distribution
    channel (operators/_ship.py) — "spark" needs no shared filesystem and
    is bit-identical to "dir" (tested).  Returns the usual
    (state(v,parent,level), metrics).
    """
    from graph500_bfs_spark.operators._ship import BlockShip

    shipper = BlockShip(spark, blocks_path, ship)
    dvs, ddeg = degrees_np
    n_total = len(dvs)
    metrics = BfsMetrics()
    t0 = time.perf_counter()

    out_schema = pa.schema([pa.field("v", pa.int64()), pa.field("parent", pa.int64())])
    frontier = np.array([root], dtype=np.int64)
    parents_acc = [np.array([root], dtype=np.int64)]
    vs_acc = [frontier]
    levels_acc = [0]
    visited = frontier.copy()
    level = 0
    # shared growing/shrinking direction guard (operators/_direction.py)
    guard = DirectionGuard(n_total, m_edges, alpha, beta)
    nq_edges = int(ddeg[np.searchsorted(dvs, root)]) if _in_sorted(dvs, frontier)[0] else 0

    base = spark.range(0, num_blocks, numPartitions=num_blocks)

    while level < max_levels and len(frontier) > 0:
        nq = len(frontier)
        direction = guard.step(nq, nq_edges)

        ts = time.perf_counter()
        # frontier/visited ship as .npy files through the shared channel,
        # NOT as Spark python broadcasts: a broadcast is unpickled into a
        # PRIVATE copy per worker process (N copies + N disk reads per
        # level); a shipped npy is mmap'd — one set of physical pages for
        # all workers on a host — the reference's allgathered bitmap
        f_path = shipper.stage(f"frontier_{level}", frontier)
        v_path = shipper.stage(f"visited_{level}", visited)
        d = direction
        path = blocks_path

        def probe(batches, _fp=f_path, _vp=v_path, _d=d, _p=path, _ship=ship,
                  _tag=shipper.export_tag):
            from graph500_bfs_spark.operators._ship import resolver

            rp = resolver(_ship, _tag)
            fr = np.load(rp(_fp), mmap_mode="r")
            vis = np.load(rp(_vp), mmap_mode="r")
            for batch in batches:
                for bid in batch.column(0).to_numpy(zero_copy_only=False):
                    b = int(bid)
                    # a hash-empty block writes no files — skip, don't crash
                    if not os.path.exists(rp(f"{_p}/b{b}_srcs.npy")):
                        continue
                    srcs, indptr, dsts = _load_block(_p, b, rp)
                    srcs = np.asarray(srcs)
                    if _d == "top_down":
                        # rows of frontier vertices → emit unvisited neighbors
                        hit = _in_sorted(fr, srcs)
                        rows = np.flatnonzero(hit)
                        out_d, rep = _gather_ranges(
                            np.asarray(dsts), np.asarray(indptr)[rows], np.asarray(indptr)[rows + 1]
                        )
                        par = srcs[rows][rep]
                        keep = ~_in_sorted(vis, out_d)
                        out_d, par = out_d[keep], par[keep]
                        # per-block dedup: min parent per dst
                        if len(out_d):
                            order = np.lexsort((par, out_d))
                            out_d, par = out_d[order], par[order]
                            first = np.concatenate([[True], out_d[1:] != out_d[:-1]])
                            out_d, par = out_d[first], par[first]
                        yield pa.RecordBatch.from_arrays(
                            [pa.array(out_d), pa.array(par)], schema=out_schema
                        )
                    else:
                        # bottom-up: unvisited rows scan for a frontier hit
                        unvis = np.flatnonzero(~_in_sorted(vis, srcs))
                        out_d, rep = _gather_ranges(
                            np.asarray(dsts), np.asarray(indptr)[unvis], np.asarray(indptr)[unvis + 1]
                        )
                        hits = _in_sorted(fr, out_d)
                        if not hits.any():
                            yield pa.RecordBatch.from_arrays(
                                [pa.array(np.empty(0, np.int64))] * 2, schema=out_schema
                            )
                            continue
                        hrows, hpar = rep[hits], out_d[hits]
                        order = np.lexsort((hpar, hrows))
                        hrows, hpar = hrows[order], hpar[order]
                        first = np.concatenate([[True], hrows[1:] != hrows[:-1]])
                        yield pa.RecordBatch.from_arrays(
                            [pa.array(srcs[unvis][hrows[first]]), pa.array(hpar[first])],
                            schema=out_schema,
                        )

        cand = base.mapInArrow(probe, "v long, parent long")
        # bottom-up winners are already unique per v (each v lives in one
        # block).  Top-down needs a cross-block min; when the level's edge
        # budget is small the dedup runs on the driver over the Arrow
        # collect — the whole superstep is then a single map-only job with
        # NO shuffle stage.  Only a large pre-switch top-down level pays
        # for a distributed aggregate.
        if direction == "top_down" and nq_edges > 4_000_000:
            winners = cand.groupBy("v").agg(F.min("parent").alias("parent"))
            pdf = winners.toPandas()
        else:
            pdf = cand.toPandas()
            if direction == "top_down" and len(pdf):
                a_v = pdf["v"].to_numpy(np.int64)
                a_p = pdf["parent"].to_numpy(np.int64)
                order = np.lexsort((a_p, a_v))
                a_v, a_p = a_v[order], a_p[order]
                first = np.concatenate([[True], a_v[1:] != a_v[:-1]])
                pdf = pd.DataFrame({"v": a_v[first], "parent": a_p[first]})
        shipper.cleanup_step()
        new_vs = pdf["v"].to_numpy(dtype=np.int64, copy=False)
        new_par = pdf["parent"].to_numpy(dtype=np.int64, copy=False)
        order = np.argsort(new_vs, kind="stable")
        new_vs, new_par = new_vs[order], new_par[order]

        metrics.supersteps.append(
            {
                "superstep": level,
                "direction": direction,
                "frontier_size": nq,
                "frontier_edges": nq_edges,
                "elapsed_s": time.perf_counter() - ts,
            }
        )
        if len(new_vs):
            vs_acc.append(new_vs)
            parents_acc.append(new_par)
            levels_acc.append(level + 1)
            visited = np.union1d(visited, new_vs)
            pos = np.searchsorted(dvs, new_vs)
            pos[pos >= len(dvs)] = len(dvs) - 1
            nq_edges = int(ddeg[pos][dvs[pos] == new_vs].sum())
        else:
            nq_edges = 0
        frontier = new_vs
        level += 1

    metrics.total_time_s = time.perf_counter() - t0
    metrics.traversed_edges = guard.visited_edges // 2

    all_v = np.concatenate(vs_acc)
    all_p = np.concatenate(parents_acc)
    all_l = np.concatenate(
        [np.full(len(v), lv, dtype=np.int32) for v, lv in zip(vs_acc, levels_acc)]
    )
    state = spark.createDataFrame(
        pd.DataFrame({"v": all_v, "parent": all_p, "level": all_l}),
        "v long, parent long, level int",
    )
    return state, metrics
