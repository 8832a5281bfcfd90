"""Multi-source shared-memory BFS over dense-index bitmaps.

Completes the reference-architecture restatement (SURVEY §1.1, §2.3):

* **dense reorder map** (P6): the sorted vertex-id array gives every vertex
  a dense index; blocks store, alongside the CSR ids, the *precomputed
  dense indices* of every src row and dst entry, so per-level membership
  tests are O(1) bit probes — exactly the reference's reordered-id bitmap
  probes (NBPE=64 words, /root/reference/mpi/parameters.h:160-201) — not
  O(log n) searches.
* **frontier/visited bitmaps** (B5): 1 bit per vertex per root, written as
  mmap'd files in the shared-memory dir each superstep (~n/8 bytes — 1 MB
  at scale 24); every worker maps the same physical pages.
* **multi-source batching**: all R roots advance in ONE map-only Spark job
  per global step, so the fixed superstep cost (job launch, worker IPC,
  Arrow collect) is amortized R× — the published MS-BFS idea (The More the
  Merrier: Efficient Multi-Source Graph Traversal, VLDB 2015) applied to
  the Graph500 64-root protocol.  Each root keeps its OWN α/β direction
  state, and per-root results are bit-identical to single-source BFS
  (deterministic min-parent contract) — tested.

Per-root TEPS from a batch is not spec-comparable (time is shared), so the
harness reports batch aggregate throughput: Σ traversed_edges / wall.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph500_bfs_spark.operators.bfs import (
    DEFAULT_ALPHA,
    DEFAULT_BETA,
    DEFAULT_EDGEFACTOR,
    BfsMetrics,
)
from graph500_bfs_spark.operators.csr_blocks import _gather_ranges, build_blocks


def export_blocks_indexed(
    edges_sym: DataFrame, num_blocks: int, path: str, vertex_ids_sorted: np.ndarray
) -> None:
    """CSR blocks + dense-index sidecars, one export per graph.

    Files per block b: b{b}_srcs/indptr/dsts (.npy, vertex ids) plus
    b{b}_srcidx/dstidx (.npy, positions in the global sorted vertex array).
    Plus vertex_ids.npy — the dense reorder map itself.
    """
    os.makedirs(path, exist_ok=True)
    np.save(f"{path}/vertex_ids.npy", vertex_ids_sorted)
    blocks = build_blocks(edges_sym, num_blocks)
    vpath = f"{path}/vertex_ids.npy"

    def save(rows):
        dvs = np.load(vpath, mmap_mode="r")
        for r in rows:
            b = int(r["block"])
            srcs = np.asarray(r["srcs"], dtype=np.int64)
            indptr = np.asarray(r["indptr"], dtype=np.int64)
            dsts = np.asarray(r["dsts"], dtype=np.int64)
            np.save(f"{path}/b{b}_srcs.npy", srcs)
            np.save(f"{path}/b{b}_indptr.npy", indptr)
            np.save(f"{path}/b{b}_dsts.npy", dsts)
            np.save(f"{path}/b{b}_srcidx.npy", np.searchsorted(dvs, srcs).astype(np.int64))
            np.save(f"{path}/b{b}_dstidx.npy", np.searchsorted(dvs, dsts).astype(np.int64))

    blocks.foreachPartition(save)


def _bottom_up_scan(
    srcs_a: np.ndarray,
    indptr: np.ndarray,
    dsts: np.ndarray,
    dstidx: np.ndarray,
    rows: np.ndarray,
    fbit: np.ndarray,
    max_chunks: int = 8,
) -> tuple[np.ndarray, np.ndarray]:
    """Early-exit bottom-up row scan: probe one neighbor per row per pass,
    dropping rows on their first frontier hit — the vectorized form of the
    reference's per-vertex scan-until-found loop
    (/root/reference/mpi/bfs.hpp:1817-1850).  Adjacency is dst-sorted
    within each row, so the first hit IS the minimum parent (deterministic
    contract preserved).  After ``max_chunks`` passes the surviving rows
    (mostly heavy hubs with no early hit) fall back to a full gather.
    """
    cur = indptr[rows].copy()
    end = indptr[rows + 1]
    out_v, out_p = [], []
    for _ in range(max_chunks):
        alive = cur < end
        if not alive.any():
            rows = rows[:0]
            break
        rows, cur, end = rows[alive], cur[alive], end[alive]
        nb = dstidx[cur]
        hit = _bit_test(fbit, nb) == 1
        if hit.any():
            out_v.append(srcs_a[rows[hit]])
            out_p.append(dsts[cur[hit]])
            keep = ~hit
            rows, cur, end = rows[keep], cur[keep] + 1, end[keep]
        else:
            cur += 1
    if len(rows):
        # fallback: full gather for the survivors (bounded residual work)
        oidx, rep = _gather_ranges(dstidx, cur, end)
        hits = _bit_test(fbit, oidx) == 1
        if hits.any():
            od, _ = _gather_ranges(dsts, cur, end)
            hrows, hpar = rep[hits], od[hits]
            order = np.lexsort((hpar, hrows))
            hrows, hpar = hrows[order], hpar[order]
            first = np.concatenate([[True], hrows[1:] != hrows[:-1]])
            out_v.append(srcs_a[rows[hrows[first]]])
            out_p.append(hpar[first])
    if not out_v:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(out_v), np.concatenate(out_p)


def _bit_test(bitmap: np.ndarray, idx: np.ndarray) -> np.ndarray:
    return (bitmap[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1


def _bit_set(bitmap: np.ndarray, idx: np.ndarray) -> None:
    np.bitwise_or.at(bitmap, idx >> 3, (1 << (idx & 7)).astype(np.uint8))


def bfs_multi(
    spark: SparkSession,
    blocks_path: str,
    num_blocks: int,
    roots: list[int],
    degrees_np: tuple[np.ndarray, np.ndarray],
    m_edges: int,
    alpha: float = DEFAULT_ALPHA,
    beta: float = DEFAULT_BETA,
    max_levels: int = 1000,
) -> tuple[dict[int, DataFrame], BfsMetrics]:
    """Run BFS from every root concurrently; returns ({root: state}, metrics).

    metrics.traversed_edges = Σ over roots; metrics.total_time_s = batch wall
    → aggregate throughput.  Per-root state matches single-source bfs_shm.
    """
    dvs, ddeg = degrees_np
    n_total = len(dvs)
    nbytes = (n_total + 7) // 8
    R = len(roots)
    metrics = BfsMetrics()
    t0 = time.perf_counter()
    out_schema = pa.schema(
        [pa.field("r", pa.int32()), pa.field("v", pa.int64()), pa.field("parent", pa.int64())]
    )

    class RootState:
        def __init__(self, rid, root):
            self.rid = rid
            self.root = root
            self.frontier = np.array([root], dtype=np.int64)
            self.vbit = np.zeros(nbytes, dtype=np.uint8)
            ridx = np.searchsorted(dvs, np.array([root], dtype=np.int64))
            pos = int(ridx[0])
            if pos >= len(dvs) or dvs[pos] != root:
                raise ValueError(f"BFS root {root} is not a vertex of this graph")
            _bit_set(self.vbit, ridx)
            self.direction = "top_down"
            self.nq_edges = int(ddeg[pos])
            self.visited_edges = 0
            self.growing = True  # growing/shrinking guard, ref bfs.hpp:3414-3429
            self.prev_nq = 0
            self.vs = [self.frontier]
            self.parents = [np.array([root], dtype=np.int64)]
            self.levels = [0]
            self.done = False
            self.supersteps = 0

    states = [RootState(i, r) for i, r in enumerate(roots)]
    base = spark.range(0, num_blocks, numPartitions=num_blocks)
    step = 0

    while any(not s.done for s in states) and step < max_levels:
        active = [s for s in states if not s.done]
        # per-root direction decision (independent α/β state machines)
        for s in active:
            s.visited_edges += s.nq_edges
            # growing/shrinking guard (ref bfs.hpp:3414-3429): T2B only while
            # the frontier still grows; B2T only once shrinking, and the
            # growing phase is never re-entered — prevents direction
            # flip-flop on plateau frontiers.
            nq_now = len(s.frontier)
            if s.direction == "top_down":
                if (
                    s.growing
                    and nq_now > s.prev_nq
                    and s.nq_edges > (m_edges - s.visited_edges) / alpha
                ):
                    s.direction = "bottom_up"
            else:
                if (not s.growing or nq_now <= s.prev_nq) and nq_now < n_total / (
                    beta * DEFAULT_EDGEFACTOR * 2.0
                ):
                    s.direction = "top_down"
                    s.growing = False
            s.prev_nq = nq_now

        # ship per-root frontier bitmap + visited bitmap + direction
        manifest = []
        for s in active:
            fbit = np.zeros(nbytes, dtype=np.uint8)
            fidx = np.searchsorted(dvs, s.frontier)
            _bit_set(fbit, fidx)
            fb = f"{blocks_path}/r{s.rid}_s{step}_f.npy"
            vb = f"{blocks_path}/r{s.rid}_s{step}_v.npy"
            np.save(fb, fbit)
            np.save(vb, s.vbit)
            manifest.append((s.rid, s.direction, fb, vb))

        bp = blocks_path

        def probe(batches, _m=tuple(manifest), _p=bp):
            for batch in batches:
                for bid in batch.column(0).to_numpy(zero_copy_only=False):
                    b = int(bid)
                    # a hash-empty block writes no files (build_blocks only
                    # emits rows for non-empty partitions) — skip, don't crash
                    if not os.path.exists(f"{_p}/b{b}_srcs.npy"):
                        continue
                    srcs = np.load(f"{_p}/b{b}_srcs.npy", mmap_mode="r")
                    indptr = np.asarray(np.load(f"{_p}/b{b}_indptr.npy", mmap_mode="r"))
                    dsts = np.load(f"{_p}/b{b}_dsts.npy", mmap_mode="r")
                    srcidx = np.asarray(np.load(f"{_p}/b{b}_srcidx.npy", mmap_mode="r"))
                    dstidx = np.load(f"{_p}/b{b}_dstidx.npy", mmap_mode="r")
                    srcs_a = np.asarray(srcs)
                    for rid, d, fb, vb in _m:
                        fbit = np.load(fb, mmap_mode="r")
                        vbit = np.load(vb, mmap_mode="r")
                        if d == "top_down":
                            rows = np.flatnonzero(_bit_test(fbit, srcidx))
                            out_d, rep = _gather_ranges(
                                np.asarray(dsts), indptr[rows], indptr[rows + 1]
                            )
                            oidx, _ = _gather_ranges(
                                np.asarray(dstidx), indptr[rows], indptr[rows + 1]
                            )
                            keep = _bit_test(vbit, oidx) == 0
                            out_d, par = out_d[keep], srcs_a[rows][rep][keep]
                            if len(out_d):
                                order = np.lexsort((par, out_d))
                                out_d, par = out_d[order], par[order]
                                first = np.concatenate([[True], out_d[1:] != out_d[:-1]])
                                out_d, par = out_d[first], par[first]
                        else:
                            unvis = np.flatnonzero(_bit_test(vbit, srcidx) == 0)
                            out_d, par = _bottom_up_scan(
                                srcs_a,
                                indptr,
                                np.asarray(dsts),
                                np.asarray(dstidx),
                                unvis,
                                np.asarray(fbit),
                            )
                        if len(out_d):
                            yield pa.RecordBatch.from_arrays(
                                [
                                    pa.array(np.full(len(out_d), rid, dtype=np.int32)),
                                    pa.array(out_d),
                                    pa.array(par),
                                ],
                                schema=out_schema,
                            )

        pdf = base.mapInArrow(probe, "r int, v long, parent long").toPandas()

        for s in active:
            sub = pdf[pdf["r"] == s.rid]
            if len(sub) == 0:
                s.done = True
                s.frontier = np.empty(0, dtype=np.int64)
                continue
            a_v = sub["v"].to_numpy(np.int64)
            a_p = sub["parent"].to_numpy(np.int64)
            # cross-block min-parent dedup (top_down); bottom_up rows are
            # already unique per v (a src's row lives in one block)
            order = np.lexsort((a_p, a_v))
            a_v, a_p = a_v[order], a_p[order]
            first = np.concatenate([[True], a_v[1:] != a_v[:-1]])
            a_v, a_p = a_v[first], a_p[first]
            s.vs.append(a_v)
            s.parents.append(a_p)
            s.levels.append(s.supersteps + 1)
            idx = np.searchsorted(dvs, a_v)
            _bit_set(s.vbit, idx)
            s.frontier = a_v
            s.nq_edges = int(ddeg[idx].sum())
            s.supersteps += 1

        for rid, d, fb, vb in manifest:
            os.unlink(fb)
            os.unlink(vb)
        metrics.supersteps.append(
            {
                "superstep": step,
                "direction": "+".join(sorted({s.direction for s in active})),
                "frontier_size": int(sum(len(s.frontier) for s in active)),
                "frontier_edges": int(sum(s.nq_edges for s in active)),
                "elapsed_s": 0.0,
            }
        )
        step += 1

    metrics.total_time_s = time.perf_counter() - t0
    metrics.traversed_edges = sum(s.visited_edges for s in states) // 2

    results = {}
    for s in states:
        all_v = np.concatenate(s.vs)
        all_p = np.concatenate(s.parents)
        all_l = np.concatenate(
            [np.full(len(v), lv, dtype=np.int32) for v, lv in zip(s.vs, s.levels)]
        )
        results[s.root] = spark.createDataFrame(
            pd.DataFrame({"v": all_v, "parent": all_p, "level": all_l}),
            "v long, parent long, level int",
        )
    return results, metrics
