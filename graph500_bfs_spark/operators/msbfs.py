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

from graph500_bfs_spark.operators._direction import (
    DEFAULT_ALPHA,
    DEFAULT_BETA,
    DirectionGuard,
)
from graph500_bfs_spark.operators._ship import BlockShip
from graph500_bfs_spark.operators.bfs import BfsMetrics
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

    Returns (row_positions, parents): positions index the block's local
    srcs/srcidx arrays so the caller picks ids OR dense indices without a
    searchsorted.
    """
    cur = indptr[rows].copy()
    end = indptr[rows + 1]
    out_r, out_p = [], []
    for _ in range(max_chunks):
        alive = cur < end
        if not alive.any():
            rows = rows[:0]
            break
        rows, cur, end = rows[alive], cur[alive], end[alive]
        nb = dstidx[cur]
        hit = _bit_test(fbit, nb) == 1
        if hit.any():
            out_r.append(rows[hit])
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
            out_r.append(rows[hrows[first]])
            out_p.append(hpar[first])
    if not out_r:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(out_r), np.concatenate(out_p)


def _bit_test(bitmap: np.ndarray, idx: np.ndarray) -> np.ndarray:
    return (bitmap[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1


def _bit_set(bitmap: np.ndarray, idx: np.ndarray) -> None:
    """OR bits idx into bitmap.  bool-scatter + packbits is ~20x faster than
    np.bitwise_or.at (ufunc.at is per-element); falls back for tiny inputs
    where allocating the bool array would dominate."""
    if len(idx) >= 4096:
        b = np.zeros(len(bitmap) * 8, dtype=bool)
        b[idx] = True
        bitmap |= np.packbits(b, bitorder="little")
    else:
        np.bitwise_or.at(bitmap, idx >> 3, (1 << (idx & 7)).astype(np.uint8))


def _save_batch_checkpoint(path: str, sig: dict, states, step: int) -> None:
    """Atomic per-root state snapshot (ONE .npz, tmp-write + rename): the
    msbfs analog of the join path's per-superstep CheckpointManager — a
    kill inside a batch resumes at the last saved superstep instead of
    restarting every root (reference LOGFILE granularity extended
    mid-root, /root/reference/mpi/logfile.h:141-150)."""
    import json

    os.makedirs(path, exist_ok=True)
    arrays = {}
    meta = {"sig": sig, "step": int(step), "states": {}}
    for s in states:
        off = np.concatenate([[0], np.cumsum([len(v) for v in s.vis])]).astype(np.int64)
        arrays[f"r{s.rid}_vis"] = (
            np.concatenate(s.vis) if s.vis else np.empty(0, np.int64)
        )
        arrays[f"r{s.rid}_par"] = (
            np.concatenate(s.parents) if s.parents else np.empty(0, np.int64)
        )
        arrays[f"r{s.rid}_off"] = off
        arrays[f"r{s.rid}_fidx"] = s.fidx
        g = s.guard
        meta["states"][str(s.rid)] = {
            "root": int(s.root),
            "done": bool(s.done),
            "supersteps": int(s.supersteps),
            "levels": [int(x) for x in s.levels],
            "nq_edges": int(s.nq_edges),
            "guard": {
                "direction": g.direction,
                "growing": bool(g.growing),
                "prev_nq": int(g.prev_nq),
                "visited_edges": int(g.visited_edges),
                "frontier_repr": g.frontier_repr,
            },
        }
    arrays["_meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    tmp = os.path.join(path, "snap.tmp.npz")
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, os.path.join(path, "snap.npz"))


def _load_batch_checkpoint(path: str, sig: dict):
    """Returns (meta, npz) for a snapshot matching ``sig``, else None."""
    import json
    import zipfile

    f = os.path.join(path, "snap.npz")
    if not os.path.exists(f):
        return None
    try:
        z = np.load(f)
        meta = json.loads(bytes(z["_meta"]).decode())
    except (zipfile.BadZipFile, KeyError, ValueError, OSError):
        return None  # torn snapshot (kill mid-write before the rename)
    if meta.get("sig") != sig:
        return None  # different batch/graph — ignore, start fresh
    return meta, z


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
    ship: str = "dir",
    merge: str = "adaptive",
    adaptive_merge_bytes: int = 1 << 30,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 4,
    interrupt_at_step: int | None = None,
) -> tuple[dict[int, DataFrame], BfsMetrics]:
    """Run BFS from every root concurrently; returns ({root: state}, metrics).

    metrics.traversed_edges = Σ over roots; metrics.total_time_s = batch wall
    → aggregate throughput.  Per-root state matches single-source bfs_shm.

    Driver fixed cost per superstep is kept sublinear in R and |frontier|:
    one (A, 2, nbytes) bitmap file per step instead of 2A files, workers
    return DENSE indices (no driver searchsorted), the cross-block
    min-parent dedup is ONE lexsort over the whole Arrow batch (not R
    pandas scans), and the collect is Arrow-native (toArrow, no pandas
    conversion).

    ``merge`` selects WHERE the cross-block min-parent dedup runs:

    * ``"driver"`` — the probe's per-(block, root) candidates stream to the
      driver, which packs (vi, parent) into uint64 keys and sorts (fastest
      on one node: no shuffle stage, the superstep is a single map-only
      job).  The driver is then the frontier-merge hub — it receives
      O(candidate) rows per step.
    * ``"spark"`` — the dedup is a distributed ``groupBy(r, vi).min(parent)``
      BETWEEN the probe and the collect (the executor-side analog of the
      reference's per-rank NQ merge before its allgather,
      /root/reference/mpi/bfs.hpp:634-696): Catalyst's partial aggregation
      combines map-side and the driver receives ONLY final winners
      (≤ Σ new-frontier sizes, never the duplicated candidate set).  Costs
      one shuffle per superstep; at cluster scale that shuffle is sized by
      the frontier, not the graph, and the driver stops being the merge
      hub.  Results are bit-identical to ``"driver"`` (same min contract) —
      tested.
    * ``"adaptive"`` (default) — pick per SUPERSTEP from the exact
      counters the driver already holds BEFORE launching the probe (the
      same counter-driven style as the broadcast gates in bfs.py).  Only
      TOP-DOWN roots contribute to the estimate (Σ min(nq_edges, n) × 20
      bytes): top-down dsts arrive from many blocks, so the executor
      merge genuinely shrinks what the driver ingests; bottom-up rows are
      already globally unique (each CSR src row lives in exactly ONE
      block), so shuffling them buys nothing — same-session measurement
      at scale 22 put the executor merge on the bottom-up peaks at 3-4×
      the cost for zero benefit (BENCH/ab_merge_modes_s22_r32.json).
      Below ``adaptive_merge_bytes`` (default 1 GiB — well under the
      engine's 8g maxResultSize) the driver merge wins (no shuffle
      stage); above it the executor merge keeps the duplicated top-down
      candidate set off the driver.  Per-step choice is recorded in
      ``metrics.supersteps[i]["merge"]``.  Both modes honor the same min
      contract, so the flip never changes the answer (tested).

    Driver-resident state (both merge modes) is the per-root visited
    bitmaps + shipped bitmap packs + accumulated result id lists — see
    :func:`driver_state_bytes` for the formula and :func:`bfs_roots` for
    the dispatcher that flips to the fully-distributed join BFS when that
    budget would overflow driver memory.

    ``ship`` selects the CSR-block + per-step-bitmap distribution channel:

    * ``"dir"`` — workers open ``blocks_path`` directly.  Fastest on one
      host (every worker mmaps the same /dev/shm pages) but on a real
      cluster it requires ``blocks_path`` to be a shared filesystem.
    * ``"spark"`` — CLUSTER-REAL with NO shared-FS assumption: the driver
      registers every file with ``sc.addFile`` and workers resolve it via
      ``SparkFiles.get``.  Spark's file server ships each file ONCE per
      executor host (fetched at first task, cached in the executor's
      files dir for the rest of the job/application), after which all
      worker processes on that host mmap the same local copy — the same
      one-copy-per-host property as the shared dir, delivered by Spark's
      own transport (the analog of the reference's per-rank CSR +
      allgathered bitmaps, mpi/bfs.hpp:680-696).  Per-step bitmap files
      get a unique run tag (re-adding a changed file under the same name
      is an error in Spark); executor-side copies are reclaimed at
      application exit.

    ``checkpoint_dir`` enables MID-BATCH resume: every ``checkpoint_every``
    supersteps the full per-root state (level lists, frontier, guard) is
    snapshotted atomically; a killed batch re-invoked with the same
    checkpoint_dir + roots + graph resumes at the last snapshot and
    produces bit-identical final states (tested) — the same granularity
    the join path gets from CheckpointManager.  ONE snapshot slot per dir
    (use a distinct checkpoint_dir per concurrent batch); a snapshot from
    a different (roots, graph) signature is ignored, and the slot is
    cleared on completion.  ``interrupt_at_step`` is the kill-simulation
    test hook.
    """
    dvs, ddeg = degrees_np
    n_total = len(dvs)
    nbytes = (n_total + 7) // 8
    metrics = BfsMetrics()
    t0 = time.perf_counter()
    if merge not in ("driver", "spark", "adaptive"):
        raise ValueError(f"unknown merge mode {merge!r}")
    # ONE shipping implementation for all CSR strategies (operators/_ship.py):
    # registers the immutable block files, clears stale transients, and
    # stages the per-step bitmap packs below
    shipper = BlockShip(spark, blocks_path, ship)
    out_schema = pa.schema(
        [pa.field("r", pa.int32()), pa.field("vi", pa.int64()), pa.field("parent", pa.int64())]
    )

    class RootState:
        def __init__(self, rid, root):
            self.rid = rid
            self.root = root
            self.vbit = np.zeros(nbytes, dtype=np.uint8)
            ridx = np.searchsorted(dvs, np.array([root], dtype=np.int64))
            pos = int(ridx[0])
            if pos >= len(dvs) or dvs[pos] != root:
                raise ValueError(f"BFS root {root} is not a vertex of this graph")
            _bit_set(self.vbit, ridx)
            self.fidx = ridx  # frontier as dense indices into dvs
            # shared growing/shrinking state machine (operators/_direction.py)
            self.guard = DirectionGuard(n_total, m_edges, alpha, beta)
            self.nq_edges = int(ddeg[pos])
            self.vis = [ridx]  # per-level dense indices
            self.n_reached = 1  # running Σ len(vis) — adaptive-merge counter
            self.parents = [np.array([root], dtype=np.int64)]
            self.levels = [0]
            self.done = False
            self.supersteps = 0

    states = [RootState(i, r) for i, r in enumerate(roots)]
    base = spark.range(0, num_blocks, numPartitions=num_blocks)
    step = 0
    ckpt_sig = {
        "roots": [int(r) for r in roots],
        "n": int(n_total),
        "m": int(m_edges),
    }
    if checkpoint_dir:
        snap = _load_batch_checkpoint(checkpoint_dir, ckpt_sig)
        if snap is not None:
            meta, z = snap
            step = int(meta["step"])
            for s in states:
                d = meta["states"][str(s.rid)]
                off = z[f"r{s.rid}_off"]
                vis_flat = np.asarray(z[f"r{s.rid}_vis"], dtype=np.int64)
                par_flat = np.asarray(z[f"r{s.rid}_par"], dtype=np.int64)
                s.vis = [vis_flat[off[i]:off[i + 1]] for i in range(len(off) - 1)]
                s.n_reached = int(len(vis_flat))
                s.parents = [par_flat[off[i]:off[i + 1]] for i in range(len(off) - 1)]
                s.levels = list(d["levels"])
                s.fidx = np.asarray(z[f"r{s.rid}_fidx"], dtype=np.int64)
                s.done = bool(d["done"])
                s.supersteps = int(d["supersteps"])
                s.nq_edges = int(d["nq_edges"])
                s.vbit = np.zeros(nbytes, dtype=np.uint8)
                if len(vis_flat):
                    _bit_set(s.vbit, vis_flat)
                g = d["guard"]
                s.guard.direction = g["direction"]
                s.guard.growing = bool(g["growing"])
                s.guard.prev_nq = int(g["prev_nq"])
                s.guard.visited_edges = int(g["visited_edges"])
                s.guard.frontier_repr = g["frontier_repr"]

    while any(not s.done for s in states) and step < max_levels:
        active = [s for s in states if not s.done]
        # per-root direction decision (independent α/β state machines,
        # shared guard implementation — operators/_direction.py)
        for s in active:
            s.guard.step(len(s.fidx), s.nq_edges)

        if merge == "adaptive":
            # Only TOP-DOWN candidates count toward the flip: a dst can
            # arrive from many blocks (cross-block duplicates the executor
            # merge actually removes, ≤ nq_edges rows per root).  Bottom-up
            # rows are already globally unique — each CSR src row lives in
            # exactly one block — so a groupBy over them shuffles without
            # shrinking the collect; measured at scale 22, forcing the
            # executor merge onto the bottom-up peak steps cost 3-4x
            # (BENCH/ab_merge_modes_s22_r32.json) for zero dedup benefit.
            est_rows = sum(
                min(s.nq_edges, n_total)
                for s in active
                if s.guard.direction == "top_down"
            )
            step_merge = "spark" if est_rows * 20 > adaptive_merge_bytes else "driver"
        else:
            step_merge = merge

        # ship ALL active roots' frontier+visited bitmaps as ONE mmap'd file:
        # slot a holds [fbit, vbit] of the a-th active root
        bits = np.zeros((len(active), 2, nbytes), dtype=np.uint8)
        manifest = []
        for slot, s in enumerate(active):
            _bit_set(bits[slot, 0], s.fidx)
            bits[slot, 1] = s.vbit
            manifest.append((s.rid, s.guard.direction, slot))
        bits_file = shipper.stage(f"bits_s{step}", bits)
        t_ship = time.perf_counter()

        def probe(batches, _m=tuple(manifest), _p=blocks_path, _bf=bits_file,
                  _ship=ship, _tag=shipper.export_tag):
            from graph500_bfs_spark.operators._ship import resolver

            rp = resolver(_ship, _tag)
            allbits = np.load(rp(_bf), mmap_mode="r")
            for batch in batches:
                for bid in batch.column(0).to_numpy(zero_copy_only=False):
                    b = int(bid)
                    # a hash-empty block writes no files (build_blocks only
                    # emits rows for non-empty partitions) — skip, don't crash
                    if not os.path.exists(rp(f"{_p}/b{b}_srcs.npy")):
                        continue
                    srcs = np.load(rp(f"{_p}/b{b}_srcs.npy"), mmap_mode="r")
                    indptr = np.asarray(np.load(rp(f"{_p}/b{b}_indptr.npy"), mmap_mode="r"))
                    dsts = np.load(rp(f"{_p}/b{b}_dsts.npy"), mmap_mode="r")
                    srcidx = np.asarray(np.load(rp(f"{_p}/b{b}_srcidx.npy"), mmap_mode="r"))
                    dstidx = np.load(rp(f"{_p}/b{b}_dstidx.npy"), mmap_mode="r")
                    srcs_a = np.asarray(srcs)
                    for rid, d, slot in _m:
                        fbit = allbits[slot, 0]
                        vbit = allbits[slot, 1]
                        if d == "top_down":
                            rows = np.flatnonzero(_bit_test(fbit, srcidx))
                            out_vi, rep = _gather_ranges(
                                np.asarray(dstidx), indptr[rows], indptr[rows + 1]
                            )
                            keep = _bit_test(vbit, out_vi) == 0
                            out_vi, par = out_vi[keep], srcs_a[rows][rep][keep]
                            if len(out_vi):
                                # block-local min-parent dedup (dense index is
                                # a bijection of v, so dedup on vi ≡ dedup on v)
                                order = np.lexsort((par, out_vi))
                                out_vi, par = out_vi[order], par[order]
                                first = np.concatenate([[True], out_vi[1:] != out_vi[:-1]])
                                out_vi, par = out_vi[first], par[first]
                        else:
                            unvis = np.flatnonzero(_bit_test(vbit, srcidx) == 0)
                            rows_out, par = _bottom_up_scan(
                                indptr,
                                np.asarray(dsts),
                                np.asarray(dstidx),
                                unvis,
                                np.asarray(fbit),
                            )
                            out_vi = srcidx[rows_out]
                        if len(out_vi):
                            yield pa.RecordBatch.from_arrays(
                                [
                                    pa.array(np.full(len(out_vi), rid, dtype=np.int32)),
                                    pa.array(out_vi),
                                    pa.array(par),
                                ],
                                schema=out_schema,
                            )

        t_job0 = time.perf_counter()
        cand = base.mapInArrow(probe, "r int, vi long, parent long")
        if step_merge == "spark":
            # executor-side frontier merge: partial min combines map-side,
            # the exchange carries candidate winners keyed by (root, vertex),
            # and the driver collects ONLY final winners — the per-rank NQ
            # merge before the allgather, not a driver hub
            cand = cand.groupBy("r", "vi").agg(F.min("parent").alias("parent"))
        tbl = cand.toArrow()
        t_job = time.perf_counter() - t_job0
        if step_merge == "spark" and tbl.num_rows:
            # winners arrive hash-partition-ordered; ONE vectorized stable
            # sort by root re-blocks them into a single slice per root for
            # the change-point split below
            rb = tbl.column(0).to_numpy(zero_copy_only=False)
            order = np.argsort(rb, kind="stable")
            slices = [
                (
                    rb[order],
                    tbl.column(1).to_numpy(zero_copy_only=False)[order],
                    tbl.column(2).to_numpy(zero_copy_only=False)[order],
                )
            ]
        else:
            # driver merge: probe yields one RecordBatch per (block, root),
            # so r is piecewise constant within any batch the collect path
            # may have re-split — no sort needed
            slices = [
                (
                    b.column(0).to_numpy(zero_copy_only=False),
                    b.column(1).to_numpy(zero_copy_only=False),
                    b.column(2).to_numpy(zero_copy_only=False),
                )
                for b in tbl.to_batches()
                if b.num_rows
            ]
        per_vi: dict[int, list] = {}
        per_p: dict[int, list] = {}
        for rb, vb, pb in slices:
            # change-point split handles EVERY arrangement of r within a
            # batch (a batch shaped [A..,B..,A..] included); with no change
            # points it degenerates to one slice, so no fast path is needed
            cuts = np.concatenate(
                [[0], np.flatnonzero(rb[1:] != rb[:-1]) + 1, [len(rb)]]
            )
            for a, z in zip(cuts[:-1], cuts[1:]):
                per_vi.setdefault(int(rb[a]), []).append(vb[a:z])
                per_p.setdefault(int(rb[a]), []).append(pb[a:z])

        # Per-root cross-block min-parent dedup: pack (vi, parent) into ONE
        # uint64 key and sort in place (np.sort releases the GIL → the pool
        # below overlaps roots).  bottom_up rows are already unique per vi.
        vbits = max(int(n_total - 1).bit_length(), 1)
        pbits = max(int(dvs[-1]).bit_length(), 1)  # parents are vertex IDS
        packable = vbits + pbits <= 64 and int(dvs[0]) >= 0

        def merge_root(rid):
            vi = np.concatenate(per_vi[rid])
            pr = np.concatenate(per_p[rid])
            if packable:
                key = (vi.astype(np.uint64) << np.uint64(pbits)) | pr.astype(np.uint64)
                key.sort()
                vi_s = (key >> np.uint64(pbits)).astype(np.int64)
                p_s = (key & np.uint64((1 << pbits) - 1)).astype(np.int64)
            else:  # ids too wide to pack — generic path
                order = np.lexsort((pr, vi))
                vi_s, p_s = vi[order], pr[order]
            first = np.concatenate([[True], vi_s[1:] != vi_s[:-1]])
            return vi_s[first], p_s[first]

        todo = [s for s in active if s.rid in per_vi]
        if len(todo) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1)) as ex:
                merged = dict(zip((s.rid for s in todo),
                                  ex.map(merge_root, (s.rid for s in todo))))
        else:
            merged = {s.rid: merge_root(s.rid) for s in todo}

        for s in active:
            if s.rid not in merged:
                s.done = True
                s.fidx = np.empty(0, dtype=np.int64)
                continue
            idx, par = merged[s.rid]
            s.vis.append(idx)
            s.parents.append(par)
            s.levels.append(s.supersteps + 1)
            _bit_set(s.vbit, idx)
            s.fidx = idx
            s.n_reached += len(idx)
            s.nq_edges = int(ddeg[idx].sum())
            s.supersteps += 1

        shipper.cleanup_step()
        t_end = time.perf_counter()
        metrics.supersteps.append(
            {
                "superstep": step,
                "merge": step_merge,  # where the NQ dedup ran this step
                "direction": "+".join(sorted({s.guard.direction for s in active})),
                "frontier_size": int(sum(len(s.fidx) for s in active)),
                "frontier_edges": int(sum(s.nq_edges for s in active)),
                "elapsed_s": round(t_end - t_ship, 4),
                "probe_job_s": round(t_job, 4),  # distributed probe + Arrow collect
                "driver_merge_s": round(t_end - t_ship - t_job, 4),  # serial numpy
                "result_rows": int(tbl.num_rows),
            }
        )
        step += 1
        if checkpoint_dir and step % max(checkpoint_every, 1) == 0:
            _save_batch_checkpoint(checkpoint_dir, ckpt_sig, states, step)
        if interrupt_at_step is not None and step >= interrupt_at_step:
            raise KeyboardInterrupt(f"simulated kill after superstep {step}")

    if checkpoint_dir:
        # completed batch: drop the snapshot so an identical later call
        # starts fresh instead of "resuming" a finished run
        try:
            os.unlink(os.path.join(checkpoint_dir, "snap.npz"))
        except OSError:
            pass
    metrics.total_time_s = time.perf_counter() - t0
    metrics.traversed_edges = sum(s.guard.visited_edges for s in states) // 2

    results = {}
    for s in states:
        all_v = dvs[np.concatenate(s.vis)]
        all_p = np.concatenate(s.parents)
        all_l = np.concatenate(
            [np.full(len(v), lv, dtype=np.int32) for v, lv in zip(s.vis, s.levels)]
        )
        results[s.root] = spark.createDataFrame(
            pd.DataFrame({"v": all_v, "parent": all_p, "level": all_l}),
            "v long, parent long, level int",
        )
    return results, metrics


def driver_state_bytes(
    n_vertices: int,
    n_roots: int,
    reached_per_root: int | None = None,
    merge: str = "adaptive",
    edgefactor: int = 16,
    adaptive_merge_bytes: int = 1 << 30,
) -> int:
    """Peak driver-resident bytes for :func:`bfs_multi` — the documented
    budget formula behind :func:`bfs_roots`'s strategy flip.

    Five driver-held pieces (the reference distributes the analogous state
    per rank, /root/reference/mpi/bfs.hpp:634-696 — this formula is what
    bounds how far the shared-state MS-BFS design stretches):

    * dense degree map (dvs + ddeg,
      two int64 arrays, shared by all roots): 16 × n
    * per-root visited bitmaps:               R × ⌈n/8⌉
    * per-step shipped bitmap pack
      ([fbit, vbit] per active root):         2R × ⌈n/8⌉
    * accumulated (vi, parent, level)
      result lists:                           R × reached × (8+8+4) bytes
    * transient per-step Arrow collect peak, by ``merge`` mode:
      - ``"driver"``: the driver receives the full CANDIDATE set — up to
        reached × edgefactor block-deduped rows per root at the peak
        level (this is WHY plain driver merge does not scale: the term is
        O(edges touched), the verdict's 2.6×-toll finding made formula);
      - ``"spark"``: winners only, ≤ R × reached × 20;
      - ``"adaptive"`` (default): the TOP-DOWN candidate volume is capped
        — steps whose top-down bound exceeds ``adaptive_merge_bytes``
        flip to the executor merge; bottom-up rows (globally unique per
        CSR block, never worth shuffling) always reach the driver and
        are ≤ the winners volume.  A mixed step can therefore collect up
        to threshold + winners, never more than the all-driver bound:
        min(candidates, adaptive_merge_bytes + winners).

    ``reached_per_root`` defaults to n (every vertex reached — the Graph500
    giant-component worst case).  At scale 26 with 64 roots the result
    lists alone are ~84 GB → far past any driver; the join BFS
    (operators/bfs.py), whose state is a DataFrame, is the beyond-budget
    strategy.
    """
    nbytes = (n_vertices + 7) // 8
    reached = n_vertices if reached_per_root is None else reached_per_root
    winners_step = n_roots * reached * 20
    candidates_step = n_roots * reached * edgefactor * 20
    if merge == "driver":
        transient = candidates_step
    elif merge == "spark":
        transient = winners_step
    else:  # adaptive: the flip caps only the TOP-DOWN portion at the byte
        # threshold (bottom-up rows are block-unique and always collect
        # driver-side, bounded by the winners volume), so a mixed step
        # peaks at their SUM — never above the all-driver bound
        transient = min(candidates_step, adaptive_merge_bytes + winners_step)
    return 16 * n_vertices + 3 * n_roots * nbytes + n_roots * reached * 20 + transient


def bfs_roots(
    spark: SparkSession,
    edges_sym: DataFrame,
    roots: list[int],
    degrees: DataFrame,
    n_vertices: int,
    m_edges: int,
    blocks_path: str | None = None,
    num_blocks: int = 16,
    driver_memory_budget: int = 8 << 30,
    **bfs_multi_kwargs,
) -> tuple[dict[int, DataFrame], str]:
    """Run BFS from every root with an EXPLICIT driver-memory budget.

    Strategy dispatch (returns ({root: state}, strategy_used)):

    * :func:`driver_state_bytes`(n, R) ≤ ``driver_memory_budget`` → the
      high-TEPS multi-source batch (:func:`bfs_multi`, exporting CSR
      blocks to ``blocks_path`` if not already exported);
    * otherwise → the fully-declarative join BFS (operators/bfs.py), whose
      per-root state lives in DataFrames — nothing driver-resident scales
      with |V|, so it is the beyond-budget physical strategy.

    Both strategies satisfy the same deterministic min-parent contract, so
    the flip changes the plan, never the answer (tested).
    """
    import tempfile

    import pandas as _pd  # noqa: F401  (createDataFrame path in bfs_multi)

    from graph500_bfs_spark.operators.bfs import bfs as join_bfs

    need = driver_state_bytes(
        n_vertices, len(roots),
        merge=bfs_multi_kwargs.get("merge", "adaptive"),
        adaptive_merge_bytes=bfs_multi_kwargs.get(
            "adaptive_merge_bytes", 1 << 30
        ),
    )
    if need <= driver_memory_budget:
        dp = degrees.orderBy("v").toPandas()
        dvs = dp["v"].to_numpy(np.int64)
        ddeg = dp["deg"].to_numpy(np.int64)
        owns_path = blocks_path is None
        if owns_path:
            blocks_path = tempfile.mkdtemp(prefix="g5_msbfs_")
        if not os.path.exists(os.path.join(blocks_path, "vertex_ids.npy")):
            export_blocks_indexed(edges_sym, num_blocks, blocks_path, dvs)
        results, _ = bfs_multi(
            spark, blocks_path, num_blocks, roots, (dvs, ddeg), m_edges,
            **bfs_multi_kwargs,
        )
        if owns_path:
            import shutil

            shutil.rmtree(blocks_path, ignore_errors=True)
        return results, "msbfs"
    results = {}
    for r in roots:
        state, _ = join_bfs(
            edges_sym, r, degrees=degrees, n_vertices=n_vertices, m_edges=m_edges
        )
        results[r] = state
    return results, "join"
