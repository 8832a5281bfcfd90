"""Shared CSR-block + per-step-array shipping channel for the shared-state
BFS strategies (operators/msbfs.py, operators/csr_shm.py).

ONE implementation of the two distribution modes both strategies offer —
the analog of the reference's per-rank CSR + allgathered bitmaps
(/root/reference/mpi/bfs.hpp:680-696):

* ``"dir"`` — workers open the staging directory directly.  Fastest on one
  host (every worker mmaps the same physical pages, e.g. under /dev/shm)
  but requires the directory to be host-shared; single-node only.
* ``"spark"`` — CLUSTER-REAL with NO shared-FS assumption: immutable block
  files are registered once with ``sc.addFile`` and per-step transient
  arrays are registered as they are produced; workers resolve every path
  through ``SparkFiles.get``.  Spark's file server ships each file ONCE
  per executor host (fetched at first task, cached in the executor's
  files dir), after which all worker processes on that host mmap the same
  local copy — the same one-copy-per-host property as the shared dir,
  delivered by Spark's own transport.

Transient per-step files carry a unique run tag (re-adding a CHANGED file
under the same name is an error in Spark) and are deleted from the staging
dir at the end of each step; stale transients from a crashed earlier run
are cleared at construction.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
from pyspark.sql import SparkSession

#: filename prefixes of per-step transient arrays (never addFile'd at init,
#: cleared from the staging dir on construction)
TRANSIENT_PREFIXES = ("bits_", "frontier_", "visited_")


def resolver(mode: str):
    """Worker-side path resolve function for the given ship mode.

    Returned callable is pickled into mapInArrow closures; under
    ``"spark"`` it resolves through the executor's SparkFiles cache.
    """
    if mode == "spark":

        def rp(path: str) -> str:
            from pyspark import SparkFiles

            return SparkFiles.get(os.path.basename(path))

    else:

        def rp(path: str) -> str:
            return path

    return rp


class BlockShip:
    """Driver-side half of the channel: registers immutable block files,
    stages per-step transient arrays, and cleans them up."""

    def __init__(self, spark: SparkSession, blocks_path: str, mode: str):
        if mode not in ("dir", "spark"):
            raise ValueError(f"unknown ship mode {mode!r}")
        self.spark = spark
        self.blocks_path = blocks_path
        self.mode = mode
        self.run_tag = uuid.uuid4().hex[:8]
        self._staged: list[str] = []
        for fn in os.listdir(blocks_path):
            if fn.startswith(TRANSIENT_PREFIXES):
                try:
                    os.unlink(os.path.join(blocks_path, fn))
                except OSError:
                    pass
        if mode == "spark":
            sc = spark.sparkContext
            for fn in sorted(os.listdir(blocks_path)):
                # ONLY the immutable CSR block files (b{b}_*.npy + the
                # reorder map) — transients were just cleared above
                if fn == "vertex_ids.npy" or (
                    fn.startswith("b")
                    and not fn.startswith(TRANSIENT_PREFIXES)
                    and fn.endswith(".npy")
                ):
                    # idempotent for unchanged files (re-registration of
                    # the same path is a warning, not an error)
                    sc.addFile(os.path.join(blocks_path, fn))

    def stage(self, name_base: str, array: np.ndarray) -> str:
        """Write a per-step transient array and make it worker-resolvable;
        returns the path to hand to :func:`resolver` on workers."""
        fname = (
            f"{name_base}_{self.run_tag}.npy" if self.mode == "spark" else f"{name_base}.npy"
        )
        path = os.path.join(self.blocks_path, fname)
        np.save(path, array)
        if self.mode == "spark":
            self.spark.sparkContext.addFile(path)
        self._staged.append(path)
        return path

    def cleanup_step(self) -> None:
        """Delete the transients staged since the last cleanup."""
        for p in self._staged:
            try:
                os.unlink(p)
            except OSError:
                pass
        self._staged.clear()
