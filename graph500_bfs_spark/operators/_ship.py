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

Immutable block files carry a per-EXPORT tag too (``export_tag.txt`` in
the staging dir, hardlinked as ``{tag}__{name}`` for addFile): Spark's
file server keys on basename for the life of the application, so two
``ship="spark"`` runs over DIFFERENT graphs in one session (e.g. two
``bfs_roots`` calls, each with a fresh tempdir) would otherwise collide
on ``b0_srcs.npy`` with different contents and fail mid-job.  The tag
makes every export's registration namespace-unique; workers resolve
through :func:`resolver` with the same tag.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
from pyspark.sql import SparkSession

#: filename prefixes of per-step transient arrays (never addFile'd at init,
#: cleared from the staging dir on construction; already run-tagged, so
#: they are NOT export-tag-prefixed by the resolver)
TRANSIENT_PREFIXES = ("bits_", "frontier_", "visited_")

TAG_FILE = "export_tag.txt"


def resolver(mode: str, export_tag: str = ""):
    """Worker-side path resolve function for the given ship mode.

    Returned callable is pickled into mapInArrow closures; under
    ``"spark"`` it resolves through the executor's SparkFiles cache,
    prefixing IMMUTABLE block basenames with the export tag they were
    registered under (transients are run-tagged at stage() time instead).
    """
    if mode == "spark":

        def rp(path: str, _tag=export_tag) -> str:
            from pyspark import SparkFiles

            base = os.path.basename(path)
            if _tag and not base.startswith(TRANSIENT_PREFIXES):
                base = f"{_tag}__{base}"
            return SparkFiles.get(base)

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
        self.export_tag = ""
        self._staged: list[str] = []
        for fn in os.listdir(blocks_path):
            if fn.startswith(TRANSIENT_PREFIXES):
                try:
                    os.unlink(os.path.join(blocks_path, fn))
                except OSError:
                    pass
        if mode == "spark":
            # per-export tag: minted once per staging dir, persisted next
            # to the blocks so re-entry of the SAME export reuses the same
            # registrations (idempotent) while a different export in the
            # same application registers under fresh basenames
            tag_path = os.path.join(blocks_path, TAG_FILE)
            if os.path.exists(tag_path):
                with open(tag_path) as f:
                    self.export_tag = f.read().strip()
            else:
                self.export_tag = uuid.uuid4().hex[:8]
                with open(tag_path, "w") as f:
                    f.write(self.export_tag)
            sc = spark.sparkContext
            for fn in sorted(os.listdir(blocks_path)):
                # ONLY the immutable CSR block files (b{b}_*.npy + the
                # reorder map) — transients were just cleared above
                if "__" in fn:
                    continue  # an already-tagged hardlink from a prior entry
                if fn == "vertex_ids.npy" or (
                    fn.startswith("b")
                    and not fn.startswith(TRANSIENT_PREFIXES)
                    and fn.endswith(".npy")
                ):
                    # hardlink (no data copy) under the tagged basename;
                    # re-registration of the same path is a warning only
                    tagged = os.path.join(
                        blocks_path, f"{self.export_tag}__{fn}"
                    )
                    if not os.path.exists(tagged):
                        os.link(os.path.join(blocks_path, fn), tagged)
                    sc.addFile(tagged)

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
