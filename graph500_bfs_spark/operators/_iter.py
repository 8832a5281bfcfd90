"""Shared plumbing for driver-looped iterative operators (PageRank, CC,
LPA; BFS has its own direction-aware variant in ``bfs.py``).

Two rules make an iterative join loop survive a 100× scale-up:

1. The STATIC big side (edges / links) is cached pre-partitioned on its
   join key, so the per-iteration join exchanges only the mutable side
   (ranks / labels) — the multi-billion-row table is shuffled once at
   materialization, never again.
2. The MUTABLE side is broadcast while it fits (driver-known row count —
   the reference's allreduced counters, mpi/bfs.hpp:1355-1418) and
   shuffle_hash-hinted above the gate.  Without the hint Catalyst plans a
   sort-merge join, which re-SORTS the cached static side every iteration
   (tens of GB of sort spill per round at scale 26, measured ENOSPC on
   this box before the same fix landed in bfs.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# rows on the mutable side below which a driver-placed broadcast beats the
# shuffled hash join (~16-32 B/row → ≤ ~256 MB broadcast)
ITER_BROADCAST_GATE = 8_000_000


def mutable_side(df: DataFrame, n_rows: int, gate: int | None = None) -> DataFrame:
    """Broadcast the per-iteration mutable side while it fits, else force
    the shuffled hash join (build side = this small side, static side
    streams partition-locally with no sort)."""
    g = ITER_BROADCAST_GATE if gate is None else gate
    return F.broadcast(df) if n_rows < g else df.hint("shuffle_hash")
