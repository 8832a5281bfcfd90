"""Shared direction-optimization state machine for every BFS strategy.

One implementation of the growing/shrinking guard + bitmap↔list
representation decision (/root/reference/mpi/bfs.hpp:3413-3457), used by
all four physical BFS strategies (operators/bfs.py DataFrame-join,
operators/csr_blocks.py, operators/csr_shm.py, operators/msbfs.py).
Round 2 had the guard only in bfs.py/msbfs.py — duplicated — leaving the
two secondary paths able to flip-flop on plateau frontiers, the exact
failure the guard exists for.

Semantics (per superstep, called with the CURRENT frontier stats before
the expansion):

* top_down → bottom_up only while the frontier is still GROWING
  (nq > prev_nq) and its edge budget exceeds the remaining-edges/alpha
  threshold.  DELIBERATE DEVIATION from the reference formula: we compare
  nq_edges against REMAINING edges (m_total - visited_edges)/alpha rather
  than total m/alpha (reference bfs.hpp:3417-3418), because remaining
  edges is what an incremental-unvisited bottom-up sweep actually scans;
  the growing guard supplies the hysteresis the reference gets from its
  total-m constant.
* bottom_up → top_down only once the frontier is SHRINKING
  (nq <= prev_nq) and small (nq < n/(beta*edgefactor*2), reference
  bfs.hpp:3433-3439); the growing flag then clears PERMANENTLY — the
  one-way switch that prevents direction flip-flop.
* representation decision at B2T (bfs.hpp:3441-3448): keep the bitmap iff
  nq ≥ bitmap_slots/8 with bitmap_slots = n/2 (bitmap_bytes/sizeof(id)/
  denom, denom=2); bottom-up always runs on bitmaps (bfs.hpp:3454-3457).
"""

from __future__ import annotations

from dataclasses import dataclass

DEFAULT_ALPHA = 10.0  # /root/reference/mpi/parameters.h:96
DEFAULT_BETA = 14.0  # /root/reference/mpi/parameters.h:97
DEFAULT_EDGEFACTOR = 16  # /root/reference/mpi/parameters.h:93


@dataclass
class DirectionGuard:
    """Direction state for ONE BFS source (instantiate per root)."""

    n_total: int
    m_total: int
    alpha: float = DEFAULT_ALPHA
    beta: float = DEFAULT_BETA
    edgefactor: int = DEFAULT_EDGEFACTOR
    direction: str = "top_down"
    growing: bool = True
    prev_nq: int = 0
    visited_edges: int = 0
    frontier_repr: str = "list"

    def step(self, nq: int, nq_edges: int) -> str:
        """Advance the state machine for the superstep about to run.

        ``nq``/``nq_edges`` are the current frontier's size and out-edge
        budget.  Accumulates ``visited_edges`` and updates ``direction`` /
        ``frontier_repr``; returns the (possibly new) direction.
        """
        self.visited_edges += nq_edges
        if self.direction == "top_down":
            if (
                self.growing
                and nq > self.prev_nq
                and nq_edges > (self.m_total - self.visited_edges) / self.alpha
            ):
                self.direction = "bottom_up"
                self.frontier_repr = "bitmap"
        else:
            if (not self.growing or nq <= self.prev_nq) and nq < self.n_total / (
                self.beta * self.edgefactor * 2.0
            ):
                self.direction = "top_down"
                self.growing = False  # one-way: never re-enter the growing phase
                bitmap_slots = self.n_total / 2.0
                self.frontier_repr = "bitmap" if nq >= bitmap_slots / 8.0 else "list"
        self.prev_nq = nq
        return self.direction

    def restore_from_metrics(self, supersteps: list[dict]) -> None:
        """Rehydrate guard state from recorded superstep metrics (resume path).

        A resumed run must NOT reset ``growing=True`` if the original run
        already took its one B2T switch — otherwise it could re-enter
        bottom_up, the exact flip-flop the guard prevents.  ``growing`` is
        derivable from the recorded direction sequence: it is False iff a
        bottom_up → top_down transition has happened.
        """
        dirs = [m.get("direction", "top_down") for m in supersteps]
        self.direction = dirs[-1] if dirs else "top_down"
        for a, b in zip(dirs, dirs[1:]):
            if a == "bottom_up" and b == "top_down":
                self.growing = False
        if dirs:
            self.frontier_repr = supersteps[-1].get("frontier_repr", self.frontier_repr)
