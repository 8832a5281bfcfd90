"""Offline aggregation of partial Graph500 protocol logs — the analog of
the reference's logreader.cc + misc/aggregate_results.py
(/root/reference/mpi/logreader.cc:116 reads the binary resume log;
/root/reference/misc/aggregate_results.py:20-110 scrapes per-root result
lines across partial runs and re-prints the Graph500 summary statistics).

Input: N ``protocol*.log.jsonl`` files (the :class:`ProtocolLog` format —
one JSON header line pinning {scale, n_roots, roots, ...} + one line per
completed root).  Typical source: a killed-and-resumed protocol split its
roots across machines/sessions, each leaving a partial log.

Semantics:

* every log must carry an IDENTICAL header (same protocol) — mismatch is a
  hard error, exactly the reference's header guard
  (/root/reference/mpi/benchmark_helper.hpp:584-649);
* the union of completed roots is taken; if the same root index appears in
  several logs its recorded values must agree (a disagreement means the
  logs are not from the same protocol — hard error);
* TEPS per root = traversed_edges / time_s when the log recorded a
  per-root edge count, else pf_nedge[scale] (the -v 0/1 semantics of
  mpi/main.cc:327);
* output = the Graph500 summary block (min/quartiles/max/mean/stddev of
  time and TEPS + harmonic-mean TEPS with Norris stddev) over the merged
  roots, plus a completeness line (k of n_roots) — partial protocols print
  stats over what exists, as aggregate_results.py does.

Usage: aggregate_protocol_logs.py LOG [LOG...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graph500_bfs_spark.operators.graph500 import (  # noqa: E402
    PF_NEDGE,
    summary_stats,
    teps_stats,
)


def read_log(path: str) -> tuple[dict, dict[int, dict]]:
    """(header, {root_index: row}) for one partial log; torn trailing
    lines are dropped (same tolerance as ProtocolLog resume)."""
    header = None
    rows: dict[int, dict] = {}
    with open(path) as f:
        for ln in f:
            if not ln.strip():
                continue
            try:
                row = json.loads(ln)
            except json.JSONDecodeError:
                break  # torn tail from a kill mid-append
            if row.get("kind") == "header":
                header = row
            elif row.get("kind") == "root":
                rows[int(row["i"])] = row
    if header is None:
        raise ValueError(f"{path}: no header line — not a protocol log")
    return header, rows


def aggregate(paths: list[str]) -> dict:
    """Merge partial logs → the Graph500 summary stat block."""
    header0, merged = None, {}
    for p in paths:
        header, rows = read_log(p)
        hkey = {k: v for k, v in header.items() if k != "kind"}
        if header0 is None:
            header0 = hkey
        elif hkey != header0:
            raise ValueError(
                f"{p}: header mismatch — logs are from different protocols\n"
                f"  expected {header0}\n  got      {hkey}"
            )
        for i, row in rows.items():
            if i in merged:
                if (merged[i]["root"], merged[i]["time_s"]) != (row["root"], row["time_s"]):
                    raise ValueError(
                        f"{p}: root index {i} recorded twice with different "
                        f"values — logs are not partials of one protocol"
                    )
            else:
                merged[i] = row
    assert header0 is not None
    scale = int(header0.get("scale", 0))
    n_roots = int(header0.get("n_roots", len(merged)))
    idx = sorted(merged)
    times = [float(merged[i]["time_s"]) for i in idx]
    # per-root traversed-edge counts: prefer the recorded value (test None
    # explicitly — a legitimately recorded 0 must stay 0, not fall through);
    # fall back to the spec pf_nedge table only when the scale has an entry.
    # Silently substituting 0 would put a 1/0 reciprocal into the
    # harmonic-mean TEPS and corrupt the whole summary.
    nedges = []
    for i in idx:
        te = merged[i].get("traversed_edges")
        if te is None:
            if scale not in PF_NEDGE:
                raise ValueError(
                    f"root index {i} has no traversed_edges and scale "
                    f"{scale} is not in the pf_nedge table — cannot "
                    f"compute TEPS for this protocol"
                )
            te = PF_NEDGE[scale]
        nedges.append(int(te))
    if not times:
        raise ValueError("no completed roots in any log")
    stats = teps_stats(nedges, times)
    return {
        "scale": scale,
        "n_roots": n_roots,
        "completed_roots": len(idx),
        "complete": len(idx) >= n_roots,
        "root_indices": idx,
        "time_stats_s": summary_stats(times),
        **{f"TEPS_{k}": v for k, v in stats.items()},
    }


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    out = aggregate(sys.argv[1:])
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
