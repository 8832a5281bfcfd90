"""Same-session A/B of round-4 vs round-5 bfs()/pagerank() at sf0.1.

Round 5 rewired the iterative operators (operators/_iter.py): static side
pre-partitioned + shuffle_hash on the mutable side + data-sized shuffle
width.  Absolute bench numbers drift 2x with this VM's noise windows
(BENCH/BASELINE.md round-5 addendum), so the code-attributable delta is
measured the only trustworthy way: both versions interleaved (ABAB) in ONE
Spark session on ONE cached input.

Usage:  python scripts/ab_iterops_r4r5.py [reps]
Writes: BENCH/ab_iterops_r4r5.json
"""

from __future__ import annotations

import importlib.util
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from graph500_bfs_spark import gate  # noqa: E402
from graph500_bfs_spark.operators import bfs as bfs_r5  # noqa: E402
from graph500_bfs_spark.operators import pagerank as pr_r5  # noqa: E402
from graph500_bfs_spark.operators.prep import symmetrize  # noqa: E402
from graph500_bfs_spark.session import get_spark  # noqa: E402

R4_COMMIT = "ffa4fd2"


def load_at(commit: str, relpath: str, name: str):
    src = subprocess.run(
        ["git", "-C", str(REPO), "show", f"{commit}:{relpath}"],
        check=True, capture_output=True, text=True,
    ).stdout
    p = Path(f"/tmp/{name}.py")
    p.write_text(src)
    spec = importlib.util.spec_from_file_location(name, p)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod  # dataclass processing resolves cls.__module__
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    bfs_r4 = load_at(R4_COMMIT, "graph500_bfs_spark/operators/bfs.py", "bfs_r4_ab")
    pr_r4 = load_at(R4_COMMIT, "graph500_bfs_spark/operators/pagerank.py", "pr_r4_ab")

    spark = get_spark(app_name="ab_iterops")
    sf = "/root/testdata/sf0.1"
    e0 = gate.lineitem_bipartite_edges(spark, sf)
    es = symmetrize(e0).localCheckpoint(eager=True)
    root = int(e0.agg(F.min("src")).collect()[0][0])

    res: dict[str, dict[str, list[float]]] = {
        "bfs": {"r4": [], "r5": []}, "pagerank10": {"r4": [], "r5": []},
    }
    checks = set()
    # warmup both paths once (JIT/codegen/IO caches shared)
    bfs_r4.bfs(es, root); bfs_r5.bfs(es, root)
    for rep in range(reps):
        for tag, bmod, pmod in (("r4", bfs_r4, pr_r4), ("r5", bfs_r5, pr_r5)):
            t0 = time.perf_counter()
            state, _ = bmod.bfs(es, root)
            n_reached = state.count()
            res["bfs"][tag].append(round(time.perf_counter() - t0, 3))
            t0 = time.perf_counter()
            pr = pmod.pagerank(es, max_iter=10, tol=None)
            chk = pr.agg(F.sum(F.round(F.col("score") * 1e9))).collect()[0][0]
            res["pagerank10"][tag].append(round(time.perf_counter() - t0, 3))
            checks.add((tag, n_reached, int(chk)))
            print(f"rep{rep} {tag}: bfs={res['bfs'][tag][-1]}s "
                  f"pr={res['pagerank10'][tag][-1]}s reached={n_reached}", flush=True)
    # identical answers across versions (reached count + ppb rank checksum)
    assert len({(n, c) for _, n, c in checks}) == 1, checks
    med = {q: {t: sorted(v)[len(v) // 2] for t, v in d.items()} for q, d in res.items()}
    out = {
        "commit_r4": R4_COMMIT, "sf": 0.1, "reps": reps, "samples": res,
        "medians": med,
        "speedup": {q: round(med[q]["r4"] / med[q]["r5"], 3) for q in med},
    }
    (REPO / "BENCH" / "ab_iterops_r4r5.json").write_text(json.dumps(out, indent=2))
    print(json.dumps({k: out[k] for k in ("medians", "speedup")}, indent=2))


if __name__ == "__main__":
    main()
