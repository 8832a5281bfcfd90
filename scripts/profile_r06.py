"""Round-6 phase profiler: time sub-phases of the heavy bench legs with
noop-sink isolation (guide §1.4) so setup, per-iteration and action costs
are attributed separately.  Results feed OPTIMIZATION_r06.md."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from graph500_bfs_spark import gate  # noqa: E402
from graph500_bfs_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def t(label, fn, out):
    t0 = time.perf_counter()
    r = fn()
    dt = time.perf_counter() - t0
    out[label] = round(dt, 3)
    print(f"    {label}: {dt:.3f}s", flush=True)
    return r


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(app_name="profile_r06")
    sc = spark.sparkContext
    out = {}

    print("== edges_symmetrize ==", flush=True)
    sc.setJobDescription("edges_symmetrize")
    e0 = gate.lineitem_bipartite_edges(spark, SF)
    t("sym.read_only_count", lambda: e0.count(), out)
    from graph500_bfs_spark.operators.prep import symmetrize
    t("sym.full_noop", lambda: noop(symmetrize(e0)), out)
    t("sym.full_noop2", lambda: noop(symmetrize(e0)), out)
    t("sym.count", lambda: symmetrize(e0).count(), out)
    spark.catalog.clearCache()

    print("== bfs_levels ==", flush=True)
    sc.setJobDescription("bfs_levels")
    from graph500_bfs_spark.operators.bfs import bfs, build_adjacency
    from graph500_bfs_spark.operators.prep import out_degrees
    es = symmetrize(e0).cache()
    t("bfs.cache_fill", lambda: es.count(), out)
    root = t("bfs.root", lambda: int(e0.agg(F.min("src")).collect()[0][0]), out)
    deg = out_degrees(es).cache()
    t("bfs.degrees", lambda: deg.agg(F.count("*"), F.sum("deg")).collect(), out)
    adj = build_adjacency(es, deg).cache()
    t("bfs.adj_build", lambda: adj.count(), out)
    t0 = time.perf_counter()
    state, met = bfs(es, root, degrees=deg, adjacency=adj)
    out["bfs.loop_total"] = round(time.perf_counter() - t0, 3)
    for s in met.supersteps:
        print(f"      level {s['superstep']} dir={s['direction']} nq={s['frontier_size']} {s['elapsed_s']:.3f}s")
    out["bfs.supersteps"] = [round(s["elapsed_s"], 3) for s in met.supersteps]
    t("bfs.final_count", lambda: state.count(), out)
    spark.catalog.clearCache()

    print("== pagerank10 ==", flush=True)
    sc.setJobDescription("pagerank10")
    t0 = time.perf_counter()
    df = gate.q_pagerank10(spark, SF)
    out["pr.build"] = round(time.perf_counter() - t0, 3)
    t("pr.count", lambda: df.count(), out)
    spark.catalog.clearCache()

    print("== triangle_count ==", flush=True)
    sc.setJobDescription("triangle_count")
    pairs = gate.part_cooccurrence_edges(spark, SF)
    t("tri.pairs_noop", lambda: noop(pairs), out)
    tsym = symmetrize(pairs)
    t("tri.sym_noop", lambda: noop(tsym), out)
    tsym = tsym.cache()
    t("tri.sym_cache", lambda: tsym.count(), out)
    from graph500_bfs_spark.operators.triangles import orient_edges, triangle_count
    o = orient_edges(tsym)
    t("tri.orient_noop", lambda: noop(o), out)
    t("tri.count_on_cached_sym", lambda: triangle_count(tsym), out)
    spark.catalog.clearCache()
    t("tri.full_leg", lambda: gate.q_triangle_count(spark, SF).count(), out)
    spark.catalog.clearCache()

    print("== cc / lpa ==", flush=True)
    sc.setJobDescription("cc_lpa")
    t("cc.full_leg", lambda: gate.q_connected_components_snr(spark, SF).count(), out)
    spark.catalog.clearCache()
    t("lpa.full_leg", lambda: gate.q_label_propagation_snr(spark, SF).count(), out)
    spark.catalog.clearCache()

    Path("BENCH/r06").mkdir(parents=True, exist_ok=True)
    Path("BENCH/r06/profile_phases.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
