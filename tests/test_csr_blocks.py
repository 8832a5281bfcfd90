from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph500_bfs_spark.operators.bfs import bfs
from graph500_bfs_spark.operators.csr_blocks import bfs_blocks, build_blocks
from graph500_bfs_spark.operators.prep import out_degrees, vertex_ids
from graph500_bfs_spark.operators.validate import assert_valid_bfs
from graph500_bfs_spark.operators.bfs import complete_result
from tests import oracles
from tests.conftest import (
    HUB_SKEW,
    PATH_GRAPH,
    STAR_GRAPH,
    TRIANGLE_PENDANT,
    TWO_COMPONENTS,
    edges_df,
)


@pytest.mark.parametrize(
    "pairs,root",
    [
        (PATH_GRAPH, 0),
        (STAR_GRAPH, 3),
        (TWO_COMPONENTS, 10),
        (TRIANGLE_PENDANT, 3),
        (HUB_SKEW, 4),
    ],
)
def test_bfs_blocks_matches_join_bfs(spark, pairs, root):
    es = edges_df(spark, pairs).cache()
    deg = out_degrees(es).cache()
    n = deg.count()
    m = es.count()
    blocks = build_blocks(es, num_blocks=4).cache()
    state_b, _ = bfs_blocks(blocks, root, n_vertices=n, m_edges=m, degrees=deg)
    got = {(r["v"], r["parent"], r["level"]) for r in state_b.collect()}

    state_j, _ = bfs(es, root, degrees=deg, n_vertices=n, m_edges=m)
    want = {(r["v"], r["parent"], r["level"]) for r in state_j.collect()}
    assert got == want  # identical deterministic min-parent contract

    res = complete_result(state_b, vertex_ids(es))
    assert_valid_bfs(res, es, root)
    assert {r["v"]: r["level"] for r in state_b.collect()} == oracles.bfs_levels(pairs, root)


def test_bfs_blocks_kronecker(spark):
    from graph500_bfs_spark.sources.kronecker import kronecker_edges
    from graph500_bfs_spark.operators.prep import symmetrize

    es = symmetrize(kronecker_edges(spark, scale=8, edgefactor=8), dedup=False).cache()
    deg = out_degrees(es).cache()
    n, m = deg.count(), es.count()
    root = int(deg.orderBy(F.desc("deg")).limit(1).collect()[0]["v"])
    blocks = build_blocks(es, num_blocks=8).cache()
    state_b, met = bfs_blocks(blocks, root, n_vertices=n, m_edges=m, degrees=deg)
    state_j, _ = bfs(es, root, degrees=deg, n_vertices=n, m_edges=m)
    got = {(r["v"], r["level"]) for r in state_b.select("v", "level").collect()}
    want = {(r["v"], r["level"]) for r in state_j.select("v", "level").collect()}
    assert got == want
    # direction optimization should kick in from a hub root on R-MAT
    assert any(s["direction"] == "bottom_up" for s in met.supersteps)


def test_bfs_shm_matches_join_bfs(spark, tmp_path):
    import numpy as np

    from graph500_bfs_spark.operators.csr_shm import bfs_shm, export_blocks
    from graph500_bfs_spark.operators.prep import symmetrize
    from graph500_bfs_spark.sources.kronecker import kronecker_edges

    es = symmetrize(kronecker_edges(spark, scale=9, edgefactor=8), dedup=False).cache()
    m = es.count()
    deg = out_degrees(es).cache()
    dp = deg.orderBy("v").toPandas()
    dvs = dp["v"].to_numpy(np.int64)
    ddeg = dp["deg"].to_numpy(np.int64)
    path = str(tmp_path / "blocks")
    export_blocks(es, 8, path)
    root = int(deg.orderBy(F.desc("deg")).limit(1).collect()[0]["v"])
    st_shm, met = bfs_shm(spark, path, 8, root, (dvs, ddeg), m)
    st_j, _ = bfs(es, root, degrees=deg, n_vertices=len(dvs), m_edges=m)
    a = {(r["v"], r["parent"], r["level"]) for r in st_shm.collect()}
    b = {(r["v"], r["parent"], r["level"]) for r in st_j.collect()}
    assert a == b
    assert any(s["direction"] == "bottom_up" for s in met.supersteps)


def test_msbfs_matches_join_bfs_all_roots(spark, tmp_path):
    import numpy as np

    from graph500_bfs_spark.operators.msbfs import bfs_multi, export_blocks_indexed
    from graph500_bfs_spark.operators.prep import symmetrize
    from graph500_bfs_spark.sources.kronecker import kronecker_edges

    es = symmetrize(kronecker_edges(spark, scale=9, edgefactor=8), dedup=False).cache()
    m = es.count()
    deg = out_degrees(es).cache()
    dp = deg.orderBy("v").toPandas()
    dvs = dp["v"].to_numpy(np.int64)
    ddeg = dp["deg"].to_numpy(np.int64)
    path = str(tmp_path / "msblocks")
    export_blocks_indexed(es, 8, path, dvs)
    roots = [int(r["v"]) for r in deg.orderBy(F.desc("deg")).limit(3).collect()]
    results, met = bfs_multi(spark, path, 8, roots, (dvs, ddeg), m)
    assert met.traversed_edges > 0
    for root in roots:
        st_j, _ = bfs(es, root, degrees=deg, n_vertices=len(dvs), m_edges=m)
        a = {(r["v"], r["parent"], r["level"]) for r in results[root].collect()}
        b = {(r["v"], r["parent"], r["level"]) for r in st_j.collect()}
        assert a == b, f"root {root} mismatch"


def test_msbfs_spark_ship_matches_dir_ship(spark, tmp_path):
    """ship='spark' (sc.addFile + SparkFiles — the cluster-real channel
    with no shared-FS assumption) must produce bit-identical BFS states to
    ship='dir' (shared-directory mmap)."""
    import numpy as np

    from graph500_bfs_spark.operators.msbfs import bfs_multi, export_blocks_indexed
    from graph500_bfs_spark.operators.prep import symmetrize
    from graph500_bfs_spark.sources.kronecker import kronecker_edges

    es = symmetrize(kronecker_edges(spark, scale=9, edgefactor=8), dedup=False).cache()
    m = es.count()
    deg = out_degrees(es).cache()
    dp = deg.orderBy("v").toPandas()
    dvs = dp["v"].to_numpy(np.int64)
    ddeg = dp["deg"].to_numpy(np.int64)
    path = str(tmp_path / "blocks")
    export_blocks_indexed(es, 4, path, dvs)
    roots = [int(r["v"]) for r in deg.orderBy(F.desc("deg"), F.asc("v")).limit(3).collect()]

    res_dir, met_dir = bfs_multi(spark, path, 4, roots, (dvs, ddeg), m, ship="dir")
    res_sp, met_sp = bfs_multi(spark, path, 4, roots, (dvs, ddeg), m, ship="spark")
    assert met_dir.traversed_edges == met_sp.traversed_edges
    for r in roots:
        a = {(x["v"], x["parent"], x["level"]) for x in res_dir[r].collect()}
        b = {(x["v"], x["parent"], x["level"]) for x in res_sp[r].collect()}
        assert a == b, f"ship modes diverge for root {r}"


def test_msbfs_spark_merge_matches_driver_merge(spark, tmp_path):
    """merge='spark' (executor-side groupBy(r, vi).min(parent) — the driver
    receives only final winners, not the candidate set) must produce
    bit-identical BFS states and metrics to the driver-side numpy merge."""
    import numpy as np

    from graph500_bfs_spark.operators.msbfs import bfs_multi, export_blocks_indexed
    from graph500_bfs_spark.operators.prep import symmetrize
    from graph500_bfs_spark.sources.kronecker import kronecker_edges

    es = symmetrize(kronecker_edges(spark, scale=9, edgefactor=8), dedup=False).cache()
    m = es.count()
    deg = out_degrees(es).cache()
    dp = deg.orderBy("v").toPandas()
    dvs = dp["v"].to_numpy(np.int64)
    ddeg = dp["deg"].to_numpy(np.int64)
    path = str(tmp_path / "blocks")
    export_blocks_indexed(es, 4, path, dvs)
    roots = [int(r["v"]) for r in deg.orderBy(F.desc("deg"), F.asc("v")).limit(3).collect()]

    res_drv, met_drv = bfs_multi(spark, path, 4, roots, (dvs, ddeg), m, merge="driver")
    res_sp, met_sp = bfs_multi(spark, path, 4, roots, (dvs, ddeg), m, merge="spark")
    assert met_drv.traversed_edges == met_sp.traversed_edges
    assert len(met_drv.supersteps) == len(met_sp.supersteps)
    for r in roots:
        a = {(x["v"], x["parent"], x["level"]) for x in res_drv[r].collect()}
        b = {(x["v"], x["parent"], x["level"]) for x in res_sp[r].collect()}
        assert a == b, f"merge modes diverge for root {r}"


def test_bfs_roots_budget_flips_strategy_same_answer(spark, tmp_path):
    """bfs_roots dispatches by the documented driver_state_bytes formula: a
    generous budget runs the multi-source batch, a zero budget flips to the
    fully-declarative join BFS — identical states either way."""
    import numpy as np

    from graph500_bfs_spark.operators.msbfs import bfs_roots, driver_state_bytes
    from graph500_bfs_spark.operators.prep import symmetrize
    from graph500_bfs_spark.sources.kronecker import kronecker_edges

    es = symmetrize(kronecker_edges(spark, scale=8, edgefactor=8), dedup=False).cache()
    m = es.count()
    deg = out_degrees(es).cache()
    n = deg.count()
    roots = [int(r["v"]) for r in deg.orderBy(F.desc("deg"), F.asc("v")).limit(2).collect()]
    assert driver_state_bytes(n, len(roots)) > 0

    res_ms, strat_ms = bfs_roots(
        spark, es, roots, deg, n, m,
        blocks_path=str(tmp_path / "blocks"), num_blocks=4,
        driver_memory_budget=8 << 30,
    )
    assert strat_ms == "msbfs"
    res_j, strat_j = bfs_roots(spark, es, roots, deg, n, m, driver_memory_budget=0)
    assert strat_j == "join"
    for r in roots:
        a = {(x["v"], x["parent"], x["level"]) for x in res_ms[r].collect()}
        b = {(x["v"], x["parent"], x["level"]) for x in res_j[r].collect()}
        assert a == b, f"strategies diverge for root {r}"


def test_bfs_shm_spark_ship_matches_dir_ship(spark, tmp_path):
    """bfs_shm over the shared _ship channel: ship='spark' (sc.addFile +
    SparkFiles, no shared-FS assumption) must be bit-identical to the
    shared-directory mode — one shipping implementation for both CSR
    strategies."""
    import numpy as np

    from graph500_bfs_spark.operators.csr_shm import bfs_shm, export_blocks
    from graph500_bfs_spark.operators.prep import symmetrize
    from graph500_bfs_spark.sources.kronecker import kronecker_edges

    es = symmetrize(kronecker_edges(spark, scale=9, edgefactor=8), dedup=False).cache()
    m = es.count()
    deg = out_degrees(es).cache()
    dp = deg.orderBy("v").toPandas()
    dvs = dp["v"].to_numpy(np.int64)
    ddeg = dp["deg"].to_numpy(np.int64)
    path = str(tmp_path / "blocks")
    export_blocks(es, 4, path)
    root = int(deg.orderBy(F.desc("deg"), F.asc("v")).limit(1).collect()[0]["v"])

    st_dir, met_dir = bfs_shm(spark, path, 4, root, (dvs, ddeg), m, ship="dir")
    st_sp, met_sp = bfs_shm(spark, path, 4, root, (dvs, ddeg), m, ship="spark")
    assert met_dir.traversed_edges == met_sp.traversed_edges
    a = {(x["v"], x["parent"], x["level"]) for x in st_dir.collect()}
    b = {(x["v"], x["parent"], x["level"]) for x in st_sp.collect()}
    assert a == b


def test_blockship_clears_stale_transients_and_stages(tmp_path):
    """The shared ship channel must clear stale per-step transients from a
    crashed earlier run at construction (they'd otherwise grow the staging
    dir / get re-shipped), never touch immutable block files, and remove
    what it staged on cleanup_step()."""
    import os

    import numpy as np

    from graph500_bfs_spark.operators._ship import BlockShip

    d = str(tmp_path / "stage")
    os.makedirs(d)
    np.save(f"{d}/b0_srcs.npy", np.arange(3))          # immutable block file
    np.save(f"{d}/vertex_ids.npy", np.arange(3))       # immutable reorder map
    np.save(f"{d}/bits_s3_deadbeef.npy", np.zeros(1))  # stale transients…
    np.save(f"{d}/frontier_2.npy", np.zeros(1))
    np.save(f"{d}/visited_2.npy", np.zeros(1))

    ship = BlockShip(spark=None, blocks_path=d, mode="dir")
    left = sorted(os.listdir(d))
    assert left == ["b0_srcs.npy", "vertex_ids.npy"]  # stale transients gone

    p = ship.stage("bits_s0", np.arange(5))
    assert os.path.exists(p) and os.path.basename(p) == "bits_s0.npy"
    ship.cleanup_step()
    assert sorted(os.listdir(d)) == ["b0_srcs.npy", "vertex_ids.npy"]

    import pytest

    with pytest.raises(ValueError, match="ship mode"):
        BlockShip(spark=None, blocks_path=d, mode="nfs")


def test_msbfs_adaptive_merge_flips_midrun_same_answer(spark, tmp_path):
    """Round-5 adaptive merge: with a tiny byte threshold the mode flips
    to the executor merge on candidate-heavy supersteps and back to the
    driver merge on the tail — metrics must record BOTH modes in one run,
    and the BFS states must be bit-identical to the forced-driver run
    (same min-parent contract regardless of where the dedup executes)."""
    import numpy as np

    from graph500_bfs_spark.operators.msbfs import bfs_multi, export_blocks_indexed
    from graph500_bfs_spark.operators.prep import symmetrize
    from graph500_bfs_spark.sources.kronecker import kronecker_edges

    es = symmetrize(kronecker_edges(spark, scale=9, edgefactor=8), dedup=False).cache()
    m = es.count()
    deg = out_degrees(es).cache()
    dp = deg.orderBy("v").toPandas()
    dvs = dp["v"].to_numpy(np.int64)
    ddeg = dp["deg"].to_numpy(np.int64)
    path = str(tmp_path / "blocks")
    export_blocks_indexed(es, 4, path, dvs)
    roots = [int(r["v"]) for r in deg.orderBy(F.desc("deg"), F.asc("v")).limit(3).collect()]

    res_drv, met_drv = bfs_multi(spark, path, 4, roots, (dvs, ddeg), m, merge="driver")
    # ~4 KB threshold: peak/bottom-up supersteps of a scale-9 BFS exceed
    # it, the root/tail steps do not — both modes must appear
    res_ad, met_ad = bfs_multi(
        spark, path, 4, roots, (dvs, ddeg), m,
        merge="adaptive", adaptive_merge_bytes=4 << 10,
    )
    modes = {s["merge"] for s in met_ad.supersteps}
    assert modes == {"driver", "spark"}, f"adaptive never flipped: {modes}"
    assert met_drv.traversed_edges == met_ad.traversed_edges
    assert len(met_drv.supersteps) == len(met_ad.supersteps)
    for r in roots:
        a = {(x["v"], x["parent"], x["level"]) for x in res_drv[r].collect()}
        b = {(x["v"], x["parent"], x["level"]) for x in res_ad[r].collect()}
        assert a == b, f"adaptive merge diverges for root {r}"


def test_spark_ship_two_exports_one_session_no_basename_collision(spark, tmp_path):
    """Round-5 (ADVICE r4): Spark's file server keys on basename for the
    application lifetime, so two ship='spark' runs over DIFFERENT graphs
    in one session used to collide on b0_srcs.npy with different contents.
    The per-export tag must keep both runs correct — each BFS result must
    match its own graph's dir-ship run."""
    import numpy as np

    from graph500_bfs_spark.operators.msbfs import bfs_multi, export_blocks_indexed
    from graph500_bfs_spark.operators.prep import symmetrize
    from graph500_bfs_spark.sources.kronecker import kronecker_edges

    for i, (scale, ef) in enumerate([(8, 8), (9, 6)]):  # two DIFFERENT graphs
        es = symmetrize(kronecker_edges(spark, scale=scale, edgefactor=ef),
                        dedup=False).cache()
        m = es.count()
        deg = out_degrees(es).cache()
        dp = deg.orderBy("v").toPandas()
        dvs = dp["v"].to_numpy(np.int64)
        ddeg = dp["deg"].to_numpy(np.int64)
        path = str(tmp_path / f"blocks{i}")
        export_blocks_indexed(es, 4, path, dvs)
        root = int(deg.orderBy(F.desc("deg"), F.asc("v")).limit(1).collect()[0]["v"])

        res_sp, met_sp = bfs_multi(spark, path, 4, [root], (dvs, ddeg), m,
                                   ship="spark")
        res_dir, met_dir = bfs_multi(spark, path, 4, [root], (dvs, ddeg), m,
                                     ship="dir")
        assert met_sp.traversed_edges == met_dir.traversed_edges
        a = {(x["v"], x["parent"], x["level"]) for x in res_sp[root].collect()}
        b = {(x["v"], x["parent"], x["level"]) for x in res_dir[root].collect()}
        # graph i's spark-ship answer equals graph i's dir-ship answer —
        # the second iteration fails here if export 2's files were shadowed
        # by export 1's registrations
        assert a == b, f"export {i} shadowed by a previous registration"


def test_driver_state_bytes_upper_bounds_measured_rss(spark, tmp_path):
    """Round-5 budget tightening: driver_state_bytes now includes the
    16·n degree-map term and a merge-mode candidate-peak term — the
    formula must UPPER-bound the python driver's actual RSS growth over
    a full bfs_multi batch (it is advertised as *the* budget)."""
    import numpy as np

    from graph500_bfs_spark.operators.msbfs import (
        bfs_multi,
        driver_state_bytes,
        export_blocks_indexed,
    )
    from graph500_bfs_spark.operators.prep import symmetrize
    from graph500_bfs_spark.sources.kronecker import kronecker_edges

    def rss_bytes():
        with open("/proc/self/status") as f:
            for ln in f:
                if ln.startswith("VmRSS:"):
                    return int(ln.split()[1]) * 1024
        raise RuntimeError("no VmRSS")

    es = symmetrize(kronecker_edges(spark, scale=12, edgefactor=8), dedup=False).cache()
    m = es.count()
    deg = out_degrees(es).cache()
    dp = deg.orderBy("v").toPandas()
    dvs = dp["v"].to_numpy(np.int64)
    ddeg = dp["deg"].to_numpy(np.int64)
    n = len(dvs)
    path = str(tmp_path / "blocks")
    export_blocks_indexed(es, 4, path, dvs)
    roots = [int(r["v"]) for r in deg.orderBy(F.desc("deg"), F.asc("v")).limit(8).collect()]

    before = rss_bytes()
    res, met = bfs_multi(spark, path, 4, roots, (dvs, ddeg), m, merge="driver")
    growth = rss_bytes() - before

    # formula with the DRIVER-merge transient term (the biggest) must
    # upper-bound what actually happened; reached ≤ n so default args
    budget = driver_state_bytes(n, len(roots), merge="driver", edgefactor=8)
    assert growth < budget, f"measured {growth} >= formula {budget}"
    # ...and the ordering sanity the docstring promises
    assert driver_state_bytes(n, 8, merge="spark") <= driver_state_bytes(
        n, 8, merge="adaptive"
    ) <= driver_state_bytes(n, 8, merge="driver", edgefactor=16)
