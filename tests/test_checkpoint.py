from __future__ import annotations

from graph500_bfs_spark.operators.bfs import bfs
from graph500_bfs_spark.plans.checkpoint import CheckpointManager
from graph500_bfs_spark.sources.edges import derive_edges
from graph500_bfs_spark.sources.transcripts import synthesize_transcripts
from graph500_bfs_spark.operators.prep import symmetrize


def test_bfs_kill_and_resume_identical(spark, tmp_path):
    """North-rule resume test: drop checkpoints after superstep 1 (simulated
    mid-run kill), resume, and require the *identical* final state — exact
    reproducibility is guaranteed by the deterministic min-parent winner."""
    t = synthesize_transcripts(spark, n_convs=60, seed=42)
    es = symmetrize(derive_edges(t)).cache()
    root = int(es.selectExpr("min(src) as v").collect()[0]["v"])

    ck = CheckpointManager(str(tmp_path / "ck"), spark)
    full, _ = bfs(es, root, checkpointer=ck, run_id="run1")
    want = {(r["v"], r["parent"], r["level"]) for r in full.collect()}

    assert ck.latest_superstep("run1") >= 2
    ck.drop_after("run1", 1)  # kill after superstep 1
    resumed, _ = bfs(es, root, checkpointer=ck, run_id="run1", resume=True)
    got = {(r["v"], r["parent"], r["level"]) for r in resumed.collect()}
    assert got == want

    # metrics rows recorded per superstep with required fields
    m = ck.metrics("run1")
    assert all({"superstep", "direction", "frontier_size", "elapsed_s"} <= set(row) for row in m)


def test_warehouse_roundtrip(spark, tmp_path):
    from graph500_bfs_spark.plans.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.range(100).selectExpr("id as v", "id * 2 as x")
    wh.write("t1", df)
    assert wh.exists("t1")
    assert wh.read("t1").count() == 100
    wh.append("t1", df)
    assert wh.read("t1").count() == 200
    assert not wh.exists("nope")


def test_cc_kill_and_resume_identical(spark, tmp_path):
    from graph500_bfs_spark.operators.components import connected_components
    from graph500_bfs_spark.sources.kronecker import kronecker_edges
    from graph500_bfs_spark.operators.prep import symmetrize

    es = symmetrize(kronecker_edges(spark, scale=7, edgefactor=4)).cache()
    ck = CheckpointManager(str(tmp_path / "ck_cc"), spark)
    full = connected_components(es, checkpointer=ck, run_id="cc1")
    want = {(r["v"], r["component"]) for r in full.collect()}
    last = ck.latest_superstep("cc1")
    assert last is not None and last >= 1
    ck.drop_after("cc1", 1)
    resumed = connected_components(es, checkpointer=ck, run_id="cc1", resume=True)
    got = {(r["v"], r["component"]) for r in resumed.collect()}
    assert got == want


def test_pagerank_kill_and_resume_identical(spark, tmp_path):
    from graph500_bfs_spark.operators.pagerank import pagerank
    from tests.conftest import TRIANGLE_PENDANT, edges_df

    es = edges_df(spark, TRIANGLE_PENDANT)
    ck = CheckpointManager(str(tmp_path / "ck_pr"), spark)
    full = pagerank(es, max_iter=8, tol=None, checkpointer=ck, run_id="pr1")
    want = {r["v"]: r["score"] for r in full.collect()}
    ck.drop_after("pr1", 3)
    resumed = pagerank(es, max_iter=8, tol=None, checkpointer=ck, run_id="pr1", resume=True)
    got = {r["v"]: r["score"] for r in resumed.collect()}
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
