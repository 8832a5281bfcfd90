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
