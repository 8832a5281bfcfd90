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


def test_protocol_per_root_kill_and_resume(spark, tmp_path):
    """Reference LOGFILE resume (mpi/main.cc:404-405): kill the timed
    protocol after 2 of 4 roots, restart with the same log, and get TEPS
    stats identical to an uninterrupted run (recorded times are reused
    verbatim; only the remaining roots re-run)."""
    import numpy as np
    import pytest

    from graph500_bfs_spark.operators.graph500 import run_timed_roots, sample_roots_spec
    from graph500_bfs_spark.operators.msbfs import export_blocks_indexed
    from graph500_bfs_spark.operators.prep import out_degrees, symmetrize
    from graph500_bfs_spark.plans.checkpoint import ProtocolLog
    from graph500_bfs_spark.sources.kronecker import kronecker_edges

    es = symmetrize(kronecker_edges(spark, scale=9, edgefactor=8), dedup=False).cache()
    m = es.count()
    deg = out_degrees(es).cache()
    dp = deg.orderBy("v").toPandas()
    dvs = dp["v"].to_numpy(np.int64)
    ddeg = dp["deg"].to_numpy(np.int64)
    path = str(tmp_path / "blocks")
    export_blocks_indexed(es, 4, path, dvs)
    roots = sample_roots_spec(deg, 9, 4)
    header = {"scale": 9, "n_roots": 4, "roots": [int(r) for r in roots]}
    logf = str(tmp_path / "proto.log.jsonl")

    log1 = ProtocolLog(logf, header)
    with pytest.raises(KeyboardInterrupt):
        run_timed_roots(spark, path, 4, roots, (dvs, ddeg), m, log=log1, interrupt_after=2)
    assert sorted(log1.completed) == [0, 1]
    t0, t1 = log1.time_s(0), log1.time_s(1)

    # restart: a fresh ProtocolLog on the same file must skip roots 0-1
    log2 = ProtocolLog(logf, header)
    assert sorted(log2.completed) == [0, 1]
    times = run_timed_roots(spark, path, 4, roots, (dvs, ddeg), m, log=log2)
    assert len(times) == 4 and all(t > 0 for t in times)
    assert times[0] == t0 and times[1] == t1  # recorded times reused verbatim
    assert sorted(log2.completed) == [0, 1, 2, 3]

    # a header mismatch (different protocol) must invalidate the log
    log3 = ProtocolLog(logf, {**header, "scale": 10})
    assert log3.completed == {}

def test_protocol_log_tolerates_torn_trailing_line(tmp_path):
    """A kill mid-append leaves a half-written JSON line; restart must
    resume from the intact prefix instead of crashing (the torn root is
    simply re-run)."""
    from graph500_bfs_spark.plans.checkpoint import ProtocolLog

    logf = str(tmp_path / "torn.log.jsonl")
    header = {"scale": 9, "n_roots": 4, "cores": 4, "roots": [1, 2, 3, 4]}
    log1 = ProtocolLog(logf, header)
    log1.record(0, 1, 0.5)
    log1.record(1, 2, 0.7)
    with open(logf, "a") as f:
        f.write('{"kind": "root", "i": 2, "root": 3, "ti')  # torn mid-append

    log2 = ProtocolLog(logf, header)
    assert sorted(log2.completed) == [0, 1]
    assert log2.time_s(1) == 0.7
    # the rewrite truncated the torn tail, so appending stays well-formed
    log2.record(2, 3, 0.9)
    log3 = ProtocolLog(logf, header)
    assert sorted(log3.completed) == [0, 1, 2]

def test_msbfs_mid_batch_kill_and_resume_identical(spark, tmp_path):
    """Round-4: a kill INSIDE a multi-source batch resumes at the last
    snapshotted superstep (not root 0) and the resumed run's final states
    and traversed-edge count are bit-identical to an uninterrupted run."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from graph500_bfs_spark.operators.msbfs import bfs_multi, export_blocks_indexed
    from graph500_bfs_spark.operators.prep import out_degrees, symmetrize
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
    ckpt = str(tmp_path / "ckpt")

    res_ref, met_ref = bfs_multi(spark, path, 4, roots, (dvs, ddeg), m)
    n_steps = len(met_ref.supersteps)
    assert n_steps >= 3, "fixture too shallow to test a mid-batch kill"

    # kill after superstep 2 (snapshot every step so the kill is mid-batch)
    with pytest.raises(KeyboardInterrupt):
        bfs_multi(spark, path, 4, roots, (dvs, ddeg), m,
                  checkpoint_dir=ckpt, checkpoint_every=1, interrupt_at_step=2)

    res2, met2 = bfs_multi(spark, path, 4, roots, (dvs, ddeg), m,
                           checkpoint_dir=ckpt, checkpoint_every=1)
    # resumed: only the remaining supersteps ran
    assert len(met2.supersteps) == n_steps - 2
    assert met2.traversed_edges == met_ref.traversed_edges
    for r in roots:
        a = {(x["v"], x["parent"], x["level"]) for x in res_ref[r].collect()}
        b = {(x["v"], x["parent"], x["level"]) for x in res2[r].collect()}
        assert a == b, f"resume diverges for root {r}"
    import os
    assert not os.path.exists(os.path.join(ckpt, "snap.npz"))  # cleared on completion

    # a snapshot for a DIFFERENT batch must be ignored, not resumed into
    with pytest.raises(KeyboardInterrupt):
        bfs_multi(spark, path, 4, roots, (dvs, ddeg), m,
                  checkpoint_dir=ckpt, checkpoint_every=1, interrupt_at_step=1)
    other = roots[:2]
    res3, _ = bfs_multi(spark, path, 4, other, (dvs, ddeg), m, checkpoint_dir=ckpt)
    for r in other:
        a = {(x["v"], x["parent"], x["level"]) for x in res_ref[r].collect()}
        b = {(x["v"], x["parent"], x["level"]) for x in res3[r].collect()}
        assert a == b

def test_aggregate_protocol_logs_merges_partials(tmp_path):
    """Offline aggregator (logreader.cc / aggregate_results.py analog):
    two partial logs of one protocol merge to the SAME stats an unsplit
    log yields; mismatched headers and conflicting duplicates are errors."""
    import json
    import sys
    from pathlib import Path

    import pytest

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from aggregate_protocol_logs import aggregate

    from graph500_bfs_spark.plans.checkpoint import ProtocolLog

    header = {"scale": 10, "n_roots": 4, "cores": 4, "roots": [7, 8, 9, 10]}
    rows = [(0, 7, 1.0, 16383), (1, 8, 2.0, 16383), (2, 9, 4.0, 16383), (3, 10, 8.0, 16383)]

    full = str(tmp_path / "full.log.jsonl")
    la = ProtocolLog(full, header)
    for i, r, t, e in rows:
        la.record(i, r, t, traversed_edges=e)
    # partials: roots 0-1 in one log, 1-3 in the other (index 1 overlaps,
    # with identical values — allowed)
    p1, p2 = str(tmp_path / "p1.log.jsonl"), str(tmp_path / "p2.log.jsonl")
    l1 = ProtocolLog(p1, header)
    for i, r, t, e in rows[:2]:
        l1.record(i, r, t, traversed_edges=e)
    l2 = ProtocolLog(p2, header)
    for i, r, t, e in rows[1:]:
        l2.record(i, r, t, traversed_edges=e)

    got = aggregate([p1, p2])
    want = aggregate([full])
    assert got == want
    assert got["complete"] and got["completed_roots"] == 4
    # harmonic mean of TEPS 16383/t for t in 1,2,4,8: 4/((1+2+4+8)/16383)
    assert got["TEPS_harmonic_mean_TEPS"] == pytest.approx(4 * 16383 / 15.0)

    # a partial alone reports incomplete stats over what exists
    part = aggregate([p1])
    assert not part["complete"] and part["completed_roots"] == 2

    # header mismatch is a hard error
    pbad = str(tmp_path / "bad.log.jsonl")
    lb = ProtocolLog(pbad, {**header, "scale": 11})
    lb.record(0, 7, 1.0, traversed_edges=16383)
    with pytest.raises(ValueError, match="header mismatch"):
        aggregate([p1, pbad])

    # same root index with DIFFERENT values is a hard error
    pdup = str(tmp_path / "dup.log.jsonl")
    with open(pdup, "w") as f:
        f.write(json.dumps({"kind": "header", **header}) + "\n")
        f.write(json.dumps({"kind": "root", "i": 0, "root": 7, "time_s": 9.9,
                            "traversed_edges": 16383}) + "\n")
    with pytest.raises(ValueError, match="recorded twice"):
        aggregate([p1, pdup])
