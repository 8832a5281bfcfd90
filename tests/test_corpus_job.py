"""The corpus-pipeline job CLI (jobs/corpus_job.py) — the shipping surface
for the training-data half, mirroring jobs/linkgraph_job.py's contract."""

import datetime
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "jobs"))


def test_corpus_job_budget_matches_operator(spark, tmp_path):
    import corpus_job

    docs = "/root/testdata/sf0.001/documents.parquet"
    wh = str(tmp_path / "wh")
    m = corpus_job.main(
        ["budget", "--docs", docs, "--budget-tokens", "5000", "--warehouse", wh]
    )
    out = spark.read.parquet(f"{wh}/budget")
    assert m["n_rows"] == out.count() > 0
    # the CLI result equals the operator composition it wraps
    want = corpus_job._prep(spark.read.parquet(docs), "en", 300_000)
    from graph500_bfs_spark.operators.textstats import select_token_budget

    want = select_token_budget(want, 5000)
    assert out.exceptAll(want).count() == 0 and want.exceptAll(out).count() == 0


def test_corpus_job_every_batch_step_writes_rows(spark, tmp_path):
    """Smoke every batch step of the CLI end to end: each writes a non-empty
    parquet result and reports matching n_rows (budget has its own exact
    equivalence test above; stream-* have dedicated stateful tests)."""
    import corpus_job

    docs = "/root/testdata/sf0.001/documents.parquet"
    wh = str(tmp_path / "wh")
    for step in ("stats", "exact-dedup", "lsh-pairs", "dedup-groups", "prep"):
        m = corpus_job.main([step, "--docs", docs, "--warehouse", wh])
        out = spark.read.parquet(f"{wh}/{step.replace('-', '_')}")
        assert m["n_rows"] == out.count() > 0, step


def test_corpus_job_stream_lsh_counts(spark, tmp_path):
    import corpus_job
    from graph500_bfs_spark.streaming.dedup import DOC_STREAM_SCHEMA

    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (
            i,
            f"shared boilerplate text body alpha beta gamma delta {i % 3}",
            "en",
            "s",
            50,
            base + datetime.timedelta(seconds=i),
        )
        for i in range(9)
    ]
    src = str(tmp_path / "docs")
    os.makedirs(src)
    spark.createDataFrame(rows, DOC_STREAM_SCHEMA).coalesce(1).write.parquet(
        f"{src}/c1"
    )
    wh = str(tmp_path / "wh2")
    m = corpus_job.main(
        ["stream-lsh", "--docs", f"{src}/*", "--shingle-n", "3",
         "--minhash-k", "8", "--warehouse", wh]
    )
    assert m["n_rows"] > 0
    assert m["lsh_candidates.emitted_pairs"] == m["n_rows"]
    assert "lsh_candidates.dropped_members" in m
    got = spark.read.parquet(f"{wh}/stream_lsh")
    assert set(got.columns) == {"doc_a", "doc_b", "bucket"}
