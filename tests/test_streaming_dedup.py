"""Streaming exact dedup: bounded-state first-writer-wins over a living
ingest (streaming/dedup.py), with counted — never silent — drops."""

import datetime
import os
import time

from pyspark.sql import functions as F


def _doc_rows(ids_texts, base_ts):
    return [
        (
            int(i),
            t,
            "en",
            "synth",
            len(t),
            base_ts + datetime.timedelta(seconds=int(i)),
        )
        for i, t in ids_texts
    ]


def test_stream_dedup_across_batches_counts_drops(spark, tmp_path):
    """Duplicates arriving in LATER micro-batches (within the watermark
    horizon) are dropped, exactly one row per content fingerprint is
    emitted, and every drop is counted via the paired observe nodes."""
    from graph500_bfs_spark.streaming.dedup import (
        DOC_STREAM_SCHEMA,
        dedup_stream,
        read_document_stream,
    )
    from graph500_bfs_spark.streaming.edges import drain_available

    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    texts = [f"document body number {k}" for k in range(8)]
    # file 1: docs 0-7 plus an IN-BATCH duplicate of text 0
    f1 = _doc_rows([(k, texts[k]) for k in range(8)] + [(100, texts[0])], base)
    # file 2: three CROSS-BATCH replays plus two genuinely new docs
    f2 = _doc_rows(
        [(101, texts[1]), (102, texts[2]), (103, texts[3]),
         (8, "fresh doc eight"), (9, "fresh doc nine")],
        base,
    )
    src = str(tmp_path / "docs")
    os.makedirs(src)
    spark.createDataFrame(f1, DOC_STREAM_SCHEMA).coalesce(1).write.parquet(f"{src}/c1")
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    spark.createDataFrame(f2, DOC_STREAM_SCHEMA).coalesce(1).write.parquet(f"{src}/c2")

    stream = read_document_stream(spark, f"{src}/*", {"maxFilesPerTrigger": "1"})
    q = (
        dedup_stream(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_docs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_available(q, timeout_s=150)

    out = spark.sql("select * from dedup_docs").collect()
    # exactly one row per distinct text, and it is the first-received copy
    want_fps = {r["fp"] for r in
                spark.createDataFrame(f1 + f2, DOC_STREAM_SCHEMA)
                .select(F.md5("text").alias("fp")).distinct().collect()}
    assert {r["fp"] for r in out} == want_fps
    assert len(out) == len(want_fps) == 10
    assert {r["doc_id"] for r in out} == set(range(10))  # winners, not replays

    # the dedup really spanned micro-batches (reader paced one file/trigger)
    fed = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(fed) >= 2

    def metric(p, name):
        m = p.get("observedMetrics", {}).get(name)
        return int(m["n"] or 0) if m else 0

    n_in = sum(metric(p, "dedup_in") for p in q.recentProgress)
    n_out = sum(metric(p, "dedup_out") for p in q.recentProgress)
    assert n_in == len(f1) + len(f2) == 14
    assert n_out == len(out) == 10
    assert n_in - n_out == 4  # the one in-batch + three cross-batch replays


def test_stream_dedup_agrees_with_batch_fingerprint(spark, tmp_path):
    """The stream and the batch suite agree on what a duplicate IS: the
    emitted fingerprints equal exact_dup_groups' canonical groups over the
    same rows (the stream-now / batch-reconcile-later contract)."""
    from graph500_bfs_spark.operators.dedup import exact_dup_groups
    from graph500_bfs_spark.streaming.dedup import (
        DOC_STREAM_SCHEMA,
        dedup_stream,
        read_document_stream,
    )
    from graph500_bfs_spark.streaming.edges import drain_available

    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = _doc_rows(
        [(0, "alpha"), (1, "beta"), (2, "alpha"), (3, "gamma"), (4, "beta")], base
    )
    src = str(tmp_path / "docs2")
    os.makedirs(src)
    spark.createDataFrame(rows, DOC_STREAM_SCHEMA).coalesce(1).write.parquet(
        f"{src}/c1"
    )

    q = (
        dedup_stream(read_document_stream(spark, f"{src}/*"))
        .writeStream.format("memory")
        .queryName("dedup_docs2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_available(q, timeout_s=120)

    stream_fps = {r["fp"] for r in spark.sql("select * from dedup_docs2").collect()}
    batch = exact_dup_groups(
        spark.createDataFrame(rows, DOC_STREAM_SCHEMA).select("doc_id", "text")
    )
    assert batch.count() == 5  # every doc mapped to a group
    n_groups = batch.select("canonical_id").distinct().count()
    assert len(stream_fps) == n_groups == 3


def test_stream_lsh_candidates_match_batch_buckets(spark, tmp_path):
    """Round-5 streaming NEAR-dup: the candidate pairs emitted across
    micro-batches equal the pairs implied by the BATCH band buckets over
    the same corpus (earlier arrival first in each pair) — the two halves
    share the literal bucket expressions, and this proves the stateful
    glue preserves them across batch boundaries."""
    from graph500_bfs_spark.operators.dedup import (
        band_bucket_cols,
        minhash_signatures,
    )
    from graph500_bfs_spark.streaming.dedup import (
        DOC_STREAM_SCHEMA,
        lsh_candidates_stream,
        read_document_stream,
    )
    from graph500_bfs_spark.streaming.edges import drain_available

    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    t0 = "the quick brown fox jumps over the lazy dog today"
    near = t0.replace("dog", "cat")
    texts1 = [(0, t0), (1, "completely unrelated text about spark shuffles"),
              (2, near)]
    texts2 = [(10, t0), (11, near.replace("today", "tomorrow")),
              (12, "another unrelated body of words entirely different")]
    f1, f2 = _doc_rows(texts1, base), _doc_rows(texts2, base)
    src = str(tmp_path / "lshdocs")
    os.makedirs(src)
    spark.createDataFrame(f1, DOC_STREAM_SCHEMA).coalesce(1).write.parquet(f"{src}/c1")
    time.sleep(1.1)
    spark.createDataFrame(f2, DOC_STREAM_SCHEMA).coalesce(1).write.parquet(f"{src}/c2")

    k, bands, n = 8, 4, 3
    q = (
        lsh_candidates_stream(
            read_document_stream(spark, f"{src}/*", {"maxFilesPerTrigger": "1"}),
            k=k, bands=bands, n=n,
        )
        .writeStream.format("memory")
        .queryName("lsh_cands")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_available(q, timeout_s=150)
    got = {
        (r["doc_a"], r["doc_b"], r["bucket"])
        for r in spark.sql("select * from lsh_cands").collect()
    }

    # expected: within each batch band bucket, every (earlier, later) pair
    # by ingest order (doc_id order here — ts = base + seconds(doc_id))
    all_docs = spark.createDataFrame(f1 + f2, DOC_STREAM_SCHEMA)
    sig = minhash_signatures(all_docs.select("doc_id", "text"), k=k, n=n)
    bkt = sig.select(
        "doc_id", F.explode(F.array(*band_bucket_cols(k, bands))).alias("bucket")
    ).collect()
    by_bucket = {}
    for r in bkt:
        by_bucket.setdefault(r["bucket"], []).append(r["doc_id"])
    want = set()
    for bucket, ids in by_bucket.items():
        ids.sort()  # ingest order == doc_id order in this fixture
        for j in range(len(ids)):
            for i in range(j):
                want.add((ids[i], ids[j], bucket))
    assert want, "fixture must produce at least one candidate pair"
    assert got == want
    # pairs really crossed micro-batch boundaries
    assert any(a < 10 <= b for a, b, _ in got)
    fed = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(fed) >= 2


def test_stream_lsh_candidates_cap_and_drops_counted(spark, tmp_path):
    """A bucket past max_bucket_members stops REMEMBERING but keeps
    MATCHING, and every unremembered/duplicate delivery is counted in
    observedMetrics — the streaming form of batch cap_stats."""
    from graph500_bfs_spark.streaming.dedup import (
        DOC_STREAM_SCHEMA,
        lsh_candidates_stream,
        read_document_stream,
    )
    from graph500_bfs_spark.streaming.edges import drain_available

    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    same = "identical boilerplate text repeated across the corpus body"
    rows = _doc_rows([(i, same) for i in range(6)] + [(3, same)], base)
    src = str(tmp_path / "capdocs")
    os.makedirs(src)
    spark.createDataFrame(rows, DOC_STREAM_SCHEMA).coalesce(1).write.parquet(
        f"{src}/c1"
    )

    k, bands, n, cap = 8, 4, 3, 2
    q = (
        lsh_candidates_stream(
            read_document_stream(spark, f"{src}/*"),
            k=k, bands=bands, n=n, max_bucket_members=cap,
        )
        .writeStream.format("memory")
        .queryName("lsh_cap")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_available(q, timeout_s=120)
    got = spark.sql("select * from lsh_cap").collect()

    # identical texts: all 4 bands collide into the same membership pattern.
    # With cap=2 only docs {0,1} are remembered; docs 2-5 each pair against
    # both members.  The replay of doc 3 pairs AGAIN: duplicate suppression
    # is only guaranteed for REMEMBERED docs (distinguishing a beyond-cap
    # replay from a new doc would need unbounded state) — consumers dedup,
    # and the replay is still counted as a drop.
    assert {(r["doc_a"], r["doc_b"]) for r in got} == {
        (0, 1)} | {(m, d) for d in (2, 3, 4, 5) for m in (0, 1)}
    per_band = 1 + 2 * 5  # (0,1) + arrivals 2, 3, 3-replay, 4, 5 × both members
    assert len(got) == per_band * bands

    drops = 0
    for p in q.recentProgress:
        m = p.get("observedMetrics", {}).get("lsh_candidates")
        if m:
            drops += int(m["dropped_members"] or 0)
    # per band: docs 2-5 beyond cap (4) + the beyond-cap replay of doc 3
    assert drops == (4 + 1) * bands
