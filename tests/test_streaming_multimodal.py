from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph500_bfs_spark.operators.multimodal import (
    decode_metadata,
    extract_features,
    resize_images,
    sample_frames,
    synthesize_media,
)
from graph500_bfs_spark.streaming.events import (
    hourly_rollup,
    read_event_stream,
    sessionize,
    sessionize_batch,
)

SF = "/root/testdata/sf0.001"


def test_stream_hourly_rollup_equals_batch(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "events_src")
    ev.write.mode("overwrite").parquet(src)

    stream = read_event_stream(spark, src)
    q = (
        hourly_rollup(stream)
        .writeStream.format("memory")
        .queryName("rollup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["value_milli"])
        for r in spark.sql("select * from rollup").collect()
    }
    want = {
        (r["hour"], r["event_type"]): (r["n_events"], r["value_milli"])
        for r in ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value") * 1000).cast("long").alias("value_milli"),
        )
        .collect()
    }
    assert got == want


def test_stream_sessionize_runs(spark, tmp_path):
    """applyInPandasWithState wiring: stream emits completed sessions that
    are a subset of the batch sessionization (open sessions stay in state)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "events_src2")
    ev.write.mode("overwrite").parquet(src)
    stream = read_event_stream(spark, src)
    q = (
        sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("select * from sessions").collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_batch(ev).collect()
    }
    # every emitted (closed) session must match the batch oracle exactly
    assert got <= want
    # the batch-minus-stream remainder is only the per-user final sessions
    # (not yet closed by a later event / timeout in availableNow mode)
    leftover_users = {u for (u, *_rest) in want - got}
    per_user_last = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_batch(ev)
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "user_id"
                ).orderBy(F.desc("session_end"))
            ),
        )
        .filter("rn = 1")
        .drop("rn")
        .collect()
    }
    assert (want - got) <= per_user_last
    assert len(leftover_users) == len(want - got)  # ≤1 open session per user


def test_multimodal_pipeline(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    media = synthesize_media(docs).cache()
    assert media.count() == 50
    assert dict(media.dtypes)["payload"] == "binary"

    meta = decode_metadata(media)
    rows = meta.collect()
    assert len(rows) == 50
    for r in rows:
        assert r["media_type"] in ("image", "audio", "video")
        assert 16 <= r["width"] <= 256 and 16 <= r["height"] <= 256
        assert r["n_bytes"] > 13

    feats = extract_features(media).collect()
    assert all(len(r["features"]) == 8 for r in feats)
    assert all(0.0 <= x <= 1.0 for r in feats for x in r["features"])
    # determinism
    feats2 = extract_features(media).collect()
    assert {r["doc_id"]: list(r["features"]) for r in feats} == {
        r["doc_id"]: list(r["features"]) for r in feats2
    }

    resized = decode_metadata(resize_images(media, 32, 24)).collect()
    assert all(r["width"] == 32 and r["height"] == 24 for r in resized)


def test_sample_frames_stride_cap_and_determinism(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    media = synthesize_media(docs).cache()
    videos = {
        r["doc_id"]: r["duration_ms"]
        for r in decode_metadata(media).filter(F.col("media_type") == "video").collect()
    }
    assert videos, "fixture must contain video rows"

    frames = sample_frames(media, every_ms=1000, max_frames=32).collect()
    # only video docs produce frames
    assert {r["doc_id"] for r in frames} == set(videos)
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        dur = videos[doc_id]
        expect = min(max(-(-dur // 1000), 1), 32)
        assert len(rows) == expect
        assert sorted(r["frame_idx"] for r in rows) == list(range(expect))
        assert all(r["ts_ms"] == r["frame_idx"] * 1000 for r in rows)
        assert all(len(r["frame"]) == 64 for r in rows)

    # the cap bounds pathological fan-out
    capped = sample_frames(media, every_ms=1, max_frames=4).groupBy("doc_id").count()
    assert all(r["count"] <= 4 for r in capped.collect())

    # deterministic frame bytes
    again = sample_frames(media, every_ms=1000, max_frames=32).collect()
    key = lambda r: (r["doc_id"], r["frame_idx"])  # noqa: E731
    assert {key(r): bytes(r["frame"]) for r in frames} == {
        key(r): bytes(r["frame"]) for r in again
    }


def test_stream_derive_edges_equals_batch_across_microbatches(spark, tmp_path):
    """Round-4 incremental edge derivation: each conversation's turns are
    SPLIT across two parquet files fed one per micro-batch, so the
    cross-batch adjacency link (the stateful lag boundary) is actually
    exercised; the union of emitted edges must equal the batch deriver's
    output as a MULTISET (adjacency/tool edges repeat by design)."""
    import collections
    import os
    import time

    from graph500_bfs_spark.sources.edges import derive_edges
    from graph500_bfs_spark.sources.transcripts import synthesize_transcripts
    from graph500_bfs_spark.streaming.edges import (
        derive_edges_stream,
        read_transcript_stream,
    )

    tr = synthesize_transcripts(spark, n_convs=40, seed=11).cache()
    src = str(tmp_path / "tr_src")
    os.makedirs(src)
    # chunk 1: every conv's turns below its midpoint; chunk 2: the rest —
    # both chunks contain rows of EVERY conv, so every conv has a boundary
    mid = tr.groupBy("conv_id").agg((F.max("turn_idx") / 2).alias("mid"))
    t2 = tr.join(mid, "conv_id")
    t2.filter(F.col("turn_idx") <= F.col("mid")).drop("mid").coalesce(1).write.parquet(
        f"{src}/c1"
    )
    time.sleep(1.1)  # file-source orders by modification time
    t2.filter(F.col("turn_idx") > F.col("mid")).drop("mid").coalesce(1).write.parquet(
        f"{src}/c2"
    )

    # maxFilesPerTrigger is a SOURCE option (readStream): set on writeStream
    # it is ignored and both files land in one micro-batch, never exercising
    # the cross-batch state boundary this test exists for
    stream = read_transcript_stream(spark, f"{src}/*", {"maxFilesPerTrigger": "1"})
    q = (
        derive_edges_stream(stream)
        .writeStream.format("memory")
        .queryName("stream_edges")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # the state-timeout clock keeps availableNow ticking empty batches after
    # the files drain — drain_available waits for quiescence, then stops
    from graph500_bfs_spark.streaming.edges import drain_available

    drain_available(q, timeout_s=150)
    # at least two micro-batches CONSUMED INPUT (not just empty timeout
    # ticks) — the cross-batch boundary was genuinely exercised
    fed = [p for p in q.recentProgress if int(p["numInputRows"]) > 0]
    assert len(fed) >= 2

    got = collections.Counter(
        (r["src"], r["dst"], r["kind"])
        for r in spark.sql("select * from stream_edges").collect()
    )
    want = collections.Counter(
        (r["src"], r["dst"], r["kind"]) for r in derive_edges(tr).collect()
    )
    assert got == want


def test_stream_derive_edges_counts_dropped_turns(spark, tmp_path):
    """Round-5: late/duplicate turns are dropped AND counted — the drop
    total must surface in observedMetrics['edge_deriver'].dropped_turns
    (VERDICT r4 'what's wrong #3': silent data loss on out-of-order
    delivery is the classic pipeline wound)."""
    import os
    import time

    from graph500_bfs_spark.sources.edges import derive_edges
    from graph500_bfs_spark.sources.transcripts import synthesize_transcripts
    from graph500_bfs_spark.streaming.edges import (
        derive_edges_stream,
        drain_available,
        read_transcript_stream,
    )

    tr = synthesize_transcripts(spark, n_convs=20, seed=23).cache()
    src = str(tmp_path / "tr_dup")
    os.makedirs(src)
    lo = tr.filter(F.col("turn_idx") <= 1)
    lo.coalesce(1).write.parquet(f"{src}/c1")
    time.sleep(1.1)
    # chunk 2 REPLAYS chunk 1's turns (duplicates) plus the remainder —
    # every duplicate must be dropped and counted, the answer unchanged
    tr.coalesce(1).write.parquet(f"{src}/c2")
    n_dup = lo.count()

    stream = read_transcript_stream(spark, f"{src}/*", {"maxFilesPerTrigger": "1"})
    q = (
        derive_edges_stream(stream)
        .writeStream.format("memory")
        .queryName("dup_edges")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_available(q, timeout_s=150)

    import collections

    got = collections.Counter(
        (r["src"], r["dst"], r["kind"])
        for r in spark.sql("select * from dup_edges").collect()
    )
    want = collections.Counter(
        (r["src"], r["dst"], r["kind"]) for r in derive_edges(tr).collect()
    )
    assert got == want  # duplicates changed nothing...
    # sum() over a batch with no rows reports null — treat as 0 dropped
    dropped = sum(
        int(p["observedMetrics"]["edge_deriver"]["dropped_turns"] or 0)
        for p in q.recentProgress
        if p.get("observedMetrics", {}).get("edge_deriver")
    )
    assert dropped == n_dup  # ...and every one of them was counted


def test_stream_derive_edges_replay_speed_invariant(spark, tmp_path):
    """Round-5: eviction is event-time (watermark), so replay pacing —
    all files in ONE trigger vs one-per-trigger — cannot change the edge
    multiset (a processing-time TTL breaks exactly this invariant when
    replay stalls past the TTL)."""
    import collections
    import os
    import time

    from graph500_bfs_spark.sources.transcripts import synthesize_transcripts
    from graph500_bfs_spark.streaming.edges import (
        derive_edges_stream,
        drain_available,
        read_transcript_stream,
    )

    tr = synthesize_transcripts(spark, n_convs=30, seed=37).cache()
    src = str(tmp_path / "tr_replay")
    os.makedirs(src)
    mid = tr.groupBy("conv_id").agg((F.max("turn_idx") / 2).alias("mid"))
    t2 = tr.join(mid, "conv_id")
    t2.filter(F.col("turn_idx") <= F.col("mid")).drop("mid").coalesce(1).write.parquet(
        f"{src}/c1"
    )
    time.sleep(1.1)
    t2.filter(F.col("turn_idx") > F.col("mid")).drop("mid").coalesce(1).write.parquet(
        f"{src}/c2"
    )

    results = {}
    for tag, opts in (("paced", {"maxFilesPerTrigger": "1"}), ("burst", None)):
        stream = read_transcript_stream(spark, f"{src}/*", opts)
        q = (
            derive_edges_stream(stream)
            .writeStream.format("memory")
            .queryName(f"replay_{tag}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        drain_available(q, timeout_s=150)
        results[tag] = collections.Counter(
            (r["src"], r["dst"], r["kind"])
            for r in spark.sql(f"select * from replay_{tag}").collect()
        )
    assert results["paced"] == results["burst"]
