"""Streaming exact deduplication over a living document ingest.

The batch dedup suite (operators/dedup.py) answers "dedup the corpus at
rest"; a 100 TB training-data pipeline also needs the ONLINE half — drop
duplicate documents as they arrive, with state that does NOT grow with the
corpus.  The reference has no streaming surface (SURVEY §2.8); this is the
Spark-native form:

* fingerprint JVM-side (``md5(text)`` — the same fingerprint the batch
  ``exact_dup_groups`` gate query uses, so the two halves agree on what a
  duplicate IS);
* ``dropDuplicatesWithinWatermark`` on the fingerprint: first writer wins,
  later copies within the event-time watermark horizon are dropped, and the
  dedup state is evicted once the watermark passes — state is sized by the
  ingest RATE × horizon, not by the corpus (the property that makes this
  run forever at 10^12 documents);
* duplicates older than the horizon are the batch job's problem by design:
  periodic ``exact_dup_groups`` reconciliation over the sink — the same
  stream-now/backfill-later split as streaming/edges.py;
* drops are COUNTED, not silent (the round-4 lesson): paired ``observe``
  nodes before and after the dedup surface per-batch input/output counts in
  ``StreamingQueryProgress.observedMetrics`` ("dedup_in" / "dedup_out"),
  so dropped = in − out is a monitorable metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the documents table plus the ingest event time (arrival order carrier)
DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("ingest_ts", T.TimestampType()),
    ]
)


def read_document_stream(
    spark: SparkSession, path: str, options: dict[str, str] | None = None
) -> DataFrame:
    """File-source stream with an explicit schema (no inference race).

    ``options`` go to the SOURCE (e.g. ``{"maxFilesPerTrigger": "1"}`` to
    pace micro-batches in tests — a reader option, not a writer option).
    """
    reader = spark.readStream.schema(DOC_STREAM_SCHEMA)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.parquet(path)


def dedup_stream(docs: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """First-writer-wins exact dedup: one output row per content
    fingerprint; later arrivals within ``watermark`` are dropped and
    counted.  Output carries the winning document's columns plus ``fp``.
    """
    fp = docs.withColumn("fp", F.md5(F.col("text")))
    deduped = (
        fp.observe("dedup_in", F.count(F.lit(1)).alias("n"))
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
    return deduped.observe("dedup_out", F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Streaming NEAR-dup: MinHash-banded LSH candidate pairs over a live ingest.
#
# The batch near-dup path (operators/dedup.py minhash_lsh_pairs) buckets the
# corpus at rest; its streaming half emits candidate pairs AS DOCUMENTS
# ARRIVE: each incoming doc is hashed row-wise (the same shuffle-free
# shingle/minhash/band expressions the batch uses, so both halves agree on
# what a candidate IS), exploded to its band buckets, and matched against
# the bucket's remembered members.  State per bucket is a bounded
# first-writer member list + an event-time TTL, so total state is sized by
# (ingest rate × horizon) × bands — never by the corpus.
#
# Deliberate semantics, documented not hidden:
# * output is CANDIDATES (doc_a, doc_b, bucket), doc_a the earlier arrival;
#   exact-Jaccard verification needs both texts and is the batch job over
#   the sink (stream-stream self-join on text would hold the corpus in
#   state).  A pair sharing multiple bands is emitted once per shared
#   band — consumers dedup, exactly like the batch .distinct() pre-verify.
# * a bucket remembers at most ``max_bucket_members`` docs (the streaming
#   form of the batch max_bucket_size cap): an arrival beyond the cap still
#   pairs against the remembered members but is NOT added, and the miss is
#   COUNTED (observedMetrics["lsh_candidates"].dropped_members), the same
#   observability contract as batch cap_stats.
# * duplicate delivery of a REMEMBERED (bucket, doc) is dropped and
#   counted; a replay of a beyond-cap doc is indistinguishable from a new
#   doc (telling them apart would need unbounded state), so it re-pairs —
#   consumers dedup pairs, exactly as they already must across bands.
# ---------------------------------------------------------------------------

_CAND_SCHEMA = "doc_a long, doc_b long, bucket string, kind string"
_BUCKET_STATE_SCHEMA = "members string, max_ts_ms long"
CAND_KIND = "candidate"
DROP_KIND = "_dropped"
IDLE_BUCKET_TTL_MS = 6 * 3600 * 1000


def _lsh_fn(key, pdfs, state):
    """Per-bucket stateful matcher (bounded first-writer member list)."""
    import pandas as pd

    if state.hasTimedOut:
        state.remove()
        return
    rows = pd.concat(list(pdfs)).sort_values(["ingest_ts", "doc_id"])
    if state.exists:
        members_s, max_ts_ms = state.get
        members = [int(x) for x in members_s.split("\x1f")] if members_s else []
    else:
        members, max_ts_ms = [], 0
    cap = int(rows["cap"].iloc[0])
    bucket = key[0]
    seen = set(members)
    doc_a, doc_b, kind = [], [], []
    n_dropped = 0
    for did, ts in zip(rows["doc_id"], rows["ingest_ts"]):
        did = int(did)
        if did in seen:
            n_dropped += 1  # duplicate delivery of (bucket, doc)
            continue
        doc_a += members
        doc_b += [did] * len(members)
        kind += [CAND_KIND] * len(members)
        if len(members) < cap:
            members.append(did)
            seen.add(did)
        else:
            n_dropped += 1  # beyond cap: paired above, but not remembered
        max_ts_ms = max(int(max_ts_ms), int(ts.value // 1_000_000))
    state.update(("\x1f".join(str(m) for m in members), int(max_ts_ms)))
    state.setTimeoutTimestamp(
        max(max_ts_ms + IDLE_BUCKET_TTL_MS, state.getCurrentWatermarkMs() + 1)
    )
    if n_dropped:
        doc_a.append(n_dropped)
        doc_b.append(0)
        kind.append(DROP_KIND)
    if doc_a:
        yield pd.DataFrame(
            {"doc_a": doc_a, "doc_b": doc_b, "bucket": bucket, "kind": kind}
        )


def lsh_candidates_stream(
    docs: DataFrame,
    k: int = 16,
    bands: int = 4,
    n: int = 5,
    watermark: str = "1 hour",
    max_bucket_members: int = 64,
) -> DataFrame:
    """(doc_a, doc_b, bucket) near-dup candidate pairs from a doc stream.

    All hashing (shingles → minhash → band keys) is JVM expressions before
    the stateful step; only the bounded per-bucket membership is Python
    state.  ``doc_a`` arrived before ``doc_b``.  Drops (bucket over
    ``max_bucket_members``, duplicate deliveries) are counted in
    ``observedMetrics["lsh_candidates"].dropped_members``.
    """
    from graph500_bfs_spark.operators.dedup import (
        band_bucket_cols,
        minhash_signature_cols,
        shingle_array,
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    sig = (
        docs.select("doc_id", "ingest_ts", shingle_array(n).alias("shingles"))
        .filter(F.size("shingles") > 0)
        .select("doc_id", "ingest_ts", *minhash_signature_cols(k))
    )
    buckets = sig.select(
        "doc_id",
        "ingest_ts",
        F.explode(F.array(*band_bucket_cols(k, bands))).alias("bucket"),
        F.lit(max_bucket_members).alias("cap"),
    ).withWatermark("ingest_ts", watermark)
    out = buckets.groupBy("bucket").applyInPandasWithState(
        _lsh_fn,
        outputStructType=_CAND_SCHEMA,
        stateStructType=_BUCKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    out = out.observe(
        "lsh_candidates",
        F.sum(
            F.when(F.col("kind") == DROP_KIND, F.col("doc_a")).otherwise(F.lit(0))
        ).alias("dropped_members"),
        F.count(F.when(F.col("kind") == CAND_KIND, F.lit(1))).alias("emitted_pairs"),
    )
    return out.filter(F.col("kind") != DROP_KIND).drop("kind")
