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
