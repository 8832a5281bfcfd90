"""Structured Streaming over the events table.

The reference has no streaming surface (SURVEY §2.8: "streaming/watermarks →
none anywhere"); this module supplies the Spark-native streaming leg the
engine needs as a modern analytics stack:

* :func:`read_event_stream` — file-source stream with explicit schema
  (no inference race) over a parquet directory;
* :func:`hourly_rollup` — watermarked windowed aggregation whose BATCH
  twin is gate query ``events_hourly`` (same grouping, same outputs), so
  stream-equals-batch is testable with ``trigger(availableNow=True)``;
* :func:`sessionize` — custom stateful operator via
  ``applyInPandasWithState``: per-user session windows with a 30-minute
  inactivity gap (the canonical "operator Spark lacks, built on the
  sanctioned stateful API" example).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

SESSION_SCHEMA = "user_id long, session_start timestamp, session_end timestamp, n_events long, total_value double"
_STATE_SCHEMA = "start long, end long, n long, total double"
SESSION_GAP_S = 30 * 60


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(EVENT_SCHEMA).parquet(path)


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Windowed counts/sums per event_type with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value") * 1000).cast("long").alias("value_milli"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n_events", "value_milli")
    )


def _sessionize_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, end, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="us")],
                "session_end": [pd.Timestamp(end, unit="us")],
                "n_events": [n],
                "total_value": [total],
            }
        )
        return
    rows = pd.concat(list(pdfs)).sort_values("ts")
    ts_us = rows["ts"].astype("int64") // 1000  # ns → us
    vals = rows["value"].to_numpy()
    cur = list(state.get) if state.exists else None
    done = []
    for t, v in zip(ts_us.to_numpy(), vals):
        if cur is None:
            cur = [int(t), int(t), 1, float(v)]
        elif t - cur[1] > SESSION_GAP_S * 1_000_000:
            done.append(cur)
            cur = [int(t), int(t), 1, float(v)]
        else:
            cur[1] = int(t)
            cur[2] += 1
            cur[3] += float(v)
    state.update(tuple(cur))
    state.setTimeoutDuration(SESSION_GAP_S * 1000)
    if done:
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "session_start": [pd.Timestamp(s[0], unit="us") for s in done],
                "session_end": [pd.Timestamp(s[1], unit="us") for s in done],
                "n_events": [s[2] for s in done],
                "total_value": [s[3] for s in done],
            }
        )


def sessionize(events: DataFrame) -> DataFrame:
    """Per-user 30-min-gap sessions as a custom stateful streaming operator."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Batch twin of :func:`sessionize` (window lag + cumulative session ids)
    — the oracle for the streaming test and a useful operator in itself."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    epoch = F.unix_timestamp(F.col("ts"))
    marked = events.withColumn(
        "new_sess", (epoch - F.lag(epoch).over(w) > gap_s).cast("int")
    ).withColumn("sess_id", F.sum(F.coalesce("new_sess", F.lit(1))).over(w))
    return marked.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
    ).drop("sess_id")
