"""Streaming (incremental) transcript → edge derivation.

The batch deriver (sources/edges.py, SURVEY §2.1 S9) recomputes the whole
edge table; at 10^12 turns the table is *living* — new transcript turns
arrive continuously and only their edges should be derived.  This module is
the Structured-Streaming form of the SAME contract:

* entity hashing stays in JVM expressions (xxhash64 / md5 — identical to
  the batch path) BEFORE the stateful step, so no hash is ever computed in
  Python;
* the only genuinely stateful part of the derivation — the ``lag`` that
  links consecutive turns across micro-batch boundaries — runs in
  ``applyInPandasWithState`` keyed by ``conv_id`` with O(1) state per
  conversation: (last turn_idx, last turn entity, roles already emitted);
* ``adjacency`` and ``tool`` edges are emitted per qualifying turn exactly
  as in batch; ``participation`` edges are emitted on FIRST sight of a
  (conv, role) pair — the streaming form of the batch ``distinct`` with
  per-conv bounded state instead of a global dedup;
* idle conversations are evicted after an EVENT-TIME TTL driven by the
  ``ts`` watermark (state is bounded by ACTIVE conversations, not all
  conversations ever seen).  Event time, not processing time, because a
  backfill replay runs arbitrarily faster or slower than wall-clock: a
  processing-time TTL evicts live conversations when replay stalls and
  keeps dead ones when replay races — watermark-driven eviction depends
  only on the DATA, so replay pacing never changes the answer (tested:
  all-files-in-one-trigger ≡ one-file-per-trigger).

Ordering contract (from the engine's input hint): turns of a conversation
arrive in stable ``(conv_id, turn_idx)`` order across micro-batches.  A
turn at or below the conversation's high-water mark is late/duplicate
delivery and is DROPPED — and every drop is COUNTED: the per-batch
``dropped_turns`` total is surfaced through the query's observed metrics
(``progress.observedMetrics["edge_deriver"]``), the same observability
contract the dedup caps got (operators/dedup.py cap_stats).  Rows Spark
itself drops below the watermark are visible in the standard
``stateOperators[].numRowsDroppedByWatermark`` progress field.  The batch
deriver over a backfill remains the reconciliation path.

Stream ≡ batch is tested: the union of edges emitted across micro-batches
(files fed one per trigger) equals the batch ``derive_edges`` output as a
multiset.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from graph500_bfs_spark.sources.edges import _entity

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

EDGE_SCHEMA = "src long, dst long, kind string"
#: sentinel ``kind`` for in-stream drop-count rows: produced by _derive_fn,
#: aggregated by the observe() below, filtered before the sink — never
#: visible to a consumer of the edge stream
DROP_KIND = "_dropped"
# last_idx: conv high-water mark; last_ent: its turn entity (adjacency tail);
# conv_ent: cached conv entity; seen_roles: '\x1f'-joined roles already
# emitted as participation edges (tiny, bounded by the role vocabulary);
# max_ts_ms: conversation event-time high-water mark (drives the TTL)
_STATE_SCHEMA = (
    "last_idx int, last_ent long, conv_ent long, seen_roles string, max_ts_ms long"
)
IDLE_CONV_TTL_MS = 6 * 3600 * 1000


def _derive_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()  # idle conversation: evict, nothing to emit
        return
    rows = pd.concat(list(pdfs)).sort_values("turn_idx")
    if state.exists:
        last_idx, last_ent, conv_ent, seen_roles, max_ts_ms = state.get
        seen = set(seen_roles.split("\x1f")) if seen_roles else set()
    else:
        last_idx, last_ent, conv_ent, seen, max_ts_ms = (
            -1, None, int(rows["conv_ent"].iloc[0]), set(), 0,
        )
    n_before = len(rows)
    rows = rows[rows["turn_idx"] > last_idx]  # late/duplicate delivery drops
    n_dropped = n_before - len(rows)

    src, dst, kind = [], [], []
    if len(rows):
        ents = rows["ent"].astype("int64").to_numpy()
        # adjacency: in-batch consecutive pairs + the cross-batch boundary
        # pair from state — exactly the batch window-lag semantics
        prev = list(ents[:-1])
        cur = list(ents[1:])
        if last_ent is not None:
            prev = [int(last_ent)] + prev
            cur = [int(ents[0])] + cur
        src += prev
        dst += cur
        kind += ["adjacency"] * len(prev)
        # tool edges: one per tool invocation (batch parity: not distinct)
        toolish = rows[rows["has_tool"]]
        src += [conv_ent] * len(toolish)
        dst += [int(x) for x in toolish["tool_ent"]]
        kind += ["tool"] * len(toolish)
        # participation: first sight of (conv, role) only
        for role, rent in zip(rows["role"], rows["role_ent"]):
            if role not in seen:
                seen.add(role)
                src.append(conv_ent)
                dst.append(int(rent))
                kind.append("participation")
        last_idx = int(rows["turn_idx"].iloc[-1])
        last_ent = int(ents[-1])
        batch_max = rows["ts"].max()
        max_ts_ms = max(int(max_ts_ms), int(batch_max.value // 1_000_000))
    state.update((int(last_idx), None if last_ent is None else int(last_ent),
                  int(conv_ent), "\x1f".join(sorted(seen)), int(max_ts_ms)))
    # event-time TTL: evict once the WATERMARK (data time, not wall time)
    # passes the conversation's last activity + TTL.  Spark requires the
    # timeout timestamp to be beyond the current watermark — clamp for
    # conversations whose whole history is already older than TTL
    state.setTimeoutTimestamp(
        max(max_ts_ms + IDLE_CONV_TTL_MS, state.getCurrentWatermarkMs() + 1)
    )
    if n_dropped:
        src.append(n_dropped)
        dst.append(0)
        kind.append(DROP_KIND)
    if src:
        yield pd.DataFrame({"src": src, "dst": dst, "kind": kind})


def read_transcript_stream(
    spark: SparkSession, path: str, options: dict[str, str] | None = None
) -> DataFrame:
    """File-source transcript stream.  ``options`` go to the READER —
    source pacing knobs like ``maxFilesPerTrigger`` belong here (they are
    silently ignored if set on the writeStream side)."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.parquet(path)


def derive_edges_stream(
    transcripts: DataFrame,
    entity_hash: str = "xxhash64",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """edges(src, dst, kind) derived INCREMENTALLY from a transcript stream.

    Same edge semantics as sources/edges.py::derive_edges (tested stream ≡
    batch); entity hashing is JVM-side, only the cross-batch turn linking
    is stateful Python.  State eviction is event-time (``ts`` watermark +
    ``IDLE_CONV_TTL_MS``); ``watermark_delay`` is the out-of-order
    tolerance — rows older than (max seen ts − delay) are dropped by Spark
    before the stateful step (observable via
    ``stateOperators[].numRowsDroppedByWatermark``), while in-watermark
    late/duplicate turns are dropped by the high-water-mark check and
    counted in ``observedMetrics["edge_deriver"].dropped_turns``.
    """
    t = transcripts
    turn_entity = F.when(
        t["tool"].isNotNull(), _entity(F.lit("tool"), t["tool"], entity_hash)
    ).otherwise(_entity(F.lit("role"), t["role"], entity_hash))
    with_ent = t.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        turn_entity.alias("ent"),
        _entity(F.lit("conv"), t["conv_id"], entity_hash).alias("conv_ent"),
        # NON-NULLABLE long + flag, not a nullable long: a nullable int64
        # column crosses Arrow→pandas as float64, whose 53-bit mantissa
        # silently destroys the low bits of 64-bit entity hashes
        F.when(
            t["tool"].isNotNull(), _entity(F.lit("tool"), t["tool"], entity_hash)
        ).otherwise(F.lit(0)).alias("tool_ent"),
        t["tool"].isNotNull().alias("has_tool"),
        _entity(F.lit("role"), t["role"], entity_hash).alias("role_ent"),
        "ts",
    ).withWatermark("ts", watermark_delay)
    out = with_ent.groupBy("conv_id").applyInPandasWithState(
        _derive_fn,
        outputStructType=EDGE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    # per-batch drop observability: the sentinel rows carry per-conversation
    # drop counts; observe() aggregates them into the progress stream and
    # the filter keeps them out of the sink
    out = out.observe(
        "edge_deriver",
        F.sum(
            F.when(F.col("kind") == DROP_KIND, F.col("src")).otherwise(F.lit(0))
        ).alias("dropped_turns"),
        F.count(F.when(F.col("kind") != DROP_KIND, F.lit(1))).alias("emitted_edges"),
    )
    return out.filter(F.col("kind") != DROP_KIND)


def drain_available(query, timeout_s: int = 600, quiet_s: int = 10) -> bool:
    """Run an ``availableNow`` query until it terminates OR goes quiescent.

    A query with processing-time state timeouts can keep ticking empty
    micro-batches after the available data drains, so "terminated" is not
    a reliable done-signal: this waits until either self-termination
    (returns True) or no batch has consumed input rows for ``quiet_s``
    seconds (stops the query, returns False).  The ingest-CLI and test
    companion to :func:`derive_edges_stream`.
    """
    import time

    deadline = time.time() + timeout_s
    last_total, quiet_start = None, time.time()
    while time.time() < deadline:
        if query.awaitTermination(2):
            return True
        prog = query.recentProgress
        total = sum(int(p["numInputRows"]) for p in prog) if prog else 0
        if total != last_total:
            last_total, quiet_start = total, time.time()
        elif time.time() - quiet_start > quiet_s:
            break
    query.stop()
    return False
