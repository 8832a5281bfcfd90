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
* idle conversations are evicted after a processing-time TTL (state is
  bounded by ACTIVE conversations, not all conversations ever seen).

Ordering contract (from the engine's input hint): turns of a conversation
arrive in stable ``(conv_id, turn_idx)`` order across micro-batches.  A
turn at or below the conversation's high-water mark is late/duplicate
delivery and is DROPPED (counted nowhere — the batch deriver over a
backfill is the reconciliation path, as in any lambda-style ingest).

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
# last_idx: conv high-water mark; last_ent: its turn entity (adjacency tail);
# conv_ent: cached conv entity; seen_roles: '\x1f'-joined roles already
# emitted as participation edges (tiny, bounded by the role vocabulary)
_STATE_SCHEMA = "last_idx int, last_ent long, conv_ent long, seen_roles string"
IDLE_CONV_TTL_MS = 6 * 3600 * 1000


def _derive_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()  # idle conversation: evict, nothing to emit
        return
    rows = pd.concat(list(pdfs)).sort_values("turn_idx")
    if state.exists:
        last_idx, last_ent, conv_ent, seen_roles = state.get
        seen = set(seen_roles.split("\x1f")) if seen_roles else set()
    else:
        last_idx, last_ent, conv_ent, seen = -1, None, int(rows["conv_ent"].iloc[0]), set()
    rows = rows[rows["turn_idx"] > last_idx]  # late/duplicate delivery drops

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
    state.update((int(last_idx), None if last_ent is None else int(last_ent),
                  int(conv_ent), "\x1f".join(sorted(seen))))
    state.setTimeoutDuration(IDLE_CONV_TTL_MS)
    if src:
        yield pd.DataFrame({"src": src, "dst": dst, "kind": kind})


def read_transcript_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(path)


def derive_edges_stream(
    transcripts: DataFrame, entity_hash: str = "xxhash64"
) -> DataFrame:
    """edges(src, dst, kind) derived INCREMENTALLY from a transcript stream.

    Same edge semantics as sources/edges.py::derive_edges (tested stream ≡
    batch); entity hashing is JVM-side, only the cross-batch turn linking
    is stateful Python.
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
    )
    return with_ent.groupBy("conv_id").applyInPandasWithState(
        _derive_fn,
        outputStructType=EDGE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


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
