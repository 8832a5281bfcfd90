"""Deterministic multi-turn conversation transcript synthesizer.

Input contract (BASELINE.json ``input_hint``)::

    transcripts(conv_id: string, turn_idx: int, role: string,
                text: string, tool: string, ts: timestamp)

Design notes
------------
Generation is *embarrassingly parallel*: each conversation's content is a pure
function of ``(seed, conv_index)`` via a counter-based RNG
(``numpy.random.Philox``).  This is the same determinism device the reference
uses for edge generation — its splittable MRG with O(1) skip-ahead lets any
edge index be produced independently on any rank
(/root/reference/generator/splittable_mrg.c, skip-ahead use at
/root/reference/generator/graph_generator.hpp:803-804).  We get the identical
property from Philox keys, so the table can be synthesized at any scale with
no sequential dependency and no shuffle: ``spark.range(n_convs)`` →
``mapInPandas`` emitting that conversation's turns.

At 10^12-turn scale this generator produces ~conv-sized output partitions
directly from a range scan — no skew, no shuffle, columnar Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

TOOL_VOCAB = ["search", "exec", "browse", "calc", "fetch", "edit"]
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog data spark graph edge vertex "
    "frontier level parent degree shuffle partition batch arrow pandas "
    "query join filter agg window stream state check point label score".split()
)
EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z


def _gen_conv_turns(conv_index: int, seed: int, max_turns: int) -> pd.DataFrame:
    """All turns of one conversation — pure function of (seed, conv_index)."""
    rng = np.random.Generator(np.random.Philox(key=np.uint64(seed * 0x9E3779B9 + conv_index)))
    # geometric-ish length in [2, max_turns]
    n_turns = int(min(max_turns, 2 + rng.geometric(p=0.12)))
    idx = np.arange(n_turns, dtype=np.int32)
    roles = np.where(idx % 2 == 0, "user", "assistant").astype(object)
    if n_turns > 2 and rng.random() < 0.15:
        roles[0] = "system"
    # tool invocations only on assistant turns, with prob p_tool
    p_tool = 0.35
    tool_draw = rng.random(n_turns)
    tool_pick = rng.integers(0, len(TOOL_VOCAB), n_turns)
    tools = np.where(
        (roles == "assistant") & (tool_draw < p_tool),
        np.array(TOOL_VOCAB, dtype=object)[tool_pick],
        None,
    )
    # deterministic text: 3-8 words sampled by rng
    n_words = rng.integers(3, 9, n_turns)
    flat = rng.integers(0, len(_WORDS), int(n_words.sum()))
    texts, pos = [], 0
    for k in n_words:
        texts.append(" ".join(_WORDS[flat[pos : pos + k]]))
        pos += int(k)
    base_ts = EPOCH_2024 + (conv_index % 86400) * 1000
    ts = pd.to_datetime(base_ts + idx.astype(np.int64) * (30 + int(rng.integers(0, 90))), unit="s", utc=True).tz_localize(None)
    return pd.DataFrame(
        {
            "conv_id": f"conv_{conv_index:08d}",
            "turn_idx": idx,
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )


def synthesize_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    max_turns: int = 64,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic transcript table.

    ``spark.range(n_convs)`` drives a ``mapInPandas`` that expands each conv
    index into its turns — a pure generator stage with no shuffle, analogous
    to the reference's per-rank edge-chunk generation loop
    (/root/reference/mpi/benchmark_helper.hpp:152-241).
    """
    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches):
        for pdf in batches:
            frames = [_gen_conv_turns(int(i), seed, max_turns) for i in pdf["id"]]
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return spark.range(0, n_convs, numPartitions=parts).mapInPandas(gen, TRANSCRIPT_SCHEMA)
