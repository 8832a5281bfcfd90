"""Transcript → link-graph edge derivation (SURVEY.md §2.1 S9).

Vertices are **conv / tool / role entities** (north rule).  Edges:

* ``adjacency`` — consecutive turns within a ``conv_id`` under stable
  ``turn_idx`` order link the *turn entities* of the two turns, where a
  turn's entity is its tool (if it invoked one) else its role.  Expressed
  with ``Window.partitionBy(conv_id).orderBy(turn_idx)`` + ``lag`` —
  one shuffle on conv_id, no per-row Python.
* ``tool`` — conversation entity ↔ tool entity for every tool invocation.
* ``participation`` — conversation entity ↔ role entity (connects each
  conversation into the global graph).

Entity ids are a hash of a typed key (``conv:…``, ``role:…``, ``tool:…``)
— closed-form relabeling in the same spirit as the reference's scramble
permutation (/root/reference/generator/graph_generator.hpp:623-637): no
permutation table, no shuffle, collision probability ~n²/2^bits.  Two hash
modes:

* ``xxhash64`` (default) — JVM-native, fastest, production path;
* ``md5`` — first 15 hex digits of md5 as int64, bit-identical in DuckDB
  (``CAST(('0x' || substr(md5(k),1,15)) AS BIGINT)``), so the correctness
  gate can run the WHOLE window-lag derivation against a SQL oracle
  (round-2 VERDICT: transcript_edges was the last no-oracle entry solely
  because xxhash64 has no DuckDB twin).

Role/tool vertices are deliberate *hubs* (degree ≈ n_convs) — the skew the
reference spends its 2D-partitioning + large-row machinery on
(/root/reference/mpi/bfs.hpp:1076-1127); our BFS handles it with salted
two-stage aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EDGE_SCHEMA = "src long, dst long, kind string"


def _entity(kind_col, name_col, entity_hash: str = "xxhash64"):
    key = F.concat(kind_col, F.lit(":"), name_col)
    if entity_hash == "xxhash64":
        return F.xxhash64(key)
    if entity_hash == "md5":
        return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown entity_hash {entity_hash!r}")


def derive_edges(transcripts: DataFrame, entity_hash: str = "xxhash64") -> DataFrame:
    """edges(src, dst, kind) — directed as derived; symmetrize separately."""
    t = transcripts

    def ent(kind_col, name_col):
        return _entity(kind_col, name_col, entity_hash)

    turn_entity = F.when(
        t["tool"].isNotNull(), ent(F.lit("tool"), t["tool"])
    ).otherwise(ent(F.lit("role"), t["role"]))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    with_ent = t.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        turn_entity.alias("ent"),
        ent(F.lit("conv"), t["conv_id"]).alias("conv_ent"),
    ).withColumn("prev_ent", F.lag("ent").over(w))

    adjacency = (
        with_ent.filter(F.col("prev_ent").isNotNull())
        .select(F.col("prev_ent").alias("src"), F.col("ent").alias("dst"))
        .withColumn("kind", F.lit("adjacency"))
    )
    tool_edges = (
        with_ent.filter(F.col("tool").isNotNull())
        .select(
            F.col("conv_ent").alias("src"),
            ent(F.lit("tool"), F.col("tool")).alias("dst"),
        )
        .withColumn("kind", F.lit("tool"))
    )
    participation = (
        with_ent.select(
            F.col("conv_ent").alias("src"),
            ent(F.lit("role"), F.col("role")).alias("dst"),
        )
        .distinct()
        .withColumn("kind", F.lit("participation"))
    )
    return adjacency.unionByName(tool_edges).unionByName(participation)


def derive_vertices(transcripts: DataFrame) -> DataFrame:
    """vertices(v, vkind, name) — the entity dictionary."""
    t = transcripts
    convs = t.select(
        _entity(F.lit("conv"), F.col("conv_id")).alias("v"),
        F.lit("conv").alias("vkind"),
        F.col("conv_id").alias("name"),
    ).distinct()
    roles = t.select(
        _entity(F.lit("role"), F.col("role")).alias("v"),
        F.lit("role").alias("vkind"),
        F.col("role").alias("name"),
    ).distinct()
    tools = (
        t.filter(F.col("tool").isNotNull())
        .select(
            _entity(F.lit("tool"), F.col("tool")).alias("v"),
            F.lit("tool").alias("vkind"),
            F.col("tool").alias("name"),
        )
        .distinct()
    )
    return convs.unionByName(roles).unionByName(tools)
