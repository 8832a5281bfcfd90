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

Entity ids are ``xxhash64`` of a typed key (``conv:…``, ``role:…``,
``tool:…``) — closed-form relabeling in the same spirit as the reference's
scramble permutation (/root/reference/generator/graph_generator.hpp:623-637):
no permutation table, no shuffle, collision probability ~n²/2⁶⁴.

Role/tool vertices are deliberate *hubs* (degree ≈ n_convs) — the skew the
reference spends its 2D-partitioning + large-row machinery on
(/root/reference/mpi/bfs.hpp:1076-1127); our BFS handles it with salted
two-stage aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EDGE_SCHEMA = "src long, dst long, kind string"


def _entity(kind_col, name_col):
    return F.xxhash64(F.concat(kind_col, F.lit(":"), name_col))


def derive_edges(transcripts: DataFrame) -> DataFrame:
    """edges(src, dst, kind) — directed as derived; symmetrize separately."""
    t = transcripts
    turn_entity = F.when(
        t["tool"].isNotNull(), _entity(F.lit("tool"), t["tool"])
    ).otherwise(_entity(F.lit("role"), t["role"]))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    with_ent = t.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        turn_entity.alias("ent"),
        _entity(F.lit("conv"), t["conv_id"]).alias("conv_ent"),
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
            _entity(F.lit("tool"), F.col("tool")).alias("dst"),
        )
        .withColumn("kind", F.lit("tool"))
    )
    participation = (
        with_ent.select(
            F.col("conv_ent").alias("src"),
            _entity(F.lit("role"), F.col("role")).alias("dst"),
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
