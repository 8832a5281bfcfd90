"""Edge-list preprocessing — the reference's "relational" pipeline (SURVEY §2.2).

Each operator is one declarative DataFrame expression; Catalyst supplies the
counting/packing/alltoall the reference hand-builds:

* P1 redistribute   → a single Exchange (``repartition`` by src hash)
  (/root/reference/mpi/benchmark_helper.hpp:255-381)
* P2 self-loop drop → ``filter(src != dst)`` (…:409,429,447)
* P3 symmetrize     → union with swapped columns (…:383-497)
* P4 scale estimate → ``max(greatest(src,dst))`` (…:488-494)
* P5 degree count   → hash aggregate, partial+final
  (/root/reference/mpi/graph_constructor.hpp:508-592)
* P6 degree-descending dense reorder (optional physical opt, …:594-660)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def remove_self_loops(edges: DataFrame) -> DataFrame:
    return edges.filter(F.col("src") != F.col("dst"))


def symmetrize(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """Emit both directions of every edge; optionally dedup parallel edges.

    Mirrors ``make_symmetry_edge_list`` — the reference keeps duplicates
    (they're harmless to BFS); dedup=True additionally canonicalizes so each
    undirected edge appears exactly twice, which PageRank/triangles need.

    The dedup form runs the distinct on the CANONICAL (least, greatest)
    orientation of the input — N rows through the exchange — and emits both
    directions afterwards with a narrow (shuffle-free) union.  The previous
    form unioned first and dedup'd 2N rows, so every symmetrize paid double
    the distinct's shuffle bytes (guide §2.3: shuffle fewer bytes).  The two
    forms produce the identical row set: {(x,y) : {x,y} an input pair, x≠y}.
    """
    if dedup:
        canon = (
            edges.select(
                F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        return canon.union(
            canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    both = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return both.filter(F.col("src") != F.col("dst"))


def estimate_num_vertices(edges: DataFrame) -> int:
    """P4 — max vertex id + 1 (only meaningful for dense ids)."""
    row = edges.agg(F.max(F.greatest("src", "dst")).alias("mx")).collect()[0]
    return int(row["mx"]) + 1 if row["mx"] is not None else 0


def out_degrees(edges: DataFrame) -> DataFrame:
    """P5 — degrees(v, deg) over a (usually symmetrized) edge table."""
    return edges.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("deg"))


def vertex_ids(edges: DataFrame) -> DataFrame:
    """Distinct vertex domain of an edge table: vertices(v)."""
    return (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .distinct()
    )


def degree_reorder_map(edges: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """P6 — map(v, dense_id) with dense_id assigned hub-first.

    The reference sorts local vertices by descending degree so hot vertices
    share bitmap words (VERTEX_REORDERING=2).  TWO-PHASE global ranking —
    no single-partition window (round 2's ``Window.orderBy`` with no
    partition key serialized the whole |V|-row table through one task; at
    10^12 turns that is a driver-killer):

    1. range-partition + sort by (deg desc, v) — a distributed sort whose
       partition index IS the global order of the ranges;
    2. per-partition local ranks (window partitioned by partition id — a
       balanced, parallel window) + broadcast prefix offsets from the
       P-row partition-count table.

    dense_id is deterministic regardless of the sampled range boundaries
    because (deg desc, v) is a total order.
    """
    spark = edges.sparkSession
    p = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    deg = out_degrees(symmetrize(edges, dedup=False))
    ranged = deg.repartitionByRange(p, F.desc("deg"), F.asc("v")).withColumn(
        "pid", F.spark_partition_id()
    )
    w = Window.partitionBy("pid").orderBy(F.desc("deg"), F.asc("v"))
    local = ranged.withColumn("lrank", F.row_number().over(w) - 1)
    counts = local.groupBy("pid").agg(F.count("*").alias("cnt"))
    # prefix-sum over the P-row count table: P is small (thousands at most),
    # so this single-partition window is O(P), not O(|V|)
    wo = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "offset", F.coalesce(F.sum("cnt").over(wo), F.lit(0))
    ).select("pid", "offset")
    return local.join(F.broadcast(offsets), "pid").select(
        "v", (F.col("lrank") + F.col("offset")).alias("dense_id")
    )


def salt_hub_edges(
    edges: DataFrame, degrees: DataFrame, hub_threshold: int = 1 << 20, n_salts: int = 32
) -> DataFrame:
    """Explicit hub salting (north rule): split each hub vertex's edge rows
    across ``n_salts`` sub-keys so no single reducer owns a whole hub row.

    The Spark restatement of the reference's large-row split
    (top_down_send_large, /root/reference/mpi/bfs.hpp:1076-1127) and of 2D
    partitioning's purpose (no rank owns an entire hub row,
    /root/reference/mpi/graph_constructor.hpp:21-29).  Needed when a
    downstream aggregation is NOT algebraic (map-side combinable) or a
    join key is skewed beyond what AQE's skew-join split handles:
    aggregate per (v, salt) first, then per v — two balanced shuffles
    instead of one shuffle with a straggler.

    Returns edges(src, dst, salt) with salt != 0 only for hub sources.
    """
    hubs = degrees.filter(F.col("deg") >= hub_threshold).select(F.col("v").alias("hub_v"))
    return (
        edges.join(F.broadcast(hubs), edges["src"] == F.col("hub_v"), "left")
        .select(
            "src",
            "dst",
            F.when(
                F.col("hub_v").isNotNull(), F.pmod(F.xxhash64("dst"), F.lit(n_salts)).cast("int")
            )
            .otherwise(F.lit(0))
            .alias("salt"),
        )
    )


def out_degrees_salted(
    edges: DataFrame, n_salts: int = 32
) -> DataFrame:
    """P5 with two-stage (salted) aggregation: per (src, salt) partial
    counts, then per src — the general skew-proof degree count for keys
    hot enough that even map-side combine leaves one reducer with the
    hub's entire partial set (10^12-turn scale contract).

    count() is algebraic so single-stage usually wins locally; this is the
    explicitly-salted form the north rule requires for the cluster path.
    """
    stage1 = (
        edges.select("src", F.pmod(F.xxhash64("dst"), F.lit(n_salts)).alias("salt"))
        .groupBy("src", "salt")
        .agg(F.count("*").alias("c"))
    )
    return stage1.groupBy(F.col("src").alias("v")).agg(F.sum("c").alias("deg"))


def range_partition_edges(edges: DataFrame, n_partitions: int) -> DataFrame:
    """Range partitioning by src (north rule): co-locates contiguous vertex
    ranges so Iceberg/parquet min-max pruning can skip blocks on point or
    range lookups of vertices — the layout choice for the edge table at
    rest (sorted within partitions for run-length-friendly encoding)."""
    return edges.repartitionByRange(n_partitions, "src").sortWithinPartitions("src", "dst")
