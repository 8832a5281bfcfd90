"""Triangle counting via degree-ordered adjacency intersection (SURVEY §2.7).

Classic join-join-count with **degree orientation**: orient each undirected
edge from the lower-(degree, id) endpoint to the higher, so every wedge is
enumerated exactly once from its lowest vertex.  Degree orientation bounds
each vertex's out-degree by O(sqrt(m)) — the standard skew-taming trick for
hub vertices (the analog of the reference's large-row splitting), making the
wedge join's fan-out tractable at 10^12-edge scale.

Round 6 restructure (measured: the old plan spent 13 of 15.6 s re-executing
its own input subtree):

* all work runs on the CANONICAL half (src < dst) of the symmetrized table,
  materialized ONCE (localCheckpoint) — the old plan referenced the uncached
  input from 5 places (degree aggregate + both branches of a union + two
  adjacency joins), re-running the upstream join/distinct chain each time;
* orientation is a single ``when()`` projection instead of a union of two
  filtered branches — one pass, no duplicated subtree, no union;
* below the driver graph budget the whole computation runs as the exact
  NumPy twin on the driver (_smallgraph.triangle_corners): same degree
  orientation, same wedge set, same membership test, integer-exact.

Oracle: trace(A³)/6 on dense NumPy for small graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph500_bfs_spark.operators import _smallgraph
from graph500_bfs_spark.operators._mem import (
    CheckpointScope,
    persistent_ids,
    unpersist_ids,
)


def orient_edges(edges_sym: DataFrame) -> DataFrame:
    """Degree-oriented directed edge table: (src, dst) with rank(src) < rank(dst),
    rank = (deg, v) lexicographic.  One ``when()`` projection — the input
    subtree is evaluated once, not once per orientation branch."""
    canon = edges_sym.filter(F.col("src") < F.col("dst"))
    return _orient_canonical(canon, _degrees_from_canonical(canon))


def _degrees_from_canonical(canon: DataFrame) -> DataFrame:
    """degrees(v, deg) of the undirected graph from its canonical pairs —
    one aggregate over an exploded 2-row-per-edge stream (map-side combined),
    half the input of the old symmetrized-table groupBy."""
    return (
        canon.select(F.explode(F.array("src", "dst")).alias("v"))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )


def _orient_canonical(canon: DataFrame, deg: DataFrame) -> DataFrame:
    e = canon.join(
        deg.select(F.col("v").alias("sv"), F.col("deg").alias("sdeg")),
        canon["src"] == F.col("sv"),
    ).join(
        deg.select(F.col("v").alias("dv"), F.col("deg").alias("ddeg")),
        canon["dst"] == F.col("dv"),
    )
    keep = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(keep, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(keep, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )


def _intersections(o: DataFrame) -> DataFrame:
    """Per oriented edge (a, b): the closing corners adj(a) ∩ adj(b).
    ``o`` must be materialized by the caller (it feeds three subtrees)."""
    adj = o.groupBy(F.col("src").alias("v")).agg(F.collect_list("dst").alias("nbrs"))
    return (
        o.join(
            adj.select(F.col("v").alias("av"), F.col("nbrs").alias("a_nbrs")),
            F.col("src") == F.col("av"),
        )
        .join(
            adj.select(F.col("v").alias("bv"), F.col("nbrs").alias("b_nbrs")),
            F.col("dst") == F.col("bv"),
        )
        .select(
            F.col("src").alias("a"),
            F.col("dst").alias("b"),
            F.array_intersect("a_nbrs", "b_nbrs").alias("cs"),
        )
    )


def triangle_count(edges_sym: DataFrame) -> int:
    """Global triangle count (exact), via adjacency-array intersection.

    For each oriented edge (a, b) the triangles it closes are
    |adj(a) ∩ adj(b)| — with rank(a) < rank(b) < rank(c) each triangle is
    found exactly once, from its lowest-ranked vertex's edge to the middle
    one.  The plan keeps ONE ROW PER EDGE end to end: the wedge-count
    volume rides inside the two adjacency arrays and the intersection runs
    JVM-side (``array_intersect`` under codegen), so there is no
    wedge-sized exchange and no second join over it.  Degree orientation
    bounds every array at O(sqrt(m)), so the widest row is ~sqrt(m) longs
    even at 10^12 edges.
    """
    return triangle_count_canonical(edges_sym.filter(F.col("src") < F.col("dst")))


def triangle_count_canonical(canon_pairs: DataFrame) -> int:
    """:func:`triangle_count` over the graph's CANONICAL pair set — distinct
    (src, dst) rows with src < dst, one row per undirected edge.  Callers
    that already hold that form (e.g. a distinct src<dst co-occurrence
    table) skip the symmetrize→re-canonicalize round trip — one fewer
    distinct exchange over 2m rows for an identical count."""
    spark = canon_pairs.sparkSession
    start_ids = persistent_ids(spark)
    canon = canon_pairs.localCheckpoint(eager=True)
    m_canon = canon.count()
    try:
        if 2 * m_canon <= _smallgraph.triangle_row_budget():
            src, dst = _smallgraph.collect_edges(canon)
            got = _smallgraph.triangle_corners(src, dst, per_vertex=False)
            if got is not None:  # None: wedge volume wants the 32-core plan
                return got[1]
        o = _orient_canonical(canon, _degrees_from_canonical(canon)).localCheckpoint(
            eager=True
        )
        row = (
            _intersections(o)
            .select(F.size("cs").alias("k"))
            .agg(F.sum("k").alias("n"))
            .first()
        )
        return int(row["n"] or 0)
    finally:
        unpersist_ids(spark, persistent_ids(spark) - start_ids)


def per_vertex_triangles(edges_sym: DataFrame) -> DataFrame:
    """triangles(v, n_triangles) — per-vertex incident triangle counts.

    Same adjacency-intersection shape as :func:`triangle_count`, but the
    per-vertex tally needs the third corner, so the intersection is
    exploded: one output row per TRIANGLE (not per wedge — triangles are
    a subset, usually a small one, of the wedge set).
    """
    spark = edges_sym.sparkSession
    scope = CheckpointScope(spark)
    canon = edges_sym.filter(F.col("src") < F.col("dst")).localCheckpoint(eager=True)
    m_canon = canon.count()
    if 2 * m_canon <= _smallgraph.triangle_row_budget():
        import pandas as pd

        src, dst = _smallgraph.collect_edges(canon)
        got = _smallgraph.triangle_corners(src, dst, per_vertex=True)
        if got is not None:  # None: wedge volume wants the 32-core plan
            verts, _, corners = got
            canon.unpersist()
            nz = corners > 0
            return spark.createDataFrame(
                pd.DataFrame({"v": verts[nz], "n_triangles": corners[nz]}),
                "v long, n_triangles long",
            )
    o = _orient_canonical(canon, _degrees_from_canonical(canon)).localCheckpoint(
        eager=True
    )
    tri = _intersections(o).select("a", "b", F.explode("cs").alias("c"))
    # one corner explode + one partial-aggregated count: the triangle set
    # streams through map-side combine and is never materialized (a cache +
    # 3-way union here would pin O(#triangles) rows — wrong at 10^12 edges)
    out = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("v"))
        .groupBy("v")
        .agg(F.count("*").alias("n_triangles"))
    )
    return scope.finalize(out)
