"""Round-6 driver fast paths: every budget-gated NumPy finisher must be
row-identical to the distributed plan it replaces (the dispatch changes the
physical strategy, never the answer — the bfs_roots contract extended to
the analytics operators), and every fallback branch must actually fall
back."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests import oracles
from tests.conftest import (
    HUB_SKEW,
    PATH_GRAPH,
    STAR_GRAPH,
    TRIANGLE_PENDANT,
    TWO_COMPONENTS,
    edges_df,
)

ALL = [PATH_GRAPH, STAR_GRAPH, TWO_COMPONENTS, TRIANGLE_PENDANT, HUB_SKEW]


def rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("pairs", ALL)
def test_driver_and_distributed_paths_identical(spark, pairs, monkeypatch):
    """cc / lpa / pagerank / triangles: forced-distributed (budget 0) and
    driver-path results are identical rows."""
    from graph500_bfs_spark.operators.components import connected_components
    from graph500_bfs_spark.operators.label_propagation import label_propagation
    from graph500_bfs_spark.operators.pagerank import pagerank
    from graph500_bfs_spark.operators.triangles import (
        per_vertex_triangles,
        triangle_count,
    )

    es = edges_df(spark, pairs)
    driver = {
        "cc": rows(connected_components(es)),
        "lpa": rows(label_propagation(es, max_iter=5)),
        "tri": triangle_count(es),
        "triv": rows(per_vertex_triangles(es)),
        "pr": {r["v"]: r["score"] for r in pagerank(es, max_iter=8, tol=None).collect()},
    }
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_GRAPH_ROWS", "0")
    dist = {
        "cc": rows(connected_components(es)),
        "lpa": rows(label_propagation(es, max_iter=5)),
        "tri": triangle_count(es),
        "triv": rows(per_vertex_triangles(es)),
        "pr": {r["v"]: r["score"] for r in pagerank(es, max_iter=8, tol=None).collect()},
    }
    assert driver["cc"] == dist["cc"]
    assert driver["lpa"] == dist["lpa"]
    assert driver["tri"] == dist["tri"]
    assert driver["triv"] == dist["triv"]
    assert set(driver["pr"]) == set(dist["pr"])
    for v in driver["pr"]:
        assert abs(driver["pr"][v] - dist["pr"][v]) < 1e-12


def test_bfs_driver_path_matches_distributed_including_directions(spark, monkeypatch):
    """BFS: identical state rows AND an identical DirectionGuard decision
    sequence — the driver path feeds the guard the same exact counters, so
    the recorded direction phases must agree superstep for superstep."""
    from graph500_bfs_spark.operators.bfs import bfs
    from graph500_bfs_spark.operators.prep import symmetrize
    from graph500_bfs_spark.sources.kronecker import kronecker_edges

    es = symmetrize(kronecker_edges(spark, scale=10, edgefactor=16), dedup=False).cache()
    root = int(
        es.groupBy("src").count().orderBy(F.desc("count"), F.asc("src")).first()["src"]
    )
    state_drv, met_drv = bfs(es, root)
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_GRAPH_ROWS", "0")
    state_dist, met_dist = bfs(es, root)
    assert rows(state_drv) == rows(state_dist)
    assert [s["direction"] for s in met_drv.supersteps] == [
        s["direction"] for s in met_dist.supersteps
    ]
    assert [s["frontier_size"] for s in met_drv.supersteps] == [
        s["frontier_size"] for s in met_dist.supersteps
    ]
    assert met_drv.traversed_edges == met_dist.traversed_edges
    es.unpersist()


def test_cc_distributed_tail_finish_exact(spark, monkeypatch):
    """Force the distributed CC loop with a budget small enough that the
    initial gate refuses but the shrinking boundary eventually fits: the
    tail finish must close the run to the exact min-id fixpoint (and its
    too-big branch must keep iterating rather than collect)."""
    from graph500_bfs_spark.operators.components import connected_components

    # two long paths → slow hash-min convergence → a real tail
    pairs = [(i, i + 1) for i in range(30)] + [(100 + i, 101 + i) for i in range(20)]
    es = edges_df(spark, pairs)
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_GRAPH_ROWS", "24")
    got = {r["v"]: r["component"] for r in connected_components(es).collect()}
    assert got == oracles.connected_components(pairs)


def test_triangle_wedge_budget_falls_back_to_distributed(spark, monkeypatch):
    """A zero wedge budget must reject the NumPy path after the collect and
    still return the exact count through the distributed plan."""
    from graph500_bfs_spark.operators.triangles import (
        per_vertex_triangles,
        triangle_count,
    )

    es = edges_df(spark, TRIANGLE_PENDANT)
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_TRI_WEDGES", "0")
    assert triangle_count(es) == oracles.triangle_count(TRIANGLE_PENDANT)
    got = {r["v"]: r["n_triangles"] for r in per_vertex_triangles(es).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_sssp_driver_path_matches_distributed(spark, monkeypatch):
    """SSSP: driver and distributed paths reach the identical integer
    fixpoint with the same iteration count."""
    from graph500_bfs_spark.operators.sssp import sssp

    es = edges_df(spark, HUB_SKEW)
    ew = es.withColumn("w", (F.col("src") + F.col("dst")) % 5 + 1)
    d1, it1 = sssp(ew, 0)
    r1 = rows(d1)
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_GRAPH_ROWS", "0")
    d2, it2 = sssp(ew, 0)
    assert r1 == rows(d2)
    assert it1 == it2


def test_symmetrize_canonical_equals_union_distinct(spark):
    """Round-6 symmetrize (distinct over the canonical orientation, then
    emit both directions) must equal the round-5 form (union both
    directions, then distinct) on graphs with self-loops and duplicates."""
    from graph500_bfs_spark.operators.prep import symmetrize

    pairs = [(0, 0), (0, 1), (1, 0), (0, 1), (2, 3), (3, 2), (4, 4), (5, 6)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = rows(symmetrize(df))
    both = df.select("src", "dst").union(
        df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    want = rows(both.filter(F.col("src") != F.col("dst")).distinct())
    assert got == want
    # dedup=False unchanged: keeps parallel edges, both directions
    assert len(rows(symmetrize(df, dedup=False))) == 2 * (len(pairs) - 2)
