from __future__ import annotations

import pytest

from graph500_bfs_spark.operators.bfs import complete_result
from graph500_bfs_spark.operators.components import bfs_with_corebfs
from graph500_bfs_spark.operators.prep import vertex_ids
from graph500_bfs_spark.operators.validate import assert_valid_bfs
from tests import oracles
from tests.conftest import PATH_GRAPH, TRIANGLE_PENDANT, TWO_COMPONENTS, edges_df

# triangle core with a two-hop tail and a star hanging off it:
#   0-1-2 triangle; 2-3-4 tail; 4-{5,6,7} star
CORE_TAIL = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (4, 6), (4, 7)]


@pytest.mark.parametrize(
    "pairs,root",
    [
        (CORE_TAIL, 0),   # core root
        (CORE_TAIL, 7),   # leaf root — full ascent through 4, 3, 2
        (CORE_TAIL, 3),   # mid-tail root
        (PATH_GRAPH, 2),  # all-tree graph
        (TRIANGLE_PENDANT, 3),
        (TWO_COMPONENTS, 0),  # unreachable component must stay out (C4)
    ],
)
def test_corebfs_matches_plain_bfs_levels(spark, pairs, root):
    es = edges_df(spark, pairs)
    state, _ = bfs_with_corebfs(es, root)
    got = {r["v"]: r["level"] for r in state.collect()}
    assert got == oracles.bfs_levels(pairs, root)
    res = complete_result(state, vertex_ids(es))
    assert_valid_bfs(res, es, root)


def test_graph500_protocol_midscale_validated(spark):
    """CI leg of the north-star contract: the full protocol at a mid scale
    with per-root five-check validation enabled."""
    from graph500_bfs_spark.operators.graph500 import run_graph500_benchmark

    rep = run_graph500_benchmark(spark, scale=13, edgefactor=8, n_roots=3, validate=True)
    assert rep["n_roots"] == 3
    assert rep["TEPS_harmonic_mean_TEPS"] > 0
    assert all(lv > 3 for lv in rep["levels"])


def test_corebfs_join_ascent_forced_kronecker(spark):
    """Force the distributed per-hop ascent (dict_ascent_budget=0) on a
    Kronecker graph with a tree-vertex root and check exact parity with the
    driver-dict path AND plain BFS levels."""
    from graph500_bfs_spark.operators.bfs import bfs
    from graph500_bfs_spark.operators.prep import symmetrize
    from graph500_bfs_spark.sources.kronecker import kronecker_edges

    es = symmetrize(kronecker_edges(spark, scale=10, edgefactor=4)).cache()
    # pick a degree-1 vertex (a tree leaf) as root to exercise the ascent
    from pyspark.sql import functions as F

    deg1 = (
        es.groupBy(F.col("src").alias("v"))
        .agg(F.count("*").alias("deg"))
        .filter("deg = 1")
        .orderBy("v")
        .take(1)
    )
    assert deg1, "expected at least one leaf in a sparse R-MAT"
    root = int(deg1[0]["v"])

    state_join, _ = bfs_with_corebfs(es, root, dict_ascent_budget=0)
    state_dict, _ = bfs_with_corebfs(es, root)
    got_join = {(r["v"], r["level"]) for r in state_join.collect()}
    got_dict = {(r["v"], r["level"]) for r in state_dict.collect()}
    assert got_join == got_dict

    plain, _ = bfs(es, root)
    levels_plain = {r["v"]: r["level"] for r in plain.collect()}
    levels_join = {r["v"]: r["level"] for r in state_join.collect()}
    assert levels_join == levels_plain
    res = complete_result(state_join, vertex_ids(es))
    assert_valid_bfs(res, es, root)


def test_validation_levels_protocol(spark):
    """-v 0/1/2 semantics (reference mpi/main.cc:644-664): level 1 reuses the
    first root's validated traversed-edge count for every root; level 0 takes
    it from the pf_nedge table; level 2 validates and measures per root."""
    from graph500_bfs_spark.operators.graph500 import PF_NEDGE, run_graph500_benchmark

    r2 = run_graph500_benchmark(spark, scale=10, edgefactor=16, n_roots=2,
                                validation_level=2)
    r1 = run_graph500_benchmark(spark, scale=10, edgefactor=16, n_roots=2,
                                validation_level=1)
    r0 = run_graph500_benchmark(spark, scale=10, edgefactor=16, n_roots=2,
                                validation_level=0)
    # level 1: every root carries the FIRST root's count
    assert len(set(r1["traversed_edges"])) == 1
    # level 0: the pf_nedge table entry — and since the generator is
    # bit-exact, level 1's validated count must agree up to self-loop slots
    # (our traversed counter excludes self-loops; pf_nedge includes them)
    assert r0["traversed_edges"][0] == PF_NEDGE[10] == 16383
    # our traversed counter excludes self-loop slots (symmetrize drops them);
    # pf_nedge counts them at reached vertices — the gap is bounded by the
    # graph's total self-loop slot count
    import numpy as np

    from graph500_bfs_spark.sources.mrg import graph500_edge_batch

    src, dst = graph500_edge_batch(np.arange(16 << 10, dtype=np.int64), 10)
    n_loops = int((src == dst).sum())
    assert 0 <= PF_NEDGE[10] - r1["traversed_edges"][0] <= n_loops
    # level 2 measures per root; roots in the same component agree
    assert all(t > 0 for t in r2["traversed_edges"])


def test_reset_unreachable_explicit_c4(spark):
    """Explicit C4 (reference postprocess.hpp:106-154): reachability
    propagates up the forest from the reached core set; forest vertices in
    a DISCONNECTED component get parent = -1, and the fixpoint
    short-circuits (rounds ≈ reachable-forest depth, not max_hops)."""
    from pyspark.sql import functions as F

    from graph500_bfs_spark.operators.components import prune_trees, reset_unreachable

    # component A: triangle 0-1-2 with a 2-hop tail 2-3-4
    # component B: disconnected path 10-11-12 (pure forest, no core)
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (10, 11), (11, 12)]
    es = edges_df(spark, pairs)
    core_edges, tree_parents = prune_trees(es)
    # reached set = component A's core (what a BFS from 0 reaches in-core)
    reached = spark.createDataFrame([(0,), (1,), (2,)], "v long")
    out = {r["v"]: r["parent"] for r in reset_unreachable(tree_parents, reached).collect()}
    tree_vs = {r["v"] for r in tree_parents.collect()}
    assert set(out) == tree_vs  # full forest covered, reachable AND not
    # component-A tail keeps its parents; component B is nulled
    assert out[3] == 2 and out[4] == 3
    for v in tree_vs & {10, 11, 12}:
        assert out[v] == -1, f"vertex {v} should be unreachable"


def test_corebfs_disconnected_forest_short_circuits(spark):
    """C2 ascent + C4 from a root inside a pure-forest component: the BFS
    must cover exactly that component and never splice the other one."""
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (10, 11), (11, 12)]
    es = edges_df(spark, pairs)
    state, _ = bfs_with_corebfs(es, 10)
    got = {r["v"]: r["level"] for r in state.collect()}
    assert got == oracles.bfs_levels(pairs, 10)
    assert set(got) == {10, 11, 12}
    res = complete_result(state, vertex_ids(es))
    assert_valid_bfs(res, es, 10)
