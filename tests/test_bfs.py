from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph500_bfs_spark.operators.bfs import bfs, complete_result
from graph500_bfs_spark.operators.prep import vertex_ids
from graph500_bfs_spark.operators.validate import (
    assert_valid_bfs,
    count_traversed_edges,
    validate_bfs,
)
from tests import oracles
from tests.conftest import (
    HUB_SKEW,
    PATH_GRAPH,
    STAR_GRAPH,
    TRIANGLE_PENDANT,
    TWO_COMPONENTS,
    WITH_DUPS,
    WITH_SELF_LOOP,
    edges_df,
)


@pytest.mark.parametrize(
    "pairs,root",
    [
        (PATH_GRAPH, 0),
        (PATH_GRAPH, 2),
        (STAR_GRAPH, 0),
        (STAR_GRAPH, 3),
        (TWO_COMPONENTS, 0),
        (TWO_COMPONENTS, 10),
        (TRIANGLE_PENDANT, 3),
        (WITH_SELF_LOOP, 0),
        (WITH_DUPS, 2),
        (HUB_SKEW, 4),
    ],
)
def test_bfs_matches_oracle_and_validates(spark, pairs, root):
    es = edges_df(spark, pairs)
    state, metrics = bfs(es, root)
    got = {r["v"]: r["level"] for r in state.collect()}
    want = oracles.bfs_levels(pairs, root)
    assert got == want

    res = complete_result(state, vertex_ids(es))
    assert_valid_bfs(res, es, root)

    # parent of every reached non-root vertex is one level up
    rows = {r["v"]: (r["parent"], r["level"]) for r in res.collect()}
    for v, (p, lvl) in rows.items():
        if lvl > 0:
            assert rows[p][1] == lvl - 1


def test_bfs_deterministic_min_parent(spark):
    # diamond: 0-1, 0-2, 1-3, 2-3 → parent of 3 must be min(1,2)=1
    es = edges_df(spark, [(0, 1), (0, 2), (1, 3), (2, 3)])
    state, _ = bfs(es, 0)
    rows = {r["v"]: r["parent"] for r in state.collect()}
    assert rows[3] == 1


def test_traversed_edge_count(spark):
    es = edges_df(spark, TWO_COMPONENTS)
    state, _ = bfs(es, 10)
    res = complete_result(state, vertex_ids(es))
    # component {10,11,12} has 3 undirected edges
    assert count_traversed_edges(res, es) == 3


def test_validation_catches_bad_tree(spark):
    es = edges_df(spark, PATH_GRAPH)
    bad = spark.createDataFrame(
        [(0, 0, 0), (1, 0, 1), (2, 0, 1), (3, 2, 2), (4, 3, 3)],
        "v long, parent long, level int",
    )  # vertex 2 claims parent 0 but (0,2) is not an edge
    checks = validate_bfs(bad, es, 0)
    assert checks["v5_tree_edge_exists"] > 0


def test_salted_degree_equals_plain(spark):
    from graph500_bfs_spark.operators.prep import out_degrees, out_degrees_salted, symmetrize

    es = edges_df(spark, HUB_SKEW)
    plain = {r["v"]: r["deg"] for r in out_degrees(es).collect()}
    salted = {r["v"]: r["deg"] for r in out_degrees_salted(es).collect()}
    assert plain == salted


def test_salt_hub_edges_splits_hubs_only(spark):
    from graph500_bfs_spark.operators.prep import out_degrees, salt_hub_edges

    es = edges_df(spark, HUB_SKEW)
    deg = out_degrees(es)
    salted = salt_hub_edges(es, deg, hub_threshold=10, n_salts=4)
    rows = salted.collect()
    hub_salts = {r["salt"] for r in rows if r["src"] == 0}
    non_hub_salts = {r["salt"] for r in rows if r["src"] not in (0,)}
    assert len(hub_salts) > 1          # hub rows fan out across salts
    assert non_hub_salts <= {0}        # non-hubs untouched
    assert salted.count() == es.count()


def test_alpha_beta_autotune(spark):
    from graph500_bfs_spark.operators.graph500 import tune_alpha_beta
    from graph500_bfs_spark.operators.prep import out_degrees

    es = edges_df(spark, HUB_SKEW).cache()
    deg = out_degrees(es).cache()
    n, m = deg.count(), es.count()
    best = tune_alpha_beta(spark, es, [4], deg, n, m, alphas=(5.0, 20.0), betas=(14.0,))
    assert best["alpha"] in (5.0, 20.0) and best["beta"] == 14.0
    assert best["harmonic_mean_TEPS"] > 0


def test_harmonic_stddev_matches_norris_formula():
    """Reference logfile.h:110-112 prints std(recip, ddof=1) /
    (mean(recip)^2 * sqrt(n-1)).  Hand-compute for teps = [1, 2, 4]:
    recip = [1, 1/2, 1/4], mean = 7/12, hmean = 12/7,
    std(ddof=1) = sqrt(21)/12, hstd = sqrt(21)/12 * (12/7)^2 / sqrt(2)."""
    import math

    from graph500_bfs_spark.operators.graph500 import teps_stats

    s = teps_stats([1, 2, 4], [1.0, 1.0, 1.0])
    expect = (math.sqrt(21) / 12) * (12 / 7) ** 2 / math.sqrt(2)
    assert abs(s["harmonic_mean_TEPS"] - 12 / 7) < 1e-12
    assert abs(s["harmonic_stddev_TEPS"] - expect) < 1e-12


@pytest.mark.parametrize("strategy", ["join", "blocks", "shm", "msbfs"])
def test_direction_phases_monotone_no_flipflop(spark, tmp_path, strategy):
    """Growing/shrinking guard (ref bfs.hpp:3414-3429), now ONE shared
    implementation (operators/_direction.py) used by all four physical
    strategies: once the engine switches back to top-down it must never
    re-enter bottom-up — the direction sequence matches td+ bu* td*."""
    import numpy as np

    from graph500_bfs_spark.operators.prep import out_degrees, symmetrize
    from graph500_bfs_spark.sources.kronecker import kronecker_edges

    scale = 13 if strategy == "join" else 10
    es = symmetrize(kronecker_edges(spark, scale=scale, edgefactor=16), dedup=False).cache()
    deg = out_degrees(es).cache()
    m = es.count()
    root = int(deg.orderBy(F.desc("deg"), F.asc("v")).limit(1).collect()[0]["v"])

    if strategy == "join":
        _, met = bfs(es, root, degrees=deg, m_edges=m, n_vertices=deg.count())
    elif strategy == "blocks":
        from graph500_bfs_spark.operators.csr_blocks import bfs_blocks, build_blocks

        blocks = build_blocks(es, num_blocks=4).cache()
        _, met = bfs_blocks(blocks, root, n_vertices=deg.count(), m_edges=m, degrees=deg)
    else:
        dp = deg.orderBy("v").toPandas()
        dvs = dp["v"].to_numpy(np.int64)
        ddeg = dp["deg"].to_numpy(np.int64)
        path = str(tmp_path / "blocks")
        if strategy == "shm":
            from graph500_bfs_spark.operators.csr_shm import bfs_shm, export_blocks

            export_blocks(es, 4, path)
            _, met = bfs_shm(spark, path, 4, root, (dvs, ddeg), m)
        else:
            from graph500_bfs_spark.operators.msbfs import bfs_multi, export_blocks_indexed

            export_blocks_indexed(es, 4, path, dvs)
            _, met = bfs_multi(spark, path, 4, [root], (dvs, ddeg), m)

    dirs = [s["direction"] for s in met.supersteps]
    # collapse runs: e.g. td td bu bu td td -> [td, bu, td]
    phases = [d for i, d in enumerate(dirs) if i == 0 or d != dirs[i - 1]]
    assert phases[0] == "top_down"
    assert len(phases) <= 3, f"direction flip-flop ({strategy}): {dirs}"
    # an ef-16 R-MAT from a hub root is dense enough that bottom-up engages
    assert "bottom_up" in dirs, (strategy, dirs)
    if strategy == "join":
        assert all("frontier_repr" in s for s in met.supersteps)


def test_direction_guard_plateau_no_flipflop():
    """Unit test of the state machine on a plateau frontier sequence — the
    exact pattern that flip-flopped the unguarded formulas."""
    from graph500_bfs_spark.operators._direction import DirectionGuard

    g = DirectionGuard(n_total=100_000, m_total=1_600_000)
    seq = [(1, 2000), (500, 600_000), (5000, 900_000), (5000, 90_000), (100, 5000)]
    dirs = [g.step(nq, nqe) for nq, nqe in seq]
    phases = [d for i, d in enumerate(dirs) if i == 0 or d != dirs[i - 1]]
    assert phases == ["top_down", "bottom_up", "top_down"]
    # once back in top_down, growing is cleared permanently...
    assert g.growing is False
    # ...so a late plateau that re-satisfies the alpha test must NOT flip
    after = [g.step(5000, 900_000) for _ in range(3)]
    assert all(d == "top_down" for d in after), "re-entered bottom_up after B2T"


def test_direction_guard_restore_from_metrics():
    """Resume path (ADVICE r2): a resumed run that already took its B2T
    switch must come back with growing=False so it cannot re-enter
    bottom_up."""
    from graph500_bfs_spark.operators._direction import DirectionGuard

    g = DirectionGuard(n_total=1000, m_total=16000)
    g.restore_from_metrics(
        [
            {"direction": "top_down"},
            {"direction": "bottom_up"},
            {"direction": "top_down", "frontier_repr": "list"},
        ]
    )
    assert g.direction == "top_down"
    assert g.growing is False
    assert g.frontier_repr == "list"
    # a growing, high-edge frontier must NOT flip back to bottom_up
    assert g.step(500, 15000) == "top_down"


def test_alpha_beta_telemetry_tuner(spark):
    """B11 telemetry-driven rerun loop: candidates derive from recorded
    switch-level telemetry, the loop converges, and the returned pair is at
    least as good as the starting harmonic mean."""
    from graph500_bfs_spark.operators.graph500 import (
        sample_roots_spec,
        tune_alpha_beta_telemetry,
    )
    from graph500_bfs_spark.operators.prep import out_degrees, symmetrize
    from graph500_bfs_spark.sources.kronecker import kronecker_edges

    es = symmetrize(kronecker_edges(spark, scale=10, edgefactor=16), dedup=False).cache()
    m = es.count()
    deg = out_degrees(es).cache()
    n = deg.count()
    roots = sample_roots_spec(deg, 10, 2)
    out = tune_alpha_beta_telemetry(
        spark, es, roots, deg, n, m, max_steps=1
    )
    assert out["alpha"] > 0 and out["beta"] > 0
    assert len(out["trail"]) >= 1
    assert out["harmonic_mean_TEPS"] >= out["trail"][0]["harmonic_mean_TEPS"]


def test_search_root_seed_protocol(spark, tmp_path):
    """B11 -S root-seed search (ref main.cc:492-509): trial seeds come from
    the deterministic double stream (trial 0 = seed 0), every trial's root
    set follows the find_roots protocol at (r1=r2=seed), and the best
    seed's TEPS is the max over trials."""
    import numpy as np

    from graph500_bfs_spark.operators.graph500 import sample_roots_spec, search_root_seed
    from graph500_bfs_spark.operators.msbfs import export_blocks_indexed
    from graph500_bfs_spark.operators.prep import out_degrees, symmetrize
    from graph500_bfs_spark.sources.kronecker import kronecker_edges
    from graph500_bfs_spark.sources.mrg import USERSEED1, USERSEED2, make_random_numbers

    es = symmetrize(kronecker_edges(spark, scale=9, edgefactor=8), dedup=False).cache()
    m = es.count()
    deg = out_degrees(es).cache()
    dp = deg.orderBy("v").toPandas()
    dvs = dp["v"].to_numpy(np.int64)
    ddeg = dp["deg"].to_numpy(np.int64)
    path = str(tmp_path / "blocks")
    export_blocks_indexed(es, 4, path, dvs)

    out = search_root_seed(spark, path, 4, deg, (dvs, ddeg), m, scale=9, n_roots=2,
                           num_trials=3)
    assert len(out["trials"]) == 3
    assert out["trials"][0]["seed"] == 0  # trial 0 is the unseeded protocol
    # trial seeds reproduce the reference stream exactly
    for t in out["trials"][1:]:
        want = int(float(make_random_numbers(1, USERSEED1, USERSEED2, t["trial"])[0]) * (1 << 24))
        assert t["seed"] == want
    assert out["best_TEPS"] == max(t["TEPS"] for t in out["trials"])
    # different seeds genuinely shift the sampled root sets
    r0 = sample_roots_spec(deg, 9, 2, r1=out["trials"][0]["seed"], r2=out["trials"][0]["seed"])
    r1 = sample_roots_spec(deg, 9, 2, r1=out["trials"][1]["seed"], r2=out["trials"][1]["seed"])
    assert r0 != r1


def test_real_benchmark_spec_bundle(spark, monkeypatch):
    """-R (mpi/main.cc:846-856) is ONE switch: whatever the caller passed,
    it forces NUM_BFS_ROOTS roots, validation_level=2 (every root
    five-checked — a bad graph would raise), and the pre-exec warm-up.
    NUM_BFS_ROOTS is patched small to keep the fixture fast; the forcing
    reads the module global so the bundle logic under test is unchanged."""
    from graph500_bfs_spark.operators import graph500 as g5

    monkeypatch.setattr(g5, "NUM_BFS_ROOTS", 4)
    out = g5.run_graph500_benchmark(
        spark, scale=7, edgefactor=8,
        n_roots=1, validation_level=0,  # both must be overridden by -R
        real_benchmark=True,
    )
    assert out["real_benchmark"] is True
    assert out["n_roots"] == 4
    assert out["validation_level"] == 2
    assert len(out["bfs_times_s"]) == 4
    # level 2 = measured traversals, not the pf_nedge table
    assert all(n > 0 for n in out["traversed_edges"])


def test_sssp_unit_weights_equals_bfs_levels(spark):
    """SSSP with all weights = 1 must reproduce BFS levels exactly — the
    frontier Bellman-Ford degenerates to BFS (same fixpoint)."""
    from pyspark.sql import functions as F

    from graph500_bfs_spark.operators.bfs import bfs
    from graph500_bfs_spark.operators.prep import out_degrees, symmetrize
    from graph500_bfs_spark.operators.sssp import sssp
    from graph500_bfs_spark.sources.kronecker import kronecker_edges

    es = symmetrize(kronecker_edges(spark, scale=9, edgefactor=8)).cache()
    deg = out_degrees(es)
    root = int(deg.orderBy(F.desc("deg"), F.asc("v")).limit(1).collect()[0]["v"])
    state, _ = bfs(es, root)
    want = {(r["v"], r["level"]) for r in state.select("v", "level").collect()}
    dist, n_iter = sssp(es.withColumn("w", F.lit(1)), root)
    got = {(r["v"], r["dist"]) for r in dist.collect()}
    assert got == want
    assert n_iter <= max(lv for _, lv in want) + 2


def test_sssp_weighted_bounds_and_improvement(spark):
    """Weighted SSSP on the bit-exact weighted Kronecker stream: distances
    are bounded by level <= dist <= max_w * level, and at least one vertex
    is strictly closer through a longer-hop path than the BFS tree edge
    count implies (the weighted structure is actually exercised)."""
    from pyspark.sql import functions as F

    from graph500_bfs_spark.operators.bfs import bfs
    from graph500_bfs_spark.operators.prep import out_degrees
    from graph500_bfs_spark.operators.sssp import sssp
    from graph500_bfs_spark.sources.kronecker import kronecker_edges_weighted

    ew = kronecker_edges_weighted(spark, scale=9, edgefactor=8, max_weight=7)
    # undirected: keep the weight with both directions (w is per generated
    # edge slot; min across duplicate pairs keeps the table a function)
    pairs = ew.filter(F.col("src") != F.col("dst")).groupBy("src", "dst").agg(
        F.min("w").alias("w")
    )
    bi = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    ).groupBy("src", "dst").agg(F.min("w").alias("w")).cache()
    deg = out_degrees(bi.select("src", "dst"))
    root = int(deg.orderBy(F.desc("deg"), F.asc("v")).limit(1).collect()[0]["v"])

    dist, _ = sssp(bi, root)
    state, _ = bfs(bi.select("src", "dst"), root)
    lv = {r["v"]: r["level"] for r in state.collect()}
    dd = {r["v"]: r["dist"] for r in dist.collect()}
    assert set(dd) == set(lv)  # same reachable set
    assert all(lv[v] <= dd[v] <= 7 * lv[v] for v in dd)
    # some vertex's shortest weighted path uses MORE hops than its level
    assert any(dd[v] < lv[v] * 7 and dd[v] > lv[v] for v in dd)
    # the W1-W5 certificate proves exactness (not just the bounds above)
    from graph500_bfs_spark.operators.validate import assert_valid_sssp

    assert_valid_sssp(dist, bi, root)


def test_sssp_validation_catches_corruption(spark):
    """validate_sssp is a real certificate: a correct table passes with all
    zeros, and each corruption class fires the check that proves it wrong."""
    from pyspark.sql import functions as F

    from graph500_bfs_spark.operators.prep import out_degrees
    from graph500_bfs_spark.operators.sssp import sssp
    from graph500_bfs_spark.operators.validate import validate_sssp
    from graph500_bfs_spark.sources.kronecker import kronecker_edges_weighted

    ew = kronecker_edges_weighted(spark, scale=8, edgefactor=8, max_weight=5)
    pairs = ew.filter(F.col("src") != F.col("dst")).groupBy("src", "dst").agg(
        F.min("w").alias("w")
    )
    bi = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    ).groupBy("src", "dst").agg(F.min("w").alias("w")).cache()
    deg = out_degrees(bi.select("src", "dst"))
    root = int(deg.orderBy(F.desc("deg"), F.asc("v")).limit(1).collect()[0]["v"])
    dist, _ = sssp(bi, root)

    assert all(v == 0 for v in validate_sssp(dist, bi, root).values())

    # pick a reached non-root vertex to corrupt
    victim = int(
        dist.filter(F.col("v") != root).orderBy("v").limit(1).collect()[0]["v"]
    )

    # inflate one distance: its (previously tight) in-edge becomes relaxable
    inflated = dist.withColumn(
        "dist", F.when(F.col("v") == victim, F.col("dist") + 1).otherwise(F.col("dist"))
    )
    assert validate_sssp(inflated, bi, root)["w3_fixpoint"] > 0

    # drop a reached vertex: some edge now leaves the reached set
    assert validate_sssp(dist.filter(F.col("v") != victim), bi, root)["w5_closure"] > 0

    # lose the root row: W1 fires
    assert validate_sssp(dist.filter(F.col("v") != root), bi, root)["w1_root_zero"] == 1

    # a second zero-distance vertex: W1 uniqueness fires
    two_zeros = dist.withColumn(
        "dist", F.when(F.col("v") == victim, F.lit(0)).otherwise(F.col("dist"))
    )
    assert validate_sssp(two_zeros, bi, root)["w1_zero_unique"] > 0


def test_bfs_above_gate_shuffle_hash_path(spark, monkeypatch):
    """Force the above-BROADCAST_GATE plan (shuffle_hash hints on frontier,
    exclusion, and unvisited sides) and a shuffle cleanup every superstep;
    results must be identical to the broadcast-gated default.  This is the
    plan the web-scale runs take — sort-merge there would re-sort the
    cached adjacency per level (measured ENOSPC at scale 26)."""
    import graph500_bfs_spark.operators.bfs as bfs_mod

    es = edges_df(spark, HUB_SKEW).cache()
    baseline, _ = bfs(es, 4)
    base = {(r["v"], r["parent"], r["level"]) for r in baseline.collect()}

    monkeypatch.setattr(bfs_mod, "BROADCAST_GATE", 0)
    monkeypatch.setattr(bfs_mod, "SHUFFLE_CLEANUP_EDGE_BUDGET", 1)
    forced, _ = bfs(es, 4)
    got = {(r["v"], r["parent"], r["level"]) for r in forced.collect()}
    es.unpersist()
    assert got == base
