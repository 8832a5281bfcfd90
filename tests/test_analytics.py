from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph500_bfs_spark.operators.components import connected_components, prune_trees
from graph500_bfs_spark.operators.label_propagation import label_propagation
from graph500_bfs_spark.operators.pagerank import pagerank
from graph500_bfs_spark.operators.triangles import per_vertex_triangles, triangle_count
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


@pytest.mark.parametrize("pairs", ALL)
def test_connected_components_exact(spark, pairs):
    es = edges_df(spark, pairs)
    got = {r["v"]: r["component"] for r in connected_components(es).collect()}
    assert got == oracles.connected_components(pairs)


@pytest.mark.parametrize("pairs", ALL)
def test_pagerank_fixed_iterations_exact(spark, pairs):
    """Same K iterations as the oracle → must agree to float precision."""
    es = edges_df(spark, pairs)  # symmetric directed copies
    sym_pairs = list({(s, d) for s, d in pairs if s != d} | {(d, s) for s, d in pairs if s != d})
    got = {r["v"]: r["score"] for r in pagerank(es, max_iter=15, tol=None).collect()}
    want = oracles.pagerank(sym_pairs, max_iter=15, tol=0.0)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_converged_allclose_1e6(spark):
    """North-rule contract: allclose(1e-6) vs the reference power iteration
    at convergence (independent NumPy oracle run to its own fixpoint)."""
    pairs = TRIANGLE_PENDANT
    es = edges_df(spark, pairs)
    sym_pairs = list({(s, d) for s, d in pairs if s != d} | {(d, s) for s, d in pairs if s != d})
    got = {r["v"]: r["score"] for r in pagerank(es, max_iter=300, tol=1e-9).collect()}
    want = oracles.pagerank(sym_pairs, max_iter=500, tol=1e-13)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6, (v, got[v], want[v])


def test_pagerank_dangling(spark):
    # directed chain with a dangling sink: 0→1→2
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {r["v"]: r["score"] for r in pagerank(e, max_iter=25, tol=None).collect()}
    want = oracles.pagerank([(0, 1), (1, 2)], max_iter=25, tol=0.0)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12


@pytest.mark.parametrize("pairs", ALL)
def test_label_propagation_exact(spark, pairs):
    es = edges_df(spark, pairs)
    got = {r["v"]: r["label"] for r in label_propagation(es, max_iter=7).collect()}
    want = oracles.label_propagation(pairs, max_iter=7)
    assert got == want


@pytest.mark.parametrize("pairs", ALL + [[(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 0), (2, 3)]])
def test_triangle_count_exact(spark, pairs):
    es = edges_df(spark, pairs)
    assert triangle_count(es) == oracles.triangle_count(pairs)


def test_per_vertex_triangles(spark):
    es = edges_df(spark, TRIANGLE_PENDANT)
    got = {r["v"]: r["n_triangles"] for r in per_vertex_triangles(es).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_prune_trees_path(spark):
    # path graph is all tree: core must be empty, parents form a valid forest
    es = edges_df(spark, PATH_GRAPH)
    core, parents = prune_trees(es)
    assert core.count() == 0
    assert parents.count() == 4  # one of the 5 vertices survives as root


def test_prune_trees_triangle_pendant(spark):
    es = edges_df(spark, TRIANGLE_PENDANT)
    core, parents = prune_trees(es)
    core_verts = {r["src"] for r in core.collect()}
    assert core_verts == {0, 1, 2}
    assert {(r["v"], r["parent"]) for r in parents.collect()} == {(3, 2)}


def test_ann_recall_vs_bruteforce(spark):
    """LSH and IVF top-k must recover most exact neighbors (recall floor)."""
    from graph500_bfs_spark.operators.similarity import cosine_topk, ivf_topk, lsh_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, k=5).collect()}
    ivf = {(r["query_id"], r["neighbor_id"]) for r in ivf_topk(emb, k=5).collect()}
    lsh = {(r["query_id"], r["neighbor_id"]) for r in lsh_topk(emb, k=5, n_tables=16, n_planes=4).collect()}
    assert len(ivf & exact) / len(exact) >= 0.5
    assert len(lsh & exact) / len(exact) >= 0.6


def test_embedding_near_dup_finds_planted_pairs(spark):
    """Plant perturbed copies of 5 vectors; the LSH+verify pipeline must
    recover exactly the planted (original, copy) pairs."""
    import numpy as np

    from graph500_bfs_spark.operators.similarity import embedding_near_dup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter("vec_id < 5").collect()
    rng = np.random.default_rng(7)
    dupes = [
        (int(r["vec_id"]) + 100000, [float(x + rng.normal(0, 0.002)) for x in r["embedding"]], 0)
        for r in base
    ]
    planted = spark.createDataFrame(dupes, emb.schema)
    full = emb.unionByName(planted)
    pairs = {
        (r["vec_a"], r["vec_b"]) for r in embedding_near_dup_pairs(full, threshold=0.98).collect()
    }
    assert pairs == {(i, i + 100000) for i in range(5)}


def test_rolling_fingerprint_matches_pure_python(spark):
    from graph500_bfs_spark.operators.textstats import rolling_fingerprint

    texts = [
        "",
        "a",
        "hello world",
        "Ünïcödé — bytes beyond ASCII ☃",
        "x" * 5000,
        "the quick brown fox jumps over the lazy dog " * 40,
        None,
    ]

    def pure(t):
        h = 0
        for b in (t or "").encode("utf-8"):
            h = (h * 257 + b) % ((1 << 61) - 1)
        return h

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {r["i"]: r["fp"] for r in df.select("i", rolling_fingerprint("text").alias("fp")).collect()}
    assert got == {i: pure(t) for i, t in enumerate(texts)}


def test_minhash_rowwise_equals_exploded_groupby(spark):
    """The row-wise STREAMING form (array_min over transform — stateless,
    zero shuffles, usable before a watermark) must stay value-identical to
    the batch exploded-shingle groupBy().min() form (round 6's measured-
    faster default: higher-order functions evaluate interpreted, the
    exploded aggregate compiles — 2× at sf0.1), including omitting docs too
    short to shingle.  Also guards the F.transform lambda-arity trap: a
    two-parameter lambda would receive the ARRAY INDEX as its second
    argument and silently hash the wrong prefix."""

    from graph500_bfs_spark.operators.dedup import (
        minhash_signature_cols,
        minhash_signatures,
        shingle_array,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again", 50),
            (2, "the quick brown fox jumps over the lazy cat again", 50),
            (3, "completely different text with many unusual tokens here now", 60),
            (4, "too short", 9),  # < n tokens: no shingles, no signature row
            (5, "", 0),
        ],
        "doc_id long, text string, n_chars int",
    )
    k, n = 8, 3
    batch = minhash_signatures(docs, k=k, n=n)
    rowwise = (
        docs.select("doc_id", shingle_array(n).alias("shingles"))
        .filter(F.size("shingles") > 0)
        .select("doc_id", *minhash_signature_cols(k))
    )
    assert sorted(batch.columns) == sorted(rowwise.columns)
    assert batch.exceptAll(rowwise).count() == 0 and rowwise.exceptAll(batch).count() == 0
    assert batch.count() == 3  # docs 4 and 5 have no shingles
    plan = rowwise._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # the streaming form stays map-only


def test_simhash_rowwise_equals_exploded_groupby(spark):
    """The batch exploded-token groupBy().sum() form (round 6's measured-
    faster default) must stay value-identical to the row-wise F.aggregate
    form (zero shuffles — the streaming-shaped construction, kept here as
    the reference twin; higher-order functions evaluate interpreted, which
    is why batch switched)."""
    from pyspark.sql import functions as F

    from graph500_bfs_spark.operators.dedup import _hash15, simhash_signatures

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha alpha", 28),  # duplicate tokens count
            (2, "one two three four five six", 27),
            (3, "x", 1),
        ],
        "doc_id long, text string, n_chars int",
    )
    bits = 32
    new = simhash_signatures(docs, bits=bits)

    def _bitsum(j):
        return F.aggregate(
            "hs",
            F.lit(0).cast("long"),
            lambda acc, x: acc + (F.shiftright(x, j).bitwiseAND(F.lit(1)) * 2 - 1),
        ).alias(f"s{j}")

    hashed = docs.select(
        "doc_id", F.transform(F.split(F.trim("text"), r"\s+"), _hash15).alias("hs")
    ).filter(F.col("hs").isNotNull())
    agg = hashed.select("doc_id", *[_bitsum(j) for j in range(bits)])
    sim = F.lit(0).cast("long")
    for j in range(bits):
        w = (1 << j) if j < 63 else -(1 << 63)
        sim = sim + F.when(F.col(f"s{j}") > 0, F.lit(w).cast("long")).otherwise(F.lit(0))
    old = agg.select("doc_id", sim.alias("simhash"))
    assert new.exceptAll(old).count() == 0 and old.exceptAll(new).count() == 0
    plan = old._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # the row-wise twin stays map-only


def test_lsh_bucket_cap_bounds_candidates(spark):
    """Scale guard (round-3): a degenerate bucket shared by the whole corpus
    (all-identical docs — every band bucket and every simhash chunk
    collides) must be droppable via max_bucket_size so the bucket self-join
    cannot go quadratic on boilerplate-heavy corpora."""
    from graph500_bfs_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs

    n = 60
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta", 35) for i in range(n)],
        "doc_id long, text string, n_chars int",
    )
    full = n * (n - 1) // 2
    # uncapped: the pathological corpus generates the full quadratic pair set
    assert simhash_pairs(docs, bits=32, max_hamming=3, max_bucket_size=10**9).count() == full
    # capped: the degenerate buckets (size 60 > 8) are dropped entirely
    assert simhash_pairs(docs, bits=32, max_hamming=3, max_bucket_size=8).count() == 0
    # 16-bit chunks (the web-scale selectivity setting) agree at hamming<=1
    assert (
        simhash_pairs(docs, bits=32, max_hamming=1, chunk_bits=16, max_bucket_size=10**9).count()
        == full
    )
    assert (
        minhash_lsh_pairs(
            docs, k=8, bands=4, n=2, verify_threshold=0.05, max_bucket_size=10**9
        ).count()
        == full
    )
    assert (
        minhash_lsh_pairs(docs, k=8, bands=4, n=2, verify_threshold=0.05, max_bucket_size=8).count()
        == 0
    )


def test_lsh_bucket_cap_drops_are_reported(spark):
    """Round-4: cap drops must be OBSERVABLE, not silent — on the degenerate
    all-identical corpus, cap_stats reports every dropped bucket/row so a
    caller can tell 'no near-dups' from 'the cap ate everything'."""
    from graph500_bfs_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs

    n = 60
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta", 35) for i in range(n)],
        "doc_id long, text string, n_chars int",
    )
    stats = {}
    assert simhash_pairs(docs, bits=32, max_hamming=3, max_bucket_size=8,
                         cap_stats=stats).count() == 0
    # 4 chunks of the identical signature → 4 degenerate buckets, 60 rows each
    assert stats == {"dropped_buckets": 4, "dropped_rows": 4 * n}

    stats = {}
    assert minhash_lsh_pairs(docs, k=8, bands=4, n=2, verify_threshold=0.05,
                             max_bucket_size=8, cap_stats=stats).count() == 0
    assert stats == {"dropped_buckets": 4, "dropped_rows": 4 * n}

    # a benign corpus at defaults reports zero drops
    stats = {}
    benign = spark.createDataFrame(
        [(i, f"text number {i} with unique words w{i} x{i} y{i} z{i}", 40)
         for i in range(20)],
        "doc_id long, text string, n_chars int",
    )
    simhash_pairs(benign, bits=32, max_hamming=3, cap_stats=stats).count()
    assert stats == {"dropped_buckets": 0, "dropped_rows": 0}


def test_simhash_chunk_bits_auto_widens_for_wide_signatures(spark):
    """chunk_bits=None resolves to 8 for 32-bit signatures (the gate's
    pigeonhole-exact setting) and 16 for 64-bit ones (the web-scale
    selectivity setting) — the wide default that keeps ~N/256-sized
    degenerate buckets from tripping the cap everywhere."""
    from graph500_bfs_spark.operators.dedup import simhash_pairs

    docs = spark.createDataFrame(
        [(i, f"doc {i} alpha beta w{i} x{i}", 20) for i in range(12)],
        "doc_id long, text string, n_chars int",
    )
    # bits=64, auto chunk_bits → 4 chunks of 16 bits; explicit 16 must agree
    auto = simhash_pairs(docs, bits=64, max_hamming=3).collect()
    explicit = simhash_pairs(docs, bits=64, max_hamming=3, chunk_bits=16).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, explicit))
    # bits=32 auto stays at the pigeonhole-exact 8-bit chunks
    auto32 = simhash_pairs(docs, bits=32, max_hamming=3).collect()
    explicit32 = simhash_pairs(docs, bits=32, max_hamming=3, chunk_bits=8).collect()
    assert sorted(map(tuple, auto32)) == sorted(map(tuple, explicit32))


def test_rolling_fingerprint_slice_boundaries(spark, monkeypatch):
    """The length-sorted slicing (memory bound, round-3 ADVICE fix) must
    not change any hash: force a tiny cell budget so a mixed-length batch
    splits into many slices — including single-row slices for the outlier
    — and compare against the pure-Python reference."""
    import graph500_bfs_spark.operators.textstats as ts

    monkeypatch.setattr(ts, "_FP_CELL_BUDGET", 64)
    texts = ["", "ab", "z" * 7, "hello world", "q" * 200, "mid sized text here", "a"]

    def pure(t):
        h = 0
        for b in (t or "").encode("utf-8"):
            h = (h * 257 + b) % ((1 << 61) - 1)
        return h

    import pandas as pd

    # call the underlying function directly (the registered pandas_udf
    # captures the module global at executor side; monkeypatching only
    # affects a driver-side call, which is what we exercise here)
    got = ts.rolling_fingerprint.func(pd.Series(texts)).tolist()
    assert got == [pure(t) for t in texts]


def test_degree_reorder_map_two_phase(spark):
    """P6 two-phase ranking (round-3): dense ids equal the rank in the
    total order (deg desc, v) — across multiple range partitions — with no
    single-partition window over the vertex table."""
    from graph500_bfs_spark.operators.prep import degree_reorder_map, out_degrees, symmetrize

    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (4, 5), (5, 6), (6, 4), (7, 0)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["v"]: r["dense_id"] for r in degree_reorder_map(edges, n_partitions=4).collect()
    }
    deg = {
        r["v"]: r["deg"] for r in out_degrees(symmetrize(edges, dedup=False)).collect()
    }
    want_order = sorted(deg, key=lambda v: (-deg[v], v))
    assert got == {v: i for i, v in enumerate(want_order)}
    assert sorted(got.values()) == list(range(len(deg)))


def test_kmeans_ivf_production_path(spark):
    """Distributed spherical k-means (round 3): deterministic across runs,
    monotone cosine objective over iterations, and IVF with k-means
    centroids keeps recall vs the brute-force baseline."""
    from graph500_bfs_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

    c1 = kmeans_centroids(emb, n_centroids=8, n_iter=3)
    c2 = kmeans_centroids(emb, n_centroids=8, n_iter=3)
    rows1 = {r["centroid"]: tuple(round(x, 9) for x in r["cvec"]) for r in c1.collect()}
    rows2 = {r["centroid"]: tuple(round(x, 9) for x in r["cvec"]) for r in c2.collect()}
    assert rows1 == rows2  # deterministic
    assert len(rows1) == 8
    assert all(abs(sum(x * x for x in v) - 1.0) < 1e-6 for v in rows1.values())  # unit norm

    # Lloyd monotonicity (spherical): mean best-cosine must not decrease
    from pyspark.sql import functions as F

    from graph500_bfs_spark.operators.similarity import _dot, _norm

    def objective(cents):
        e = emb.select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vec")
        )
        s = e.join(F.broadcast(cents)).select(
            "vec_id", (_dot(F.col("vec"), F.col("cvec")) / _norm(F.col("vec"))).alias("sim")
        )
        return s.groupBy("vec_id").agg(F.max("sim").alias("b")).agg(F.avg("b")).collect()[0][0]

    c0 = kmeans_centroids(emb, n_centroids=8, n_iter=0)
    obj = [objective(c0), objective(kmeans_centroids(emb, n_centroids=8, n_iter=1)),
           objective(c1)]
    assert obj[0] <= obj[1] + 1e-9 and obj[1] <= obj[2] + 1e-9, obj

    # recall@5 of IVF-with-kmeans vs exact brute force
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, k=5, n_queries=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, k=5, n_queries=5, n_centroids=8, n_probe=4,
                          centroids=c1).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.6, f"IVF k-means recall too low: {recall}"


def test_ivf_at_rest_prunes_partitions_and_matches_ivf_topk(spark, tmp_path):
    """Round-4 at-rest IVF layout: the corpus partitioned by centroid on
    disk, probe reads ONLY the probed cells (PartitionFilters in the scan —
    the layout IS the index), and results are identical to the in-memory
    ivf_topk on the same centroids."""
    from pyspark.sql import functions as F

    from graph500_bfs_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_at_rest,
        ivf_write_partitioned,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    path = str(tmp_path / "ivf")
    ivf_write_partitioned(emb, path, n_centroids=16)

    import os

    cells_on_disk = {d for d in os.listdir(f"{path}/corpus") if d.startswith("centroid=")}
    assert len(cells_on_disk) > 4, "fixture degenerate: probe would read everything"

    queries = emb.filter(F.col("vec_id") < 10)
    got = ivf_topk_at_rest(spark, path, queries, k=5, n_probe=4)
    want = ivf_topk(emb, k=5, n_queries=10, n_centroids=16, n_probe=4)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # the corpus scan must carry a partition-pruning predicate on centroid:
    # build the pruned corpus scan exactly as ivf_topk_at_rest does and
    # check the physical plan reads fewer partitions than exist
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid" in plan
    import re

    # no scan in the plan may read ALL centroid partitions
    m = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("centroid" in f for f in m), plan[:2000]


def test_ivf_append_grows_layout_without_rewrite(spark, tmp_path):
    """ivf_append adds vectors to existing cells in place: probes after the
    append return exactly what a fresh in-memory index over the full corpus
    returns, and no pre-append data file was rewritten."""
    import os

    from pyspark.sql import functions as F

    from graph500_bfs_spark.operators.similarity import (
        ivf_append,
        ivf_topk,
        ivf_topk_at_rest,
        ivf_write_partitioned,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    # base keeps vec_id < 16 so the default centroid set equals the
    # full-corpus default; the odd remainder arrives later via append
    base = emb.filter((F.col("vec_id") < 16) | (F.col("vec_id") % 2 == 0))
    late = emb.filter((F.col("vec_id") >= 16) & (F.col("vec_id") % 2 == 1))
    assert late.count() > 0

    path = str(tmp_path / "ivf")
    ivf_write_partitioned(base, path, n_centroids=16)

    def data_files():
        out = set()
        for root, _, files in os.walk(f"{path}/corpus"):
            out |= {os.path.join(root, f) for f in files if f.endswith(".parquet")}
        return out

    before = data_files()
    ivf_append(late, path)
    after = data_files()
    assert before < after, "append must add files"
    assert before.issubset(after), "append must not rewrite existing files"

    queries = emb.filter(F.col("vec_id") < 10)
    got = ivf_topk_at_rest(spark, path, queries, k=5, n_probe=4)
    want = ivf_topk(emb, k=5, n_queries=10, n_centroids=16, n_probe=4)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_kmeans_trained_at_rest_prunes_and_matches_in_memory(spark, tmp_path):
    """Round-5: the at-rest IVF layout under TRAINED k-means centroids —
    write the corpus partitioned by the trained cells, probe must read
    only the probed partitions (PartitionFilters) and return exactly the
    in-memory ivf_topk answer on the same centroids."""
    from pyspark.sql import functions as F

    from graph500_bfs_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_at_rest,
        ivf_write_partitioned,
        kmeans_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    cents = kmeans_centroids(emb, n_centroids=8, n_iter=2).cache()
    path = str(tmp_path / "ivf_trained")
    ivf_write_partitioned(emb, path, n_centroids=8, centroids=cents)

    import os

    cells_on_disk = {d for d in os.listdir(f"{path}/corpus") if d.startswith("centroid=")}
    assert len(cells_on_disk) > 4, "fixture degenerate: probe would read everything"

    queries = emb.filter(F.col("vec_id") < 10)
    got = ivf_topk_at_rest(spark, path, queries, k=5, n_probe=4)
    want = ivf_topk(emb, k=5, n_queries=10, n_centroids=8, n_probe=4, centroids=cents)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid" in plan
    import re

    m = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("centroid" in f for f in m), plan[:2000]


def test_sized_partitions_math(spark):
    from graph500_bfs_spark.operators._iter import (
        TARGET_PARTITION_BYTES,
        sized_partitions,
        sized_shuffle,
    )

    conf_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    floor = max(1, spark.sparkContext.defaultParallelism // 4)
    # tiny data → the parallelism floor, never 1-2 serializing partitions
    assert sized_partitions(spark, 1000) == min(conf_p, floor)
    # huge data → capped at the session conf (explicit configs win)
    assert sized_partitions(spark, 10**12, row_bytes=24) == conf_p
    # mid data → ceil(bytes/target) once above the floor
    rows = (TARGET_PARTITION_BYTES // 16) * floor + 1
    assert sized_partitions(spark, rows) == min(conf_p, floor + 1)
    # the context manager scopes and restores the conf, even on error
    with sized_shuffle(spark, 1000) as p:
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == p
    assert int(spark.conf.get("spark.sql.shuffle.partitions")) == conf_p
    try:
        with sized_shuffle(spark, 1000):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert int(spark.conf.get("spark.sql.shuffle.partitions")) == conf_p
