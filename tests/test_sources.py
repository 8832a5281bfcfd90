from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from graph500_bfs_spark.sources.edges import derive_edges, derive_vertices
from graph500_bfs_spark.sources.kronecker import (
    kronecker_edges,
    rmat_edges_numpy,
    scramble,
)
from graph500_bfs_spark.sources.transcripts import synthesize_transcripts


def test_transcripts_deterministic_and_schema(spark):
    t1 = synthesize_transcripts(spark, n_convs=50, seed=42).orderBy("conv_id", "turn_idx")
    t2 = synthesize_transcripts(spark, n_convs=50, seed=42).orderBy("conv_id", "turn_idx")
    rows1, rows2 = t1.collect(), t2.collect()
    assert rows1 == rows2
    assert [f.name for f in t1.schema.fields] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # per-row invariant: stable (conv_id, turn_idx) ordering, contiguous turn_idx
    by_conv = {}
    for r in rows1:
        by_conv.setdefault(r["conv_id"], []).append(r["turn_idx"])
    for idxs in by_conv.values():
        assert idxs == list(range(len(idxs)))


def test_transcript_text_roundtrip_invariant(spark, tmp_path):
    """Per-row invariant from input_hint: per-turn text equality under stable
    ordering after a round trip through the storage layer."""
    t = synthesize_transcripts(spark, n_convs=30, seed=7)
    path = str(tmp_path / "transcripts.parquet")
    t.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    orig = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t.collect()}
    rt = {(r["conv_id"], r["turn_idx"]): r["text"] for r in back.collect()}
    assert orig == rt


def test_edge_derivation(spark):
    t = synthesize_transcripts(spark, n_convs=40, seed=42).cache()
    e = derive_edges(t).cache()
    kinds = {r["kind"] for r in e.select("kind").distinct().collect()}
    assert kinds == {"adjacency", "tool", "participation"}
    # adjacency edge count = Σ (turns-1) per conv
    n_adj = e.filter("kind='adjacency'").count()
    n_turns = t.count()
    n_convs = t.select("conv_id").distinct().count()
    assert n_adj == n_turns - n_convs
    # tool edges = tool invocations
    assert e.filter("kind='tool'").count() == t.filter("tool is not null").count()
    # every edge endpoint is a known vertex
    v = derive_vertices(t)
    assert (
        e.join(v.withColumnRenamed("v", "vv"), e["src"] == F.col("vv"), "left_anti").count() == 0
    )


def test_scramble_is_bijection():
    for scale in (6, 10, 13):
        n = 1 << scale
        out = scramble(np.arange(n, dtype=np.uint64), scale)
        assert len(np.unique(out)) == n
        assert out.min() >= 0 and out.max() < n


def test_rmat_deterministic_and_distribution():
    idx = np.arange(0, 16 << 10, dtype=np.int64)
    s1, d1 = rmat_edges_numpy(idx, scale=10)
    s2, d2 = rmat_edges_numpy(idx, scale=10)
    assert np.array_equal(s1, s2) and np.array_equal(d1, d2)
    assert s1.min() >= 0 and s1.max() < 1 << 10
    # R-MAT skew: top-1% vertices own a large share of edges (power law-ish)
    deg = np.bincount(np.concatenate([s1, d1]), minlength=1 << 10)
    top = np.sort(deg)[::-1]
    assert top[: len(top) // 100].sum() > 0.08 * deg.sum()


def test_kronecker_spark_matches_local(spark):
    from graph500_bfs_spark.sources.mrg import graph500_edge_batch

    idx = np.arange(0, 4 << 8, dtype=np.int64)

    # exact (default) path == local bit-exact generator
    df = kronecker_edges(spark, scale=8, edgefactor=4, partitions=4)
    got = df.orderBy("src", "dst").collect()
    s, d = graph500_edge_batch(idx, scale=8)
    want = sorted(zip(s.tolist(), d.tolist()))
    assert [(r["src"], r["dst"]) for r in got] == want
    assert df.count() == 4 << 8

    # fast splitmix path == its local twin
    df2 = kronecker_edges(spark, scale=8, edgefactor=4, partitions=4, exact=False)
    got2 = df2.orderBy("src", "dst").collect()
    s2, d2 = rmat_edges_numpy(idx, scale=8)
    want2 = sorted(zip(s2.tolist(), d2.tolist()))
    assert [(r["src"], r["dst"]) for r in got2] == want2


def _union_find_component(n, src, dst, root):
    parent = np.arange(n, dtype=np.int64)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for u, v in zip(src.tolist(), dst.tolist()):
        if u == v:
            continue
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv

    r = find(root)
    return np.fromiter((find(i) == r for i in range(n)), dtype=bool, count=n)


def test_pf_nedge_checksum_bit_exact_generator():
    """End-to-end bit-exactness: reproduce the reference's pf_nedge[scale]
    traversed-edge checksums (/root/reference/mpi/utils.hpp:3687-3733) —
    the count of generated edge slots (self-loops and duplicates included,
    validate.hpp:840-872) whose endpoints are reached from the first
    protocol root (find_roots, benchmark_helper.hpp:528-560).  Any single-
    bit deviation in the MRG skip, Bernoulli descent, rejection sampling,
    or scramble changes these counts."""
    from graph500_bfs_spark.sources.mrg import find_roots_exact, graph500_edge_batch

    pf_nedge = {10: 16383, 12: 65535, 13: 131070, 14: 262144, 16: 1048570}
    for scale, expected in pf_nedge.items():
        m, n = 16 << scale, 1 << scale
        src, dst = graph500_edge_batch(np.arange(m, dtype=np.int64), scale)
        deg = np.zeros(n, dtype=np.int64)
        nl = src != dst
        np.add.at(deg, src[nl], 1)
        np.add.at(deg, dst[nl], 1)
        roots = find_roots_exact(scale, 1, lambda v: deg[v] > 0)
        if scale <= 13:
            in_comp = _union_find_component(n, src, dst, roots[0])
        else:  # vectorized HashMin + pointer doubling for the bigger scales
            lab = np.arange(n, dtype=np.int64)
            u, v = src[nl], dst[nl]
            while True:
                mn = np.minimum(lab[u], lab[v])
                new = lab.copy()
                np.minimum.at(new, u, mn)
                np.minimum.at(new, v, mn)
                new = new[new]
                if np.array_equal(new, lab):
                    break
                lab = new
            in_comp = lab == lab[roots[0]]
        assert in_comp[roots[0]]
        # every slot whose src is reached (tgt is then reached too)
        assert int(in_comp[src].sum()) == expected, scale


def test_mrg_batch_matches_scalar():
    """The vectorized skip/step/descent agree with the scalar Python-int
    path at every stage (same algebra, independent implementations)."""
    from graph500_bfs_spark.sources import mrg

    z = mrg.make_mrg_seed(2, 3)
    zs = z
    for _ in range(997):
        _, zs = mrg.mrg_next(zs)
    assert mrg.mrg_skip(z, 997) == zs

    idx = np.array([0, 1, 255, 256, 65535, 10**7], dtype=np.int64)
    Z = mrg.mrg_state_batch(idx, 2, 3)
    for j, i in enumerate(idx):
        assert tuple(int(Z[r, j]) for r in range(5)) == mrg.mrg_skip(z, int(i) << 64)

    val, Z2 = mrg._step_batch(Z)
    for j in range(len(idx)):
        v, zn = mrg.mrg_next(tuple(int(Z[r, j]) for r in range(5)))
        assert int(val[j]) == v
        assert tuple(int(Z2[r, j]) for r in range(5)) == zn


def test_initial_edges_connectivity(spark):
    from graph500_bfs_spark.sources.kronecker import initial_edges
    from graph500_bfs_spark.operators.prep import symmetrize
    from graph500_bfs_spark.operators.components import connected_components

    # a scrambled binary tree over 2^6 vertices must be one component
    e = initial_edges(spark, scale=6, kind="binary_tree")
    assert e.count() == 63
    cc = connected_components(symmetrize(e))
    assert cc.select("component").distinct().count() == 1

    ham = initial_edges(spark, scale=5, kind="hamiltonian_cycle")
    assert ham.count() == 32
    deg = symmetrize(ham, dedup=False).groupBy("src").count()
    assert deg.filter("count != 2").count() == 0  # every vertex degree 2


def test_uniform_edges_spark_matches_local(spark):
    from graph500_bfs_spark.sources.kronecker import uniform_edges
    from graph500_bfs_spark.sources.mrg import uniform_edge_batch

    df = uniform_edges(spark, scale=8, edgefactor=4, partitions=4)
    got = sorted((r["src"], r["dst"]) for r in df.collect())
    s, d = uniform_edge_batch(np.arange(4 << 8, dtype=np.int64), 8)
    assert got == sorted(zip(s.tolist(), d.tolist()))


def test_sample_roots_spec_matches_scalar_protocol(spark):
    """The batched Spark-side root sampler replays the reference find_roots
    protocol exactly: same roots, same order, as the scalar local walk."""
    from graph500_bfs_spark.operators.graph500 import sample_roots_spec
    from graph500_bfs_spark.sources.mrg import find_roots_exact, graph500_edge_batch

    scale = 10
    src, dst = graph500_edge_batch(np.arange(16 << scale, dtype=np.int64), scale)
    nl = src != dst
    deg = np.zeros(1 << scale, dtype=np.int64)
    np.add.at(deg, src[nl], 1)
    np.add.at(deg, dst[nl], 1)
    want = find_roots_exact(scale, 8, lambda v: deg[v] > 0)

    deg_df = spark.createDataFrame(
        [(int(v), int(d)) for v, d in enumerate(deg) if d > 0], "v long, deg long"
    )
    got = sample_roots_spec(deg_df, scale, 8)
    assert got == want


def test_root_sampling_exhaustion_raises(spark):
    """ADVICE r2: a near-edgeless graph must fail loudly (protocol
    degeneracy), not return a short root list that callers index."""
    import pytest

    from graph500_bfs_spark.operators.graph500 import sample_roots_spec
    from graph500_bfs_spark.sources.mrg import find_roots_exact

    with pytest.raises(ValueError, match="exhausted"):
        find_roots_exact(4, 10, lambda v: False)

    deg_df = spark.createDataFrame([(0, 0), (1, 0)], "v long, deg long")
    with pytest.raises(ValueError, match="exhausted"):
        sample_roots_spec(deg_df, 4, 10)


def test_derive_edges_hash_modes_isomorphic(spark):
    """The md5 entity mode (gate/oracle path) and the xxhash64 production
    mode must produce the SAME graph up to vertex relabeling: identical
    per-kind edge counts and identical degree multisets."""
    from collections import Counter

    t = synthesize_transcripts(spark, n_convs=40, seed=42).cache()
    a = derive_edges(t, entity_hash="xxhash64").collect()
    b = derive_edges(t, entity_hash="md5").collect()
    assert Counter(r["kind"] for r in a) == Counter(r["kind"] for r in b)

    def deg_multiset(rows):
        c = Counter()
        for r in rows:
            c[r["src"]] += 1
            c[r["dst"]] += 1
        return sorted(c.values())

    assert deg_multiset(a) == deg_multiset(b)


def test_entry_contract_queries_all_oracled():
    """Driver-contract invariant (round 3): every queries() entry has an
    oracle_sql() twin and vice versa — zero rows-only entries."""
    import __spark_entry__ as m

    q, o = set(m.queries()), set(m.oracle_sql())
    assert q == o, (sorted(q - o), sorted(o - q))


def test_weight_batch_bit_exact_and_in_range(spark):
    """Round-5 generateWeight analog: the vectorized weight stream must be
    bit-identical to the scalar MRG path (seed skipped by
    30*2^128 + 46*2^64 + edge_index, one draw, % max_weight + 1 --
    graph_generator.hpp:647-679) and lie in [1, max_weight]."""
    import numpy as np

    from graph500_bfs_spark.sources.mrg import (
        USERSEED1,
        USERSEED2,
        make_mrg_seed,
        mrg_next,
        mrg_skip,
        weight_batch,
    )

    idx = np.array([0, 1, 2, 255, 256, 65535, 65536, 10**6, 10**9], dtype=np.int64)
    got = weight_batch(idx, 255)
    for i, g in zip(idx, got):
        z = mrg_skip(
            make_mrg_seed(USERSEED1, USERSEED2), (30 << 128) + (46 << 64) + int(i)
        )
        v, _ = mrg_next(z)
        assert g == v % 255 + 1
    assert got.min() >= 1 and got.max() <= 255

    # Spark source carries the same weights per edge index order
    from graph500_bfs_spark.sources.kronecker import kronecker_edges_weighted

    df = kronecker_edges_weighted(spark, scale=6, edgefactor=4, max_weight=7)
    ws = np.array([r["w"] for r in df.collect()])
    assert len(ws) == 4 << 6
    assert ws.min() >= 1 and ws.max() <= 7
