"""Vectorized Kronecker (R-MAT) graph generator — SURVEY §2.1 S1–S4, S6.

Two generation paths, both deterministic functions edge_index →
(scramble(u), scramble(v)) with initiator A=0.57, B=C=0.19, D=0.05
(instantiation /root/reference/mpi/benchmark_helper.hpp:237) and
clip-and-flip symmetry:

* ``exact=True`` (default): the BIT-EXACT Graph500 stream via the
  splittable-MRG skip-ahead + exact scramble in ``sources/mrg.py``
  (/root/reference/generator/splittable_mrg.c,
  graph_generator.hpp:781-892) — verified by pf_nedge[scale] checksums.
* ``exact=False``: a faster stateless variant — splitmix64 avalanche hash
  of (edge_index, level, seeds) mapped to [0,1), plus a bijective scramble
  of the same construction family (odd multiply / bitreverse / xor-shift).
  Same R-MAT family and skew, NOT the spec graph.

Either way the per-edge skip-ahead property makes generation
embarrassingly parallel: ``spark.range(m)`` → ``mapInArrow`` NumPy kernel
— no shuffle, no Python-per-row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

# Graph500 defaults (/root/reference/mpi/parameters.h:93, 204-205)
EDGEFACTOR = 16
USERSEED1 = 2
USERSEED2 = 3
A, B, C = 0.57, 0.19, 0.19  # D = 1 - A - B - C = 0.05


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — 64-bit avalanche bijection (public constant set)."""
    with np.errstate(over="ignore"):  # intended mod-2^64 wraparound
        x = x.copy()
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def _uniform(edge_idx: np.ndarray, level: int, seed1: int, seed2: int) -> np.ndarray:
    with np.errstate(over="ignore"):  # intended mod-2^64 wraparound
        h = _mix64(
            edge_idx.astype(np.uint64)
            + np.uint64((0x9E3779B97F4A7C15 * (level + 1)) & 0xFFFFFFFFFFFFFFFF)
            + np.uint64((seed1 * 0x2545F4914F6CDD1D + seed2 * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF)
        )
    return h.astype(np.float64) * (1.0 / 2**64)


def _bitreverse_bits(x: np.ndarray, nbits: int) -> np.ndarray:
    """Reverse the low ``nbits`` bits (cf. reference bitreverse,
    graph_generator.hpp:569-620)."""
    x = x.astype(np.uint64)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    x = ((x >> np.uint64(1)) & m1) | ((x & m1) << np.uint64(1))
    x = ((x >> np.uint64(2)) & m2) | ((x & m2) << np.uint64(2))
    x = ((x >> np.uint64(4)) & m4) | ((x & m4) << np.uint64(4))
    x = x.byteswap()
    return x >> np.uint64(64 - nbits)


def scramble(v: np.ndarray, scale: int, seed1: int = USERSEED1, seed2: int = USERSEED2) -> np.ndarray:
    """Bijective pseudo-random relabeling of [0, 2^scale)."""
    mask = np.uint64((1 << scale) - 1)
    k1 = np.uint64(((0x9E3779B97F4A7C15 * (seed1 * 2 + 1)) | 1) & 0xFFFFFFFFFFFFFFFF)
    k2 = np.uint64(((0xC2B2AE3D27D4EB4F * (seed2 * 2 + 1)) | 1) & 0xFFFFFFFFFFFFFFFF)
    c1 = np.uint64(_mix64(np.array([seed1 + 0x51_7C_C1B7], dtype=np.uint64))[0])
    c2 = np.uint64(_mix64(np.array([seed2 + 0x2754_0BE4], dtype=np.uint64))[0])
    x = v.astype(np.uint64) & mask
    x = (x * k1 + c1) & mask
    x = _bitreverse_bits(x, scale)
    x = (x * k2 + c2) & mask
    x ^= x >> np.uint64(max(1, scale // 2))
    return (x & mask).astype(np.int64)


def rmat_edges_numpy(
    edge_idx: np.ndarray,
    scale: int,
    seed1: int = USERSEED1,
    seed2: int = USERSEED2,
    do_scramble: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized 4-way Bernoulli recursion with clip-and-flip
    (cf. generate_4way_bernoulli / make_one_edge,
    graph_generator.hpp:835-891)."""
    n = len(edge_idx)
    src = np.zeros(n, dtype=np.uint64)
    dst = np.zeros(n, dtype=np.uint64)
    for lvl in range(scale):
        r = _uniform(edge_idx, lvl, seed1, seed2)
        # quadrants: [0,A)→(0,0)  [A,A+B)→(0,1)  [A+B,A+B+C)→(1,0)  rest→(1,1)
        src_bit = (r >= A + B).astype(np.uint64)
        dst_bit = ((r >= A) & (r < A + B)).astype(np.uint64) | (r >= A + B + C).astype(np.uint64)
        src = (src << np.uint64(1)) | src_bit
        dst = (dst << np.uint64(1)) | dst_bit
    # clip-and-flip: canonicalize so the adjacency matrix is symmetric in
    # distribution (reference flips u>v halves, graph_generator.hpp:885-889)
    flip = _uniform(edge_idx, scale + 1, seed1, seed2) < 0.5
    s = np.where(flip, dst, src)
    d = np.where(flip, src, dst)
    if do_scramble:
        return scramble(s, scale, seed1, seed2), scramble(d, scale, seed1, seed2)
    return s.astype(np.int64), d.astype(np.int64)


def kronecker_edges(
    spark: SparkSession,
    scale: int,
    edgefactor: int = EDGEFACTOR,
    seed1: int = USERSEED1,
    seed2: int = USERSEED2,
    partitions: int | None = None,
    exact: bool = True,
) -> DataFrame:
    """Distributed deterministic R-MAT edge table edges(src, dst).

    One range scan → one Arrow-batched map; zero shuffles.  At scale 43 /
    edgefactor 16 this is ~140T rows — the range source splits evenly and
    every partition generates independently (the reference's round-robin
    chunk loop, /root/reference/mpi/benchmark_helper.hpp:152-241).

    ``exact=True`` (default) produces the BIT-EXACT Graph500 edge stream —
    the same (scramble(u), scramble(v)) per edge index as the reference's
    RmatGraphGenerator<…,5700,1900> (graph_generator.hpp:781-892), via the
    splittable-MRG skip-ahead in sources/mrg.py; verified end-to-end by
    reproducing pf_nedge[scale] traversed-edge checksums
    (/root/reference/mpi/utils.hpp:3687-3733) in tests/test_sources.py.
    ``exact=False`` keeps the faster stateless splitmix64 variant (same
    R-MAT family, not the spec graph).
    """
    m = edgefactor << scale
    parts = partitions or max(spark.sparkContext.defaultParallelism * 2, 8)
    out_schema = pa.schema([pa.field("src", pa.int64()), pa.field("dst", pa.int64())])

    if exact:
        from graph500_bfs_spark.sources.mrg import graph500_edge_batch

        def gen(batches):
            for batch in batches:
                idx = batch.column(0).to_numpy(zero_copy_only=False)
                s, d = graph500_edge_batch(idx, scale, seed1, seed2)
                yield pa.RecordBatch.from_arrays(
                    [pa.array(s, pa.int64()), pa.array(d, pa.int64())], schema=out_schema
                )

    else:

        def gen(batches):
            for batch in batches:
                idx = batch.column(0).to_numpy(zero_copy_only=False)
                s, d = rmat_edges_numpy(idx, scale, seed1, seed2)
                yield pa.RecordBatch.from_arrays(
                    [pa.array(s, pa.int64()), pa.array(d, pa.int64())], schema=out_schema
                )

    df = spark.range(0, m, numPartitions=parts).mapInArrow(gen, "src long, dst long")
    return df


def initial_edges(
    spark: SparkSession,
    scale: int,
    kind: str = "binary_tree",
    seed1: int = USERSEED1,
    seed2: int = USERSEED2,
) -> DataFrame:
    """S4 — optional connectivity-guaranteeing seed edges (spec2012 path,
    cf. generateInitialEdge /root/reference/generator/graph_generator.hpp:685-716):
    binary-tree or Hamiltonian-cycle edges over [0, 2^scale), relabeled with
    the EXACT reference scramble (sources/mrg.py)."""
    from graph500_bfs_spark.sources.mrg import scramble_exact, scramble_vals

    n = 1 << scale
    val0, val1 = scramble_vals(seed1, seed2)
    out_schema = pa.schema([pa.field("src", pa.int64()), pa.field("dst", pa.int64())])

    def gen(batches):
        for batch in batches:
            i = batch.column(0).to_numpy(zero_copy_only=False).astype(np.uint64)
            if kind == "binary_tree":
                a, b = i + np.uint64(1), (i + np.uint64(1)) >> np.uint64(1)
            elif kind == "hamiltonian_cycle":
                a, b = i, (i + np.uint64(1)) % np.uint64(n)
            else:
                raise ValueError(kind)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(scramble_exact(a, scale, val0, val1), pa.int64()),
                    pa.array(scramble_exact(b, scale, val0, val1), pa.int64()),
                ],
                schema=out_schema,
            )

    m = n - 1 if kind == "binary_tree" else n
    return spark.range(0, m).mapInArrow(gen, "src long, dst long")


def uniform_edges(
    spark: SparkSession,
    scale: int,
    edgefactor: int = EDGEFACTOR,
    seed1: int = USERSEED1,
    seed2: int = USERSEED2,
    partitions: int | None = None,
) -> DataFrame:
    """S6 — uniform random edge table (the reference's RandomGraphGenerator,
    graph_generator.hpp:744-779; test-only, unused by the benchmark)."""
    from graph500_bfs_spark.sources.mrg import uniform_edge_batch

    m = edgefactor << scale
    parts = partitions or max(spark.sparkContext.defaultParallelism * 2, 8)
    out_schema = pa.schema([pa.field("src", pa.int64()), pa.field("dst", pa.int64())])

    def gen(batches):
        for batch in batches:
            idx = batch.column(0).to_numpy(zero_copy_only=False)
            s, d = uniform_edge_batch(idx, scale, seed1, seed2)
            yield pa.RecordBatch.from_arrays(
                [pa.array(s, pa.int64()), pa.array(d, pa.int64())], schema=out_schema
            )

    return spark.range(0, m, numPartitions=parts).mapInArrow(gen, "src long, dst long")


def kronecker_edges_weighted(
    spark: SparkSession,
    scale: int,
    edgefactor: int = EDGEFACTOR,
    max_weight: int = 255,
    seed1: int = USERSEED1,
    seed2: int = USERSEED2,
    partitions: int | None = None,
) -> DataFrame:
    """edges(src, dst, w) — the bit-exact Graph500 edge stream plus the
    reference's per-edge weight stream (generateWeight,
    /root/reference/generator/graph_generator.hpp:647-679: MRG skipped by
    30·2^128 + 46·2^64 + edge_index, one uint draw, % max_weight + 1).

    Same zero-shuffle shape as :func:`kronecker_edges`: one range scan,
    both streams generated per partition from the same O(1) skip-ahead —
    weight i never needs edge i-1.  Consumer: operators/sssp.py (the
    reference generates weights but never consumes them — its SSSP is an
    empty stub, /root/reference/mpi/bfs.hpp:3129-3131).
    """
    from graph500_bfs_spark.sources.mrg import graph500_edge_batch, weight_batch

    m = edgefactor << scale
    parts = partitions or max(spark.sparkContext.defaultParallelism * 2, 8)
    out_schema = pa.schema(
        [pa.field("src", pa.int64()), pa.field("dst", pa.int64()), pa.field("w", pa.int64())]
    )

    def gen(batches):
        for batch in batches:
            idx = batch.column(0).to_numpy(zero_copy_only=False)
            s, d = graph500_edge_batch(idx, scale, seed1, seed2)
            w = weight_batch(idx, max_weight, seed1, seed2)
            yield pa.RecordBatch.from_arrays(
                [pa.array(s, pa.int64()), pa.array(d, pa.int64()), pa.array(w, pa.int64())],
                schema=out_schema,
            )

    return spark.range(0, m, numPartitions=parts).mapInArrow(gen, "src long, dst long, w long")
