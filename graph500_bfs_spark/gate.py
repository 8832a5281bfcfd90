"""Correctness-gate query builders over the driver's TPC-H-ish testdata.

The driver compares each ``queries()`` entry against ``oracle_sql()`` run by
DuckDB on the same parquet (CORRECTNESS_r{N}.json).  Graph inputs are
derived *arithmetically* from relational tables so both engines construct
the identical graph with no hash-function coupling:

* **bipartite order–part graph**: src = l_orderkey,
  dst = 3_000_000_000 + l_partkey (disjoint id ranges);
* **supplier–nation–region graph**: small (|V| ≈ 130 at sf0.01) so the
  DuckDB transitive-closure oracle for connected components stays cheap;
* **part co-occurrence graph**: parts sharing an order (triangle workload).

Float-valued results (PageRank scores, similarities) are emitted as
integers (×1e9, rounded) in BOTH engines so the driver's value-hash is
immune to float formatting; 1e-15-relative summation differences cannot
flip a 1e-9 rounding except within ~1e-6 of a boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PART_OFFSET = 3_000_000_000
SUPP_OFFSET = 1_000
NATION_OFFSET = 2_000
REGION_OFFSET = 3_000


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def lineitem_bipartite_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("long").alias("src"),
        (F.lit(PART_OFFSET) + F.col("l_partkey")).cast("long").alias("dst"),
    )


def snr_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier—nation—region chain graph (directed as derived)."""
    s = _read(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") + SUPP_OFFSET).cast("long").alias("src"),
        (F.col("s_nationkey") + NATION_OFFSET).cast("long").alias("dst"),
    )
    n = _read(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") + NATION_OFFSET).cast("long").alias("src"),
        (F.col("n_regionkey") + REGION_OFFSET).cast("long").alias("dst"),
    )
    return s.unionByName(n)


def part_cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (src < dst) part pairs sharing an order."""
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").cast("long").alias("src"),
            F.col("b.l_partkey").cast("long").alias("dst"),
        )
        .distinct()
    )


# ---------------------------------------------------------------- queries

def q_edges_symmetrize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2+P3: self-loop-free symmetrized distinct edge table."""
    from graph500_bfs_spark.operators.prep import symmetrize

    return symmetrize(lineitem_bipartite_edges(spark, sf_dir))


def q_degree_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5+P6: degree table, top 100 hubs by (deg desc, v) — deterministic."""
    from graph500_bfs_spark.operators.prep import out_degrees, symmetrize

    deg = out_degrees(symmetrize(lineitem_bipartite_edges(spark, sf_dir)))
    return deg.orderBy(F.desc("deg"), F.asc("v")).limit(100)


def q_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1–B9: direction-optimizing BFS levels from min(l_orderkey)."""
    from graph500_bfs_spark.operators.bfs import bfs
    from graph500_bfs_spark.operators.prep import symmetrize

    e0 = lineitem_bipartite_edges(spark, sf_dir)
    es = symmetrize(e0).cache()
    root = e0.agg(F.min("src")).collect()[0][0]
    state, _ = bfs(es, int(root))
    return state.select("v", "level")


def q_connected_components_snr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph500_bfs_spark.operators.components import connected_components
    from graph500_bfs_spark.operators.prep import symmetrize

    es = symmetrize(snr_edges(spark, sf_dir))
    return connected_components(es)


def q_pagerank10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10 fixed power iterations on the symmetrized bipartite graph;
    scores ×1e9 as bigint for hash-stable comparison."""
    from graph500_bfs_spark.operators.pagerank import pagerank
    from graph500_bfs_spark.operators.prep import symmetrize

    es = symmetrize(lineitem_bipartite_edges(spark, sf_dir))
    pr = pagerank(es, damping=0.85, max_iter=10, tol=None)
    return pr.select("v", F.round(F.col("score") * 1e9).cast("long").alias("score_ppb"))


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph500_bfs_spark.operators.prep import symmetrize
    from graph500_bfs_spark.operators.triangles import triangle_count

    es = symmetrize(part_cooccurrence_edges(spark, sf_dir))
    n = triangle_count(es)
    return spark.createDataFrame([(n,)], "n_triangles long")


def q_label_propagation_snr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2 synchronous LPA rounds (min-tie-break) on the s-n-r graph.

    Fixed round count so the DuckDB oracle can unroll the same two rounds.
    """
    from graph500_bfs_spark.operators.label_propagation import label_propagation
    from graph500_bfs_spark.operators.prep import symmetrize

    es = symmetrize(snr_edges(spark, sf_dir))
    return label_propagation(es, max_iter=2)


# ---------------------------------------------------------------- oracles

_EDGES_BI = """
edges0 AS (SELECT l_orderkey AS src, 3000000000 + l_partkey AS dst FROM lineitem),
edges AS (SELECT DISTINCT src, dst
          FROM (SELECT src, dst FROM edges0 UNION ALL SELECT dst, src FROM edges0))
"""

_EDGES_SNR = """
edges0 AS (
  SELECT s_suppkey + 1000 AS src, 2000 + s_nationkey AS dst FROM supplier
  UNION ALL
  SELECT 2000 + n_nationkey AS src, 3000 + n_regionkey AS dst FROM nation
),
edges AS (SELECT src, dst FROM edges0 UNION SELECT dst, src FROM edges0)
"""


def _pagerank_unrolled_sql(n_iter: int = 10) -> str:
    parts = [
        "WITH " + _EDGES_BI + """,
verts AS (SELECT DISTINCT src AS v FROM edges),
nn AS (SELECT COUNT(*)::DOUBLE AS n FROM verts),
outdeg AS (SELECT src AS v, COUNT(*)::DOUBLE AS outdeg FROM edges GROUP BY src),
pr0 AS (SELECT v, 1.0/(SELECT n FROM nn) AS score FROM verts)"""
    ]
    prev = "pr0"
    for i in range(1, n_iter + 1):
        parts.append(
            f""",
pr{i} AS (
  SELECT verts.v,
         0.15/(SELECT n FROM nn) + 0.85 * COALESCE(SUM(p.score / o.outdeg), 0) AS score
  FROM verts
  LEFT JOIN edges e ON e.dst = verts.v
  LEFT JOIN {prev} p ON p.v = e.src
  LEFT JOIN outdeg o ON o.v = e.src
  GROUP BY verts.v)"""
        )
        prev = f"pr{i}"
    parts.append(
        f"\nSELECT v, CAST(ROUND(score * 1e9) AS BIGINT) AS score_ppb FROM {prev}"
    )
    return "".join(parts)


ORACLES: dict[str, str] = {
    "edges_symmetrize": "WITH " + _EDGES_BI + " SELECT src, dst FROM edges",
    "degree_top100": (
        "WITH "
        + _EDGES_BI
        + """
SELECT src AS v, COUNT(*) AS deg FROM edges GROUP BY src
ORDER BY deg DESC, v ASC LIMIT 100"""
    ),
    "bfs_levels": (
        "WITH RECURSIVE "
        + _EDGES_BI
        + """,
root AS (SELECT MIN(src) AS r FROM edges0),
bfs(v, level) AS (
  SELECT r, 0 FROM root
  UNION
  SELECT e.dst, b.level + 1 FROM bfs b JOIN edges e ON e.src = b.v WHERE b.level < 64
)
SELECT v, CAST(MIN(level) AS INTEGER) AS level FROM bfs GROUP BY v"""
    ),
    "connected_components_snr": (
        "WITH RECURSIVE "
        + _EDGES_SNR
        + """,
verts AS (SELECT DISTINCT src AS v FROM edges),
reach(v, m) AS (
  SELECT v, v FROM verts
  UNION
  SELECT e.dst, r.m FROM reach r JOIN edges e ON e.src = r.v
)
SELECT v, MIN(m) AS component FROM reach GROUP BY v"""
    ),
    "pagerank10": _pagerank_unrolled_sql(10),
    "triangle_count": """
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT COUNT(*) AS n_triangles FROM pairs e1
JOIN pairs e2 ON e1.dst = e2.src
JOIN pairs e3 ON e3.src = e1.src AND e3.dst = e2.dst
""",
    "label_propagation_snr": (
        "WITH "
        + _EDGES_SNR
        + """,
verts AS (SELECT DISTINCT src AS v FROM edges),
l0 AS (SELECT v, v AS label FROM verts),
c1 AS (SELECT e.dst AS v, l.label, COUNT(*) AS cnt
       FROM edges e JOIN l0 l ON l.v = e.src GROUP BY e.dst, l.label),
l1 AS (SELECT v, MIN(label) FILTER (WHERE cnt = mx) AS label
       FROM (SELECT v, label, cnt, MAX(cnt) OVER (PARTITION BY v) AS mx FROM c1)
       GROUP BY v),
c2 AS (SELECT e.dst AS v, l.label, COUNT(*) AS cnt
       FROM edges e JOIN l1 l ON l.v = e.src GROUP BY e.dst, l.label),
l2 AS (SELECT v, MIN(label) FILTER (WHERE cnt = mx) AS label
       FROM (SELECT v, label, cnt, MAX(cnt) OVER (PARTITION BY v) AS mx FROM c2)
       GROUP BY v)
SELECT v, label FROM l2"""
    ),
}
