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


# ------------------------------------------------------- text / dedup gate

def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-analysis suite: tokens, stopwords, quality, lang guess, fingerprint."""
    from graph500_bfs_spark.operators.textstats import document_stats

    return document_stats(_read(spark, sf_dir, "documents"))


def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph500_bfs_spark.operators.dedup import exact_dup_groups

    return exact_dup_groups(_read(spark, sf_dir, "documents"))


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-gram Jaccard near-dup pairs (threshold 0.05) via inverted index."""
    from graph500_bfs_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _read(spark, sf_dir, "documents"), n=2, threshold=0.05, max_shingle_freq=10**9
    )


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph500_bfs_spark.operators.dedup import minhash_signatures

    return minhash_signatures(_read(spark, sf_dir, "documents"), k=8, n=2)


def q_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph500_bfs_spark.operators.dedup import simhash_signatures

    return simhash_signatures(_read(spark, sf_dir, "documents"), bits=32)


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph500_bfs_spark.operators.similarity import cosine_topk

    return cosine_topk(_read(spark, sf_dir, "embeddings"), k=5, n_queries=10)


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event rollup — the batch twin of the streaming windowed agg."""
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value") * 1000).cast("long").alias("value_milli"),
    )


# rows-only entries (no SQL-expressible oracle)

def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph500_bfs_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_read(spark, sf_dir, "documents"), k=8, bands=4, n=2,
                             verify_threshold=0.05)


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph500_bfs_spark.operators.similarity import lsh_topk

    return lsh_topk(_read(spark, sf_dir, "embeddings"), k=5, n_queries=10,
                    n_tables=16, n_planes=4)


def q_transcript_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcript→edge derivation (S9): deterministic synthesized corpus."""
    from graph500_bfs_spark.sources.edges import derive_edges
    from graph500_bfs_spark.sources.transcripts import synthesize_transcripts

    t = synthesize_transcripts(spark, n_convs=500, seed=42)
    return derive_edges(t)


def q_kronecker_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kronecker generator S1–S3: degree histogram of a scale-12 R-MAT."""
    from graph500_bfs_spark.operators.prep import out_degrees, symmetrize
    from graph500_bfs_spark.sources.kronecker import kronecker_edges

    e = kronecker_edges(spark, scale=12, edgefactor=16)
    deg = out_degrees(symmetrize(e, dedup=False))
    return deg.groupBy("deg").agg(F.count("*").alias("n_vertices"))


# -------------------------------------------- text/dedup/similarity oracles

_TOKS = "regexp_split_to_array(trim(text), '\\s+')"
_STOPLIST = "['the','a','of','and','to','in','is','it']"
_H15 = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"

_SHINGLES2 = f"""
docs_l AS (SELECT doc_id, {_TOKS} AS l FROM documents),
shin AS (
  SELECT doc_id, unnest(list_distinct(
           list_transform(range(1, greatest(len(l), 1)),
                          i -> array_to_string(l[i:i+1], ' ')))) AS shingle
  FROM docs_l WHERE len(l) >= 2)
"""


def _minhash_sql(k: int = 8) -> str:
    hs = ",\n       ".join(
        "MIN(" + _H15.format(expr=f"'{i}:' || shingle") + f") AS h{i}" for i in range(k)
    )
    return f"WITH {_SHINGLES2} SELECT doc_id,\n       {hs}\nFROM shin GROUP BY doc_id"


def _simhash_sql(bits: int = 32) -> str:
    sums = ",\n       ".join(
        f"SUM(((h >> {j}) & 1) * 2 - 1) AS s{j}" for j in range(bits)
    )
    val = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)" for j in range(bits)
    )
    h15 = _H15.format(expr="tok")
    return f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
hs AS (SELECT doc_id, {h15} AS h FROM toks),
s AS (SELECT doc_id,
       {sums}
      FROM hs GROUP BY doc_id)
SELECT doc_id, {val} AS simhash FROM s"""


ORACLES.update(
    {
        "doc_stats": f"""
WITH base AS (
  SELECT doc_id,
         CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
         CAST(len(list_filter({_TOKS}, x -> list_contains({_STOPLIST}, x))) AS INTEGER)
           AS n_stopwords,
         n_chars, text
  FROM documents)
SELECT doc_id, n_tokens, n_stopwords,
       CAST(ROUND((LEAST(n_tokens / 100.0, 1.0) * 0.4
           + (1.0 - LEAST(n_stopwords / GREATEST(n_tokens, 1.0) * 2.0, 1.0)) * 0.3
           + LEAST((n_chars / GREATEST(n_tokens, 1.0)) / 8.0, 1.0) * 0.3) * 1e6) AS BIGINT)
         AS quality_ppm,
       CASE WHEN n_stopwords / GREATEST(n_tokens, 1.0) >= 0.05 THEN 'en' ELSE 'unk' END
         AS lang_guess,
       {_H15.format(expr='lower(trim(text))')} AS fingerprint
FROM base""",
        "exact_dup_groups": """
WITH fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
grp AS (SELECT fp, MIN(doc_id) AS canonical_id, COUNT(*) AS group_size FROM fp GROUP BY fp)
SELECT doc_id, canonical_id, group_size FROM fp JOIN grp USING (fp)""",
        "ngram_jaccard": f"""
WITH {_SHINGLES2},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shin GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM shin a JOIN shin b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(ROUND(1e9 * inter / (sa.sz + sb.sz - inter)) AS BIGINT) AS jaccard_ppb
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(1e9 * inter / (sa.sz + sb.sz - inter)) >= 0.05e9""",
        "minhash_signatures": _minhash_sql(8),
        "simhash_signatures": _simhash_sql(32),
        "cosine_topk": """
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, list_cosine_similarity(q.qv, e.v) AS cos
  FROM q, emb e WHERE e.vec_id != q.query_id)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
WHERE rank <= 5""",
        "events_hourly": """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n_events,
       CAST(ROUND(SUM(value) * 1000) AS BIGINT) AS value_milli
FROM events GROUP BY 1, 2""",
    }
)


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming sessionization operator (30-min gap)."""
    from graph500_bfs_spark.streaming.events import sessionize_batch

    s = sessionize_batch(_read(spark, sf_dir, "events"))
    return s.select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        F.round(F.col("total_value") * 1000).cast("long").alias("value_milli"),
    )


ORACLES["sessionize"] = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER w > 1800 THEN 1
              WHEN LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(value) * 1000) AS BIGINT) AS value_milli
FROM sess GROUP BY user_id, sess_id
"""


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph500_bfs_spark.operators.similarity import ivf_topk

    return ivf_topk(_read(spark, sf_dir, "embeddings"), k=5, n_queries=10)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph500_bfs_spark.operators.similarity import embedding_near_dup_pairs

    return embedding_near_dup_pairs(_read(spark, sf_dir, "embeddings"), threshold=0.9)
