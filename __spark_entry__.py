"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator correctness gate vs DuckDB
at sf0.01 (row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from graph500_bfs_spark import gate  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: direction-optimizing BFS levels over the order–part
    bipartite link graph at sf0.001."""
    return gate.q_bfs_levels(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "edges_symmetrize": gate.q_edges_symmetrize,
        "degree_top100": gate.q_degree_top100,
        "bfs_levels": gate.q_bfs_levels,
        # round 4: the high-TEPS shared-state strategy itself (cluster-real
        # ship="spark" + executor-side merge="spark") against the SAME
        # recursive-SQL oracle — strategy equivalence checked by the driver
        "bfs_levels_msbfs": gate.q_bfs_levels_msbfs,
        # round 5: the deterministic min-parent TREE value-hash-checked
        # against an independent SQL oracle (levels alone were before)
        "bfs_parents": gate.q_bfs_parents,
        # round 5: weighted SSSP (frontier Bellman-Ford, integer weights)
        "sssp_dist": gate.q_sssp_dist,
        "connected_components_snr": gate.q_connected_components_snr,
        "pagerank10": gate.q_pagerank10,
        "triangle_count": gate.q_triangle_count,
        "label_propagation_snr": gate.q_label_propagation_snr,
        # training-data pipeline suites
        "doc_stats": gate.q_doc_stats,
        "exact_dup_groups": gate.q_exact_dup_groups,
        # round 5: the full corpus-prep composition (dedup survivor +
        # language gate + quality gate) as one oracled pipeline
        "corpus_prep": gate.q_corpus_prep,
        "token_budget_sample": gate.q_token_budget_sample,
        "ngram_jaccard": gate.q_ngram_jaccard,
        "minhash_signatures": gate.q_minhash_signatures,
        "simhash_signatures": gate.q_simhash_signatures,
        "simhash_pairs": gate.q_simhash_pairs,
        "cosine_topk": gate.q_cosine_topk,
        "events_hourly": gate.q_events_hourly,
        "sessionize": gate.q_sessionize,
        # round 3: every entry below (and above) is oracled — zero rows-only
        "minhash_lsh_pairs": gate.q_minhash_lsh_pairs,
        "lsh_topk": gate.q_lsh_topk,
        "ivf_topk": gate.q_ivf_topk,
        # round 4: same probe over the corpus PARTITIONED BY CENTROID at
        # rest — only the probed cells are read (partition pruning)
        "ivf_topk_at_rest": gate.q_ivf_topk_at_rest,
        "kmeans_ivf_topk": gate.q_kmeans_ivf_topk,
        # round 5: trained centroids + at-rest partitioned layout composed
        # (training, layout, partition pruning, rerank in one hash check)
        "kmeans_ivf_topk_at_rest": gate.q_kmeans_ivf_topk_at_rest,
        "embedding_near_dup": gate.q_embedding_near_dup,
        "transcript_edges": gate.q_transcript_edges,
        "kronecker_degree_hist": gate.q_kronecker_degree_hist,
        # round 3 additions: near-dup clustering (LSH pairs → connected
        # components) and analytics over the transcript entity graph itself
        "dedup_groups_lsh": gate.q_dedup_groups_lsh,
        "transcript_pagerank": gate.q_transcript_pagerank,
        "transcript_cc": gate.q_transcript_cc,
        # round 5: LPA + per-vertex triangles on the same transcript entity
        # graph — the north rule's four analytics now all run (and oracle-
        # check) on the north rule's own graph, not just the TPC-H ones
        "transcript_lpa": gate.q_transcript_lpa,
        "transcript_triangles": gate.q_transcript_triangles,
    }


def oracle_sql() -> dict[str, str]:
    return dict(gate.ORACLES)
