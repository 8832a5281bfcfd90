"""graph500_bfs_spark — a PySpark-native link-graph analytics engine.

A from-scratch reimplementation of the *workloads* of RIKEN-RCCS/Graph500-BFS
(direction-optimizing level-synchronous BFS, Graph500 five-check validation,
Kronecker R-MAT generation, TEPS statistics) plus the link-graph analytics the
north rule adds (PageRank, connected components, label propagation, triangle
counting) over an edge table derived from multi-turn conversation transcripts.

Everything is expressed Spark-first: DataFrame/SQL plans optimized by Catalyst,
with vectorized Arrow/pandas UDFs only where per-partition array kernels
(CSR adjacency scans, R-MAT recursion) genuinely beat relational operators.
No per-row Python anywhere in a hot path.
"""

__version__ = "0.1.0"

from graph500_bfs_spark.session import get_spark  # noqa: F401
