"""Graph500 BFS validation suite V1–V5 as DataFrame assertions (SURVEY §2.5).

The reference's ``validate_bfs_result``
(/root/reference/mpi/validate.hpp:607-976) is property-based: it accepts any
valid BFS tree (parents are race-nondeterministic there), checking only tree
structure and level consistency.  Each check collapses into one or two joins:

* V1 value ranges            (validate.hpp:995-1016)
* V2 root self-parent only   (validate.hpp:632-682)
* V3 depth/parent consistency(validate.hpp:1040-1255)
* V4 edge level delta ≤ 1 and no in-tree↔out-of-tree edge (validate.hpp:697-872)
* V5 tree edges exist in the graph, parent depth delta exactly 1
  (validate.hpp:873-965, 1018-1035)

``result`` schema: (v long, parent long, level int) with parent=-1/level=-1
for unreached vertices — the *complete* form over the vertex domain.
``edges_sym`` must be the symmetrized, self-loop-free edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_bfs(
    result: DataFrame, edges_sym: DataFrame, root: int, n_vertices: int | None = None
) -> dict[str, int]:
    """Run all five checks; returns {check: violation_count} (all 0 = pass).

    ``n_vertices``: for dense-id graphs (Kronecker), V1 is the reference's
    range check.  For hashed-entity graphs (transcripts) pass None — V1
    becomes a domain-membership check (parent ∈ vertex set ∪ {-1}), the
    semantically equivalent generalization.
    """
    r = result.cache()
    out: dict[str, int] = {}

    # V1 — every parent in [-1, n) / in the vertex domain; root at level 0
    if n_vertices is not None:
        out["v1_range"] = r.filter(
            (F.col("parent") < -1) | (F.col("parent") >= n_vertices)
        ).count()
    else:
        dom = edges_sym.select(F.col("src").alias("dv")).distinct()
        out["v1_range"] = (
            r.filter(F.col("parent") != -1)
            .join(dom, F.col("parent") == F.col("dv"), "left_anti")
            .count()
        )
    root_row = r.filter(F.col("v") == root).collect()
    out["v1_root"] = 0 if (len(root_row) == 1 and root_row[0]["level"] == 0) else 1

    # V2 — root is its own parent; nobody else is
    out["v2_root_self"] = r.filter(
        (F.col("v") == root) & (F.col("parent") != root)
    ).count()
    out["v2_other_self"] = r.filter(
        (F.col("v") != root) & (F.col("parent") == F.col("v"))
    ).count()

    # V3 — level[v] == level[parent[v]] + 1 for non-root reached vertices;
    #      reached ⇔ parent != -1
    out["v3_reach_iff_parent"] = r.filter(
        ((F.col("level") >= 0) & (F.col("parent") == -1))
        | ((F.col("level") < 0) & (F.col("parent") != -1))
    ).count()
    pr = r.select(F.col("v").alias("pv"), F.col("level").alias("plevel"))
    out["v3_depth"] = (
        r.filter((F.col("v") != root) & (F.col("parent") != -1))
        .join(pr, F.col("parent") == F.col("pv"), "left")
        .filter(
            F.col("plevel").isNull() | (F.col("level") != F.col("plevel") + 1)
        )
        .count()
    )

    # V4 — graph edges span ≤1 level and never link reached to unreached
    lv = r.select(F.col("v").alias("lv_v"), F.col("level").alias("lv"))
    e2 = (
        edges_sym.join(lv, edges_sym["src"] == F.col("lv_v"))
        .drop("lv_v")
        .withColumnRenamed("lv", "l_src")
        .join(
            lv.withColumnRenamed("lv", "l_dst").withColumnRenamed("lv_v", "lv_v2"),
            edges_sym["dst"] == F.col("lv_v2"),
        )
        .drop("lv_v2")
    )
    out["v4_level_delta"] = e2.filter(
        (F.col("l_src") >= 0)
        & (F.col("l_dst") >= 0)
        & (F.abs(F.col("l_src") - F.col("l_dst")) > 1)
    ).count()
    out["v4_reach_boundary"] = e2.filter(
        (F.col("l_src") >= 0) != (F.col("l_dst") >= 0)
    ).count()

    # V5 — every claimed (parent, v) tree edge exists in the graph
    out["v5_tree_edge_exists"] = (
        r.filter((F.col("parent") != -1) & (F.col("v") != root))
        .join(
            edges_sym,
            (r["parent"] == edges_sym["src"]) & (r["v"] == edges_sym["dst"]),
            "left_anti",
        )
        .count()
    )
    r.unpersist()
    return out


def assert_valid_bfs(
    result: DataFrame, edges_sym: DataFrame, root: int, n_vertices: int | None = None
) -> None:
    checks = validate_bfs(result, edges_sym, root, n_vertices)
    bad = {k: v for k, v in checks.items() if v != 0}
    assert not bad, f"Graph500 validation failed: {bad}"


def count_traversed_edges(result: DataFrame, edges_sym: DataFrame) -> int:
    """V6 — edges with both endpoints reached (TEPS numerator), undirected count
    (/root/reference/mpi/validate.hpp:870-871, 967-969)."""
    reached = result.filter(F.col("level") >= 0).select("v")
    n = (
        edges_sym.join(reached, edges_sym["src"] == reached["v"], "left_semi").count()
    )
    return n // 2


def validate_sssp(dist: DataFrame, edges_w: DataFrame, root: int) -> dict[str, int]:
    """Correctness certificate for weighted SSSP, in the V1-V5 property style
    (the reference validates only unweighted BFS, validate.hpp:607-976; its
    SSSP is an empty stub — this supplies the weighted analog).

    For positive integer weights, W1-W5 jointly PROVE ``dist`` is the exact
    shortest-distance table, not merely plausible:

    * W1 dist(root)=0 and root is the unique zero (w >= 1 forbids others);
    * W2 no negative distance;
    * W3 fixpoint — no relaxable edge among reached vertices
      (dist(dst) <= dist(src)+w), which telescopes to dist <= true distance;
    * W4 witness — every non-root reached vertex has a TIGHT in-edge
      (dist(dst) == dist(src)+w); with W1/W2 positivity, tight predecessors
      strictly decrease dist and must terminate at the root, so
      dist >= true distance;
    * W5 closure — no edge leaves the reached set (else its head would be
      reachable and absent).

    ``dist`` schema: (v, dist) with unreachable vertices absent (the sssp()
    output form).  ``edges_w``: directed (src, dst, w) rows, symmetrized for
    undirected semantics — the same table handed to sssp().
    Each check is one DataFrame action over vertex-keyed joins; nothing here
    collects more than the root row, so the certificate runs at data scale.
    """
    d = dist.cache()
    e = edges_w.select("src", "dst", F.col("w").cast("long").alias("w"))
    du = d.select(F.col("v").alias("u"), F.col("dist").alias("du"))
    dv = d.select(F.col("v").alias("vv"), F.col("dist").alias("dv"))
    out: dict[str, int] = {}

    root_rows = d.filter(F.col("v") == root).collect()
    out["w1_root_zero"] = (
        0 if (len(root_rows) == 1 and root_rows[0]["dist"] == 0) else 1
    )
    out["w1_zero_unique"] = d.filter(
        (F.col("dist") == 0) & (F.col("v") != root)
    ).count()
    out["w2_nonneg"] = d.filter(F.col("dist") < 0).count()

    # edges with a reached tail, annotated with both endpoint distances
    j = (
        e.join(du, e["src"] == du["u"])
        .join(dv, e["dst"] == dv["vv"], "left")
        .select("src", "dst", "w", "du", "dv")
        .cache()
    )
    out["w3_fixpoint"] = j.filter(
        F.col("dv").isNotNull() & (F.col("dv") > F.col("du") + F.col("w"))
    ).count()
    out["w5_closure"] = j.filter(F.col("dv").isNull()).count()
    tight_heads = (
        j.filter(F.col("dv") == F.col("du") + F.col("w"))
        .select(F.col("dst").alias("tv"))
        .distinct()
    )
    out["w4_witness"] = (
        d.filter(F.col("v") != root)
        .join(tight_heads, F.col("v") == F.col("tv"), "left_anti")
        .count()
    )
    j.unpersist()
    d.unpersist()
    return out


def assert_valid_sssp(dist: DataFrame, edges_w: DataFrame, root: int) -> None:
    checks = validate_sssp(dist, edges_w, root)
    bad = {k: v for k, v in checks.items() if v != 0}
    assert not bad, f"SSSP validation failed: {bad}"
