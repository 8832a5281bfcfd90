"""Connected components (SURVEY §2.7) + 2-core forest pruning (§2.4 C1).

Two algorithms:

* :func:`connected_components` — HashMin label propagation with **pointer
  doubling** (label ← min over neighbors' labels ∪ own, plus a
  label-of-label shortcut step), converging in O(log d) rounds on most
  graphs rather than O(diameter).  Deterministic: component id = min vertex
  id in the component (matches the SciPy oracle after relabeling).
* :func:`prune_trees` — the reference's CoreBFS 2-core decomposition
  (/root/reference/external/indexed_bfs/bfs/corebfs/decomposition.hpp:350-480):
  iteratively strip degree-1 vertices, recording each leaf's single edge in
  ``tree_parents``; the survivor is the 2-core.  Shared preprocessing that
  shrinks the edge set for BFS/CC on forest-heavy graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from graph500_bfs_spark.operators import _smallgraph
from graph500_bfs_spark.operators._iter import mutable_side, sized_partitions
from graph500_bfs_spark.operators._mem import CheckpointScope

#: changed-label count below which a round attempts the driver tail finish
#: (collect the contracted boundary graph, close it with hash-min in NumPy) —
#: the verdict-#1 fix for the geometrically shrinking pointer-doubling tail
#: whose per-round fixed cost no longer fills the cluster
CC_TAIL_TRIGGER_ROWS = 1_000_000


def connected_components(
    edges_sym: DataFrame,
    max_iter: int = 100,
    checkpointer=None,
    run_id: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """components(v, component) over a symmetrized edge table.

    Each round: gather min neighbor label (one shuffle with map-side min),
    then shortcut via label-of-label join (pointer doubling).  Convergence
    checked with a scalar count of changed labels (driver allreduce).
    Label state checkpoints per round through ``checkpointer`` and resumes
    mid-run; rounds are deterministic so resume is exact.

    Round 6: below the driver graph budget the whole problem is solved on
    the driver (``_smallgraph``); above it, the round loop finishes the
    shrinking tail on the driver once the changed-label counter and the
    contracted boundary graph fit the same budget.  Both paths produce the
    identical fixpoint (component = min vertex id).
    """
    scope = CheckpointScope(edges_sym.sparkSession)
    # static side cached pre-partitioned on the join key (see _iter): each
    # round's gather join then exchanges only the label vector — the edge
    # table is shuffled once here, never again
    spark = edges_sym.sparkSession
    # rule 3 (_iter): shuffle width follows the data for the loop
    m = edges_sym.count()
    if checkpointer is None and not resume and m <= _smallgraph.driver_graph_budget():
        src, dst = _smallgraph.collect_edges(edges_sym)
        verts, comp = _smallgraph.cc_components(src, dst)
        import pandas as pd

        return spark.createDataFrame(
            pd.DataFrame({"v": verts, "component": comp}), "v long, component long"
        )
    _old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(sized_partitions(spark, m, row_bytes=16)),
    )
    try:
        e = edges_sym.select("src", "dst").repartition("src").cache()
        labels = (
            e.select(F.col("src").alias("v"))
            .union(e.select(F.col("dst").alias("v")))
            .distinct()
            .select("v", F.col("v").alias("component"))
            .localCheckpoint(eager=True)
        )
        n = labels.count()
        rnd = 0
        # tail-finish backoff: a failed attempt (boundary over budget) costs
        # two E-sized joins, so require the changed counter to halve before
        # trying again (the boundary only shrinks with it)
        tail_retry_below = CC_TAIL_TRIGGER_ROWS + 1
        if resume and checkpointer is not None and run_id is not None:
            loaded = checkpointer.load_superstep(run_id)
            if loaded is not None:
                saved, rnd = loaded
                labels = saved.select("v", "component").localCheckpoint(eager=True)
        while max_iter > 0:
            max_iter -= 1
            rnd += 1
            nbr_min = (
                e.join(
                    mutable_side(labels.withColumnRenamed("v", "lv"), n),
                    e["src"] == F.col("lv"),
                )
                .groupBy(F.col("dst").alias("v"))
                .agg(F.min("component").alias("nbr"))
            )
            # gather step materialized once (it feeds BOTH sides of the
            # pointer-doubling self-join — without this it would evaluate twice)
            merged = (
                labels.join(
                    mutable_side(nbr_min.withColumnRenamed("v", "nv"), n),
                    labels["v"] == F.col("nv"),
                    "left",
                )
                .select(
                    labels["v"],
                    F.least(F.col("component"), F.coalesce(F.col("nbr"), F.col("component"))).alias(
                        "component"
                    ),
                    labels["component"].alias("old"),
                )
                .localCheckpoint(eager=True)  # action 1
            )
            # pointer doubling: component ← label(component); the change
            # count rides the SAME job via observed metrics (round 6, the
            # bfs.py pattern) — two actions per round total, down from three
            obs = Observation()
            short = (
                merged.alias("a")
                .join(
                    mutable_side(
                        merged.select(
                            F.col("v").alias("bv"), F.col("component").alias("bc")
                        ).alias("b"),
                        n,
                    ),
                    F.col("a.component") == F.col("bv"),
                    "left",
                )
                .select(
                    F.col("a.v").alias("v"),
                    F.least(F.col("a.component"), F.coalesce(F.col("bc"), F.col("a.component"))).alias(
                        "component"
                    ),
                    F.col("a.old").alias("old"),
                )
                .observe(
                    obs, F.sum((F.col("component") != F.col("old")).cast("long")).alias("changed")
                )
                .localCheckpoint(eager=True)  # action 2
            )
            changed = obs.get["changed"]
            labels = short.drop("old")
            if checkpointer is not None:
                checkpointer.save_superstep(
                    run_id or "cc", rnd, labels,
                    {"superstep": rnd, "direction": "cc_round", "frontier_size": 0,
                     "frontier_edges": 0, "elapsed_s": 0.0, "changed": int(changed or 0)},
                )
            if int(changed or 0) == 0:
                break
            # driver tail finish (round 6, verdict #1): once the changed-label
            # counter is small, the remaining rounds shrink geometrically and
            # their per-round fixed cost dominates.  Contract the graph to its
            # label boundary (distinct cross-label super-edges); if that fits
            # the driver budget, close it with hash-min in NumPy and map the
            # final roots back with ONE broadcast join — exact fixpoint.
            if checkpointer is None and int(changed or 0) < tail_retry_below:
                done = _tail_finish(e, labels, n)
                if done is not None:
                    labels = done
                    break
                tail_retry_below = int(changed or 0) // 2 + 1
        e.unpersist()
        return scope.finalize(labels)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", _old_sp)


def _tail_finish(e: DataFrame, labels: DataFrame, n: int) -> DataFrame | None:
    """Collect the label-contracted boundary graph and finish hash-min on the
    driver; None when the boundary exceeds the driver budget (caller keeps
    iterating — the boundary only shrinks)."""
    spark = e.sparkSession
    ls = mutable_side(
        labels.select(F.col("v").alias("sv"), F.col("component").alias("sc")), n
    )
    ld = mutable_side(
        labels.select(F.col("v").alias("dv"), F.col("component").alias("dc")), n
    )
    boundary = (
        e.join(ls, e["src"] == F.col("sv"))
        .join(ld, e["dst"] == F.col("dv"))
        .filter(F.col("sc") != F.col("dc"))
        .select(
            F.least("sc", "dc").alias("src"), F.greatest("sc", "dc").alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    if boundary.count() > _smallgraph.driver_graph_budget():
        return None
    src, dst = _smallgraph.collect_edges(boundary)
    verts, comp = _smallgraph.cc_components(src, dst)
    moved = verts != comp
    import pandas as pd

    mapping = spark.createDataFrame(
        pd.DataFrame({"mc": verts[moved], "fc": comp[moved]}), "mc long, fc long"
    )
    return labels.join(
        F.broadcast(mapping), labels["component"] == F.col("mc"), "left"
    ).select("v", F.coalesce(F.col("fc"), F.col("component")).alias("component"))


def prune_trees(edges_sym: DataFrame, max_iter: int = 32) -> tuple[DataFrame, DataFrame]:
    """CoreBFS C1 — returns (core_edges_sym, tree_parents).

    Loop (≤32 iters like the reference, decomposition.hpp:401): find
    degree-1 vertices, record their single incident edge as tree parent,
    delete those vertices' edges.  All DataFrame ops: a degree aggregate,
    a semi-join, an anti-join per round.
    """
    spark = edges_sym.sparkSession
    edges = edges_sym.localCheckpoint(eager=True)
    tree_parents = spark.createDataFrame([], "v long, parent long")
    for _ in range(max_iter):
        deg = edges.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("deg"))
        leaves = deg.filter(F.col("deg") == 1).select("v")
        if leaves.isEmpty():
            break
        twigs = edges.join(leaves.withColumnRenamed("v", "lv"), edges["src"] == F.col("lv")).select(
            F.col("src").alias("v"), F.col("dst").alias("parent")
        )
        # mutual-leaf tie-break (isolated K2): only the larger id is pruned,
        # the smaller survives as that micro-component's core root
        mutual = twigs.join(
            leaves.withColumnRenamed("v", "plv"), twigs["parent"] == F.col("plv"), "left_semi"
        ).filter(F.col("v") < F.col("parent"))
        twigs = twigs.exceptAll(mutual)
        tree_parents = tree_parents.unionByName(twigs).localCheckpoint(eager=True)
        lv = twigs.select(F.col("v").alias("lv"))
        edges = (
            edges.join(lv, edges["src"] == F.col("lv"), "left_anti")
            .join(lv, edges["dst"] == F.col("lv"), "left_anti")
            .localCheckpoint(eager=True)
        )
    return edges, tree_parents


def tree_levels(tree_parents: DataFrame, base_levels: DataFrame, max_hops: int = 40) -> DataFrame:
    """Exact BFS levels for pruned tree vertices by iterative ascent.

    The reference defers tree depths to validation-time fixpoint
    (level written as 0xffff, /root/reference/mpi/corebfs_adaptor.hpp:285-301);
    we compute them eagerly: repeatedly join unresolved tree vertices to
    resolved ones through ``tree_parents`` (≤ max_hops rounds — forest
    paths are short on R-MAT, cf. corebfs.hpp:125-157 comment).

    Returns (v, parent, level) rows for the tree vertices reachable from
    the base (core) level set.
    """
    resolved = base_levels.select(F.col("v").alias("rv"), F.col("level").alias("rlevel"))
    pending = tree_parents.localCheckpoint(eager=True)
    out = None
    for _ in range(max_hops):
        if pending.isEmpty():
            break
        hit = (
            pending.join(resolved, pending["parent"] == F.col("rv"))
            .select("v", "parent", (F.col("rlevel") + 1).cast("int").alias("level"))
            .localCheckpoint(eager=True)
        )
        if hit.isEmpty():
            break
        out = hit if out is None else out.unionByName(hit)
        pending = pending.join(
            hit.select(F.col("v").alias("hv")), pending["v"] == F.col("hv"), "left_anti"
        ).localCheckpoint(eager=True)
        resolved = hit.select(F.col("v").alias("rv"), F.col("level").alias("rlevel"))
    if out is None:
        spark = tree_parents.sparkSession
        return spark.createDataFrame([], "v long, parent long, level int")
    return out


def reset_unreachable(
    tree_parents: DataFrame, reached: DataFrame, max_hops: int = 40
) -> DataFrame:
    """C4 — EXPLICIT reachability propagation over the pruned forest
    (reference /root/reference/external/indexed_bfs/bfs/corebfs/
    postprocess.hpp:106-154: propagate reachability up the forest, then
    null parents outside the reached component).

    Round 2 relied on the implicit property that unreachable forest
    vertices never splice (tree_levels only resolves vertices whose parent
    chain lands in the reached set); this is the explicit pass: returns the
    FULL forest parent table with ``parent = -1`` for every tree vertex NOT
    reachable from ``reached(v)``.  Forest edges point toward the core and
    chains are ≤ prune-iteration hops, so the fixpoint terminates in
    ≤ max_hops rounds — and short-circuits as soon as a round resolves
    nothing, so a disconnected forest costs O(its own depth), not
    O(max_hops).
    """
    resolved = reached.select(F.col("v").alias("rv"))
    pending = tree_parents.localCheckpoint(eager=True)
    reached_rows = None
    for _ in range(max_hops):
        if pending.isEmpty():
            break
        hit = (
            pending.join(resolved, pending["parent"] == F.col("rv"))
            .select("v", "parent")
            .localCheckpoint(eager=True)
        )
        if hit.isEmpty():
            break  # nothing new resolved — the rest of the forest is unreachable
        reached_rows = hit if reached_rows is None else reached_rows.unionByName(hit)
        pending = pending.join(
            hit.select(F.col("v").alias("hv")), pending["v"] == F.col("hv"), "left_anti"
        ).localCheckpoint(eager=True)
        resolved = hit.select(F.col("v").alias("rv"))
    nulled = pending.select("v", F.lit(-1).cast("long").alias("parent"))
    if reached_rows is None:
        return nulled
    return reached_rows.unionByName(nulled)


def bfs_with_corebfs(
    edges_sym: DataFrame, root: int, dict_ascent_budget: int = 1_000_000, **bfs_kwargs
):
    """CoreBFS pipeline (reference -C mode, §2.4 C1–C4): prune the tree
    forest, BFS only the 2-core, then splice exact tree levels back.

    If the root itself is a tree vertex, ascend its (short) tree path to
    the core (C2, corebfs.hpp:125-157) and seed the core BFS at the
    ascent depth; the walked path is spliced in with exact levels.

    C2 ascent strategy: the path has ≤ prune_trees-iteration hops (≤32), so
    above ``dict_ascent_budget`` tree vertices the ascent runs as per-hop
    DISTRIBUTED point lookups on the cached tree_parents table — no O(|V|)
    driver collect (on R-MAT roughly half the vertices are tree vertices,
    so the dict path would collect tens of millions of rows at scale ≥23).
    Below the budget a driver dict is faster and harmless.
    """
    from graph500_bfs_spark.operators.bfs import bfs

    spark = edges_sym.sparkSession
    core_edges, tree_parents = prune_trees(edges_sym)
    tree_parents = tree_parents.cache()

    # C2: ascend root→core through tree_parents (path length ≤ prune iters)
    path = []  # [(vertex, depth-from-root)]
    cur = int(root)
    depth = 0
    n_tree = tree_parents.count()
    if n_tree < dict_ascent_budget:
        tp = {r["v"]: r["parent"] for r in tree_parents.collect()}
        while cur in tp:
            path.append((cur, depth))
            cur = tp[cur]
            depth += 1
    else:
        while True:
            hit = tree_parents.filter(F.col("v") == cur).select("parent").take(1)
            if not hit:
                break
            path.append((cur, depth))
            cur = int(hit[0][0])
            depth += 1
    core_root = cur
    core_has_edges = not core_edges.filter(F.col("src") == core_root).isEmpty()

    if core_has_edges:
        state_core, metrics = bfs(core_edges, core_root, **bfs_kwargs)
        # shift core levels by the root's ascent depth
        if depth:
            state_core = state_core.select(
                "v", "parent", (F.col("level") + depth).cast("int").alias("level")
            )
    else:
        state_core = spark.createDataFrame(
            [(core_root, core_root, depth)], "v long, parent long, level int"
        )
        from graph500_bfs_spark.operators.bfs import BfsMetrics

        metrics = BfsMetrics()

    # root-side path splice: vertices on the ascent get exact levels, and
    # parents pointing AWAY from the root (down the walked path)
    if path:
        rows = []
        prev = None
        for v, d in path:
            rows.append((v, v if prev is None else prev, d))
            prev = v
        # core_root's parent is the last path vertex (it was reached from it)
        path_df = spark.createDataFrame(rows, "v long, parent long, level int")
        # fix root row: parent = root (Graph500 contract)
        state_core = state_core.join(
            path_df.select(F.col("v").alias("pv")), F.col("v") == F.col("pv"), "left_anti"
        ).unionByName(path_df)
        # core_root was seeded as its own parent inside bfs; repoint it to
        # the path predecessor so V5 (tree edge exists) holds
        pred_of_core_root = path[-1][0]
        state_core = state_core.withColumn(
            "parent",
            F.when(
                (F.col("v") == core_root) & (F.col("level") == depth), F.lit(pred_of_core_root)
            ).otherwise(F.col("parent")),
        )

    # C3 splice + C4: tree vertices reachable from the BFS'd levels
    base = state_core.select("v", "level")
    spliced = tree_levels(
        tree_parents.join(
            state_core.select(F.col("v").alias("sv")), tree_parents["v"] == F.col("sv"), "left_anti"
        ),
        base,
    )
    result = state_core.unionByName(spliced)
    tree_parents.unpersist()
    return result, metrics
