"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — brute-force exact top-k: a crossJoin of the query
  set against the corpus with the dot product expressed in built-in
  higher-order functions (``zip_with`` + ``aggregate`` — JVM-side, no
  Python).  The exactness baseline; O(|Q|·|C|) — fine for small query
  sets, the calibration oracle for the ANN path.
* :func:`lsh_buckets` / :func:`lsh_topk` — random-hyperplane (sign) LSH:
  deterministic pseudo-hyperplanes derived from md5-based unit hashes, so
  bucketing is reproducible across engines and runs.  Candidates = same
  bucket in ≥1 of ``n_tables`` tables; rerank candidates exactly.  This is
  the 100 TB scale path: bucket join instead of crossJoin.

Scores are compared as ranks (not floats) in the correctness gate; pytest
checks ANN recall ≥ threshold vs the brute-force baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    av = F.transform(F.col(a), lambda x: x.cast("double"))
    bv = F.transform(F.col(b), lambda x: x.cast("double"))
    return df.withColumn(out, _dot(av, bv) / (_norm(av) * _norm(bv)))


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    n_queries: int = 10,
) -> DataFrame:
    """(query_id, neighbor_id, rank) exact top-k cosine neighbors.

    Rank is dense by (cosine desc, neighbor_id asc) — id tie-break makes
    the output deterministic under float-equal scores.
    """
    emb = embeddings.select(
        F.col("vec_id"), F.transform("embedding", lambda x: x.cast("double")).alias("vec")
    )
    q = emb.filter(
        F.col("vec_id").isin(query_ids) if query_ids is not None else F.col("vec_id") < n_queries
    ).select(F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec"))
    pairs = q.crossJoin(emb.select(F.col("vec_id").alias("neighbor_id"), "vec")).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("qvec"), F.col("vec")) / (_norm(F.col("qvec")) * _norm(F.col("vec")))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _hyperplane_sign(vec_col, table: int, plane: int) -> F.Column:
    """Sign of <v, h> for a deterministic pseudo-random hyperplane h whose
    component j is hash(table, plane, j) mapped to [-1, 1)."""
    comp = F.transform(
        vec_col,
        lambda x, j: x.cast("double")
        * (
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("_", F.lit(str(table)), F.lit(str(plane)), j.cast("string"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("double")
                / F.lit(float(1 << 32))
            )
            * 2.0
            - 1.0
        ),
    )
    return (F.aggregate(comp, F.lit(0.0), lambda acc, v: acc + v) >= 0).cast("int")


def lsh_buckets(embeddings: DataFrame, n_tables: int = 4, n_planes: int = 8) -> DataFrame:
    """(vec_id, table, bucket) — sign-LSH bucket assignment per table."""
    emb = embeddings.select("vec_id", "embedding")
    frames = []
    for t in range(n_tables):
        key = F.concat_ws(
            "",
            *[_hyperplane_sign(F.col("embedding"), t, p).cast("string") for p in range(n_planes)],
        )
        frames.append(emb.select("vec_id", F.lit(t).alias("table"), key.alias("bucket")))
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    n_tables: int = 4,
    n_planes: int = 8,
) -> DataFrame:
    """(query_id, neighbor_id, rank) approximate top-k: candidates from
    shared LSH buckets, exact cosine rerank.  The bucket self-join replaces
    the crossJoin — near-linear candidate generation at scale."""
    b = lsh_buckets(embeddings, n_tables, n_planes).cache()
    qb = b.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "table", "bucket"
    )
    cand = (
        qb.join(b, ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    emb = embeddings.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vec")
    )
    scored = (
        cand.join(emb.select(F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")), "query_id")
        .join(emb.select(F.col("vec_id").alias("neighbor_id"), "vec"), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qvec"), F.col("vec")) / (_norm(F.col("qvec")) * _norm(F.col("vec")))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95, n_tables: int = 6, n_planes: int = 10
) -> DataFrame:
    """(vec_a, vec_b, cosine_ppb) embedding-cosine near-duplicates via LSH
    candidates + exact verify — the embedding leg of the dedup suite."""
    b = lsh_buckets(embeddings, n_tables, n_planes)
    cand = (
        b.alias("x")
        .join(b.alias("y"), ["table", "bucket"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b"))
        .distinct()
    )
    emb = embeddings.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vec")
    )
    scored = (
        cand.join(emb.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("va")), "vec_a")
        .join(emb.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb")), "vec_b")
        .select(
            "vec_a",
            "vec_b",
            (_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))).alias("cosine"),
        )
    )
    return scored.filter(F.col("cosine") >= threshold).select(
        "vec_a", "vec_b", F.round(F.col("cosine") * 1e9).cast("long").alias("cosine_ppb")
    )


def ivf_assign(
    embeddings: DataFrame, n_centroids: int = 16, centroids: DataFrame | None = None
) -> DataFrame:
    """(vec_id, centroid) IVF coarse quantization.

    Deterministic centroid set = the first ``n_centroids`` vectors by id
    (k-means would be the production refinement; the partitioning/probing
    machinery is identical).  Assignment = argmax cosine against the
    broadcast centroid table — one broadcast join, no shuffle of the corpus.
    """
    if centroids is None:
        centroids = embeddings.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("centroid"),
            F.transform("embedding", lambda x: x.cast("double")).alias("cvec"),
        )
    cents = centroids
    emb = embeddings.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vec")
    )
    scored = emb.join(F.broadcast(cents)).select(
        "vec_id",
        "centroid",
        (_dot(F.col("vec"), F.col("cvec")) / (_norm(F.col("vec")) * _norm(F.col("cvec")))).alias(
            "sim"
        ),
    )
    # argmax as a MAP-SIDE-COMBINABLE aggregate, not a window: a window must
    # shuffle all N×K scored rows by vec_id; max_by's partial aggregation
    # collapses the K centroid rows of each vector to ONE before the
    # exchange — a K-fold shuffle reduction on the production assignment
    # path at corpus scale.  struct(sim, -centroid) makes the ordering key
    # unique per row, so ties deterministically pick the MIN centroid id —
    # the same contract as the old (desc sim, asc centroid) window.
    return scored.groupBy("vec_id").agg(
        F.max_by("centroid", F.struct(F.col("sim"), (-F.col("centroid")).alias("nc"))).alias(
            "centroid"
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, rank) IVF-ANN: exact rerank within the
    query's ``n_probe`` nearest centroid cells — the 100 TB scale path
    where the corpus is partitioned by centroid and only probed cells are
    read (partition pruning on the centroid column at rest).

    ``centroids``: optional (centroid, cvec) table — pass
    :func:`kmeans_centroids` output for the production path; the default
    (first n_centroids vectors by id) is the deterministic stub the
    correctness gate's SQL oracle mirrors."""
    if centroids is None:
        centroids = embeddings.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("centroid"),
            F.transform("embedding", lambda x: x.cast("double")).alias("cvec"),
        )
    cents = centroids
    assign = ivf_assign(embeddings, n_centroids, centroids=cents).cache()
    emb = embeddings.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vec")
    )
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    qprobe = (
        q.join(F.broadcast(cents))
        .select(
            "query_id",
            "qvec",
            "centroid",
            (_dot(F.col("qvec"), F.col("cvec")) / (_norm(F.col("qvec")) * _norm(F.col("cvec")))).alias("sim"),
        )
        .withColumn(
            "rk", F.row_number().over(Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("centroid")))
        )
        .filter(F.col("rk") <= n_probe)
        .select("query_id", "qvec", "centroid")
    )
    cand = qprobe.join(assign, "centroid").filter(F.col("vec_id") != F.col("query_id"))
    scored = cand.join(emb.select(F.col("vec_id").alias("nid"), "vec"), cand["vec_id"] == F.col("nid")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (_dot(F.col("qvec"), F.col("vec")) / (_norm(F.col("qvec")) * _norm(F.col("vec")))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def kmeans_centroids(
    embeddings: DataFrame, n_centroids: int = 16, n_iter: int = 5
) -> DataFrame:
    """Distributed spherical k-means (Lloyd's) — the PRODUCTION centroid
    builder for IVF (replacing the deterministic first-N-by-id stub, which
    the gate keeps for its SQL oracle).

    Deterministic end to end: init = first ``n_centroids`` vectors by id,
    assignment ties break to the min centroid id, so repeated runs yield
    identical centroids.  Per iteration, all DataFrame ops — the 100 TB
    shapes:

    * assign: corpus ⋈ broadcast(centroids) + argmax cosine — NO corpus
      shuffle (the centroid table is tiny);
    * update: ``posexplode`` the assigned vectors → per-(cell, dim)
      ``avg`` — ONE map-side-combined aggregate whose reduce side is only
      n_centroids × dim rows — then reassemble + L2-normalize (spherical
      k-means: unit centroids make the cosine objective monotone).

    Empty cells keep their previous centroid.  Returns (centroid, cvec).
    """
    emb = embeddings.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vec")
    )
    unit = lambda c: F.transform(c, lambda x: x / F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda a, v: a + v * v)
    ))
    cents = emb.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid"), unit(F.col("vec")).alias("cvec")
    )
    for _ in range(n_iter):
        scored = emb.join(F.broadcast(cents)).select(
            "vec_id",
            "vec",
            "centroid",
            (_dot(F.col("vec"), F.col("cvec")) / _norm(F.col("vec"))).alias("sim"),
        )
        # same map-side-combinable argmax as ivf_assign (vs. a window that
        # would shuffle all N×K scored rows); vec rides inside the max_by
        # payload — it is constant per vec_id, so the result is exact
        assign = scored.groupBy("vec_id").agg(
            F.max_by(
                F.struct(F.col("centroid"), F.col("vec")),
                F.struct(F.col("sim"), (-F.col("centroid")).alias("nc")),
            ).alias("w")
        )
        comp = assign.select(F.col("w.centroid").alias("centroid"),
                             F.posexplode("w.vec").alias("pos", "x"))
        means = comp.groupBy("centroid", "pos").agg(F.avg("x").alias("m"))
        newc = (
            means.groupBy("centroid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("raw")
            )
            .select("centroid", unit(F.col("raw")).alias("cvec"))
        )
        # empty cells keep their previous centroid (left join, coalesce)
        cents = (
            cents.alias("old")
            .join(newc.alias("new"), "centroid", "left")
            .select("centroid", F.coalesce(F.col("new.cvec"), F.col("old.cvec")).alias("cvec"))
            .localCheckpoint(eager=True)  # truncate the per-iteration lineage
        )
    return cents


def ivf_write_partitioned(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    centroids: DataFrame | None = None,
) -> None:
    """Materialize the corpus PARTITIONED BY CENTROID at rest — the 100 TB
    IVF layout: each coarse cell is its own partition directory, so a probe
    touching ``n_probe`` of ``n_centroids`` cells reads only that fraction
    of the data via Spark's partition pruning (no index structure needed —
    the layout IS the index).

    Writes ``<path>/corpus`` (vec_id, embedding, centroid=<cell>/...) and
    ``<path>/centroids`` (the tiny cell table the reader broadcasts), so a
    reader needs nothing but the path.  Assignment reuses
    :func:`ivf_assign` (broadcast centroids + map-side-combinable argmax —
    the corpus never shuffles except the partitionBy write itself).
    """
    if centroids is None:
        centroids = embeddings.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("centroid"),
            F.transform("embedding", lambda x: x.cast("double")).alias("cvec"),
        )
    assign = ivf_assign(embeddings, n_centroids, centroids=centroids)
    (
        embeddings.select("vec_id", "embedding")
        .join(assign, "vec_id")
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(f"{path}/corpus")
    )
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_append(new_vectors: DataFrame, path: str) -> None:
    """Incrementally add vectors to a layout written by
    :func:`ivf_write_partitioned` — the corpus-GROWS path, no rebuild.

    Each new vector is assigned to its nearest EXISTING centroid (read
    from ``<path>/centroids``) and appended into that cell's partition
    directory; existing files are never rewritten, untouched cells are
    never opened, and the very next probe sees the new vectors because
    the layout IS the index — append IS index maintenance.  Centroid
    drift under a shifting distribution is the periodic batch job's
    problem by design (retrain via :func:`kmeans_centroids` + rewrite) —
    the same serve-now/reconcile-later split as the streaming dedup and
    edge-derivation surfaces.

    CALLER CONTRACT (r5 ADVICE): ``vec_id`` values must be new — append
    performs no dedup, so a replayed batch lands the same vec_id in its
    cell twice and probes return it twice.  Exactly-once delivery /
    idempotent replay is the ingest side's job (the streaming exact-dedup
    operator is the shipped tool for it); callers that cannot guarantee it
    should anti-join ``new_vectors`` against the target cells' ids first.
    """
    spark = new_vectors.sparkSession
    cents = spark.read.parquet(f"{path}/centroids")
    assign = ivf_assign(new_vectors, centroids=cents)
    (
        new_vectors.select("vec_id", "embedding")
        .join(assign, "vec_id")
        .write.mode("append")
        .partitionBy("centroid")
        .parquet(f"{path}/corpus")
    )


def ivf_topk_at_rest(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """(query_id, neighbor_id, rank) top-k against a corpus written by
    :func:`ivf_write_partitioned` — reading ONLY the probed cells.

    The probed-cell set (≤ |Q|·n_probe small integers) is collected and
    pushed as a LITERAL ``centroid IN (...)`` predicate, which Spark
    resolves at planning time against the partition directories
    (``PartitionFilters`` in the scan — asserted by test): unprobed cells
    are never opened.  Rerank is exact cosine within the probed cells —
    identical results to :func:`ivf_topk` on the same centroids (gate
    hash-checked against the same SQL oracle).

    ``queries``: (vec_id, embedding) — normally external at 100 TB; query
    ids present in the corpus are excluded from their own neighbor lists
    as in :func:`ivf_topk`.
    """
    cents = spark.read.parquet(f"{path}/centroids")
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qvec"),
    )
    qprobe = (
        q.join(F.broadcast(cents))
        .select(
            "query_id",
            "qvec",
            "centroid",
            (_dot(F.col("qvec"), F.col("cvec"))
             / (_norm(F.col("qvec")) * _norm(F.col("cvec")))).alias("sim"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("centroid"))
            ),
        )
        .filter(F.col("rk") <= n_probe)
        .select("query_id", "qvec", "centroid")
    )
    # literal partition predicate: planning-time pruning, unprobed cells
    # are never opened (the probed set is tiny — ≤ |Q|·n_probe ints)
    cells = sorted({int(r["centroid"]) for r in qprobe.select("centroid").distinct().collect()})
    corpus = (
        spark.read.parquet(f"{path}/corpus")
        .filter(F.col("centroid").isin(cells))
        .select(
            F.col("vec_id"),
            F.col("centroid"),
            F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
        )
    )
    scored = (
        qprobe.join(corpus, "centroid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot(F.col("qvec"), F.col("vec"))
             / (_norm(F.col("qvec")) * _norm(F.col("vec")))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
