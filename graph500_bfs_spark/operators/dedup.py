"""Deduplication suite for training-data pipelines (exact + near-dup).

Five methods, all declarative DataFrame plans (no per-row Python):

* :func:`exact_dup_groups` — hash-groupBy on a content fingerprint.
* :func:`shingle_table` — word n-gram shingling, shuffle-free (array-native
  transform over the split token array).
* :func:`ngram_jaccard_pairs` — inverted-index self-join on shingles →
  per-pair intersection counts → exact Jaccard.  The index join is the
  scale-sensitive step: shingles shared by too many docs ("stop shingles")
  are dropped with a frequency cap, the standard guard that keeps candidate
  generation near-linear at 100 TB.
* :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — MinHash + banded
  LSH.  Hash family h_i(s) = int64(md5(i ':' s)[0:15]) — chosen because
  both Spark and DuckDB compute it identically, so the correctness gate
  can verify the *whole pipeline* (signatures → bands → candidates →
  verified Jaccard) against SQL.
* :func:`simhash_signatures` / :func:`simhash_pairs` — 32-bit SimHash from
  per-token md5 bits; near-dups = Hamming distance ≤ k via banded chunks +
  ``bit_count(xor)``.

Embedding-cosine near-dup lives in similarity.py (same candidate-pair
machinery over LSH buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHINGLE_N = 5
MINHASH_K = 16  # signature length
MINHASH_BANDS = 4  # 4 bands × 4 rows
SIMHASH_BITS = 32


def _hash15(col) -> F.Column:
    """First 15 hex digits of md5 → int64 — identical in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """(doc_id, canonical_id, group_size): exact-content duplicate groups."""
    fp = docs.select("doc_id", F.md5(F.col("text")).alias("fp"))
    grp = fp.groupBy("fp").agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("group_size")
    )
    return (
        fp.join(grp, "fp")
        .select("doc_id", "canonical_id", "group_size")
    )


def shingle_table(docs: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams.

    SHUFFLE-FREE: built array-natively with transform over the split token
    array (dedup via array_distinct before the explode), instead of the
    posexplode + collect_list-over-window formulation whose window was one
    doc_id shuffle per call — at 100 TB the shuffle was pure overhead since
    shingling is a per-row operation.
    """
    toks = F.split(F.trim(F.col("text")), r"\s+")
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])  # noqa: E731
    return docs.select(
        "doc_id", F.explode(F.array_distinct(F.transform(starts, gram))).alias("shingle")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = SHINGLE_N,
    threshold: float = 0.1,
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """(doc_a, doc_b, jaccard_ppb) for pairs with Jaccard ≥ threshold.

    ``max_shingle_freq`` drops stop-shingles before the self-join — at web
    scale a shingle appearing in millions of docs would otherwise create a
    quadratic candidate blowup; dropping it can only lower measured overlap
    for pathological boilerplate, the standard engineering tradeoff.
    """
    sh = shingle_table(docs, n).cache()
    # |shingles(doc)| from the cached table (round 6: re-running the
    # shingle expressions just to size them was a second full text pass)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    freq_ok = sh.groupBy("shingle").agg(F.count("*").alias("df")).filter(
        F.col("df") <= max_shingle_freq
    )
    sh_f = sh.join(freq_ok.select("shingle"), "shingle")
    a = sh_f.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh_f.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sa")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sb")), "doc_b")
        .withColumn(
            "jaccard_ppb",
            F.round(
                F.lit(1e9) * F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter"))
            ).cast("long"),
        )
        .filter(F.col("jaccard_ppb") >= int(threshold * 1e9))
        .select("doc_a", "doc_b", "jaccard_ppb")
    )
    return out


def shingle_array(n: int = SHINGLE_N) -> F.Column:
    """array<string> of the row's distinct word n-grams — the array-native
    form of :func:`shingle_table` (same tokens, same grams, same dedup)."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])  # noqa: E731
    return F.array_distinct(F.transform(starts, gram))


def minhash_signature_cols(k: int = MINHASH_K) -> list[F.Column]:
    """h0..h{k-1} as ROW-WISE expressions over a ``shingles`` array column.

    min over the row's own shingles ≡ the groupBy(doc_id).min over the
    exploded shingle table — same md5-derived values, same minimum — but
    computed inside the row, so a signature costs ZERO shuffles.  Also the
    streaming form: stateless, usable before a watermark."""
    def _sig(i: int) -> F.Column:
        pfx = F.lit(f"{i}:")
        # single-argument lambda ONLY: a two-parameter lambda would make
        # F.transform pass the array index as the second argument
        return F.array_min(
            F.transform(F.col("shingles"), lambda s: _hash15(F.concat(pfx, s)))
        ).alias(f"h{i}")

    return [_sig(i) for i in range(k)]


def band_bucket_cols(k: int = MINHASH_K, bands: int = MINHASH_BANDS) -> list[F.Column]:
    """One LSH bucket key per band, over signature columns h0..h{k-1}.

    Band key = md5 of "<band>_<h..>_.." — docs agreeing on EVERY hash of a
    band land in the same bucket.  Row-wise (no shuffle); shared by the
    batch pair join and the streaming candidate emitter so both halves
    agree on what a candidate IS."""
    rows_per_band = k // bands
    out = []
    for b in range(bands):
        cols = [
            F.col(f"h{i}").cast("string")
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        out.append(F.md5(F.concat_ws("_", F.lit(str(b)), *cols)))
    return out


def minhash_signatures(docs: DataFrame, k: int = MINHASH_K, n: int = SHINGLE_N) -> DataFrame:
    """(doc_id, h0..h{k-1}) MinHash signature as k columns.

    BATCH FORM (round 6): exploded shingles + ONE map-side-combined
    groupBy(doc_id).min aggregate.  The round-5 row-wise form
    (:func:`minhash_signature_cols` — k ``transform`` lambdas over the
    row's shingle array) is plan-pretty (zero exchanges) but higher-order
    functions evaluate INTERPRETED, not under whole-stage codegen: measured
    2× slower end to end (13.1 s vs 6.4 s at sf0.1, 256k shingles) than
    this exploded form, whose per-shingle md5 chain compiles and whose
    exchange carries only k partial minima per (doc, partition) after
    map-side combine.  The row-wise columns remain the STREAMING form
    (stateless, usable before a watermark — streaming/dedup.py) and are
    pinned value-identical to this one in pytest.  Docs with fewer than n
    tokens have no shingles and are omitted (same semantics)."""
    aggs = [
        F.min(_hash15(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(k)
    ]
    return shingle_table(docs, n).groupBy("doc_id").agg(*aggs)


def _cap_buckets(
    buckets: DataFrame, max_bucket_size: int, cap_stats: dict | None = None
) -> DataFrame:
    """Drop degenerate buckets before a bucket self-join.

    One boilerplate-heavy bucket shared by millions of docs turns the
    self-join into a quadratic straggler; capping bucket frequency bounds
    candidate pairs per bucket at max_bucket_size² — the same guard as
    ``max_shingle_freq`` on the n-gram path.  Dropping a bucket can only
    lose recall for pathological near-identical corpora (which the EXACT
    dedup pass already collapses upstream); the standard tradeoff.

    Drops are OBSERVABLE, not silent: pass ``cap_stats`` (a dict) and the
    number of dropped buckets / dropped bucket-membership rows is
    accumulated into it under ``dropped_buckets`` / ``dropped_rows`` (one
    small eager aggregate over the per-bucket size table — tiny next to
    the self-join it guards; omit the dict for zero extra work).  A
    caller seeing ``dropped_rows`` ≫ 0 at defaults should widen the
    bucket key (e.g. ``chunk_bits=16`` for simhash) rather than raise the
    cap.
    """
    sizes = buckets.groupBy("bucket").agg(F.count("*").alias("_bsz"))
    if cap_stats is not None:
        row = (
            sizes.filter(F.col("_bsz") > max_bucket_size)
            .agg(
                F.count("*").alias("b"),
                F.coalesce(F.sum("_bsz"), F.lit(0)).alias("r"),
            )
            .collect()[0]
        )
        cap_stats["dropped_buckets"] = cap_stats.get("dropped_buckets", 0) + int(row["b"])
        cap_stats["dropped_rows"] = cap_stats.get("dropped_rows", 0) + int(row["r"])
    ok = sizes.filter(F.col("_bsz") <= max_bucket_size).select("bucket")
    return buckets.join(ok, "bucket")


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    n: int = SHINGLE_N,
    verify_threshold: float = 0.1,
    max_bucket_size: int = 10_000,
    cap_stats: dict | None = None,
) -> DataFrame:
    """Banded-LSH candidate pairs, verified with exact Jaccard.

    (doc_a, doc_b, jaccard_ppb) for candidates sharing ≥1 band bucket and
    passing the verify threshold.  Band key = md5 of the band's hash
    values; the bucket join only compares docs inside a bucket — the
    near-linear scale path for near-dup detection at 100 TB.
    ``max_bucket_size`` bounds the worst bucket and ``cap_stats`` reports
    what the cap dropped (see :func:`_cap_buckets`); the correctness
    gate's 500-doc corpus has no bucket near the cap, so its SQL oracle
    is unaffected.
    """
    sig = minhash_signatures(docs, k, n).cache()
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_bucket_cols(k, bands))).alias("bucket")
    )
    buckets = _cap_buckets(buckets, max_bucket_size, cap_stats)
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), "bucket")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
        # materialized: the pair set feeds the verify join AND the
        # candidate-doc pruning below (bounded by the bucket cap)
        .localCheckpoint(eager=True)
    )
    # verify candidates with exact Jaccard on shingles — computed ONLY for
    # docs that appear in a candidate pair (guide §2.3: the corpus-wide
    # re-shingle was the measured cost center; candidates are a small
    # fraction of the corpus by LSH design, so shingle volume follows the
    # candidate set, not the corpus)
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh = shingle_table(docs.join(cand_ids, "doc_id", "left_semi"), n).cache()
    # |shingles(doc)| from the same cached table (shingle_table emits the
    # row's DISTINCT shingles, so the count equals size(shingle_array))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle").alias("sh_b")), "doc_b")
        .filter(F.col("shingle") == F.col("sh_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sa")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sb")), "doc_b")
        .withColumn(
            "jaccard_ppb",
            F.round(
                F.lit(1e9) * F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter"))
            ).cast("long"),
        )
        .filter(F.col("jaccard_ppb") >= int(verify_threshold * 1e9))
        .select("doc_a", "doc_b", "jaccard_ppb")
    )


def simhash_signatures(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash) — sign-aggregated token-hash bits.

    Token hash = md5-prefix int64 (identical in DuckDB); bit j of the
    signature is 1 iff Σ_tokens (2·bit_j(h)−1) > 0.
    """
    # BATCH FORM (round 6): exploded tokens + ONE map-side-combined
    # groupBy(doc_id) with `bits` sums.  The round-5 row-wise form (`bits`
    # F.aggregate lambdas re-scanning the row's token-hash array) was
    # zero-exchange but INTERPRETED — higher-order functions don't codegen;
    # the exploded sums compile and combine map-side (same finding as
    # minhash_signatures, measured 2× there).  Values identical to the
    # row-wise form (pytest) and the DuckDB gate oracle.
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    ).withColumn("h", _hash15(F.col("tok")))
    agg = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"s{j}")
            for j in range(bits)
        ]
    )
    sim = F.lit(0).cast("long")
    for j in range(bits):
        # bit 63 as a SIGNED long literal (1<<63 overflows int64; setting
        # the sign bit is the two's-complement -(1<<63))
        w = (1 << j) if j < 63 else -(1 << 63)
        sim = sim + F.when(F.col(f"s{j}") > 0, F.lit(w).cast("long")).otherwise(F.lit(0))
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    bits: int = SIMHASH_BITS,
    max_hamming: int = 6,
    chunk_bits: int | None = None,
    max_bucket_size: int = 10_000,
    cap_stats: dict | None = None,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with Hamming(simhash) ≤ max_hamming.

    Candidate generation by banded ``chunk_bits``-bit chunks, then exact
    bit_count verify.  Pigeonhole guarantee: with C = bits/chunk_bits
    chunks, recall is 100% for max_hamming ≤ C-1 (a pair with ≤ C-1
    differing bits must leave some chunk equal); above that it is an
    approximate-recall variant (diffs can spread across all chunks).

    Corpus-scale selectivity: a chunk has ≤ 2^chunk_bits distinct values,
    so raw chunk buckets hold ~N/2^chunk_bits docs.  ``chunk_bits``
    DEFAULTS BY SIGNATURE WIDTH (None → 16 when bits ≥ 64, else 8): at
    web scale an 8-bit chunk on a 64-bit signature would put ~N/256 docs
    in EVERY bucket, tripping the ``max_bucket_size`` cap everywhere and
    silently returning nothing — 16-bit chunks (65536-way buckets) are
    the wide-signature default, and ``cap_stats`` (see
    :func:`_cap_buckets`) reports exactly what the cap dropped so the
    degenerate case is visible rather than silent.  The correctness gate
    runs at the pigeonhole-exact setting (bits=32 → chunk_bits=8,
    max_hamming=3 = C-1) on a 500-doc corpus whose buckets are far below
    the cap, so its brute-force SQL oracle is exact and unaffected.
    """
    if chunk_bits is None:
        chunk_bits = 16 if bits >= 64 else 8
    sig = simhash_signatures(docs, bits).cache()
    chunks = bits // chunk_bits
    mask = (1 << chunk_bits) - 1
    frames = []
    for c in range(chunks):
        frames.append(
            sig.select(
                "doc_id",
                "simhash",
                F.concat(
                    F.lit(f"{c}_"),
                    (F.shiftright(F.col("simhash"), c * chunk_bits).bitwiseAND(F.lit(mask))).cast(
                        "string"
                    ),
                ).alias("bucket"),
            )
        )
    buckets = frames[0]
    for fr in frames[1:]:
        buckets = buckets.unionByName(fr)
    buckets = _cap_buckets(buckets, max_bucket_size, cap_stats)
    return (
        buckets.alias("x")
        .join(buckets.alias("y"), "bucket")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
