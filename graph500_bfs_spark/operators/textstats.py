"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd); the only Python is the rolling-hash fingerprint,
which is a vectorized Arrow ``pandas_udf`` over byte arrays.

Every deterministic function here has an exact DuckDB-SQL twin in
``gate.py`` so the driver's value-hash comparison is bit-stable:
tokenization is ``regexp_split('\\s+')`` on trimmed text in both engines,
hashes are md5-prefix integers in both engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_count(text: Column) -> Column:
    toks = tokens(text)
    arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def quality_score(text: Column, n_chars: Column) -> Column:
    """Deterministic [0,1e6] integer quality score: rewards moderate length,
    penalizes very short docs and stopword stuffing.  Same closed form in
    the SQL oracle (gate.py)."""
    tc = token_count(text).cast("double")
    sw = stopword_count(text).cast("double")
    avg_tok = n_chars.cast("double") / F.greatest(tc, F.lit(1.0))
    len_term = F.least(tc / F.lit(100.0), F.lit(1.0))
    sw_term = F.lit(1.0) - F.least(sw / F.greatest(tc, F.lit(1.0)) * F.lit(2.0), F.lit(1.0))
    tok_term = F.least(avg_tok / F.lit(8.0), F.lit(1.0))
    return F.round((len_term * F.lit(0.4) + sw_term * F.lit(0.3) + tok_term * F.lit(0.3)) * 1e6).cast(
        "long"
    )


def lang_guess(text: Column) -> Column:
    """n-gram/stopword language heuristic: English stopword density."""
    tc = token_count(text).cast("double")
    ratio = stopword_count(text).cast("double") / F.greatest(tc, F.lit(1.0))
    return F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unk"))


def fingerprint_md5(text: Column) -> Column:
    """60-bit content fingerprint: first 15 hex digits of md5(lower(trim))."""
    return F.conv(F.substring(F.md5(F.lower(F.trim(text))), 1, 15), 16, 10).cast("long")


# padded-matrix element budget per Horner slice: 2^24 uint64 = 128 MB.
# Without a bound, one long outlier document in a 65536-row Arrow batch
# makes the (rows × maxlen) matrix demand rows*maxlen*8 bytes — tens of
# GB — and OOMs the executor (round-2 ADVICE).  Slicing the batch by
# length keeps every slice's matrix ≤ the budget while preserving the
# O(total-bytes) total work of the vectorized sweep.
_FP_CELL_BUDGET = 1 << 24


@pandas_udf("long")
def rolling_fingerprint(texts: pd.Series) -> pd.Series:
    """Polynomial rolling hash (base 257, mod p = 2^61-1) over UTF-8 bytes —
    the classic Rabin-style document fingerprint.  The batch is processed
    in LENGTH-SORTED slices so each slice's padded matrix stays under
    ``_FP_CELL_BUDGET`` elements (an outlier-length document lands in its
    own small slice instead of inflating every row's padding — without the
    bound, one long doc in a 65536-row batch demands rows×maxlen×8 bytes
    and OOMs the executor).  Each slice: scatter into a LEFT-padded byte
    matrix (leading zeros keep Horner's state at 0, so the padded hash
    equals the unpadded one), then a Horner sweep over byte POSITIONS —
    whole-slice NumPy ops, no per-row Python.  h*257 mod p is computed
    overflow-free in uint64 by splitting h into 32-bit halves and folding
    with 2^61 ≡ 1 (mod p).  The helper stays NESTED so the pickled UDF is
    self-contained (a module-global function reference would make the
    executor re-import this module, whose pandas_udf decorator needs a
    live session).  Spark-only (no SQL twin); verified by pytest against a
    pure-Python reference, including across slice boundaries."""

    def horner_slice(byts: list, lens: np.ndarray) -> np.ndarray:
        n = len(byts)
        maxlen = int(lens.max())
        flat = np.frombuffer(b"".join(byts), dtype=np.uint8).astype(np.uint64)
        offsets = np.concatenate(([0], np.cumsum(lens)))
        row_idx = np.repeat(np.arange(n), lens)
        col_idx = (
            np.arange(len(flat))
            - np.repeat(offsets[:-1], lens)
            + np.repeat(maxlen - lens, lens)
        )
        buf = np.zeros((n, maxlen), dtype=np.uint64)
        buf[row_idx, col_idx] = flat
        P = np.uint64((1 << 61) - 1)
        h = np.zeros(n, dtype=np.uint64)
        u = np.uint64
        for j in range(maxlen):
            hi = h >> u(32)
            lo = h & u(0xFFFFFFFF)
            t = hi * u(257)  # < 2^37, no overflow
            # t*2^32 mod p = ((t mod 2^29) << 32) + (t >> 29), both < 2^61
            x = ((t & u(0x1FFFFFFF)) << u(32)) + (t >> u(29)) + lo * u(257) + buf[:, j]
            x = (x & P) + (x >> u(61))
            x = (x & P) + (x >> u(61))
            h = np.where(x == P, u(0), x)
        return h

    n = len(texts)
    byts = [(t or "").encode("utf-8") for t in texts]
    lens = np.fromiter((len(b) for b in byts), dtype=np.int64, count=n)
    out = np.zeros(n, dtype=np.uint64)
    nonempty = np.flatnonzero(lens > 0)
    if len(nonempty):
        order = nonempty[np.argsort(lens[nonempty], kind="stable")]
        start = 0
        while start < len(order):
            # greedy slice: rows are length-sorted, so the slice's maxlen is
            # its LAST row's length; grow while rows*maxlen fits the budget
            end = start + 1
            while (
                end < len(order)
                and (end - start + 1) * int(lens[order[end]]) <= _FP_CELL_BUDGET
            ):
                end += 1
            idx = order[start:end]
            out[idx] = horner_slice([byts[i] for i in idx], lens[idx])
            start = end
    return pd.Series(out.astype(np.int64))


def document_stats(docs: DataFrame) -> DataFrame:
    """Per-document stats table: the text-analysis suite in one projection."""
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        stopword_count(F.col("text")).alias("n_stopwords"),
        quality_score(F.col("text"), F.col("n_chars")).alias("quality_ppm"),
        lang_guess(F.col("text")).alias("lang_guess"),
        fingerprint_md5(F.col("text")).alias("fingerprint"),
    )


def select_token_budget(stats: DataFrame, budget_tokens: int) -> DataFrame:
    """Highest-quality documents until the token budget is spent — the
    selection rule: keep a doc iff its inclusive running token sum, in
    (quality_ppm DESC, doc_id ASC) order, is ≤ ``budget_tokens``.

    A naive global window cumsum is a single-partition sort — wrong at
    100 TB.  This is the scalable two-phase form:

    1. per-quality-bucket token totals (quality_ppm is a BOUNDED domain,
       ≤ 1e6 distinct values, so the histogram is tiny) → the cutoff
       bucket q* is found on the driver from the bucket-level cumsum;
    2. every doc STRICTLY above q* is kept with a row-local filter (its
       inclusive cumsum is a prefix of an in-budget bucket cumsum);
    3. only the BOUNDARY bucket needs per-doc ordering: a window
       partitioned to that single bucket, bounded by one bucket's size,
       spends the remaining budget in doc_id order.

    Returns (doc_id, n_tokens, quality_ppm) — deterministic, exactly the
    SQL window-cumsum rule (oracle-checked).
    """
    from pyspark.sql import Window

    hist = sorted(
        (
            (int(r["quality_ppm"]), int(r["toks"]))
            for r in stats.groupBy("quality_ppm")
            .agg(F.sum("n_tokens").alias("toks"))
            .collect()
        ),
        key=lambda t: -t[0],
    )
    cum = 0
    cutoff = None  # first bucket whose full inclusion would bust the budget
    remaining = budget_tokens
    for q, toks in hist:
        if cum + toks > budget_tokens:
            cutoff, remaining = q, budget_tokens - cum
            break
        cum += toks
    cols = ["doc_id", "n_tokens", "quality_ppm"]
    if cutoff is None:  # whole corpus fits the budget
        return stats.select(*cols)
    above = stats.filter(F.col("quality_ppm") > cutoff).select(*cols)
    w = Window.partitionBy("quality_ppm").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    boundary = (
        stats.filter(F.col("quality_ppm") == cutoff)
        .withColumn("cum_in", F.sum("n_tokens").over(w))
        .filter(F.col("cum_in") <= remaining)
        .select(*cols)
    )
    return above.unionByName(boundary)
