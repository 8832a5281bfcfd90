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


@pandas_udf("long")
def rolling_fingerprint(texts: pd.Series) -> pd.Series:
    """Polynomial rolling hash (base 257, mod 2^61-1) over UTF-8 bytes —
    the classic Rabin-style document fingerprint, vectorized per batch.
    Spark-only (no SQL twin); verified by pytest against a pure-Python
    reference."""
    MOD = (1 << 61) - 1
    BASE = 257
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        h = 0
        for b in (t or "").encode("utf-8"):
            h = (h * BASE + b) % MOD
        out[i] = h
    return pd.Series(out)


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
