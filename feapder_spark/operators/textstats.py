"""Text analysis operators for the training-data pipeline (driver brief):
token counting, quality scoring, language-ID heuristic, content
fingerprinting.  All pure ``pyspark.sql.functions`` — JVM-side, codegen'd,
zero Python in the plan, so they run at parquet-scan speed on 100 TB.

Each has an exact ANSI-SQL twin in feapder_spark/queries.py (the DuckDB
oracle), so expressions here deliberately stick to functions with identical
semantics in both engines (split/regexp on non-empty trimmed text, md5,
round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny marker vocabulary for the quality/lang heuristics (synthetic corpus)
MARKER_REGEX = r"\b(the|a|data|key)\b"


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish word/number token count."""
    t = F.trim(F.col(text_col))
    return df.select(
        "doc_id",
        F.size(F.split(t, r"\s+")).alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(r"[a-z]+|[0-9]+")).alias("n_word_tokens"),
        F.length(t).alias("n_chars_trim"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/stopword-ratio quality heuristic; deterministic and portable."""
    t = F.trim(F.col(text_col))
    n_tokens = F.size(F.split(t, r"\s+"))
    hits = F.regexp_count(t, F.lit(MARKER_REGEX))
    stop_ratio = F.round(hits / n_tokens, 4)
    score = F.round(F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * (F.lit(1.0) - stop_ratio), 4)
    return df.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        hits.alias("marker_hits"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-based language-ID heuristic (n-gram scoring reduced to a
    portable CASE over marker hits; a production system would broadcast a
    per-language n-gram table through the same shape)."""
    t = F.lower(F.col(text_col))
    en_hits = F.regexp_count(t, F.lit(r"\b(the|a)\b"))
    return df.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        F.when(en_hits > 0, F.lit("en")).otherwise(F.lit("unk")).alias("lang_pred"),
        en_hits.alias("en_hits"),
    )


def content_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over the whitespace-normalized lowercase
    text (the batch equivalent of a rolling-hash content fingerprint)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select("doc_id", F.md5(norm).alias("content_fp"))


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact content dedup: hash-groupBy, keep the smallest doc_id per
    content fingerprint (map-side partial agg; one shuffle on the 16-byte
    fingerprint, never on the text)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return (
        df.select(F.md5(norm).alias("content_fp"), "doc_id")
        .groupBy("content_fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_dups"))
    )
