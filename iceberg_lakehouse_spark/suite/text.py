"""Text-analysis operators for LLM training-data pipelines: token
counting, quality scoring, language-ID heuristic, fingerprinting,
masking (governance G2) — all JVM-side built-ins, zero Python UDFs.

At 100 TB these are narrow map-only transformations: no shuffle except
the explicit word-frequency aggregation, which shuffles on the word
hash (uniform). Everything stays inside whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..session import load_sf_tables
from . import register

# shared with the oracle: tiny stopword list for the lang-id heuristic
_EN_STOP = ("the", "a", "of", "and", "to", "in")


@register(
    "token_counts",
    r"""
    SELECT doc_id,
           n_chars,
           length(trim(text)) AS measured_chars,
           CASE WHEN trim(text) = '' THEN 0
                ELSE length(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')) END AS n_tokens
    FROM documents
    """,
    survey_ref="LLM-text: token counting",
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    trimmed = F.trim(F.col("text"))
    return t["documents"].select(
        "doc_id",
        "n_chars",
        F.length(trimmed).alias("measured_chars"),
        F.when(trimmed == "", F.lit(0))
        .otherwise(F.size(F.split(trimmed, r"\s+")))
        .alias("n_tokens"),
    )


@register(
    "text_quality_scores",
    r"""
    SELECT doc_id,
           len AS char_len,
           toks AS token_len,
           CASE WHEN toks > 0 THEN CAST(len AS DOUBLE) / toks ELSE 0.0 END AS avg_token_len,
           CASE WHEN toks > 0 THEN CAST(stop_hits AS DOUBLE) / toks ELSE 0.0 END AS stopword_ratio,
           CAST(CASE WHEN len BETWEEN 100 AND 400 THEN 1.0
                     WHEN len > 400 THEN 0.75 ELSE 0.5 END AS DOUBLE) AS length_score
    FROM (
        SELECT doc_id,
               length(trim(text)) AS len,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE length(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')) END AS toks,
               len(list_filter(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+'),
                               w -> w IN ('the','a','of','and','to','in'))) AS stop_hits
        FROM documents
    )
    """,
    survey_ref="LLM-text: quality scoring (composite, mirrors quality.py:28-159 shape)",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    trimmed = F.trim(F.col("text"))
    toks = F.when(trimmed == "", F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+")))
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    d = (
        t["documents"]
        .select(
            "doc_id",
            F.length(trimmed).alias("len"),
            toks.alias("toks"),
            F.size(F.filter(words, lambda w: w.isin(*_EN_STOP))).alias("stop_hits"),
        )
    )
    return d.select(
        "doc_id",
        F.col("len").alias("char_len"),
        F.col("toks").alias("token_len"),
        F.when(F.col("toks") > 0, F.col("len").cast("double") / F.col("toks"))
        .otherwise(0.0)
        .alias("avg_token_len"),
        F.when(F.col("toks") > 0, F.col("stop_hits").cast("double") / F.col("toks"))
        .otherwise(0.0)
        .alias("stopword_ratio"),
        F.when((F.col("len") >= 100) & (F.col("len") <= 400), 1.0)
        .when(F.col("len") > 400, 0.75)
        .otherwise(0.5)
        .alias("length_score"),
    )


@register(
    "lang_id_heuristic",
    r"""
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN toks > 0 AND CAST(stop_hits AS DOUBLE) / toks >= 0.08
                THEN 'en' ELSE 'other' END AS predicted_lang
    FROM (
        SELECT doc_id, lang,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE length(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')) END AS toks,
               len(list_filter(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+'),
                               w -> w IN ('the','a','of','and','to','in'))) AS stop_hits
        FROM documents
    )
    """,
    survey_ref="LLM-text: language-ID (n-gram/stopword heuristic)",
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    trimmed = F.trim(F.col("text"))
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    toks = F.when(trimmed == "", F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+")))
    base = t["documents"].select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        toks.alias("toks"),
        F.size(F.filter(words, lambda w: w.isin(*_EN_STOP))).alias("stop_hits"),
    )
    return base.select(
        "doc_id",
        "labeled_lang",
        F.when(
            (F.col("toks") > 0)
            & (F.col("stop_hits").cast("double") / F.col("toks") >= 0.08),
            F.lit("en"),
        )
        .otherwise("other")
        .alias("predicted_lang"),
    )


@register(
    "doc_fingerprints",
    """
    SELECT doc_id,
           md5(lower(trim(text))) AS content_md5,
           substr(sha256(lower(trim(text))), 1, 16) AS content_sha16
    FROM documents
    """,
    survey_ref="LLM-text: document fingerprinting; G2 mask-hash shape (sha256[:16], masking.py:139-140)",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    norm = F.lower(F.trim(F.col("text")))
    return t["documents"].select(
        "doc_id",
        F.md5(norm).alias("content_md5"),
        F.substring(F.sha2(norm, 256), 1, 16).alias("content_sha16"),
    )


@register(
    "word_frequency_topk",
    r"""
    SELECT word, cnt FROM (
        SELECT word, COUNT(*) AS cnt
        FROM (
            SELECT unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+')) AS word
            FROM documents WHERE trim(text) <> ''
        )
        GROUP BY word
    )
    ORDER BY cnt DESC, word
    LIMIT 25
    """,
    survey_ref="LLM-text: vocabulary top-K (explode → shuffle on word hash)",
)
def word_frequency_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    return (
        t["documents"]
        .where(F.trim(F.col("text")) != "")
        .select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(25)
    )


@register(
    "masking_policies",
    """
    SELECT c_custkey,
           substr(sha256(c_name), 1, 16) AS c_name,
           '***' AS c_mktsegment,
           CASE WHEN c_name IS NULL THEN NULL
                ELSE substr(c_name, 1, 3) || '***' END AS c_name_truncated,
           CAST(NULL AS DOUBLE) AS c_acctbal
    FROM customer
    """,
    survey_ref="G2 (masking: hash/redact/truncate/nullify, masking.py:38-246)",
)
def masking_policies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four reference masking strategies as native column transforms
    (no Python hooks): hash=sha256[:16], redact='***', truncate=3+'***',
    nullify=typed NULL."""
    t = load_sf_tables(spark, sf_dir)
    return t["customer"].select(
        "c_custkey",
        F.substring(F.sha2(F.col("c_name"), 256), 1, 16).alias("c_name"),
        F.lit("***").alias("c_mktsegment"),
        F.when(F.col("c_name").isNull(), F.lit(None).cast("string"))
        .otherwise(F.concat(F.substring("c_name", 1, 3), F.lit("***")))
        .alias("c_name_truncated"),
        F.lit(None).cast("double").alias("c_acctbal"),
    )
