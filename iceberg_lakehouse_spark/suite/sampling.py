"""Sampling operators (SURVEY §2.12 SA1-SA5, W2).

Determinism across engines: anything driven by an engine RNG
(Bernoulli `USING SAMPLE`, `rand(seed)`) cannot hash-match a different
engine, so the oracle-paired variants use *hash-ordered pseudo-random*
sampling — `md5(key)` as the random key — which is deterministic,
uniform, engine-independent, and exactly as statistically valid for
synthetic sampling. The engine-RNG variant (`random_sample_bernoulli`)
is exposed rows-only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.rownum import range_bucket, with_global_row_number
from ..session import load_sf_tables
from . import register


@register(
    "systematic_sample_events",
    """
    SELECT event_id, user_id, event_type
    FROM (
        SELECT event_id, user_id, event_type,
               ROW_NUMBER() OVER (ORDER BY event_id) AS rn
        FROM events
    ) WHERE (rn - 1) % 20 = 0
    """,
    survey_ref="SA3/W2 (systematic every-Nth, sampling.py:134-178)",
)
def systematic_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-20th row by a defined ordering. The reference uses
    ROW_NUMBER() OVER () — insertion order; Spark requires an explicit
    ordering (SURVEY §7) so we order by the key.

    Scale path: a global ROW_NUMBER window is a single-partition sort;
    instead the global rank comes from two-pass partition-offset
    numbering (range-bucket event_id → per-bucket counts → offsets +
    per-bucket window) — identical output, work spread across buckets
    (operators/rownum.py; test_plans.py gates SinglePartition out)."""
    t = load_sf_tables(spark, sf_dir)
    ev = t["events"]
    mm = ev.agg(
        F.min("event_id").alias("mn"), F.max("event_id").alias("mx")
    ).collect()[0]
    return (
        with_global_row_number(
            ev,
            range_bucket(F.col("event_id"), mm["mn"], mm["mx"]),
            ["event_id"],
            out_col="rn",
        )
        .where((F.col("rn") - 1) % 20 == 0)
        .select("event_id", "user_id", "event_type")
    )


@register(
    "stratified_sample_events",
    """
    SELECT event_id, event_type
    FROM (
        SELECT event_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS stratum_n
        FROM events
    ) WHERE rn <= GREATEST(1, CAST(CEIL(stratum_n * 0.05) AS BIGINT))
    """,
    survey_ref="SA2 (stratified ≥1-per-stratum, sampling.py:63-131)",
)
def stratified_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 5% with ≥1 row per stratum (the reference guarantee
    `sampleBy` can't give — SURVEY §7). Pseudo-random order = md5(key),
    so both engines draw the identical sample."""
    t = load_sf_tables(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    wc = Window.partitionBy("event_type")
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .withColumn("stratum_n", F.count("*").over(wc))
        .where(
            F.col("rn")
            <= F.greatest(F.lit(1), F.ceil(F.col("stratum_n") * 0.05).cast("bigint"))
        )
        .select("event_id", "event_type")
    )


@register(
    "hash_sample_lineitem",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 2) < '0d'
    """,
    survey_ref="SA1 (Bernoulli-style ~5% sample, deterministic variant)",
)
def hash_sample_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~5% Bernoulli sample via content hash (first md5 byte < 0x0d ≈
    13/256). Fully pushdown-friendly: no shuffle, no window — each task
    filters independently, the right shape at 100 TB."""
    t = load_sf_tables(spark, sf_dir)
    key = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    return (
        t["lineitem"]
        .where(F.substring(F.md5(key), 1, 2) < "0d")
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@register(
    "random_sample_bernoulli",
    None,  # engine RNG — cannot cross-engine hash-match; rows-only check
    survey_ref="SA1 (df.sample(fraction, seed))",
)
def random_sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    return t["lineitem"].sample(fraction=0.05, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "sample_vs_full_stats",
    """
    WITH s AS (
        SELECT * FROM lineitem
        WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 2) < '0d'
    )
    SELECT
        (SELECT COUNT(*) FROM s) AS sample_rows,
        (SELECT COUNT(*) FROM lineitem) AS full_rows,
        (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM s) AS sample_avg_qty,
        (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM lineitem) AS full_avg_qty,
        (SELECT CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) FROM s) AS sample_min_price,
        (SELECT CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) FROM s) AS sample_max_price
    """,
    survey_ref="SA5/A8 (sample-vs-full comparison, sampling.py:245-308)",
)
def sample_vs_full_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    li = t["lineitem"]
    key = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    s = li.where(F.substring(F.md5(key), 1, 2) < "0d")
    d = "decimal(18,2)"
    samp = s.agg(
        F.count("*").alias("sample_rows"),
        (F.sum(F.col("l_quantity").cast(d)).cast("double") / F.count("*")).alias(
            "sample_avg_qty"
        ),
        F.min(F.col("l_extendedprice").cast(d)).cast("double").alias("sample_min_price"),
        F.max(F.col("l_extendedprice").cast(d)).cast("double").alias("sample_max_price"),
    )
    full = li.agg(
        F.count("*").alias("full_rows"),
        (F.sum(F.col("l_quantity").cast(d)).cast("double") / F.count("*")).alias(
            "full_avg_qty"
        ),
    )
    return samp.crossJoin(full).select(
        "sample_rows",
        "full_rows",
        "sample_avg_qty",
        "full_avg_qty",
        "sample_min_price",
        "sample_max_price",
    )
