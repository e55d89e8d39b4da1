"""Deduplication queries (SURVEY §2.12 A5-A7, W1 + LLM-pipeline dedup).

Exact dedup is hash-groupBy — a single shuffle on the dedup key; at
100 TB the key hash distributes uniformly so no skew. MinHash/SimHash
live in ``functions.dedup`` and are surfaced via the ``minhash_*``
queries there; this module covers the exact/reporting side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..session import load_sf_tables
from . import register


@register(
    "duplicate_order_groups",
    """
    SELECT l_orderkey, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY l_orderkey
    HAVING COUNT(*) > 1
    ORDER BY cnt DESC, l_orderkey
    LIMIT 100
    """,
    survey_ref="A5 (duplicate groups, dedup.py:41-48)",
)
def duplicate_order_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > 1)
        .orderBy(F.desc("cnt"), "l_orderkey")
        .limit(100)
    )


@register(
    "distinct_row_count",
    """
    SELECT COUNT(*) AS distinct_rows
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    """,
    survey_ref="A6 (distinct-count, dedup.py:99)",
)
def distinct_row_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    n = t["lineitem"].select("l_orderkey", "l_suppkey").distinct().count()
    return spark.createDataFrame([(n,)], "distinct_rows bigint")


@register(
    "uniqueness_report_customer",
    """
    SELECT
        COUNT(*) AS row_count,
        COUNT(DISTINCT c_custkey) AS c_custkey_distinct,
        COUNT(*) - COUNT(c_custkey) AS c_custkey_nulls,
        COUNT(DISTINCT c_name) AS c_name_distinct,
        COUNT(*) - COUNT(c_name) AS c_name_nulls,
        COUNT(DISTINCT c_nationkey) AS c_nationkey_distinct,
        COUNT(*) - COUNT(c_nationkey) AS c_nationkey_nulls,
        COUNT(DISTINCT c_mktsegment) AS c_mktsegment_distinct,
        COUNT(*) - COUNT(c_mktsegment) AS c_mktsegment_nulls
    FROM customer
    """,
    survey_ref="A7 (uniqueness report, dedup.py:215-234)",
)
def uniqueness_report_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column uniqueness in ONE scan (the reference issues one SQL
    statement per column; a single partial-aggregable pass wins at scale)."""
    t = load_sf_tables(spark, sf_dir)
    aggs = [F.count("*").alias("row_count")]
    for c in ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]:
        aggs.append(F.countDistinct(c).alias(f"{c}_distinct"))
        aggs.append((F.count("*") - F.count(c)).alias(f"{c}_nulls"))
    return t["customer"].agg(*aggs)


@register(
    "dedup_events_keep_first",
    """
    SELECT user_id, event_type, event_id, STRFTIME(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts
    FROM (
        SELECT user_id, event_type, event_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    survey_ref="W1 (dedup keep-first, dedup.py:108-170)",
)
def dedup_events_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup with a *total* ordering (ts, event_id) — the
    reference's OVER clause has no ORDER BY and is nondeterministic
    (dedup.py:148-153); we fix determinism and document the deviation."""
    from pyspark.sql import Window

    t = load_sf_tables(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        )
    )


@register(
    "exact_dup_docs_by_fingerprint",
    """
    SELECT fp, cnt FROM (
        SELECT md5(lower(trim(text))) AS fp, COUNT(*) AS cnt
        FROM documents
        GROUP BY 1
    ) WHERE cnt > 1
    ORDER BY cnt DESC, fp
    """,
    survey_ref="LLM-dedup: exact content-hash dedup",
)
def exact_dup_docs_by_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-identical-document groups by normalized-content hash.
    At 100 TB: one shuffle on a 128-bit hash — uniform, skew-free."""
    t = load_sf_tables(spark, sf_dir)
    return (
        t["documents"]
        .select(F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > 1)
        .orderBy(F.desc("cnt"), "fp")
    )
