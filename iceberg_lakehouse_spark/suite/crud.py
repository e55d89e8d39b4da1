"""CRUD/merge semantics as pure transformations (SURVEY §2.3 C1-C7).

The stateful table-format side (snapshot commits) lives in
``iceberg_lakehouse_spark.catalog`` and is covered by pytest; these
queries certify the *semantics* of update/delete/upsert against the
DuckDB oracle: the reference implements them as read→rewrite SQL
(CASE-projection update, NOT-filter delete, anti-join+union upsert,
catalog.py:632-1344), which is exactly expressible as a SELECT.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..session import load_sf_tables
from . import register


@register(
    "update_projection_semantics",
    """
    SELECT c_custkey,
           c_name,
           CASE WHEN c_mktsegment = 'BUILDING' AND c_acctbal < 0
                THEN 0.0 ELSE CAST(c_acctbal AS DOUBLE) END AS c_acctbal,
           CASE WHEN c_mktsegment = 'BUILDING' AND c_acctbal < 0
                THEN 'RECOVERED' ELSE c_mktsegment END AS c_mktsegment
    FROM customer
    """,
    survey_ref="C2 (CASE-projection update, catalog.py:701-727)",
)
def update_projection_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE customer SET c_acctbal=0, c_mktsegment='RECOVERED'
    WHERE c_mktsegment='BUILDING' AND c_acctbal<0 — as the reference's
    CASE rewrite. (Against a real table our catalog uses copy-on-write
    overwrite of only the files containing matches.)"""
    t = load_sf_tables(spark, sf_dir)
    hit = (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") < 0)
    return t["customer"].select(
        "c_custkey",
        "c_name",
        F.when(hit, F.lit(0.0))
        .otherwise(F.col("c_acctbal").cast("double"))
        .alias("c_acctbal"),
        F.when(hit, F.lit("RECOVERED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )


@register(
    "delete_filter_semantics",
    """
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE NOT (p_size < 10 AND p_brand = 'Brand#11')
    """,
    survey_ref="C3 (delete = keep NOT(filter), catalog.py:765-831)",
)
def delete_filter_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    return (
        t["part"]
        .where(~((F.col("p_size") < 10) & (F.col("p_brand") == "Brand#11")))
        .select("p_partkey", "p_name", "p_brand", "p_size")
    )


@register(
    "upsert_merge_semantics",
    """
    WITH incoming(n_nationkey, n_name, n_regionkey) AS (
        VALUES (0, 'NATION_0_V2', 0),
               (1, 'NATION_1_V2', 1),
               (97, 'NEWLAND_A', 2),
               (98, 'NEWLAND_B', 3)
    )
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    WHERE n_nationkey NOT IN (SELECT n_nationkey FROM incoming)
    UNION ALL
    SELECT n_nationkey, n_name, n_regionkey FROM incoming
    """,
    survey_ref="C4 (upsert = anti-join ∪ incoming, catalog.py:1180-1344)",
)
def upsert_merge_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's upsert: existing LEFT-ANTI incoming, UNION ALL
    incoming (catalog.py:1311-1324). Spark's one-statement equivalent
    on a real table is MERGE INTO; here the merged-result semantics."""
    t = load_sf_tables(spark, sf_dir)
    nation = t["nation"].select(
        "n_nationkey", "n_name", F.col("n_regionkey").cast("int").alias("n_regionkey")
    )
    incoming = spark.createDataFrame(
        [
            (0, "NATION_0_V2", 0),
            (1, "NATION_1_V2", 1),
            (97, "NEWLAND_A", 2),
            (98, "NEWLAND_B", 3),
        ],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    kept = nation.join(incoming, "n_nationkey", "left_anti")
    return kept.unionByName(incoming)


@register(
    "insert_append_semantics",
    """
    SELECT r_regionkey, r_name FROM region
    UNION ALL
    SELECT * FROM (VALUES (5, 'ANTARCTICA'), (6, 'OCEANIA')) AS t(r_regionkey, r_name)
    """,
    survey_ref="C1 (insert rows → append, catalog.py:500-629)",
)
def insert_append_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    new_rows = spark.createDataFrame(
        [(5, "ANTARCTICA"), (6, "OCEANIA")], "r_regionkey int, r_name string"
    )
    return t["region"].select(
        F.col("r_regionkey").cast("int").alias("r_regionkey"), "r_name"
    ).unionByName(new_rows)


@register(
    "export_pushdown_trio",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O'
    ORDER BY o_orderkey
    LIMIT 500
    """,
    survey_ref="S10 (export WHERE+projection+LIMIT, catalog.py:1752-1772)",
)
def export_pushdown_trio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The export path's filter+project+limit trio. In Spark these reach
    the parquet scan (PushedFilters / ReadSchema) instead of applying
    post-materialization like the reference."""
    t = load_sf_tables(spark, sf_dir)
    return (
        t["orders"]
        .where(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(500)
    )
