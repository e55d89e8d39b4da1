"""Extended operator coverage: exact percentiles (A2), JSON scalar
surface (P1 extension over events.props), ROLLUP multi-level
aggregation (free Spark capability beyond the reference, SURVEY §2.5
note), and theta-join shapes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..session import load_sf_tables
from . import register


@register(
    "quantity_percentiles",
    """
    SELECT l_returnflag,
           ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity), 4) AS p25,
           ROUND(percentile_cont(0.50) WITHIN GROUP (ORDER BY l_quantity), 4) AS p50,
           ROUND(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity), 4) AS p75,
           ROUND(percentile_cont(0.90) WITHIN GROUP (ORDER BY l_quantity), 4) AS p90
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey_ref="A2 (PERCENTILE_CONT profile, catalog.py:1909-1925)",
)
def quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles — Spark's percentile() matches
    PERCENTILE_CONT semantics (linear interpolation); rounded to 4dp to
    absorb last-ulp interpolation-formula differences.

    r14 (guide §1.2 "per-task work"): ONE percentile aggregate over an
    array of percentages instead of four separate aggregates — each
    Percentile buffers a value→count map of the whole group, so the
    four-aggregate form built four identical maps per group (4× the
    aggregation state, merge traffic and final sort); the array form
    builds one and reads the four quantiles off it. Per-element
    interpolation is the same code path — values identical."""
    li = load_sf_tables(spark, sf_dir)["lineitem"]
    qs = (0.25, 0.50, 0.75, 0.90)
    return (
        li.groupBy("l_returnflag")
        .agg(F.percentile(
            "l_quantity", F.array(*[F.lit(q) for q in qs])).alias("_p"))
        .select(
            "l_returnflag",
            *[
                F.round(F.col("_p")[i], 4).alias(f"p{int(q * 100)}")
                for i, q in enumerate(qs)
            ],
        )
    )


@register(
    "events_json_extraction",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
                THEN 'high' ELSE 'low' END AS k_bucket
    FROM events
    WHERE props IS NOT NULL
    """,
    survey_ref="P1 scalar surface: JSON extraction (events.props)",
)
def events_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_sf_tables(spark, sf_dir)["events"]
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.where(F.col("props").isNotNull()).select(
        "event_id",
        k.alias("k_value"),
        F.when(k >= 50, "high").otherwise("low").alias("k_bucket"),
    )


@register(
    "revenue_rollup_levels",
    """
    SELECT COALESCE(r_name, '<all>') AS region,
           COALESCE(o_orderstatus, '<all>') AS status,
           COUNT(*) AS orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r_name, o_orderstatus)
    """,
    survey_ref="§2.5 extension: ROLLUP multi-level aggregation",
)
def revenue_rollup_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: (region, status), (region), () levels in one shuffle —
    the reference has no grouping-sets surface; Spark gives it free."""
    t = load_sf_tables(spark, sf_dir)
    joined = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "o_orderstatus")
        .agg(
            F.count("*").alias("orders"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("double")
            .alias("total"),
        )
        .select(
            F.coalesce("r_name", F.lit("<all>")).alias("region"),
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            "orders",
            "total",
        )
    )


@register(
    "price_band_theta_join",
    """
    SELECT b.band_name, COUNT(*) AS parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM part p
    JOIN (
        SELECT * FROM (VALUES ('budget', 0.0, 500.0),
                              ('mid', 500.0, 1200.0),
                              ('premium', 1200.0, 1e9)) AS t(band_name, lo, hi)
    ) b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band_name
    """,
    survey_ref="J1 (theta/range join shape)",
)
def price_band_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-band theta join against a broadcast tiny dimension — the
    canonical banding pattern (broadcast nested-loop, no shuffle)."""
    part = load_sf_tables(spark, sf_dir)["part"]
    bands = spark.createDataFrame(
        [("budget", 0.0, 500.0), ("mid", 500.0, 1200.0), ("premium", 1200.0, 1e9)],
        "band_name string, lo double, hi double",
    )
    return (
        part.join(
            F.broadcast(bands),
            (F.col("p_retailprice") >= F.col("lo"))
            & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("band_name")
        .agg(
            F.count("*").alias("parts"),
            F.sum(F.col("p_retailprice").cast("decimal(14,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "correlated_subquery_avg",
    """
    SELECT c_mktsegment,
           COUNT(*) AS above_avg_customers
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    GROUP BY c_mktsegment
    """,
    survey_ref="P1 (scalar subquery shape)",
)
def correlated_subquery_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_sf_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS above_avg_customers
        FROM customer c
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
        GROUP BY c_mktsegment
        """
    )


@register(
    "promo_revenue_share",
    """
    SELECT CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                         THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_revenue,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue,
           COUNT(*) AS line_count
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
    """,
    survey_ref="A-class: conditional aggregation (TPC-H Q14 shape)",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    one = F.lit(1).cast("decimal(4,2)")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        one - F.col("l_discount").cast("decimal(4,2)")
    )
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-07-01 00:00:00").cast("timestamp")
    return (
        t["lineitem"]
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(
                F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
                    F.lit(0).cast("decimal(12,2)")
                )
            )
            .cast("double")
            .alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
            F.count("*").alias("line_count"),
        )
    )


@register(
    "string_function_surface",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           length(c_name) AS name_len,
           substr(c_name, 1, 8) AS name_prefix,
           replace(c_name, 'Customer', 'Cust') AS name_short,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           c_mktsegment || ':' || CAST(c_nationkey AS VARCHAR) AS seg_nation,
           CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END AS has_one
    FROM customer
    """,
    survey_ref="§2.9 scalar string surface (upper/length/substr/replace/lpad/concat/LIKE)",
)
def string_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    return t["customer"].select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_short"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.concat_ws(":", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.when(F.col("c_name").like("%1%"), 1).otherwise(0).alias("has_one"),
    )


@register(
    "status_distinct_customers",
    """
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS customers,
           COUNT(*) AS orders,
           MIN(o_orderkey) AS first_order,
           MAX(o_orderkey) AS last_order
    FROM orders
    GROUP BY o_orderstatus
    """,
    survey_ref="A1/A6: grouped exact distinct counts",
)
def status_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    return t["orders"].groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("customers"),
        F.count("*").alias("orders"),
        F.min("o_orderkey").alias("first_order"),
        F.max("o_orderkey").alias("last_order"),
    )
