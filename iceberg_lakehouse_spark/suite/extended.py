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
    absorb last-ulp interpolation-formula differences."""
    li = load_sf_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(F.percentile("l_quantity", F.lit(q)), 4).alias(f"p{int(q * 100)}")
            for q in (0.25, 0.50, 0.75, 0.90)
        ]
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
