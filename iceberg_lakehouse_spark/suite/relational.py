"""Core relational queries: scans, filters, joins, aggregations, windows,
set-ops, top-K — the SQL surface the reference exposes via DuckDB
passthrough (SURVEY §2.2 P1, §2.4 J1-J5, §2.5 A1-A8, §2.6 W1-W3,
§2.7, §2.8 SO1-SO4).

Spark-first notes:
  * dimension joins (region/nation) carry explicit ``broadcast()`` — at
    100 TB the fact side never shuffles for these;
  * all money aggregates go through DECIMAL so partial-agg order
    (Spark map-side combine) can't perturb the double result vs DuckDB;
  * every LIMIT has a total ORDER BY; every output column is aliased.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..session import load_sf_tables
from . import register

D = "decimal(12,2)"   # additive money terms
S = "decimal(4,2)"    # multiplier terms (1-disc, 1+tax): keeps products ≤ scale 6



# --- r14 fixed-point money aggregation (OPTIMIZATION_r14.md; guide
# §1.2 per-task work / §2.3 narrower types) --------------------------
# These rollups used to SUM wide decimals — buffers of DECIMAL(22,2) /
# (28,4) / (32,6), none of which is long-backed, so every input row
# updated a 16-byte Decimal128/BigDecimal aggregation buffer through
# the object path. The allocation churn was the dominant per-row cost
# (measured interleaved at sf0.1: pricing_summary noop-sink 1.07s
# decimal vs 0.63s fixed-point on a quiet host, and the decimal path
# inflates 7-10x under this host's memory-pressure storms while the
# long path stays flat). The exact replacement:
#   * per row: the SAME double→DECIMAL(12,2)/(4,2) cast the oracle
#     defines (the single rounding step), then ×100 → BIGINT — exact;
#     money products are integer multiplies at scale 4/6;
#   * SUM over BIGINT — codegen hash aggregation, map-side combine,
#     8-byte buffers;
#   * at the end: BIGINT → DECIMAL(38,0), exact decimal division by
#     10^scale (the quotient has ≤ `scale` decimals and the division
#     result scale stays ≥ 6, so the division never rounds), then ONE
#     decimal→double cast — bit-identical to CAST(SUM(decimal) AS
#     DOUBLE), verified repr-exact at sf0.1 and by the oracle hash at
#     every SF.
# Overflow discipline: a scaled-long sum may only aggregate a BOUNDED
# row set. Per-order groups (≤ 7 lineitems) are safe at any scale;
# unbounded groups (pricing_summary's flag/status groups own a quarter
# of the table each) sum per (group, scan partition) first — ≤ ~1.3e6
# rows/partition × ≤ ~1.2e12 max per-row scaled value ≈ 1.6e18 < 2^63
# — and the per-partition partials re-sum in DECIMAL(38,0), which
# cannot overflow.


def _cents(col: str, typ: str = D) -> str:
    """SQL: exact ×100 scaled-integer value of CAST(col AS typ) — the
    decimal cast is the oracle's own rounding step; ×100 of a scale-2
    decimal is integral, so the BIGINT cast loses nothing."""
    return f"CAST(CAST({col} AS {typ}) * 100 AS BIGINT)"


def _unscale(sum_sql: str, scale: int) -> str:
    """SQL: scaled-integer sum → DOUBLE via exact decimal division
    (works for BIGINT sums and DECIMAL(38,0) re-sums alike)."""
    return (
        f"CAST(CAST({sum_sql} AS DECIMAL(38,0)) / {10 ** scale}"
        " AS DOUBLE)"
    )


# --------------------------------------------------------------------------
# A-class aggregations
# --------------------------------------------------------------------------

@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ref="A1-A4,P1",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (reference runs this class of SQL
    through DuckDB passthrough, reference query.py:153-167).

    r14: fixed-point money pipeline (block comment above ``_cents``),
    two-level because the flag/status groups are table-sized: scaled
    longs sum per (group, scan partition) — bounded by partition size —
    then the tiny per-partition partials re-sum in DECIMAL(38,0)."""
    li = load_sf_tables(spark, sf_dir)["lineitem"]
    part = (
        li.where(F.col("l_shipdate") <= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .selectExpr(
            "l_returnflag", "l_linestatus",
            "spark_partition_id() AS _pid",
            f"{_cents('l_quantity')} AS q2",
            f"{_cents('l_extendedprice')} AS p2",
            f"{_cents('l_discount', S)} AS d2",
            f"{_cents('l_tax', S)} AS t2",
        )
        .selectExpr(
            "l_returnflag", "l_linestatus", "_pid", "q2", "p2", "d2",
            "p2 * (100 - d2) AS dp4",
            "p2 * (100 - d2) * (100 + t2) AS ch6",
        )
        .groupBy("l_returnflag", "l_linestatus", "_pid")
        .agg(
            F.expr("SUM(q2) AS sq2"),
            F.expr("SUM(p2) AS sp2"),
            F.expr("SUM(dp4) AS sdp4"),
            F.expr("SUM(ch6) AS sch6"),
            F.expr("SUM(d2) AS sd2"),
            F.expr("COUNT(*) AS n"),
        )
    )
    return (
        part.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr("SUM(CAST(sq2 AS DECIMAL(38,0))) AS sq2"),
            F.expr("SUM(CAST(sp2 AS DECIMAL(38,0))) AS sp2"),
            F.expr("SUM(CAST(sdp4 AS DECIMAL(38,0))) AS sdp4"),
            F.expr("SUM(CAST(sch6 AS DECIMAL(38,0))) AS sch6"),
            F.expr("SUM(CAST(sd2 AS DECIMAL(38,0))) AS sd2"),
            F.expr("SUM(n) AS n"),
        )
        .selectExpr(
            "l_returnflag", "l_linestatus",
            f"{_unscale('sq2', 2)} AS sum_qty",
            f"{_unscale('sp2', 2)} AS sum_base_price",
            f"{_unscale('sdp4', 4)} AS sum_disc_price",
            f"{_unscale('sch6', 6)} AS sum_charge",
            f"{_unscale('sq2', 2)} / n AS avg_qty",
            f"{_unscale('sp2', 2)} / n AS avg_price",
            f"{_unscale('sd2', 2)} / n AS avg_disc",
            "n AS count_order",
        )
    )


@register(
    "revenue_by_nation_month",
    """
    SELECT n.n_name AS nation, r.r_name AS region,
           EXTRACT(YEAR FROM o.o_orderdate) AS order_year,
           EXTRACT(MONTH FROM o.o_orderdate) AS order_month,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           COUNT(DISTINCT o.o_orderkey) AS order_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name, r.r_name, order_year, order_month
    """,
    survey_ref="J1,A1,P1 (flagship)",
)
def revenue_by_nation_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship 5-way star join → revenue rollup.

    Scale shape: lineitem⋈orders shuffles on orderkey (both huge);
    customer arrives via AQE-chosen strategy; nation/region are
    explicit broadcasts so they never move the fact table.

    r14: the count(DISTINCT o_orderkey) ladder Spark planned anyway —
    aggregate by (group keys, o_orderkey) first, then by group keys —
    is written out explicitly so the first level can sum scaled LONGS
    (per-order groups hold ≤ 7 lineitems: no overflow at any scale)
    and the distinct count falls out as COUNT(*) of the per-order
    rows; the second level re-sums in DECIMAL(38,0). Same two
    exchanges, but the wide shuffle now carries one long per order
    instead of a Decimal128 buffer + flags.
    """
    t = load_sf_tables(spark, sf_dir)
    lo = F.col("o_orderdate")
    per_order = (
        t["lineitem"]
        .join(
            t["orders"].where(
                (lo >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                & (lo < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .selectExpr(
            "n_name AS nation",
            "r_name AS region",
            "year(o_orderdate) AS order_year",
            "month(o_orderdate) AS order_month",
            "o_orderkey",
            f"{_cents('l_extendedprice')} AS p2",
            f"{_cents('l_discount', S)} AS d2",
        )
        .selectExpr(
            "nation", "region", "order_year", "order_month",
            "o_orderkey", "p2 * (100 - d2) AS dp4",
        )
        .groupBy("nation", "region", "order_year", "order_month", "o_orderkey")
        .agg(F.expr("SUM(dp4) AS r4"))
    )
    return (
        per_order.groupBy("nation", "region", "order_year", "order_month")
        .agg(
            F.expr("SUM(CAST(r4 AS DECIMAL(38,0))) AS s4"),
            F.expr("COUNT(*) AS order_count"),
        )
        .selectExpr(
            "nation", "region", "order_year", "order_month",
            f"{_unscale('s4', 4)} AS revenue",
            "order_count",
        )
    )


@register(
    "shipping_priority",
    """
    SELECT l.l_orderkey AS l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           STRFTIME(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority AS o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    survey_ref="J1,A1,§2.7 top-K",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filtered 3-way join, grouped revenue, top-10 with a
    deterministic tie-break (LIMIT-with-ORDER-BY, reference §2.7).

    r14: fixed-point revenue (block comment above ``_cents``) —
    per-order groups hold ≤ 7 lineitems, so the scaled-long sum is
    exact at any scale; one decimal division + double cast at the
    end reproduces the oracle's value bit-for-bit."""
    t = load_sf_tables(spark, sf_dir)
    cut = F.lit("1996-03-15 00:00:00").cast("timestamp")
    return (
        t["customer"].where(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"].where(F.col("o_orderdate") < cut),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"].where(F.col("l_shipdate") > cut),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .selectExpr(
            "l_orderkey", "o_orderdate", "o_orderpriority",
            f"{_cents('l_extendedprice')} AS p2",
            f"{_cents('l_discount', S)} AS d2",
        )
        .selectExpr(
            "l_orderkey", "o_orderdate", "o_orderpriority",
            "p2 * (100 - d2) AS dp4",
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr("SUM(dp4) AS r4"))
        .selectExpr(
            "l_orderkey",
            f"{_unscale('r4', 4)} AS revenue",
            "date_format(o_orderdate, 'yyyy-MM-dd') AS o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "top_k_order_priorities",
    """
    SELECT o_orderpriority, COUNT(*) AS cnt
    FROM orders
    WHERE o_orderpriority IS NOT NULL
    GROUP BY o_orderpriority
    ORDER BY cnt DESC, o_orderpriority
    LIMIT 10
    """,
    survey_ref="A3",
)
def top_k_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K frequent values (reference profile top-K, catalog.py:1928-1934)."""
    t = load_sf_tables(spark, sf_dir)
    return (
        t["orders"]
        .where(F.col("o_orderpriority").isNotNull())
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "o_orderpriority")
        .limit(10)
    )


@register(
    "profile_orders",
    """
    SELECT COUNT(*) AS row_count,
           COUNT(*) - COUNT(o_custkey) AS o_custkey_nulls,
           COUNT(DISTINCT o_custkey) AS o_custkey_distinct,
           COUNT(*) - COUNT(o_totalprice) AS o_totalprice_nulls,
           COUNT(DISTINCT o_orderstatus) AS o_orderstatus_distinct,
           CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS o_totalprice_min,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS o_totalprice_max,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS o_totalprice_avg,
           STRFTIME(MIN(o_orderdate), '%Y-%m-%d') AS o_orderdate_min,
           STRFTIME(MAX(o_orderdate), '%Y-%m-%d') AS o_orderdate_max
    FROM orders
    """,
    survey_ref="A1,A2,A4",
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profile: null/distinct counts + numeric + date
    ranges (reference profile, catalog.py:1894-1942). One scan, one
    partial-aggregable job — at 100 TB this is a map-side-combine scan,
    not N per-column scans like the reference issues."""
    t = load_sf_tables(spark, sf_dir)
    tp = F.col("o_totalprice").cast(D)
    return t["orders"].agg(
        F.count("*").alias("row_count"),
        (F.count("*") - F.count("o_custkey")).alias("o_custkey_nulls"),
        F.countDistinct("o_custkey").alias("o_custkey_distinct"),
        (F.count("*") - F.count("o_totalprice")).alias("o_totalprice_nulls"),
        F.countDistinct("o_orderstatus").alias("o_orderstatus_distinct"),
        F.min(tp).cast("double").alias("o_totalprice_min"),
        F.max(tp).cast("double").alias("o_totalprice_max"),
        (F.sum(tp).cast("double") / F.count("o_totalprice")).alias("o_totalprice_avg"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate_min"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate_max"),
    )


@register(
    "daily_event_rollup",
    """
    SELECT STRFTIME(ts, '%Y-%m-%d') AS event_date, event_type,
           COUNT(*) AS events,
           COUNT(DISTINCT user_id) AS users,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_date, event_type
    """,
    survey_ref="A1,A4 (events table)",
)
def daily_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("event_date"), "event_type"
        )
        .agg(
            F.count("*").alias("events"),
            F.countDistinct("user_id").alias("users"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# Joins beyond inner (J4/J5 shapes)
# --------------------------------------------------------------------------

@register(
    "customers_without_orders",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    survey_ref="J4 (anti-join)",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference hand-rolls anti-joins as LEFT JOIN … IS NULL
    (catalog.py:1311-1319); Spark has a first-class left_anti that
    avoids materializing the null side."""
    t = load_sf_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "customers_with_orders_count",
    """
    SELECT COUNT(*) AS customers_with_orders
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    survey_ref="J5 (semi-join)",
)
def customers_with_orders_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    n = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .count()
    )
    return spark.createDataFrame([(n,)], "customers_with_orders bigint")


@register(
    "order_fulfillment_outer",
    """
    SELECT o.o_orderkey,
           COALESCE(s.line_count, 0) AS line_count,
           COALESCE(s.shipped_qty, 0.0) AS shipped_qty
    FROM orders o
    LEFT JOIN (
        SELECT l_orderkey, COUNT(*) AS line_count,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS shipped_qty
        FROM lineitem GROUP BY l_orderkey
    ) s ON o.o_orderkey = s.l_orderkey
    WHERE o.o_orderstatus = 'F'
    """,
    survey_ref="J1 (left outer), A1",
)
def order_fulfillment_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14: fixed-point shipped_qty (block comment above ``_cents``) —
    per-order groups are bounded, scaled-long sum exact at any scale."""
    t = load_sf_tables(spark, sf_dir)
    per_order = (
        t["lineitem"]
        .selectExpr("l_orderkey", f"{_cents('l_quantity')} AS q2")
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("line_count"),
            F.expr("SUM(q2) AS sq2"),
        )
        .selectExpr(
            "l_orderkey", "line_count",
            f"{_unscale('sq2', 2)} AS shipped_qty",
        )
    )
    return (
        t["orders"].where(F.col("o_orderstatus") == "F")
        .join(per_order, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        .select(
            "o_orderkey",
            F.coalesce("line_count", F.lit(0)).alias("line_count"),
            F.coalesce("shipped_qty", F.lit(0.0)).alias("shipped_qty"),
        )
    )


# --------------------------------------------------------------------------
# Set operations (SO1-SO4)
# --------------------------------------------------------------------------

@register(
    "except_diff_customers",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    """,
    survey_ref="SO1-SO3 (EXCEPT, distinct semantics)",
)
def except_diff_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT with set-distinct semantics — exactly what the reference's
    snapshot-diff/incremental/CDC ops do (catalog.py:349-356,
    incremental.py:225-227). ``exceptAll`` would NOT oracle-match."""
    t = load_sf_tables(spark, sf_dir)
    pos = t["customer"].where(F.col("c_acctbal") > 0).select("c_custkey")
    recent = (
        t["orders"]
        .where(F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return pos.distinct().exceptAll(recent.distinct())


@register(
    "union_high_value_parties",
    """
    SELECT c_name AS name, CAST(c_acctbal AS DOUBLE) AS acctbal, 'customer' AS kind
    FROM customer WHERE c_acctbal > 9000
    UNION ALL
    SELECT s_name AS name, CAST(s_acctbal AS DOUBLE) AS acctbal, 'supplier' AS kind
    FROM supplier WHERE s_acctbal > 9000
    """,
    survey_ref="SO4 (UNION ALL)",
)
def union_high_value_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    c = (
        t["customer"].where(F.col("c_acctbal") > 9000)
        .select(
            F.col("c_name").alias("name"),
            F.col("c_acctbal").cast("double").alias("acctbal"),
            F.lit("customer").alias("kind"),
        )
    )
    s = (
        t["supplier"].where(F.col("s_acctbal") > 9000)
        .select(
            F.col("s_name").alias("name"),
            F.col("s_acctbal").cast("double").alias("acctbal"),
            F.lit("supplier").alias("kind"),
        )
    )
    return c.unionByName(s)


# --------------------------------------------------------------------------
# Window functions (W1-W3)
# --------------------------------------------------------------------------

@register(
    "latest_event_per_user",
    """
    SELECT user_id, event_id AS latest_event_id, event_type AS latest_event_type
    FROM (
        SELECT user_id, event_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    survey_ref="W1 (dedup keep-one, deterministic ordering)",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-per-key via ROW_NUMBER. The reference's version has no
    ORDER BY (nondeterministic, dedup.py:148-160); we make the ordering
    total — the documented deviation in SURVEY §7."""
    t = load_sf_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("event_type").alias("latest_event_type"),
        )
    )


@register(
    "event_value_running_rank",
    """
    SELECT event_id, event_type, value,
           RANK() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS value_rank,
           LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
    FROM events
    WHERE value IS NOT NULL
    """,
    survey_ref="W-class extension (rank/lag beyond reference's ROW_NUMBER-only surface)",
)
def event_value_running_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    wr = Window.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t["events"]
        .where(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            "value",
            F.rank().over(wr).alias("value_rank"),
            F.lag("value").over(wl).alias("prev_value"),
        )
    )
