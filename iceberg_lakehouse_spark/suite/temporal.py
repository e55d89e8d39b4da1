"""Temporal operators: as-of join and sessionization — custom operators
composed from DataFrame primitives (no UDFs), oracle-checked against
DuckDB's native ASOF JOIN and the identical window SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.asof import as_of_join, sessionize
from ..session import load_sf_tables
from . import register


@register(
    "asof_join_purchase_view",
    """
    WITH purchases AS (
        SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
    ),
    views AS (
        -- dedupe equal (user, ts) so the as-of pick is total-ordered
        SELECT user_id, ts, MAX(value) AS view_value
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, ts
    )
    SELECT p.event_id,
           p.user_id,
           CAST(p.value AS DOUBLE) AS purchase_value,
           v.view_value AS view_value,
           STRFTIME(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    survey_ref="custom operator: as-of join (log-merge composition)",
)
def asof_join_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase gets the user's most recent prior (or simultaneous)
    view — the canonical as-of join, verified against DuckDB's native
    ASOF JOIN while our implementation is a single-shuffle window
    composition (operators/asof.py)."""
    ev = load_sf_tables(spark, sf_dir)["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    joined = as_of_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["view_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("value").cast("double").alias("purchase_value"),
        F.col("view_value_right").alias("view_value"),
        F.date_format("ts_right", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("view_ts"),
    )


@register(
    "user_sessionization",
    """
    WITH seq AS (
        SELECT user_id, event_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                    WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > 30 * 60 * 1000 THEN 1
                    ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, event_id, ts,
               -- CAST: DuckDB SUM(INTEGER) yields HUGEINT, which the driver's
               -- comparator renders differently from Spark's BIGINT (r2: the
               -- one hash mismatch). BIGINT both sides.
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM seq
    )
    SELECT user_id, session_seq,
           COUNT(*) AS session_events,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end
    FROM sessions
    GROUP BY user_id, session_seq
    """,
    survey_ref="custom operator: gap-based sessionization",
)
def user_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user, rolled up to session spans."""
    from pyspark.sql import Window

    ev = load_sf_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    boundary = (
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(
            F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))
            > 30 * 60 * 1000,
            1,
        )
        .otherwise(0)
    )
    sessions = ev.withColumn("new_session", boundary).withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("session_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
    )
