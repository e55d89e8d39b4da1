"""Streaming operators for the events stream.

The reference has no true streaming (SURVEY §1.1: "incremental" =
snapshot-diff batch pulls); this module is the Spark-native extension
flagged in SURVEY §7 Phase 5: file-source readStream → watermarked
windowed aggregation / dedup → sink.

Tests drive it with trigger(availableNow=True) against a parquet dir —
the same topology a Kafka source would feed at production scale. State
stores are bounded by the watermark; window+watermark is the canonical
late-data-tolerant rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream: new parquet files in source_dir are new
    micro-batches (swap for Kafka in production — topology unchanged)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )


def windowed_event_counts(
    stream: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data watermark.
    State is purged past the watermark — bounded memory at any scale."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("events"),
            F.sum("value").alias("total_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "events",
            "total_value",
            "approx_users",
        )
    )


def deduped_stream(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Exactly-once-per-event_id within the watermark horizon."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def run_to_memory_sink(
    result: DataFrame, query_name: str, output_mode: str = "append"
) -> "object":
    """Drain all available input into an in-memory table (test/dev sink);
    returns the finished StreamingQuery."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_events_to_table(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    target_dir: str,
    window: str = "5 minutes",
) -> "object":
    """End-to-end: stream → windowed rollup → parquet sink with
    checkpointing (restart-safe exactly-once file sink)."""
    stream = read_event_stream(spark, source_dir)
    rollup = windowed_event_counts(stream, window=window)
    q = (
        rollup.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def session_window_rollup(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Per-user session aggregation with a dynamic-gap session window —
    the streaming counterpart of operators.asof.sessionize. State for a
    session closes (and emits) once the watermark passes its gap, so
    memory stays bounded by open sessions, not history."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(
            F.count("*").alias("events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "events",
            "total_value",
        )
    )


def correlate_event_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-STREAM interval join — the attribution query (view →
    purchase within N minutes, impression → click, …) as Spark's
    canonical watermarked stream-stream join: equality on the
    key plus a time-bound range condition. Both sides carry a
    watermark, so the join state store holds only rows newer than
    (watermark + interval) — bounded memory at any scale; without the
    time bound Spark would rightly refuse to run it unbounded.

    ``how='inner'`` (default) returns one row per (left event, right
    event within [left.ts, left.ts + within]): key, both event types,
    both timestamps, and the lag in seconds. ``how='left_outer'`` is
    the attribution-LOSS report (VERDICT r6 #7): a left event with NO
    matching right event inside its interval emits once — right
    columns NULL — but only after the watermark passes the interval's
    end, when the state store can PROVE no match is coming and evicts
    the row. Until the watermark advances that far, unmatched rows
    stay pending in state (exactly-once, no premature emission).
    Column names assume the events schema (event_id/ts/event_type)."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner or left_outer (got {how!r})")
    if key not in left.columns or key not in right.columns:
        # key arrives free-form via MCP tool args: fail with a clean
        # "column not found" instead of interpolating an arbitrary
        # string into the join-condition SQL (ADVICE r6)
        raise ValueError(
            f"join key {key!r} not present in both streams "
            f"(left: {left.columns}, right: {right.columns})"
        )
    q = "`" + key.replace("`", "``") + "`"
    lw = left.withWatermark("ts", watermark).alias("l")
    rw = right.withWatermark("ts", watermark).alias("r")
    cond = F.expr(
        f"l.{q} = r.{q} AND r.ts >= l.ts "
        f"AND r.ts <= l.ts + INTERVAL {within}"
    )
    return lw.join(rw, cond, how).select(
        F.col(f"l.{key}").alias(key),
        F.col("l.event_id").alias("left_event_id"),
        F.col("l.event_type").alias("left_type"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.event_id").alias("right_event_id"),
        F.col("r.event_type").alias("right_type"),
        F.col("r.ts").alias("right_ts"),
        (F.unix_timestamp("r.ts") - F.unix_timestamp("l.ts")).alias(
            "lag_seconds"
        ),
    )
