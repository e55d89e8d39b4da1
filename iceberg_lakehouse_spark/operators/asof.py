"""As-of (temporal) join — a custom operator Spark lacks natively,
built as a composition of existing DataFrame ops (the SURVEY §2
"custom operators" strategy (a): composition before UDFs).

Semantics (matching DuckDB/QuestDB ASOF JOIN LEFT): for each left row,
attach the most recent right row with right.ts <= left.ts (per key),
or NULLs if none.

Algorithm (scale-first): tag both sides, union on (key, ts), then a
single window pass ordered by (ts, side-priority) computing
last_value(right payload) with ignoreNulls — one shuffle on the key,
no range-join explosion, skew bounded by per-key traffic. This is the
standard log-merge formulation; at 100 TB it beats a range join
because each row is touched once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join. ``on`` is the equality key; payload columns from
    the right side arrive suffixed (plus the matched right timestamp as
    ``{right_ts}{suffix}``).

    Skew bound: the merge window partitions by the key, so per-task
    work is bounded by the hottest key's row count (the window sort is
    spill-backed — a hot key degrades to disk sort, not OOM). For
    power-law keys use ``as_of_join_bucketed``, which splits each key
    across time buckets."""
    payload = right_payload or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    lcols = left.columns

    # The right payload travels as ONE struct so the fill is row-atomic:
    # filling columns independently would mix values from different right
    # rows whenever the matched row holds a NULL payload value (DuckDB
    # ASOF returns the matched row's NULL, not an older row's value).
    r_struct_type = (
        "struct<"
        + ",".join(
            [f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload]
            + [f"__ts:{right.schema[right_ts].dataType.simpleString()}"]
        )
        + ">"
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
        F.struct(
            *[F.col(c) for c in payload], F.col(right_ts).alias("__ts")
        ).alias("_r"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right rows sort before left rows at equal ts (_side 0 < 1) so an
    # exact-timestamp right row is visible to the left row
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_f")
    )
    return filled.where(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col(f"_f.{c}").alias(f"{c}{suffix}") for c in payload],
        F.col("_f.__ts").alias(f"{right_ts}{suffix}"),
    )


def as_of_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    suffix: str = "_right",
    bucket_width_seconds: int = 3600,
) -> DataFrame:
    """Skew-resistant as-of join: same semantics as ``as_of_join`` but
    the merge window partitions by (key, time-bucket) instead of key
    alone, so a power-law key (one user = 30% of events) spreads over
    ``ceil(key_span / bucket_width)`` tasks instead of concentrating in
    one (VERDICT r4 #7 — the time dimension is the natural salt for
    temporal joins; hash salting would break per-key ordering).

    Algorithm (three bounded steps):

    1. per (key, bucket): the LAST right row in the bucket — an
       ordinary aggregate (max_by), map-side combinable;
    2. per key: a *carry* per bucket = the latest right row from any
       EARLIER bucket, via last-value-ignore-nulls over the per-bucket
       aggregates. This window is per-key like the plain formulation,
       but its input is one row per (key, bucket) — bounded by the time
       span over the bucket width, not by event count;
    3. the plain log-merge window, now partitioned by (key, bucket),
       with each bucket's carry injected as one pseudo right row so
       left rows before the bucket's first right row still match.

    Tie caveat: when a key has several right rows at the SAME
    timestamp, the carried representative is chosen by max_by and may
    differ from the plain variant's sort-order pick (both are
    arbitrary); with unique (key, right_ts) the two operators are
    bit-identical."""
    payload = right_payload or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    lcols = left.columns
    width = float(bucket_width_seconds)
    r_struct_type = (
        "struct<"
        + ",".join(
            [f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload]
            + [f"__ts:{right.schema[right_ts].dataType.simpleString()}"]
        )
        + ">"
    )

    def _bucket(ts_col: str) -> F.Column:
        return F.floor(F.col(ts_col).cast("double") / width).cast("long")

    r_struct = F.struct(
        *[F.col(c) for c in payload], F.col(right_ts).alias("__ts")
    )
    # step 1: last right row per (key, bucket) — max_by on the ts
    per_bucket = (
        right.groupBy(F.col(on).alias("_k"), _bucket(right_ts).alias("_bk"))
        .agg(F.max_by(r_struct, F.col(right_ts)).alias("_last"))
    )
    # step 2: carry = latest right row from strictly earlier buckets,
    # computed over the per-bucket axis (left buckets ∪ right buckets)
    lb = left.select(
        F.col(on).alias("_k"), _bucket(left_ts).alias("_bk")
    ).distinct().withColumn("_has_left", F.lit(True))
    axis = lb.join(per_bucket, ["_k", "_bk"], "full")
    carry_w = (
        Window.partitionBy("_k")
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = (
        axis.withColumn("_carry", F.last("_last", ignorenulls=True).over(carry_w))
        .where(F.col("_has_left") & F.col("_carry").isNotNull())
        .select("_k", "_bk", "_carry")
    )
    # step 3: plain log-merge within (key, bucket) + injected carry row
    l_tagged = left.select(
        F.col(on).alias("_k"),
        _bucket(left_ts).alias("_bk"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    nulls_l = [
        F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols
    ]
    r_tagged = right.select(
        F.col(on).alias("_k"),
        _bucket(right_ts).alias("_bk"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *nulls_l,
        r_struct.cast(r_struct_type).alias("_r"),
    )
    carry_rows = carries.select(
        "_k",
        "_bk",
        F.col("_carry.__ts").alias("_ts"),  # earlier bucket ⇒ sorts first
        F.lit(0).alias("_side"),
        *nulls_l,
        F.col("_carry").cast(r_struct_type).alias("_r"),
    )
    unioned = l_tagged.unionByName(r_tagged).unionByName(carry_rows)
    w = (
        Window.partitionBy("_k", "_bk")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_f")
    )
    return filled.where(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col(f"_f.{c}").alias(f"{c}{suffix}") for c in payload],
        F.col("_f.__ts").alias(f"{right_ts}{suffix}"),
    )


def sessionize(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap from
    the previous event exceeds ``gap_minutes``. Classic two-window
    formulation (lag → boundary flag → running sum = session id); one
    shuffle on the user key.

    Skew bound (documented, gated by tests/test_skew_stateful.py):
    every session id depends on the running boundary count of ALL the
    user's earlier events, so the user key is the minimal partitioning
    unit — time-chunking would need a cross-chunk boundary merge that
    reintroduces the same per-key sequential pass. Per-task work is
    therefore bounded by the hottest user's event count; the window
    sort spills to disk, so a power-law user degrades to a disk-backed
    sort on one task, never an OOM. The partitioning is always
    hash(user) — never a single-partition global window."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_s = gap_minutes * 60
    boundary = (
        F.when(F.lag(ts_col).over(w).isNull(), 1)
        .when(
            F.col(ts_col).cast("double") - F.lag(ts_col).over(w).cast("double")
            > gap_s,
            1,
        )
        .otherwise(0)
    )
    with_bounds = events.withColumn("_new_session", boundary)
    return with_bounds.withColumn(
        "session_seq", F.sum("_new_session").over(w)
    ).drop("_new_session")
