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
    ``{right_ts}{suffix}``)."""
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


def sessionize(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap from
    the previous event exceeds ``gap_minutes``. Classic two-window
    formulation (lag → boundary flag → running sum = session id); one
    shuffle on the user key."""
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
