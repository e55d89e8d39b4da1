"""Range (interval) join — match point-in-time rows to validity
intervals. A custom operator Spark lacks natively (SURVEY §2 custom-op
strategy (a): composition of DataFrame ops, no UDFs).

Semantics: left row L joins right row R when
``R.start <= L.point < R.end`` and the optional equality keys match —
the SCD-2 / slowly-changing-dimension lookup, and DuckDB's
``JOIN ... ON point >= start AND point < end`` shape.

Scale path: a plain key-join + filter explodes per-key pairs (every
point × every interval of that key); a BroadcastNestedLoopJoin on pure
range predicates is O(n·m). Instead, time is quantized into fixed-width
buckets: each interval REPLICATES into every bucket it overlaps
(explode over a bucket sequence), each point lands in exactly ONE
bucket, and the join is bucket-equality (hash shuffle) + exact range
filter. Every candidate pair appears exactly once — no dedup pass.
Replication factor = interval_span / bucket_width, so pick
``bucket_width`` near the typical interval span: candidates stay
near-linear at 100 TB instead of per-key-quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bucket_width_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Bucket-equality range join. ``on`` adds equality keys alongside
    the range predicate. ``how``: inner or left (left keeps unmatched
    points with NULL right columns)."""
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left only (got {how!r})")
    overlap = set(left.columns) & set(right.columns) - set(on or [])
    if overlap:
        raise ValueError(f"ambiguous columns, rename first: {sorted(overlap)}")

    w = F.lit(bucket_width_seconds)
    point_b = (F.col(point_col).cast("long") / w).cast("long")
    start_b = (F.col(start_col).cast("long") / w).cast("long")
    # Replicate through the bucket holding ``end`` itself: cast('long')
    # truncates fractional seconds, so an end like 3600.4s must still
    # occupy bucket(3600) — the exact range filter removes the at-most-one
    # spurious bucket an integer-aligned (exclusive) end contributes.
    # This also keeps sequence() ascending for empty intervals (end==start).
    end_b = (F.col(end_col).cast("long") / w).cast("long")

    l_b = left.withColumn("_rb", point_b)
    r_b = right.withColumn("_rb", F.explode(F.sequence(start_b, end_b)))

    keys = [*(on or []), "_rb"]
    cond = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) < F.col(end_col)
    )
    if how == "inner":
        return l_b.join(r_b, keys).where(cond).drop("_rb")
    # left outer: fold the exact range predicate INTO the join condition —
    # each point lands in exactly one bucket, so a plain left join emits
    # unmatched points once with NULL right columns. (The earlier
    # anti-join-on-all-left-columns rebuild was null-unsafe: a matched
    # left row holding any NULL also re-emitted as unmatched.)
    rename = {c: f"_r_{c}" for c in keys}
    r_r = r_b
    for c, rc in rename.items():
        r_r = r_r.withColumnRenamed(c, rc)
    jc = cond & (F.col("_rb") == F.col(rename["_rb"]))
    for c in on or []:
        jc = jc & (F.col(c) == F.col(rename[c]))
    return l_b.join(r_r, jc, "left").drop("_rb", *rename.values())
