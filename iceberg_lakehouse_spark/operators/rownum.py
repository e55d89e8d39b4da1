"""Scale-safe global row numbering (two-pass partition-offset scheme).

A global ``ROW_NUMBER() OVER (ORDER BY ...)`` compiles to
``Exchange SinglePartition`` + one sorting task — the whole table
funnels through a single thread, the classic 100 TB scale-killer
(Spark itself warns ``WindowExec: No Partition Defined``). The
standard distributed alternative is two passes:

1. assign every row a *bucket* that coarsely respects the target
   ordering (all rows of bucket i sort before all rows of bucket j
   for i < j);
2. count rows per bucket (tiny aggregate, one value per bucket);
3. turn counts into cumulative start offsets on the driver;
4. number rows *within* each bucket with an ordinary partitioned
   window and add the bucket's offset.

Output is bit-identical to the global window as long as the bucket is
a **pure deterministic function of the row** that is monotone w.r.t.
the ordering — purity makes the count pass and the numbering pass
agree without caching (both recompute the same bucket from data),
monotonicity makes per-bucket numbering + offsets equal the global
rank. The per-bucket window shuffles on the bucket key, so work
spreads across the cluster instead of one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKET = "_grn_bucket"

# 2^33: monotonically_increasing_id() = (partition_id << 33) | row_pos
_MID_SHIFT = 33
_MID_MASK = (1 << _MID_SHIFT) - 1


def with_global_row_number(
    df: DataFrame,
    bucket: Column,
    order_by: list[Column | str],
    out_col: str = "_rn",
) -> DataFrame:
    """Add 1-based ``out_col`` = global ``row_number()`` under
    ``order_by``, without a single-partition sort.

    ``bucket`` must be a deterministic pure function of the row whose
    natural (Python ``sorted``) order is monotone w.r.t. ``order_by``
    — e.g. a range bucket of the leading sort key, or the integer
    value of an md5 prefix when ordering by the md5 string.

    A NULL bucket (NULL sort key) maps to bucket -1: ascending sorts
    place NULLs first, and -1 precedes every real bucket, so NULL-key
    rows are numbered first instead of silently dropping out (the old
    global window included them nulls-first).
    """
    b = df.withColumn(_BUCKET, F.coalesce(bucket, F.lit(-1)))
    counts = {
        r[_BUCKET]: r["cnt"]
        for r in b.groupBy(_BUCKET).agg(F.count("*").alias("cnt")).collect()
    }
    if not counts:  # empty input — keep schema, no rows to number
        return df.withColumn(out_col, F.lit(None).cast("long"))
    offsets, acc = {}, 0
    for k in sorted(counts):
        offsets[k] = acc
        acc += counts[k]
    # bucket → start offset as a literal map: map_size == bucket count
    # (bounded, typically ≤ a few hundred), evaluated map-side
    off = F.create_map(
        *[lit for k, v in offsets.items() for lit in (F.lit(k), F.lit(v))]
    )
    w = Window.partitionBy(_BUCKET).orderBy(*order_by)
    return (
        b.withColumn(
            out_col, F.row_number().over(w).cast("long") + off[F.col(_BUCKET)]
        )
        .drop(_BUCKET)
    )


def range_bucket(col: Column, mn, mx, n: int = 256) -> Column:
    """Equal-width range bucket of a numeric key → [0, n): monotone in
    ``col`` (double rounding is order-preserving), deterministic, and
    cheap. ``mn``/``mx`` come from a one-row min/max aggregate."""
    if mn is None or mx is None or mx <= mn:
        return F.lit(0)
    span = float(mx) - float(mn) + 1.0
    raw = F.floor((col.cast("double") - float(mn)) * float(n) / span)
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("int")


def md5_prefix_bucket(h: Column) -> Column:
    """Bucket for rows ordered by an md5 hex string: the first two hex
    chars as an int (256 buckets). Hex digits are ASCII-ordered, so
    lexicographic order of the full string equals (prefix value,
    remainder) — the bucket is monotone w.r.t. the string ordering and
    uniform by construction."""
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


def with_insertion_rowid(df: DataFrame, out_col: str = "rowid") -> DataFrame:
    """Add 0-based ``out_col`` = position in insertion (scan) order,
    with NO window and NO data shuffle: decompose
    ``monotonically_increasing_id()`` into (partition, local position),
    aggregate per-partition counts (one tiny job), and map each row to
    ``offset[partition] + position``.

    Assumes the scan splits identically between the count job and the
    numbering job — true for deterministic sources (files, local
    collections); the same assumption every ``monotonically_increasing_
    id`` consumer already makes across re-evaluation."""
    d = df.withColumn("_mid", F.monotonically_increasing_id())
    counts = {
        r["pid"]: r["cnt"]
        for r in d.groupBy(
            F.shiftright("_mid", _MID_SHIFT).alias("pid")
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    if not counts:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.create_map(
        *[lit for k, v in offsets.items() for lit in (F.lit(k), F.lit(v))]
    )
    pid = F.shiftright("_mid", _MID_SHIFT)
    pos = F.col("_mid").bitwiseAND(F.lit(_MID_MASK))
    return d.withColumn(out_col, (off[pid] + pos).cast("long")).drop("_mid")
