"""Skew mitigation utilities — salting for hot keys (the explicit
scale lever when AQE's skew-join splitting isn't enough, e.g. a single
key holding >1 partition's worth of rows in an aggregation).

Two patterns:

  * salted_aggregate: two-phase aggregation — group on (key, salt)
    first (spreads one hot key over `salts` reducers), then re-group on
    key to merge partials. Works for any algebraic aggregate.
  * salted_join: replicate the small side `salts` times (one copy per
    salt value) and salt the big side's key — the hot key's rows spread
    across `salts` tasks instead of one straggler.

AQE (enabled in session.py) handles moderate skew automatically; these
are for pathological keys known in advance.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def with_salt(df: DataFrame, salts: int, col_name: str = "_salt") -> DataFrame:
    """Uniform random salt in [0, salts). Uses rand() — the salt only
    routes rows, it never affects results, so nondeterminism is safe."""
    return df.withColumn(col_name, (F.rand() * salts).cast("int"))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salts: int = 8,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: {column: fn} with fn in sum|count|min|max. (avg is
    sum+count composed by the caller — partials must be algebraic.)
    """
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for fn in aggs.values():
        if fn not in fns:
            raise ValueError(f"unsupported aggregate {fn!r} (algebraic only)")
    salted = with_salt(df, salts)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[fns[fn](c).alias(f"{c}_{fn}") for c, fn in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge[fn](f"{c}_{fn}").alias(f"{c}_{fn}") for c, fn in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: big side salted, small side replicated
    `salts`× (explode over the salt range), join on (key, salt).
    Output columns = big ∪ small minus the helper columns.

    Only ``inner`` and ``left`` are valid: the small side is replicated
    ``salts``×, so right/full outer would emit each unmatched small-side
    row once per salt copy."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left only (got {how!r}): the "
            "replicated small side would duplicate unmatched rows under "
            "right/full outer joins"
        )
    big_s = with_salt(big, salts)
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    joined = big_s.join(small_r, [on, "_salt"], how)
    return joined.drop("_salt")
