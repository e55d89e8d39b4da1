"""Sampling → table materialization + sample statistics (SURVEY SA4/
SA5, reference sampling.py:181-308). The suite's oracle-paired sampling
queries (SA1-SA3) live in suite/sampling.py; this is the stateful side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import LakehouseCatalog, LakeTable


def sample_to_table(
    catalog: LakehouseCatalog,
    source: str,
    target: str,
    fraction: float = 0.1,
    seed: int = 42,
    method: str = "bernoulli",
    stratify_by: str | None = None,
) -> dict:
    """Materialize a sample as a new table.

    methods: bernoulli (df.sample), systematic (every ⌈1/fraction⌉-th by
    a hash ordering), stratified (≥1 row per stratum, window formulation
    — `sampleBy` can't guarantee that, SURVEY §7)."""
    src = catalog.load_table(source)
    df = src.scan()
    if method == "bernoulli":
        sample = df.sample(fraction=fraction, seed=seed)
    elif method == "systematic":
        from .rownum import md5_prefix_bucket, with_global_row_number

        n = max(1, round(1.0 / fraction))
        # every n-th row of the md5-hash ordering — the global rank
        # comes from two-pass partition-offset numbering (md5-prefix
        # buckets), not a single-partition window sort
        h = df.withColumn("_h", F.md5(F.concat_ws("|", *df.columns)))
        sample = (
            with_global_row_number(
                h, md5_prefix_bucket(F.col("_h")), ["_h"], out_col="_rn"
            )
            .where((F.col("_rn") - 1) % n == 0)
            .drop("_rn", "_h")
        )
    elif method == "stratified":
        if not stratify_by:
            raise ValueError("stratified sampling requires stratify_by")
        from pyspark.sql import Window

        w = Window.partitionBy(stratify_by).orderBy(
            F.md5(F.concat_ws("|", *df.columns))
        )
        wc = Window.partitionBy(stratify_by)
        sample = (
            df.withColumn("_rn", F.row_number().over(w))
            .withColumn("_n", F.count("*").over(wc))
            .where(
                F.col("_rn")
                <= F.greatest(F.lit(1), F.ceil(F.col("_n") * fraction).cast("bigint"))
            )
            .drop("_rn", "_n")
        )
    else:
        raise ValueError(f"unknown method {method!r}")

    t = catalog.create_table(target, src.schema())
    t.append(sample)
    rows = t.scan().count()
    return {
        "target": target,
        "sample_table": f"{t.namespace}.{t.table}",
        "rows": rows,
        "rows_sampled": rows,
        "method": method,
        "fraction": fraction,
    }


def random_sample(
    table: LakeTable, fraction: float, seed: int = 42,
    limit: int | None = None, max_rows: int = 10_000,
) -> dict:
    """Reference sample_table(method=random): Bernoulli sample with
    reproducible seed; rows capped at max_rows in the payload."""
    df = table.scan()
    total = df.count()
    sample = df.sample(fraction=min(fraction, 1.0), seed=seed)
    if fraction >= 1.0:
        sample = df
    if limit is not None:
        sample = sample.limit(limit)
    n = sample.count()
    return {
        "table": f"{table.namespace}.{table.table}",
        "method": "random",
        "fraction": fraction,
        "total_rows": total,
        "sample_size": n,
        "rows": [r.asDict(recursive=True) for r in sample.limit(max_rows).collect()],
    }


def stratified_sample(
    table: LakeTable, column: str, fraction: float, max_rows: int = 10_000
) -> dict:
    """Reference stratified sampling: >=1 row per stratum, with a
    per-stratum sampled/total report."""
    from pyspark.sql import Window

    df = table.scan()
    if df.isEmpty():
        return {
            "table": f"{table.namespace}.{table.table}", "method": "stratified",
            "column": column, "total_rows": 0, "sample_size": 0,
            "strata": {}, "rows": [],
        }
    w = Window.partitionBy(column).orderBy(F.md5(F.concat_ws("|", *df.columns)))
    wc = Window.partitionBy(column)
    sample = (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wc))
        .where(
            F.col("_rn")
            <= F.greatest(F.lit(1), F.ceil(F.col("_n") * fraction).cast("bigint"))
        )
        .drop("_rn", "_n")
    )
    totals = {r[column]: r["n"] for r in
              df.groupBy(column).agg(F.count("*").alias("n")).collect()}
    sampled = {r[column]: r["n"] for r in
               sample.groupBy(column).agg(F.count("*").alias("n")).collect()}
    return {
        "table": f"{table.namespace}.{table.table}",
        "method": "stratified",
        "column": column,
        "total_rows": sum(totals.values()),
        "sample_size": sum(sampled.values()),
        "strata": {
            k: {"total": totals[k], "sampled": sampled.get(k, 0)}
            for k in totals
        },
        "rows": [r.asDict(recursive=True) for r in sample.limit(max_rows).collect()],
    }


def systematic_sample(table: LakeTable, interval: int, max_rows: int = 10_000) -> dict:
    """Reference systematic sampling: every interval-th row of a
    deterministic hash ordering (two-pass global numbering — no
    single-partition window sort)."""
    from .rownum import md5_prefix_bucket, with_global_row_number

    df = table.scan()
    total = df.count()
    h = df.withColumn("_h", F.md5(F.concat_ws("|", *df.columns)))
    sample = (
        with_global_row_number(h, md5_prefix_bucket(F.col("_h")), ["_h"],
                               out_col="_rn")
        .where((F.col("_rn") - 1) % interval == 0)
        .drop("_rn", "_h")
    )
    n = sample.count()
    return {
        "table": f"{table.namespace}.{table.table}",
        "method": "systematic",
        "interval": interval,
        "total_rows": total,
        "sample_size": n,
        "rows": [r.asDict(recursive=True) for r in sample.limit(max_rows).collect()],
    }


def sample_stats(full: DataFrame, sample: DataFrame) -> dict:
    """SA5: coverage % + per-numeric-column full-vs-sample comparison."""
    from pyspark.sql import types as T

    full_n, samp_n = full.count(), sample.count()
    numeric = [
        f.name
        for f in full.schema.fields
        if isinstance(f.dataType, (T.LongType, T.IntegerType, T.DoubleType, T.FloatType))
    ]
    coverage = round(100.0 * samp_n / full_n, 2) if full_n else 0.0
    out = {
        "full_rows": full_n,
        "sample_rows": samp_n,
        "coverage_pct": coverage,
        "coverage": coverage,
        "columns": {},
    }
    if numeric and samp_n:
        fa = full.agg(
            *[F.avg(c).alias(f"{c}__avg") for c in numeric],
            *[F.stddev(c).alias(f"{c}__std") for c in numeric],
        ).collect()[0]
        sa = sample.agg(
            *[F.avg(c).alias(f"{c}__avg") for c in numeric],
            *[F.stddev(c).alias(f"{c}__std") for c in numeric],
        ).collect()[0]
        for c in numeric:
            out["columns"][c] = {
                "full_avg": fa[f"{c}__avg"],
                "sample_avg": sa[f"{c}__avg"],
                "full_stddev": fa[f"{c}__std"],
                "sample_stddev": sa[f"{c}__std"],
            }
    out["column_comparison"] = out["columns"]
    return out


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int = 7,
    n_shards: int = 8,
) -> DataFrame:
    """Reproducible global shuffle for training-epoch ordering.

    Every row gets a ``shard`` in ``[0, n_shards)`` and a dense
    1-based ``pos`` within its shard; reading shards in order (and
    rows by ``pos`` within each) replays one fixed pseudorandom
    permutation of the corpus — the same permutation on any cluster,
    any partitioning, any Spark version, because both coordinates
    derive only from ``md5(seed:id)``:

      * ``shard = hash16 mod n_shards`` — an EXPLICIT modulo, not
        ``repartitionByRange``'s sampled boundaries, so the shard
        assignment is data-independent and cross-run stable;
      * ``pos = row_number over (partition by shard order by
        hash-hex, id)`` — per-shard windows run in parallel (one
        shuffle keyed on the shard), nothing ever sees a global sort.

    The scale contract: each shard is numbered by ONE window task, so
    ``n_shards`` is the parallelism unit and must scale with the
    corpus — size it so one shard ≈ one training file (hundreds of MB
    to a few GB: ``corpus_bytes / target_file_bytes``), exactly the
    granularity a training loader wants anyway.  At 100 TB that is
    O(100k) shards → O(100k) parallel window tasks of a few hundred
    MB each, one shuffle total; the default of 8 is a small-data
    convenience, NOT a 100 TB setting.  Skew-free by construction
    (md5 is uniform).  Deleting/adding rows changes only positions in
    the affected shards — re-shuffling an epoch is one job, no global
    state.
    """
    from pyspark.sql import Window

    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col)))
    shard = (
        F.conv(F.substring(key, 1, 4), 16, 10).cast("long") % n_shards
    ).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_shuffle_key"), F.col(id_col))
    )
    return (
        df.withColumn("_shuffle_key", key)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w))
        .drop("_shuffle_key")
    )


def shuffle_to_table(
    catalog: LakehouseCatalog,
    source: str,
    target: str,
    id_col: str,
    seed: int = 7,
    n_shards: int = 8,
) -> dict:
    """Materialize a deterministic epoch shuffle: the shuffled rows
    land partitioned by ``shard`` — ONE pos-sorted file per shard —
    so a training loader reads the permutation with zero further
    sorting.

    The file layout needs ``write.distribution.mode=hash`` WITH the
    sort order: the hash branch clusters each shard into one task and
    sorts (shard, pos) within it, so the written file is genuinely
    pos-ordered.  Sort-order alone would range-shuffle on ``pos``
    (each task holding a pos-slice of EVERY shard) and leave the
    in-file order to the file writer's own partition sort — the
    pos-sorted promise would silently not hold (r14 review).  One
    task per shard is the same sizing contract as the numbering
    window: ``n_shards`` scales with the corpus so a shard is one
    training-file-sized unit."""
    src = catalog.load_table(source)
    shuffled = deterministic_shuffle(src.scan(), id_col, seed, n_shards)
    t = catalog.create_table(
        target,
        shuffled.schema,
        partition_by=["shard"],
        properties={"write.sort.order": "pos",
                    "write.distribution.mode": "hash"},
    )
    t.append(shuffled)
    return {
        "source": source,
        "target": target,
        "seed": seed,
        "n_shards": n_shards,
        "rows": t.scan().count(),
    }
