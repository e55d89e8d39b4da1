"""SparkSession factory.

One place to encode the scale posture: AQE on (runtime re-planning,
skew-join splitting, coalesced shuffle partitions), Arrow transfer for
the pandas boundary, UTC session time so timestamp semantics match the
DuckDB correctness oracle, and shuffle parallelism sized to the test
host (a real deployment overrides via ``extra_conf``).

The reference builds a DuckDB connection per QueryEngine
(reference query.py:26-43); our analogue is one shared SparkSession.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # Runtime adaptivity: re-plan post-shuffle, split skewed partitions,
    # coalesce tiny ones. This is the main 100-TB insurance policy.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Broadcast small dimension tables (region/nation/customer class).
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    # Arrow for any toPandas()/createDataFrame(pandas) edge and Pandas UDFs.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Naive-UTC timestamps to match the DuckDB oracle (SURVEY §1.2:
    # reference timestamps are microsecond, timezone-naive).
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # ANSI off: the reference (DuckDB-permissive casts) never raises on
    # overflow; keep permissive eval so CASE/cast semantics line up.
    "spark.sql.ansi.enabled": "false",
    "spark.sql.shuffle.partitions": "32",
    # The driver's synthetic parquet stamps TIMESTAMP(NANOS); Spark has no
    # nanos timestamp type — read as long and convert (see load_sf_tables).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Local parquet is small-file-heavy at test SF; don't over-split.
    "spark.sql.files.maxPartitionBytes": "128m",
    # local-mode driver == the whole JVM (all 32 executor threads share
    # this heap). 8g survived the graded sf0.01 suite but died ~135
    # queries into a full-registry sf0.1 session (GC death spiral →
    # connection refused); 16g leaves headroom for three parallel test
    # JVMs on the 128 GiB host.
    "spark.driver.memory": "16g",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "iceberg_lakehouse_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session. ``SPARK_GRAFT_CPUS`` sizes local mode."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


# (session id, sf_dir, per-file (mtime, size)) → (session weakref,
# name → DataFrame). DataFrames are lazy plans, safely reusable across
# queries in a session; rebuilding them costs a py4j + footer-inference
# round-trip PER TABLE (~0.1 s × 10 tables), which every suite query
# used to pay.
_SF_CACHE: dict[tuple, tuple] = {}


def load_sf_tables(spark: SparkSession, sf_dir: str) -> dict[str, object]:
    """Register every test parquet table as a temp view; return name → DataFrame.

    Mirrors the reference's register-all-tables idiom (reference
    query.py:52-75) — but lazily: Spark defers the scan, so predicate
    pushdown / column pruning reach the parquet reader, unlike the
    reference's eager full materialization. Memoized per (session,
    dir, file mtimes): repeat calls skip schema inference and only
    re-bind the temp views.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    names = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    paths = [os.path.join(sf_dir, f"{n}.parquet") for n in names]
    stamp = []
    for p in paths:
        try:
            st = os.stat(p)
            stamp.append((st.st_mtime_ns, st.st_size))
        except OSError:
            stamp.append(None)
    import weakref

    key = (id(spark), os.path.realpath(sf_dir), tuple(stamp))
    hit = _SF_CACHE.get(key)
    # the weakref identity check guards against a dead session's id()
    # being recycled by a new SparkSession object
    if hit is not None and hit[0]() is spark:
        cached = hit[1]
        for name, df in cached.items():
            df.createOrReplaceTempView(name)  # cheap catalog op; views may
        return dict(cached)                   # have been rebound elsewhere

    # Self-configure: the driver (and any embedding application) hands us a
    # session built WITHOUT our factory defaults. events.parquet is written
    # with TIMESTAMP(NANOS), which Spark rejects unless this legacy conf is
    # on — and it is runtime-settable, so set it here rather than trusting
    # the caller. (Round-1 lesson: every correctness entry failed on this.)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    tables = {}
    for name, path in zip(names, paths):
        if os.path.exists(path):
            try:
                df = spark.read.parquet(path)
            except Exception:
                # One unreadable file must not poison queries that never
                # touch it — skip and let a query that DOES need the table
                # fail with a clear missing-view error instead.
                continue
            # Normalize the driver's timestamp columns to TIMESTAMP (LTZ)
            # whatever the physical encoding: TIMESTAMP(NANOS) arrives as
            # long (nanosAsLong conf) and is truncated to µs exactly like
            # DuckDB does; timestamp[us] without tz arrives as
            # TIMESTAMP_NTZ and is reinterpreted as UTC (session tz is
            # UTC, so wall clock == instant — value-identical to DuckDB's
            # naive reading). Downstream code may then rely on instant
            # functions like unix_millis that reject NTZ.
            for col in _NANO_TS_COLUMNS.get(name, ()):
                if col not in df.columns:
                    continue
                dt = df.schema[col].dataType
                if isinstance(dt, LongType):
                    df = df.withColumn(
                        col, F.timestamp_micros(F.expr(f"{col} div 1000"))
                    )
                elif isinstance(dt, TimestampNTZType):
                    df = df.withColumn(col, F.col(col).cast("timestamp"))
            df.createOrReplaceTempView(name)
            tables[name] = df
    # evict superseded entries for the same (session, dir) — a rewritten
    # test dir changes the mtime stamp and would otherwise accumulate
    # stale plans — AND any entry whose session weakref is dead: cached
    # DataFrames strongly reference their (stopped) SparkSession, so a
    # long-lived process creating sessions repeatedly would leak every
    # old one if only same-prefix keys were swept
    for k in [
        k
        for k, v in _SF_CACHE.items()
        if (k[:2] == key[:2] and k != key) or v[0]() is None
    ]:
        del _SF_CACHE[k]
    _SF_CACHE[key] = (weakref.ref(spark), dict(tables))
    return tables


# timestamp-typed columns in the driver's synthetic tables (TESTDATA.md)
_NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}
