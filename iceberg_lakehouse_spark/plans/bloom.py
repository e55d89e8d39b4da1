"""File-level bloom-filter index for point-lookup file pruning.

Min/max stats prune files only when the predicate column is clustered
(sorted writes, partition keys). A point lookup on an UNCLUSTERED
high-cardinality key — ``WHERE order_id = 123`` on a table laid out by
date — intersects every file's [min, max] and prunes nothing; at 100 TB
the scan lists and opens every file even though the row lives in one.
Parquet row-group bloom filters (``write.bloom.columns``) skip row
groups but still pay the per-file open + footer round-trip.

This module closes the file-level gap with the Delta-Lake-style bloom
index (public design: one bloom per file per indexed column, stored in
sidecar files, consulted by scan planning before the reader is built):

* **Write**: when ``write.bloom.index`` = "true", each write job runs
  ONE extra column-pruned pass over the files it just wrote and stores
  a sparse bloom bitset per (file, column) in a per-commit sidecar
  parquet under ``_meta/bloom/`` (the stats-shard model — commits stay
  O(files written)). The build is a bounded shuffle: k positions per
  row fold into at most ``nbits/64`` words per file via map-side
  combinable ``bit_or``.
* **Read**: ``LakeTable.prune_files`` hands equality conjuncts on
  indexed columns to :func:`bloom_prune`, which tests the probe
  value's k bit positions against every candidate file's bitset in ONE
  distributed pass over the (tiny) sidecar table and returns the files
  that are PROVABLY absent. Files with no bloom row (written before the
  property, other columns) are always kept; false positives only keep
  extra files — results never change, mirroring plans/pruning.py's
  conservative contract.

Hashing uses Spark's own ``xxhash64`` on BOTH sides — the probe hashes
its literal with a one-row Spark job after casting to the column type —
so build and probe can never disagree on value encoding. Double hashing
(h1 + i*h2, h2 forced odd) derives the k positions; ``nbits``/
``nhashes`` are stored per row, so commits written under different
``write.bloom.index.bits`` settings coexist and are probed correctly.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_SUBDIR = os.path.join("_meta", "bloom")
DEFAULT_BITS = 131_072   # 16 KiB/file/column FLOOR; ~1% fp at ~13k distinct
DEFAULT_HASHES = 7
DEFAULT_MAX_BITS = 1 << 24   # 2 MiB/file/column auto-sizing ceiling
_H2_SEED = -1989         # second-hash discriminator fed to xxhash64
MAX_IN_VALUES = 16       # larger IN lists skip bloom pruning


def bloom_index_config(props: dict) -> tuple[list[str], int, int] | None:
    """(columns, nbits, nhashes) when the file-level index is enabled,
    else None. Columns come from the same ``write.bloom.columns`` list
    that drives parquet row-group blooms."""
    if str(props.get("write.bloom.index", "")).lower() != "true":
        return None
    cols = [c.strip() for c in props.get("write.bloom.columns", "").split(",")
            if c.strip()]
    if not cols:
        return None
    nbits = int(props.get("write.bloom.index.bits", DEFAULT_BITS))
    nhashes = int(props.get("write.bloom.index.hashes", DEFAULT_HASHES))
    if nbits < 64 or nhashes < 1:
        raise ValueError(
            f"write.bloom.index.bits must be >= 64 and .hashes >= 1 "
            f"(got {nbits}, {nhashes})")
    return cols, nbits, nhashes


def _positions_sql(h1_sql: str, h2_sql: str, nbits_sql: str,
                   k_sql: str) -> str:
    """SQL for the k bloom bit positions of one value: double hashing
    (h1 + i*h2) mod nbits, h2 | 1 so the stride is odd (never cycles
    through a strict subset of an even-sized table).

    Each operand is reduced mod nbits BEFORE the add/multiply: the raw
    64-bit hashes would overflow int64 at i >= 1, which Java silently
    wraps but ANSI mode (the Spark 4 default, and the driver's session)
    turns into ARITHMETIC_OVERFLOW. The reduced form is mathematically
    the same residue, overflow-free for any nbits < 2^56, and — the
    property that actually matters — IDENTICAL on build and probe
    because both render through this one function."""
    return (
        f"transform(sequence(0, {k_sql} - 1), "
        f"i -> pmod(pmod({h1_sql}, cast({nbits_sql} as bigint)) "
        f"+ cast(i as bigint) "
        f"* pmod(({h2_sql}) | 1, cast({nbits_sql} as bigint)), "
        f"cast({nbits_sql} as bigint)))"
    )


def sidecar_schema() -> T.StructType:
    return T.StructType([
        T.StructField("file", T.StringType()),
        T.StructField("column", T.StringType()),
        T.StructField("nbits", T.IntegerType()),
        T.StructField("nhashes", T.IntegerType()),
        T.StructField("words", T.MapType(T.IntegerType(), T.LongType())),
    ])


def build_bloom_sidecar(table, new_files: list[str]) -> str | None:
    """One column-pruned pass over the freshly written files → one
    sidecar parquet of sparse bitsets. Returns the sidecar's relative
    path (None when the index is disabled or nothing to do)."""
    cfg = bloom_index_config(table.properties())
    if cfg is None or not new_files:
        return None
    cols, nbits, nhashes = cfg
    schema_cols = {f.name for f in table.schema().fields}
    cols = [c for c in cols if c in schema_cols]
    if not cols:
        return None
    spark: SparkSession = table.spark
    by_fmt: dict[str, list[str]] = {}
    for f in new_files:
        by_fmt.setdefault("orc" if f.endswith(".orc") else "parquet",
                          []).append(os.path.join(table.root, f))
    parts: list[DataFrame] = []
    max_bits = int(table.properties().get(
        "write.bloom.index.max_bits", DEFAULT_MAX_BITS))
    for fmt, paths in by_fmt.items():
        src = (spark.read.format(fmt).load(paths)
               .select(F.col("_metadata.file_path").alias("_bf_file"),
                       *[F.col(c) for c in cols]))
        for c in cols:
            # PER-FILE auto-sizing (r9: the fixed 16 KiB default
            # saturated at sf0.1's ~50k keys/file — ~60% fp, zero
            # pruning): size each file's bitset to ~10 bits per
            # observed distinct key (~1% fp at k=7), power of two,
            # floored at the configured nbits and capped at max_bits.
            # The probe already reads nbits per sidecar ROW, so mixed
            # sizes across files/commits are free.
            sized = (
                src.where(F.col(c).isNotNull())
                .groupBy("_bf_file")
                .agg(F.approx_count_distinct(c).alias("_d"))
                .select(
                    "_bf_file",
                    F.expr(
                        f"least(cast({max_bits} as bigint), "
                        f"greatest(cast({nbits} as bigint), "
                        f"shiftleft(1L, cast(ceil(log2(_d * 10 + 1)) "
                        f"as int))))"
                    ).alias("_bf_nbits"),
                )
            )
            pos = _positions_sql(
                f"xxhash64(`{c}`)", f"xxhash64(`{c}`, {_H2_SEED})",
                "_bf_nbits", str(nhashes))
            parts.append(
                src.where(F.col(c).isNotNull())
                # sized is one row per file WRITTEN IN THIS COMMIT —
                # always broadcastable; without the hint Catalyst
                # picked a sort-merge join that sorted the whole data
                # pass (r13: 7.2s -> 2.8s at sf0.1)
                .join(F.broadcast(sized), "_bf_file")
                .select("_bf_file", "_bf_nbits",
                        F.explode(F.expr(pos)).alias("_bf_pos"))
                .select(
                    "_bf_file", "_bf_nbits",
                    F.expr("cast(_bf_pos div 64 as int)").alias("word_idx"),
                    F.expr("shiftleft(1L, cast(_bf_pos % 64 as int))")
                    .alias("bit"),
                )
                .groupBy("_bf_file", "_bf_nbits", "word_idx")
                .agg(F.expr("bit_or(bit)").alias("word"))
                .groupBy("_bf_file", "_bf_nbits")
                .agg(F.map_from_entries(
                    F.collect_list(F.struct("word_idx", "word"))
                ).alias("words"))
                .select(
                    "_bf_file",
                    F.lit(c).alias("column"),
                    F.col("_bf_nbits").cast("int").alias("nbits"),
                    F.lit(nhashes).alias("nhashes"),
                    "words",
                )
            )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    rows = union.collect()  # O(new files × columns) — driver-small,
    # same order as the stats shard this commit already wrote
    out_rows = [
        (table.relativize_file(r["_bf_file"]), r["column"],
         r["nbits"], r["nhashes"], r["words"])
        for r in rows
    ]
    if not out_rows:
        return None
    rel = os.path.join(
        BLOOM_SUBDIR, f"{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}")
    dest = os.path.join(table.root, rel)
    (spark.createDataFrame(out_rows, sidecar_schema())
     .coalesce(1).write.mode("overwrite").parquet(dest))
    sidecars = [d for d in os.listdir(os.path.join(table.root, BLOOM_SUBDIR))]
    if len(sidecars) > SIDECAR_CAP:
        consolidate_bloom_index(table)
    return rel


# merge sidecars once this many accumulate — the stats-shard model:
# probes stay O(sidecars <= cap) listings while each commit's build
# stays O(files written)
SIDECAR_CAP = 64


def consolidate_bloom_index(table) -> None:
    """Merge every sidecar into one and drop rows for files no live
    snapshot references (a compacted/expired file's bloom is dead
    weight). Best-effort under the commit lock — on contention skip;
    the next build past the cap retries. Never breaks reads: the new
    consolidated file is written before the old sidecars are removed,
    and a probe racing the removal window at worst sees a file's row
    twice, which tests identically."""
    from ..catalog import CommitConflictError

    bloom_dir = os.path.join(table.root, BLOOM_SUBDIR)
    if not os.path.isdir(bloom_dir):
        return
    try:
        lock = table._commit_lock(timeout_s=2.0)
        lock.__enter__()
    except CommitConflictError:
        return
    try:
        old = sorted(os.listdir(bloom_dir))
        if len(old) <= 1:
            return
        # liveness = referenced by a snapshot OR still on disk: an
        # in-flight commit's files exist before they are referenced,
        # and dropping their fresh rows would silently lose the index
        # for those files forever (kept-not-pruned, degraded not wrong
        # — but avoidable). Files deleted by expire/orphan cleanup fail
        # both tests and their rows drop here.
        live = table._referenced_files()
        side = (table.spark.read.schema(sidecar_schema())
                .parquet(os.path.join(bloom_dir, "*")))
        rows = [r for r in side.collect()
                if r["file"] in live
                or os.path.exists(os.path.join(table.root, r["file"]))]
        dest = os.path.join(
            bloom_dir,
            f"{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}-merged")
        if rows:
            (table.spark.createDataFrame(rows, sidecar_schema())
             .coalesce(1).write.mode("overwrite").parquet(dest))
        import shutil

        for name in old:
            shutil.rmtree(os.path.join(bloom_dir, name),
                          ignore_errors=True)
    finally:
        lock.__exit__(None, None, None)


def _probe_hashes(spark: SparkSession, values: list, dtype: T.DataType
                  ) -> list[tuple[int, int]] | None:
    """(h1, h2) per probe value, hashed by Spark itself after casting
    to the COLUMN type — build and probe share one hash definition.
    None when any literal does not survive the cast (e.g. ``id = 1.5``
    on a bigint column — Spark compares that in a widened domain the
    index never hashed, so pruning would be unsound: keep all files)."""
    exprs = []
    for i, v in enumerate(values):
        lit = F.lit(v).cast(dtype)
        exprs.append(F.xxhash64(lit).alias(f"h1_{i}"))
        exprs.append(F.xxhash64(lit, F.lit(_H2_SEED)).alias(f"h2_{i}"))
        exprs.append(lit.isNull().alias(f"null_{i}"))
        exprs.append(lit.cast("string").alias(f"rt_{i}"))
    row = spark.range(1).select(*exprs).first()
    for i, v in enumerate(values):
        if row[f"null_{i}"] and v is not None:
            return None
        # numeric lexical forms must round-trip exactly: '1.5' cast to
        # bigint yields 1 (or null under ANSI) — either way the engine
        # compares in a wider domain than the index hashed
        if isinstance(v, str) and row[f"rt_{i}"] is not None:
            if _numeric_like(v) and _canon_num(v) != _canon_num(row[f"rt_{i}"]):
                return None
    return [(row[f"h1_{i}"], row[f"h2_{i}"]) for i in range(len(values))]


def _numeric_like(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def _canon_num(s: str):
    from decimal import Decimal, InvalidOperation

    try:
        return Decimal(s)
    except InvalidOperation:
        return s


def bloom_prune(
    table,
    files: list[str],
    probes: list[tuple[str, T.DataType, list]],
) -> list[str]:
    """Drop candidate files whose bloom bitsets prove every probe value
    absent. ``probes`` = [(column, column_type, values)] — one entry per
    equality/IN conjunct; a file survives a conjunct if ANY value may be
    present (IN semantics) or if it has no bloom row for that column.

    One distributed pass per probe over the sidecar table (rows =
    files × indexed columns — metadata-scale); only PRUNED file names
    are collected."""
    bloom_dir = os.path.join(table.root, BLOOM_SUBDIR)
    if not files or not probes or not os.path.isdir(bloom_dir):
        return files
    spark: SparkSession = table.spark
    try:
        side = spark.read.schema(sidecar_schema()).parquet(
            os.path.join(bloom_dir, "*"))
    except Exception:  # noqa: BLE001 — unreadable index never breaks reads
        return files
    kept = list(files)
    cand = spark.createDataFrame([(f,) for f in kept], "file string")
    for col, dtype, values in probes:
        if not values or len(values) > MAX_IN_VALUES:
            continue
        try:
            hashes = _probe_hashes(spark, values, dtype)
        except Exception:  # noqa: BLE001 — uncastable literal: keep all
            continue
        if hashes is None:
            continue
        present_any = F.lit(False)
        for h1, h2 in hashes:
            pos = _positions_sql(f"{h1}L", f"{h2}L", "nbits", "nhashes")
            # try_element_at, not element_at: a missing word means the
            # bit is 0, but ANSI mode makes bare element_at THROW on an
            # absent map key instead of returning NULL
            present_any = present_any | F.expr(
                f"forall({pos}, p -> "
                f"(shiftright(coalesce(try_element_at(words, "
                f"cast(p div 64 as int)), 0L), cast(p % 64 as int)) & 1) "
                f"= 1)")
        pruned = (
            side.where(F.col("column") == col)
            .join(cand, "file")
            .where(~present_any)
            .select("file")
            .collect()
        )
        if pruned:
            gone = {r["file"] for r in pruned}
            kept = [f for f in kept if f not in gone]
            if not kept:
                break
            cand = spark.createDataFrame([(f,) for f in kept],
                                         "file string")
    return kept
