"""Stats-based file pruning (plans/pruning.py + LakeTable.scan(filter=)).

The conservative contract under test: pruning may only drop files that
provably hold no matching rows; every result must equal the unpruned
scan + filter. Parser fallbacks (OR, functions, unknown syntax) must
degrade to keep-everything, never to wrong answers.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.operators import crud
from iceberg_lakehouse_spark.plans.pruning import (
    file_may_match,
    parse_conjuncts,
    prune_files,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("d", T.DateType()),
    T.StructField("v", T.DoubleType()),
])


# ------------------------------------------------------------------ parser

def test_parses_simple_conjunctions():
    cs = parse_conjuncts("id >= 5 AND name = 'x' AND v < 1.5")
    assert [(c.col, c.op) for c in cs] == [("id", ">="), ("name", "="), ("v", "<")]


def test_parses_reversed_between_in_null():
    cs = parse_conjuncts(
        "10 > id AND d BETWEEN DATE'2025-01-01' AND DATE'2025-02-01' "
        "AND name IN ('a', 'b') AND v IS NOT NULL"
    )
    ops = [(c.col, c.op) for c in cs]
    assert ops == [
        ("id", "<"), ("d", ">="), ("d", "<="), ("name", "in"), ("v", "isnotnull"),
    ]


@pytest.mark.parametrize("expr", [
    "id > 5 OR id < 2",            # OR → bail
    "upper(name) = 'X'",           # function call
    "id + 1 = 3",                  # arithmetic
    "id > 5 AND (v < 2 OR v > 9)", # parenthesized OR
    "name LIKE 'a%'",              # unsupported op
])
def test_unparseable_keeps_everything(expr):
    assert parse_conjuncts(expr) is None
    files = ["a", "b"]
    stats = {"a": {"id": ("0", "1", 0)}, "b": {"id": ("5", "9", 0)}}
    assert prune_files(files, stats, SCHEMA, expr) == files


# -------------------------------------------------------------- evaluation

STATS_LO = {"id": ("0", "9", 0), "name": ("a", "f", 0), "v": ("0.0", "1.0", 2)}
STATS_HI = {"id": ("10", "19", 0), "name": ("g", "z", 0), "v": ("5.0", "9.0", 0)}


@pytest.mark.parametrize("expr,keep_lo,keep_hi", [
    ("id = 5", True, False),
    ("id = 15", False, True),
    ("id > 9", False, True),
    ("id >= 9", True, True),
    ("id < 10", True, False),
    ("id <= 10", True, True),
    ("name = 'c'", True, False),
    ("name >= 'g'", False, True),
    ("id BETWEEN 3 AND 12", True, True),
    ("id BETWEEN 30 AND 40", False, False),
    ("id IN (4, 25)", True, False),
    ("v IS NULL", True, False),          # HI has null_count 0
    ("id = 5 AND name = 'q'", False, False),  # each false on one file
])
def test_min_max_pruning(expr, keep_lo, keep_hi):
    cs = parse_conjuncts(expr)
    assert cs is not None
    assert file_may_match(STATS_LO, SCHEMA, cs) is keep_lo
    assert file_may_match(STATS_HI, SCHEMA, cs) is keep_hi


def test_missing_stats_and_unknown_columns_survive():
    cs = parse_conjuncts("id = 99 AND mystery = 3")
    assert file_may_match({}, SCHEMA, cs)                  # no stats at all
    assert file_may_match({"name": ("a", "b", 0)}, SCHEMA, cs)  # no id stats
    files = ["with", "without"]
    stats = {"with": {"id": ("0", "9", 0)}}
    assert prune_files(files, stats, SCHEMA, "id = 99") == ["without"]


def test_footer_fallback_raw_objects_compare_safely():
    """Review regression: the parquet-footer fallback yields raw
    datetime/Decimal objects (stored shards yield strings) — both must
    evaluate without TypeError and prune identically."""
    import datetime
    from decimal import Decimal

    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("amt", T.DecimalType(12, 2)),
    ])
    raw = {
        "ts": (datetime.datetime(2024, 1, 1), datetime.datetime(2024, 6, 30), 0),
        "amt": (Decimal("1.50"), Decimal("99.00"), 0),
    }
    cs = parse_conjuncts("ts >= TIMESTAMP '2024-03-01 00:00:00'")
    assert file_may_match(raw, schema, cs)
    assert not file_may_match(raw, schema, parse_conjuncts("ts > TIMESTAMP '2024-07-01 00:00:00'"))
    assert file_may_match(raw, schema, parse_conjuncts("amt > 50"))
    assert not file_may_match(raw, schema, parse_conjuncts("amt > 100"))


def test_timestamp_literal_T_separator_not_mispruned():
    """Review regression: TIMESTAMP '…T…' literals must normalize to the
    space-separated stat-string form — ' ' < 'T' lexicographically, so
    an unnormalized literal wrongly pruned files containing matches."""
    schema = T.StructType([T.StructField("ts", T.TimestampType())])
    stats = {"ts": ("2024-06-01 00:00:00", "2024-06-01 23:00:00", 0)}
    cs = parse_conjuncts("ts = TIMESTAMP '2024-06-01T12:00:00'")
    assert file_may_match(stats, schema, cs)


def test_int64_past_double_precision_not_mispruned():
    """Advice regression (data loss): comparing int64 stats as Python
    floats collides distinct values >= 2**53, so a file holding
    id=9007199254740995 was pruned for both 'id != 9007199254740996'
    and 'id < 9007199254740996' even though its row matches. Integral
    columns must compare in an exact domain."""
    stats = {"id": ("9007199254740995", "9007199254740995", 0)}
    assert file_may_match(stats, SCHEMA, parse_conjuncts("id != 9007199254740996"))
    assert file_may_match(stats, SCHEMA, parse_conjuncts("id < 9007199254740996"))
    assert file_may_match(stats, SCHEMA, parse_conjuncts("id = 9007199254740995"))
    # and exactness must not break real pruning on the same magnitudes
    assert not file_may_match(stats, SCHEMA, parse_conjuncts("id = 9007199254740996"))
    assert not file_may_match(stats, SCHEMA, parse_conjuncts("id > 9007199254740995"))
    assert not file_may_match(
        stats, SCHEMA, parse_conjuncts("id != 9007199254740995")
    ), "min==max==literal with no nulls is still provably false"


def test_high_precision_decimal_not_mispruned():
    """Decimal columns likewise compare exactly: 38-digit values that
    round to the same double must stay distinguishable."""
    schema = T.StructType([T.StructField("amt", T.DecimalType(38, 0))])
    lo = "99999999999999999999999999999999999991"
    hi = "99999999999999999999999999999999999993"
    stats = {"amt": (lo, hi, 0)}
    assert file_may_match(stats, schema, parse_conjuncts(f"amt != {hi}"))
    assert file_may_match(
        stats, schema, parse_conjuncts("amt < 99999999999999999999999999999999999992")
    )
    assert not file_may_match(stats, schema, parse_conjuncts(f"amt > {hi}"))


def test_nan_and_nonfinite_stats_keep_file():
    """NaN float stats can't be ordered — the file must survive, and a
    Decimal column fed 'NaN'/'Infinity' must not raise at compare time."""
    stats = {"v": ("nan", "nan", 0)}
    assert file_may_match(stats, SCHEMA, parse_conjuncts("v > 5"))
    schema = T.StructType([T.StructField("amt", T.DecimalType(12, 2))])
    assert file_may_match({"amt": ("NaN", "Infinity", 0)}, schema, parse_conjuncts("amt > 5"))


def test_date_literals_compare_iso():
    stats = {"d": ("2025-01-01", "2025-01-31", 0)}
    assert file_may_match(stats, SCHEMA, parse_conjuncts("d >= DATE'2025-01-15'"))
    assert not file_may_match(stats, SCHEMA, parse_conjuncts("d > DATE'2025-01-31'"))
    assert not file_may_match(stats, SCHEMA, parse_conjuncts("d < '2025-01-01'"))


# ---------------------------------------------------------------- scan end-to-end

def test_scan_filter_prunes_and_matches_unpruned(spark, tmp_warehouse):
    catalog = LakehouseCatalog(spark, tmp_warehouse)
    t = catalog.create_table("pr_scan", [("id", "long"), ("v", "double")])
    # three appends → ≥3 files with disjoint id ranges
    for lo in (0, 100, 200):
        crud.insert_rows(t, [{"id": lo + i, "v": float(i)} for i in range(10)])
    kept, total = t.prune_files("id >= 200")
    assert total >= 3 and len(kept) < total
    pruned = t.scan(filter="id >= 200")
    full = t.scan().where("id >= 200")
    assert sorted(r["id"] for r in pruned.collect()) == sorted(
        r["id"] for r in full.collect()
    )
    # unparseable predicate: no pruning, same answer
    ugly = t.scan(filter="id >= 200 OR id < 5")
    assert ugly.count() == t.scan().where("id >= 200 OR id < 5").count()


def test_sorted_compaction_enables_pruning(spark, tmp_warehouse):
    """compact(sort_by=): interleaved appends give every file the full
    key range (pruning keeps all); range-clustering the rewrite gives
    files disjoint ranges, after which a point predicate keeps O(1)
    files. This pairing is the scan-planning scale story."""
    catalog = LakehouseCatalog(spark, tmp_warehouse)
    t = catalog.create_table("clustered", [("id", "long"), ("v", "double")])
    # every append = ONE file spanning the whole id domain → stats
    # can't discriminate
    for off in range(3):
        df = spark.createDataFrame(
            [(i * 10 + off, 1.0) for i in range(40)], "id long, v double"
        ).coalesce(1)
        t.append(df)
    kept, total = t.prune_files("id < 50")
    assert len(kept) == total, "interleaved files all survive (full range each)"
    res = t.compact(target_partitions=4, sort_by=["id"])
    assert res["files_after"] >= 2 and res["clustered_by"] == ["id"]
    kept2, total2 = t.prune_files("id < 50")
    assert len(kept2) < total2, "disjoint ranges → point/range pruning bites"
    # results stay exact through compaction + pruned scan
    assert t.scan(filter="id < 50").count() == sum(
        1 for off in range(3) for i in range(40) if i * 10 + off < 50
    )


def test_zorder_compaction_prunes_on_both_columns(spark, tmp_warehouse):
    """Z-ORDER: bit-interleaved clustering gives BOTH columns locality,
    so predicates on either prune; a linear sort serves only its
    leading column. Grid data (x, y independent) makes the contrast
    sharp."""
    catalog = LakehouseCatalog(spark, tmp_warehouse)
    rows = [(x, y, 1.0) for x in range(32) for y in range(32)]

    def build(name):
        t = catalog.create_table(name, [("x", "long"), ("y", "long"), ("v", "double")])
        t.append(spark.createDataFrame(rows, "x long, y long, v double").coalesce(1))
        return t

    lin = build("lin_t")
    lin.compact(target_partitions=16, sort_by=["x"])
    zed = build("z_t")
    res = zed.compact(target_partitions=16, zorder_by=["x", "y"])
    assert res["zordered_by"] == ["x", "y"]
    # leading column prunes under both layouts
    assert len(lin.prune_files("x < 4")[0]) < lin.prune_files("x < 4")[1]
    assert len(zed.prune_files("x < 4")[0]) < zed.prune_files("x < 4")[1]
    # trailing column prunes ONLY under z-order
    lin_kept, lin_total = lin.prune_files("y < 4")
    zed_kept, zed_total = zed.prune_files("y < 4")
    assert len(lin_kept) == lin_total, "linear sort gives y no locality"
    assert len(zed_kept) < zed_total, "z-order gives y locality too"
    # correctness: pruned scans equal unpruned on both layouts
    for t in (lin, zed):
        assert t.scan(filter="x < 4 AND y < 4").count() == 16
    with pytest.raises(ValueError, match="not both"):
        zed.compact(sort_by=["x"], zorder_by=["y"])


def test_update_probe_scans_only_candidate_files(spark, tmp_warehouse):
    """The CoW probe must plan over the stats-surviving subset: an
    update touching the last append's range reads neither of the other
    appends' files (checked via the probe's input file count)."""
    catalog = LakehouseCatalog(spark, tmp_warehouse)
    t = catalog.create_table("pr_upd", [("id", "long"), ("v", "double")])
    for lo in (0, 100, 200):
        crud.insert_rows(t, [{"id": lo + i, "v": float(i)} for i in range(10)])
    before = set(t.current_snapshot().files)
    n = crud.update_rows(t, "id >= 200", {"v": -1.0})
    assert n == 10
    after = t.current_snapshot()
    assert before & set(after.files), "untouched files carried by reference"
    assert after.summary["kept_files"] >= 2
    rows = {r["id"]: r["v"] for r in t.scan().collect()}
    assert rows[205] == -1.0 and rows[5] == 5.0
