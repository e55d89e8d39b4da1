"""cdc_stream_apply: changelog stream → snapshot table via the
equality-delete CDC pattern (one atomic commit per micro-batch: eq-
delete the changed keys + append the new versions; sequence semantics
exempt same-commit appends). Covers: mixed insert/update/delete
batches, last-change-per-key collapse under order_col, replay
idempotence, multi-batch sequencing, delete-only batches, and the
O(batch) commit shape (no data-file rewrites)."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.streaming.sink import cdc_stream_apply

CDC_SCHEMA = "op string, seq long, id long, v string"


def _table(spark, warehouse, name="default.cdc"):
    cat = LakehouseCatalog(spark, warehouse)
    t = cat.create_table(name, [("id", "long"), ("v", "string")])
    t.append(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"))
    return t


def _run(spark, tmp_path, t, rows, tag):
    d = str(tmp_path / f"src_{tag}")
    spark.createDataFrame(rows, CDC_SCHEMA).write.parquet(d)
    q = cdc_stream_apply(
        spark.readStream.schema(CDC_SCHEMA).parquet(d),
        t, key_columns=["id"], op_col="op", order_col="seq",
        checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
        available_now=True,
    )
    q.awaitTermination(120)


def _state(t):
    return {r["id"]: r["v"] for r in t.scan().collect()}


def test_mixed_batch_applies_atomically(spark, tmp_path, tmp_warehouse):
    t = _table(spark, tmp_warehouse)
    files_before = list(t.current_snapshot().files)
    _run(spark, tmp_path, t, [
        ("update", 1, 1, "A2"),      # update existing
        ("delete", 2, 2, None),      # delete existing
        ("insert", 3, 9, "new"),     # brand-new key
    ], "mix")
    assert _state(t) == {1: "A2", 3: "c", 9: "new"}
    snap = t.current_snapshot()
    # O(batch): original files untouched, one commit, eq list grew
    assert set(files_before) <= set(snap.files)
    assert snap.operation == "update" and snap.eq_delete_files


def test_last_change_per_key_wins(spark, tmp_path, tmp_warehouse):
    """Multiple changes for one key in one batch: only the highest
    order_col survives — including update-then-delete."""
    t = _table(spark, tmp_warehouse)
    _run(spark, tmp_path, t, [
        ("update", 1, 1, "x1"),
        ("update", 5, 1, "x5"),      # later update wins
        ("update", 2, 2, "y"),
        ("delete", 9, 2, None),      # delete AFTER update → deleted
        ("delete", 1, 3, None),
        ("insert", 4, 3, "z"),       # re-insert AFTER delete → lives
    ], "order")
    assert _state(t) == {1: "x5", 3: "z"}


def test_replay_is_idempotent_for_state(spark, tmp_path, tmp_warehouse):
    t = _table(spark, tmp_warehouse)
    rows = [("update", 1, 1, "A2"), ("delete", 2, 2, None)]
    d = str(tmp_path / "src")
    spark.createDataFrame(rows, CDC_SCHEMA).write.parquet(d)
    for i in range(2):  # fresh checkpoint → same batch replayed
        q = cdc_stream_apply(
            spark.readStream.schema(CDC_SCHEMA).parquet(d),
            t, key_columns=["id"], op_col="op", order_col="seq",
            checkpoint_dir=str(tmp_path / f"ckpt{i}"), available_now=True,
        )
        q.awaitTermination(120)
    assert _state(t) == {1: "A2", 3: "c"}


def test_sequential_batches_chain(spark, tmp_path, tmp_warehouse):
    t = _table(spark, tmp_warehouse)
    _run(spark, tmp_path, t, [("update", 1, 1, "v1")], "b1")
    _run(spark, tmp_path, t, [("update", 2, 1, "v2")], "b2")
    _run(spark, tmp_path, t, [("delete", 3, 1, None)], "b3")
    _run(spark, tmp_path, t, [("insert", 4, 1, "v4")], "b4")
    assert _state(t) == {1: "v4", 2: "b", 3: "c"}
    # compact folds the accrued delete debt, state unchanged
    t.compact()
    assert t.current_snapshot().eq_delete_files == []
    assert _state(t) == {1: "v4", 2: "b", 3: "c"}


def test_delete_only_batch(spark, tmp_path, tmp_warehouse):
    t = _table(spark, tmp_warehouse)
    files_before = list(t.current_snapshot().files)
    _run(spark, tmp_path, t, [
        ("delete", 1, 1, None), ("delete", 2, 3, None),
    ], "delonly")
    assert _state(t) == {2: "b"}
    snap = t.current_snapshot()
    assert snap.files == files_before  # no data file written at all
    assert snap.operation == "delete"


def test_requires_key_columns(spark, tmp_warehouse):
    t = _table(spark, tmp_warehouse)
    with pytest.raises(ValueError, match="key_columns"):
        cdc_stream_apply(None, t, key_columns=[])
