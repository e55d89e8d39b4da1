"""Salting utilities + stateful streaming operator tests."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
import pytest

from iceberg_lakehouse_spark.functions.skew import (
    salted_aggregate,
    salted_join,
    with_salt,
)


def test_salted_aggregate_matches_plain(spark):
    # one pathologically hot key
    df = spark.range(0, 20000).select(
        F.when(F.col("id") % 100 < 95, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    plain = {
        r["k"]: (r["s"], r["n"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"),
             F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["v_sum"], r["v_count"], r["v_min"], r["v_max"])
        for r in salted_aggregate(
            df, ["k"], {"v": "sum"}, salts=8
        ).join(
            salted_aggregate(df, ["k"], {"v": "count"}, salts=8), "k"
        ).join(
            salted_aggregate(df, ["k"], {"v": "min"}, salts=8), "k"
        ).join(
            salted_aggregate(df, ["k"], {"v": "max"}, salts=8), "k"
        ).collect()
    }
    for k in plain:
        assert abs(plain[k][0] - salted[k][0]) < 1e-6
        assert plain[k][1:] == salted[k][1:]


def test_salted_join_matches_plain(spark):
    big = spark.range(0, 5000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame(
        [(0, "zero"), (1, "one"), (2, "two")], "k long, name string"
    )
    plain = big.join(small, "k").agg(F.count("*"), F.sum("v")).collect()[0]
    salted = salted_join(big, small, "k", salts=4).agg(
        F.count("*"), F.sum("v")
    ).collect()[0]
    assert tuple(plain) == tuple(salted)
    # every row matched exactly once (no duplication from replication)
    assert salted_join(big, small, "k", salts=4).count() == 5000


def test_with_salt_range(spark):
    df = with_salt(spark.range(1000), salts=8)
    vals = {r["_salt"] for r in df.select("_salt").distinct().collect()}
    assert vals <= set(range(8)) and len(vals) >= 4


def test_stateful_user_tracker(spark, tmp_path):
    from iceberg_lakehouse_spark.session import load_sf_tables
    from iceberg_lakehouse_spark.streaming import events as se
    from iceberg_lakehouse_spark.streaming.stateful import user_activity_tracker

    src = str(tmp_path / "stateful_src")
    events = load_sf_tables(spark, "/root/testdata/sf0.001")["events"].limit(1000)
    events.withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(src)

    stream = se.read_event_stream(spark, src)
    tracked = user_activity_tracker(stream, idle_timeout=False)
    q = (
        tracked.writeStream.format("memory")
        .queryName("user_state")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["user_id"]: r for r in spark.sql("SELECT * FROM user_state").collect()}
    assert len(got) > 0
    # running summaries must match the batch truth per user
    truth = {
        r["user_id"]: (r["n"], r["t"])
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    for uid, row in got.items():
        n, t = truth[uid]
        assert row["event_count"] == n
        assert abs((row["total_value"] or 0) - (t or 0)) < 1e-6
        assert row["closed"] is False  # no timeout fired in one batch


class TestStreamToTable:
    """Streaming → LakeTable sinks (streaming/sink.py)."""

    @pytest.fixture()
    def source_dir(self, spark, tmp_path):
        from iceberg_lakehouse_spark.streaming.events import EVENTS_SCHEMA

        d = str(tmp_path / "stream_src")
        rows = [
            (1, datetime.datetime(2024, 1, 1, 10, 0), 1, "click", 1.0, "{}"),
            (2, datetime.datetime(2024, 1, 1, 10, 1), 1, "view", 2.0, "{}"),
            (3, datetime.datetime(2024, 1, 1, 10, 2), 2, "click", 3.0, "{}"),
        ]
        spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(d)
        return d

    def _table(self, spark, tmp_warehouse, name):
        from iceberg_lakehouse_spark.catalog import LakehouseCatalog
        from iceberg_lakehouse_spark.streaming.events import EVENTS_SCHEMA

        catalog = LakehouseCatalog(spark, tmp_warehouse)
        return catalog.create_table(name, EVENTS_SCHEMA)

    def test_append_mode_lands_batches_as_snapshots(
        self, spark, tmp_path, tmp_warehouse, source_dir
    ):
        from iceberg_lakehouse_spark.streaming.events import read_event_stream
        from iceberg_lakehouse_spark.streaming.sink import stream_to_table

        t = self._table(spark, tmp_warehouse, "landed")
        q = stream_to_table(
            read_event_stream(spark, source_dir), t, mode="append",
            checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
        )
        q.awaitTermination(120)
        assert t.scan().count() == 3
        assert t.current_snapshot().operation == "append"

    def test_dedup_append_is_idempotent(
        self, spark, tmp_path, tmp_warehouse, source_dir
    ):
        from iceberg_lakehouse_spark.streaming.events import read_event_stream
        from iceberg_lakehouse_spark.streaming.sink import stream_to_table

        t = self._table(spark, tmp_warehouse, "idem")
        for i in range(2):  # same files replayed twice (fresh checkpoint)
            q = stream_to_table(
                read_event_stream(spark, source_dir), t, mode="dedup_append",
                key_columns=["event_id"],
                checkpoint_dir=str(tmp_path / f"ckpt{i}"), available_now=True,
            )
            q.awaitTermination(120)
        assert t.scan().count() == 3  # replay added nothing

    def test_upsert_mode_merges_by_key(
        self, spark, tmp_path, tmp_warehouse, source_dir
    ):
        from iceberg_lakehouse_spark.operators import crud
        from iceberg_lakehouse_spark.streaming.events import read_event_stream
        from iceberg_lakehouse_spark.streaming.sink import stream_to_table

        t = self._table(spark, tmp_warehouse, "merged")
        crud.insert_rows(t, [{
            "event_id": 1, "ts": "2023-12-31T00:00:00", "user_id": 9,
            "event_type": "stale", "value": 0.0, "props": "{}",
        }])
        q = stream_to_table(
            read_event_stream(spark, source_dir), t, mode="upsert",
            key_columns=["event_id"],
            checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
        )
        q.awaitTermination(120)
        assert t.scan().count() == 3
        row = t.scan().where("event_id = 1").collect()[0]
        assert row["event_type"] == "click"  # stale row replaced

    def test_mode_validation(self, spark, tmp_warehouse, source_dir):
        from iceberg_lakehouse_spark.streaming.events import read_event_stream
        from iceberg_lakehouse_spark.streaming.sink import stream_to_table

        t = self._table(spark, tmp_warehouse, "vt")
        stream = read_event_stream(spark, source_dir)
        with pytest.raises(ValueError, match="requires key_columns"):
            stream_to_table(stream, t, mode="upsert")
        with pytest.raises(ValueError, match="unknown mode"):
            stream_to_table(stream, t, mode="replace")


def test_session_window_rollup(spark, tmp_path):
    """Streaming session windows: events within the gap fuse into one
    session per user; a gap larger than the threshold splits sessions."""
    from iceberg_lakehouse_spark.streaming.events import (
        EVENTS_SCHEMA,
        read_event_stream,
        run_to_memory_sink,
        session_window_rollup,
    )

    d = str(tmp_path / "sw_src")
    t0 = datetime.datetime(2024, 1, 1, 10, 0)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        (1, at(0), 1, "click", 1.0, "{}"),
        (2, at(10), 1, "view", 2.0, "{}"),   # same session (gap 10m < 30m)
        (3, at(120), 1, "click", 4.0, "{}"), # new session (gap 110m)
        (4, at(5), 2, "click", 8.0, "{}"),
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(d)
    result = session_window_rollup(read_event_stream(spark, d), gap="30 minutes")
    run_to_memory_sink(result, "sw_out", output_mode="complete")
    got = {
        (r["user_id"], r["events"], r["total_value"])
        for r in spark.table("sw_out").collect()
    }
    assert got == {(1, 2, 3.0), (1, 1, 4.0), (2, 1, 8.0)}
