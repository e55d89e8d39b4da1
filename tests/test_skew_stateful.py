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

    def test_collapse_batch_is_deterministic(self, spark):
        """r12 ADVICE: an intra-batch key repeat with DIVERGING
        payloads must land a deterministic survivor — the greatest
        payload tuple, independent of partitioning/arrival order —
        not whatever row dropDuplicates happens to keep."""
        from iceberg_lakehouse_spark.streaming.sink import _collapse_batch

        rows = [("d1", "zeta", 1), ("d1", "alpha", 9), ("d2", "solo", 5)]
        expected = {("d1", "zeta", 1), ("d2", "solo", 5)}
        for perm in (rows, rows[::-1], [rows[1], rows[2], rows[0]]):
            for nparts in (1, 3):
                df = spark.createDataFrame(
                    perm, "doc_id string, text string, v int"
                ).repartition(nparts)
                got = {tuple(r) for r in
                       _collapse_batch(df, ["doc_id"]).collect()}
                assert got == expected, (perm, nparts, got)
        # byte-identical duplicates collapse to the single version
        dup = spark.createDataFrame(
            [("d1", "same", 1)] * 3, "doc_id string, text string, v int")
        assert _collapse_batch(dup, ["doc_id"]).count() == 1
        # unorderable payload (map) falls back to dropDuplicates
        m = spark.createDataFrame(
            [("d1", {"a": 1}), ("d1", {"a": 1})],
            "doc_id string, m map<string,int>")
        assert _collapse_batch(m, ["doc_id"]).count() == 1

    def test_collapse_batch_nested_unorderable(self, spark):
        """r13 ADVICE: orderability is RECURSIVE — array<map<...>> and
        struct-containing-map payloads must take the dropDuplicates
        fallback (F.max over a struct with an unorderable field raises
        AnalysisException), while nested but orderable payloads still
        get the deterministic max-struct survivor."""
        from iceberg_lakehouse_spark.streaming.sink import _collapse_batch

        am = spark.createDataFrame(
            [("d1", [{"a": 1}]), ("d1", [{"a": 1}])],
            "doc_id string, ams array<map<string,int>>")
        assert _collapse_batch(am, ["doc_id"]).count() == 1

        sm = spark.createDataFrame(
            [("d1", {"m": {"a": 1}, "v": 2})] * 2,
            "doc_id string, s struct<m: map<string,int>, v: int>")
        assert _collapse_batch(sm, ["doc_id"]).count() == 1

        # orderable nesting (struct of array<int>) keeps determinism:
        # the greatest payload tuple survives in any arrival order
        rows = [("d1", ("x", [1, 2])), ("d1", ("x", [9, 0]))]
        for perm in (rows, rows[::-1]):
            df = spark.createDataFrame(
                perm, "doc_id string, s struct<t: string, a: array<int>>")
            got = _collapse_batch(df, ["doc_id"]).collect()
            assert len(got) == 1
            assert got[0]["s"]["a"] == [9, 0]

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


# ------------------------------------------- as-of / session skew (r5)

def _skewed_asof_fixture(spark):
    """10×-skewed fixture: the hot user holds ~30% of left events and a
    dense right stream; right timestamps are unique per key so the
    plain and bucketed operators are bit-identical."""
    import random

    rng = random.Random(7)
    left_rows, right_rows = [], []
    for uid, n in [(0, 300)] + [(u, 30) for u in range(1, 25)]:
        for i in range(n):
            left_rows.append((uid, float(rng.randrange(0, 50_000))))
        for i in range(0, 50_000, 997 if uid else 101):  # denser hot right
            right_rows.append((uid, float(i), f"v{uid}_{i}"))
    left = spark.createDataFrame(left_rows, "k int, lts double") \
        .selectExpr("k", "timestamp_seconds(lts) as lts")
    right = spark.createDataFrame(right_rows, "k int, rts double, tag string") \
        .selectExpr("k", "timestamp_seconds(rts) as rts", "tag")
    return left, right


def test_bucketed_asof_matches_plain_on_skewed_keys(spark):
    """VERDICT r4 #7: the time-bucketed as-of join must return exactly
    the plain operator's rows on a power-law key distribution."""
    from iceberg_lakehouse_spark.operators.asof import (
        as_of_join,
        as_of_join_bucketed,
    )

    left, right = _skewed_asof_fixture(spark)
    plain = as_of_join(left, right, on="k", left_ts="lts", right_ts="rts")
    bucketed = as_of_join_bucketed(
        left, right, on="k", left_ts="lts", right_ts="rts",
        bucket_width_seconds=3600,
    )
    key = lambda r: (r["k"], str(r["lts"]), r["tag_right"], str(r["rts_right"]))
    assert sorted(map(key, plain.collect())) == sorted(
        map(key, bucketed.collect())
    )


def test_bucketed_asof_carry_spans_empty_buckets(spark):
    """A left row whose bucket (and several preceding buckets) hold no
    right rows must still match the latest earlier right row — the
    carry propagates across empty buckets."""
    from datetime import datetime

    from iceberg_lakehouse_spark.operators.asof import as_of_join_bucketed

    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 9, 30)),    # right in same bucket
         (1, datetime(2024, 1, 1, 23, 45)),   # 14 empty buckets later
         (1, datetime(2024, 1, 1, 0, 10)),    # before any right → NULL
         (2, datetime(2024, 1, 1, 12, 0))],   # key with no rights at all
        "k int, lts timestamp",
    )
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 9, 0), "a"),
         (1, datetime(2024, 1, 1, 9, 15), "b")],
        "k int, rts timestamp, tag string",
    )
    out = as_of_join_bucketed(
        left, right, on="k", left_ts="lts", right_ts="rts",
        bucket_width_seconds=3600,
    )
    got = {(r["k"], str(r["lts"])): r["tag_right"] for r in out.collect()}
    assert got[(1, "2024-01-01 09:30:00")] == "b"
    assert got[(1, "2024-01-01 23:45:00")] == "b"   # carried across gaps
    assert got[(1, "2024-01-01 00:10:00")] is None  # nothing earlier
    assert got[(2, "2024-01-01 12:00:00")] is None
    assert out.count() == 4


def test_asof_and_session_skew_plans(spark):
    """Skew posture gates: the bucketed as-of merge window partitions
    by (key, time-bucket) — the hot key splits across buckets; the
    sessionization window partitions by hash(user), never a
    single-partition global window (documented bound in sessionize)."""
    import contextlib
    import io

    from iceberg_lakehouse_spark.operators.asof import (
        as_of_join_bucketed,
        sessionize,
    )

    left, right = _skewed_asof_fixture(spark)

    def plan(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    p = plan(as_of_join_bucketed(left, right, on="k",
                                 left_ts="lts", right_ts="rts"))
    assert "_bk" in p                     # bucket is a partition key
    assert "SinglePartition" not in p
    events = left.selectExpr("k as user_id", "lts as ts")
    p2 = plan(sessionize(events, "user_id", "ts"))
    assert "hashpartitioning(user_id" in p2
    assert "SinglePartition" not in p2
    # correctness under skew: session count equals the naive per-user
    # python reference on the hot user
    rows = sorted(
        (r["user_id"], r["ts"]) for r in events.where("user_id = 0")
        .dropDuplicates(["user_id", "ts"]).collect()
    )
    import itertools
    gaps = sum(
        1 for (u1, t1), (u2, t2) in itertools.pairwise(rows)
        if (t2 - t1).total_seconds() > 1800
    )
    got = (
        sessionize(events.dropDuplicates(["user_id", "ts"]), "user_id", "ts")
        .where("user_id = 0")
        .selectExpr("max(session_seq) as mx")
        .collect()[0]["mx"]
    )
    assert got == gaps + 1


def test_streaming_document_curation(spark, tmp_path, tmp_warehouse):
    """r5: curate_documents_stream = length filter + PII redaction +
    fingerprint dedup-append, across TWO batches — a duplicate document
    arriving in a later batch never lands twice, short docs are
    dropped, and PII is redacted before the fingerprint is taken."""
    from pyspark.sql import types as T

    from iceberg_lakehouse_spark.catalog import LakehouseCatalog
    from iceberg_lakehouse_spark.streaming.sink import curate_documents_stream

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    long_text = " ".join(f"w{i}" for i in range(30))
    # mixed-case email: redaction must be case-insensitive (r5 review)
    pii_text = long_text + " contact me at Some.One@Example.COM or 555-1234"
    src = str(tmp_path / "docs_src")
    spark.createDataFrame(
        [(1, long_text), (2, "too short"), (3, pii_text)], schema
    ).write.parquet(src)

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table(
        "curated_docs",
        [("doc_id", "long"), ("text", "string"),
         ("n_tokens", "long"), ("fp", "string")],
    )
    stream = spark.readStream.schema(schema).parquet(src)
    q = curate_documents_stream(
        stream, t, min_tokens=20, max_tokens=1000,
        checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(120)
    rows = {r["doc_id"]: r for r in t.scan().collect()}
    assert set(rows) == {1, 3}  # short doc filtered
    assert "<EMAIL>" in rows[3]["text"] and "<PHONE>" in rows[3]["text"]
    assert "@Example.COM" not in rows[3]["text"]
    assert rows[1]["n_tokens"] == 30

    # batch 2: a duplicate of doc 1 (new id) plus a genuinely new doc —
    # the fingerprint dedup drops the duplicate against table history
    spark.createDataFrame(
        [(10, long_text), (11, long_text + " extra tail tokens")], schema
    ).write.mode("append").parquet(src)
    q2 = curate_documents_stream(
        spark.readStream.schema(schema).parquet(src), t,
        min_tokens=20, max_tokens=1000,
        checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
    )
    q2.awaitTermination(120)
    ids = sorted(r["doc_id"] for r in t.scan().collect())
    assert ids == [1, 3, 11]  # 10 (dup of 1 by content) never landed
    assert t.scan().select("fp").distinct().count() == 3


def test_watermark_drops_late_events_across_restarts(spark, tmp_path):
    """Late-data semantics: an event arriving in a later micro-batch
    behind the checkpointed watermark must NOT be added to its (already
    finalized) window — the property that bounds streaming state at
    scale. Three availableNow runs against one checkpoint: load the
    10:00 window + advance the watermark, deliver a too-late event,
    flush; the window's count excludes the late arrival."""
    import datetime as _dt

    from iceberg_lakehouse_spark.streaming import events as se

    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    out = str(tmp_path / "late_out")
    base = _dt.datetime(2024, 1, 1)

    def _write(rows):
        spark.createDataFrame(rows, se.EVENTS_SCHEMA).write.mode(
            "append"
        ).parquet(src)

    def _run():
        se.stream_events_to_table(spark, src, ckpt, out, window="1 hour")

    # run 1: two 10:xx events + a 23:00 sentinel pushes the watermark
    # (10 min default) far past the 10:00 window's end
    _write([
        (1, base + _dt.timedelta(hours=10, minutes=10), 1, "click", 1.0, "{}"),
        (2, base + _dt.timedelta(hours=10, minutes=20), 1, "click", 1.0, "{}"),
        (3, base + _dt.timedelta(hours=23), 2, "view", 1.0, "{}"),
    ])
    _run()
    # run 2: a LATE 10:15 event (behind the checkpointed ~22:50
    # watermark) plus a later sentinel to keep the stream moving
    _write([
        (4, base + _dt.timedelta(hours=10, minutes=15), 1, "click", 1.0, "{}"),
        (5, base + _dt.timedelta(hours=23, minutes=30), 2, "view", 1.0, "{}"),
    ])
    _run()
    # run 3: flush any remaining eligible windows
    _write([
        (6, base + _dt.timedelta(hours=23, minutes=59), 2, "view", 1.0, "{}"),
    ])
    _run()
    got = {
        (str(r["window_start"]), r["event_type"]): r["events"]
        for r in spark.read.parquet(out).collect()
    }
    key = ("2024-01-01 10:00:00", "click")
    assert key in got, f"10:00 window never emitted: {got}"
    assert got[key] == 2, "late event must be dropped, not counted"


class TestNearDupStreamSink:
    """Streaming near-dup curation against the persisted MinHash index
    (r6): batch N+1 is deduped against batch N's survivors without
    re-signaturing the corpus."""

    BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

    def _corpus_and_index(self, spark, tmp_warehouse):
        from iceberg_lakehouse_spark.catalog import LakehouseCatalog
        from iceberg_lakehouse_spark.operators.dedup_index import (
            build_dedup_index,
        )

        cat = LakehouseCatalog(spark, tmp_warehouse)
        t = cat.create_table(
            "near_corpus", [("doc_id", "long"), ("text", "string")]
        )
        t.append(spark.createDataFrame(
            [(1, self.BASE),
             (2, "completely different seed content here now")],
            "doc_id long, text string",
        ))
        idx = build_dedup_index(
            cat, "near_corpus_lsh", t.scan(), "doc_id", "text",
            k=8, bands=4,
        )
        return t, idx

    def test_cross_batch_near_dedup(self, spark, tmp_path, tmp_warehouse):
        from iceberg_lakehouse_spark.streaming.sink import (
            near_dup_stream_to_table,
        )

        t, idx = self._corpus_and_index(spark, tmp_warehouse)
        # batch: an exact intra-batch dup pair (10, 11), a near-dup of
        # the INDEXED doc 1 (12), and a genuinely novel doc (13)
        d = str(tmp_path / "nd_src")
        rows = [
            (10, "fresh unique words one two three four five six"),
            (11, "fresh unique words one two three four five six"),
            (12, self.BASE.replace("kappa", "lambda")),
            (13, "another novel document mentioning parquet files"),
        ]
        spark.createDataFrame(rows, "doc_id long, text string") \
            .write.parquet(d)
        stream = spark.readStream.schema(
            "doc_id long, text string").parquet(d)
        q = near_dup_stream_to_table(
            stream, t, idx, "doc_id", "text", threshold=0.5,
            checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
        )
        q.awaitTermination(180)
        landed = sorted(r["doc_id"] for r in t.scan().collect())
        # 11 lost intra-batch (keeper 10); 12 lost to indexed doc 1
        assert landed == [1, 2, 10, 13]
        # the index grew by the survivors' band keys (2 docs × 4 bands)
        assert idx.scan().count() == 2 * 4 + 2 * 4
        # replay: at-least-once upstream adds nothing
        q2 = near_dup_stream_to_table(
            spark.readStream.schema("doc_id long, text string").parquet(d),
            t, idx, "doc_id", "text", threshold=0.5,
            checkpoint_dir=str(tmp_path / "ckpt2"), available_now=True,
        )
        q2.awaitTermination(180)
        assert sorted(r["doc_id"] for r in t.scan().collect()) == [1, 2, 10, 13]
        # a second batch near-duplicating batch-1 SURVIVOR 10 is dropped
        # via the extended index — cross-batch near dedup
        d2 = str(tmp_path / "nd_src2")
        spark.createDataFrame(
            [(20, "fresh unique words one two three four five seven")],
            "doc_id long, text string",
        ).write.parquet(d2)
        q3 = near_dup_stream_to_table(
            spark.readStream.schema("doc_id long, text string").parquet(d2),
            t, idx, "doc_id", "text", threshold=0.5,
            checkpoint_dir=str(tmp_path / "ckpt3"), available_now=True,
        )
        q3.awaitTermination(180)
        assert sorted(r["doc_id"] for r in t.scan().collect()) == [1, 2, 10, 13]

    def test_replay_repairs_index_ahead_crash(
        self, spark, tmp_path, tmp_warehouse
    ):
        """ADVICE r6: the sink extends the index BEFORE appending to
        the table, so a crash between the two commits leaves the index
        AHEAD of the corpus — the direction replay repairs. Simulate
        the crash state (band keys indexed, docs never landed), then
        replay the batch: the docs must land, and the re-extend must
        be a no-op (no duplicate index rows)."""
        from iceberg_lakehouse_spark.operators.dedup_index import (
            extend_dedup_index,
        )
        from iceberg_lakehouse_spark.streaming.sink import (
            near_dup_stream_to_table,
        )

        t, idx = self._corpus_and_index(spark, tmp_warehouse)
        survivors = [
            (10, "fresh unique words one two three four five six"),
            (13, "another novel document mentioning parquet files"),
        ]
        # crash state: pre-extend the index with the survivors' keys,
        # as if the process died after extend and before table.append
        extend_dedup_index(
            idx,
            spark.createDataFrame(survivors, "doc_id long, text string"),
            "doc_id", "text",
        )
        assert 13 not in {r["doc_id"] for r in t.scan().collect()}
        n_idx_after_crash = idx.scan().count()
        d = str(tmp_path / "nd_replay")
        spark.createDataFrame(
            survivors, "doc_id long, text string"
        ).write.parquet(d)
        q = near_dup_stream_to_table(
            spark.readStream.schema("doc_id long, text string").parquet(d),
            t, idx, "doc_id", "text", threshold=0.5,
            checkpoint_dir=str(tmp_path / "ckpt_replay"),
            available_now=True,
        )
        q.awaitTermination(180)
        # replay landed the docs whose keys were already indexed…
        assert sorted(r["doc_id"] for r in t.scan().collect()) \
            == [1, 2, 10, 13]
        # …and did NOT duplicate their index rows
        assert idx.scan().count() == n_idx_after_crash


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream interval join: a purchase attributes
    to every click by the same user within the preceding 30 minutes;
    out-of-window and cross-user purchases attribute to nothing."""
    from iceberg_lakehouse_spark.streaming.events import (
        EVENTS_SCHEMA,
        correlate_event_streams,
        read_event_stream,
        run_to_memory_sink,
    )

    t0 = datetime.datetime(2024, 1, 1, 10, 0)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    spark.createDataFrame([
        (1, at(0), 1, "click", 0.0, "{}"),
        (2, at(5), 1, "click", 0.0, "{}"),
        (3, at(0), 2, "click", 0.0, "{}"),
    ], EVENTS_SCHEMA).write.parquet(clicks_dir)
    spark.createDataFrame([
        (10, at(20), 1, "purchase", 9.0, "{}"),   # within 30m of both clicks
        (11, at(50), 2, "purchase", 5.0, "{}"),   # 50m after click 3 — out
    ], EVENTS_SCHEMA).write.parquet(buys_dir)
    joined = correlate_event_streams(
        read_event_stream(spark, clicks_dir),
        read_event_stream(spark, buys_dir),
        within="30 minutes",
    )
    run_to_memory_sink(joined, "attributed")
    got = {
        (r["left_event_id"], r["right_event_id"], r["lag_seconds"])
        for r in spark.table("attributed").collect()
    }
    assert got == {(1, 10, 1200), (2, 10, 900)}


def test_stream_stream_left_outer_join_state_expiry(spark, tmp_path):
    """VERDICT r6 #7: left-outer stream-stream interval join — the
    attribution-LOSS report. A click with no purchase inside its
    interval emits with NULL right columns, but only AFTER the
    watermark passes the interval end (the state store proves no match
    is coming and evicts the row). Pinned across a RESTART: phase 1
    leaves the unmatched row pending in checkpointed state; phase 2
    (same checkpoint, new input advancing the watermark) recovers the
    state and emits it exactly once."""
    from iceberg_lakehouse_spark.streaming.events import (
        EVENTS_SCHEMA,
        correlate_event_streams,
        read_event_stream,
    )

    t0 = datetime.datetime(2024, 1, 1, 10, 0)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    clicks_dir = str(tmp_path / "lo_clicks")
    buys_dir = str(tmp_path / "lo_buys")
    out_dir = str(tmp_path / "lo_out")
    ckpt = str(tmp_path / "lo_ckpt")
    spark.createDataFrame([
        (1, at(0), 1, "click", 0.0, "{}"),   # matched by purchase 10
        (3, at(0), 3, "click", 0.0, "{}"),   # NEVER matched → loss row
    ], EVENTS_SCHEMA).write.parquet(clicks_dir)
    spark.createDataFrame([
        (10, at(20), 1, "purchase", 9.0, "{}"),
    ], EVENTS_SCHEMA).write.parquet(buys_dir)

    def _run():
        joined = correlate_event_streams(
            read_event_stream(spark, clicks_dir),
            read_event_stream(spark, buys_dir),
            within="30 minutes",
            watermark="10 minutes",
            how="left_outer",
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    _run()
    got1 = {r["left_event_id"]: r for r in spark.read.parquet(out_dir).collect()}
    # the inner match emits; the unmatched click must NOT have emitted
    # yet — watermark (max 20m − 10m = 10m) has not passed its
    # interval end (0m + 30m), so the row is still pending in state
    assert 1 in got1 and got1[1]["right_event_id"] == 10
    assert 3 not in got1
    # RESTART with watermark-advancing events on BOTH streams (the
    # global watermark is the MIN across the two watermark operators —
    # advancing only one side holds eviction back, by design)
    spark.createDataFrame([
        (99, at(120), 1, "purchase", 1.0, "{}"),
    ], EVENTS_SCHEMA).write.parquet(buys_dir, mode="append")
    spark.createDataFrame([
        (98, at(120), 9, "click", 0.0, "{}"),
    ], EVENTS_SCHEMA).write.parquet(clicks_dir, mode="append")
    _run()
    rows = spark.read.parquet(out_dir).collect()
    loss = [r for r in rows if r["left_event_id"] == 3]
    assert len(loss) == 1, rows  # exactly once, recovered across restart
    assert loss[0]["right_event_id"] is None
    assert loss[0]["right_ts"] is None
    assert loss[0]["lag_seconds"] is None
    assert loss[0]["user_id"] == 3
    # the matched click never duplicates
    assert len([r for r in rows if r["left_event_id"] == 1
                and r["right_event_id"] == 10]) == 1
    # no spurious matches ever appear for the loss click
    assert all(r["right_event_id"] is None
               for r in rows if r["left_event_id"] == 3)


class TestSpanDedupStream:
    """Streaming substring-level dedup (r10): repeated >=n-token spans
    from earlier batches (or the built corpus) are CUT from new docs,
    replay-safe under the index-ahead discipline."""

    CORPUS = ("alpha beta gamma delta epsilon zeta eta theta "
              "iota kappa unique corpus tail words here")

    def _corpus_and_index(self, spark, wh):
        from iceberg_lakehouse_spark.catalog import LakehouseCatalog
        from iceberg_lakehouse_spark.operators.dedup_index import (
            build_span_index,
        )

        cat = LakehouseCatalog(spark, wh)
        t = cat.create_table(
            "span_corpus",
            [("doc_id", "long"), ("n_tokens", "long"),
             ("removed_tokens", "long"), ("kept_tokens", "long"),
             ("dedup_text", "string")],
        )
        toks = self.CORPUS.split()
        t.append(spark.createDataFrame(
            [(1, len(toks), 0, len(toks), self.CORPUS)],
            t.scan().schema))
        idx = build_span_index(
            cat, "span_corpus_grams",
            spark.createDataFrame([(1, self.CORPUS)],
                                  "doc_id long, text string"),
            "doc_id", "text", n=8)
        return t, idx

    def test_cross_batch_span_cut(self, spark, tmp_path, tmp_warehouse):
        from iceberg_lakehouse_spark.streaming.sink import (
            span_dedup_stream_to_table,
        )

        t, idx = self._corpus_and_index(spark, tmp_warehouse)
        n_idx0 = idx.scan().count()
        # batch 1: doc 10 embeds the corpus's first 8-token span inside
        # novel prose (span cut, rest kept); docs 11/12 share a fresh
        # 8-token span intra-batch (11 keeps it, 12 loses it); doc 13
        # is fully novel
        shared = "one two three four five six seven eight"
        corpus_span = " ".join(self.CORPUS.split()[:8])
        rows1 = [
            (10, f"brand new opening {corpus_span} brand new closing"),
            (11, f"{shared} eleven custom suffix trail"),
            (12, f"{shared} twelve other suffix trail"),
            (13, "thirteen totally original words nothing repeated at all"),
        ]
        d1 = str(tmp_path / "sp1")
        spark.createDataFrame(rows1, "doc_id long, text string") \
            .write.parquet(d1)
        q = span_dedup_stream_to_table(
            spark.readStream.schema("doc_id long, text string").parquet(d1),
            t, idx, "doc_id", "text",
            checkpoint_dir=str(tmp_path / "ck1"), available_now=True)
        q.awaitTermination(180)
        got = {r["doc_id"]: r for r in t.scan().collect()}
        assert set(got) == {1, 10, 11, 12, 13}
        assert got[10]["removed_tokens"] == 8
        assert corpus_span not in got[10]["dedup_text"]
        assert got[10]["dedup_text"].startswith("brand new opening")
        assert got[11]["removed_tokens"] == 0       # intra-batch keeper
        assert got[12]["removed_tokens"] == 8       # lost to keeper 11
        assert shared in got[11]["dedup_text"]
        assert shared not in got[12]["dedup_text"]
        assert got[13]["removed_tokens"] == 0
        assert idx.scan().count() > n_idx0          # index grew

        # batch 2: doc 20 repeats batch-1 SURVIVOR 11's span → cut via
        # the extended index (cross-batch); doc 21 novel
        rows2 = [
            (20, f"{shared} twenty brand different ending words"),
            (21, "twenty one has nothing in common with anything"),
        ]
        d2 = str(tmp_path / "sp2")
        spark.createDataFrame(rows2, "doc_id long, text string") \
            .write.parquet(d2)
        q2 = span_dedup_stream_to_table(
            spark.readStream.schema("doc_id long, text string").parquet(d2),
            t, idx, "doc_id", "text",
            checkpoint_dir=str(tmp_path / "ck2"), available_now=True)
        q2.awaitTermination(180)
        got2 = {r["doc_id"]: r for r in t.scan().collect()}
        assert got2[20]["removed_tokens"] == 8
        assert shared not in got2[20]["dedup_text"]
        assert got2[21]["removed_tokens"] == 0

        # replay batch 2 (fresh checkpoint): landed ids filtered, no
        # duplicate rows, no index growth
        n_rows = t.scan().count()
        n_idx = idx.scan().count()
        q3 = span_dedup_stream_to_table(
            spark.readStream.schema("doc_id long, text string").parquet(d2),
            t, idx, "doc_id", "text",
            checkpoint_dir=str(tmp_path / "ck3"), available_now=True)
        q3.awaitTermination(180)
        assert t.scan().count() == n_rows
        assert idx.scan().count() == n_idx

    def test_replay_after_index_ahead_crash_keeps_own_spans(
        self, spark, tmp_path, tmp_warehouse
    ):
        """THE replay-safety property the unified keeper rule buys: a
        crash that indexed a batch's grams but never landed its docs
        must NOT cause the replay to cut the docs against their own
        ghost grams."""
        from iceberg_lakehouse_spark.streaming.sink import (
            span_dedup_stream_to_table,
        )

        t, idx = self._corpus_and_index(spark, tmp_warehouse)
        doc = (30, "thirty distinct tokens forming one long novel "
                   "span that repeats nowhere else at all")
        # crash state: grams indexed with keeper 30, doc never landed
        from iceberg_lakehouse_spark.functions.dedup_text import (
            _span_grams,
            _span_tokens,
        )
        from pyspark.sql import functions as F

        g = (_span_grams(_span_tokens(
                spark.createDataFrame([doc], "doc_id long, text string"),
                "doc_id", "text"), 8)
             .select(F.xxhash64("g").alias("gh"),
                     F.col("_id").cast("long").alias("id"))
             .groupBy("gh").agg(F.min("id").alias("id")))
        idx.append(g)
        d = str(tmp_path / "sp_crash")
        spark.createDataFrame([doc], "doc_id long, text string") \
            .write.parquet(d)
        q = span_dedup_stream_to_table(
            spark.readStream.schema("doc_id long, text string").parquet(d),
            t, idx, "doc_id", "text",
            checkpoint_dir=str(tmp_path / "ckc"), available_now=True)
        q.awaitTermination(180)
        got = {r["doc_id"]: r for r in t.scan().collect()}
        assert 30 in got
        assert got[30]["removed_tokens"] == 0        # NOT self-masked
        assert got[30]["dedup_text"].startswith("thirty distinct")


def test_streaming_span_entry_handles_edge_whitespace(spark):
    """r10 third-review regression: a doc whose text ends in
    whitespace must tokenize identically through the Spark sink's
    rebuilt-gram extension and the oracle's SQL unroll (the unroll
    originally re-tokenized dedup_text without trim and minted a
    phantom trailing-empty-token gram)."""
    import duckdb

    from iceberg_lakehouse_spark.functions.dedup_text import (
        _span_grams,
        _span_tokens,
    )

    # a rebuilt text whose last token was cut ends with a space
    dedup_text = "a b c d e f g h "
    sdf = spark.createDataFrame([(1, dedup_text)],
                                "doc_id long, text string")
    n_spark = _span_grams(_span_tokens(sdf, "doc_id", "text"), 8).count()
    con = duckdb.connect()
    with_trim = con.execute(r"""
        SELECT COUNT(*) FROM (
            SELECT unnest(range(1, len(t) - 6)) FROM (
                SELECT regexp_split_to_array(trim(?),
                       '[ \t\n\x0b\f\r]+') AS t) WHERE len(t) >= 8)
    """, [dedup_text]).fetchone()[0]
    without_trim = con.execute(r"""
        SELECT COUNT(*) FROM (
            SELECT unnest(range(1, len(t) - 6)) FROM (
                SELECT regexp_split_to_array(?,
                       '[ \t\n\x0b\f\r]+') AS t) WHERE len(t) >= 8)
    """, [dedup_text]).fetchone()[0]
    assert n_spark == with_trim == 1        # the oracle's fixed form
    assert without_trim == 2                # the phantom gram the old
    #                                         unroll would have minted
