"""Python Data Source surface (sources/datasource.py): the
``format("lakehouse")`` batch + streaming reader. Batch reads must
match `LakeTable.scan` exactly (incl. merge-on-read deletes, equality
deletes, time travel); pushed filters must provably PRUNE files
(asserted by making a should-be-pruned file unreadable); the stream
must tail the commit log across restarts and honor the rewrite
contract."""

from __future__ import annotations

import os

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.operators import crud
from iceberg_lakehouse_spark.sources.datasource import (
    LakehouseDataSource,
    register_lakehouse_source,
)

MOR = {"write.delete.mode": "merge-on-read",
       "write.update.mode": "merge-on-read"}


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_lakehouse_source(spark)


def _read(spark, wh, table, **opts):
    r = spark.read.format("lakehouse").option("warehouse", wh)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load(table)


def _seed(spark, wh, props=None, name="default.ds"):
    cat = LakehouseCatalog(spark, wh)
    t = cat.create_table(name, [("id", "long"), ("v", "string")],
                         properties=dict(props or {}))
    t.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "id long, v string"))
    return t


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_batch_matches_scan(spark, tmp_warehouse):
    t = _seed(spark, tmp_warehouse)
    t.append(spark.createDataFrame([(100, "x"), (101, "y")],
                                   "id long, v string"))
    df = _read(spark, tmp_warehouse, "default.ds")
    assert df.schema == t.scan().schema
    assert sorted(map(tuple, df.collect())) == \
        sorted(map(tuple, t.scan().collect()))


def test_mor_deletes_applied(spark, tmp_warehouse):
    t = _seed(spark, tmp_warehouse, props=MOR)
    crud.delete_rows(t, "id < 10")
    crud.update_rows(t, "id = 50", {"v": "FIFTY"})
    df = _read(spark, tmp_warehouse, "default.ds")
    got = {r["id"]: r["v"] for r in df.collect()}
    assert len(got) == 90 and 0 not in got and got[50] == "FIFTY"
    assert sorted(map(tuple, df.collect())) == \
        sorted(map(tuple, t.scan().collect()))


def test_equality_delete_sequence_semantics(spark, tmp_warehouse):
    """A key re-inserted AFTER its equality delete stays visible —
    data-sequence semantics must survive the Python reader."""
    t = _seed(spark, tmp_warehouse)
    crud.delete_rows_by_key(t, [{"id": 7}])
    t.append(spark.createDataFrame([(7, "reborn")], "id long, v string"))
    got = {r["id"]: r["v"]
           for r in _read(spark, tmp_warehouse, "default.ds").collect()}
    assert got[7] == "reborn" and len(got) == 100


def test_filter_pushdown_prunes_files(spark, tmp_warehouse):
    """Two appends with disjoint id ranges → two files with disjoint
    stats. Corrupt the high-range file on disk: a selective low-range
    read only succeeds if pruning really dropped the file BEFORE any
    byte of it was opened."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.pr", [("id", "long"), ("v", "string")])
    t.append(spark.createDataFrame(
        [(i, "lo") for i in range(100)], "id long, v string"))
    t.append(spark.createDataFrame(
        [(i, "hi") for i in range(1000, 1100)], "id long, v string"))
    hi_files = [f for f in t.current_snapshot().files
                if f not in t.snapshots()[0].files]
    assert hi_files
    for f in hi_files:
        with open(os.path.join(t.root, f), "wb") as fh:
            fh.write(b"corrupt")
    df = _read(spark, tmp_warehouse, "default.pr").where("id < 50")
    assert _ids(df) == list(range(50))
    with pytest.raises(Exception):  # unprunable read must hit the corruption
        _read(spark, tmp_warehouse, "default.pr").count()


def test_time_travel_and_ref(spark, tmp_warehouse):
    t = _seed(spark, tmp_warehouse)
    s0 = t.current_snapshot().snapshot_id
    t.create_tag("v1", snapshot_id=s0)
    t.append(spark.createDataFrame([(100, "x")], "id long, v string"))
    assert len(_ids(_read(spark, tmp_warehouse, "default.ds"))) == 101
    assert len(_ids(_read(spark, tmp_warehouse, "default.ds",
                          snapshot_id=s0))) == 100
    assert len(_ids(_read(spark, tmp_warehouse, "default.ds",
                          ref="v1"))) == 100


def test_schema_conformance_old_files(spark, tmp_warehouse):
    """Files written before an add_column are null-filled by the
    Arrow-side conform step, same as the JVM reader."""
    t = _seed(spark, tmp_warehouse)
    t.add_column("note", "string")
    t.append(spark.createDataFrame([(200, "x", "n")],
                                   "id long, v string, note string"))
    rows = {r["id"]: r["note"]
            for r in _read(spark, tmp_warehouse, "default.ds").collect()}
    assert rows[200] == "n" and rows[0] is None


def test_errors(spark, tmp_warehouse):
    with pytest.raises(Exception, match="not a lakehouse table"):
        _read(spark, tmp_warehouse, "default.nope").collect()
    _seed(spark, tmp_warehouse)
    with pytest.raises(Exception, match="not found"):
        _read(spark, tmp_warehouse, "default.ds", ref="ghost").collect()


def test_stream_tails_commits(spark, tmp_warehouse):
    t = _seed(spark, tmp_warehouse, name="default.st")
    q = (spark.readStream.format("lakehouse")
         .option("warehouse", tmp_warehouse).load("default.st")
         .writeStream.format("memory").queryName("lk_tail")
         .trigger(processingTime="0 seconds").start())
    try:
        q.processAllAvailable()
        assert spark.table("lk_tail").count() == 100
        t.append(spark.createDataFrame([(100, "x"), (101, "y")],
                                       "id long, v string"))
        q.processAllAvailable()
        assert spark.table("lk_tail").count() == 102
    finally:
        q.stop()


def test_stream_resumes_from_checkpoint(spark, tmp_warehouse, tmp_path):
    t = _seed(spark, tmp_warehouse, name="default.ck")
    ck = str(tmp_path / "ck")
    seen: list[list[int]] = []  # one entry per non-empty micro-batch

    def start():
        return (spark.readStream.format("lakehouse")
                .option("warehouse", tmp_warehouse).load("default.ck")
                .writeStream.foreachBatch(
                    lambda df, _id: seen.append(
                        sorted(r["id"] for r in df.collect())) or None)
                .option("checkpointLocation", ck)
                .trigger(processingTime="0 seconds").start())

    q = start()
    try:
        q.processAllAvailable()
        assert [i for b in seen for i in b] == list(range(100))
    finally:
        q.stop()
    t.append(spark.createDataFrame([(100, "x")], "id long, v string"))
    seen.clear()
    q = start()
    try:
        q.processAllAvailable()
        # the restarted stream must emit ONLY the new commit — its
        # start offset came from the checkpoint, not initialOffset
        assert [i for b in seen for i in b] == [100]
    finally:
        q.stop()


def test_stream_rewrite_contract(spark, tmp_warehouse):
    t = _seed(spark, tmp_warehouse, name="default.rw")
    q = (spark.readStream.format("lakehouse")
         .option("warehouse", tmp_warehouse).load("default.rw")
         .writeStream.format("memory").queryName("lk_rw")
         .trigger(processingTime="0 seconds").start())
    try:
        q.processAllAvailable()
        crud.update_rows(t, "id = 1", {"v": "ONE"})  # CoW rewrite
        with pytest.raises(Exception, match="append-only|rewrote"):
            q.processAllAvailable()
            raise RuntimeError(str(q.exception() or "no failure"))
    finally:
        q.stop()
    # skip mode sails past the rewrite and picks up later appends
    q2 = (spark.readStream.format("lakehouse")
          .option("warehouse", tmp_warehouse)
          .option("on_rewrite", "skip").load("default.rw")
          .writeStream.format("memory").queryName("lk_rw2")
          .trigger(processingTime="0 seconds").start())
    try:
        q2.processAllAvailable()
        t.append(spark.createDataFrame([(500, "z")], "id long, v string"))
        q2.processAllAvailable()
        assert 500 in _ids(spark.table("lk_rw2"))
    finally:
        q2.stop()


def _write(df, wh, table, mode="append"):
    (df.write.format("lakehouse").option("warehouse", wh)
     .mode(mode).save(table))


def test_batch_write_append_and_overwrite(spark, tmp_warehouse):
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.w", [("id", "long"), ("v", "string")])
    _write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
           tmp_warehouse, "default.w")
    _write(spark.createDataFrame([(3, "c")], "id long, v string"),
           tmp_warehouse, "default.w")
    assert _ids(t.scan()) == [1, 2, 3]
    snaps = t.snapshots()
    assert [s.operation for s in snaps] == ["append", "append"]
    assert snaps[-1].summary["via"] == "python-datasource"
    assert snaps[-1].summary["added_rows"] == 1
    # stats were recorded at write time → a selective scan file-prunes
    kept, total = t.prune_files("id = 1")
    assert total >= 2 and len(kept) < total
    _write(spark.createDataFrame([(9, "z")], "id long, v string"),
           tmp_warehouse, "default.w", mode="overwrite")
    assert _ids(t.scan()) == [9]
    assert t.snapshots()[-1].operation == "overwrite"
    # time travel across the overwrite still sees the old rows
    assert _ids(t.scan(snapshot_id=snaps[-1].snapshot_id)) == [1, 2, 3]


def test_batch_write_schema_mismatch_rejected(spark, tmp_warehouse):
    cat = LakehouseCatalog(spark, tmp_warehouse)
    cat.create_table("default.w2", [("id", "long"), ("v", "string")])
    with pytest.raises(Exception, match="schema mismatch"):
        _write(spark.createDataFrame([(1,)], "id long"),
               tmp_warehouse, "default.w2")


def test_batch_write_roundtrip_with_catalog_writer(spark, tmp_warehouse):
    """DS-writer commits interleave with catalog commits through the
    same flock+CAS transaction — both land, nothing is lost."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.w3", [("id", "long"), ("v", "string")])
    t.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    _write(spark.createDataFrame([(2, "b")], "id long, v string"),
           tmp_warehouse, "default.w3")
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    assert _ids(t.scan()) == [1, 2, 3]
    assert len(t.snapshots()) == 3


def test_stream_write_sink(spark, tmp_warehouse, tmp_path):
    """Lakehouse→lakehouse streaming: tail one table's commit log,
    land each micro-batch as one atomic append in another."""
    src = _seed(spark, tmp_warehouse, name="default.src")
    cat = LakehouseCatalog(spark, tmp_warehouse)
    dst = cat.create_table("default.dst", [("id", "long"), ("v", "string")])
    q = (spark.readStream.format("lakehouse")
         .option("warehouse", tmp_warehouse).load("default.src")
         .writeStream.format("lakehouse")
         .option("warehouse", tmp_warehouse)
         .option("table", "default.dst")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(processingTime="0 seconds").start())
    try:
        q.processAllAvailable()
        assert _ids(dst.scan()) == list(range(100))
        src.append(spark.createDataFrame([(100, "x")], "id long, v string"))
        q.processAllAvailable()
        assert _ids(dst.scan()) == list(range(101))
        marker = dst.snapshots()[-1].summary["streaming"]
        assert marker["stream_id"] == "default" and "batch_id" in marker
    finally:
        q.stop()


def test_stream_write_replayed_epoch_is_idempotent(spark, tmp_warehouse):
    """At-least-once replay: committing the SAME epoch twice must land
    exactly one snapshot — the second commit finds the epoch marker in
    the log, discards its files, and leaves the table untouched."""
    import pyarrow as pa

    from iceberg_lakehouse_spark.sources.datasource import (
        LakehouseStreamWriter,
    )
    from pyspark.sql import types as T

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.rp", [("id", "long"), ("v", "string")])
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.StringType())])
    opts = {"warehouse": tmp_warehouse, "table": "default.rp"}
    batch = pa.record_batch({"id": [1, 2], "v": ["a", "b"]})

    w = LakehouseStreamWriter(opts, schema)
    w.commit([w.write(iter([batch]))], batchId=7)
    assert _ids(t.scan()) == [1, 2] and len(t.snapshots()) == 1
    # replay of epoch 7 (crash after commit, before checkpoint ack)
    w2 = LakehouseStreamWriter(opts, schema)
    msg = w2.write(iter([batch]))
    w2.commit([msg], batchId=7)
    assert _ids(t.scan()) == [1, 2] and len(t.snapshots()) == 1
    assert not os.path.exists(os.path.join(t.root, msg.rel_path))
    # the NEXT epoch lands normally
    w2.commit([w2.write(iter([batch]))], batchId=8)
    assert _ids(t.scan()) == [1, 1, 2, 2] and len(t.snapshots()) == 2


def test_stream_read_changes_cdf(spark, tmp_warehouse):
    """Streaming change-data-feed (read_changes=true): inserts for
    appends, delete events for MoR position deletes (pre-image
    values), delete+insert pairs for MoR updates, delete events for
    equality deletes — the streaming twin of
    governance.cdc.changelog_view, resolved file-side from the
    broadcast-small delete files."""
    t = _seed(spark, tmp_warehouse, props=MOR, name="default.cdf")
    q = (spark.readStream.format("lakehouse")
         .option("warehouse", tmp_warehouse)
         .option("read_changes", "true").load("default.cdf")
         .writeStream.format("memory").queryName("lk_cdf")
         .trigger(processingTime="0 seconds").start())
    try:
        q.processAllAvailable()
        base = spark.table("lk_cdf")
        assert base.count() == 100
        assert base.where("_change_type = 'insert'").count() == 100
        crud.delete_rows(t, "id < 3")
        crud.update_rows(t, "id = 50", {"v": "FIFTY"})
        crud.delete_rows_by_key(t, [{"id": 60}, {"id": 999}])
        q.processAllAvailable()
        ev = [(r["_change_type"], r["id"], r["v"])
              for r in spark.table("lk_cdf").collect()
              if r["_commit_snapshot_id"] > 1]
        assert sorted(ev) == [
            ("delete", 0, "v0"), ("delete", 1, "v1"), ("delete", 2, "v2"),
            ("delete", 50, "v50"), ("delete", 60, "v60"),
            ("insert", 50, "FIFTY"),
        ]
        # snapshot ids line up with the commit log
        snaps = {s.snapshot_id for s in t.snapshots()}
        got = {r["_commit_snapshot_id"]
               for r in spark.table("lk_cdf").collect()}
        assert got <= snaps
    finally:
        q.stop()


def test_cdf_does_not_reemit_dead_rows(spark, tmp_warehouse):
    """An equality delete whose key row was ALREADY position-deleted
    must not re-emit it; re-inserting afterwards emits a fresh
    insert."""
    t = _seed(spark, tmp_warehouse, props=MOR, name="default.cdf2")
    crud.delete_rows(t, "id = 5")          # position delete
    q = (spark.readStream.format("lakehouse")
         .option("warehouse", tmp_warehouse)
         .option("read_changes", "true")
         .load("default.cdf2")
         .writeStream.format("memory").queryName("lk_cdf2")
         .trigger(processingTime="0 seconds").start())
    try:
        q.processAllAvailable()
        n0 = spark.table("lk_cdf2").count()
        crud.delete_rows_by_key(t, [{"id": 5}])  # eq-delete the SAME key
        q.processAllAvailable()
        assert spark.table("lk_cdf2").count() == n0  # nothing re-emitted
        t.append(spark.createDataFrame([(5, "back")], "id long, v string"))
        q.processAllAvailable()
        new = [(r["_change_type"], r["id"], r["v"])
               for r in spark.table("lk_cdf2").collect()][n0:]
        assert new == [("insert", 5, "back")]
    finally:
        q.stop()


def test_read_changes_is_streaming_only(spark, tmp_warehouse):
    _seed(spark, tmp_warehouse)
    with pytest.raises(Exception, match="STREAMING option"):
        _read(spark, tmp_warehouse, "default.ds",
              read_changes="true").collect()


def test_concurrent_ds_commits_all_land(spark, tmp_warehouse):
    """8 threads race pure-metadata DS-writer commits against catalog
    appends; the flock+CAS transaction must serialize them — every
    commit lands, no snapshot lost, row count exact."""
    import threading

    import pyarrow as pa

    from iceberg_lakehouse_spark.sources.datasource import (
        LakehouseBatchWriter,
    )
    from pyspark.sql import types as T

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.race", [("id", "long"), ("v", "string")])
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.StringType())])
    opts = {"warehouse": tmp_warehouse, "table": "default.race"}
    errors = []

    def ds_commit(i):
        try:
            w = LakehouseBatchWriter(opts, schema, overwrite=False)
            msg = w.write(iter([pa.record_batch(
                {"id": [1000 + i], "v": [f"t{i}"]})]))
            w.commit([msg])
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=ds_commit, args=(i,))
               for i in range(8)]
    for th in threads:
        th.start()
    t.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    for th in threads:
        th.join()
    t.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    assert not errors
    assert len(t.snapshots()) == 10  # 8 DS + 2 catalog commits
    assert _ids(t.scan()) == [1, 2] + [1000 + i for i in range(8)]


def test_small_file_coalescing(spark, tmp_warehouse):
    """Many small files pack into few read partitions (the
    maxPartitionBytes analogue) — correctness unchanged, incl. MoR
    deletes applied inside a packed partition."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.co", [("id", "long"), ("v", "string")],
                         properties=dict(MOR))
    for i in range(4):
        t.append(spark.createDataFrame(
            [(i * 10 + j, "x") for j in range(10)],
            "id long, v string").coalesce(1))
    assert len(t.current_snapshot().files) == 4
    crud.delete_rows(t, "id = 15")
    big = _read(spark, tmp_warehouse, "default.co")  # default 128MB cap
    assert big.rdd.getNumPartitions() == 1
    assert _ids(big) == [i for i in range(40) if i != 15]
    tiny = _read(spark, tmp_warehouse, "default.co",
                 max_partition_bytes="1")
    assert tiny.rdd.getNumPartitions() == 4
    assert _ids(tiny) == _ids(big)


def test_stream_expired_offset_fails_loudly(spark, tmp_warehouse, tmp_path):
    """A checkpointed offset whose snapshot was expired must raise —
    NOT silently re-emit the oldest retained snapshot's files."""
    t = _seed(spark, tmp_warehouse, name="default.exo")
    ck = str(tmp_path / "ck")

    def start():
        return (spark.readStream.format("lakehouse")
                .option("warehouse", tmp_warehouse).load("default.exo")
                .writeStream.foreachBatch(lambda df, _id: None)
                .option("checkpointLocation", ck)
                .trigger(processingTime="0 seconds").start())

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    for i in range(3):
        t.append(spark.createDataFrame([(200 + i, "x")],
                                       "id long, v string"))
    t.expire_snapshots(retain_last=1)
    q = start()
    try:
        with pytest.raises(Exception, match="no longer exists|expired"):
            q.processAllAvailable()
            raise RuntimeError(str(q.exception() or "no failure"))
    finally:
        q.stop()


def test_batch_write_abort_removes_files(spark, tmp_warehouse):
    """Spark calls abort() when a write job fails — staged part files
    must be removed and no snapshot committed."""
    import pyarrow as pa

    from iceberg_lakehouse_spark.sources.datasource import (
        LakehouseBatchWriter,
    )
    from pyspark.sql import types as T

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.ab", [("id", "long"), ("v", "string")])
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.StringType())])
    w = LakehouseBatchWriter(
        {"warehouse": tmp_warehouse, "table": "default.ab"}, schema, False)
    msg = w.write(iter([pa.record_batch({"id": [1], "v": ["a"]})]))
    staged = os.path.join(t.root, msg.rel_path)
    assert os.path.exists(staged)
    w.abort([msg, None])  # None = a task that never produced a message
    assert not os.path.exists(staged)
    assert t.current_snapshot() is None and t.scan().count() == 0


def test_stream_max_files_per_trigger(spark, tmp_warehouse):
    """Admission control: with max_files_per_trigger=1, a backlog of
    several one-file commits drains as several micro-batches — each
    batch carries exactly one commit's rows, in commit order, with
    nothing lost or duplicated."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.mft", [("id", "long"), ("v", "string")])
    batches: list[list[int]] = []
    q = (spark.readStream.format("lakehouse")
         .option("warehouse", tmp_warehouse)
         .option("max_files_per_trigger", "1")
         .load("default.mft")
         .writeStream.foreachBatch(
             lambda df, _id: batches.append(
                 sorted(r["id"] for r in df.collect())) or None)
         .trigger(processingTime="0 seconds").start())
    try:
        q.processAllAvailable()
        # build a 3-commit backlog while the stream idles between
        # triggers, then let it drain
        for k in range(3):
            t.append(spark.createDataFrame(
                [(k, f"v{k}")], "id long, v string").repartition(1))
        q.processAllAvailable()
        non_empty = [b for b in batches if b]
        # one commit per batch: the backlog was NOT coalesced into one
        assert non_empty == [[0], [1], [2]]
    finally:
        q.stop()


def test_stream_max_files_never_splits_a_commit(spark, tmp_warehouse):
    """A single commit larger than the cap is admitted whole (offsets
    are snapshot ids — a commit is atomic), and the stream still
    drains everything."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.mftbig", [("id", "long"), ("v", "string")])
    batches: list[list[int]] = []
    q = (spark.readStream.format("lakehouse")
         .option("warehouse", tmp_warehouse)
         .option("max_files_per_trigger", "2")
         .load("default.mftbig")
         .writeStream.foreachBatch(
             lambda df, _id: batches.append(
                 sorted(r["id"] for r in df.collect())) or None)
         .trigger(processingTime="0 seconds").start())
    try:
        q.processAllAvailable()
        t.append(spark.createDataFrame(
            [(i, f"v{i}") for i in range(4)], "id long, v string")
            .repartition(4))               # one 4-file commit > cap
        t.append(spark.createDataFrame(
            [(9, "x")], "id long, v string").repartition(1))
        q.processAllAvailable()
        non_empty = [b for b in batches if b]
        assert non_empty[0] == [0, 1, 2, 3]    # admitted whole
        assert [i for b in non_empty for i in b] == [0, 1, 2, 3, 9]
    finally:
        q.stop()


def test_stream_max_files_rejects_nonpositive(spark, tmp_warehouse):
    _seed(spark, tmp_warehouse, name="default.mftbad")
    q = (spark.readStream.format("lakehouse")
         .option("warehouse", tmp_warehouse)
         .option("max_files_per_trigger", "0")
         .load("default.mftbad")
         .writeStream.format("memory").queryName("mft_bad")
         .trigger(processingTime="0 seconds").start())
    try:
        with pytest.raises(Exception, match="max_files_per_trigger"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_stream_initial_backlog_exactly_once_then_capped(
    spark, tmp_warehouse
):
    """A backlog that exists before the stream starts drains in ONE
    (unbounded) first batch — the traced engine protocol polls
    latestOffset BEFORE initialOffset, so the reader cannot yet prove
    there is no checkpoint, and any offset behind a checkpoint would be
    recorded by Spark and replayed after a crash (duplicate delivery —
    strictly worse than a big batch). The cap binds from batch two, and
    nothing is lost or duplicated."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.mft0", [("id", "long"), ("v", "string")])
    for k in range(3):          # backlog exists before the stream starts
        t.append(spark.createDataFrame(
            [(k, f"v{k}")], "id long, v string").repartition(1))
    batches: list[list[int]] = []
    q = (spark.readStream.format("lakehouse")
         .option("warehouse", tmp_warehouse)
         .option("max_files_per_trigger", "1")
         .load("default.mft0")
         .writeStream.foreachBatch(
             lambda df, _id: batches.append(
                 sorted(r["id"] for r in df.collect())) or None)
         .trigger(processingTime="0 seconds").start())
    try:
        q.processAllAvailable()
        assert [i for b in batches for i in b] == [0, 1, 2]
        # post-backlog commits are capped: one commit per micro-batch
        t.append(spark.createDataFrame(
            [(7, "x")], "id long, v string").repartition(1))
        t.append(spark.createDataFrame(
            [(8, "y")], "id long, v string").repartition(1))
        q.processAllAvailable()
        tail = [b for b in batches if b and set(b) & {7, 8}]
        assert tail == [[7], [8]]
    finally:
        q.stop()


def test_stream_max_files_caps_after_restart(spark, tmp_warehouse, tmp_path):
    """Restart mid-backlog: exactly-once BEATS the cap. The Python
    stream API hides the checkpoint position from latestOffset, so a
    capped offset computed from the configured start could land BEHIND
    the checkpoint — Spark would record it and re-deliver committed
    snapshots. The contract is therefore: the first post-restart batch
    may exceed the cap (documented), every LATER batch is capped, and
    no row is ever delivered twice."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.mftr", [("id", "long"), ("v", "string")])
    ckpt = str(tmp_path / "ckpt")
    batches: list[list[int]] = []

    def _start():
        return (spark.readStream.format("lakehouse")
                .option("warehouse", tmp_warehouse)
                .option("max_files_per_trigger", "1")
                .load("default.mftr")
                .writeStream.option("checkpointLocation", ckpt)
                .foreachBatch(
                    lambda df, _id: batches.append(
                        sorted(r["id"] for r in df.collect())) or None)
                .trigger(processingTime="0 seconds").start())

    q = _start()
    try:
        t.append(spark.createDataFrame(
            [(0, "a")], "id long, v string").repartition(1))
        q.processAllAvailable()
    finally:
        q.stop()
    # build a 4-commit backlog while the stream is DOWN
    for k in range(1, 5):
        t.append(spark.createDataFrame(
            [(k, f"v{k}")], "id long, v string").repartition(1))
    q = _start()
    try:
        q.processAllAvailable()
        # exactly-once across the restart: every id exactly once, in order
        non_empty = [b for b in batches if b]
        assert [i for b in non_empty for i in b] == [0, 1, 2, 3, 4]
        # the backlog drained as the (unbounded) catch-up batch; a NEW
        # commit after the catch-up is capped again
        t.append(spark.createDataFrame(
            [(7, "x")], "id long, v string").repartition(1))
        t.append(spark.createDataFrame(
            [(8, "y")], "id long, v string").repartition(1))
        q.processAllAvailable()
        tail = [b for b in batches if b and set(b) & {7, 8}]
        assert tail == [[7], [8]]      # capped, one commit per batch
    finally:
        q.stop()


def test_stream_planned_floor_never_replays(tmp_warehouse, spark):
    """Unit guard for offset rollback: even if the engine ever hands
    partitions() a range starting BEHIND a previously planned end (the
    replay span an anomalous offset would produce), the floored start
    plans that span EMPTY instead of re-emitting committed files."""
    from iceberg_lakehouse_spark.sources.datasource import (
        LakehouseStreamReader,
    )
    from pyspark.sql import types as T

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.floor", [("id", "long")])
    snaps = []
    for k in range(3):
        t.append(spark.createDataFrame([(k,)], "id long").repartition(1))
        snaps.append(t.current_snapshot().snapshot_id)
    schema = T.StructType([T.StructField("id", T.LongType())])
    r = LakehouseStreamReader(
        {"warehouse": tmp_warehouse, "table": "default.floor"}, schema)
    first = r.partitions({"snapshot_id": 0},
                         {"snapshot_id": snaps[1]})
    assert first                                    # s0+s1 files planned
    # rollback attempt: a range that re-covers the already-planned s1
    replay = r.partitions({"snapshot_id": snaps[0]},
                          {"snapshot_id": snaps[2]})
    got = {os.path.basename(p.path) for p in replay}
    lt = cat.load_table("default.floor")
    s1_files = {
        os.path.basename(f)
        for f in set(lt.snapshot_by_id(snaps[1]).files)
        - set(lt.snapshot_by_id(snaps[0]).files)
    }
    assert s1_files and not (got & s1_files), "replayed planned files"
