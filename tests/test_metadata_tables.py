"""Iceberg-inspect metadata tables (round 7 completion): __refs,
__delete_files, __partitions join the existing __snapshots / __files /
__history views (reference catalog.py:204-237 exposes the PyIceberg
inspect trio; refs/delete_files/partitions are the Iceberg-spec
metadata tables the reference lacks but an Iceberg user expects).
Metadata is O(snapshots + files) — driver-small by construction."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.operators import crud
from iceberg_lakehouse_spark.plans.engine import QueryEngine

MOR_PROPS = {"write.delete.mode": "merge-on-read"}


@pytest.fixture()
def cat(spark, tmp_warehouse):
    return LakehouseCatalog(spark, tmp_warehouse)


def _seed(cat, name="default.meta_t", props=None, partition_by=None):
    t = cat.create_table(
        name, [("id", "long"), ("grp", "string"), ("v", "string")],
        properties=dict(props or {}), partition_by=partition_by,
    )
    crud.insert_rows(t, [
        {"id": i, "grp": "a" if i % 2 else "b", "v": f"v{i}"}
        for i in range(8)
    ])
    return t


def test_refs_df_lists_main_branches_tags(cat):
    t = _seed(cat)
    t.create_branch("audit")
    t.create_tag("v1.0")
    rows = {(r["name"], r["type"]): r["snapshot_id"]
            for r in t.refs_df().collect()}
    head = t.current_snapshot().snapshot_id
    assert rows[("main", "BRANCH")] == head
    assert rows[("audit", "BRANCH")] == head
    assert rows[("v1.0", "TAG")] == head
    # branch commit advances only that ref's row
    t.for_branch("audit").append(
        t.spark.createDataFrame([(99, "a", "x")], "id long, grp string, v string"))
    rows2 = {(r["name"], r["type"]): r["snapshot_id"]
             for r in t.refs_df().collect()}
    assert rows2[("main", "BRANCH")] == head
    assert rows2[("audit", "BRANCH")] != head
    assert rows2[("v1.0", "TAG")] == head


def test_delete_files_df_both_kinds(cat):
    t = _seed(cat, props=MOR_PROPS)
    assert t.delete_files_df().count() == 0
    crud.delete_rows(t, "id = 3")          # position delete (MoR)
    crud.delete_rows_by_key(t, [{"id": 5}])  # equality delete
    rows = {r["content"]: r for r in t.delete_files_df().collect()}
    assert set(rows) == {"POSITION_DELETES", "EQUALITY_DELETES"}
    pos, eq = rows["POSITION_DELETES"], rows["EQUALITY_DELETES"]
    assert pos["size_bytes"] > 0 and pos["equality_columns"] is None
    assert eq["equality_columns"] == ["id"]
    assert eq["data_sequence"] == t.current_snapshot().snapshot_id
    assert {pos["snapshot_id"], eq["snapshot_id"]} == {
        t.current_snapshot().snapshot_id}
    # historical snapshot: no delete files yet
    first = t.snapshots()[0].snapshot_id
    assert t.delete_files_df(snapshot_id=first).count() == 0
    # table reads reflect both kinds
    assert sorted(r["id"] for r in t.scan().collect()) == [0, 1, 2, 4, 6, 7]


def test_partitions_df_matches_partition_stats(cat):
    t = _seed(cat, name="default.meta_p", partition_by=["grp"])
    rows = sorted(
        (r["partition"], r["file_count"], r["size_bytes"])
        for r in t.partitions_df().collect()
    )
    stats = sorted(
        (e["partition"], e["file_count"], e["bytes"])
        for e in t.partition_stats()
    )
    assert rows == stats
    assert len(rows) == 2 and all(b > 0 for _, _, b in rows)
    # unpartitioned table reports the sentinel partition
    t2 = _seed(cat, name="default.meta_u")
    parts = [r["partition"] for r in t2.partitions_df().collect()]
    assert parts == ["<unpartitioned>"]


def test_new_metadata_views_sql_queryable(cat):
    t = _seed(cat, name="default.meta_sql", props=MOR_PROPS,
              partition_by=["grp"])
    t.create_tag("rel")
    crud.delete_rows(t, "id = 1")
    eng = QueryEngine(cat)
    refs = eng.execute(
        "SELECT name, type FROM meta_sql__refs ORDER BY name").collect()
    assert [(r["name"], r["type"]) for r in refs] == [
        ("main", "BRANCH"), ("rel", "TAG")]
    dels = eng.execute(
        "SELECT content, size_bytes FROM meta_sql__delete_files").collect()
    assert [r["content"] for r in dels] == ["POSITION_DELETES"]
    assert dels[0]["size_bytes"] > 0
    nparts = eng.execute(
        "SELECT count(*) AS n FROM meta_sql__partitions").collect()[0]["n"]
    assert nparts == 2
    # joinable against __files: per-partition file list agrees
    joined = eng.execute(
        "SELECT p.partition, count(*) AS n FROM meta_sql__partitions p "
        "JOIN meta_sql__files f ON f.partition = p.partition "
        "GROUP BY p.partition ORDER BY p.partition").collect()
    stats = {e["partition"]: e["file_count"] for e in t.partition_stats()}
    assert {r["partition"]: r["n"] for r in joined} == stats


def test_inspect_metadata_table_tool(tmp_path):
    import json

    from iceberg_lakehouse_spark.server import LakehouseServer

    server = LakehouseServer(home=str(tmp_path / "home"))

    def call(name, args):
        resp = server.handle_request({
            "jsonrpc": "2.0", "id": 1, "method": "tools/call",
            "params": {"name": name, "arguments": args}})
        result = resp["result"]
        payload = (json.loads(result["content"][0]["text"])
                   if not result["isError"] else result["content"][0]["text"])
        return result["isError"], payload

    call("create_table", {"table": "insp_t",
                          "schema": [["id", "long"], ["v", "string"]]})
    call("insert", {"table": "insp_t",
                    "rows": [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]})
    call("tag_create", {"table": "insp_t", "name": "r1"})
    for name, expect in [
        ("snapshots", {1}), ("files", None), ("history", {1}),
        ("refs", {2}), ("delete_files", {0}), ("partitions", {1}),
    ]:
        is_err, rows = call("inspect_metadata_table",
                            {"table": "insp_t", "name": name})
        assert not is_err, (name, rows)
        # files: one snapshot, writer-parallelism-many part files
        assert len(rows) >= 1 if expect is None else len(rows) in expect, (
            name, rows)
        assert all(isinstance(r, dict) for r in rows)
    # timestamps serialize as ISO strings (JSON-safe)
    _, snaps = call("inspect_metadata_table",
                    {"table": "insp_t", "name": "snapshots"})
    assert isinstance(snaps[0]["committed_at"], str)
    is_err, msg = call("inspect_metadata_table",
                       {"table": "insp_t", "name": "bogus"})
    assert is_err and "unknown metadata table" in msg
