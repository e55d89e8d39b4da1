"""QueryEngine + CRUD behavioral tests: auto-LIMIT, time travel without
driver collect, cached-execution keying (the r1 truncation bug), CRUD
error paths and count semantics."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance.queries_store import QueryCache, SavedQueries
from iceberg_lakehouse_spark.operators import crud
from iceberg_lakehouse_spark.plans.engine import QueryEngine

SCHEMA = [("id", "long"), ("name", "string"), ("value", "double")]


@pytest.fixture()
def catalog(spark, tmp_warehouse):
    return LakehouseCatalog(spark, tmp_warehouse)


@pytest.fixture()
def metrics(catalog):
    t = catalog.create_table("metrics", SCHEMA)
    crud.insert_rows(t, [
        {"id": i, "name": f"n{i}", "value": float(i)} for i in range(1, 21)
    ])
    return t


class TestAutoLimit:
    def test_select_gets_limited(self, catalog, metrics):
        eng = QueryEngine(catalog, max_rows=5)
        assert eng.execute("SELECT * FROM metrics").count() == 5

    def test_explicit_limit_wins(self, catalog, metrics):
        eng = QueryEngine(catalog, max_rows=5)
        assert eng.execute("SELECT * FROM metrics LIMIT 8").count() == 8

    def test_max_rows_override(self, catalog, metrics):
        eng = QueryEngine(catalog, max_rows=5)
        assert eng.execute("SELECT * FROM metrics", max_rows=3).count() == 3

    def test_cte_also_limited(self, catalog, metrics):
        eng = QueryEngine(catalog, max_rows=5)
        sql = "WITH x AS (SELECT * FROM metrics) SELECT * FROM x"
        assert eng.execute(sql).count() == 5

    def test_namespace_alias_view(self, catalog, metrics):
        eng = QueryEngine(catalog)
        assert eng.execute("SELECT count(*) AS n FROM default__metrics") \
            .collect()[0]["n"] == 20


class TestIncrementalRegistration:
    def test_unchanged_tables_skip_reregistration(self, catalog, metrics):
        """r2 ADVICE: execute() re-registered (and rebuilt metadata views
        for) every table on every query. Unchanged stamps must skip."""
        eng = QueryEngine(catalog)
        eng.execute("SELECT 1").collect()
        stamps = dict(eng._reg_stamps)
        calls = []
        orig = catalog.load_table

        def spy(name):
            t = orig(name)
            real = t.snapshots_df
            t.snapshots_df = lambda: calls.append(name) or real()
            return t

        catalog.load_table = spy
        eng.execute("SELECT count(*) FROM metrics").collect()
        assert calls == [], "no metadata-view rebuild for unchanged tables"
        assert eng._reg_stamps == stamps

    def test_new_snapshot_refreshes_view(self, catalog, metrics):
        """...but a commit between queries must still surface: the stamp
        changes, so the view re-binds to the new snapshot without an
        explicit refresh()."""
        eng = QueryEngine(catalog)
        assert eng.execute("SELECT count(*) AS n FROM metrics") \
            .collect()[0]["n"] == 20
        crud.insert_rows(metrics, [{"id": 99, "name": "new", "value": 1.0}])
        assert eng.execute("SELECT count(*) AS n FROM metrics") \
            .collect()[0]["n"] == 21

    def test_new_table_registers_without_refresh(self, catalog, metrics):
        eng = QueryEngine(catalog)
        eng.execute("SELECT 1").collect()
        t2 = catalog.create_table("late_arrival", SCHEMA)
        crud.insert_rows(t2, [{"id": 1, "name": "a", "value": 2.0}])
        assert eng.execute("SELECT count(*) AS n FROM late_arrival") \
            .collect()[0]["n"] == 1


class TestTimeTravel:
    def test_as_of_binds_history_and_restores_current(self, catalog, metrics):
        eng = QueryEngine(catalog)
        first = metrics.current_snapshot().snapshot_id
        crud.insert_rows(metrics, [{"id": 99, "name": "late", "value": 99.0}])
        eng.refresh()
        hist = eng.execute_as_of(
            "SELECT count(*) AS n FROM metrics", "default.metrics", str(first)
        )
        assert hist.collect()[0]["n"] == 20
        # current view binding restored afterwards
        assert eng.execute("SELECT count(*) AS n FROM metrics") \
            .collect()[0]["n"] == 21

    def test_as_of_iso_timestamp(self, catalog, metrics):
        import datetime

        eng = QueryEngine(catalog)
        snap = metrics.current_snapshot()
        ts = datetime.datetime.fromtimestamp(
            snap.timestamp_ms / 1000 + 1, tz=datetime.timezone.utc
        ).isoformat()
        df = eng.execute_as_of("SELECT count(*) AS n FROM metrics",
                               "default.metrics", ts)
        assert df.collect()[0]["n"] == 20


class TestExecuteCached:
    def test_truncated_result_not_served_for_larger_request(
        self, catalog, metrics, tmp_path
    ):
        """r1 ADVICE: cache key must include the effective row cap."""
        eng = QueryEngine(
            catalog,
            history=SavedQueries(str(tmp_path / "q.json")),
            query_cache=QueryCache(str(tmp_path / "c.json")),
        )
        small = eng.execute_cached("SELECT * FROM metrics", max_rows=3)
        assert len(small) == 3
        large = eng.execute_cached("SELECT * FROM metrics", max_rows=100)
        assert len(large) == 20

    def test_cache_hit_same_cap(self, catalog, metrics, tmp_path):
        qc = QueryCache(str(tmp_path / "c.json"))
        eng = QueryEngine(catalog, query_cache=qc)
        eng.execute_cached("SELECT * FROM metrics", max_rows=3)
        eng.execute_cached("SELECT * FROM metrics", max_rows=3)
        assert qc.stats()["hits"] == 1

    def test_history_records(self, catalog, metrics, tmp_path):
        sq = SavedQueries(str(tmp_path / "q.json"))
        eng = QueryEngine(catalog, history=sq)
        eng.execute_cached("SELECT id FROM metrics", max_rows=2)
        hist = sq.history()
        assert hist[0]["rows_returned"] == 2 and "SELECT id" in hist[0]["sql"]


class TestCrudSemantics:
    def test_insert_unknown_column_raises(self, metrics):
        with pytest.raises(ValueError, match="unknown columns"):
            crud.insert_rows(metrics, [{"id": 1, "ghost": 1}])

    def test_insert_empty_is_zero(self, metrics):
        assert crud.insert_rows(metrics, []) == 0

    def test_update_unknown_column_raises(self, metrics):
        with pytest.raises(ValueError, match="does not exist"):
            crud.update_rows(metrics, "id = 1", {"ghost": 1})

    def test_update_no_match_returns_zero_without_commit(self, metrics):
        snaps_before = len(metrics.snapshots())
        assert crud.update_rows(metrics, "id = 12345", {"value": 0.0}) == 0
        assert len(metrics.snapshots()) == snaps_before

    def test_delete_null_predicate_keeps_rows(self, metrics, catalog):
        crud.insert_rows(metrics, [{"id": 50, "name": None, "value": 1.0}])
        # predicate NULL for the name-IS-NULL row -> kept (SQL semantics)
        n = crud.delete_rows(metrics, "name = 'n1'")
        assert n == 1
        assert metrics.scan().where("id = 50").count() == 1

    def test_upsert_missing_key_raises(self, metrics):
        with pytest.raises(ValueError, match="missing key columns"):
            crud.upsert_rows(metrics, [{"id": None, "value": 1.0}], ["id"])

    def test_upsert_unknown_key_raises(self, metrics):
        with pytest.raises(ValueError, match="does not exist"):
            crud.upsert_rows(metrics, [{"id": 1}], ["ghost"])

    def test_upsert_counts_with_duplicate_existing_keys(self, metrics):
        """r1 ADVICE: duplicate existing keys must not drive inserted
        negative — matched count is of INCOMING rows."""
        crud.insert_rows(metrics, [
            {"id": 1, "name": "dup", "value": 1.0}  # id=1 now twice
        ])
        res = crud.upsert_rows(
            metrics, [{"id": 1, "name": "new", "value": 9.9}], ["id"]
        )
        assert res == {"updated": 1, "inserted": 0}
        rows = metrics.scan().where("id = 1").collect()
        assert len(rows) == 1 and rows[0]["name"] == "new"

    def test_execute_batch_skips_after_error(self, metrics):
        res = crud.execute_batch([
            (metrics, {"op": "insert", "rows": [{"id": 100, "name": "x", "value": 1.0}]}),
            (metrics, {"op": "bogus"}),
            (metrics, {"op": "insert", "rows": [{"id": 101, "name": "y", "value": 1.0}]}),
        ])
        assert [r["status"] for r in res] == ["ok", "error", "skipped"]
        assert metrics.scan().where("id = 101").count() == 0
