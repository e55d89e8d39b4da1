"""CRUD + schema-alter + time-travel parity with the reference
behavioral corpus (reference tests/test_insert.py, test_update.py,
test_delete.py, test_upsert.py, test_schema.py, test_time_travel.py).

Ports the assertion CONTENT not already pinned elsewhere: guard-raise
messages (empty filter / empty updates / unknown column / empty or
invalid upsert keys), value semantics (update-to-null, quoted strings,
date objects, type coercion), alter_table dispatcher raises, and
snapshot-field shapes.
"""

from __future__ import annotations

import datetime

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.operators import crud


@pytest.fixture
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "lake"))


@pytest.fixture
def expenses(catalog):
    t = catalog.create_table(
        "expenses",
        [("id", "long"), ("date", "date"), ("category", "string"),
         ("description", "string"), ("amount", "double"), ("currency", "string")],
    )
    crud.insert_rows(t, [
        {"id": 1, "date": "2025-01-01", "category": "food",
         "description": "lunch", "amount": 12.5, "currency": "USD"},
        {"id": 2, "date": "2025-01-02", "category": "transport",
         "description": "bus", "amount": 2.75, "currency": "USD"},
        {"id": 3, "date": "2025-01-03", "category": "food",
         "description": "dinner", "amount": 30.0, "currency": "EUR"},
    ])
    return t


# --- insert value semantics (test_insert.py:89-127) ---


class TestInsertValues:
    def test_insert_with_date_objects(self, expenses):
        n = crud.insert_rows(expenses, [{
            "id": 400, "date": datetime.date(2025, 6, 15),
            "category": "date_test", "amount": 100.0, "currency": "USD",
        }])
        assert n == 1
        assert expenses.scan().where("id = 400").count() == 1

    def test_insert_with_type_coercion(self, expenses):
        """String numbers coerce to the column types (test_insert.py:108)."""
        n = crud.insert_rows(expenses, [{
            "id": "500", "amount": "75.25",
            "category": "coercion_test", "currency": "USD",
        }])
        assert n == 1
        row = expenses.scan().where("id = 500").collect()[0]
        assert row["id"] == 500
        assert row["amount"] == 75.25

    def test_insert_missing_optional_fields_are_null(self, expenses):
        crud.insert_rows(expenses, [{"id": 600, "amount": 1.0}])
        row = expenses.scan().where("id = 600").collect()[0]
        assert row["category"] is None
        assert row["currency"] is None

    def test_insert_empty_rows(self, expenses):
        assert crud.insert_rows(expenses, []) == 0


# --- update semantics (test_update.py:104-206) ---


class TestUpdateSemantics:
    def test_update_to_null(self, expenses):
        n = crud.update_rows(expenses, "id = 1", {"description": None})
        assert n == 1
        assert expenses.scan().where("id = 1").collect()[0]["description"] is None

    def test_update_with_string_containing_quotes(self, expenses):
        n = crud.update_rows(
            expenses, "id = 2", {"description": "Bob's \"special\" ride"}
        )
        assert n == 1
        got = expenses.scan().where("id = 2").collect()[0]["description"]
        assert got == "Bob's \"special\" ride"

    def test_update_empty_filter_raises(self, expenses):
        with pytest.raises(ValueError, match="Filter expression is required"):
            crud.update_rows(expenses, "", {"amount": 10.0})

    def test_update_empty_updates_raises(self, expenses):
        with pytest.raises(ValueError, match="Updates dictionary cannot be empty"):
            crud.update_rows(expenses, "id = 1", {})

    def test_update_nonexistent_column_raises(self, expenses):
        with pytest.raises(ValueError, match="does not exist"):
            crud.update_rows(expenses, "id = 1", {"nonexistent_col": 10})

    def test_update_with_and_filter(self, expenses):
        n = crud.update_rows(
            expenses, "category = 'food' AND amount > 20", {"currency": "GBP"}
        )
        assert n == 1
        assert expenses.scan().where("currency = 'GBP'").collect()[0]["id"] == 3

    def test_update_preserves_other_rows(self, expenses):
        crud.update_rows(expenses, "id = 1", {"amount": 99.0})
        rows = {r["id"]: r["amount"] for r in expenses.scan().collect()}
        assert rows[1] == 99.0
        assert rows[2] == 2.75
        assert rows[3] == 30.0


# --- delete semantics (test_delete.py:86-113) ---


class TestDeleteSemantics:
    def test_delete_empty_filter_raises(self, expenses):
        with pytest.raises(ValueError, match="Filter expression is required"):
            crud.delete_rows(expenses, "")

    def test_delete_no_match_returns_zero(self, expenses):
        assert crud.delete_rows(expenses, "id = 9999") == 0

    def test_delete_with_and_filter_preserves_others(self, expenses):
        n = crud.delete_rows(expenses, "category = 'food' AND currency = 'EUR'")
        assert n == 1
        ids = {r["id"] for r in expenses.scan().collect()}
        assert ids == {1, 2}


# --- upsert guards (test_upsert.py:74-93) ---


class TestUpsertGuards:
    def test_upsert_empty_rows_returns_zeros(self, expenses):
        result = crud.upsert_rows(expenses, [], ["id"])
        assert result["inserted"] == 0
        assert result["updated"] == 0

    def test_upsert_empty_key_columns_raises(self, expenses):
        with pytest.raises(ValueError, match="key_columns must not be empty"):
            crud.upsert_rows(expenses, [{"id": 1}], [])

    def test_upsert_invalid_key_column_raises(self, expenses):
        with pytest.raises(ValueError, match="does not exist"):
            crud.upsert_rows(expenses, [{"id": 1}], ["nonexistent"])

    def test_upsert_preserves_unmatched_existing_rows(self, expenses):
        crud.upsert_rows(
            expenses,
            [{"id": 1, "amount": 50.0}, {"id": 9, "amount": 9.0}],
            ["id"],
        )
        rows = {r["id"]: r["amount"] for r in expenses.scan().collect()}
        assert rows[1] == 50.0
        assert rows[2] == 2.75  # untouched
        assert rows[3] == 30.0  # untouched
        assert rows[9] == 9.0


# --- schema alter (test_schema.py:11-90) ---


class TestSchemaAlter:
    def test_add_column_all_types(self, expenses):
        for col_type in ["string", "long", "double", "date", "timestamp"]:
            expenses.add_column(f"test_{col_type}", col_type)
        names = [f.name for f in expenses.schema().fields]
        assert "test_string" in names and "test_timestamp" in names

    def test_add_column_invalid_type_raises(self, expenses):
        with pytest.raises(ValueError, match="Unsupported column type"):
            expenses.add_column("new_col", "invalid_type")

    def test_drop_missing_column_raises(self, expenses):
        with pytest.raises(ValueError, match="does not exist"):
            expenses.drop_column("ghost")

    def test_rename_missing_column_raises(self, expenses):
        with pytest.raises(ValueError, match="does not exist"):
            expenses.rename_column("ghost", "new")

    def test_add_column_then_insert(self, expenses):
        expenses.add_column("note", "string")
        crud.insert_rows(expenses, [{"id": 700, "amount": 1.0, "note": "hi"}])
        assert expenses.scan().where("note = 'hi'").count() == 1
        # pre-existing rows read NULL for the new column
        assert expenses.scan().where("note IS NULL").count() == 3


# --- time travel (test_time_travel.py:21-112) ---


class TestTimeTravel:
    def test_list_snapshots_empty_table(self, catalog):
        t = catalog.create_table("empty_tt", [("id", "long")])
        assert t.snapshots() == []

    def test_snapshot_fields(self, expenses):
        snap = expenses.snapshots()[0].to_json()
        assert "snapshot_id" in snap
        assert "timestamp_ms" in snap
        assert "operation" in snap
        assert isinstance(snap["snapshot_id"], int)

    def test_scan_as_of_snapshot_id_excludes_later_rows(self, expenses):
        first = expenses.snapshots()[-1].snapshot_id
        crud.insert_rows(expenses, [{"id": 4031, "amount": 20.0}])
        ids = {r["id"] for r in expenses.scan(as_of=str(first)).collect()}
        assert 1 in ids
        assert 4031 not in ids

    def test_scan_as_of_future_timestamp_includes_all(self, expenses):
        future = (
            datetime.datetime.now(datetime.timezone.utc)
            + datetime.timedelta(hours=1)
        ).isoformat()
        ids = {r["id"] for r in expenses.scan(as_of=future).collect()}
        assert ids == {1, 2, 3}

    def test_scan_as_of_invalid_snapshot_raises(self, expenses):
        with pytest.raises(ValueError):
            expenses.scan(as_of="999999999999").collect()
