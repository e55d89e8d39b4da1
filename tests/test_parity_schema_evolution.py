"""Behavioral parity with reference tests/test_schema_evolution.py (220
LoC): history entry shape (schema_id/fields/is_schema_change/
change_summary), snapshot-addressed diff with reference keys and
summary strings, migration step dicts, and the proposed-changes
compatibility check (drops/renames warn but stay compatible)."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance import schema_evolution as se
from iceberg_lakehouse_spark.operators import crud


@pytest.fixture()
def catalog(spark, tmp_warehouse):
    return LakehouseCatalog(spark, tmp_warehouse)


@pytest.fixture()
def evo_table(catalog):
    """Reference evo_table fixture: one schema version + one row."""
    t = catalog.create_table("evo_test", [("id", "long"), ("name", "string")])
    crud.insert_rows(t, [{"id": 1, "name": "Alice"}])
    return t


@pytest.fixture()
def evolved_table(evo_table):
    """Reference evolved_table fixture: add email, insert another row."""
    evo_table.add_column("email", "string")
    crud.insert_rows(
        evo_table, [{"id": 2, "name": "Bob", "email": "bob@test.com"}]
    )
    return evo_table


# --- get_schema_history (reference test_schema_evolution.py:33-69) ---


class TestGetSchemaHistory:
    def test_single_schema(self, evo_table):
        history = se.get_schema_history(evo_table)
        assert len(history) >= 1
        assert history[0]["schema_id"] == 0
        field_names = [f["name"] for f in history[0]["fields"]]
        assert "id" in field_names
        assert "name" in field_names

    def test_evolved_schema(self, evolved_table):
        history = se.get_schema_history(evolved_table)
        assert len(history) >= 2
        last = history[-1]
        assert "email" in [f["name"] for f in last["fields"]]

    def test_change_summary(self, evolved_table):
        changes = [
            h for h in se.get_schema_history(evolved_table)
            if h["is_schema_change"]
        ]
        assert len(changes) >= 1
        assert changes[0]["change_summary"] is not None
        assert "email" in changes[0]["change_summary"]

    def test_first_entry_not_a_change(self, evolved_table):
        history = se.get_schema_history(evolved_table)
        assert history[0]["is_schema_change"] is False
        assert history[0]["change_summary"] is None

    def test_includes_field_ids(self, evo_table):
        history = se.get_schema_history(evo_table)
        for field in history[0]["fields"]:
            assert "field_id" in field and field["field_id"] is not None

    def test_snapshot_binding(self, evolved_table):
        """Each entry records the first snapshot on that schema."""
        history = se.get_schema_history(evolved_table)
        snap_ids = [h["snapshot_id"] for h in history]
        assert snap_ids == sorted(snap_ids)
        assert history[0]["snapshot_id"] == 1
        assert history[0]["timestamp"] is not None


# --- schema_diff (reference test_schema_evolution.py:75-117) ---


class TestSchemaDiff:
    def test_no_changes(self, evo_table):
        diff = se.schema_diff_snapshots(evo_table)
        assert diff["added_columns"] == []
        assert diff["dropped_columns"] == []
        assert diff["renamed_columns"] == []
        assert diff["type_changes"] == []
        assert "no changes" in diff["summary"]

    def test_added_column(self, evolved_table):
        diff = se.schema_diff_snapshots(evolved_table)
        assert "email" in [c["name"] for c in diff["added_columns"]]
        assert "added email" in diff["summary"]

    def test_dropped_column(self, evolved_table):
        evolved_table.drop_column("name")
        crud.insert_rows(evolved_table, [{"id": 3, "email": "c@test.com"}])
        diff = se.schema_diff_snapshots(evolved_table)
        assert "name" in [c["name"] for c in diff["dropped_columns"]]

    def test_renamed_column(self, evolved_table):
        """Field-id diff reports a rename as a rename, not drop+add."""
        evolved_table.rename_column("email", "contact_email")
        diff = se.schema_diff_snapshots(evolved_table)
        assert diff["renamed_columns"] == [
            {"field_id": 3, "old_name": "email", "new_name": "contact_email"}
        ]
        assert diff["added_columns"] == []
        assert diff["dropped_columns"] == []
        assert "renamed email→contact_email" in diff["summary"]

    def test_between_specific_snapshots(self, evolved_table):
        snaps = sorted(
            evolved_table.snapshots(), key=lambda s: s.timestamp_ms
        )
        diff = se.schema_diff_snapshots(
            evolved_table,
            from_snapshot=snaps[0].snapshot_id,
            to_snapshot=snaps[-1].snapshot_id,
        )
        assert diff["table"] == "default.evo_test"
        assert "email" in [c["name"] for c in diff["added_columns"]]

    def test_invalid_snapshot_raises(self, evo_table):
        with pytest.raises(ValueError, match="not found"):
            se.schema_diff_snapshots(
                evo_table, from_snapshot=99999, to_snapshot=88888
            )

    def test_schema_ids_zero_based(self, evolved_table):
        diff = se.schema_diff_snapshots(evolved_table)
        assert diff["from_schema_id"] == 0
        assert diff["to_schema_id"] == 1


# --- generate_migration (reference test_schema_evolution.py:123-150) ---


class TestGenerateMigration:
    def test_empty_migration(self, evo_table):
        result = se.generate_migration(evo_table)
        assert result["step_count"] == 0
        assert result["steps"] == []

    def test_add_column_migration(self, evolved_table):
        result = se.generate_migration(evolved_table)
        add_steps = [
            s for s in result["steps"] if s["operation"] == "add_column"
        ]
        assert len(add_steps) >= 1
        assert add_steps[0]["column_name"] == "email"
        assert add_steps[0]["column_type"] == "string"

    def test_drop_column_migration(self, evolved_table):
        evolved_table.drop_column("name")
        crud.insert_rows(evolved_table, [{"id": 3, "email": "c@test.com"}])
        result = se.generate_migration(evolved_table)
        drop_steps = [
            s for s in result["steps"] if s["operation"] == "drop_column"
        ]
        assert len(drop_steps) >= 1
        assert drop_steps[0]["column_name"] == "name"

    def test_rename_column_migration(self, evolved_table):
        evolved_table.rename_column("email", "contact_email")
        result = se.generate_migration(evolved_table)
        rename_steps = [
            s for s in result["steps"] if s["operation"] == "rename_column"
        ]
        assert rename_steps == [
            {
                "operation": "rename_column",
                "column_name": "email",
                "new_name": "contact_email",
            }
        ]

    def test_message(self, evolved_table):
        result = se.generate_migration(evolved_table)
        assert "migration" in result["message"].lower()


# --- check_schema_compatibility (reference test_schema_evolution.py:156-220) ---


class TestCheckSchemaCompatibility:
    def test_safe_add(self, evo_table):
        result = se.check_schema_compatibility(
            evo_table,
            [{"op": "add_column", "column": "email", "type": "string"}],
        )
        assert result["compatible"] is True
        assert result["breaking_changes"] == []

    def test_drop_column_warning(self, evo_table):
        """Drops warn but stay compatible (all columns optional)."""
        result = se.check_schema_compatibility(
            evo_table, [{"op": "drop_column", "column": "id"}]
        )
        assert result["compatible"] is True
        assert len(result["warnings"]) >= 1

    def test_drop_optional_warning(self, evolved_table):
        result = se.check_schema_compatibility(
            evolved_table, [{"op": "drop_column", "column": "email"}]
        )
        assert result["compatible"] is True
        assert len(result["warnings"]) >= 1

    def test_rename_warning(self, evo_table):
        result = se.check_schema_compatibility(
            evo_table,
            [{"op": "rename_column", "column": "name", "new_name": "full_name"}],
        )
        assert result["compatible"] is True
        assert len(result["warnings"]) >= 1

    def test_duplicate_column_warning(self, evo_table):
        result = se.check_schema_compatibility(
            evo_table, [{"op": "add_column", "column": "id", "type": "long"}]
        )
        assert len(result["warnings"]) >= 1

    def test_nonexistent_column_warning(self, evo_table):
        result = se.check_schema_compatibility(
            evo_table, [{"op": "drop_column", "column": "nonexistent"}]
        )
        assert len(result["warnings"]) >= 1

    def test_unknown_op_warning(self, evo_table):
        result = se.check_schema_compatibility(
            evo_table, [{"op": "frobnicate", "column": "id"}]
        )
        assert any("Unknown operation" in w for w in result["warnings"])

    def test_message(self, evo_table):
        result = se.check_schema_compatibility(
            evo_table,
            [{"op": "add_column", "column": "new_col", "type": "string"}],
        )
        assert "compatible" in result["message"].lower()

    def test_proposed_changes_count(self, evo_table):
        result = se.check_schema_compatibility(
            evo_table,
            [
                {"op": "add_column", "column": "a", "type": "string"},
                {"op": "drop_column", "column": "name"},
            ],
        )
        assert result["proposed_changes"] == 2
