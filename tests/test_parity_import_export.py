"""Behavioral parity with reference tests/test_import.py (274 LoC) and
tests/test_export.py (288 LoC): result shapes (rows_imported /
rows_exported / format / qualified table / output), if_exists modes,
delimiter and header handling, format auto-detection and overrides,
schema-drift guards on append, the WHERE/columns/LIMIT export trio,
and error paths.

Deviation from the reference pinned here: parquet/orc ARE importable
(superset — the reference's 'Cannot auto-detect format' applies to its
csv/json-only importer), so the auto-detect failure is pinned on a
genuinely unknown extension instead."""

from __future__ import annotations

import json

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.operators import crud
from iceberg_lakehouse_spark.sources import io as lio

EXP_SCHEMA = [
    ("id", "long"), ("category", "string"),
    ("amount", "double"), ("currency", "string"),
]


@pytest.fixture()
def catalog(spark, tmp_warehouse):
    c = LakehouseCatalog(spark, tmp_warehouse)
    c.create_table("expenses", EXP_SCHEMA)
    return c


def _seed(catalog, rows):
    crud.insert_rows(catalog.load_table("expenses"), rows)


# --- CSV import (reference test_import.py:9-148) ---


class TestImportCSV:
    def test_import_csv_new_table(self, catalog, tmp_path):
        csv_file = tmp_path / "data.csv"
        csv_file.write_text(
            "id,name,score\n1,Alice,95.5\n2,Bob,87.3\n3,Charlie,92.1\n"
        )
        result = lio.import_file(catalog, str(csv_file), "students")
        assert result["rows_imported"] == 3
        assert result["format"] == "csv"
        assert result["table"] == "default.students"
        rows = catalog.load_table("students").scan().orderBy("id").collect()
        assert [r["name"] for r in rows] == ["Alice", "Bob", "Charlie"]

    def test_import_csv_append(self, catalog, tmp_path):
        csv1 = tmp_path / "batch1.csv"
        csv1.write_text("id,name,score\n1,Alice,95.5\n2,Bob,87.3\n")
        lio.import_file(catalog, str(csv1), "students")
        csv2 = tmp_path / "batch2.csv"
        csv2.write_text("id,name,score\n3,Charlie,92.1\n4,Diana,78.9\n")
        result = lio.import_file(
            catalog, str(csv2), "students", if_exists="append"
        )
        assert result["rows_imported"] == 2
        assert catalog.load_table("students").scan().count() == 4

    def test_import_csv_replace(self, catalog, tmp_path):
        csv1 = tmp_path / "original.csv"
        csv1.write_text("id,name,score\n1,Alice,95.5\n2,Bob,87.3\n")
        lio.import_file(catalog, str(csv1), "students")
        csv2 = tmp_path / "replacement.csv"
        csv2.write_text("id,name,score\n10,Eve,99.0\n")
        result = lio.import_file(
            catalog, str(csv2), "students", if_exists="replace"
        )
        assert result["rows_imported"] == 1
        rows = catalog.load_table("students").scan().collect()
        assert len(rows) == 1
        assert rows[0]["name"] == "Eve"

    def test_import_csv_fail_if_exists(self, catalog, tmp_path):
        csv = tmp_path / "data.csv"
        csv.write_text("id,name\n1,Alice\n")
        lio.import_file(catalog, str(csv), "students")
        csv2 = tmp_path / "data2.csv"
        csv2.write_text("id,name\n2,Bob\n")
        with pytest.raises(ValueError, match="already exists"):
            lio.import_file(catalog, str(csv2), "students", if_exists="fail")

    def test_import_csv_custom_delimiter(self, catalog, tmp_path):
        csv_file = tmp_path / "data.csv"
        csv_file.write_text("id;name;score\n1;Alice;95.5\n2;Bob;87.3\n")
        result = lio.import_file(
            catalog, str(csv_file), "students", delimiter=";"
        )
        assert result["rows_imported"] == 2
        rows = catalog.load_table("students").scan().orderBy("id").collect()
        assert [r["name"] for r in rows] == ["Alice", "Bob"]

    def test_import_tsv_auto_detect(self, catalog, tmp_path):
        tsv_file = tmp_path / "data.tsv"
        tsv_file.write_text("id\tname\tscore\n1\tAlice\t95.5\n2\tBob\t87.3\n")
        result = lio.import_file(catalog, str(tsv_file), "students")
        assert result["rows_imported"] == 2
        assert result["format"] == "csv"

    def test_import_csv_no_header(self, catalog, tmp_path):
        csv_file = tmp_path / "data.csv"
        csv_file.write_text("1,Alice,95.5\n2,Bob,87.3\n")
        result = lio.import_file(
            catalog, str(csv_file), "students", has_header=False
        )
        assert result["rows_imported"] == 2

    def test_import_csv_append_to_existing_table(self, catalog, tmp_path):
        _seed(catalog, [
            {"id": 1, "category": "food", "amount": 25.0, "currency": "USD"},
        ])
        csv_file = tmp_path / "new_expenses.csv"
        csv_file.write_text(
            "id,category,amount,currency\n100,test,42.50,USD\n"
        )
        result = lio.import_file(
            catalog, str(csv_file), "expenses", if_exists="append"
        )
        assert result["rows_imported"] == 1
        rows = catalog.load_table("expenses").scan().where("id = 100").collect()
        assert len(rows) == 1
        assert rows[0]["category"] == "test"

    def test_import_csv_schema_mismatch_extra_columns(self, catalog, tmp_path):
        csv_file = tmp_path / "data.csv"
        csv_file.write_text("id,name\n1,Alice\n")
        lio.import_file(catalog, str(csv_file), "students")
        csv2 = tmp_path / "extra.csv"
        csv2.write_text("id,name,extra_col\n2,Bob,foo\n")
        with pytest.raises(ValueError, match="columns not in table"):
            lio.import_file(catalog, str(csv2), "students", if_exists="append")

    def test_import_csv_append_with_missing_columns(self, catalog, tmp_path):
        csv1 = tmp_path / "full.csv"
        csv1.write_text("id,name,score\n1,Alice,95.5\n")
        lio.import_file(catalog, str(csv1), "students")
        csv2 = tmp_path / "partial.csv"
        csv2.write_text("id,name\n2,Bob\n")
        result = lio.import_file(
            catalog, str(csv2), "students", if_exists="append"
        )
        assert result["rows_imported"] == 1
        rows = catalog.load_table("students").scan().orderBy("id").collect()
        assert len(rows) == 2
        assert rows[1]["score"] is None


# --- JSON import (reference test_import.py:151-230) ---


class TestImportJSON:
    def test_import_json_array(self, catalog, tmp_path):
        json_file = tmp_path / "data.json"
        json_file.write_text(json.dumps([
            {"id": 1, "name": "Alice", "score": 95.5},
            {"id": 2, "name": "Bob", "score": 87.3},
        ]))
        result = lio.import_file(catalog, str(json_file), "students")
        assert result["rows_imported"] == 2
        assert result["format"] == "json"
        rows = catalog.load_table("students").scan().orderBy("id").collect()
        assert [r["name"] for r in rows] == ["Alice", "Bob"]

    def test_import_ndjson(self, catalog, tmp_path):
        ndjson_file = tmp_path / "data.ndjson"
        lines = [
            json.dumps({"id": 1, "name": "Alice", "score": 95.5}),
            json.dumps({"id": 2, "name": "Bob", "score": 87.3}),
            json.dumps({"id": 3, "name": "Charlie", "score": 92.1}),
        ]
        ndjson_file.write_text("\n".join(lines) + "\n")
        result = lio.import_file(catalog, str(ndjson_file), "students")
        assert result["rows_imported"] == 3
        assert result["format"] == "ndjson"

    def test_import_jsonl(self, catalog, tmp_path):
        jsonl_file = tmp_path / "data.jsonl"
        jsonl_file.write_text(
            json.dumps({"id": 1, "name": "Alice"}) + "\n"
            + json.dumps({"id": 2, "name": "Bob"}) + "\n"
        )
        result = lio.import_file(catalog, str(jsonl_file), "students")
        assert result["rows_imported"] == 2
        assert result["format"] == "ndjson"

    def test_import_json_append(self, catalog, tmp_path):
        json1 = tmp_path / "batch1.json"
        json1.write_text(json.dumps([{"id": 1, "name": "Alice"}]))
        lio.import_file(catalog, str(json1), "students")
        json2 = tmp_path / "batch2.json"
        json2.write_text(json.dumps([{"id": 2, "name": "Bob"}]))
        lio.import_file(catalog, str(json2), "students", if_exists="append")
        assert catalog.load_table("students").scan().count() == 2

    def test_import_json_replace(self, catalog, tmp_path):
        json1 = tmp_path / "original.json"
        json1.write_text(json.dumps([{"id": 1, "name": "Alice"}]))
        lio.import_file(catalog, str(json1), "students")
        json2 = tmp_path / "replacement.json"
        json2.write_text(json.dumps([{"id": 10, "name": "Zara"}]))
        lio.import_file(catalog, str(json2), "students", if_exists="replace")
        rows = catalog.load_table("students").scan().collect()
        assert len(rows) == 1
        assert rows[0]["name"] == "Zara"


# --- import errors (reference test_import.py:233-274) ---


class TestImportErrors:
    def test_import_missing_file(self, catalog):
        with pytest.raises(FileNotFoundError, match="File not found"):
            lio.import_file(catalog, "/nonexistent/data.csv", "test_table")

    def test_import_unsupported_extension(self, catalog, tmp_path):
        dat_file = tmp_path / "data.dat"
        dat_file.write_text("opaque bytes")
        with pytest.raises(ValueError, match="Cannot auto-detect format"):
            lio.import_file(catalog, str(dat_file), "test_table")

    def test_import_unsupported_format(self, catalog, tmp_path):
        csv_file = tmp_path / "data.csv"
        csv_file.write_text("id,name\n1,Alice\n")
        with pytest.raises(ValueError, match="Unsupported format"):
            lio.import_file(
                catalog, str(csv_file), "test_table", file_format="xml"
            )

    def test_import_format_override(self, catalog, tmp_path):
        txt_file = tmp_path / "data.txt"
        txt_file.write_text(json.dumps([{"id": 1, "name": "Alice"}]))
        result = lio.import_file(
            catalog, str(txt_file), "students", file_format="json"
        )
        assert result["rows_imported"] == 1
        assert result["format"] == "json"

    def test_import_with_namespace(self, catalog, tmp_path):
        csv_file = tmp_path / "data.csv"
        csv_file.write_text("id,name\n1,Alice\n")
        result = lio.import_file(catalog, str(csv_file), "default.students")
        assert result["table"] == "default.students"
        assert result["rows_imported"] == 1


# --- CSV/JSON/parquet export (reference test_export.py:10-152) ---


class TestExport:
    def test_export_csv(self, catalog, tmp_path):
        _seed(catalog, [
            {"id": 1, "category": "food", "amount": 25.0, "currency": "USD"},
            {"id": 2, "category": "transport", "amount": 15.0,
             "currency": "USD"},
        ])
        output = tmp_path / "expenses.csv"
        result = lio.export_table(
            catalog.load_table("expenses"), str(output), file_format="csv"
        )
        assert result["rows_exported"] == 2
        assert result["format"] == "csv"
        assert output.exists()
        content = output.read_text()
        assert "food" in content
        assert "transport" in content

    def test_export_auto_detects(self, catalog, tmp_path):
        _seed(catalog, [{"id": 1, "category": "food", "amount": 25.0}])
        t = catalog.load_table("expenses")
        for name, fmt in [
            ("data.csv", "csv"), ("data.json", "json"),
            ("data.ndjson", "ndjson"), ("data.jsonl", "ndjson"),
            ("data.parquet", "parquet"),
        ]:
            result = lio.export_table(t, str(tmp_path / name))
            assert result["format"] == fmt
            assert (tmp_path / name).exists()

    def test_export_default_path(self, catalog, tmp_path, monkeypatch):
        _seed(catalog, [{"id": 1, "category": "food", "amount": 25.0}])
        monkeypatch.chdir(tmp_path)
        result = lio.export_table(
            catalog.load_table("expenses"), file_format="csv"
        )
        assert result["format"] == "csv"
        assert result["output"] == "expenses.csv"

    def test_export_json(self, catalog, tmp_path):
        _seed(catalog, [
            {"id": 1, "category": "food", "amount": 25.0, "currency": "USD"},
            {"id": 2, "category": "transport", "amount": 15.0,
             "currency": "EUR"},
        ])
        output = tmp_path / "data.json"
        result = lio.export_table(
            catalog.load_table("expenses"), str(output), file_format="json"
        )
        assert result["rows_exported"] == 2
        assert result["format"] == "json"
        data = json.loads(output.read_text())
        assert isinstance(data, list)
        assert len(data) == 2
        assert sorted(d["category"] for d in data) == ["food", "transport"]

    def test_export_ndjson(self, catalog, tmp_path):
        _seed(catalog, [
            {"id": 1, "category": "food", "amount": 25.0},
            {"id": 2, "category": "transport", "amount": 15.0},
        ])
        output = tmp_path / "data.ndjson"
        result = lio.export_table(
            catalog.load_table("expenses"), str(output), file_format="ndjson"
        )
        assert result["rows_exported"] == 2
        assert result["format"] == "ndjson"
        lines = [l for l in output.read_text().strip().split("\n") if l]
        assert len(lines) == 2
        assert {json.loads(l)["category"] for l in lines} == {
            "food", "transport"
        }

    def test_export_parquet(self, catalog, tmp_path):
        import pyarrow.parquet as pq

        _seed(catalog, [
            {"id": 1, "category": "food", "amount": 25.0, "currency": "USD"},
            {"id": 2, "category": "transport", "amount": 15.0,
             "currency": "EUR"},
        ])
        output = tmp_path / "expenses.parquet"
        result = lio.export_table(
            catalog.load_table("expenses"), str(output), file_format="parquet"
        )
        assert result["rows_exported"] == 2
        assert result["format"] == "parquet"
        assert pq.read_table(str(output)).num_rows == 2


# --- export filtering (reference test_export.py:155-237) ---


class TestExportFiltering:
    def test_export_with_where(self, catalog, tmp_path):
        _seed(catalog, [
            {"id": 1, "category": "food", "amount": 25.0},
            {"id": 2, "category": "transport", "amount": 150.0},
            {"id": 3, "category": "food", "amount": 200.0},
        ])
        output = tmp_path / "big.csv"
        result = lio.export_table(
            catalog.load_table("expenses"), str(output),
            file_format="csv", where="amount > 100",
        )
        assert result["rows_exported"] == 2
        lines = output.read_text().strip().split("\n")
        assert len(lines) == 3  # header + 2 rows

    def test_export_with_columns(self, catalog, tmp_path):
        _seed(catalog, [
            {"id": 1, "category": "food", "amount": 25.0, "currency": "USD"},
        ])
        output = tmp_path / "subset.json"
        lio.export_table(
            catalog.load_table("expenses"), str(output),
            file_format="json", columns=["id", "category"],
        )
        data = json.loads(output.read_text())
        assert set(data[0].keys()) == {"id", "category"}

    def test_export_with_limit(self, catalog, tmp_path):
        _seed(catalog, [
            {"id": i, "category": "test", "amount": float(i)}
            for i in range(1, 11)
        ])
        output = tmp_path / "limited.json"
        result = lio.export_table(
            catalog.load_table("expenses"), str(output),
            file_format="json", limit=3,
        )
        assert result["rows_exported"] == 3
        assert len(json.loads(output.read_text())) == 3

    def test_export_with_where_and_columns_and_limit(self, catalog, tmp_path):
        _seed(catalog, [
            {"id": i, "category": "food" if i % 2 == 0 else "transport",
             "amount": float(i * 10)}
            for i in range(1, 11)
        ])
        output = tmp_path / "combo.json"
        result = lio.export_table(
            catalog.load_table("expenses"), str(output),
            file_format="json", where="category = 'food'",
            columns=["id", "amount"], limit=2,
        )
        assert result["rows_exported"] == 2
        data = json.loads(output.read_text())
        assert len(data) == 2
        assert set(data[0].keys()) == {"id", "amount"}

    def test_export_invalid_column(self, catalog, tmp_path):
        _seed(catalog, [{"id": 1, "category": "food", "amount": 25.0}])
        with pytest.raises(ValueError, match="Columns not found"):
            lio.export_table(
                catalog.load_table("expenses"), str(tmp_path / "out.csv"),
                file_format="csv", columns=["nonexistent"],
            )


# --- export errors (reference test_export.py:240-289) ---


class TestExportErrors:
    def test_export_nonexistent_table(self, catalog, tmp_path):
        with pytest.raises(ValueError, match="not found"):
            lio.export_table(
                catalog.load_table("nonexistent"), str(tmp_path / "out.csv")
            )

    def test_export_unsupported_format(self, catalog, tmp_path):
        _seed(catalog, [{"id": 1, "category": "food", "amount": 25.0}])
        with pytest.raises(ValueError, match="Unsupported format"):
            lio.export_table(
                catalog.load_table("expenses"), str(tmp_path / "out.xml"),
                file_format="xml",
            )

    def test_export_empty_table(self, catalog, tmp_path):
        output = tmp_path / "empty.csv"
        result = lio.export_table(
            catalog.load_table("expenses"), str(output), file_format="csv"
        )
        assert result["rows_exported"] == 0
        assert output.exists()

    def test_export_with_namespace(self, catalog, tmp_path):
        _seed(catalog, [{"id": 1, "category": "food", "amount": 25.0}])
        output = tmp_path / "out.csv"
        result = lio.export_table(
            catalog.load_table("default.expenses"), str(output),
            file_format="csv",
        )
        assert result["table"] == "default.expenses"
        assert result["rows_exported"] == 1

    def test_export_creates_parent_dirs(self, catalog, tmp_path):
        _seed(catalog, [{"id": 1, "category": "food", "amount": 25.0}])
        output = tmp_path / "nested" / "dir" / "out.csv"
        result = lio.export_table(
            catalog.load_table("expenses"), str(output), file_format="csv"
        )
        assert output.exists()
        assert result["rows_exported"] == 1
