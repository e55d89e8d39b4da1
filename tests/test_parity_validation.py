"""Validation parity with the reference behavioral corpus
(reference tests/test_validation.py:1-386, validation.py:41-321).

Ports the assertion CONTENT of the reference's validate_rows contract:
{valid, failures[], checked} with per-(rule, row) failure records and
insertion-order row_index — against the repo's Spark-native
``ValidationManager.validate_batch``. Rule-CRUD edges (store format,
messages, invalid-field raises) live in test_governance_behaviors.py.
"""

from __future__ import annotations

import json

import pytest

from iceberg_lakehouse_spark.governance.validation import (
    ValidationError,
    ValidationManager,
)


@pytest.fixture
def vm(tmp_path):
    return ValidationManager(str(tmp_path / "validation.json"))


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# --- add_validation_rule result shape (test_validation.py:40-96) ---


class TestAddRule:
    def test_add_not_null(self, vm):
        result = vm.add_rule("expenses", {"type": "not_null", "column": "id"})
        assert result["type"] == "not_null"
        assert result["column"] == "id"
        assert "id" in result
        assert "Added" in result["message"]

    def test_add_unique(self, vm):
        result = vm.add_rule("expenses", {"type": "unique", "columns": ["id"]})
        assert result["type"] == "unique"
        assert result["columns"] == ["id"]

    def test_add_range(self, vm):
        result = vm.add_rule(
            "expenses", {"type": "range", "column": "amount", "min": 0, "max": 10000}
        )
        assert result["type"] == "range"
        assert result["min"] == 0
        assert result["max"] == 10000

    def test_add_regex(self, vm):
        result = vm.add_rule(
            "expenses",
            {"type": "regex", "column": "email", "pattern": "^[^@]+@[^@]+$"},
        )
        assert result["type"] == "regex"

    def test_add_expression(self, vm):
        result = vm.add_rule("expenses", {"type": "expression", "sql": "amount > 0"})
        assert result["type"] == "expression"

    def test_add_persists(self, vm, tmp_path):
        vm.add_rule("expenses", {"type": "not_null", "column": "id"})
        data = json.loads((tmp_path / "validation.json").read_text())
        assert "expenses" in data
        assert len(data["expenses"]) == 1

    def test_add_unique_requires_list(self, vm):
        with pytest.raises(ValueError, match="'columns' \\(list\\)"):
            vm.add_rule("expenses", {"type": "unique", "columns": "id"})

    def test_remove_by_id_result_shape(self, vm):
        r = vm.add_rule("expenses", {"type": "not_null", "column": "id"})
        removed = vm.remove_rule("expenses", r["id"])
        assert removed["id"] == r["id"]
        assert "Removed" in removed["message"]


# --- validate_batch: not_null (test_validation.py:145-162) ---


class TestValidateNotNull:
    def test_passes(self, vm, spark):
        vm.add_rule("t", {"type": "not_null", "column": "id"})
        result = vm.validate_batch("t", _df(spark, [(1,), (2,)], "id int"))
        assert result["valid"]
        assert result["checked"] == 2

    def test_fails_with_row_index(self, vm, spark):
        vm.add_rule("t", {"type": "not_null", "column": "id"})
        result = vm.validate_batch("t", _df(spark, [(1,), (None,)], "id int"))
        assert not result["valid"]
        assert len(result["failures"]) == 1
        assert result["failures"][0]["row_index"] == 1
        assert "must not be null" in result["failures"][0]["message"]

    def test_missing_column_is_null(self, vm, spark):
        vm.add_rule("t", {"type": "not_null", "column": "id"})
        result = vm.validate_batch("t", _df(spark, [("x",)], "name string"))
        assert not result["valid"]


# --- validate_batch: range (test_validation.py:165-193) ---


class TestValidateRange:
    def test_in_range(self, vm, spark):
        vm.add_rule("t", {"type": "range", "column": "amount", "min": 0, "max": 100})
        assert vm.validate_batch("t", _df(spark, [(50,)], "amount int"))["valid"]

    def test_below_min(self, vm, spark):
        vm.add_rule("t", {"type": "range", "column": "amount", "min": 0, "max": 100})
        result = vm.validate_batch("t", _df(spark, [(-5,)], "amount int"))
        assert not result["valid"]
        assert "below minimum" in result["failures"][0]["message"]

    def test_above_max(self, vm, spark):
        vm.add_rule("t", {"type": "range", "column": "amount", "min": 0, "max": 100})
        result = vm.validate_batch("t", _df(spark, [(150,)], "amount int"))
        assert not result["valid"]
        assert "above maximum" in result["failures"][0]["message"]

    def test_null_passes(self, vm, spark):
        vm.add_rule("t", {"type": "range", "column": "amount", "min": 0})
        assert vm.validate_batch("t", _df(spark, [(None,)], "amount int"))["valid"]

    def test_min_only(self, vm, spark):
        vm.add_rule("t", {"type": "range", "column": "amount", "min": 0})
        assert vm.validate_batch("t", _df(spark, [(50,)], "amount int"))["valid"]


# --- validate_batch: regex (test_validation.py:196-213) ---


class TestValidateRegex:
    def test_matches(self, vm, spark):
        vm.add_rule("t", {"type": "regex", "column": "category", "pattern": "^[a-z_]+$"})
        assert vm.validate_batch(
            "t", _df(spark, [("food_and_drink",)], "category string")
        )["valid"]

    def test_no_match(self, vm, spark):
        vm.add_rule("t", {"type": "regex", "column": "category", "pattern": "^[a-z_]+$"})
        result = vm.validate_batch("t", _df(spark, [("INVALID",)], "category string"))
        assert not result["valid"]
        assert "does not match pattern" in result["failures"][0]["message"]

    def test_null_passes(self, vm, spark):
        vm.add_rule("t", {"type": "regex", "column": "category", "pattern": "^[a-z]+$"})
        assert vm.validate_batch("t", _df(spark, [(None,)], "category string"))["valid"]

    def test_anchored_at_start_like_re_match(self, vm, spark):
        """pattern.match anchors at the start only (validation.py:205-216):
        'abc1' matches '[a-z]+', '1abc' does not."""
        vm.add_rule("t", {"type": "regex", "column": "c", "pattern": "[a-z]+"})
        result = vm.validate_batch(
            "t", _df(spark, [("abc1",), ("1abc",)], "c string")
        )
        assert len(result["failures"]) == 1
        assert result["failures"][0]["row_index"] == 1


# --- validate_batch: expression (test_validation.py:216-230) ---


class TestValidateExpression:
    def test_passes(self, vm, spark):
        vm.add_rule("t", {"type": "expression", "sql": "amount > 0"})
        assert vm.validate_batch("t", _df(spark, [(10,), (20,)], "amount int"))["valid"]

    def test_fails(self, vm, spark):
        vm.add_rule("t", {"type": "expression", "sql": "amount > 0"})
        result = vm.validate_batch("t", _df(spark, [(10,), (-5,)], "amount int"))
        assert not result["valid"]
        assert len(result["failures"]) == 1
        assert result["failures"][0]["row_index"] == 1
        assert "failed expression" in result["failures"][0]["message"]

    def test_bad_sql_reports_error_record(self, vm, spark):
        vm.add_rule("t", {"type": "expression", "sql": "no_such_col ++ 1"})
        result = vm.validate_batch("t", _df(spark, [(1,)], "amount int"))
        assert not result["valid"]
        assert result["failures"][0]["row_index"] == -1
        assert "Expression rule error" in result["failures"][0]["message"]


# --- validate_batch: unique (test_validation.py:233-258) ---


class TestValidateUnique:
    def test_unique_within_batch(self, vm, spark):
        vm.add_rule("t", {"type": "unique", "columns": ["id"]})
        assert vm.validate_batch("t", _df(spark, [(1,), (2,)], "id int"))["valid"]

    def test_duplicate_within_batch(self, vm, spark):
        vm.add_rule("t", {"type": "unique", "columns": ["id"]})
        result = vm.validate_batch("t", _df(spark, [(1,), (1,)], "id int"))
        assert not result["valid"]
        assert result["failures"][0]["row_index"] == 1
        assert "same as row 0" in result["failures"][0]["message"]

    def test_duplicate_against_existing(self, vm, spark):
        vm.add_rule("t", {"type": "unique", "columns": ["id"]})
        existing = _df(spark, [(1,), (2,)], "id int")
        result = vm.validate_batch("t", _df(spark, [(1,)], "id int"), existing)
        assert not result["valid"]
        assert "already exists in table" in result["failures"][0]["message"]

    def test_unique_against_existing(self, vm, spark):
        vm.add_rule("t", {"type": "unique", "columns": ["id"]})
        existing = _df(spark, [(1,), (2,)], "id int")
        assert vm.validate_batch("t", _df(spark, [(3,)], "id int"), existing)["valid"]

    def test_multi_column_key(self, vm, spark):
        vm.add_rule("t", {"type": "unique", "columns": ["a", "b"]})
        ok = _df(spark, [(1, 1), (1, 2)], "a int, b int")
        assert vm.validate_batch("t", ok)["valid"]
        dup = _df(spark, [(1, 1), (1, 1)], "a int, b int")
        assert not vm.validate_batch("t", dup)["valid"]


# --- multiple rules / empty (test_validation.py:261-287) ---


class TestValidateMultipleRules:
    def test_all_pass(self, vm, spark):
        vm.add_rule("t", {"type": "not_null", "column": "id"})
        vm.add_rule("t", {"type": "range", "column": "amount", "min": 0})
        df = _df(spark, [(1, 50)], "id int, amount int")
        assert vm.validate_batch("t", df)["valid"]

    def test_multiple_failures_one_row(self, vm, spark):
        vm.add_rule("t", {"type": "not_null", "column": "id"})
        vm.add_rule("t", {"type": "range", "column": "amount", "min": 0})
        df = _df(spark, [(None, -5)], "id int, amount int")
        result = vm.validate_batch("t", df)
        assert not result["valid"]
        assert len(result["failures"]) == 2

    def test_no_rules_passes(self, vm, spark):
        result = vm.validate_batch("t", _df(spark, [(1,)], "id int"))
        assert result["valid"]
        assert result["checked"] == 1

    def test_empty_rows_passes(self, vm, spark):
        vm.add_rule("t", {"type": "not_null", "column": "id"})
        result = vm.validate_batch("t", _df(spark, [], "id int"))
        assert result["valid"]
        assert result["checked"] == 0


# --- ValidationError shape (validation.py:14-20) ---


class TestValidationErrorShape:
    def test_enforce_raises_with_failures_attr(self, vm, spark):
        vm.add_rule("t", {"type": "not_null", "column": "id"})
        with pytest.raises(ValidationError) as exc:
            vm.enforce("t", _df(spark, [(None,)], "id int"))
        assert exc.value.failures
        assert "Validation failed" in str(exc.value)

    def test_is_value_error(self):
        assert issubclass(ValidationError, ValueError)
