"""Deep behavioral tests for data contracts, ported from the assertion
style of reference tests/test_contracts.py (1,007 LoC): error paths,
version history, dry runs, monitoring, generation edge cases."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance.contracts import ContractManager
from iceberg_lakehouse_spark.operators import crud

SCHEMA = [("id", "long"), ("name", "string"), ("value", "double")]
ROWS = [
    {"id": 1, "name": "alice", "value": 10.0},
    {"id": 2, "name": "bob", "value": 20.0},
]

SAMPLE = {
    "schema": {
        "id": {"type": "bigint", "nullable": False},
        "name": {"type": "string", "nullable": True},
        "value": {"type": "double", "nullable": True},
    },
    "quality": {"min_score": 70},
    "freshness": {"max_age_hours": 48},
    "constraints": [
        {"type": "not_null", "column": "id"},
        {"type": "range", "column": "value", "min": 0, "max": 1000},
    ],
    "owner": "data-team",
}


@pytest.fixture()
def cm(tmp_path):
    return ContractManager(str(tmp_path / "contracts.json"))


@pytest.fixture()
def metrics(spark, tmp_warehouse):
    catalog = LakehouseCatalog(spark, tmp_warehouse)
    t = catalog.create_table("metrics", SCHEMA)
    crud.insert_rows(t, ROWS)
    return t


class TestCreateContract:
    def test_create_and_get(self, cm):
        cm.create("default.metrics", **SAMPLE)
        got = cm.get("default.metrics")
        assert got["version"] == 1
        assert got["schema"]["id"]["type"] == "bigint"
        assert got["owner"] == "data-team"
        assert got["status"] == "active"
        assert got["history"] == []

    def test_create_duplicate_raises(self, cm):
        cm.create("t", **SAMPLE)
        with pytest.raises(ValueError, match="already exists"):
            cm.create("t", **SAMPLE)

    def test_create_minimal(self, cm):
        cm.create("t")
        got = cm.get("t")
        assert got["schema"] == {} and got["constraints"] == []
        assert got["quality"] == {} and got["freshness"] == {}
        assert got["owner"] is None

    def test_get_nonexistent_raises(self, cm):
        with pytest.raises(ValueError, match="no contract"):
            cm.get("ghost")


class TestUpdateAndVersions:
    def test_update_bumps_version_and_snapshots_history(self, cm):
        cm.create("t", **SAMPLE)
        cm.update("t", owner="other-team")
        got = cm.get("t")
        assert got["version"] == 2 and got["owner"] == "other-team"
        assert len(got["history"]) == 1
        assert got["history"][0]["version"] == 1
        # history snapshot preserves the pre-update schema
        assert got["history"][0]["snapshot"]["schema"]["id"]["type"] == "bigint"

    def test_update_ignores_unknown_fields(self, cm):
        cm.create("t", **SAMPLE)
        cm.update("t", bogus="x")
        assert "bogus" not in cm.get("t")

    def test_update_nonexistent_raises(self, cm):
        with pytest.raises(ValueError, match="no contract"):
            cm.update("ghost", owner="x")

    def test_deprecate(self, cm):
        cm.create("t", **SAMPLE)
        assert cm.deprecate("t")["status"] == "deprecated"
        assert cm.get("t")["version"] == 2  # deprecation is a version bump

    def test_diff_versions(self, cm):
        cm.create("t", **SAMPLE)
        new_schema = dict(SAMPLE["schema"])
        new_schema.pop("name")
        new_schema["extra"] = {"type": "string"}
        new_schema["value"] = {"type": "decimal(10,2)"}
        cm.update("t", schema=new_schema)
        d = cm.diff_versions("t", 1, 2)
        assert d["added_columns"] == ["extra"]
        assert d["removed_columns"] == ["name"]
        assert d["changed_columns"] == ["value"]

    def test_diff_unknown_version_raises(self, cm):
        cm.create("t", **SAMPLE)
        with pytest.raises(ValueError, match="unknown versions"):
            cm.diff_versions("t", 1, 9)


class TestValidate:
    def test_schema_conformance_clean(self, cm, metrics):
        cm.create("default.metrics", **SAMPLE)
        assert cm.validate_table(metrics) == []

    def test_schema_missing_column(self, cm, metrics):
        bad = dict(SAMPLE)
        bad["schema"] = {**SAMPLE["schema"], "ghost": {"type": "string"}}
        cm.create("default.metrics", **bad)
        problems = cm.validate_table(metrics)
        assert problems == ["missing column 'ghost'"]

    def test_schema_type_mismatch(self, cm, metrics):
        bad = dict(SAMPLE)
        bad["schema"] = {"value": {"type": "string"}}
        cm.create("default.metrics", **bad)
        assert "type double != contract string" in cm.validate_table(metrics)[0]

    def test_rows_clean(self, cm, metrics):
        cm.create("default.metrics", **SAMPLE)
        assert cm.validate_rows("default.metrics", metrics.scan()) == []

    def test_rows_not_null_violation(self, cm, metrics, spark):
        cm.create("default.metrics", **SAMPLE)
        df = spark.createDataFrame(
            [(None, "x", 5.0)], "id bigint, name string, value double"
        )
        v = cm.validate_rows("default.metrics", df)
        assert v == [{"constraint": "not_null", "column": "id", "failed_rows": 1}]

    def test_rows_range_violation_counts(self, cm, metrics, spark):
        cm.create("default.metrics", **SAMPLE)
        df = spark.createDataFrame(
            [(1, "a", -5.0), (2, "b", 2000.0), (3, "c", 10.0)],
            "id bigint, name string, value double",
        )
        v = cm.validate_rows("default.metrics", df)
        assert v[0]["failed_rows"] == 2

    def test_rows_enum_and_regex(self, cm, spark):
        cm.create("t", constraints=[
            {"type": "enum", "column": "cat", "values": ["a", "b"]},
            {"type": "regex", "column": "code", "pattern": "^[A-Z]{2}$"},
        ])
        df = spark.createDataFrame(
            [("a", "AB"), ("z", "xy"), (None, None)], "cat string, code string"
        )
        v = cm.validate_rows("t", df)
        # NULLs are exempt in both enum and regex (SQL semantics)
        assert {x["constraint"]: x["failed_rows"] for x in v} == {
            "enum": 1, "regex": 1,
        }

    def test_rows_missing_column_reported(self, cm, spark):
        cm.create("t", constraints=[{"type": "not_null", "column": "nope"}])
        df = spark.createDataFrame([(1,)], "id bigint")
        v = cm.validate_rows("t", df)
        assert v == [{"constraint": "not_null", "column": "nope",
                      "detail": "column missing"}]


class TestDryRun:
    def test_dry_run_clean(self, cm, metrics):
        ok = cm.dry_run(metrics, {"schema": {"id": {"type": "bigint"}}})
        assert ok["ok"] and ok["would_violate"] == []

    def test_dry_run_schema_and_constraints(self, cm, metrics):
        res = cm.dry_run(metrics, {
            "schema": {"ghost": {"type": "string"}},
            "constraints": [{"type": "range", "column": "value", "min": 15}],
        })
        kinds = [v["kind"] for v in res["would_violate"]]
        assert not res["ok"] and kinds == ["schema", "constraint"]

    def test_dry_run_does_not_persist(self, cm, metrics):
        cm.dry_run(metrics, {"constraints": [{"type": "not_null", "column": "id"}]})
        assert cm.list() == {}  # the temporary __dry_run__ contract is gone


class TestMonitoring:
    def test_compliance_score_perfect(self, cm, metrics):
        cm.create("default.metrics", **SAMPLE)
        assert cm.compliance_score(metrics) == 100.0

    def test_compliance_score_degrades(self, cm, metrics):
        bad = dict(SAMPLE)
        bad["constraints"] = [{"type": "range", "column": "value", "max": 15}]
        cm.create("default.metrics", **bad)
        assert cm.compliance_score(metrics) < 100.0

    def test_monitor_appends_and_trends(self, cm, metrics):
        cm.create("default.metrics", **SAMPLE)
        cm.monitor(metrics)
        cm.monitor(metrics)
        tr = cm.trends("default.metrics")
        assert tr["checks"] == 2 and tr["latest"] == 100.0
        assert tr["min"] == tr["max"] == 100.0
        assert tr["improving"] is True

    def test_trends_empty(self, cm):
        cm.create("t", **SAMPLE)
        tr = cm.trends("t")
        assert tr["checks"] == 0 and tr["latest"] is None

    def test_dashboard_mixed(self, cm, metrics):
        cm.create("default.metrics", **SAMPLE)
        dash = cm.dashboard([metrics])
        assert dash["covered"] == 1 and dash["uncovered"] == 0
        assert dash["avg_score"] == 100.0
        assert dash["tables"][0]["status"] == "compliant"

    def test_coverage(self, cm):
        cm.create("default.a")
        cov = cm.coverage(["default.a", "default.b"])
        assert cov["covered"] == ["default.a"]
        assert cov["uncovered"] == ["default.b"]
        assert cov["pct"] == 50.0


class TestConsumers:
    def test_register_and_list(self, cm):
        cm.create("t", **SAMPLE)
        cm.register_consumer("t", "bi-dash")
        cm.register_consumer("t", "ml-pipe")
        cm.register_consumer("t", "bi-dash")  # idempotent
        assert cm.consumers("t") == ["bi-dash", "ml-pipe"]

    def test_producers(self, cm):
        cm.create("t", **SAMPLE)
        cm.register_producer("t", "etl-job")
        assert cm.store.load()["producers"]["t"] == ["etl-job"]


class TestGenerate:
    def test_generate_not_null_and_range(self, cm, metrics):
        got = cm.generate_from_stats(metrics)
        assert got["version"] == 1
        kinds = {(c["type"], c["column"]) for c in got["constraints"]}
        assert ("not_null", "id") in kinds
        assert ("range", "value") in kinds
        rng = next(c for c in got["constraints"]
                   if c["type"] == "range" and c["column"] == "value")
        # 10% buffer beyond observed [10, 20]
        assert rng["min"] == 9.0 and rng["max"] == 21.0

    def test_generate_strict_no_buffer(self, cm, metrics):
        got = cm.generate_from_stats(metrics, strict=True)
        rng = next(c for c in got["constraints"]
                   if c["type"] == "range" and c["column"] == "value")
        assert rng["min"] == 10.0 and rng["max"] == 20.0

    def test_generate_enum_for_low_cardinality_strings(self, cm, metrics):
        got = cm.generate_from_stats(metrics)
        enum = next(c for c in got["constraints"] if c["type"] == "enum")
        assert enum["column"] == "name" and enum["values"] == ["alice", "bob"]

    def test_preview_does_not_save(self, cm, metrics):
        got = cm.generate_from_stats(metrics, save=False)
        assert got["preview"] is True
        assert cm.list() == {}

    def test_generate_marks_nonnull_schema(self, cm, metrics):
        got = cm.generate_from_stats(metrics)
        assert got["schema"]["id"]["nullable"] is False


class TestRemoveAndVersions:
    def test_remove_contract_and_consumers(self, cm):
        cm.create("t", **SAMPLE)
        cm.register_consumer("t", "bi")
        assert cm.remove("t") is True
        assert cm.remove("t") is False
        with pytest.raises(ValueError, match="no contract"):
            cm.get("t")

    def test_remove_consumer(self, cm):
        cm.create("t", **SAMPLE)
        cm.register_consumer("t", "bi")
        assert cm.remove_consumer("t", "bi") is True
        assert cm.remove_consumer("t", "bi") is False
        assert cm.consumers("t") == []

    def test_get_version_current_and_historic(self, cm):
        cm.create("t", **SAMPLE)
        cm.update("t", quality={"min_score": 90})
        v1 = cm.get_version("t", 1)
        v2 = cm.get_version("t", 2)
        assert v1["quality"] == {"min_score": 70}
        assert v2["quality"] == {"min_score": 90}
        with pytest.raises(ValueError, match="version 9 not found"):
            cm.get_version("t", 9)

    def test_compliance_history_raw_entries(self, cm, metrics):
        cm.create("default.metrics", **SAMPLE)
        cm.monitor(metrics)
        hist = cm.compliance_history("default.metrics")
        assert len(hist) == 1 and hist[0]["score"] == 100.0
