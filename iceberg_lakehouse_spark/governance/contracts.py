"""Data contracts (SURVEY G3, reference contracts.py — its largest
module, 1,431 LoC). Ported semantics:

  * contract = {schema{col:{type,nullable}}, quality{min_score},
    freshness{max_age_hours}, constraints[not_null/range/enum/regex],
    owner, status, version, history≤50}
  * validate table schema / rows-pre-write / full violations
  * version history + diff + deprecate
  * compliance monitoring + score, consumers/producers registry,
    coverage, auto-generate from stats (10% range buffer, enum when
    distinct ≤ threshold), dry-run report

All metadata+aggregate logic over our stats/quality ops — checks run
as DataFrame filters (one pass per constraint batch).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import LakeTable
from .stats import compute_table_stats, quality_score
from .stores import JsonStore

HISTORY_CAP = 50


class ContractManager:
    def __init__(self, store_path: str):
        self.store = JsonStore(
            store_path, {"contracts": {}, "consumers": {}, "producers": {}}
        )

    # -- CRUD --------------------------------------------------------------

    def create(
        self,
        table: str,
        schema: dict[str, dict] | None = None,
        quality: dict | None = None,
        freshness: dict | None = None,
        constraints: list[dict] | None = None,
        owner: str | None = None,
    ) -> dict:
        data = self.store.load()
        if table in data["contracts"]:
            raise ValueError(f"contract for {table!r} already exists")
        contract = {
            "table": table,
            "schema": schema or {},
            "quality": quality or {},
            "freshness": freshness or {},
            "constraints": constraints or [],
            "owner": owner,
            "status": "active",
            "version": 1,
            "created": datetime.now(timezone.utc).isoformat(),
            "history": [],
        }
        data["contracts"][table] = contract
        self.store.save(data)
        return contract

    def get(self, table: str) -> dict:
        data = self.store.load()
        if table not in data["contracts"]:
            raise ValueError(f"no contract for {table!r}")
        return data["contracts"][table]

    def update(self, table: str, **changes) -> dict:
        data = self.store.load()
        c = data["contracts"].get(table)
        if not c:
            raise ValueError(f"no contract for {table!r}")
        c["history"].append(
            {
                "version": c["version"],
                "snapshot": {k: c[k] for k in ("schema", "quality", "freshness", "constraints")},
                "at": datetime.now(timezone.utc).isoformat(),
            }
        )
        c["history"] = c["history"][-HISTORY_CAP:]
        for k, v in changes.items():
            if k in ("schema", "quality", "freshness", "constraints", "owner", "status"):
                c[k] = v
        c["version"] += 1
        self.store.save(data)
        return c

    def deprecate(
        self, table: str, reason: str | None = None, sunset_date: str | None = None
    ) -> dict:
        """Version-bumping deprecation with reason/sunset metadata
        (reference deprecate_contract: status + deprecation_reason +
        deprecated_at + optional sunset_date)."""
        self.update(table, status="deprecated")
        data = self.store.load()
        c = data["contracts"][table]
        c["deprecated_at"] = datetime.now(timezone.utc).isoformat()
        if reason is not None:
            c["deprecation_reason"] = reason
        if sunset_date is not None:
            c["sunset_date"] = sunset_date
        self.store.save(data)
        return c

    def status(self, table: str) -> dict:
        """Lifecycle summary (reference get_contract_status): status +
        version + owner, deprecation metadata when present, and
        'not_found' instead of raising for absent contracts."""
        c = self.store.load()["contracts"].get(table)
        if c is None:
            return {"table": table, "status": "not_found"}
        out = {
            "table": table,
            "status": c["status"],
            "version": c["version"],
            "owner": c.get("owner"),
        }
        for k in ("deprecation_reason", "deprecated_at", "sunset_date"):
            if k in c:
                out[k] = c[k]
        return out

    def remove(self, table: str) -> bool:
        data = self.store.load()
        removed = data["contracts"].pop(table, None) is not None
        data["consumers"].pop(table, None)
        data["producers"].pop(table, None)
        self.store.save(data)
        return removed

    def get_version(self, table: str, version: int) -> dict:
        """A specific version's schema/quality/freshness/constraints
        (current or from history snapshots)."""
        c = self.get(table)
        if version == c["version"]:
            return {k: c[k] for k in ("schema", "quality", "freshness", "constraints")}
        for h in c["history"]:
            if h["version"] == version:
                return h["snapshot"]
        raise ValueError(f"version {version} not found for {table!r}")

    def compliance_history(self, table: str, limit: int | None = None) -> list[dict]:
        """Raw monitoring entries (monitor() appends them); most recent
        last, optionally capped to the last ``limit``."""
        hist = self.get(table).get("monitoring", [])
        return hist[-limit:] if limit else hist

    def version_history(self, table: str, limit: int | None = None) -> list[dict]:
        """Version snapshots, MOST RECENT FIRST (reference
        get_contract_history ordering), optionally limited."""
        hist = list(reversed(self.get(table)["history"]))
        return hist[:limit] if limit else hist

    def list(self) -> dict:
        return self.store.load()["contracts"]

    def diff_versions(self, table: str, v1: int, v2: int) -> dict:
        c = self.get(table)
        snaps = {h["version"]: h["snapshot"] for h in c["history"]}
        snaps[c["version"]] = {
            k: c[k] for k in ("schema", "quality", "freshness", "constraints")
        }
        if v1 not in snaps or v2 not in snaps:
            raise ValueError(f"unknown versions {v1}/{v2}; have {sorted(snaps)}")
        a, b = snaps[v1]["schema"], snaps[v2]["schema"]
        # non-schema sections that changed between the versions
        other = sorted(
            k
            for k in ("quality", "freshness", "constraints")
            if snaps[v1][k] != snaps[v2][k]
        )
        out = {
            "added_columns": sorted(set(b) - set(a)),
            "removed_columns": sorted(set(a) - set(b)),
            "changed_columns": sorted(
                c for c in set(a) & set(b) if a[c] != b[c]
            ),
            "sections_changed": other,
        }
        out["change_count"] = (
            len(out["added_columns"])
            + len(out["removed_columns"])
            + len(out["changed_columns"])
            + len(other)
        )
        return out

    # -- validation --------------------------------------------------------

    def validate_table(self, table: LakeTable) -> list[str]:
        """Schema conformance (reference contracts.py:275-339)."""
        name = f"{table.namespace}.{table.table}"
        try:
            c = self.get(name)
        except ValueError:
            c = self.get(table.table)
        actual = {f.name: f.dataType.simpleString() for f in table.schema().fields}
        problems = []
        for col, spec in c["schema"].items():
            if col not in actual:
                problems.append(f"missing column {col!r}")
            elif spec.get("type") and actual[col] != spec["type"]:
                problems.append(
                    f"column {col!r} type {actual[col]} != contract {spec['type']}"
                )
        return problems

    @staticmethod
    def _constraint_failures(con: dict, df: DataFrame) -> int | None:
        """Failing-row count for one constraint, None = unknown kind.
        Caller handles missing columns."""
        kind, col = con["type"], con.get("column")
        if kind == "not_null":
            return df.where(F.col(col).isNull()).count()
        if kind == "range":
            cond = F.lit(False)
            if con.get("min") is not None:
                cond = cond | (F.col(col) < con["min"])
            if con.get("max") is not None:
                cond = cond | (F.col(col) > con["max"])
            return df.where(cond).count()
        if kind == "enum":
            return df.where(
                F.col(col).isNotNull() & ~F.col(col).isin(con["values"])
            ).count()
        if kind == "regex":
            return df.where(
                F.col(col).isNotNull() & ~F.col(col).rlike(con["pattern"])
            ).count()
        if kind == "min_quality_score":
            # r11: rows scoring below `min` under the EMBEDDED model
            # weights (governance.models.quality_score_constraint —
            # pinned at constraint creation, so a later model
            # promotion never silently changes what this contract
            # enforces). One codegen projection, no Python.
            from ..functions.quality_model import (
                FEATURES,
                _p_sql,
                _z_sql,
            )

            names = [n for n, _, _ in FEATURES]
            stored = con.get("features")
            if stored is not None and list(stored) != names:
                # the constraint embeds the training-time feature
                # list; applying its pinned weights to a changed
                # FEATURES set would misalign silently (r11 ADVICE)
                raise ValueError(
                    f"min_quality_score constraint pinned features "
                    f"{list(stored)} but the current feature set is "
                    f"{names} — re-issue quality_score_constraint "
                    "from a model retrained under current features")
            d = df if col == "text" else df.withColumn(
                "text", F.col(col))
            scored = (
                d.selectExpr(
                    *[f"{s} AS {n}" for n, s, _ in FEATURES])
                .selectExpr(
                    "*", f"{_z_sql(con['weights'], names)} AS z")
                .selectExpr(f"{_p_sql()} AS p")
            )
            return scored.where(F.col("p") < con["min"]).count()
        return None

    def validate_rows(
        self, table_name: str, df: DataFrame, contract: dict | None = None
    ) -> list[dict]:
        """Constraint checks pre-write (contracts.py:342-505): one
        DataFrame filter per constraint. ``contract`` overrides the
        stored one (dry-run evaluates a proposal without persisting)."""
        c = contract if contract is not None else self.get(table_name)
        violations = []
        for con in c["constraints"]:
            kind, col = con["type"], con.get("column")
            if col and col not in df.columns:
                violations.append({"constraint": kind, "column": col, "detail": "column missing"})
                continue
            try:
                n = self._constraint_failures(con, df)
            except ValueError as e:
                # an unevaluable constraint (e.g. pinned-model feature
                # drift) is a LOUD per-constraint failure, but must
                # not abort the other constraints' checks (r12 review)
                violations.append({"constraint": kind, "column": col,
                                   "error": str(e)[:300]})
                continue
            if n:
                violations.append({"constraint": kind, "column": col, "failed_rows": n})
        return violations

    def violations(self, table: LakeTable, stats: dict | None = None) -> dict:
        """Full check incl. quality + freshness (contracts.py:428-462)."""
        name = f"{table.namespace}.{table.table}"
        c = self.get(name) if name in self.list() else self.get(table.table)
        stats = stats or compute_table_stats(table)
        out = {
            "schema": self.validate_table(table),
            "constraints": self.validate_rows(c["table"], table.scan()),
            "quality": [],
            "freshness": [],
        }
        if c["quality"].get("min_score") is not None:
            q = quality_score(stats)
            if q["score"] < c["quality"]["min_score"]:
                out["quality"].append(
                    f"score {q['score']} < {c['quality']['min_score']}"
                )
        if c["freshness"].get("max_age_hours") is not None:
            cur = table.current_snapshot()
            if cur:
                import time

                age_h = (time.time() * 1000 - cur.timestamp_ms) / 3.6e6
                if age_h > c["freshness"]["max_age_hours"]:
                    out["freshness"].append(
                        f"age {age_h:.1f}h > {c['freshness']['max_age_hours']}h"
                    )
        out["compliant"] = not any(out[k] for k in ("schema", "constraints", "quality", "freshness"))
        return out

    def compliance_score(self, table: LakeTable, v: dict | None = None) -> float:
        """Monitor score (contracts.py:671-843): 100 − 25 per violating
        category."""
        v = v or self.violations(table)
        bad = sum(1 for k in ("schema", "constraints", "quality", "freshness") if v[k])
        return max(0.0, 100.0 - 25.0 * bad)

    # -- registry / coverage ----------------------------------------------

    def register_consumer(self, table: str, consumer: str) -> None:
        data = self.store.load()
        lst = data["consumers"].setdefault(table, [])
        if consumer not in lst:
            lst.append(consumer)
        self.store.save(data)

    def register_producer(self, table: str, producer: str) -> None:
        data = self.store.load()
        lst = data["producers"].setdefault(table, [])
        if producer not in lst:
            lst.append(producer)
        self.store.save(data)

    def remove_consumer(self, table: str, consumer: str) -> bool:
        data = self.store.load()
        lst = data["consumers"].get(table, [])
        if consumer not in lst:
            return False
        lst.remove(consumer)
        self.store.save(data)
        return True

    def consumers(self, table: str) -> list[str]:
        return self.store.load()["consumers"].get(table, [])

    def coverage(self, all_tables: list[str]) -> dict:
        """contracts.py:954-989."""
        covered = set(self.list())
        return {
            "covered": sorted(covered & set(all_tables)),
            "uncovered": sorted(set(all_tables) - covered),
            "pct": round(100.0 * len(covered & set(all_tables)) / len(all_tables), 1)
            if all_tables
            else 0.0,
        }

    # -- dry-run / monitoring / dashboard (contracts.py:1102-1431) ---------

    def dry_run(self, table: LakeTable, proposed: dict) -> dict:
        """Evaluate a proposed contract against current data WITHOUT
        persisting it: what would violate if adopted."""
        name = f"{table.namespace}.{table.table}"
        violations: list[dict] = []
        actual = {f.name: f.dataType.simpleString() for f in table.schema().fields}
        for col, spec in proposed.get("schema", {}).items():
            if col not in actual:
                violations.append({"kind": "schema", "detail": f"missing column {col!r}"})
            elif spec.get("type") and actual[col] != spec["type"]:
                violations.append(
                    {"kind": "schema",
                     "detail": f"{col}: {actual[col]} != {spec['type']}"}
                )
        # constraint checks via an in-memory contract — a dry run must
        # be read-only (persisting a __dry_run__ entry briefly exposed
        # it to concurrent listers and leaked it on a crash)
        tmp = {
            "table": name, "schema": {}, "quality": {}, "freshness": {},
            "constraints": proposed.get("constraints", []),
            "owner": None, "status": "dry_run", "version": 0, "history": [],
        }
        violations += [
            {"kind": "constraint", **v}
            for v in self.validate_rows(name, table.scan(), contract=tmp)
        ]
        return {"table": name, "would_violate": violations, "ok": not violations}

    def dry_run_migration(self, table: LakeTable, proposed: dict) -> dict:
        """Compare the CURRENT contract's violations against a PROPOSED
        replacement on live data (reference dry_run_migration): which
        violations the migration introduces, which it resolves, and
        whether it is safe (introduces none). Nothing is persisted."""
        import json as _json

        name = f"{table.namespace}.{table.table}"
        current = None
        for key in (name, table.table):
            if key in self.list():
                current = self.get(key)
                break
        cur_v = (
            self.dry_run(table, current)["would_violate"] if current else []
        )
        new_v = self.dry_run(table, proposed)["would_violate"]

        def sig(v: dict) -> str:
            return _json.dumps(v, sort_keys=True, default=str)

        cur_sigs = {sig(v) for v in cur_v}
        new_sigs = {sig(v) for v in new_v}
        introduced = new_sigs - cur_sigs
        resolved = cur_sigs - new_sigs
        return {
            "table": name,
            "current_violations": len(cur_v),
            "proposed_violations": len(new_v),
            "introduced_count": len(introduced),
            "resolved_count": len(resolved),
            "safe_to_migrate": not introduced,
        }

    def dry_run_report(self, table: LakeTable, proposed: dict) -> dict:
        """Per-constraint pass rates for a proposed contract (reference
        dry_run_report): schema compatibility + one result row per
        constraint with its violation count and pass percentage."""
        actual = {f.name: f.dataType.simpleString() for f in table.schema().fields}
        schema_problems = []
        for col, spec in proposed.get("schema", {}).items():
            if col not in actual:
                schema_problems.append(f"missing column {col!r}")
            elif spec.get("type") and actual[col] != spec["type"]:
                schema_problems.append(f"{col}: {actual[col]} != {spec['type']}")
        df = table.scan()
        total = df.count()
        results = []
        for con in proposed.get("constraints", []):
            col = con.get("column")
            if col and col not in df.columns:
                results.append(
                    {"rule": con["type"], "column": col, "violations": total,
                     "pass_rate": 0.0, "detail": "column missing"}
                )
                continue
            try:
                n = self._constraint_failures(con, df)
            except ValueError as e:
                results.append(
                    {"rule": con["type"], "column": col,
                     "violations": total, "pass_rate": 0.0,
                     "detail": str(e)[:300]}
                )
                continue
            if n is None:
                continue
            rate = 100.0 if total == 0 else round(100.0 * (total - n) / total, 2)
            results.append(
                {"rule": con["type"], "column": col, "violations": n, "pass_rate": rate}
            )
        schema_ok = not schema_problems
        return {
            "table": f"{table.namespace}.{table.table}",
            "rows_checked": total,
            "schema_compatible": schema_ok,
            "schema_problems": schema_problems,
            "constraint_results": results,
            "overall_pass": schema_ok and all(r["violations"] == 0 for r in results),
        }

    def monitor(self, table: LakeTable) -> dict:
        """Record a compliance check in the monitoring history (≤50):
        timestamp + score + passed flag + violation count (reference
        monitor_contract entry shape)."""
        from datetime import datetime, timezone

        v = self.violations(table)
        score = self.compliance_score(table, v)
        data = self.store.load()
        c = data["contracts"].get(f"{table.namespace}.{table.table}") or data[
            "contracts"
        ].get(table.table)
        entry = {
            "at": datetime.now(timezone.utc).isoformat(),
            "score": score,
            "passed": v["compliant"],
            "violation_count": sum(
                len(v[k]) for k in ("schema", "constraints", "quality", "freshness")
            ),
        }
        if c is not None:
            c.setdefault("monitoring", []).append(entry)
            c["monitoring"] = c["monitoring"][-HISTORY_CAP:]
            self.store.save(data)
        return entry

    def trends(self, table: str) -> dict:
        """Score trajectory from monitoring history."""
        c = self.get(table)
        hist = c.get("monitoring", [])
        scores = [h["score"] for h in hist]
        return {
            "table": table,
            "checks": len(scores),
            "latest": scores[-1] if scores else None,
            "min": min(scores) if scores else None,
            "max": max(scores) if scores else None,
            "improving": len(scores) >= 2 and scores[-1] >= scores[0],
        }

    def trends_all(self) -> list[dict]:
        """Violation trends across every monitored contract (reference
        get_violation_trends): one entry per contract that has at least
        one monitoring check, worst (lowest latest score) first."""
        out = [
            self.trends(t)
            for t, c in self.list().items()
            if c.get("monitoring")
        ]
        return sorted(out, key=lambda t: (t["latest"], t["table"]))

    def health(self, table: LakeTable) -> dict:
        """One-call contract health rollup (reference
        get_contract_health): existence, version/status, live
        compliance score, consumers, last check outcome."""
        name = f"{table.namespace}.{table.table}"
        contracts = self.list()
        key = name if name in contracts else (
            table.table if table.table in contracts else None
        )
        if key is None:
            return {"table": name, "has_contract": False}
        c = contracts[key]
        mon = c.get("monitoring", [])
        return {
            "table": name,
            "has_contract": True,
            "version": c["version"],
            "status": c["status"],
            "compliance_score": self.compliance_score(table),
            "consumers": self.consumers(key),
            "consumer_count": len(self.consumers(key)),
            "checks": len(mon),
            "last_check_passed": mon[-1].get("passed") if mon else None,
        }

    def dashboard(self, tables: list[LakeTable]) -> dict:
        """Compliance overview across tables (contracts.py:1266-1431)."""
        rows = []
        for t in tables:
            name = f"{t.namespace}.{t.table}"
            if name not in self.list() and t.table not in self.list():
                rows.append({"table": name, "status": "no_contract", "score": None})
                continue
            score = self.compliance_score(t)
            rows.append(
                {
                    "table": name,
                    "status": "compliant" if score == 100.0 else "violating",
                    "score": score,
                }
            )
        covered = [r for r in rows if r["status"] != "no_contract"]
        violating = [r for r in covered if r["status"] == "violating"]
        # recent failed monitoring checks across contracts, newest last
        recent = [
            {"table": t, "at": m["at"], "score": m["score"]}
            for t, c in self.list().items()
            for m in c.get("monitoring", [])
            if m.get("passed") is False
        ][-10:]
        return {
            "tables": rows,
            "covered": len(covered),
            "uncovered": len(rows) - len(covered),
            "avg_score": (
                round(sum(r["score"] for r in covered) / len(covered), 2)
                if covered
                else None
            ),
            # no contracts = vacuously compliant (reference dashboard)
            "compliance_rate": (
                round(100.0 * (len(covered) - len(violating)) / len(covered), 1)
                if covered
                else 100.0
            ),
            "worst_tables": sorted(
                violating, key=lambda r: (r["score"], r["table"])
            )[:5],
            "recent_violations": recent,
        }

    # -- auto-generation ---------------------------------------------------

    def generate_from_stats(
        self,
        table: LakeTable,
        stats: dict | None = None,
        strict: bool = False,
        enum_max_distinct: int = 10,
        save: bool = True,
    ) -> dict:
        """contracts.py:990-1101: schema from live table; not_null where
        column has no nulls; numeric ranges with 10% buffer (0% strict);
        enum constraint when distinct ≤ threshold."""
        name = f"{table.namespace}.{table.table}"
        stats = stats or compute_table_stats(table)
        schema = {
            f.name: {"type": f.dataType.simpleString(), "nullable": True}
            for f in table.schema().fields
        }
        constraints: list[dict] = []
        df = table.scan()
        for col, cs in stats["columns"].items():
            if cs["nulls"] == 0:
                constraints.append({"type": "not_null", "column": col})
                schema[col]["nullable"] = False
            if isinstance(cs.get("min"), (int, float)) and isinstance(
                cs.get("max"), (int, float)
            ):
                buf = 0.0 if strict else 0.1
                span = cs["max"] - cs["min"]
                constraints.append(
                    {
                        "type": "range",
                        "column": col,
                        "min": cs["min"] - span * buf,
                        "max": cs["max"] + span * buf,
                    }
                )
            elif cs["type"] == "string" and 0 < cs["distinct"] <= enum_max_distinct:
                values = [
                    r[0]
                    for r in df.select(col).where(F.col(col).isNotNull()).distinct().collect()
                ]
                constraints.append({"type": "enum", "column": col, "values": sorted(values)})
        if not save:  # preview: the generated contract without persisting
            return {"table": name, "schema": schema, "constraints": constraints,
                    "preview": True}
        return self.create(name, schema=schema, constraints=constraints)
