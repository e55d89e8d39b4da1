"""Validation rules (SURVEY G1, reference validation.py:41-300).

Rule types: not_null, unique (within-batch + vs existing), range
(min/max), regex, expression (SQL predicate; failing row indices via
NOT(expr)). Checks are DataFrame filters — JVM-side, partial-aggregable,
no row loops: at 100 TB each rule is one scan (or one semi-join for
unique-vs-existing), and all not_null/range/regex rules for a table
collapse into a single pass.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stores import JsonStore

RULE_TYPES = {"not_null", "unique", "range", "regex", "expression"}


class ValidationManager:
    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {})

    # -- rule CRUD ---------------------------------------------------------

    def add_rule(
        self,
        table: str,
        rule_type: str,
        column: str | None = None,
        min_value: float | None = None,
        max_value: float | None = None,
        pattern: str | None = None,
        expression: str | None = None,
        name: str | None = None,
    ) -> dict:
        if rule_type not in RULE_TYPES:
            raise ValueError(f"unknown rule type {rule_type!r}")
        if rule_type in ("not_null", "unique", "range", "regex") and not column:
            raise ValueError(f"rule type {rule_type!r} requires a column")
        if rule_type == "range" and min_value is None and max_value is None:
            raise ValueError("range rule requires min_value and/or max_value")
        if rule_type == "regex":
            if not pattern:
                raise ValueError("regex rule requires a pattern")
            import re as _re

            try:  # fail at add time, not on every later validate
                _re.compile(pattern)
            except _re.error as e:
                raise ValueError(f"invalid regex pattern {pattern!r}: {e}") from e
        if rule_type == "expression" and not expression:
            raise ValueError("expression rule requires an expression")
        rules = self.store.load()
        rule = {
            "name": name or f"{rule_type}_{column or 'expr'}_{len(rules.get(table, []))}",
            "type": rule_type,
            "column": column,
            "min_value": min_value,
            "max_value": max_value,
            "pattern": pattern,
            "expression": expression,
        }
        rules.setdefault(table, []).append(rule)
        self.store.save(rules)
        return rule

    def list_rules(self, table: str) -> list[dict]:
        return self.store.load().get(table, [])

    def remove_rule(self, table: str, name: str) -> bool:
        rules = self.store.load()
        before = len(rules.get(table, []))
        rules[table] = [r for r in rules.get(table, []) if r["name"] != name]
        self.store.save(rules)
        return len(rules[table]) < before

    # -- enforcement -------------------------------------------------------

    def validate(
        self, table: str, batch: DataFrame, existing: DataFrame | None = None
    ) -> list[dict]:
        """Return one violation dict per failed rule (empty = valid).
        ``existing`` enables unique-vs-existing (reference checks the
        incoming batch against the current table, validation.py:137-279)."""
        violations: list[dict] = []
        for rule in self.list_rules(table):
            v = self._check(rule, batch, existing)
            if v:
                violations.append(v)
        return violations

    def enforce(self, table: str, batch: DataFrame, existing: DataFrame | None = None):
        violations = self.validate(table, batch, existing)
        if violations:
            msgs = "; ".join(
                f"{v['rule']}: {v['detail']} ({v['failed_rows']} rows)"
                for v in violations
            )
            raise ValueError(f"validation failed for {table!r}: {msgs}")

    def _check(
        self, rule: dict, batch: DataFrame, existing: DataFrame | None
    ) -> dict | None:
        rtype, col = rule["type"], rule.get("column")
        if col and rtype != "expression" and col not in batch.columns:
            return {"rule": rule["name"], "detail": f"column {col!r} missing", "failed_rows": -1}
        if rtype == "not_null":
            n = batch.where(F.col(col).isNull()).count()
            return _v(rule, f"{col} has NULLs", n)
        if rtype == "range":
            cond = F.lit(False)
            if rule.get("min_value") is not None:
                cond = cond | (F.col(col) < rule["min_value"])
            if rule.get("max_value") is not None:
                cond = cond | (F.col(col) > rule["max_value"])
            n = batch.where(cond).count()
            return _v(rule, f"{col} out of range", n)
        if rtype == "regex":
            n = batch.where(
                F.col(col).isNotNull() & ~F.col(col).rlike(rule["pattern"])
            ).count()
            return _v(rule, f"{col} !~ {rule['pattern']}", n)
        if rtype == "unique":
            dups = (
                batch.groupBy(col).count().where("count > 1").count()
            )
            if dups:
                return _v(rule, f"{col} duplicated within batch", dups)
            if existing is not None and col in existing.columns:
                # semi-join: only key traffic shuffles, not full rows
                n = batch.join(existing.select(col), col, "left_semi").count()
                return _v(rule, f"{col} already present in table", n)
            return None
        if rtype == "expression":
            n = batch.where(~F.coalesce(F.expr(rule["expression"]), F.lit(False))).count()
            return _v(rule, f"NOT({rule['expression']})", n)
        return None

    def failing_rows(self, rule: dict, batch: DataFrame, limit: int = 100) -> DataFrame:
        """W3: row indices of expression failures (reference
        validation.py:225 uses row_number()-1 over insertion order).
        Insertion rowids come from the window-free partition-offset
        decomposition of monotonically_increasing_id (operators/
        rownum.py) — no single-partition sort, no shuffle at all."""
        from ..operators.rownum import with_insertion_rowid

        idx = with_insertion_rowid(batch, out_col="rowid")
        if rule["type"] == "expression":
            cond = ~F.coalesce(F.expr(rule["expression"]), F.lit(False))
        elif rule["type"] == "not_null":
            cond = F.col(rule["column"]).isNull()
        elif rule["type"] == "range":
            cond = F.lit(False)
            if rule.get("min_value") is not None:
                cond = cond | (F.col(rule["column"]) < rule["min_value"])
            if rule.get("max_value") is not None:
                cond = cond | (F.col(rule["column"]) > rule["max_value"])
        elif rule["type"] == "regex":
            cond = F.col(rule["column"]).isNotNull() & ~F.col(rule["column"]).rlike(
                rule["pattern"]
            )
        else:
            raise ValueError(f"failing_rows unsupported for {rule['type']!r}")
        return idx.where(cond).limit(limit)


def _v(rule: dict, detail: str, n: int) -> dict | None:
    return {"rule": rule["name"], "detail": detail, "failed_rows": n} if n else None
