"""Validation rules (SURVEY G1, reference validation.py:41-300).

Rule types: not_null, unique (within-batch + vs existing), range
(min/max), regex, expression (SQL predicate). Rules are stored in the
reference's format — generated 8-hex ``id``, ``min``/``max`` bounds,
``sql`` expression text, ``columns`` list for unique — with the
reference's add-time field checks and error messages
(validation.py:41-101).

Two enforcement surfaces:

- ``validate``: one violation dict per failed rule with a failing-row
  COUNT — DataFrame filters only, JVM-side, uncapped and aggregation
  cheap; used by quality scoring and the MCP gate where only counts
  matter (at 100 TB you never collect the failing rows themselves).
- ``validate_batch``: the reference's ``validate_rows`` result shape —
  {valid, failures[], checked} with one record per (rule, failing row)
  carrying ``row_index`` in insertion order (validation.py:140-279).
  Row indices come from the window-free partition-offset rowid
  (operators/rownum.py); the failure list is capped at
  ``max_failures`` per rule so a pathological batch cannot OOM the
  driver (the reference collects unbounded — a deliberate divergence,
  counts stay exact via ``validate``).
"""

from __future__ import annotations

import datetime
import re
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stores import JsonStore

RULE_TYPES = {"not_null", "unique", "range", "regex", "expression"}


class ValidationError(ValueError):
    """Raised when data fails validation (reference validation.py:14-20)."""

    def __init__(self, failures: list[dict]):
        self.failures = failures
        messages = [f["message"] for f in failures]
        super().__init__(f"Validation failed: {'; '.join(messages)}")


def _legacy_rule(
    rule_type: str,
    column: str | None = None,
    min_value=None,
    max_value=None,
    pattern: str | None = None,
    expression: str | None = None,
    **_ignored,
) -> dict:
    """Map the kwargs form (MCP tool surface) onto the reference rule dict."""
    rule: dict = {"type": rule_type}
    if rule_type == "unique":
        if column:
            rule["columns"] = [column]
    elif column:
        rule["column"] = column
    if min_value is not None:
        rule["min"] = min_value
    if max_value is not None:
        rule["max"] = max_value
    if pattern is not None:
        rule["pattern"] = pattern
    if expression is not None:
        rule["sql"] = expression
    return rule


class ValidationManager:
    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {})

    @staticmethod
    def _key(table: str) -> str:
        """Rules are keyed by SHORT table name (reference bare-name
        store); normalizing here keeps every surface consistent —
        add('default.users') and validate('users') hit the same rules."""
        return table.split(".", 1)[-1]

    # -- rule CRUD ---------------------------------------------------------

    def add_rule(self, table: str, rule: dict | str, **kw) -> dict:
        """Add a rule. ``rule`` is the reference's rule dict; a rule-type
        string plus kwargs (the MCP tool surface) is mapped onto it."""
        table = self._key(table)
        if isinstance(rule, str):
            rule = _legacy_rule(rule, **kw)
        rule_type = rule.get("type")
        if rule_type not in RULE_TYPES:
            raise ValueError(
                f"Invalid rule type '{rule_type}'. "
                f"Must be one of: {', '.join(sorted(RULE_TYPES))}"
            )
        if rule_type == "not_null":
            if not rule.get("column"):
                raise ValueError("not_null rule requires 'column'")
        elif rule_type == "unique":
            cols = rule.get("columns")
            if not cols or not isinstance(cols, list):
                raise ValueError("unique rule requires 'columns' (list)")
        elif rule_type == "range":
            if not rule.get("column"):
                raise ValueError("range rule requires 'column'")
            if "min" not in rule and "max" not in rule:
                raise ValueError("range rule requires at least 'min' or 'max'")
        elif rule_type == "regex":
            if not rule.get("column"):
                raise ValueError("regex rule requires 'column'")
            if not rule.get("pattern"):
                raise ValueError("regex rule requires 'pattern'")
            try:  # fail at add time, not on every later validate
                re.compile(rule["pattern"])
            except re.error as e:
                raise ValueError(f"Invalid regex pattern: {e}") from e
        elif rule_type == "expression":
            if not rule.get("sql"):
                raise ValueError("expression rule requires 'sql'")

        rule_id = uuid.uuid4().hex[:8]
        stored = {
            "id": rule_id,
            **rule,
            "created_at": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        }
        rules = self.store.load()
        rules.setdefault(table, []).append(stored)
        self.store.save(rules)
        return {**stored, "message": f"Added {rule_type} rule '{rule_id}' to {table}"}

    def list_rules(self, table: str) -> list[dict]:
        return self.store.load().get(self._key(table), [])

    def remove_rule(self, table: str, rule_id: str) -> dict:
        table = self._key(table)
        rules = self.store.load()
        for i, rule in enumerate(rules.get(table, [])):
            if rule["id"] == rule_id:
                removed = rules[table].pop(i)
                if not rules[table]:
                    del rules[table]
                self.store.save(rules)
                return {
                    "id": rule_id,
                    "type": removed["type"],
                    "message": f"Removed rule '{rule_id}' from {table}",
                }
        raise ValueError(f"Rule '{rule_id}' not found for table '{table}'")

    # -- enforcement: per-rule counts (scale path) -------------------------

    def validate(
        self, table: str, batch: DataFrame, existing: DataFrame | None = None
    ) -> list[dict]:
        """One violation dict per failed rule (empty = valid), counts only.
        ``existing`` enables unique-vs-existing (reference checks the
        incoming batch against the current table, validation.py:246-267)."""
        violations: list[dict] = []
        for rule in self.list_rules(table):
            v = self._check(rule, batch, existing)
            if v:
                violations.append(v)
        return violations

    def enforce(self, table: str, batch: DataFrame, existing: DataFrame | None = None):
        """Raise ValidationError when any rule fails (the reference's
        write-gate, validation.py:303-321). Failure records carry rule id,
        type and count — rows are never collected on this path."""
        violations = self.validate(table, batch, existing)
        if violations:
            raise ValidationError(
                [
                    {
                        "rule_id": v["rule"],
                        "rule_type": v["type"],
                        "message": f"{v['detail']} ({v['failed_rows']} rows)",
                    }
                    for v in violations
                ]
            )

    # -- enforcement: reference result shape (per-row records) -------------

    def validate_batch(
        self,
        table: str,
        batch: DataFrame,
        existing: DataFrame | None = None,
        max_failures: int = 1000,
    ) -> dict:
        """The reference ``validate_rows`` contract (validation.py:140-279):
        {valid, failures[], checked}, one failure per (rule, failing row),
        ``row_index`` in insertion order. Failure lists are capped at
        ``max_failures`` per rule (documented divergence; see module doc)."""
        from ..operators.rownum import with_insertion_rowid

        rules = self.list_rules(table)
        checked = batch.count()
        if not rules:
            return {"valid": True, "failures": [], "checked": checked}
        idx = with_insertion_rowid(batch, out_col="_row_index")
        failures: list[dict] = []
        for rule in rules:
            failures.extend(self._batch_failures(rule, idx, existing, max_failures))
        failures.sort(key=lambda f: (f.get("row_index", -1)))
        return {"valid": not failures, "failures": failures, "checked": checked}

    def _batch_failures(
        self, rule: dict, idx: DataFrame, existing: DataFrame | None, cap: int
    ) -> list[dict]:
        rtype, rid = rule["type"], rule["id"]
        cols = idx.columns

        if rtype == "not_null":
            col = rule["column"]
            if col not in cols:  # missing key is null (test_validation.py:159-162)
                rows = idx.select("_row_index").limit(cap).collect()
                vals = [(r["_row_index"],) for r in rows]
            else:
                rows = (
                    idx.where(F.col(col).isNull())
                    .select("_row_index").limit(cap).collect()
                )
                vals = [(r["_row_index"],) for r in rows]
            return [
                {
                    "rule_id": rid, "rule_type": "not_null", "row_index": i,
                    "column": col,
                    "message": f"Column '{col}' must not be null (row {i})",
                }
                for (i,) in vals
            ]

        if rtype == "range":
            col = rule["column"]
            if col not in cols:
                return []
            num = F.col(col).cast("double")
            out = []
            if rule.get("min") is not None:
                for r in (
                    idx.where(num.isNotNull() & (num < float(rule["min"])))
                    .select("_row_index", num.alias("_v")).limit(cap).collect()
                ):
                    i = r["_row_index"]
                    out.append({
                        "rule_id": rid, "rule_type": "range", "row_index": i,
                        "column": col,
                        "message": f"Column '{col}' value {r['_v']} is below minimum {rule['min']} (row {i})",
                    })
            if rule.get("max") is not None:
                for r in (
                    idx.where(num.isNotNull() & (num > float(rule["max"])))
                    .select("_row_index", num.alias("_v")).limit(cap).collect()
                ):
                    i = r["_row_index"]
                    out.append({
                        "rule_id": rid, "rule_type": "range", "row_index": i,
                        "column": col,
                        "message": f"Column '{col}' value {r['_v']} is above maximum {rule['max']} (row {i})",
                    })
            return out

        if rtype == "regex":
            col = rule["column"]
            if col not in cols:
                return []
            txt = F.col(col).cast("string")
            # reference uses pattern.match -> anchored at start only
            cond = F.col(col).isNotNull() & ~txt.rlike(f"^(?:{rule['pattern']})")
            return [
                {
                    "rule_id": rid, "rule_type": "regex",
                    "row_index": r["_row_index"], "column": col,
                    "message": (
                        f"Column '{col}' value '{r['_v']}' does not match "
                        f"pattern '{rule['pattern']}' (row {r['_row_index']})"
                    ),
                }
                for r in idx.where(cond)
                .select("_row_index", txt.alias("_v")).limit(cap).collect()
            ]

        if rtype == "expression":
            sql = rule["sql"]
            try:
                # NOT(expr): NULL predicates drop out, i.e. pass — the
                # reference's SQL WHERE semantics (validation.py:224-228)
                rows = (
                    idx.where(~F.expr(sql))
                    .select("_row_index").limit(cap).collect()
                )
            except Exception as e:
                return [{
                    "rule_id": rid, "rule_type": "expression", "row_index": -1,
                    "message": f"Expression rule error: {e}",
                }]
            return [
                {
                    "rule_id": rid, "rule_type": "expression",
                    "row_index": r["_row_index"],
                    "message": f"Row {r['_row_index']} failed expression: {sql}",
                }
                for r in rows
            ]

        if rtype == "unique":
            ucols = rule["columns"]
            if any(c not in cols for c in ucols):
                return []
            # within-batch: every occurrence after the first of its key
            from pyspark.sql.window import Window

            w = Window.partitionBy(*ucols)
            dup = (
                idx.withColumn("_first", F.min("_row_index").over(w))
                .where(F.col("_row_index") > F.col("_first"))
                .select("_row_index", "_first").limit(cap).collect()
            )
            out = [
                {
                    "rule_id": rid, "rule_type": "unique",
                    "row_index": r["_row_index"], "columns": ucols,
                    "message": (
                        f"Duplicate value for columns {ucols} at row "
                        f"{r['_row_index']} (same as row {r['_first']})"
                    ),
                }
                for r in dup
            ]
            if existing is not None and all(c in existing.columns for c in ucols):
                # semi-join: only key traffic shuffles, not full rows
                hit = (
                    idx.join(existing.select(*ucols), ucols, "left_semi")
                    .select("_row_index").limit(cap).collect()
                )
                out.extend(
                    {
                        "rule_id": rid, "rule_type": "unique",
                        "row_index": r["_row_index"], "columns": ucols,
                        "message": (
                            f"Value for columns {ucols} at row "
                            f"{r['_row_index']} already exists in table"
                        ),
                    }
                    for r in hit
                )
            return out
        return []

    # -- count-based checks (shared scale path) ----------------------------

    def _check(
        self, rule: dict, batch: DataFrame, existing: DataFrame | None
    ) -> dict | None:
        rtype = rule["type"]
        col = rule.get("column")
        name = rule.get("id", rule.get("name", rtype))
        if rtype == "unique":
            ucols = rule.get("columns", [])
            if any(c not in batch.columns for c in ucols):
                return _v(name, rtype, f"columns {ucols} missing", -1)
            dups = (
                batch.groupBy(*ucols).count().where("count > 1").count()
            )
            if dups:
                return _v(name, rtype, f"{ucols} duplicated within batch", dups)
            if existing is not None and all(c in existing.columns for c in ucols):
                n = batch.join(existing.select(*ucols), ucols, "left_semi").count()
                return _v(name, rtype, f"{ucols} already present in table", n)
            return None
        if rtype == "expression":
            sql = rule["sql"]
            # NOT(expr): NULL predicates drop out, i.e. pass — the
            # reference's SQL WHERE semantics (validation.py:224-228)
            n = batch.where(~F.expr(sql)).count()
            return _v(name, rtype, f"NOT({sql})", n)
        if col and col not in batch.columns:
            return _v(name, rtype, f"column {col!r} missing", -1)
        if rtype == "not_null":
            n = batch.where(F.col(col).isNull()).count()
            return _v(name, rtype, f"{col} has NULLs", n)
        if rtype == "range":
            cond = F.lit(False)
            if rule.get("min") is not None:
                cond = cond | (F.col(col) < rule["min"])
            if rule.get("max") is not None:
                cond = cond | (F.col(col) > rule["max"])
            n = batch.where(cond).count()
            return _v(name, rtype, f"{col} out of range", n)
        if rtype == "regex":
            n = batch.where(
                F.col(col).isNotNull()
                & ~F.col(col).cast("string").rlike(f"^(?:{rule['pattern']})")
            ).count()
            return _v(name, rtype, f"{col} !~ {rule['pattern']}", n)
        return None

    def failing_rows(self, rule: dict, batch: DataFrame, limit: int = 100) -> DataFrame:
        """W3: row indices of rule failures (reference validation.py:225
        uses row_number()-1 over insertion order). Insertion rowids come
        from the window-free partition-offset decomposition of
        monotonically_increasing_id (operators/rownum.py) — no
        single-partition sort, no shuffle at all."""
        from ..operators.rownum import with_insertion_rowid

        idx = with_insertion_rowid(batch, out_col="rowid")
        rtype = rule["type"]
        if rtype == "expression":
            cond = ~F.expr(rule["sql"])  # NULL passes (validation.py:224-228)
        elif rtype == "not_null":
            cond = F.col(rule["column"]).isNull()
        elif rtype == "range":
            cond = F.lit(False)
            if rule.get("min") is not None:
                cond = cond | (F.col(rule["column"]) < rule["min"])
            if rule.get("max") is not None:
                cond = cond | (F.col(rule["column"]) > rule["max"])
        elif rtype == "regex":
            cond = F.col(rule["column"]).isNotNull() & ~F.col(
                rule["column"]
            ).cast("string").rlike(f"^(?:{rule['pattern']})")
        else:
            raise ValueError(f"failing_rows unsupported for {rtype!r}")
        return idx.where(cond).limit(limit)


def _v(name: str, rtype: str, detail: str, n: int) -> dict | None:
    return (
        {"rule": name, "type": rtype, "detail": detail, "failed_rows": n}
        if n
        else None
    )
