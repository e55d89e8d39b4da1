"""Masking policies (SURVEY G2, reference masking.py:38-246).

Strategies per table.column: hash (sha256[:16]), redact (default
'***'), nullify, truncate (keep first N chars + '***', short strings
pass through unchanged — masking.py:148-153), expression (SQL with a
``col`` placeholder, masking.py:180-186). Policies are stored keyed by
namespace-qualified table name (bare names get ``default.`` —
masking.py:32-35); adding a duplicate raises until the old policy is
removed (masking.py:68-72).

Query-time application is the reference's cross-table-by-column-name
quirk (masking.py:167-176, preserved deliberately; tests encode it):
a policy on ANY table masks same-named result columns. Preview applies
only the named table's own policies (masking.py:216-218).

All transforms are native Column expressions — no Python hooks, so
masking costs one projection inside whole-stage codegen.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stores import JsonStore

VALID_STRATEGIES = {"hash", "redact", "nullify", "truncate", "expression"}


def _normalize(table: str) -> str:
    """Bare table names live in the ``default`` namespace (masking.py:32-35)."""
    return table if "." in table else f"default.{table}"


class MaskingManager:
    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {})

    def add_policy(
        self,
        table: str,
        column: str,
        strategy: str,
        options: dict | None = None,
    ) -> dict:
        if strategy not in VALID_STRATEGIES:
            raise ValueError(
                f"Invalid strategy '{strategy}'. "
                f"Must be one of: {', '.join(sorted(VALID_STRATEGIES))}"
            )
        if strategy == "expression" and (not options or "sql" not in options):
            raise ValueError("Expression strategy requires 'sql' in options")
        table = _normalize(table)
        policies = self.store.load()
        if column in policies.get(table, {}):
            raise ValueError(
                f"Masking policy already exists for '{table}.{column}'. "
                "Remove it first to change the policy."
            )
        policies.setdefault(table, {})[column] = {
            "strategy": strategy,
            "options": options or {},
            "created_at": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        }
        self.store.save(policies)
        return {
            "table": table,
            "column": column,
            "strategy": strategy,
            "options": options or {},
            "message": f"Masking policy '{strategy}' added for '{table}.{column}'",
        }

    def remove_policy(self, table: str, column: str) -> dict:
        table = _normalize(table)
        policies = self.store.load()
        if column in policies.get(table, {}):
            del policies[table][column]
            if not policies[table]:
                del policies[table]
            self.store.save(policies)
            return {
                "table": table,
                "column": column,
                "message": f"Masking policy removed for '{table}.{column}'",
            }
        return {
            "table": table,
            "column": column,
            "message": f"No masking policy found for '{table}.{column}'",
        }

    def list_policies(self, table: str | None = None) -> list[dict]:
        policies = self.store.load()
        if table is not None:
            table = _normalize(table)
            policies = {table: policies.get(table, {})}
        return [
            {
                "table": tbl,
                "column": col,
                "strategy": pol["strategy"],
                "options": pol.get("options", {}),
            }
            for tbl, cols in policies.items()
            for col, pol in cols.items()
        ]

    def apply(self, df: DataFrame, table: str | None = None) -> DataFrame:
        """Mask matching columns of a result DataFrame. Reference quirk:
        policies from ALL tables apply by column name (masking.py:167-171)."""
        policies = self.store.load()
        by_column: dict[str, dict] = {}
        for _t, cols in policies.items():
            for col, pol in cols.items():
                by_column.setdefault(col, pol)
        if table and _normalize(table) in policies:  # own-table policies win
            by_column.update(policies[_normalize(table)])
        return self._project(df, by_column)

    def preview(self, df: DataFrame, table: str, max_rows: int = 5) -> dict:
        """Original vs masked head of a table scan; only the named table's
        own policies apply (masking.py:216-218)."""
        table = _normalize(table)
        policies = self.store.load().get(table, {})
        head = df.limit(max_rows)
        original = [r.asDict(recursive=True) for r in head.collect()]
        masked = [
            r.asDict(recursive=True)
            for r in self._project(head, dict(policies)).collect()
        ]
        n = len(policies)
        return {
            "table": table,
            "rows": max_rows,
            "original": original,
            "masked": masked,
            "policies_applied": n,
            "message": f"Preview of '{table}' with {n} masking policy/policies applied",
        }

    def _project(self, df: DataFrame, by_column: dict[str, dict]) -> DataFrame:
        if not by_column:
            return df
        return df.select(
            *[
                self._mask_expr(name, by_column[name])
                if name in by_column
                else F.col(name)
                for name in df.columns
            ]
        )

    @staticmethod
    def _mask_expr(name: str, pol: dict) -> F.Column:
        c = F.col(name)
        s = pol["strategy"]
        opts = pol.get("options", {})
        null_str = F.lit(None).cast("string")
        if s == "hash":
            return (
                F.when(c.isNull(), null_str)
                .otherwise(F.substring(F.sha2(c.cast("string"), 256), 1, 16))
                .alias(name)
            )
        if s == "redact":
            rep = opts.get("replacement", "***")
            return F.when(c.isNull(), null_str).otherwise(F.lit(rep)).alias(name)
        if s == "nullify":
            return null_str.alias(name)
        if s == "truncate":
            n = opts.get("length", 3)
            txt = c.cast("string")
            # short values pass through unchanged (masking.py:148-153)
            return (
                F.when(c.isNull(), null_str)
                .when(F.length(txt) <= n, txt)
                .otherwise(F.concat(F.substring(txt, 1, n), F.lit("***")))
                .alias(name)
            )
        if s == "expression":
            return F.expr(opts["sql"].replace("col", name)).alias(name)
        raise ValueError(f"Invalid strategy '{s}'")
