"""Masking policies (SURVEY G2, reference masking.py:38-246).

Strategies per table.column: hash (sha256[:16]), redact (default
'***'), nullify, truncate (len default 3 + '***'), expression (SQL
with a ``col`` placeholder). Applied post-query to any result column
whose *name* matches a policy — including policies declared on other
tables (the reference's cross-table-by-column-name quirk,
masking.py:167-176, preserved deliberately; tests encode it).

All transforms are native Column expressions — no Python hooks, so
masking costs one projection inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stores import JsonStore

STRATEGIES = {"hash", "redact", "nullify", "truncate", "expression"}


class MaskingManager:
    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {})

    def add_policy(
        self,
        table: str,
        column: str,
        strategy: str,
        replacement: str | None = None,
        truncate_length: int = 3,
        expression: str | None = None,
    ) -> dict:
        if strategy not in STRATEGIES:
            raise ValueError(f"unknown strategy {strategy!r}")
        if strategy == "expression" and not expression:
            raise ValueError("expression strategy requires an expression")
        policies = self.store.load()
        pol = {
            "column": column,
            "strategy": strategy,
            "replacement": replacement,
            "truncate_length": truncate_length,
            "expression": expression,
        }
        policies.setdefault(table, {})[column] = pol
        self.store.save(policies)
        return pol

    def remove_policy(self, table: str, column: str) -> bool:
        policies = self.store.load()
        removed = policies.get(table, {}).pop(column, None) is not None
        self.store.save(policies)
        return removed

    def list_policies(self, table: str | None = None) -> dict:
        policies = self.store.load()
        return policies.get(table, {}) if table else policies

    def apply(self, df: DataFrame, table: str | None = None) -> DataFrame:
        """Mask matching columns of a result DataFrame. Reference quirk:
        policies from ALL tables apply by column name (masking.py:167-171)."""
        policies = self.store.load()
        by_column: dict[str, dict] = {}
        for _t, cols in policies.items():
            for col, pol in cols.items():
                by_column.setdefault(col, pol)
        if table and table in policies:  # own-table policies win
            by_column.update(policies[table])
        if not by_column:
            return df
        out = []
        for name in df.columns:
            pol = by_column.get(name)
            out.append(self._mask_expr(name, pol) if pol else F.col(name))
        return df.select(*out)

    @staticmethod
    def _mask_expr(name: str, pol: dict) -> F.Column:
        c = F.col(name)
        s = pol["strategy"]
        if s == "hash":
            return F.when(
                c.isNull(), F.lit(None).cast("string")
            ).otherwise(F.substring(F.sha2(c.cast("string"), 256), 1, 16)).alias(name)
        if s == "redact":
            rep = pol.get("replacement") or "***"
            return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
                F.lit(rep)
            ).alias(name)
        if s == "nullify":
            return F.lit(None).cast("string").alias(name)
        if s == "truncate":
            n = pol.get("truncate_length", 3)
            return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
                F.concat(F.substring(c.cast("string"), 1, n), F.lit("***"))
            ).alias(name)
        if s == "expression":
            return F.expr(pol["expression"].replace("col", name)).alias(name)
        raise ValueError(f"unknown strategy {s!r}")
