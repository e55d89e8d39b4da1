"""Oracle-paired query registry.

Each operator family (SURVEY.md §2) contributes named queries here; the
driver contract ``__spark_entry__.py`` exposes them via ``queries()`` /
``oracle_sql()``. A registered query is:

  * a Spark callable ``(SparkSession, sf_dir) -> DataFrame`` — the
    idiomatic-PySpark implementation of the operator, and
  * (when SQL-expressible) an ANSI SQL string DuckDB runs over the same
    parquet tables — the correctness oracle.

Cross-engine determinism rules (FIXTURES.md conventions):
  * every computed column aliased identically on both sides;
  * double SUM/AVG go through DECIMAL so the result is independent of
    partial-aggregation order (Spark shuffles; DuckDB does not);
  * LIMIT always carries a total deterministic ORDER BY tie-break;
  * timestamps grouped via EXTRACT-style integer parts or ISO strings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class OracleQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    survey_ref: str = ""  # SURVEY §2 operator ids this query certifies
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, OracleQuery] = {}


def register(
    name: str, oracle: str | None, survey_ref: str = "", tags: tuple[str, ...] = ()
):
    """Decorator: add a Spark query fn + its DuckDB oracle to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate suite query name: {name}")
        REGISTRY[name] = OracleQuery(name, fn, oracle, survey_ref, tags)
        return fn

    return deco


def load_all() -> dict[str, OracleQuery]:
    """Import every suite module (side-effect: registration) and return all."""
    from . import (  # noqa: F401
        crud,
        dedup,
        extended,
        llm_dedup,
        relational,
        sampling,
        similarity,
        temporal,
        text,
    )
    from . import quality  # noqa: F401  — after r1/r2: keeps the driver's first-50 slate stable
    from . import training  # noqa: F401  — round-4 additions, likewise last

    # Oracle-paired entries first, rows-only last: the driver's harness may
    # cap how many entries it runs (round 1 ran exactly the first 50), so
    # the strongest (hash-matched) checks must never be the ones dropped.
    ordered = {k: v for k, v in REGISTRY.items() if v.oracle is not None}
    ordered.update({k: v for k, v in REGISTRY.items() if v.oracle is None})
    return ordered
