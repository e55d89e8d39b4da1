"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are generated from the suite registry in
``iceberg_lakehouse_spark/suite/`` — one oracle-paired entry per
implemented operator family from SURVEY.md §2 (plus the LLM-pipeline
operators). Non-SQL-expressible ops register with ``oracle=None`` and
get the driver's rows-only check.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from iceberg_lakehouse_spark.suite import load_all

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: 5-way star join revenue rollup on sf0.001."""
    from iceberg_lakehouse_spark.suite.relational import revenue_by_nation_month

    return revenue_by_nation_month(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: textwrap.dedent(q.oracle).strip()
        for name, q in load_all().items()
        if q.oracle is not None
    }
