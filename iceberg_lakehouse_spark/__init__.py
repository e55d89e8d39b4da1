"""iceberg_lakehouse_spark — a PySpark-native lakehouse analytics engine.

A from-scratch rebuild of the capabilities of the reference lakehouse
(jpequegn/iceberg-lakehouse, surveyed in SURVEY.md): snapshot-versioned
tables, SQL query surface, CRUD/merge, time travel, CDC, incremental
processing, dedup/sampling/masking/validation/quality operators,
materialized views, pipelines, lineage, retention/maintenance — all
expressed Spark-first (DataFrame/SQL + Catalyst), designed for a
1000-executor cluster at 100 TB even though tests run on local[32].

Layout:
  session      SparkSession factory tuned for scale (AQE, pushdown, Arrow)
  catalog      snapshot-log table format on Parquet (Iceberg-like semantics)
  operators/   relational + lakehouse operators (CRUD, dedup, sampling, CDC…)
  sources/     import/export connectors (CSV/JSON/NDJSON/Parquet/ORC)
  functions/   scalar/text/similarity function library (JVM-side first)
  plans/       query engine façade, auto-limit, time travel, advisor, cache
  streaming/   Structured Streaming over the events table
  governance/  validation, masking, lineage, audit, views, pipelines…
  suite/       oracle-paired query registry consumed by __spark_entry__
"""

__version__ = "0.1.0"
