"""File import/export (SURVEY §2.1 S4-S14).

Import: CSV/TSV, JSON-array, NDJSON, Parquet, ORC → snapshot table,
with the reference's ``if_exists`` contract (fail/append/replace,
catalog.py:1540-1583): append schema-checks, casts, and null-fills
missing columns.

Export: table/DataFrame → CSV / JSON-array / NDJSON / Parquet / ORC
with the pushdown trio (WHERE, column projection, LIMIT — applied
*before* the write so they reach the scan, unlike the reference which
materializes first, catalog.py:1752-1772).

ORC stands in for the reference's Vortex side-format (S11-S13): same
convert/convert-back API shape, Spark-native (SURVEY §7 substitution).
Single-file outputs use coalesce(1) — correct for the reference's
local-file contract; directory outputs are the 100 TB path.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import LakehouseCatalog, LakeTable


def _read_file(
    spark: SparkSession,
    path: str,
    file_format: str | None = None,
    delimiter: str = ",",
    has_header: bool = True,
) -> DataFrame:
    fmt = file_format or _infer_format(path)
    if fmt in ("csv", "tsv"):
        sep = "\t" if fmt == "tsv" else delimiter
        return (
            spark.read.option("header", has_header)
            .option("sep", sep)
            .option("inferSchema", True)
            .csv(path)
        )
    if fmt == "json":
        # whole-file JSON array (reference dumps to NDJSON first,
        # catalog.py:1500-1518; Spark reads it natively with multiLine)
        return spark.read.option("multiLine", True).json(path)
    if fmt == "ndjson":
        return spark.read.json(path)
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        return spark.read.orc(path)
    raise ValueError(f"Unsupported format: {fmt!r}")


_EXT_FORMATS = {"tsv": "tsv", "csv": "csv", "json": "json", "ndjson": "ndjson",
                "jsonl": "ndjson", "parquet": "parquet", "orc": "orc"}


def _infer_format(path: str, default: str | None = "csv") -> str:
    """Format from the file extension. ``default=None`` raises on an
    unknown extension (import contract, reference catalog.py:1460-1470
    'Cannot auto-detect format'); exports keep the .csv default."""
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    fmt = _EXT_FORMATS.get(ext, default)
    if fmt is None:
        raise ValueError(
            f"Cannot auto-detect format for extension '.{ext}' — "
            "pass file_format explicitly"
        )
    return fmt


def import_file(
    catalog: LakehouseCatalog,
    path: str,
    table_name: str,
    file_format: str | None = None,
    if_exists: str = "fail",
    delimiter: str = ",",
    has_header: bool = True,
) -> dict:
    """S4-S6 + C7. Returns the reference result shape (catalog.py:
    1440-1538): rows_imported / format / qualified table, plus our
    mode and legacy rows keys."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"File not found: {path}")
    fmt = file_format or _infer_format(path, default=None)
    if fmt not in _EXT_FORMATS.values():
        raise ValueError(f"Unsupported format: {fmt!r}")
    df = _read_file(catalog.spark, path, fmt, delimiter, has_header)
    rows = df.count()
    exists = catalog.table_exists(table_name)
    if exists and if_exists == "fail":
        raise ValueError(f"table {table_name!r} already exists")
    if not exists:
        table = catalog.create_table(table_name, df.schema)
        table.append(df)
        mode = "create"
    elif if_exists == "replace":
        table = catalog.load_table(table_name)
        table.overwrite(table._align(df))
        mode = "replace"
    elif if_exists == "append":
        table = catalog.load_table(table_name)
        extra = set(df.columns) - {f.name for f in table.schema().fields}
        if extra:
            raise ValueError(
                f"file has columns not in table {table_name!r}: {sorted(extra)}"
            )
        table.append(df)  # _align casts + null-fills missing columns
        mode = "append"
    else:
        raise ValueError(f"invalid if_exists {if_exists!r}")
    return {
        "table": f"{table.namespace}.{table.table}",
        "rows_imported": rows,
        # the reference reports TSV as csv (same reader family)
        "format": "csv" if fmt == "tsv" else fmt,
        "mode": mode,
        "rows": rows,
    }


_FMT_EXT = {"csv": ".csv", "tsv": ".tsv", "json": ".json",
            "ndjson": ".ndjson", "parquet": ".parquet", "orc": ".orc"}


def export_table(
    table: LakeTable,
    path: str | None = None,
    file_format: str | None = None,
    where: str | None = None,
    columns: list[str] | None = None,
    limit: int | None = None,
    single_file: bool = True,
) -> dict:
    """S7-S10 with the reference result shape (catalog.py:1700-1810):
    rows_exported/format/output/table; ``path=None`` defaults to
    <table><ext> in the working directory."""
    if path is None:
        fmt = (file_format or "csv").lower()
        path = f"{table.table}{_FMT_EXT.get(fmt, '.csv')}"
    # scan(filter=) plans the export read over stats-surviving files
    # only; export_dataframe then skips its redundant where re-apply
    src = table.scan(filter=where) if where else table.scan()
    result = export_dataframe(
        src, path, file_format, None, columns, limit, single_file
    )
    result["table"] = f"{table.namespace}.{table.table}"
    return result


def export_dataframe(
    df: DataFrame,
    path: str,
    file_format: str | None = None,
    where: str | None = None,
    columns: list[str] | None = None,
    limit: int | None = None,
    single_file: bool = True,
) -> dict:
    """S7-S10: pushdown trio applied before the write. ``file_format``
    None = auto-detect from the path extension (reference export
    auto-detect; .csv default), explicit format overrides."""
    if file_format is None:
        file_format = _infer_format(path)
    if where:
        df = df.where(F.expr(where))
    if columns:
        unknown = set(columns) - set(df.columns)
        if unknown:
            raise ValueError(f"Columns not found: {sorted(unknown)}")
        df = df.select(*columns)
    if limit is not None:  # limit=0 means zero rows, not "no limit"
        df = df.limit(limit)

    fmt = file_format.lower()
    rows = df.count()
    if fmt in ("csv", "tsv"):
        _write_single_or_dir(
            df, path, single_file,
            lambda d, p: d.write.mode("overwrite")
            .option("header", True)
            .option("sep", "\t" if fmt == "tsv" else ",")
            .csv(p),
            ".csv",
        )
    elif fmt == "ndjson":
        _write_single_or_dir(
            df, path, single_file,
            lambda d, p: d.write.mode("overwrite").json(p), ".json"
        )
    elif fmt == "json":
        # JSON array with ISO datetimes (reference catalog.py:1782-1807)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        recs = [json.loads(r) for r in df.toJSON().collect()]
        with open(path, "w") as f:
            json.dump(recs, f, indent=1, default=str)
    elif fmt == "parquet":
        _write_single_or_dir(
            df, path, single_file,
            lambda d, p: d.write.mode("overwrite").parquet(p), ".parquet"
        )
    elif fmt == "orc":
        _write_single_or_dir(
            df, path, single_file,
            lambda d, p: d.write.mode("overwrite").orc(p), ".orc"
        )
    else:
        raise ValueError(f"Unsupported format: {file_format!r}")
    return {
        "path": path,
        "output": path,
        "rows": rows,
        "rows_exported": rows,
        "format": fmt,
    }


def _write_single_or_dir(df, path, single_file, write_fn, ext) -> None:
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)  # reference creates parent dirs
    if not single_file:
        write_fn(df, path)
        return
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="lh_export_")
    try:
        write_fn(df.coalesce(1), tmp)
        part = next(
            os.path.join(tmp, f)
            for f in sorted(os.listdir(tmp))
            if f.startswith("part-")
        )
        shutil.move(part, path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# -- second columnar format (S11-S13, Vortex→ORC substitution) ------------

def convert_file(spark: SparkSession, src: str, dst: str) -> dict:
    """parquet⇄orc file conversion (reference vortex_io.py:86-160)."""
    src_fmt, dst_fmt = _infer_format(src), _infer_format(dst)
    df = _read_file(spark, src, src_fmt)
    return export_dataframe(df, dst, dst_fmt)


def table_to_orc(table: LakeTable, path: str) -> dict:
    """Current snapshot → single ORC file (reference vortex_io.py:163-203)."""
    return export_table(table, path, file_format="orc")
