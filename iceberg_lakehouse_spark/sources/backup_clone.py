"""Backup/restore archives and table cloning (SURVEY §2.1 S17-S18).

Backup: snapshot → parquet + metadata.json + sha256 checksums in a
tar.gz (reference backup.py:22-511). Clone: copy-by-snapshot with
promote/discard (reference cloning.py:35-218) — on Spark, clone is a
CTAS of the resolved snapshot scan.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tarfile
import tempfile
import time

from ..catalog import LakehouseCatalog, LakeTable


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def backup_table(table: LakeTable, archive_path: str, as_of: str | None = None) -> dict:
    from .io import export_table

    tmp = tempfile.mkdtemp(prefix="lh_backup_")
    try:
        data_path = os.path.join(tmp, "data.parquet")
        df = table.scan(as_of=as_of) if as_of else table.scan()
        rows = df.count()
        from .io import export_dataframe

        export_dataframe(df, data_path, "parquet")
        meta = {
            "table": f"{table.namespace}.{table.table}",
            "rows": rows,
            "schema": table.meta()["schema"],
            "partition_spec": table.meta().get("partition_spec", []),
            "properties": table.properties(),
            "created_ms": int(time.time() * 1000),
            "checksums": {"data.parquet": _sha256(data_path)},
        }
        meta_path = os.path.join(tmp, "metadata.json")
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=1)
        os.makedirs(os.path.dirname(os.path.abspath(archive_path)), exist_ok=True)
        with tarfile.open(archive_path, "w:gz") as tar:
            tar.add(data_path, arcname="data.parquet")
            tar.add(meta_path, arcname="metadata.json")
        return {"archive": archive_path, "rows": rows}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def verify_backup(archive_path: str) -> dict:
    tmp = tempfile.mkdtemp(prefix="lh_verify_")
    try:
        with tarfile.open(archive_path, "r:gz") as tar:
            tar.extractall(tmp, filter="data")
        with open(os.path.join(tmp, "metadata.json")) as f:
            meta = json.load(f)
        ok = all(
            _sha256(os.path.join(tmp, name)) == expected
            for name, expected in meta["checksums"].items()
        )
        return {"valid": ok, "table": meta["table"], "rows": meta["rows"]}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def restore_table(
    catalog: LakehouseCatalog, archive_path: str, table_name: str | None = None,
    overwrite: bool = False,
) -> dict:
    tmp = tempfile.mkdtemp(prefix="lh_restore_")
    try:
        with tarfile.open(archive_path, "r:gz") as tar:
            tar.extractall(tmp, filter="data")
        with open(os.path.join(tmp, "metadata.json")) as f:
            meta = json.load(f)
        for name, expected in meta["checksums"].items():
            if _sha256(os.path.join(tmp, name)) != expected:
                raise ValueError(f"checksum mismatch for {name} — archive corrupt")
        target = table_name or meta["table"]
        df = catalog.spark.read.parquet(os.path.join(tmp, "data.parquet"))
        if catalog.table_exists(target):
            if not overwrite:
                raise ValueError(f"table {target!r} exists (use overwrite=True)")
            t = catalog.load_table(target)
            t.overwrite(t._align(df))
        else:
            from pyspark.sql import types as T

            schema = T.StructType(
                [
                    T.StructField(f["name"], _type_from_str(f["type"]), True)
                    for f in meta["schema"]["fields"]
                ]
            )
            t = catalog.create_table(target, schema)
            t.append(df)
        return {"table": target, "rows": meta["rows"]}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _type_from_str(s: str):
    from ..catalog import _parse_type

    return _parse_type(s)


# -- cloning (S18) ---------------------------------------------------------

def clone_table(
    catalog: LakehouseCatalog, source: str, clone_name: str, as_of: str | None = None
) -> dict:
    src = catalog.load_table(source)
    if catalog.table_exists(clone_name):
        raise ValueError(f"table {clone_name!r} already exists")
    df = src.scan(as_of=as_of) if as_of else src.scan()
    clone = catalog.create_table(
        clone_name, src.schema(),
        partition_by=None,
        properties={**src.properties(), "cloned_from": source},
    )
    # carry the partition spec over verbatim
    meta = clone.meta()
    meta["partition_spec"] = src.meta().get("partition_spec", [])
    clone._write_meta(meta)
    clone.append(df)
    return {"clone": clone_name, "rows": clone.scan().count(), "source": source}


def promote_clone(catalog: LakehouseCatalog, clone_name: str, target: str) -> dict:
    """Promote = overwrite target with clone contents (reference
    cloning.py promote — an INSERT OVERWRITE, preserving target history)."""
    clone = catalog.load_table(clone_name)
    tgt = catalog.load_table(target)
    tgt.overwrite(tgt._align(clone.scan()))
    return {"promoted": clone_name, "into": target}


def discard_clone(catalog: LakehouseCatalog, clone_name: str) -> None:
    catalog.drop_table(clone_name)
