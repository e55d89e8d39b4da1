"""Backup/restore archives and table cloning (SURVEY §2.1 S17-S18).

Backup: snapshot → parquet + metadata.json + sha256 checksums in a
tar.gz (reference backup.py:22-511); namespace backups bundle one
member directory per table plus a manifest. Clone: copy-by-snapshot
with a clones registry + promote/discard lifecycle (reference
cloning.py:35-218) — on Spark, clone is a CTAS of the resolved
snapshot scan.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tarfile
import tempfile
import time
from datetime import datetime, timezone

from ..catalog import LakehouseCatalog, LakeTable


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _table_backup_meta(table: LakeTable, rows: int, checksum: str) -> dict:
    name = f"{table.namespace}.{table.table}"
    return {
        # reference metadata keys (backup.py archive metadata)
        "table_name": name,
        "row_count": rows,
        "columns": [f["name"] for f in table.meta()["schema"]["fields"]],
        "data_checksum": checksum,
        # repo detail kept alongside
        "table": name,
        "rows": rows,
        "schema": table.meta()["schema"],
        "partition_spec": table.meta().get("partition_spec", []),
        "properties": table.properties(),
        "created_ms": int(time.time() * 1000),
        "checksums": {"data.parquet": checksum},
    }


def backup_table(table: LakeTable, archive_path: str, as_of: str | None = None) -> dict:
    from .io import export_dataframe

    tmp = tempfile.mkdtemp(prefix="lh_backup_")
    try:
        data_path = os.path.join(tmp, "data.parquet")
        df = table.scan(as_of=as_of) if as_of else table.scan()
        rows = df.count()
        export_dataframe(df, data_path, "parquet")
        meta = _table_backup_meta(table, rows, _sha256(data_path))
        meta_path = os.path.join(tmp, "metadata.json")
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=1)
        os.makedirs(os.path.dirname(os.path.abspath(archive_path)), exist_ok=True)
        with tarfile.open(archive_path, "w:gz") as tar:
            tar.add(data_path, arcname="data.parquet")
            tar.add(meta_path, arcname="metadata.json")
        return {
            "archive": archive_path,
            "rows": rows,
            "row_count": rows,
            "size_bytes": os.path.getsize(archive_path),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def backup_namespace(
    catalog: LakehouseCatalog, namespace: str, archive_path: str
) -> dict:
    """One archive member directory per table + a manifest
    (reference backup_namespace)."""
    from .io import export_dataframe

    tables = [
        t for t in catalog.list_tables() if t.split(".", 1)[0] == namespace
    ]
    if not tables:
        raise ValueError(f"namespace {namespace!r} has no tables")
    tmp = tempfile.mkdtemp(prefix="lh_ns_backup_")
    try:
        manifest = {"namespace": namespace, "tables": [], "created_ms": int(time.time() * 1000)}
        os.makedirs(os.path.dirname(os.path.abspath(archive_path)), exist_ok=True)
        with tarfile.open(archive_path, "w:gz") as tar:
            for full in tables:
                short = full.split(".", 1)[-1]
                t = catalog.load_table(full)
                df = t.scan()
                rows = df.count()
                data_path = os.path.join(tmp, f"{short}.parquet")
                export_dataframe(df, data_path, "parquet")
                meta = _table_backup_meta(t, rows, _sha256(data_path))
                meta_path = os.path.join(tmp, f"{short}_metadata.json")
                with open(meta_path, "w") as f:
                    json.dump(meta, f, indent=1)
                tar.add(data_path, arcname=f"{short}/data.parquet")
                tar.add(meta_path, arcname=f"{short}/metadata.json")
                manifest["tables"].append({"table": full, "row_count": rows})
            man_path = os.path.join(tmp, "manifest.json")
            with open(man_path, "w") as f:
                json.dump(manifest, f, indent=1)
            tar.add(man_path, arcname="manifest.json")
        return {
            "archive": archive_path,
            "namespace": namespace,
            "table_count": len(tables),
            "size_bytes": os.path.getsize(archive_path),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def restore_namespace(
    catalog: LakehouseCatalog, archive_path: str, overwrite: bool = False
) -> dict:
    tmp = tempfile.mkdtemp(prefix="lh_ns_restore_")
    try:
        with tarfile.open(archive_path, "r:gz") as tar:
            tar.extractall(tmp, filter="data")
        with open(os.path.join(tmp, "manifest.json")) as f:
            manifest = json.load(f)
        restored = []
        for entry in manifest["tables"]:
            short = entry["table"].split(".", 1)[-1]
            member_dir = os.path.join(tmp, short)
            restored.append(
                _restore_member(catalog, member_dir, entry["table"], overwrite)
            )
        return {
            "namespace": manifest["namespace"],
            "table_count": len(restored),
            "tables": restored,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def list_backups(backup_dir: str) -> list[dict]:
    """Every *.tar.gz in the directory with its metadata summary
    (reference list_backups)."""
    if not os.path.isdir(backup_dir):
        return []
    out = []
    for name in sorted(os.listdir(backup_dir)):
        if not name.endswith(".tar.gz"):
            continue
        path = os.path.join(backup_dir, name)
        entry = {"file": name, "path": path,
                 "size_bytes": os.path.getsize(path)}
        try:
            with tarfile.open(path, "r:gz") as tar:
                names = tar.getnames()
                meta_name = (
                    "metadata.json" if "metadata.json" in names
                    else "manifest.json" if "manifest.json" in names
                    else None
                )
                if meta_name:
                    meta = json.load(tar.extractfile(meta_name))
                    entry["table"] = meta.get("table_name") or meta.get("namespace")
                    entry["row_count"] = meta.get("row_count")
                    if "tables" in meta:
                        entry["table_count"] = len(meta["tables"])
        except (tarfile.TarError, json.JSONDecodeError, KeyError):
            entry["error"] = "unreadable archive"
        out.append(entry)
    return out


def verify_backup(archive_path: str) -> dict:
    tmp = tempfile.mkdtemp(prefix="lh_verify_")
    try:
        with tarfile.open(archive_path, "r:gz") as tar:
            tar.extractall(tmp, filter="data")
        metas = []
        if os.path.exists(os.path.join(tmp, "metadata.json")):
            metas.append(("", os.path.join(tmp, "metadata.json")))
        else:  # namespace archive: one metadata per member dir
            for d in sorted(os.listdir(tmp)):
                mp = os.path.join(tmp, d, "metadata.json")
                if os.path.isdir(os.path.join(tmp, d)) and os.path.exists(mp):
                    metas.append((d, mp))
        verified, issues = [], []
        first_rows = None
        for idx, (prefix, meta_path) in enumerate(metas):
            with open(meta_path) as f:
                meta = json.load(f)
            if idx == 0:
                # the FIRST member's count only (None stays None — a
                # later member's count must not masquerade as it);
                # pre-rename archives carry "rows"
                first_rows = meta.get("row_count", meta.get("rows"))
            # ... and "table" instead of "table_name"
            tname = meta.get("table_name") or meta.get("table", "<unknown>")
            for name, expected in meta["checksums"].items():
                target = os.path.join(tmp, prefix, name) if prefix else os.path.join(tmp, name)
                if not os.path.exists(target):
                    issues.append(f"{tname}: missing {name}")
                elif _sha256(target) != expected:
                    issues.append(f"{tname}: checksum mismatch for {name}")
                else:
                    verified.append(tname)
        if not metas:
            # a tarball with no backup metadata is NOT a valid backup —
            # an empty issue list must not read as verified
            issues.append("no backup metadata found in archive")
        return {
            "valid": not issues,
            "tables_verified": verified,
            "issues": issues,
            # single-table convenience kept for existing callers
            "table": verified[0] if len(verified) == 1 else None,
            "rows": first_rows,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _restore_member(
    catalog: LakehouseCatalog, member_dir: str, default_name: str,
    overwrite: bool,
) -> dict:
    with open(os.path.join(member_dir, "metadata.json")) as f:
        meta = json.load(f)
    rows = meta.get("row_count", meta.get("rows"))
    for name, expected in meta["checksums"].items():
        if _sha256(os.path.join(member_dir, name)) != expected:
            raise ValueError(f"checksum mismatch for {name} — archive corrupt")
    target = default_name
    df = catalog.spark.read.parquet(os.path.join(member_dir, "data.parquet"))
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
    return {"table": target, "rows": rows, "rows_restored": rows}


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
        return _restore_member(
            catalog, tmp,
            table_name or meta.get("table_name") or meta["table"],
            overwrite,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _type_from_str(s: str):
    from ..catalog import _parse_type

    return _parse_type(s)


# -- cloning (S18) ---------------------------------------------------------

def clone_table(
    catalog: LakehouseCatalog, source: str, clone_name: str,
    as_of: str | None = None, registry_path: str | None = None,
) -> dict:
    src = catalog.load_table(source)  # raises for a nonexistent source
    if catalog.table_exists(clone_name):
        raise ValueError(f"table {clone_name!r} already exists")
    df = src.scan(as_of=as_of) if as_of else src.scan()
    cur = src.current_snapshot()
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
    rows = clone.scan().count()
    full_source = f"{src.namespace}.{src.table}"
    full_clone = f"{clone.namespace}.{clone.table}"
    if registry_path:
        CloneRegistry(registry_path).record(
            full_clone, full_source, rows,
            cur.snapshot_id if cur else None,
        )
    return {
        "clone": clone_name,
        "target": full_clone,
        "source": full_source,
        "rows": rows,
        "row_count": rows,
        "as_of": as_of,
        "source_snapshot_id": cur.snapshot_id if cur else None,
        "message": f"Cloned '{full_source}' to '{full_clone}' ({rows} rows)",
    }


class CloneRegistry:
    """Clone bookkeeping (reference cloning.py clones store): which
    tables are clones, of what, from when — consumed by list/promote/
    discard so promotion can clean up after itself."""

    def __init__(self, store_path: str):
        from ..governance.stores import JsonStore

        self.store = JsonStore(store_path, {})

    def record(self, clone: str, source: str, rows: int,
               snapshot_id: int | None) -> None:
        data = self.store.load()
        data[clone] = {
            "clone": clone,
            "source_table": source,
            "row_count": rows,
            "source_snapshot_id": snapshot_id,
            "cloned_at": datetime.now(timezone.utc).isoformat(),
        }
        self.store.save(data)

    def list(self) -> list[dict]:
        return sorted(self.store.load().values(), key=lambda c: c["clone"])

    def forget(self, clone: str) -> bool:
        data = self.store.load()
        removed = data.pop(clone, None) is not None
        self.store.save(data)
        return removed


def promote_clone(
    catalog: LakehouseCatalog, clone_name: str, target: str,
    registry_path: str | None = None,
) -> dict:
    """Promote = overwrite target with clone contents (reference
    cloning.py promote — an INSERT OVERWRITE, preserving target
    history); the promoted clone leaves the registry."""
    if registry_path:
        reg = CloneRegistry(registry_path)
        known = {c["clone"] for c in reg.list()}
        full = clone_name if "." in clone_name else f"default.{clone_name}"
        if full not in known:
            raise ValueError(f"{clone_name!r} is not a registered clone")
    clone = catalog.load_table(clone_name)
    tgt = catalog.load_table(target)
    tgt.overwrite(tgt._align(clone.scan()))
    rows = tgt.scan().count()
    if registry_path:
        reg.forget(full)
    return {
        "promoted": clone_name,
        "into": target,
        "row_count": rows,
        "message": f"Promoted '{clone_name}' into '{target}' ({rows} rows)",
    }


def discard_clone(
    catalog: LakehouseCatalog, clone_name: str,
    registry_path: str | None = None,
) -> dict:
    catalog.drop_table(clone_name)
    if registry_path:
        full = clone_name if "." in clone_name else f"default.{clone_name}"
        CloneRegistry(registry_path).forget(full)
    return {
        "discarded": clone_name,
        "message": f"Discarded clone '{clone_name}'",
    }
