"""Schema history tooling (SURVEY G18, reference schema_evolution.py:
30-390): version diff (added/dropped/type-changed), migration steps,
compatibility check. History itself lives in the table metadata
(LakeTable.schema_history) — flagged 'harder' for Iceberg-on-Spark in
SURVEY §7, trivial in our own format since we own the metadata."""

from __future__ import annotations

from ..catalog import LakeTable


def schema_at_version(table: LakeTable, version: int) -> dict[str, str]:
    for h in table.schema_history():
        if h["version"] == version:
            return {f["name"]: f["type"] for f in h["fields"]}
    raise ValueError(f"schema version {version} not found")


def diff_schemas(table: LakeTable, from_version: int, to_version: int) -> dict:
    """Field-name-based diff (the reference uses Iceberg field-ids; our
    format renames physically, so a rename reports as drop+add —
    documented deviation, rename intent preserved in history order)."""
    a = schema_at_version(table, from_version)
    b = schema_at_version(table, to_version)
    return {
        "added": sorted(set(b) - set(a)),
        "dropped": sorted(set(a) - set(b)),
        "type_changed": sorted(
            {c for c in set(a) & set(b) if a[c] != b[c]}
        ),
    }


def migration_steps(table: LakeTable, from_version: int, to_version: int) -> list[str]:
    """Human-readable ALTER steps to move between versions
    (reference schema_evolution.py migration plan)."""
    d = diff_schemas(table, from_version, to_version)
    b = schema_at_version(table, to_version)
    steps = []
    for c in d["added"]:
        steps.append(f"ADD COLUMN {c} {b[c]}")
    for c in d["dropped"]:
        steps.append(f"DROP COLUMN {c}")
    for c in d["type_changed"]:
        steps.append(f"ALTER COLUMN {c} TYPE {b[c]}")
    return steps


_WIDENINGS = {("int", "bigint"), ("float", "double"), ("int", "double")}


def check_compatibility(table: LakeTable, from_version: int, to_version: int) -> dict:
    """Breaking-change analysis (reference: drop-required = breaking).
    All our columns are nullable, so: drops and narrowing type changes
    are breaking; adds and widenings are compatible."""
    d = diff_schemas(table, from_version, to_version)
    a = schema_at_version(table, from_version)
    b = schema_at_version(table, to_version)
    breaking = [f"dropped column {c!r}" for c in d["dropped"]]
    for c in d["type_changed"]:
        if (a[c], b[c]) not in _WIDENINGS:
            breaking.append(f"column {c!r} type narrowed/changed {a[c]} → {b[c]}")
    return {"compatible": not breaking, "breaking_changes": breaking, "diff": d}
