"""Schema history tooling (SURVEY G18, reference schema_evolution.py:
30-390): version diff (added/dropped/renamed/type-changed), migration
steps, compatibility check. History itself lives in the table metadata
(LakeTable.schema_history) — flagged 'harder' for Iceberg-on-Spark in
SURVEY §7, trivial in our own format since we own the metadata.

Diffs are **field-id based** (reference schema_evolution.py:122-151
diffs PyIceberg field_ids): a field keeps its id through a rename, so
renames report as renames. Versions recorded before ids existed carry
none — diffs touching those fall back to name-based, where a rename
degrades to drop+add (documented legacy behavior).
"""

from __future__ import annotations

from ..catalog import LakeTable


def fields_at_version(table: LakeTable, version: int) -> list[dict]:
    for h in table.schema_history():
        if h["version"] == version:
            return h["fields"]
    raise ValueError(f"schema version {version} not found")


def schema_at_version(table: LakeTable, version: int) -> dict[str, str]:
    return {f["name"]: f["type"] for f in fields_at_version(table, version)}


def diff_schemas(table: LakeTable, from_version: int, to_version: int) -> dict:
    """Field-id diff: added / dropped / renamed (same id, new name) /
    type_changed (same id, new type). Name-based fallback when either
    version predates field ids."""
    fa = fields_at_version(table, from_version)
    fb = fields_at_version(table, to_version)
    if not (fa and fb) or any("id" not in f for f in fa + fb):
        a = {f["name"]: f["type"] for f in fa}
        b = {f["name"]: f["type"] for f in fb}
        return {
            "added": sorted(set(b) - set(a)),
            "dropped": sorted(set(a) - set(b)),
            "renamed": [],
            "type_changed": sorted({c for c in set(a) & set(b) if a[c] != b[c]}),
        }
    a = {f["id"]: f for f in fa}
    b = {f["id"]: f for f in fb}
    common = sorted(set(a) & set(b))
    return {
        "added": sorted(b[i]["name"] for i in set(b) - set(a)),
        "dropped": sorted(a[i]["name"] for i in set(a) - set(b)),
        "renamed": [
            {"field_id": i, "from": a[i]["name"], "to": b[i]["name"]}
            for i in common
            if a[i]["name"] != b[i]["name"]
        ],
        "type_changed": sorted(
            b[i]["name"] for i in common if a[i]["type"] != b[i]["type"]
        ),
    }


def migration_steps(table: LakeTable, from_version: int, to_version: int) -> list[str]:
    """Human-readable ALTER steps to move between versions
    (reference schema_evolution.py generate_migration:269-312:
    add → type-change → drop → rename step order)."""
    d = diff_schemas(table, from_version, to_version)
    b = schema_at_version(table, to_version)
    steps = []
    for c in d["added"]:
        steps.append(f"ADD COLUMN {c} {b[c]}")
    for c in d["type_changed"]:
        steps.append(f"ALTER COLUMN {c} TYPE {b[c]}")
    for c in d["dropped"]:
        steps.append(f"DROP COLUMN {c}")
    for r in d["renamed"]:
        steps.append(f"RENAME COLUMN {r['from']} TO {r['to']}")
    return steps


_WIDENINGS = {("int", "bigint"), ("float", "double"), ("int", "double")}


def check_compatibility(table: LakeTable, from_version: int, to_version: int) -> dict:
    """Breaking-change analysis (reference check_schema_compatibility:
    314-390: drops of required columns break; renames and optional
    drops only warn). All our columns are nullable, so: drops and
    narrowing type changes are breaking; adds, widenings, and renames
    are compatible (renames warn — the field id is stable but
    name-bound consumers may break)."""
    d = diff_schemas(table, from_version, to_version)
    a = schema_at_version(table, from_version)
    b = schema_at_version(table, to_version)
    breaking = [f"dropped column {c!r}" for c in d["dropped"]]
    for c in d["type_changed"]:
        old_t = a.get(c)
        if old_t is None:  # renamed AND type-changed: find the old name
            old_names = {r["to"]: r["from"] for r in d["renamed"]}
            old_t = a.get(old_names.get(c, c))
        if (old_t, b[c]) not in _WIDENINGS:
            breaking.append(f"column {c!r} type narrowed/changed {old_t} → {b[c]}")
    warnings = [
        f"renamed column {r['from']!r} → {r['to']!r} may break name-bound consumers"
        for r in d["renamed"]
    ]
    return {
        "compatible": not breaking,
        "breaking_changes": breaking,
        "warnings": warnings,
        "diff": d,
    }
