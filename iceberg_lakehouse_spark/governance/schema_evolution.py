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


# ---------------------------------------------------------------------------
# Reference-surface API (reference schema_evolution.py:30-390): snapshot-
# addressed history/diff/migration plus a PROPOSED-changes compatibility
# check, with the reference's exact result-dict shapes. The version-based
# helpers above remain the internals (and a finer-grained public surface —
# our metadata records every schema version, not only snapshot-reachable
# ones).
# ---------------------------------------------------------------------------


def _ref_fields(fields: list[dict]) -> list[dict]:
    """Fields in the reference's serialized shape (field_id/name/type/
    required; all our columns are optional, reference _schema_to_dict:13-27)."""
    return [
        {
            "field_id": f.get("id"),
            "name": f["name"],
            "type": f["type"],
            "required": False,
        }
        for f in fields
    ]


def _compute_diff_ref(fa: list[dict], fb: list[dict]) -> dict:
    """Field-id diff in the reference's key vocabulary (reference
    _compute_diff:121-170). Name-based fallback when either side predates
    field ids (a rename then degrades to drop+add — documented legacy)."""
    if not (fa and fb) or any("id" not in f for f in fa + fb):
        a = {f["name"]: f["type"] for f in fa}
        b = {f["name"]: f["type"] for f in fb}
        return {
            "added_columns": [
                {"field_id": None, "name": n, "type": b[n]}
                for n in sorted(set(b) - set(a))
            ],
            "dropped_columns": [
                {"field_id": None, "name": n, "type": a[n]}
                for n in sorted(set(a) - set(b))
            ],
            "renamed_columns": [],
            "type_changes": [
                {"field_id": None, "name": n, "old_type": a[n], "new_type": b[n]}
                for n in sorted(set(a) & set(b))
                if a[n] != b[n]
            ],
        }
    a = {f["id"]: f for f in fa}
    b = {f["id"]: f for f in fb}
    common = sorted(set(a) & set(b))
    return {
        "added_columns": [
            {"field_id": i, "name": b[i]["name"], "type": b[i]["type"]}
            for i in sorted(set(b) - set(a))
        ],
        "dropped_columns": [
            {"field_id": i, "name": a[i]["name"], "type": a[i]["type"]}
            for i in sorted(set(a) - set(b))
        ],
        "renamed_columns": [
            {"field_id": i, "old_name": a[i]["name"], "new_name": b[i]["name"]}
            for i in common
            if a[i]["name"] != b[i]["name"]
        ],
        "type_changes": [
            {
                "field_id": i,
                "name": b[i]["name"],
                "old_type": a[i]["type"],
                "new_type": b[i]["type"],
            }
            for i in common
            if a[i]["type"] != b[i]["type"]
        ],
    }


def _summarize_diff(diff: dict) -> str:
    """Reference _summarize_diff:173-190 phrasing."""
    parts = []
    if diff["added_columns"]:
        parts.append("added " + ", ".join(c["name"] for c in diff["added_columns"]))
    if diff["dropped_columns"]:
        parts.append(
            "dropped " + ", ".join(c["name"] for c in diff["dropped_columns"])
        )
    if diff["renamed_columns"]:
        parts.append(
            "renamed "
            + ", ".join(
                f"{c['old_name']}→{c['new_name']}" for c in diff["renamed_columns"]
            )
        )
    if diff["type_changes"]:
        parts.append(
            "type changed "
            + ", ".join(
                f"{c['name']}: {c['old_type']}→{c['new_type']}"
                for c in diff["type_changes"]
            )
        )
    return "; ".join(parts) if parts else "no changes"


def _snapshot_schema_version(table: LakeTable, snap) -> int:
    """Schema version active at a snapshot: the recorded field when
    present, else the last history entry committed at-or-before the
    snapshot (legacy snapshots written before schema_version existed)."""
    if snap.schema_version is not None:
        return snap.schema_version
    version = None
    for h in table.schema_history():
        if h.get("ts", 0) <= snap.timestamp_ms:
            version = h["version"]
    if version is None:
        hist = table.schema_history()
        version = hist[0]["version"] if hist else 1
    return version


def get_schema_history(table: LakeTable) -> list[dict]:
    """Full schema history in the reference's entry shape (reference
    get_schema_history:30-119): schema_id (0-based), snapshot_id +
    timestamp of the first snapshot on that schema, serialized fields,
    is_schema_change flag, and a change summary vs the previous version."""
    import datetime

    snaps = table.snapshots()
    first_snap_for = {}
    for s in snaps:
        v = _snapshot_schema_version(table, s)
        if v not in first_snap_for:
            first_snap_for[v] = s
    history = []
    prev_fields = None
    for h in table.schema_history():
        snap = first_snap_for.get(h["version"])
        change_summary = None
        if history and prev_fields is not None:
            change_summary = _summarize_diff(
                _compute_diff_ref(prev_fields, h["fields"])
            )
        history.append(
            {
                "schema_id": h["version"] - 1,
                "snapshot_id": snap.snapshot_id if snap else None,
                "timestamp": (
                    datetime.datetime.fromtimestamp(
                        snap.timestamp_ms / 1000, tz=datetime.timezone.utc
                    ).isoformat()
                    if snap
                    else None
                ),
                "fields": _ref_fields(h["fields"]),
                "is_schema_change": bool(history),
                "change_summary": change_summary,
            }
        )
        prev_fields = h["fields"]
    return history


def schema_diff_snapshots(
    table: LakeTable,
    from_snapshot: int | None = None,
    to_snapshot: int | None = None,
) -> dict:
    """Snapshot-addressed schema diff in the reference's result shape
    (reference schema_diff:193-266). With no snapshots given, compares
    the last two schema versions; a single-version table returns the
    empty 'no changes' diff."""
    hist = table.schema_history()
    if (from_snapshot is None) != (to_snapshot is None):
        # the reference silently falls back to last-two when only one is
        # given; raising is strictly safer than diffing the wrong range
        raise ValueError(
            "from_snapshot and to_snapshot must be provided together"
        )
    if from_snapshot is not None:
        v_from = _snapshot_schema_version(
            table, table.snapshot_by_id(from_snapshot)
        )
        v_to = _snapshot_schema_version(table, table.snapshot_by_id(to_snapshot))
    elif len(hist) < 2:
        cur = hist[-1]["version"] if hist else 1
        return {
            "table": f"{table.namespace}.{table.table}",
            "from_schema_id": cur - 1,
            "to_schema_id": cur - 1,
            "added_columns": [],
            "dropped_columns": [],
            "renamed_columns": [],
            "type_changes": [],
            "summary": "no changes",
        }
    else:
        v_from = hist[-2]["version"]
        v_to = hist[-1]["version"]
    diff = _compute_diff_ref(
        fields_at_version(table, v_from), fields_at_version(table, v_to)
    )
    return {
        "table": f"{table.namespace}.{table.table}",
        "from_schema_id": v_from - 1,
        "to_schema_id": v_to - 1,
        **diff,
        "summary": _summarize_diff(diff),
    }


def generate_migration(
    table: LakeTable,
    from_snapshot: int | None = None,
    to_snapshot: int | None = None,
) -> dict:
    """alter_table step list between two schema versions (reference
    generate_migration:269-312 — add/drop/rename steps; type changes are
    reported by the diff but have no alter step, matching the reference)."""
    diff = schema_diff_snapshots(table, from_snapshot, to_snapshot)
    steps = []
    for col in diff["added_columns"]:
        steps.append(
            {
                "operation": "add_column",
                "column_name": col["name"],
                "column_type": col["type"],
            }
        )
    for col in diff["dropped_columns"]:
        steps.append({"operation": "drop_column", "column_name": col["name"]})
    for col in diff["renamed_columns"]:
        steps.append(
            {
                "operation": "rename_column",
                "column_name": col["old_name"],
                "new_name": col["new_name"],
            }
        )
    return {
        "table": diff["table"],
        "from_schema_id": diff["from_schema_id"],
        "to_schema_id": diff["to_schema_id"],
        "steps": steps,
        "step_count": len(steps),
        "message": f"Migration for '{diff['table']}': {len(steps)} step(s)",
    }


def check_schema_compatibility(
    table: LakeTable, proposed_changes: list[dict]
) -> dict:
    """Compatibility verdict for PROPOSED changes against the current
    schema (reference check_schema_compatibility:314-390): all our
    columns are optional, so drops and renames warn but stay compatible;
    adds of existing columns and ops on missing columns warn; only
    dropping a required column would break (never, here)."""
    existing = {f["name"] for f in table.meta()["schema"]["fields"]}
    warnings: list[str] = []
    breaking: list[str] = []
    for change in proposed_changes:
        op = change.get("op")
        col = change.get("column")
        if op == "drop_column":
            if col and col in existing:
                warnings.append(
                    f"Dropping optional column '{col}' — downstream consumers "
                    "may depend on it"
                )
            elif col:
                warnings.append(f"Column '{col}' does not exist")
        elif op == "rename_column":
            if col and col in existing:
                warnings.append(
                    f"Renaming '{col}' to '{change.get('new_name')}' may break "
                    "downstream consumers"
                )
            elif col:
                warnings.append(f"Column '{col}' does not exist")
        elif op == "add_column":
            if col and col in existing:
                warnings.append(f"Column '{col}' already exists")
        else:
            warnings.append(f"Unknown operation: {op}")
    compatible = not breaking
    return {
        "table": f"{table.namespace}.{table.table}",
        "compatible": compatible,
        "warnings": warnings,
        "breaking_changes": breaking,
        "proposed_changes": len(proposed_changes),
        "message": (
            f"Schema changes are {'compatible' if compatible else 'NOT compatible'} "
            f"({len(breaking)} breaking, {len(warnings)} warnings)"
        ),
    }
