"""Snapshot-versioned table format on Parquet, pure PySpark.

The reference delegates table mechanics to PyIceberg (SqlCatalog over
SQLite, reference catalog.py:31-59); with no Iceberg runtime available
we implement the same *observable semantics* from scratch:

  warehouse/
    <namespace>/<table>/
      data/                    snapshot-addressed parquet files
      _meta/table.json         schema, partition spec, properties
      _meta/snapshots.json     append-only snapshot log

A snapshot is an immutable file list. Append = parent files + new
files; overwrite = new files only. Readers resolve a snapshot (current,
by id, or by timestamp — reference catalog.py:240-288) and hand Spark
the exact parquet paths: scans stay lazy, so Catalyst pushes filters
and prunes columns all the way into the parquet reader — unlike the
reference, which materializes the full table into Arrow first
(reference query.py:68).

Scale posture: metadata is O(snapshots × files), data moves only
through Spark jobs, and the commit path is an optimistic-concurrency
atomic JSON rename: writers serialize on an advisory lockfile, appends
resolve their parent file list under the lock (two concurrent appends
both land), and non-additive commits (CoW update/delete) CAS against
the snapshot they planned on, raising CommitConflictError on a race.
A real deployment swaps the lockfile for a catalog-service CAS — the
read/write paths are unchanged.
"""

from __future__ import annotations

import fcntl
import json
import os
import re
import shutil
import time
import uuid
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_NAMESPACE = "default"

# SURVEY §1.2: creation-time type names → Spark types (flat primitives
# only, mirroring reference catalog.py:2290-2300; int widens to long,
# float widens to double, timestamps are µs-naive).
_TYPE_MAP: dict[str, T.DataType] = {
    "string": T.StringType(),
    "long": T.LongType(),
    "int": T.LongType(),
    "integer": T.LongType(),
    "double": T.DoubleType(),
    "float": T.DoubleType(),
    "timestamp": T.TimestampNTZType(),
    "date": T.DateType(),
    "boolean": T.BooleanType(),
}

_TRANSFORM_RE = re.compile(
    r"^\s*(?:(year|month|day|hour|identity)\s*\(\s*(\w+)\s*\)"
    r"|bucket\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)"
    r"|truncate\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)"
    r"|(\w+))\s*$"
)


@dataclass
class PartitionField:
    """One partition transform: identity, year/month/day/hour, bucket(n),
    truncate(n) — the reference's transform surface (catalog.py:2192-2258)."""

    transform: str
    column: str
    param: int | None = None

    @property
    def name(self) -> str:
        if self.transform == "identity":
            return f"_p_{self.column}"
        if self.param is not None:
            return f"_p_{self.transform}{self.param}_{self.column}"
        return f"_p_{self.transform}_{self.column}"

    def expr(self) -> F.Column:
        c = F.col(self.column)
        if self.transform == "identity":
            return c
        if self.transform == "year":
            return F.year(c)
        if self.transform == "month":
            return F.month(c)
        if self.transform == "day":
            return F.dayofmonth(c)
        if self.transform == "hour":
            return F.hour(c)
        if self.transform == "bucket":
            # xxhash64 is Spark-native, stable, and uniform — the scale
            # answer to co-located joins on bucketed keys.
            return F.pmod(F.xxhash64(c), F.lit(self.param))
        if self.transform == "truncate":
            return F.substring(c.cast("string"), 1, self.param)
        raise ValueError(f"unknown transform {self.transform}")

    def to_json(self) -> dict:
        return {"transform": self.transform, "column": self.column, "param": self.param}

    @staticmethod
    def parse(spec: str) -> "PartitionField":
        m = _TRANSFORM_RE.match(spec)
        if not m:
            raise ValueError(f"invalid partition spec: {spec!r}")
        if m.group(1):
            return PartitionField(m.group(1), m.group(2))
        if m.group(3):
            return PartitionField("bucket", m.group(4), int(m.group(3)))
        if m.group(5):
            return PartitionField("truncate", m.group(6), int(m.group(5)))
        return PartitionField("identity", m.group(7))


@dataclass
class Snapshot:
    snapshot_id: int
    timestamp_ms: int
    operation: str  # append | overwrite | rollback
    files: list[str]
    parent_id: int | None = None
    summary: dict[str, Any] = field(default_factory=dict)
    # schema version active when the snapshot committed (Iceberg's
    # snapshot.schema_id analogue, reference schema_evolution.py:55-62);
    # None on snapshots written before this field existed — readers fall
    # back to timestamp resolution against schema_history.
    schema_version: int | None = None
    # merge-on-read position-delete files (Iceberg v2 delete-file
    # analogue): parquet files of (_file basename, _pos row_index) keys
    # the scan anti-joins away. Empty on CoW-only tables and on
    # snapshots written before MoR existed.
    delete_files: list[str] = field(default_factory=list)
    # merge-on-read EQUALITY-delete files (Iceberg v2's second delete
    # kind): each entry {"path": rel, "seq": int, "cols": [names]} — a
    # parquet file of key VALUES that logically deletes every data row
    # matching on ``cols`` in files whose sequence is OLDER than the
    # delete's (Iceberg data-sequence-number semantics: re-inserting a
    # deleted key after the delete is visible).
    eq_delete_files: list[dict] = field(default_factory=list)
    # data-file relpath → sequence (the snapshot_id of the commit that
    # first added the file). Stored explicitly per snapshot — deriving
    # it by walking history would silently inflate sequences after
    # snapshot expiry and resurrect equality-deleted rows.
    file_seqs: dict[str, int] = field(default_factory=dict)

    def to_json(self) -> dict:
        return {
            "snapshot_id": self.snapshot_id,
            "timestamp_ms": self.timestamp_ms,
            "operation": self.operation,
            "files": self.files,
            "parent_id": self.parent_id,
            "summary": self.summary,
            "schema_version": self.schema_version,
            "delete_files": self.delete_files,
            "eq_delete_files": self.eq_delete_files,
            "file_seqs": self.file_seqs,
        }


def _zvalue(df: DataFrame, cols: list[str], bits: int = 16):
    """Z-order curve value: interleave the bits of each column's scaled
    position. Numeric/date/timestamp columns min-max scale into
    [0, 2^bits) — range AND equality locality; other types hash into
    the same domain (equality locality only). Cost: one tiny min/max
    agg job (2×len(cols) scalars to the driver); the Z-value itself is
    a pure Column expression, map-only."""
    from functools import reduce

    if not cols or len(cols) > 4:
        raise ValueError("zorder_by takes 1-4 columns")
    # keep the top interleaved bit out of the long's sign bit: with 4
    # columns, 16 bits would shift to position 63 and flip the sort
    # order of the most significant column's high bit
    bits = min(bits, 63 // len(cols))
    dom = (1 << bits) - 1
    fields = {f.name: f.dataType for f in df.schema.fields}
    numeric_pos: dict[str, Any] = {}
    aggs = []
    for c in cols:
        dt = fields.get(c)
        if dt is None:
            raise ValueError(f"unknown zorder column {c!r}")
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                           T.FloatType, T.DoubleType, T.DecimalType)):
            num = F.col(c).cast("double")
        elif isinstance(dt, T.DateType):
            num = F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            num = F.unix_micros(F.col(c)).cast("double")
        else:
            continue  # hashed below, no stats needed
        numeric_pos[c] = num
        aggs += [F.min(num).alias(f"mn_{c}"), F.max(num).alias(f"mx_{c}")]
    stats = df.agg(*aggs).collect()[0].asDict() if aggs else {}
    pos_exprs = []
    for c in cols:
        if c in numeric_pos:
            mn, mx = stats.get(f"mn_{c}"), stats.get(f"mx_{c}")
            if mn is None or mx is None or mx == mn:
                pos = F.lit(0).cast("long")
            else:
                pos = F.least(
                    F.lit(dom),
                    (
                        (numeric_pos[c] - F.lit(float(mn)))
                        / F.lit(float(mx - mn))
                        * dom
                    ).cast("long"),
                )
            pos = F.coalesce(pos, F.lit(0))  # nulls sort first
        else:
            pos = F.pmod(F.xxhash64(F.col(c)), F.lit(dom + 1))
        pos_exprs.append(pos)
    terms = [
        F.shiftleft(
            F.shiftright(pos, i).bitwiseAND(F.lit(1)), i * len(cols) + j
        )
        for j, pos in enumerate(pos_exprs)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def _cutoff_ms(older_than: str) -> int:
    """'30d'/'24h'/'90m'/'45s' duration or ISO timestamp → epoch ms
    cutoff (reference expire/clear accept both forms). Superset of the
    reference grammar ('d'/'h'): here 'm' means MINUTES (never months)
    and 's' seconds — stated in the expire/clear tool help too."""
    from datetime import datetime, timezone

    m = re.fullmatch(r"(\d+)\s*([dhms])", older_than.strip().lower())
    if m:
        n, unit = int(m.group(1)), m.group(2)
        secs = n * {"d": 86400, "h": 3600, "m": 60, "s": 1}[unit]
        return int(time.time() * 1000) - secs * 1000
    dt = datetime.fromisoformat(older_than)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def retry_on_conflict(fn, retries: int = 3, backoff_s: float = 0.05):
    """Run ``fn()`` retrying on CommitConflictError — the standard
    consumer pattern for CAS-protected rewrites (CoW update/delete,
    compact, upsert): re-planning against the current snapshot is
    exactly what re-invoking the operation does, since every such path
    re-reads the table state at its start. Linear backoff between
    attempts; the final conflict propagates."""
    attempt = 0
    while True:
        try:
            return fn()
        except CommitConflictError:
            attempt += 1
            if attempt > retries:
                raise
            time.sleep(backoff_s * attempt)


class CommitConflictError(RuntimeError):
    """Optimistic-concurrency commit failure: the table advanced since
    the caller planned its commit (or the commit lock timed out).
    Callers re-plan against the current snapshot and retry."""


def _atomic_write_json(path: str, payload: Any) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, default=str)
    os.replace(tmp, path)


def _read_json(path: str, default: Any) -> Any:
    if not os.path.exists(path):
        return default
    with open(path) as f:
        return json.load(f)


class LakehouseCatalog:
    """Namespace/table catalog over a warehouse directory
    (reference catalog.py LakehouseCatalog, re-architected for Spark)."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = os.path.abspath(warehouse)
        os.makedirs(self.warehouse, exist_ok=True)

    # -- namespaces --------------------------------------------------------

    def create_namespace(
        self,
        name: str,
        properties: dict[str, str] | None = None,
        exists_ok: bool = False,
    ) -> dict:
        """Reference namespace semantics (reference catalog.py:81-110):
        duplicate create raises (internal callers pass exists_ok),
        optional properties persist alongside the namespace, and the
        result carries namespace/properties/message."""
        path = os.path.join(self.warehouse, name)
        if os.path.isdir(path) and not exists_ok:
            raise ValueError(f"Namespace '{name}' already exists")
        os.makedirs(path, exist_ok=True)
        if properties:
            cur = _read_json(os.path.join(path, "_namespace.json"), {})
            cur.update(properties)
            _atomic_write_json(os.path.join(path, "_namespace.json"), cur)
        return {
            "namespace": name,
            "properties": properties or {},
            "message": f"Created namespace '{name}'",
        }

    def list_namespaces(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.warehouse)
            if os.path.isdir(os.path.join(self.warehouse, d))
        )

    def namespace_properties(self, name: str) -> dict[str, str]:
        path = os.path.join(self.warehouse, name)
        if not os.path.isdir(path):
            raise ValueError(f"Namespace '{name}' not found")
        return _read_json(os.path.join(path, "_namespace.json"), {})

    def drop_namespace(self, name: str) -> dict:
        """Drop an EMPTY namespace (reference catalog.py:113-151: missing
        → not found, populated → not-empty listing its tables)."""
        path = os.path.join(self.warehouse, name)
        if not os.path.isdir(path):
            raise ValueError(f"Namespace '{name}' not found")
        tables = self.list_tables(name)
        if tables:
            raise ValueError(
                f"Namespace '{name}' is not empty. Tables: {', '.join(tables)}"
            )
        # the properties side-file doesn't make a namespace non-empty,
        # but stray non-table dirs still do
        if any(e != "_namespace.json" for e in os.listdir(path)):
            raise ValueError(f"Namespace '{name}' is not empty")
        shutil.rmtree(path, ignore_errors=True)
        return {"namespace": name, "message": f"Dropped namespace '{name}'"}

    def _split(self, name: str) -> tuple[str, str]:
        """Short names auto-prefix with 'default.' (reference
        catalog.py:216-217 normalization idiom)."""
        if "." in name:
            ns, t = name.split(".", 1)
        else:
            ns, t = DEFAULT_NAMESPACE, name
        return ns, t

    # -- tables ------------------------------------------------------------

    def create_table(
        self,
        name: str,
        schema: list[tuple[str, str]] | T.StructType,
        partition_by: list[str] | None = None,
        properties: dict[str, str] | None = None,
    ) -> "LakeTable":
        ns, t = self._split(name)
        self.create_namespace(ns, exists_ok=True)
        root = os.path.join(self.warehouse, ns, t)
        if os.path.exists(os.path.join(root, "_meta", "table.json")):
            raise ValueError(f"table {ns}.{t} already exists")
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "_meta"), exist_ok=True)

        if isinstance(schema, T.StructType):
            fields = [
                {"name": f.name, "type": f.dataType.simpleString()} for f in schema
            ]
        else:
            fields = []
            for col, typ in schema:
                if typ not in _TYPE_MAP:
                    raise ValueError(
                        f"Unsupported column type '{typ}' for column '{col}'"
                    )
                fields.append({"name": col, "type": _TYPE_MAP[typ].simpleString()})
        if not fields:
            raise ValueError("table schema must have at least one column")
        # stable Iceberg-style field ids: assigned once, survive renames,
        # never reused after drops — what lets schema diffs report a
        # rename as a rename (reference schema_evolution.py:122-151)
        for i, f in enumerate(fields):
            f["id"] = i + 1

        parsed = [PartitionField.parse(p) for p in (partition_by or [])]
        known = {f["name"] for f in fields}
        for pf in parsed:  # fail at create time, not first insert
            if pf.column not in known:
                raise ValueError(
                    f"partition column {pf.column!r} not in table schema"
                )
        spec = [pf.to_json() for pf in parsed]
        meta = {
            "name": f"{ns}.{t}",
            "schema": {"fields": fields, "version": 1, "last_field_id": len(fields)},
            "schema_history": [
                {"version": 1, "fields": fields, "ts": int(time.time() * 1000)}
            ],
            "partition_spec": spec,
            "properties": properties or {},
        }
        _atomic_write_json(os.path.join(root, "_meta", "table.json"), meta)
        _atomic_write_json(os.path.join(root, "_meta", "snapshots.json"), [])
        return LakeTable(self, ns, t)

    def load_table(self, name: str) -> "LakeTable":
        ns, t = self._split(name)
        if not os.path.exists(
            os.path.join(self.warehouse, ns, t, "_meta", "table.json")
        ):
            raise ValueError(f"Table '{ns}.{t}' not found")
        return LakeTable(self, ns, t)

    def table_exists(self, name: str) -> bool:
        ns, t = self._split(name)
        return os.path.exists(
            os.path.join(self.warehouse, ns, t, "_meta", "table.json")
        )

    def list_tables(self, namespace: str | None = None) -> list[str]:
        """Qualified table names; one namespace, or all of them for
        None / '*' (reference catalog.py:182-201 wildcard)."""
        out = []
        if namespace == "*":
            namespace = None
        for ns in [namespace] if namespace else self.list_namespaces():
            nsdir = os.path.join(self.warehouse, ns)
            if not os.path.isdir(nsdir):
                continue
            for t in sorted(os.listdir(nsdir)):
                if os.path.exists(os.path.join(nsdir, t, "_meta", "table.json")):
                    out.append(f"{ns}.{t}")
        return out

    def drop_table(self, name: str, missing_ok: bool = False) -> None:
        ns, t = self._split(name)
        path = os.path.join(self.warehouse, ns, t)
        if not os.path.isdir(path):
            if missing_ok:
                return
            raise ValueError(f"Table '{ns}.{t}' not found")
        shutil.rmtree(path, ignore_errors=True)


class LakeTable:
    """Handle to one snapshot-versioned table."""

    def __init__(self, catalog: LakehouseCatalog, namespace: str, table: str):
        self.catalog = catalog
        self.spark = catalog.spark
        self.namespace = namespace
        self.table = table
        self.root = os.path.join(catalog.warehouse, namespace, table)
        # branch this handle writes to / reads from; None = "main".
        # Set via for_branch(), never directly.
        self._branch: str | None = None

    # -- metadata ----------------------------------------------------------

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.root, "_meta", "table.json")

    @property
    def _snap_path(self) -> str:
        return os.path.join(self.root, "_meta", "snapshots.json")

    @property
    def _refs_path(self) -> str:
        # snapshot refs (Iceberg branches/tags): {"branches": {name:
        # snapshot_id}, "tags": {...}}. "main" is IMPLICIT (= the log
        # tail) until the first branch commit pins it — legacy tables
        # need no migration. Written only under the commit lock.
        return os.path.join(self.root, "_meta", "refs.json")

    @property
    def _stats_path(self) -> str:
        # legacy single-map location (still read; consolidation target)
        return os.path.join(self.root, "_meta", "file_stats.json")

    @property
    def _stats_dir(self) -> str:
        # per-commit stats shards (Iceberg manifest model): each commit
        # writes one shard holding only ITS new files, so commit cost is
        # O(files written), not O(files in table)
        return os.path.join(self.root, "_meta", "stats")

    def meta_stamp(self) -> tuple:
        """Cheap staleness token — mtimes of the two metadata files,
        plus the stats shard dir and consolidated stats map. Any schema
        change or snapshot commit rewrites a metadata file (atomic
        replace → fresh mtime); stats-shard writes from the read-path
        fallback and _consolidate_stats change only the stats dir /
        base map, which back the __files metadata view — without these
        two a registered files view could serve stale stats until the
        next real commit. Equal stamps ⇒ the table's registered views
        are still current; lets QueryEngine skip re-registration (and
        metadata-view rebuilds) per query."""
        out = []
        for p in (self._meta_path, self._snap_path, self._stats_dir,
                  self._stats_path, self._refs_path):
            # refs.json included: fast_forward moves main WITHOUT a new
            # snapshot — a stamp ignoring it would serve stale views
            try:
                out.append(os.stat(p).st_mtime_ns)
            except OSError:
                out.append(0)
        return tuple(out)

    def meta(self) -> dict:
        return _read_json(self._meta_path, {})

    def _write_meta(self, meta: dict) -> None:
        _atomic_write_json(self._meta_path, meta)

    def schema(self) -> T.StructType:
        fields = self.meta()["schema"]["fields"]
        return T.StructType(
            [T.StructField(f["name"], _parse_type(f["type"]), True) for f in fields]
        )

    def schema_at_version(self, version: int) -> T.StructType:
        """The StructType recorded for a schema version — what a
        time-travel scan reads with (the files written under that
        version physically carry those column names)."""
        for h in self.schema_history():
            if h["version"] == version:
                return T.StructType(
                    [
                        T.StructField(f["name"], _parse_type(f["type"]), True)
                        for f in h["fields"]
                    ]
                )
        raise ValueError(f"schema version {version} not found")

    def _snapshot_schema_version(self, snap: Snapshot) -> int:
        """Schema version active at a snapshot: the recorded field when
        present, else the last history entry at-or-before the snapshot
        (legacy snapshots written before schema_version existed)."""
        if snap.schema_version is not None:
            return snap.schema_version
        version = None
        for h in self.schema_history():
            if h.get("ts", 0) <= snap.timestamp_ms:
                version = h["version"]
        if version is None:
            hist = self.schema_history()
            version = hist[0]["version"] if hist else 1
        return version

    def partition_fields(self) -> list[PartitionField]:
        return [
            PartitionField(p["transform"], p["column"], p.get("param"))
            for p in self.meta().get("partition_spec", [])
        ]

    def evolve_partition_spec(self, partition_by: list[str]) -> dict:
        """Iceberg partition evolution: change the spec for FUTURE
        writes without rewriting a single existing file. Old files keep
        their old directory layout and new files get the new one —
        scans are layout-agnostic by construction here (recursive file
        listing + stats-based pruning on *persisted per-file column
        stats*, never on directory names), so mixed-spec snapshots read
        correctly and still prune. ``[]`` unpartitions future writes.
        The previous spec is appended to ``partition_spec_history``
        (audit trail, reference-style history shape). ``compact()``
        rewrites everything under the current spec when physical
        realignment is wanted."""
        parsed = [PartitionField.parse(p) for p in partition_by]
        known = {f.name for f in self.schema().fields}
        for pf in parsed:
            if pf.column not in known:
                raise ValueError(
                    f"partition column {pf.column!r} not in table schema"
                )
        meta = self.meta()
        old = meta.get("partition_spec", [])
        new = [pf.to_json() for pf in parsed]
        if new == old:
            return {"changed": False, "spec": old}
        meta.setdefault("partition_spec_history", []).append(
            {"spec": old, "ts": int(time.time() * 1000)}
        )
        meta["partition_spec"] = new
        self._write_meta(meta)
        return {"changed": True, "previous": old, "spec": new}

    def partitions_info(self) -> dict:
        """Partition-spec description (reference get_partitions,
        catalog.py:2362-2412): source column + transform per field."""
        fields = [
            {
                "source_column": pf.column,
                "transform": pf.transform,
                "param": pf.param,
                "name": pf.name,
            }
            for pf in self.partition_fields()
        ]
        return {
            "table": f"{self.namespace}.{self.table}",
            "is_partitioned": bool(fields),
            "fields": fields,
        }

    def properties(self) -> dict[str, str]:
        return dict(self.meta().get("properties", {}))

    def set_properties(self, props: dict[str, str]) -> None:
        meta = self.meta()
        meta.setdefault("properties", {}).update(props)
        self._write_meta(meta)

    def unset_properties(self, keys: list[str]) -> None:
        meta = self.meta()
        for k in keys:
            meta.get("properties", {}).pop(k, None)
        self._write_meta(meta)

    # single-property surface (reference catalog.py:1347-1430): get
    # returns None when unset, set/remove return change descriptions,
    # removing an unset key raises
    def get_property(self, key: str) -> str | None:
        return self.meta().get("properties", {}).get(key)

    def set_property(self, key: str, value: str) -> str:
        self.set_properties({key: value})
        return f"Set '{key}' = '{value}' on {self.namespace}.{self.table}"

    def remove_property(self, key: str) -> str:
        meta = self.meta()
        props = meta.get("properties", {})
        if key not in props:
            raise ValueError(
                f"Property '{key}' not found on {self.namespace}.{self.table}"
            )
        del props[key]
        self._write_meta(meta)
        return f"Removed '{key}' from {self.namespace}.{self.table}"

    # -- snapshots ---------------------------------------------------------

    def snapshots(self) -> list[Snapshot]:
        return [
            Snapshot(
                s["snapshot_id"],
                s["timestamp_ms"],
                s["operation"],
                s["files"],
                s.get("parent_id"),
                s.get("summary", {}),
                s.get("schema_version"),
                s.get("delete_files", []),
                s.get("eq_delete_files", []),
                s.get("file_seqs", {}),
            )
            for s in _read_json(self._snap_path, [])
        ]

    def current_snapshot(self) -> Snapshot | None:
        """Head of this handle's branch — the implicit-or-pinned main
        for plain handles, the branch ref for ``for_branch`` views."""
        snaps = self.snapshots()
        if not snaps:
            return None
        head = self._head_id(
            [s.to_json() for s in snaps], self._branch or "main"
        )
        if head is None:
            raise ValueError(f"branch {self._branch!r} not found")
        by_id = {s.snapshot_id: s for s in snaps}
        if head not in by_id:
            raise ValueError(
                f"ref target snapshot {head} missing from the log"
            )
        return by_id[head]

    # -- refs (branches / tags) -------------------------------------------

    def _refs(self) -> dict:
        refs = _read_json(self._refs_path, {})
        refs.setdefault("branches", {})
        refs.setdefault("tags", {})
        return refs

    def _head_id(self, snaps_json: list[dict], branch: str) -> int | None:
        """Branch head snapshot id. ``main`` falls back to the log tail
        when not pinned (legacy tables); other branches must exist."""
        refs = self._refs()
        if branch in refs["branches"]:
            return refs["branches"][branch]
        if branch == "main":
            return snaps_json[-1]["snapshot_id"] if snaps_json else None
        return None

    def for_branch(self, name: str) -> "LakeTable":
        """A handle whose reads AND writes target branch ``name`` —
        the write side of write-audit-publish: write to the branch,
        audit it with any scan/validation, then ``fast_forward`` main.
        The handle shares the table's storage; only head resolution
        differs. ``for_branch("main")`` returns a plain handle."""
        t = LakeTable(self.catalog, self.namespace, self.table)
        t._branch = None if name == "main" else name
        if t._branch is not None and name not in self._refs()["branches"]:
            raise ValueError(f"branch {name!r} not found")
        return t

    def create_branch(
        self, name: str, from_snapshot_id: int | None = None
    ) -> dict:
        """Iceberg branch: a named mutable ref starting at the current
        head (or a historical snapshot). Commits through
        ``for_branch(name)`` advance only this ref."""
        if not name or name == "main":
            raise ValueError("branch name must be non-empty and not 'main'")
        with self._commit_lock():
            snaps = _read_json(self._snap_path, [])
            refs = self._refs()
            if name in refs["branches"] or name in refs["tags"]:
                raise ValueError(f"ref {name!r} already exists")
            target = (
                from_snapshot_id
                if from_snapshot_id is not None
                else self._head_id(snaps, "main")
            )
            if target is None:
                raise ValueError("cannot branch an empty table")
            if target not in {s["snapshot_id"] for s in snaps}:
                raise ValueError(f"snapshot {target} not found")
            refs["branches"][name] = target
            _atomic_write_json(self._refs_path, refs)
        return {"branch": name, "snapshot_id": target}

    def create_tag(self, name: str, snapshot_id: int | None = None) -> dict:
        """Iceberg tag: a named IMMUTABLE snapshot pointer (release
        labels). Tagged snapshots are protected from expiry."""
        if not name or name == "main":
            raise ValueError("tag name must be non-empty and not 'main'")
        with self._commit_lock():
            snaps = _read_json(self._snap_path, [])
            refs = self._refs()
            if name in refs["branches"] or name in refs["tags"]:
                raise ValueError(f"ref {name!r} already exists")
            target = (
                snapshot_id
                if snapshot_id is not None
                else self._head_id(snaps, "main")
            )
            if target is None or target not in {
                s["snapshot_id"] for s in snaps
            }:
                raise ValueError(f"snapshot {target} not found")
            refs["tags"][name] = target
            _atomic_write_json(self._refs_path, refs)
        return {"tag": name, "snapshot_id": target}

    def drop_branch(self, name: str) -> dict:
        if name == "main":
            raise ValueError("cannot drop the main branch")
        with self._commit_lock():
            refs = self._refs()
            if name not in refs["branches"]:
                raise ValueError(f"branch {name!r} not found")
            target = refs["branches"].pop(name)
            _atomic_write_json(self._refs_path, refs)
        return {"dropped": name, "was_at": target}

    def drop_tag(self, name: str) -> dict:
        with self._commit_lock():
            refs = self._refs()
            if name not in refs["tags"]:
                raise ValueError(f"tag {name!r} not found")
            target = refs["tags"].pop(name)
            _atomic_write_json(self._refs_path, refs)
        return {"dropped": name, "was_at": target}

    def list_refs(self) -> dict:
        """All refs with resolved heads; main always listed."""
        snaps = _read_json(self._snap_path, [])
        refs = self._refs()
        out = {
            "branches": dict(refs["branches"]),
            "tags": dict(refs["tags"]),
        }
        out["branches"].setdefault("main", self._head_id(snaps, "main"))
        return out

    def _is_ancestor(self, ancestor_id: int, descendant_id: int) -> bool:
        """Walk parent_id links (the commit DAG spans branches even
        though the log is one list)."""
        by_id = {s.snapshot_id: s for s in self.snapshots()}
        cur = descendant_id
        seen = set()
        while cur is not None and cur not in seen:
            if cur == ancestor_id:
                return True
            seen.add(cur)
            s = by_id.get(cur)
            cur = s.parent_id if s else None
        return False

    def fast_forward(self, to_branch: str, from_branch: str) -> dict:
        """Publish step of write-audit-publish: move ``to_branch`` to
        ``from_branch``'s head. Requires the target's current head to
        be an ANCESTOR of the source head (Iceberg fast_forward
        contract) — diverged branches need a rewrite-merge, not a ref
        move, or audited-but-stale data would silently drop commits."""
        with self._commit_lock():
            snaps = _read_json(self._snap_path, [])
            refs = self._refs()
            src = self._head_id(snaps, from_branch)
            if src is None:
                raise ValueError(f"branch {from_branch!r} not found")
            dst = self._head_id(snaps, to_branch)
            if dst is None and to_branch != "main":
                raise ValueError(f"branch {to_branch!r} not found")
            if dst is not None and dst != src and not self._is_ancestor(
                dst, src
            ):
                raise ValueError(
                    f"cannot fast-forward {to_branch!r}: its head {dst} "
                    f"is not an ancestor of {from_branch!r}'s head {src}"
                )
            refs["branches"][to_branch] = src
            _atomic_write_json(self._refs_path, refs)
        return {"branch": to_branch, "from": dst, "to": src}

    def snapshot_by_id(self, snapshot_id: int) -> Snapshot:
        for s in self.snapshots():
            if s.snapshot_id == snapshot_id:
                return s
        raise ValueError(f"snapshot {snapshot_id} not found")

    def snapshot_as_of_timestamp(self, ts_ms: int) -> Snapshot:
        best = None
        for s in self.snapshots():
            if s.timestamp_ms <= ts_ms:
                best = s
        if best is None:
            raise ValueError(f"no snapshot at or before {ts_ms}")
        return best

    @property
    def _lock_path(self) -> str:
        return os.path.join(self.root, "_meta", "commit.lock")

    def _touch_lock(self) -> None:
        """Heartbeat for a HELD commit lock. With the flock-based mutex
        crash release is automatic, so this is diagnostics only (the
        lockfile mtime shows the critical section is alive to humans
        inspecting _meta); it no longer affects mutual exclusion."""
        try:
            os.utime(self._lock_path)
        except OSError:
            pass

    @contextmanager
    def _commit_lock(self, timeout_s: float = 15.0, stale_s: float = 60.0):
        """Advisory commit mutex, flock-based (r5 advice): concurrent
        writers SERIALIZE instead of one silently overwriting the
        other's snapshot (last-writer-wins on the read-modify-write of
        snapshots.json).

        The previous O_EXCL-lockfile design needed an mtime staleness
        heuristic to break crashed holders' locks, which (a) could
        steal the lock from a LIVE holder stalled past ``stale_s`` and
        (b) had a rename/restore window in which a third writer could
        acquire while the original holder still believed it held the
        lock. ``flock`` removes the whole heuristic: the kernel drops
        the lock when the holder's fd closes — including on crash — so
        there is nothing to break and no steal path. The lockfile is
        NEVER unlinked (unlink+recreate would let two writers hold
        flocks on different inodes of the same path); holder pid:uuid
        is written into it purely for diagnostics. ``stale_s`` is kept
        in the signature for caller compatibility and ignored.

        Scope: same-host mutual exclusion (flock over NFS is
        unreliable). That matches this catalog's advisory-lock charter;
        a real multi-host deployment swaps this for a catalog-service
        CAS (the docstring contract since round 5). Threads in one
        process are also excluded: each acquisition opens its own fd,
        and flock excludes between open file descriptions."""
        deadline = time.monotonic() + timeout_s
        fd = os.open(self._lock_path, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except OSError:
                    if time.monotonic() > deadline:
                        raise CommitConflictError(
                            f"could not acquire commit lock {self._lock_path} "
                            f"within {timeout_s}s (held by a concurrent "
                            "writer?)"
                        ) from None
                    time.sleep(0.01)
            try:
                os.ftruncate(fd, 0)
                os.write(fd, f"{os.getpid()}:{uuid.uuid4().hex}".encode())
                yield
            finally:
                try:
                    fcntl.flock(fd, fcntl.LOCK_UN)
                except OSError:
                    pass
        finally:
            os.close(fd)

    def _commit(
        self,
        operation: str,
        files: list[str] | None = None,
        summary: dict | None = None,
        add_files: list[str] | None = None,
        expected_parent_id: int | None = None,
        check_parent: bool = False,
        delete_files: list[str] | None = None,
        add_delete_files: list[str] | None = None,
        eq_delete_files: list[dict] | None = None,
        add_eq_deletes: list[dict] | None = None,
        file_seqs_override: dict[str, int] | None = None,
    ) -> Snapshot:
        """Serialized optimistic commit. Exactly one of ``files``
        (absolute file list — overwrite/rollback) or ``add_files``
        (delta — append) must be given; the snapshot log is re-read
        UNDER the commit lock, so an append's parent file list is
        always current and two concurrent appends both land.

        ``check_parent`` + ``expected_parent_id`` give CAS semantics
        for non-additive commits (CoW update/delete, compaction) whose
        file list was derived from a snapshot read earlier: if another
        writer committed since, raise CommitConflictError instead of
        silently dropping their files (the caller re-plans and
        retries, Iceberg-style).

        Merge-on-read delete files: ``add_delete_files`` appends to the
        parent's delete-file list (MoR delete/update commits);
        ``delete_files`` sets the list absolutely (rollback restoring a
        historical snapshot). When neither is given, an additive commit
        (add_files) INHERITS the parent's delete files — appended data
        is untouched by existing position deletes (keys are per-file) —
        while an absolute-files commit (overwrite/compact/CoW rewrite
        planned over a MERGED scan) drops them: the rewrite already
        folded the deletes into its output.

        Equality deletes follow the same inheritance rules through
        ``eq_delete_files`` (absolute — rollback) / ``add_eq_deletes``
        (entries {"path", "cols"}; the commit stamps ``"seq"`` with its
        own snapshot id, so the delete applies exactly to data files
        that exist BEFORE it — Iceberg data-sequence semantics).
        ``file_seqs`` (file → adding-commit's snapshot id) is
        maintained here: carried over for files the parent knew,
        stamped with the new id for fresh files;
        ``file_seqs_override`` substitutes the lookup source (rollback
        restoring a historical snapshot's sequence map)."""
        if (files is None) == (add_files is None):
            raise ValueError(
                "_commit requires exactly one of files= or add_files= "
                "(a snapshot with files=None would poison the log)"
            )
        with self._commit_lock():
            snaps = _read_json(self._snap_path, [])
            # parent = THIS handle's branch head, not the log tail:
            # branch commits append to the same log (ids stay global
            # and time travel by id keeps working) but chain their
            # parent_id off the branch ref (Iceberg refs model)
            branch = self._branch or "main"
            parent = self._head_id(snaps, branch)
            if branch != "main" and parent is None:
                raise ValueError(f"branch {branch!r} not found")
            by_id = {s["snapshot_id"]: s for s in snaps}
            parent_snap = by_id.get(parent) if parent is not None else None
            if check_parent and parent != expected_parent_id:
                raise CommitConflictError(
                    f"concurrent commit detected: expected parent "
                    f"{expected_parent_id}, found {parent} — re-plan "
                    "against the current snapshot and retry"
                )
            if add_files is not None:
                parent_files = parent_snap["files"] if parent_snap else []
                files = list(parent_files) + list(add_files)
            parent_dels = (
                list(parent_snap.get("delete_files", []))
                if parent_snap else []
            )
            if delete_files is not None:
                dels = list(delete_files)
            elif add_delete_files is not None:
                dels = parent_dels + list(add_delete_files)
            elif add_files is not None:
                dels = parent_dels  # additive commits inherit
            else:
                dels = []  # full/partial rewrite planned over merged scan
            new_id = (snaps[-1]["snapshot_id"] + 1) if snaps else 1
            parent_eq = (
                list(parent_snap.get("eq_delete_files", []))
                if parent_snap else []
            )
            if eq_delete_files is not None:
                eqs = list(eq_delete_files)
            elif add_eq_deletes is not None:
                eqs = parent_eq + [
                    {"path": d["path"], "cols": list(d["cols"]),
                     "seq": new_id}
                    for d in add_eq_deletes
                ]
            elif add_files is not None:
                eqs = parent_eq  # additive commits inherit
            else:
                eqs = []  # rewrite planned over merged scan folded them
            seq_src = (
                file_seqs_override
                if file_seqs_override is not None
                else (parent_snap.get("file_seqs", {})
                      if parent_snap else {})
            )
            snap = Snapshot(
                snapshot_id=new_id,
                timestamp_ms=int(time.time() * 1000),
                operation=operation,
                files=files,
                parent_id=parent,
                summary=summary or {},
                schema_version=self.meta().get("schema", {}).get("version", 1),
                delete_files=dels,
                eq_delete_files=eqs,
                file_seqs={f: seq_src.get(f, new_id) for f in files},
            )
            refs = self._refs()
            if branch != "main":
                # the log tail is about to stop being main's head: pin
                # the implicit main BEFORE appending the branch commit
                if "main" not in refs["branches"]:
                    refs["branches"]["main"] = (
                        snaps[-1]["snapshot_id"] if snaps else None
                    )
                refs["branches"][branch] = new_id
            elif "main" in refs["branches"]:
                refs["branches"]["main"] = new_id
            snaps.append(snap.to_json())
            _atomic_write_json(self._snap_path, snaps)
            if branch != "main" or "main" in refs["branches"]:
                _atomic_write_json(self._refs_path, refs)
            return snap

    # -- write path --------------------------------------------------------

    def write_format(self) -> str:
        """Per-table columnar format: table property
        `write.format.default` (parquet | orc), default parquet — the
        operative end of the S15 resolution chain (ORC is the second
        columnar format, SURVEY §7 Vortex substitution)."""
        fmt = self.properties().get("write.format.default", "parquet").lower()
        if fmt not in ("parquet", "orc"):
            raise ValueError(f"unsupported write.format.default {fmt!r}")
        return fmt

    def _materialize(self, df: DataFrame) -> list[str]:
        """Run the Spark write job into a snapshot-unique subdir of data/;
        return the new data file paths (relative to table root).

        Partitioned tables write with partitionBy on transform columns —
        emulating Iceberg hidden partitioning: derived `_p_*` columns
        exist only on disk layout, never in the logical schema.

        Two write-clustering table properties (Iceberg analogues):
        ``write.sort.order`` ("col1,col2") range-clusters + sorts every
        write on those columns, so per-file/row-group min-max stats are
        tight from birth — predicates on the sort keys prune without
        waiting for a compact(sort_by=...); ``write.bloom.columns``
        enables parquet bloom filters on the named columns, giving
        point-lookup file skipping on high-cardinality keys that
        min-max stats cannot serve."""
        fmt = self.write_format()
        sub = f"data/{uuid.uuid4().hex[:12]}"
        out = os.path.join(self.root, sub)
        pfields = self.partition_fields()
        props = self.properties()
        writer_df = df
        sort_order = [
            c.strip()
            for c in props.get("write.sort.order", "").split(",")
            if c.strip()
        ]
        if sort_order:
            known = set(writer_df.columns)
            bad = [c for c in sort_order if c not in known]
            if bad:
                raise ValueError(
                    f"write.sort.order references unknown columns {bad}"
                )
        pcols = []
        for pf in pfields:
            pcols.append(pf.name)
            writer_df = writer_df.withColumn(pf.name, pf.expr())
        hash_mode = pcols and str(props.get(
            "write.distribution.mode", "")).lower() == "hash"
        if hash_mode:
            # Iceberg write.distribution-mode=hash analogue (r13):
            # cluster rows by partition value before the write so each
            # partition value lands as ONE file per commit instead of
            # one per (task x value) — the classic partitionBy
            # small-files fix. Opt-in: unpartitioned tables and
            # existing layouts are untouched. (AQE may merge these
            # shuffle partitions but never splits a value across
            # tasks, so the one-file-per-value bound holds.)
            # Ordering vs write.sort.order (r13 ADVICE): the hash
            # shuffle runs FIRST and the sort runs within the hashed
            # partitions — a range shuffle after the hash would undo
            # the one-file-per-value clustering, and a hash shuffle
            # after a sort would destroy the sorted-within-file layout
            # the sort-order property promises. Both properties
            # compose: files stay one-per-value AND sorted inside.
            writer_df = writer_df.repartition(*[F.col(c) for c in pcols])
            if sort_order:
                # partition cols lead the sort key: the file writer
                # requires its input ordered by partition columns and
                # would insert its OWN (unstable) sort if ours doesn't
                # satisfy that prefix — leading with pcols keeps the
                # sort-order suffix intact inside every written file.
                writer_df = writer_df.sortWithinPartitions(
                    *pcols, *sort_order
                )
        elif sort_order:
            writer_df = writer_df.repartitionByRange(
                *sort_order
            ).sortWithinPartitions(*sort_order)
        writer = writer_df.write.mode("overwrite").format(fmt)
        if fmt == "parquet":
            for c in props.get("write.bloom.columns", "").split(","):
                c = c.strip()
                if c:
                    writer = writer.option(
                        f"parquet.bloom.filter.enabled#{c}", "true"
                    )
        if pcols:
            writer = writer.partitionBy(*pcols)
        writer.save(out)
        files = []
        for dirpath, _dirnames, filenames in os.walk(out):
            for fn in filenames:
                if fn.endswith((".parquet", ".orc")):
                    files.append(
                        os.path.relpath(os.path.join(dirpath, fn), self.root)
                    )
        files = sorted(files)
        self._record_file_stats(files)
        if str(props.get("write.bloom.index", "")).lower() == "true":
            # file-level bloom index (plans/bloom.py): one extra
            # column-pruned pass over exactly the files just written;
            # best-effort like stats — a failed build degrades pruning,
            # never the write
            try:
                from .plans.bloom import build_bloom_sidecar

                build_bloom_sidecar(self, files)
            except Exception:  # noqa: BLE001
                pass
        return files

    # consolidate shards into the base map once this many accumulate:
    # keeps reads O(shards ≤ cap) while writes stay O(new files)
    # amortized (one O(total) merge every cap commits)
    _STATS_SHARD_CAP = 64

    def _record_file_stats(self, new_files: list[str]) -> None:
        """Persist per-file column (min, max, null_count) into the table
        metadata at write time — the Iceberg manifest-stats model, so
        the __files inspect view never re-reads footers. Each commit
        writes ONE SHARD holding only its new files (O(files written)
        driver work — a single growing map would make every commit
        O(files in table), quadratic over a table's life at 1M files);
        footer reads are bounded by write parallelism. Stats are
        best-effort (ORC files simply record none)."""
        stats = self._footer_stats(new_files)
        if not stats:
            return
        shard = {
            f: {
                c: [
                    str(mn) if mn is not None else None,
                    str(mx) if mx is not None else None,
                    nc,
                ]
                for c, (mn, mx, nc) in cols.items()
            }
            for f, cols in stats.items()
        }
        os.makedirs(self._stats_dir, exist_ok=True)
        name = f"{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}.json"
        _atomic_write_json(os.path.join(self._stats_dir, name), shard)
        shards = [f for f in os.listdir(self._stats_dir) if f.endswith(".json")]
        if len(shards) > self._STATS_SHARD_CAP:
            self._consolidate_stats()

    def _consolidate_stats(self) -> None:
        """Merge every shard into the base map and delete the shards —
        the manifest-compaction analogue. The shard list is captured
        ONCE and only those exact files are merged and deleted: a shard
        landed by a concurrent commit (or the read-path fallback
        persister) after the listing survives for the next merge
        instead of being deleted unmerged.

        Runs under the commit lock: two concurrent consolidations would
        otherwise interleave read-merge-write of the base map — the
        later writer's (older) merge could drop stats a faster
        consolidation had already merged AND whose shard files it had
        already deleted. Consolidation is best-effort amortized work,
        so lock CONTENTION is non-fatal: on timeout it simply skips
        (the next commit past the shard cap retries) instead of
        aborting the enclosing append with a spurious conflict error.
        (Callers sit outside _commit, so the lock is never held
        re-entrantly; stats are perf-only, but silently losing them
        degrades pruning for the table's lifetime.)"""
        if not os.path.isdir(self._stats_dir):
            return
        try:
            lock = self._commit_lock(timeout_s=2.0)
            lock.__enter__()
        except CommitConflictError:
            return  # contended: skip, a later commit consolidates
        try:
            shard_names = sorted(
                fn for fn in os.listdir(self._stats_dir) if fn.endswith(".json")
            )
            if not shard_names:
                return
            merged = _read_json(self._stats_path, {})
            # heartbeat: the base-map parse is O(files in table) — at
            # very large tables it could approach the waiters' stale_s;
            # refreshing the lock mtime after the long read (and before
            # the write) keeps the hold visibly live
            self._touch_lock()
            for fn in shard_names:
                merged.update(_read_json(os.path.join(self._stats_dir, fn), {}))
            self._touch_lock()
            _atomic_write_json(self._stats_path, merged)
        finally:
            lock.__exit__(None, None, None)
        for fn in shard_names:
            try:
                os.remove(os.path.join(self._stats_dir, fn))
            except FileNotFoundError:
                pass

    def stored_file_stats(self) -> dict[str, dict]:
        """Merged write-time stats map: base map + newer shards (newer
        entries win on rewrite of the same path)."""
        merged = _read_json(self._stats_path, {})
        if os.path.isdir(self._stats_dir):
            for fn in sorted(os.listdir(self._stats_dir)):
                if fn.endswith(".json"):
                    merged.update(
                        _read_json(os.path.join(self._stats_dir, fn), {})
                    )
        return merged

    def _align(self, df: DataFrame) -> DataFrame:
        """Project df onto the table schema (order + cast), so appends
        can't drift (reference append-cast, catalog.py:1563-1581)."""
        schema = self.schema()
        cols = []
        for f in schema.fields:
            if f.name in df.columns:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return df.select(*cols)

    def append(self, df: DataFrame) -> Snapshot:
        aligned = self._align(df)
        new_files = self._materialize(aligned)
        # delta commit: the parent file list is resolved under the
        # commit lock, so concurrent appends serialize and both land
        return self._commit(
            "append", add_files=new_files, summary={"added_files": len(new_files)}
        )

    def overwrite(
        self, df: DataFrame, expected_snapshot_id: int | None = None
    ) -> Snapshot:
        """Full-table replace. When ``df`` was derived from a scan of a
        specific snapshot (compact, upsert), pass that snapshot id as
        ``expected_snapshot_id``: a concurrent commit then raises
        CommitConflictError instead of being silently erased by this
        overwrite."""
        aligned = self._align(df)
        new_files = self._materialize(aligned)
        return self._commit(
            "overwrite",
            new_files,
            {"added_files": len(new_files)},
            expected_parent_id=expected_snapshot_id,
            check_parent=expected_snapshot_id is not None,
        )

    # -- read path ---------------------------------------------------------

    def prune_files(
        self,
        filter_expr: str,
        snap: "Snapshot | None" = None,
        schema: T.StructType | None = None,
    ) -> tuple[list[str], int]:
        """Stats-based scan planning (Iceberg plan_files analogue; the
        reference defers to PyIceberg for this): evaluate ``filter_expr``
        against the persisted per-file min/max/null stats and return
        (surviving files, total files). Conservative — a file is dropped
        only when provably predicate-free; see plans/pruning.py."""
        from .plans.pruning import parse_conjuncts, prune_files as _prune

        snap = snap if snap is not None else self.current_snapshot()
        if snap is None or not snap.files:
            return [], 0
        stats = self._file_column_stats(snap)
        kept = _prune(snap.files, stats, schema or self.schema(), filter_expr)
        # file-level bloom consult (plans/bloom.py, opt-in via
        # write.bloom.index): equality/IN conjuncts on indexed columns
        # drop files whose bitsets prove the value absent. The isdir
        # probe keeps non-indexed tables at zero extra cost.
        if kept and os.path.isdir(os.path.join(self.root, "_meta", "bloom")):
            conj = parse_conjuncts(filter_expr)
            if conj:
                types = {f.name: f.dataType
                         for f in (schema or self.schema()).fields}
                probes = []
                for c in conj:
                    if c.op not in ("=", "in") or c.col not in types:
                        continue
                    tagged = c.value if c.op == "in" else [c.value]
                    vals = [v for _kind, v in tagged]
                    probes.append((c.col, types[c.col], vals))
                if probes:
                    from .plans.bloom import bloom_prune

                    kept = bloom_prune(self, kept, probes)
        return kept, len(snap.files)

    def scan(
        self,
        snapshot_id: int | None = None,
        as_of: str | int | None = None,
        filter: str | None = None,
        with_pos: bool = False,
        ref: str | None = None,
    ) -> DataFrame:
        """Lazy DataFrame over the resolved snapshot's files.

        ``as_of`` follows the reference's resolution order (catalog.py:
        240-288): try int snapshot-id first, else ISO timestamp.
        ``ref`` reads a named branch or tag head (Iceberg
        ``VERSION AS OF 'ref'``).

        ``filter`` applies the predicate AND plans the scan over only
        the files whose stats intersect it — at scale a selective query
        never lists or opens the rest of the snapshot."""
        if ref is not None:
            refs = self._refs()
            target = refs["tags"].get(ref, refs["branches"].get(ref))
            if target is None and ref == "main":
                target = self._head_id(
                    [s.to_json() for s in self.snapshots()], "main"
                )
            if target is None:
                raise ValueError(f"ref {ref!r} not found")
            snapshot_id = target
        snap = self._resolve(snapshot_id, as_of)
        if snap is None or not snap.files:
            return self.scan_files([], with_pos=with_pos)
        # time travel across a schema change reads with the snapshot's
        # OWN schema (Iceberg semantics): after rename b→c, snapshot-1
        # files physically carry 'b' — reading them with the current
        # schema would return all-NULL for the renamed column. The
        # CURRENT snapshot always reads with the current schema: alters
        # without a rewrite (add_column) bump the version without a new
        # snapshot, and the live table must show the new columns.
        schema = None
        cur = self.current_snapshot()
        if cur is not None and snap.snapshot_id != cur.snapshot_id:
            version = self._snapshot_schema_version(snap)
            if version != self.meta().get("schema", {}).get("version", 1):
                try:
                    schema = self.schema_at_version(version)
                except ValueError:
                    schema = None  # incomplete legacy history → current
        if filter:
            # a filtered historical scan interprets the predicate (and
            # types the pruning stats) against the SNAPSHOT's schema —
            # mixing current names with historical files would either
            # error or silently prune wrong
            kept, _total = self.prune_files(filter, snap, schema=schema)
            return self.scan_files(
                kept, schema=schema, with_pos=with_pos,
                merge_snapshot=snap,
            ).where(filter)
        return self.scan_files(
            snap.files, schema=schema, with_pos=with_pos,
            merge_snapshot=snap,
        )

    def scan_files(
        self,
        files: list[str],
        schema: T.StructType | None = None,
        with_pos: bool = False,
        merge_deletes: list[str] | None = None,
        eq_deletes: list[dict] | None = None,
        file_seqs: dict[str, int] | None = None,
        merge_snapshot: "Snapshot | None" = None,
    ) -> DataFrame:
        """Lazy DataFrame over an explicit subset of a snapshot's data
        files (relative paths) — the read side of file-pruned CoW and
        the single reader every scan path delegates to.

        recursiveFileLookup skips directory partition-inference: every
        logical column is physically present in each file (hidden
        partitioning writes *derived* ``_p_*`` columns), and because
        files are physically split by the transform, parquet min/max
        footer stats prune whole files for pushed-down predicates
        anyway. A snapshot may mix formats (write.format.default
        switched mid-history): read each format group lazily and
        union. ``schema`` overrides the current table schema for
        time-travel reads across a schema change.

        ``with_pos`` appends the merge-on-read position key — the
        file's full ``_metadata.file_path`` URI as ``_mor_file`` and
        ``_metadata.row_index`` as ``_mor_pos``. The FULL path, not the
        basename: a partitioned write emits the SAME part-file name
        into every partition directory one task touches, so basenames
        collide across partition dirs of one job. Both the delete
        records and the scan key derive from the same reader-reported
        URI, so encoding is self-consistent; the recorded URIs pin the
        warehouse location (physically relocating a table invalidates
        PENDING delete files — compact() folds them first; backup/
        clone/restore materialize through merged scans and carry no
        delete files). ``merge_deletes`` (relative delete-file paths)
        anti-joins those keys against the broadcast position-delete
        set — map-side, no shuffle: delete files are small by MoR's
        premise (compact() folds them when they accumulate).

        ``eq_deletes`` + ``file_seqs`` (or ``merge_snapshot``, which
        supplies all three merge inputs from one snapshot) apply
        EQUALITY deletes: files are grouped by their applicable delete
        subset — a delete applies only to files with an OLDER sequence
        — using driver-side metadata alone (no URI↔relpath mapping at
        runtime), then each group anti-joins the broadcast key values
        null-safely. Groups number at most n_deletes+1 and deletes are
        compacted away as debt accumulates, so the plan stays a union
        of a few scan+broadcast-anti-join branches — map-side, no
        shuffle, format-agnostic (equality keys need no row index, so
        ORC tables take equality deletes even though position deletes
        are parquet-gated)."""
        if merge_snapshot is not None:
            merge_deletes = merge_snapshot.delete_files
            eq_deletes = merge_snapshot.eq_delete_files
            file_seqs = merge_snapshot.file_seqs
        schema = schema or self.schema()
        if not files:
            df = self.spark.createDataFrame([], schema)
            if with_pos:
                df = df.withColumn(
                    "_mor_file", F.lit(None).cast("string")
                ).withColumn("_mor_pos", F.lit(None).cast("long"))
            return df
        need_pos = with_pos or bool(merge_deletes)
        if eq_deletes:
            seqs = file_seqs or {}
            groups: dict[tuple[int, ...], list[str]] = {}
            for f in files:
                key = tuple(
                    i
                    for i, d in enumerate(eq_deletes)
                    if d["seq"] > seqs.get(f, 0)
                )
                groups.setdefault(key, []).append(f)
            parts = []
            for key, grp in groups.items():
                gdf = self._read_files(grp, schema, need_pos)
                by_cols: dict[tuple[str, ...], list[str]] = {}
                for i in key:
                    by_cols.setdefault(
                        tuple(eq_deletes[i]["cols"]), []
                    ).append(eq_deletes[i]["path"])
                for cols_key, dpaths in by_cols.items():
                    missing = [
                        c for c in cols_key if c not in gdf.columns
                    ]
                    if missing:
                        raise ValueError(
                            f"equality-delete key column(s) {missing} "
                            "absent from the scan schema — key columns "
                            "were renamed/dropped after the delete; "
                            "compact() the table to fold its equality "
                            "deletes before evolving key columns"
                        )
                    keys_df = (
                        self.spark.read.parquet(
                            *[os.path.join(self.root, p) for p in dpaths]
                        )
                        .select(
                            *[
                                F.col(c).alias(f"_eqd_{c}")
                                for c in cols_key
                            ]
                        )
                    )
                    cond = None
                    for c in cols_key:
                        term = gdf[c].eqNullSafe(keys_df[f"_eqd_{c}"])
                        cond = term if cond is None else (cond & term)
                    gdf = gdf.join(F.broadcast(keys_df), cond, "left_anti")
                parts.append(gdf)
            df = parts[0]
            for extra in parts[1:]:
                df = df.unionByName(extra)
        else:
            df = self._read_files(files, schema, need_pos)
        if merge_deletes:
            dels = self.spark.read.schema(
                "_file string, _pos long"
            ).parquet(*[os.path.join(self.root, f) for f in merge_deletes])
            df = df.join(
                F.broadcast(dels),
                (df["_mor_file"] == dels["_file"])
                & (df["_mor_pos"] == dels["_pos"]),
                "left_anti",
            )
        if need_pos and not with_pos:
            df = df.drop("_mor_file", "_mor_pos")
        return df

    def _read_files(
        self, files: list[str], schema: T.StructType, need_pos: bool
    ) -> DataFrame:
        """Lazy per-format union reader over data files (the body every
        scan path shares). ``need_pos`` appends the merge-on-read
        position key columns; parquet exposes ``_metadata.row_index``,
        ORC does not (this Spark) — a NULL ``_mor_pos`` never equals a
        delete key, so ORC rows pass the position anti-join untouched
        (the MoR position-delete write path is parquet-gated, so no
        position delete ever references an ORC file)."""
        paths = [os.path.join(self.root, f) for f in files]
        cols = [f.name for f in schema.fields]
        parts = []
        for fmt, ext in (("parquet", ".parquet"), ("orc", ".orc")):
            group = [p for p in paths if p.endswith(ext)]
            if group:
                sel = list(cols)
                if need_pos:
                    sel += [
                        F.col("_metadata.file_path").alias("_mor_file"),
                        (
                            F.col("_metadata.row_index")
                            if fmt == "parquet"
                            else F.lit(None).cast("long")
                        ).alias("_mor_pos"),
                    ]
                reader = (
                    self.spark.read.schema(schema)
                    .option("recursiveFileLookup", "true")
                    .format(fmt)
                )
                parts.append(reader.load(group).select(*sel))
        df = parts[0]
        for extra in parts[1:]:
            df = df.unionByName(extra)
        return df

    def replace_files(
        self,
        keep_files: list[str],
        replacement: DataFrame,
        summary: dict | None = None,
        expected_snapshot_id: int | None = None,
    ) -> Snapshot:
        """File-pruned copy-on-write commit: untouched files carry over
        by reference; only ``replacement`` (the rewritten subset) runs a
        write job. At scale this is the difference between rewriting one
        partition's files and rewriting the table.

        ``expected_snapshot_id`` (the snapshot the keep/rewrite split
        was planned against) arms conflict detection: if another writer
        committed meanwhile, the commit raises CommitConflictError
        instead of silently dropping their files.

        The parent's MoR delete files are INHERITED: kept files may
        still have live position deletes. Entries keyed by rewritten
        files' basenames go stale but match nothing (the basenames left
        the file list) — callers must rewrite from a delete-merged scan
        (``scan_files(..., merge_snapshot=...)``) so deleted rows are
        not resurrected in the new files."""
        base = (
            self.snapshot_by_id(expected_snapshot_id)
            if expected_snapshot_id is not None
            else self.current_snapshot()
        )
        aligned = self._align(replacement)
        new_files = self._materialize(aligned)
        return self._commit(
            "overwrite",
            sorted(keep_files) + new_files,
            {**(summary or {}), "kept_files": len(keep_files),
             "added_files": len(new_files)},
            expected_parent_id=expected_snapshot_id,
            check_parent=expected_snapshot_id is not None,
            delete_files=list(base.delete_files) if base else [],
            # equality deletes are inherited too: kept files keep their
            # (older) sequences so live deletes still apply to them,
            # while the rewritten files get the NEW commit's sequence
            # and are exempt by construction
            eq_delete_files=list(base.eq_delete_files) if base else [],
        )

    def write_position_deletes(self, keys_df: DataFrame) -> list[str]:
        """Materialize a position-delete file set (merge-on-read write
        path): ``keys_df`` must carry ``_file`` (data-file basename)
        and ``_pos`` (row index within that file). Returns the new
        delete files' relative paths — pass to
        ``commit_position_deletes`` / ``commit_mor_update``."""
        sub = f"deletes/{uuid.uuid4().hex[:12]}"
        out = os.path.join(self.root, sub)
        (
            keys_df.select(
                F.col("_file").cast("string").alias("_file"),
                F.col("_pos").cast("long").alias("_pos"),
            )
            .coalesce(1)  # delete sets are small by MoR's premise
            .write.mode("overwrite")
            .parquet(out)
        )
        files = []
        for dirpath, _d, filenames in os.walk(out):
            for fn in filenames:
                if fn.endswith(".parquet"):
                    files.append(
                        os.path.relpath(os.path.join(dirpath, fn), self.root)
                    )
        return sorted(files)

    def commit_position_deletes(
        self,
        new_delete_files: list[str],
        summary: dict | None = None,
        expected_snapshot_id: int | None = None,
    ) -> Snapshot:
        """Merge-on-read DELETE commit: data files unchanged, the new
        position-delete files append to the snapshot's delete list. CAS
        against the snapshot the positions were computed from."""
        return self._commit(
            "delete",
            add_files=[],
            summary={**(summary or {}), "mode": "merge-on-read",
                     "added_delete_files": len(new_delete_files)},
            add_delete_files=new_delete_files,
            expected_parent_id=expected_snapshot_id,
            check_parent=expected_snapshot_id is not None,
        )

    def write_eq_deletes(
        self, keys_df: DataFrame, cols: list[str]
    ) -> list[str]:
        """Materialize an equality-delete file set: ``keys_df`` carries
        the key VALUES (one row per deleted key) on exactly ``cols``.
        Returns relative paths — pass to ``commit_eq_deletes``."""
        sub = f"deletes/eq-{uuid.uuid4().hex[:12]}"
        out = os.path.join(self.root, sub)
        (
            keys_df.select(*cols)
            .dropDuplicates()
            .coalesce(1)  # delete key sets are small by MoR's premise
            .write.mode("overwrite")
            .parquet(out)
        )
        files = []
        for dirpath, _d, filenames in os.walk(out):
            for fn in filenames:
                if fn.endswith(".parquet"):
                    files.append(
                        os.path.relpath(os.path.join(dirpath, fn), self.root)
                    )
        return sorted(files)

    def commit_eq_deletes(
        self,
        new_eq_files: list[str],
        cols: list[str],
        summary: dict | None = None,
        expected_snapshot_id: int | None = None,
    ) -> Snapshot:
        """Equality-delete commit (Iceberg v2's second delete kind):
        data files unchanged; the key-value files append to the
        snapshot's equality-delete list stamped with the NEW commit's
        sequence — they logically delete matching rows only in files
        that existed before this commit, so re-inserting a deleted key
        afterwards is visible (data-sequence-number semantics)."""
        return self._commit(
            "delete",
            add_files=[],
            summary={**(summary or {}), "mode": "merge-on-read",
                     "equality_delete": True,
                     "added_eq_delete_files": len(new_eq_files)},
            add_eq_deletes=[
                {"path": p, "cols": list(cols)} for p in new_eq_files
            ],
            expected_parent_id=expected_snapshot_id,
            check_parent=expected_snapshot_id is not None,
        )

    def commit_eq_upsert(
        self,
        replacement: DataFrame,
        new_eq_files: list[str],
        cols: list[str],
        summary: dict | None = None,
    ) -> Snapshot:
        """CDC-apply commit (the Flink→Iceberg changelog pattern): one
        ATOMIC commit that equality-deletes the incoming keys' old
        versions AND appends their new rows. Sequence semantics make it
        self-consistent: the delete and the data files share this
        commit's sequence, and a delete applies only to STRICTLY older
        files — so the rows appended here are exempt while every prior
        version of the keys dies. Per-batch cost is O(batch): no table
        scan, no data-file rewrite, no position lookup. Both sides are
        additive, so no CAS is needed (concurrent appends compose under
        the commit lock)."""
        aligned = self._align(replacement)
        new_files = self._materialize(aligned)
        return self._commit(
            "update",
            add_files=new_files,
            summary={**(summary or {}), "mode": "merge-on-read",
                     "equality_delete": True,
                     "added_files": len(new_files),
                     "added_eq_delete_files": len(new_eq_files)},
            add_eq_deletes=[
                {"path": p, "cols": list(cols)} for p in new_eq_files
            ],
        )

    def commit_mor_update(
        self,
        replacement: DataFrame,
        new_delete_files: list[str],
        summary: dict | None = None,
        expected_snapshot_id: int | None = None,
    ) -> Snapshot:
        """Merge-on-read UPDATE commit: the updated rows land as NEW
        data files while their old versions are position-deleted — a
        one-row update writes one small file + one delete file instead
        of rewriting every matched data file (CoW). compact() folds the
        accumulated deletes back into plain data files."""
        aligned = self._align(replacement)
        new_files = self._materialize(aligned)
        return self._commit(
            "update",
            add_files=new_files,
            summary={**(summary or {}), "mode": "merge-on-read",
                     "added_files": len(new_files),
                     "added_delete_files": len(new_delete_files)},
            add_delete_files=new_delete_files,
            expected_parent_id=expected_snapshot_id,
            check_parent=expected_snapshot_id is not None,
        )

    def rewrite_delete_files(self) -> dict:
        """Iceberg ``RewritePositionDeleteFiles`` analogue — MINOR
        compaction: consolidate the head snapshot's accumulated
        position-delete files into one and drop DEAD state, without
        touching a single data file. Every MoR delete/update commit
        adds one small delete file; after thousands of commits the
        scan's broadcast anti-join unions thousands of tiny reads.
        Full ``compact()`` folds them but rewrites data files — at
        100 TB that is a massive job for what is a metadata problem.
        This rewrite is O(delete data) only.

        Dropped as dead: keys whose data-file URI no longer resolves
        to a live file (the file was since compacted/rewritten away),
        duplicate (file, pos) keys from repeated overlapping deletes,
        and equality-delete entries whose sequence is ≤ every live
        file's sequence floor — they can never match again.

        CAS-guarded against the planned-from snapshot: a concurrent
        MoR commit's fresh delete files must not be silently dropped
        by this absolute delete-list replacement."""
        cur = self.current_snapshot()
        if cur is None:
            return {"rewritten_delete_files": 0, "kept_keys": 0,
                    "dropped_keys": 0, "dropped_eq_deletes": 0}
        new_files: list[str] = []
        kept_n = total = 0
        if cur.delete_files:
            dels = self.spark.read.schema("_file string, _pos long").parquet(
                *[os.path.join(self.root, f) for f in cur.delete_files]
            )
            # distinct URIs are bounded by the data-file count; the
            # URI→relpath mapping is Python-side, so resolve the small
            # set driver-side and filter with isin
            uris = [r["_file"]
                    for r in dels.select("_file").distinct().collect()]
            live = set(cur.files)
            live_uris = [u for u in uris
                         if u is not None and self.relativize_file(u) in live]
            total = dels.count()
            if live_uris:
                kept = (
                    dels.where(F.col("_file").isin(live_uris))
                    .dropDuplicates(["_file", "_pos"])
                )
                kept_n = kept.count()
                if kept_n:
                    new_files = self.write_position_deletes(kept)
        seq_floor = min(
            (cur.file_seqs.get(f, 0) for f in cur.files), default=0
        )
        live_eq = [d for d in cur.eq_delete_files if d["seq"] > seq_floor]
        if (not cur.delete_files and
                len(live_eq) == len(cur.eq_delete_files)):
            return {"rewritten_delete_files": 0, "kept_keys": 0,
                    "dropped_keys": 0, "dropped_eq_deletes": 0}
        self._commit(
            "rewrite_deletes",
            add_files=[],
            delete_files=new_files,
            eq_delete_files=live_eq,
            file_seqs_override=dict(cur.file_seqs),
            summary={
                "consolidated_delete_files": len(cur.delete_files),
                "kept_keys": kept_n,
                "dropped_keys": total - kept_n,
                "dropped_eq_deletes":
                    len(cur.eq_delete_files) - len(live_eq),
            },
            expected_parent_id=cur.snapshot_id,
            check_parent=True,
        )
        return {"rewritten_delete_files": len(cur.delete_files),
                "kept_keys": kept_n, "dropped_keys": total - kept_n,
                "dropped_eq_deletes":
                    len(cur.eq_delete_files) - len(live_eq)}

    def cherry_pick(self, snapshot_id: int) -> Snapshot:
        """Iceberg cherry-pick: re-apply ONE additive commit (append /
        MoR delete / MoR update / equality delete) onto the CURRENT
        head — the single-commit half of write-audit-publish
        (``fast_forward`` publishes a whole branch; cherry-pick
        publishes one audited commit, e.g. staged on a WAP branch).
        The commit's DELTA against its own parent — added data files,
        added position-delete files, added equality deletes — is
        re-committed on the head; equality deletes are re-stamped with
        the new sequence, so they apply to everything that exists
        before the pick, exactly Iceberg's re-application semantics.
        Rewriting commits (overwrite / CoW update / compact /
        rollback) are rejected: their absolute file list is only
        meaningful against their own parent."""
        src = self.snapshot_by_id(snapshot_id)
        parent = (self.snapshot_by_id(src.parent_id)
                  if src.parent_id is not None else None)
        pfiles = set(parent.files) if parent else set()
        if pfiles - set(src.files):
            raise ValueError(
                f"snapshot {snapshot_id} ({src.operation}) rewrote files; "
                "cherry-pick supports additive commits only")
        added = [f for f in src.files if f not in pfiles]
        cur = self.current_snapshot()
        if cur is not None and added and set(added) <= set(cur.files):
            raise ValueError(
                f"snapshot {snapshot_id} is already applied on the head")
        pdels = set(parent.delete_files) if parent else set()
        added_dels = [d for d in src.delete_files if d not in pdels]
        peq = {d["path"] for d in (parent.eq_delete_files if parent else [])}
        added_eq = [{"path": d["path"], "cols": list(d["cols"])}
                    for d in src.eq_delete_files if d["path"] not in peq]
        return self._commit(
            "cherry_pick",
            add_files=added,
            add_delete_files=added_dels or None,
            add_eq_deletes=added_eq or None,
            summary={"source_snapshot_id": snapshot_id,
                     "added_files": len(added),
                     "added_delete_files": len(added_dels),
                     "added_eq_delete_files": len(added_eq)},
        )

    def relativize_file(self, path: str) -> str:
        """Normalize Spark's input_file_name() URI to a snapshot-log
        relative path. input_file_name() returns a percent-encoded URI
        (spaces → %20, Hadoop-encoded partition dir values), while the
        snapshot log stores raw filesystem paths — decode or the
        file-pruning probe in crud._matched_files never matches and
        update/delete silently degrade to full-table rewrites."""
        from urllib.parse import unquote

        p = path
        if p.startswith("file:"):
            p = p[len("file:"):]
            while p.startswith("//"):
                p = p[1:]
        return os.path.relpath(unquote(p), self.root)

    def _file_column_stats(
        self, snap: "Snapshot", max_files: int = 1000
    ) -> dict[str, dict[str, tuple]]:
        """Per-file column (min, max, null_count): stored write-time
        stats first (`_meta/file_stats.json`, recorded by _materialize),
        parquet-footer fallback only for files predating stats recording.
        The fallback is capped: footer reads are driver-side, so a huge
        legacy snapshot returns partial stats rather than stalling."""
        stored = self.stored_file_stats()
        out: dict[str, dict[str, tuple]] = {
            f: {c: tuple(v) for c, v in stored[f].items()}
            for f in snap.files
            if f in stored
        }
        missing = [f for f in snap.files if f not in stored]
        if missing and len(missing) <= max_files:
            fallback = self._footer_stats(missing)
            out.update(fallback)
            if fallback:
                # persist as a shard so the NEXT probe is a dict lookup,
                # not another round of driver-side footer reads
                shard = {
                    f: {
                        c: [
                            str(mn) if mn is not None else None,
                            str(mx) if mx is not None else None,
                            nc,
                        ]
                        for c, (mn, mx, nc) in cols.items()
                    }
                    for f, cols in fallback.items()
                }
                os.makedirs(self._stats_dir, exist_ok=True)
                name = f"{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}.json"
                _atomic_write_json(os.path.join(self._stats_dir, name), shard)
        return out

    def _footer_stats(
        self, files: list[str]
    ) -> dict[str, dict[str, tuple]]:
        """Read (min, max, null_count) per column from parquet footers."""
        try:
            import pyarrow.parquet as pq
        except ImportError:  # pragma: no cover
            return {}
        out: dict[str, dict[str, tuple]] = {}
        for f in files:
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(self.root, f)
            if not os.path.exists(p):
                continue
            try:
                md = pq.ParquetFile(p).metadata
            except Exception:  # noqa: BLE001 — stats are best-effort
                continue
            stats: dict[str, list] = {}
            for rg in range(md.num_row_groups):
                grp = md.row_group(rg)
                for ci in range(grp.num_columns):
                    col = grp.column(ci)
                    st = col.statistics
                    if st is None:
                        continue
                    name = col.path_in_schema
                    cur = stats.get(name)
                    mn = st.min if st.has_min_max else None
                    mx = st.max if st.has_min_max else None
                    nc = st.null_count if st.null_count is not None else 0
                    if cur is None:
                        stats[name] = [mn, mx, nc]
                    else:
                        if mn is not None:
                            cur[0] = mn if cur[0] is None else min(cur[0], mn)
                        if mx is not None:
                            cur[1] = mx if cur[1] is None else max(cur[1], mx)
                        cur[2] += nc
            out[f] = {k: tuple(v) for k, v in stats.items()}
        return out

    def _resolve(
        self, snapshot_id: int | None, as_of: str | int | None
    ) -> Snapshot | None:
        if snapshot_id is not None:
            return self.snapshot_by_id(snapshot_id)
        if as_of is not None:
            try:
                return self.snapshot_by_id(int(as_of))
            except (ValueError, TypeError):
                pass
            from datetime import datetime, timezone

            dt = datetime.fromisoformat(str(as_of))
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            return self.snapshot_as_of_timestamp(int(dt.timestamp() * 1000))
        return self.current_snapshot()

    # -- history ops -------------------------------------------------------

    def _rename_forward(self, df: DataFrame, version: int) -> DataFrame:
        """Map a historical-schema DataFrame's column names to the
        current ones by field id (renames only; adds/drops are handled
        by the _align projection that follows)."""
        try:
            old_fields = next(
                h["fields"] for h in self.schema_history()
                if h["version"] == version
            )
        except StopIteration:
            return df  # legacy history without the version → by name
        old_by_id = {f["id"]: f["name"] for f in old_fields if "id" in f}
        new_by_id = {
            f["id"]: f["name"]
            for f in self.meta()["schema"]["fields"]
            if "id" in f
        }
        for fid, old_name in old_by_id.items():
            new_name = new_by_id.get(fid)
            if new_name and new_name != old_name and old_name in df.columns:
                df = df.withColumnRenamed(old_name, new_name)
        return df

    def scan_conformed(self, snapshot_id: int) -> DataFrame:
        """Snapshot scan projected onto the CURRENT schema: renamed
        columns map forward by field id (_rename_forward), dropped
        columns vanish and added columns read as typed NULLs (_align).
        The shape snapshot comparisons (diff/CDC/incremental) need —
        two snapshots straddling a schema change would otherwise have
        mismatched column sets."""
        df = self.scan(snapshot_id=snapshot_id)
        snap = self.snapshot_by_id(snapshot_id)
        version = self._snapshot_schema_version(snap)
        return self._align(self._rename_forward(df, version))

    def snapshot_diff(
        self, from_snapshot: int, to_snapshot: int
    ) -> dict[str, DataFrame]:
        """added = to EXCEPT from; deleted = from EXCEPT to — distinct
        semantics, matching SQL EXCEPT (reference catalog.py:349-356).
        Both sides conform to the current schema, so diffs spanning a
        schema change compare on the surviving columns."""
        df_from = self.scan_conformed(from_snapshot)
        df_to = self.scan_conformed(to_snapshot)
        return {
            "added": df_to.distinct().exceptAll(df_from.distinct()),
            "deleted": df_from.distinct().exceptAll(df_to.distinct()),
        }

    def resolve_snapshot_ref(self, ref: str | int) -> Snapshot:
        """Resolve a snapshot-id-or-ISO-timestamp reference (reference
        catalog.py:378-404 _resolve_snapshot_id); raises on junk."""
        try:
            return self.snapshot_by_id(int(ref))
        except (ValueError, TypeError):
            pass
        try:
            from datetime import datetime, timezone

            dt = datetime.fromisoformat(str(ref))
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            return self.snapshot_as_of_timestamp(int(dt.timestamp() * 1000))
        except ValueError:
            pass
        raise ValueError(f"Cannot resolve snapshot reference: {ref}")

    def snapshot_diff_report(
        self, from_ref: str | int, to_ref: str | int | None = None, max_rows: int = 1000
    ) -> dict:
        """Reference-shaped diff (catalog.py:291-376): refs may be
        snapshot ids or ISO timestamps, ``to`` defaults to current,
        same-snapshot short-circuits. Summary counts are exact
        distributed aggregates; detail rows are capped at ``max_rows``
        (the reference collects everything — unusable at scale)."""
        from_id = self.resolve_snapshot_ref(from_ref).snapshot_id
        if to_ref is not None:
            to_id = self.resolve_snapshot_ref(to_ref).snapshot_id
        else:
            cur = self.current_snapshot()
            to_id = cur.snapshot_id if cur else None
        empty = {
            "added": [], "deleted": [], "modified": [],
            "summary": {"added": 0, "deleted": 0, "modified": 0},
            "from_snapshot_id": from_id, "to_snapshot_id": to_id,
        }
        if from_id == to_id or to_id is None:
            return empty
        d = self.snapshot_diff(from_id, to_id)
        added_n, deleted_n = d["added"].count(), d["deleted"].count()
        return {
            **empty,
            "added": [r.asDict() for r in d["added"].limit(max_rows).collect()],
            "deleted": [r.asDict() for r in d["deleted"].limit(max_rows).collect()],
            "summary": {"added": added_n, "deleted": deleted_n, "modified": 0},
        }

    def rollback(self, snapshot_id: int | None = None, as_of: str | None = None) -> Snapshot:
        """Reference semantics (catalog.py:834-906): scan at target and
        overwrite current — a *new* restoring snapshot, not a metadata
        rewind, so audit history is preserved. A target is required
        (reference raises on a parameterless rollback)."""
        if snapshot_id is None and as_of is None:
            raise ValueError("rollback requires snapshot_id or as_of")
        target = self._resolve(snapshot_id, as_of)
        if target is None:
            raise ValueError("no snapshot to roll back to")
        cur = self.current_snapshot()
        if cur is not None and cur.snapshot_id == target.snapshot_id:
            # already at target: no restoring commit (reference returns
            # "no rollback needed", tests/test_snapshots.py:63-71)
            return cur
        target_version = self._snapshot_schema_version(target)
        cur_version = self.meta().get("schema", {}).get("version", 1)
        if target_version != cur_version:
            # the target's files physically carry a DIFFERENT schema
            # (e.g. pre-rename column names) — a file-reference commit
            # would make the live table read them with current names
            # (all-NULL renamed columns). Do the reference's physical
            # restore instead: scan at target (historical schema),
            # map renamed columns forward by field id, rewrite.
            aligned = self.scan_conformed(target.snapshot_id)
            new_files = self._materialize(aligned)
            return self._commit(
                "rollback", new_files,
                {"restored_snapshot": target.snapshot_id,
                 "added_files": len(new_files)},
            )
        return self._commit(
            "rollback", target.files,
            {"restored_snapshot": target.snapshot_id},
            delete_files=list(target.delete_files),
            eq_delete_files=list(target.eq_delete_files),
            file_seqs_override=dict(target.file_seqs),
        )

    # -- maintenance (reference catalog.py:909-2189, G10-G16) -------------

    def expire_snapshots(
        self,
        older_than_ms: int | None = None,
        retain_last: int | None = None,
        dry_run: bool = False,
        older_than: str | None = None,
        grace_seconds: int = 300,
    ) -> dict:
        """``older_than`` accepts the reference's string forms — a
        duration like '30d'/'24h'/'90m' or an ISO timestamp — and maps
        to ``older_than_ms``. At least one criterion is required
        (reference raises on a parameterless expire).

        ``grace_seconds`` guards the implicit file deletion: data files
        younger than the window are never deleted even if currently
        unreferenced, because a concurrent append materializes its
        files before acquiring the commit lock (see
        ``_delete_unreferenced``). Tests that need immediate physical
        cleanup pass 0."""
        if older_than is not None:
            older_than_ms = _cutoff_ms(older_than)
        if older_than_ms is None and retain_last is None:
            raise ValueError(
                "expire_snapshots requires older_than/older_than_ms or retain_last"
            )
        def _plan(snaps):
            keep_ids = {snaps[-1].snapshot_id}  # never current
            # refs retain their targets (Iceberg: branch heads and
            # tagged snapshots never expire while the ref lives) —
            # including pinned main, which may not be the log tail
            refs = self._refs()
            keep_ids.update(
                t for t in refs["branches"].values() if t is not None
            )
            keep_ids.update(
                t for t in refs["tags"].values() if t is not None
            )
            if retain_last:
                keep_ids.update(s.snapshot_id for s in snaps[-retain_last:])
            expired = [
                s
                for s in snaps[:-1]
                if s.snapshot_id not in keep_ids
                and (older_than_ms is None or s.timestamp_ms < older_than_ms)
            ]
            return expired, [s for s in snaps if s not in expired]

        if dry_run:
            snaps = self.snapshots()
            if not snaps:
                return {"expired": [], "kept": []}
            expired, kept = _plan(snaps)
        else:
            # the rewrite of the snapshot log is a read-modify-write:
            # take the commit lock so a concurrent commit can't be
            # erased between our read and our write
            with self._commit_lock():
                snaps = self.snapshots()
                if not snaps:
                    return {"expired": [], "kept": []}
                expired, kept = _plan(snaps)
                if expired:
                    _atomic_write_json(
                        self._snap_path, [s.to_json() for s in kept]
                    )
            # physical deletion OUTSIDE the lock (the data-dir walk can
            # be long — holding the lock past stale_s would let waiters
            # declare it abandoned) and UNCONDITIONAL (not gated on this
            # call expiring anything): files a previous expire skipped
            # under the grace window are reclaimed once they age out. A
            # commit landing mid-deletion only references either its own
            # fresh files (grace-shielded) or files of live snapshots
            # (in the reference set); rollback to an expired snapshot
            # fails on resolution, never resurrects deleted refs.
            self._delete_unreferenced(grace_seconds)
        return {
            "expired": [s.snapshot_id for s in expired],
            "kept": [s.snapshot_id for s in kept],
        }

    def _walk_data_and_deletes(self):
        """os.walk over both file stores — data/ and the MoR deletes/
        dir — so orphan report/cleanup see unreferenced delete files
        too (expired snapshots release them like data files)."""
        for sub in ("data", "deletes"):
            yield from os.walk(os.path.join(self.root, sub))

    def _referenced_files(self) -> set[str]:
        refs: set[str] = set()
        for s in self.snapshots():
            refs.update(s.files)
            refs.update(s.delete_files)
            refs.update(d["path"] for d in s.eq_delete_files)
        return refs

    def _delete_unreferenced(self, grace_seconds: int = 0) -> list[str]:
        """Physically delete data files referenced by no snapshot.

        ``grace_seconds`` protects in-flight writers: a concurrent
        append materializes its parquet files BEFORE taking the commit
        lock, so for that window they are unreferenced — deleting them
        would corrupt the table the moment the writer commits. Files
        younger than the grace window are skipped (Iceberg's orphan
        grace period); 0 means delete immediately (explicit
        user-invoked cleanup, and tests)."""
        refs = self._referenced_files()
        removed = []
        now = time.time()
        for dirpath, _d, filenames in self._walk_data_and_deletes():
            for fn in filenames:
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, self.root)
                if not fn.endswith((".parquet", ".orc")) or rel in refs:
                    continue
                try:
                    if grace_seconds and now - os.stat(full).st_mtime < grace_seconds:
                        continue  # possibly an uncommitted writer's file
                    os.remove(full)
                except FileNotFoundError:
                    continue
                removed.append(rel)
        if removed:  # keep the stats map in step with the data files
            # under the commit lock: this is a read-modify-write of the
            # base stats map, and _consolidate_stats serializes its own
            # RMW on the same lock — unlocked, an interleaved expire
            # could overwrite a just-consolidated base with its pre-merge
            # read, dropping every merged shard's stats. Contention is
            # non-fatal: stale entries for DELETED files are never read
            # (pruning only consults files in a snapshot), so skipping
            # the cleanup just wastes a little space until the next pass.
            try:
                lock = self._commit_lock(timeout_s=5.0)
                lock.__enter__()
            except CommitConflictError:
                return removed
            try:
                stored = _read_json(self._stats_path, {})
                for rel in removed:
                    stored.pop(rel, None)
                _atomic_write_json(self._stats_path, stored)
                removed_set = set(removed)
                if os.path.isdir(self._stats_dir):
                    for fn in os.listdir(self._stats_dir):
                        if not fn.endswith(".json"):
                            continue
                        sp = os.path.join(self._stats_dir, fn)
                        shard = _read_json(sp, {})
                        kept = {
                            k: v for k, v in shard.items()
                            if k not in removed_set
                        }
                        if len(kept) != len(shard):
                            if kept:
                                _atomic_write_json(sp, kept)
                            else:
                                os.remove(sp)
            finally:
                lock.__exit__(None, None, None)
        return removed

    def orphan_files(self, grace_seconds: int = 0) -> list[str]:
        """Data files referenced by no snapshot. ``grace_seconds``
        excludes files younger than the window — an in-flight append
        materializes its parquet BEFORE taking the commit lock, and
        during that window its files look orphaned (same shield as
        ``_delete_unreferenced``). 0 = report everything (explicit
        user-invoked inspection, reference parity)."""
        refs = self._referenced_files()
        orphans = []
        now = time.time()
        for dirpath, _d, filenames in self._walk_data_and_deletes():
            for fn in filenames:
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, self.root)
                if not fn.endswith((".parquet", ".orc")) or rel in refs:
                    continue
                try:
                    if grace_seconds and now - os.stat(full).st_mtime < grace_seconds:
                        continue
                except OSError:
                    continue
                orphans.append(rel)
        return sorted(orphans)

    def cleanup_orphans(
        self, dry_run: bool = True, grace_seconds: int = 0
    ) -> list[str]:
        """Automated callers (governance maintenance) MUST pass a
        positive ``grace_seconds`` — deleting a concurrent writer's
        not-yet-committed files corrupts the table the moment it
        commits. The 0 default preserves the reference's immediate
        semantics for the explicit user-invoked path.

        Non-dry-run delegates to ``_delete_unreferenced``: one deletion
        code path, which also keeps the stats map in step (deleting a
        file without dropping its stats entry would leak a stale entry
        per orphan for the table's lifetime)."""
        if dry_run:
            return self.orphan_files(grace_seconds)
        return sorted(self._delete_unreferenced(grace_seconds))

    def cleanup_orphans_report(
        self, dry_run: bool = True, grace_seconds: int = 0
    ) -> dict:
        """Reference-shaped orphan cleanup result (reference
        catalog.py:2131-2189: found/removed/bytes_reclaimed/files).
        ``grace_seconds`` shields files younger than the window from
        both the listing and the delete (see ``cleanup_orphans``)."""
        orphans = self.orphan_files(grace_seconds)
        size = sum(
            os.path.getsize(os.path.join(self.root, f))
            for f in orphans
            if os.path.exists(os.path.join(self.root, f))
        )
        removed = (
            0
            if dry_run
            else len(
                self.cleanup_orphans(dry_run=False, grace_seconds=grace_seconds)
            )
        )
        return {
            "orphan_files_found": len(orphans),
            "orphan_files_removed": removed,
            "bytes_reclaimed": 0 if dry_run else size,
            "dry_run": dry_run,
            "files": orphans,
        }

    def maintenance_status(self) -> dict:
        """Reference maintenance_status fields (catalog.py:2087-2128)."""
        fs = self.file_stats()
        orphans = self.orphan_files()
        orphan_bytes = sum(
            os.path.getsize(os.path.join(self.root, f))
            for f in orphans
            if os.path.exists(os.path.join(self.root, f))
        )
        cur = self.current_snapshot()
        return {
            "table": f"{self.namespace}.{self.table}",
            "data_files": fs["file_count"],
            "total_size_bytes": fs["total_bytes"],
            "avg_file_size": fs["avg_bytes"],
            "snapshots": fs["snapshot_count"],
            "orphan_files": len(orphans),
            "orphan_bytes": orphan_bytes,
            # merge-on-read debt: pending position-delete files compact()
            # would fold — the rewrite-scheduling signal for MoR tables
            "delete_files": len(cur.delete_files) if cur else 0,
            "eq_delete_files": len(cur.eq_delete_files) if cur else 0,
        }

    def _file_row_counts(self, files: list[str]) -> int | None:
        """Sum footer row counts (parquet/orc); None when unreadable."""
        total = 0
        for f in files:
            p = os.path.join(self.root, f)
            if not os.path.exists(p):
                return None
            try:
                if f.endswith(".parquet"):
                    import pyarrow.parquet as pq

                    total += pq.ParquetFile(p).metadata.num_rows
                elif f.endswith(".orc"):
                    import pyarrow.orc as po

                    total += po.ORCFile(p).nrows
                else:
                    return None
            except Exception:  # noqa: BLE001 — counts are best-effort
                return None
        return total

    def compact(
        self,
        target_partitions: int | None = None,
        sort_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        where: str | None = None,
    ) -> dict:
        """Small-file compaction: rewrite current snapshot into fewer
        files (reference catalog.py:2014-2084 reads-all-and-overwrites;
        we coalesce to a target partition count — on a cluster this is
        the rewrite_data_files equivalent).

        ``sort_by`` additionally *clusters* the rewrite (Iceberg
        rewrite_data_files sort-order strategy): repartitionByRange on
        the sort key gives files disjoint key ranges, then
        sortWithinPartitions tightens row-group stats. That is what
        makes stats-based pruning (scan(filter=), plans/pruning.py)
        bite: after clustering on a key, a point/range predicate on it
        keeps O(1) of the files instead of all of them.

        ``zorder_by`` interleaves the bits of several columns' rank
        positions into one Z-value and clusters on THAT (Iceberg/Delta
        Z-ORDER): every listed column gets locality, so predicates on
        any of them prune — a linear sort only serves its leading
        column. Numeric/date/timestamp columns map to 16-bit positions
        by min-max scaling (one tiny agg job); other types hash into
        the same domain (equality locality only).

        ``where`` makes the rewrite PARTIAL (Iceberg rewrite_data_files
        filter): only the files whose persisted stats intersect the
        predicate are read and rewritten — rows are never dropped; the
        predicate selects FILES, not rows — and every other file
        carries into the new snapshot by reference. At 100 TB this is
        the difference between compacting one hot day's small-file
        debt and rewriting the table; a maintenance job can walk
        partitions incrementally, each pass an independent CAS commit.
        Pending MoR deletes of rewritten files are folded (the subset
        is read through the delete-merged reader); deletes of kept
        files stay live via inheritance."""
        cur = self.current_snapshot()
        before = len(cur.files) if cur else 0
        if before == 0:
            # reference no-ops on an empty table instead of committing
            # an empty snapshot (tests/test_maintenance.py:52-59)
            return {
                "files_before": 0, "files_after": 0, "rows": 0,
                "message": "table is empty — nothing to compact",
            }
        keep_files: list[str] = []
        rewrite_n = before
        if where:
            cand, _total = self.prune_files(where, cur)
            if not cand:
                return {
                    "files_before": before, "files_after": before,
                    "rows": 0, "snapshot_id": cur.snapshot_id,
                    "message": "no files match the predicate — "
                               "nothing to compact",
                }
            cand_set = set(cand)
            keep_files = [f for f in cur.files if f not in cand_set]
            rewrite_n = len(cand)
            df = self.scan_files(cand, merge_snapshot=cur)
        else:
            df = self.scan(snapshot_id=cur.snapshot_id)  # pinned for the CAS below
        pfields = self.partition_fields()
        if sort_by and zorder_by:
            raise ValueError("pass sort_by or zorder_by, not both")
        if zorder_by:
            n = target_partitions or max(1, min(rewrite_n, 4))
            z = _zvalue(df, zorder_by)
            df = (
                df.withColumn("_z", z)
                .repartitionByRange(n, "_z")
                .sortWithinPartitions("_z")
                .drop("_z")
            )
        elif sort_by:
            n = target_partitions or max(1, min(rewrite_n, 4))
            df = df.repartitionByRange(n, *sort_by).sortWithinPartitions(*sort_by)
        elif target_partitions:
            df = df.coalesce(target_partitions)
        elif pfields:
            # cluster rows so each partition value lands in one task →
            # one output file per partition directory
            df = df.repartition(*[pf.expr() for pf in pfields])
        else:
            df = df.coalesce(max(1, min(rewrite_n, 4)))
        # CAS: the rewrite reads the files of `cur`; a commit that lands
        # mid-compaction must surface as a conflict, not vanish
        if where:
            snap = self.replace_files(
                keep_files, df,
                {"operation_detail": "compact_where", "predicate": where},
                expected_snapshot_id=cur.snapshot_id,
            )
        else:
            snap = self.overwrite(df, expected_snapshot_id=cur.snapshot_id)
        return {
            "files_before": before,
            "files_after": len(snap.files),
            "rows": self._file_row_counts(snap.files),
            "snapshot_id": snap.snapshot_id,
            "message": f"Compacted {before} → {len(snap.files)} files",
            **({"clustered_by": sort_by} if sort_by else {}),
            **({"zordered_by": zorder_by} if zorder_by else {}),
            **({"predicate": where, "rewritten_files": rewrite_n}
               if where else {}),
        }

    def file_stats(self) -> dict:
        cur = self.current_snapshot()
        files = cur.files if cur else []
        sizes = [
            os.path.getsize(os.path.join(self.root, f))
            for f in files
            if os.path.exists(os.path.join(self.root, f))
        ]
        return {
            "file_count": len(files),
            "total_bytes": sum(sizes),
            "avg_bytes": (sum(sizes) // len(sizes)) if sizes else 0,
            "snapshot_count": len(self.snapshots()),
            "orphan_count": len(self.orphan_files()),
        }

    def partition_stats(self) -> list[dict]:
        """Per-partition file count + bytes, parsed from partition dirs
        (reference catalog.py:2415-2486 parses paths after /data/)."""
        cur = self.current_snapshot()
        if cur is None:
            return []
        agg: dict[str, dict] = {}
        for f in cur.files:
            parts = [p for p in f.split(os.sep)[2:-1] if "=" in p]
            key = "/".join(parts) if parts else "<unpartitioned>"
            e = agg.setdefault(key, {"partition": key, "file_count": 0, "bytes": 0})
            e["file_count"] += 1
            p = os.path.join(self.root, f)
            if os.path.exists(p):
                e["bytes"] += os.path.getsize(p)
        return sorted(agg.values(), key=lambda d: d["partition"])

    # -- zero-copy onboarding -------------------------------------------------

    def add_files(self, paths: list[str], link: bool = True) -> "Snapshot":
        """Zero-copy import (Iceberg ``add_files`` / migrate analogue):
        register EXISTING parquet files as one append commit without
        reading or rewriting their data — at 100 TB, onboarding a
        directory someone else already wrote is a metadata operation,
        not a copy job. Files are hardlinked into the table's data dir
        (``link=True``; silently falls back to copy across
        filesystems), their footers feed the same per-file min/max
        stats shard every write records (so stats pruning works on
        adopted files exactly like native ones), and the commit is a
        plain delta append under the usual lock.

        The files' schema must match the table schema exactly (name ->
        type); a mismatched file would poison every future scan, so
        this validates BEFORE anything is linked. Partitioned tables
        are rejected: adopted files lack the hidden-partition directory
        layout that partition-wise operations (overwrite_partitions,
        partition_stats) parse — import into an unpartitioned table or
        rewrite through append()."""
        if self.partition_fields():
            raise ValueError(
                "add_files requires an unpartitioned table (adopted "
                "files lack the hidden-partition directory layout); "
                "import through append() instead"
            )
        fmt = self.write_format()
        if fmt != "parquet":
            raise ValueError("add_files supports parquet tables only")
        if not paths:
            raise ValueError("no files to add")
        for p in paths:
            if not os.path.isfile(p):
                raise ValueError(f"not a file: {p}")
            if not p.endswith(".parquet"):
                raise ValueError(f"not a parquet file: {p}")
        # Per-FILE footer check first: spark.read.parquet(*paths) with
        # mergeSchema off infers from ONE footer, so a batch where a
        # single file diverges (missing/extra column, drifted type)
        # would pass a batch-level check and then null-fill or fail at
        # scan time. pyarrow footer reads are driver-side metadata ops
        # (no data IO). Comparison is by NAME -> TYPE, not full Schema
        # equality: Spark's parquet reader resolves columns by name, so
        # files differing only in column order, nullability flags, or
        # footer metadata scan identically and must not be rejected.
        import pyarrow.parquet as pq_meta

        def _shape(path: str) -> list[tuple[str, str]]:
            # sorted MULTISET of (name, type): order-insensitive, but a
            # duplicated column name (legal in parquet, fatal to scans)
            # still shows up as a count difference instead of being
            # collapsed by a dict
            s = pq_meta.read_schema(path)
            return sorted((f.name, str(f.type)) for f in s)

        ref_shape = _shape(paths[0])
        for p in paths[1:]:
            shape = _shape(p)
            if shape != ref_shape:
                raise ValueError(
                    f"file schema drift inside batch: {p} does not "
                    f"match {paths[0]} (got {shape}, expected "
                    f"{ref_shape})"
                )
        incoming = self.spark.read.parquet(paths[0]).schema
        table_fields = {f.name: f.dataType for f in self.schema().fields}
        in_fields = {f.name: f.dataType for f in incoming.fields}
        if in_fields != table_fields:
            extra = sorted(set(in_fields) - set(table_fields))
            missing = sorted(set(table_fields) - set(in_fields))
            drift = sorted(
                n for n in set(in_fields) & set(table_fields)
                if in_fields[n] != table_fields[n]
            )
            raise ValueError(
                "file schema does not match table schema "
                f"(extra: {extra}, missing: {missing}, "
                f"type-mismatch: {drift})"
            )
        sub = f"data/adopted-{uuid.uuid4().hex[:12]}"
        out = os.path.join(self.root, sub)
        os.makedirs(out, exist_ok=True)
        rels = []
        for i, p in enumerate(sorted(paths)):
            dest = os.path.join(out, f"{i:05d}-{os.path.basename(p)}")
            if link:
                try:
                    os.link(p, dest)
                except OSError:
                    shutil.copy2(p, dest)  # cross-device fallback
            else:
                shutil.copy2(p, dest)
            rels.append(os.path.relpath(dest, self.root))
        rels = sorted(rels)
        self._record_file_stats(rels)
        return self._commit(
            "append",
            add_files=rels,
            summary={"added_files": len(rels),
                     "operation_detail": "add_files"},
        )

    # -- ANALYZE (column NDV statistics) ------------------------------------

    def analyze(self, columns: list[str] | None = None) -> dict:
        """ANALYZE TABLE analogue: ONE aggregation pass computing per-
        column approximate distinct counts (HyperLogLog++, rsd 5%) and
        null counts plus the exact row count, persisted per snapshot
        under ``_meta/analyze.json``. These are the optimizer-food
        stats file min/max cannot provide: join-side cardinality for
        broadcast decisions, group-key NDV for aggregate sizing, and
        hot-key skew detection (NDV << rows). One scan regardless of
        column count — every estimator rides the same partial-agg
        shuffle of a single row."""
        cur = self.current_snapshot()
        schema = self.schema()
        known = {f.name for f in schema.fields}
        cols = list(columns) if columns else [f.name for f in schema.fields]
        bad = sorted(set(cols) - known)
        if bad:
            raise ValueError(f"unknown columns: {bad}")
        if cur is None or not cur.files:
            payload = {"snapshot_id": None, "row_count": 0,
                       "columns": {c: {"ndv": 0, "nulls": 0} for c in cols}}
        else:
            df = self.scan(snapshot_id=cur.snapshot_id)
            aggs = [F.count(F.lit(1)).alias("_rows")]
            for c in cols:
                aggs.append(F.approx_count_distinct(c, 0.05).alias(f"_ndv_{c}"))
                aggs.append(
                    F.count(F.when(F.col(c).isNull(), 1)).alias(f"_nul_{c}")
                )
            row = df.agg(*aggs).collect()[0]
            payload = {
                "snapshot_id": cur.snapshot_id,
                "row_count": row["_rows"],
                "columns": {
                    c: {"ndv": int(row[f"_ndv_{c}"]),
                        "nulls": int(row[f"_nul_{c}"])}
                    for c in cols
                },
            }
        payload["computed_at_ms"] = int(time.time() * 1000)
        _atomic_write_json(os.path.join(self.root, "_meta", "analyze.json"),
                           payload)
        return payload

    def analyzed_stats(self) -> dict | None:
        """The last ANALYZE result, with ``stale`` flagged when the
        table has committed past the analyzed snapshot (callers decide
        whether stale NDVs are still useful — they usually are for
        strategy decisions, never for correctness)."""
        p = os.path.join(self.root, "_meta", "analyze.json")
        stats = _read_json(p, None)
        if stats is None:
            return None
        cur = self.current_snapshot()
        stats["stale"] = (
            (cur.snapshot_id if cur else None) != stats.get("snapshot_id")
        )
        return stats

    def partition_stats_report(self) -> dict:
        """Reference get_partition_stats result shape (reference
        catalog.py:2415-2486): per-partition files/size_bytes rows plus
        total_partitions; unpartitioned tables short-circuit with the
        reference message."""
        base = {
            "table": f"{self.namespace}.{self.table}",
            "is_partitioned": bool(self.partition_fields()),
        }
        if not base["is_partitioned"]:
            return {
                **base,
                "partitions": [],
                "total_partitions": 0,
                "message": "Table is not partitioned",
            }
        partitions = [
            {"partition": s["partition"], "files": s["file_count"],
             "size_bytes": s["bytes"]}
            for s in self.partition_stats()
        ]
        return {
            **base,
            "partitions": partitions,
            "total_partitions": len(partitions),
            "message": f"{len(partitions)} partition(s)",
        }

    # -- schema evolution (reference schema_evolution.py, G18) ------------

    def add_column(self, name: str, type_name: str) -> None:
        if type_name not in _TYPE_MAP:
            raise ValueError(f"Unsupported column type '{type_name}'")
        meta = self.meta()
        self._ensure_field_ids(meta)
        fields = meta["schema"]["fields"]
        if any(f["name"] == name for f in fields):
            raise ValueError(f"column {name!r} already exists")
        fid = meta["schema"]["last_field_id"] + 1
        fields.append(
            {"name": name, "type": _TYPE_MAP[type_name].simpleString(), "id": fid}
        )
        meta["schema"]["last_field_id"] = fid
        self._bump_schema(meta, fields)

    def _guard_partition_source(self, name: str, action: str) -> None:
        """Dropping/renaming a partition-source column would break every
        later write (the partition expression references the old name) —
        forbid it, like Iceberg forbids dropping partition source
        fields. Evolving the spec itself is a separate operation."""
        if any(pf.column == name for pf in self.partition_fields()):
            raise ValueError(
                f"cannot {action} column {name!r}: it is a partition "
                "source column"
            )

    def drop_column(self, name: str) -> None:
        meta = self.meta()
        self._ensure_field_ids(meta)  # ids are never reused after a drop
        self._guard_partition_source(name, "drop")
        fields = [f for f in meta["schema"]["fields"] if f["name"] != name]
        if len(fields) == len(meta["schema"]["fields"]):
            raise ValueError(f"column {name!r} does not exist")
        self._bump_schema(meta, fields)

    def rename_column(self, old: str, new: str) -> None:
        meta = self.meta()
        self._ensure_field_ids(meta)
        fields = meta["schema"]["fields"]
        if not any(f["name"] == old for f in fields):
            raise ValueError(f"column {old!r} does not exist")
        if any(f["name"] == new for f in fields):
            raise ValueError(f"column {new!r} already exists")
        self._guard_partition_source(old, "rename")
        # the field keeps its id through the rename (Iceberg semantics —
        # schema diffs report it as a rename, not drop+add); the data
        # rewrite below is physical because parquet stores names
        df = self.scan().withColumnRenamed(old, new)
        for f in fields:
            if f["name"] == old:
                f["name"] = new
        self._bump_schema(meta, fields)
        if self.current_snapshot() is not None:
            self.overwrite(df)

    def _ensure_field_ids(self, meta: dict) -> None:
        """Backfill stable field ids on a table created before ids
        existed: assign positionally once, then every later history
        entry carries them. Pre-backfill history entries keep no ids —
        diffs against those versions fall back to name-based."""
        schema = meta["schema"]
        fields = schema["fields"]
        if all("id" in f for f in fields) and "last_field_id" in schema:
            return
        next_id = 1
        for f in fields:
            if "id" not in f:
                f["id"] = next_id
            next_id = max(next_id, f["id"]) + 1
        schema["last_field_id"] = max((f["id"] for f in fields), default=0)

    def _bump_schema(self, meta: dict, fields: list[dict]) -> None:
        meta["schema"]["fields"] = fields
        meta["schema"]["version"] = meta["schema"].get("version", 1) + 1
        meta.setdefault("schema_history", []).append(
            {
                "version": meta["schema"]["version"],
                "fields": [dict(f) for f in fields],
                "ts": int(time.time() * 1000),
            }
        )
        self._write_meta(meta)

    def schema_history(self) -> list[dict]:
        return self.meta().get("schema_history", [])

    # -- metadata tables (PyIceberg-style inspect surface; reference
    # catalog.py:204-237 exposes snapshots/files/history via PyIceberg.
    # Metadata is O(snapshots + files) — driver-small by construction,
    # like Iceberg's own avro metadata; the DataFrames are queryable
    # alongside data tables) -----------------------------------------------

    def snapshots_df(self) -> DataFrame:
        """``<table>__snapshots``: one row per snapshot in the log."""
        schema = T.StructType(
            [
                T.StructField("snapshot_id", T.LongType()),
                T.StructField("parent_id", T.LongType()),
                T.StructField("committed_at", T.TimestampType()),
                T.StructField("operation", T.StringType()),
                T.StructField("file_count", T.IntegerType()),
                T.StructField("summary", T.MapType(T.StringType(), T.StringType())),
            ]
        )
        from datetime import datetime, timezone

        rows = [
            (
                s.snapshot_id,
                s.parent_id,
                datetime.fromtimestamp(s.timestamp_ms / 1000, tz=timezone.utc),
                s.operation,
                len(s.files),
                {k: str(v) for k, v in s.summary.items()},
            )
            for s in self.snapshots()
        ]
        return self.spark.createDataFrame(rows, schema)

    def files_df(self, snapshot_id: int | None = None) -> DataFrame:
        """``<table>__files``: one row per data file of a snapshot
        (default current): path, format, size, partition, min/max stats
        when recorded."""
        schema = T.StructType(
            [
                T.StructField("file_path", T.StringType()),
                T.StructField("file_format", T.StringType()),
                T.StructField("size_bytes", T.LongType()),
                T.StructField("partition", T.StringType()),
                T.StructField("snapshot_id", T.LongType()),
                T.StructField(
                    "column_stats",
                    T.MapType(
                        T.StringType(),
                        T.StructType(
                            [
                                T.StructField("min", T.StringType()),
                                T.StructField("max", T.StringType()),
                                T.StructField("null_count", T.LongType()),
                            ]
                        ),
                    ),
                ),
            ]
        )
        snap = (
            self.snapshot_by_id(snapshot_id)
            if snapshot_id is not None
            else self.current_snapshot()
        )
        if snap is None:
            return self.spark.createDataFrame([], schema)
        stats = self._file_column_stats(snap)
        rows = []
        for f in snap.files:
            p = os.path.join(self.root, f)
            parts = [seg for seg in f.split(os.sep)[2:-1] if "=" in seg]
            rows.append(
                (
                    f,
                    "orc" if f.endswith(".orc") else "parquet",
                    os.path.getsize(p) if os.path.exists(p) else 0,
                    "/".join(parts) if parts else None,
                    snap.snapshot_id,
                    {
                        c: (str(mn) if mn is not None else None,
                            str(mx) if mx is not None else None,
                            nc)
                        for c, (mn, mx, nc) in stats.get(f, {}).items()
                    }
                    or None,
                )
            )
        return self.spark.createDataFrame(rows, schema)

    def history_df(self) -> DataFrame:
        """``<table>__history``: Iceberg-style current-ancestor chain."""
        schema = T.StructType(
            [
                T.StructField("made_current_at", T.TimestampType()),
                T.StructField("snapshot_id", T.LongType()),
                T.StructField("parent_id", T.LongType()),
                T.StructField("is_current_ancestor", T.BooleanType()),
            ]
        )
        from datetime import datetime, timezone

        snaps = self.snapshots()
        ancestors: set[int] = set()
        by_id = {s.snapshot_id: s for s in snaps}
        cur = snaps[-1].snapshot_id if snaps else None
        while cur is not None and cur in by_id:
            ancestors.add(cur)
            cur = by_id[cur].parent_id
        rows = [
            (
                datetime.fromtimestamp(s.timestamp_ms / 1000, tz=timezone.utc),
                s.snapshot_id,
                s.parent_id,
                s.snapshot_id in ancestors,
            )
            for s in snaps
        ]
        return self.spark.createDataFrame(rows, schema)

    def refs_df(self) -> DataFrame:
        """``<table>__refs``: Iceberg refs metadata table — one row per
        named ref (main + branches + tags) with its resolved head."""
        schema = T.StructType(
            [
                T.StructField("name", T.StringType()),
                T.StructField("type", T.StringType()),
                T.StructField("snapshot_id", T.LongType()),
            ]
        )
        refs = self.list_refs()
        rows = [
            (n, "BRANCH", sid) for n, sid in sorted(refs["branches"].items())
        ] + [(n, "TAG", sid) for n, sid in sorted(refs["tags"].items())]
        return self.spark.createDataFrame(rows, schema)

    def delete_files_df(self, snapshot_id: int | None = None) -> DataFrame:
        """``<table>__delete_files``: one row per live delete file of a
        snapshot (default current), both Iceberg v2 kinds — position
        deletes (content='POSITION_DELETES') and equality deletes
        (content='EQUALITY_DELETES', with their key columns and the
        data sequence that bounds which data files they apply to)."""
        schema = T.StructType(
            [
                T.StructField("file_path", T.StringType()),
                T.StructField("content", T.StringType()),
                T.StructField("size_bytes", T.LongType()),
                T.StructField("equality_columns", T.ArrayType(T.StringType())),
                T.StructField("data_sequence", T.LongType()),
                T.StructField("snapshot_id", T.LongType()),
            ]
        )
        snap = (
            self.snapshot_by_id(snapshot_id)
            if snapshot_id is not None
            else self.current_snapshot()
        )
        if snap is None:
            return self.spark.createDataFrame([], schema)

        def _size(rel: str) -> int:
            p = os.path.join(self.root, rel)
            return os.path.getsize(p) if os.path.exists(p) else 0

        rows = [
            (f, "POSITION_DELETES", _size(f), None, None, snap.snapshot_id)
            for f in snap.delete_files
        ] + [
            (d["path"], "EQUALITY_DELETES", _size(d["path"]),
             list(d["cols"]), int(d["seq"]), snap.snapshot_id)
            for d in snap.eq_delete_files
        ]
        return self.spark.createDataFrame(rows, schema)

    def partitions_df(self) -> DataFrame:
        """``<table>__partitions``: per-partition file count + bytes of
        the current snapshot (driver-side dir-name parse, same source
        as ``partition_stats``)."""
        schema = T.StructType(
            [
                T.StructField("partition", T.StringType()),
                T.StructField("file_count", T.IntegerType()),
                T.StructField("size_bytes", T.LongType()),
            ]
        )
        rows = [
            (e["partition"], e["file_count"], e["bytes"])
            for e in self.partition_stats()
        ]
        return self.spark.createDataFrame(rows, schema)


def _parse_type(s: str) -> T.DataType:
    mapping = {
        "string": T.StringType(),
        "bigint": T.LongType(),
        "long": T.LongType(),
        "int": T.IntegerType(),
        "double": T.DoubleType(),
        "float": T.FloatType(),
        "timestamp_ntz": T.TimestampNTZType(),
        "timestamp": T.TimestampType(),
        "date": T.DateType(),
        "boolean": T.BooleanType(),
    }
    if s in mapping:
        return mapping[s]
    # array/struct etc. — delegate to Spark's DDL parser
    return T._parse_datatype_string(s)  # noqa: SLF001


