"""Python Data Source (Spark 4 ``pyspark.sql.datasource``) exposing
lakehouse tables as a first-class Spark format:

    spark.dataSource.register(LakehouseDataSource)
    df = (spark.read.format("lakehouse")
          .option("warehouse", wh).load("default.orders"))
    st = (spark.readStream.format("lakehouse")
          .option("warehouse", wh).load("default.orders"))

Why this exists when ``LakeTable.scan()`` is already the fast path:
the data source is the *interoperability* surface. Any Spark session
with this package installed reads the table with no catalog object,
gets snapshot isolation (the snapshot is pinned at planning time,
concurrent commits cannot tear a read), stats-based file pruning wired
into Spark's own filter pushdown, and — the piece plain Spark cannot
express over the snapshot-log format — an incremental STREAMING source
that tails the commit log (the Iceberg/Delta "table as a stream
source" pattern; reference analogue: none — the reference reads its
tables through PyIceberg + DuckDB's iceberg extension,
src/lakehouse/query.py, and has no streaming surface at all).

Scale posture:

* Planning is driver-side metadata only — JSON snapshot log plus the
  persisted per-file min/max stats. No file listing, no footer
  round-trips; a selective predicate prunes whole files before a
  single byte of data is opened (``pushFilters`` reuses
  ``plans/pruning.py`` verbatim, so batch pruning semantics are
  byte-identical to ``LakeTable.scan``). Every filter is also
  RETURNED as unsupported, so Spark re-applies the exact predicate —
  pruning can only shrink I/O, never change results.
* Each surviving data file is one ``InputPartition`` read in the
  executors via Arrow batches — parallelism = files, the same unit
  the JVM scan path uses.
* Merge-on-read position/equality deletes are resolved at planning
  time from the broadcast-small delete files (small by MoR's premise;
  ``compact()`` folds them when they accumulate) and applied per
  Arrow batch in the reader — a plain anti-join semantics rendered as
  a boolean mask.

Streaming semantics (append tail): each micro-batch covers the
snapshot range ``(start, end]`` along the MAIN parent chain; an
additive commit contributes exactly the files it added (MoR
delete-only commits add no data files and emit nothing; MoR updates
emit their re-inserted rows — Delta's ``ignoreChanges`` behavior).
A rewriting commit (overwrite / CoW update / compact / rollback)
breaks append-only semantics: ``on_rewrite=fail`` (default) raises,
``on_rewrite=skip`` ignores that commit's changes. Offsets are
snapshot ids — monotonic by construction (the log allocates
``last+1``), so restart resume is exact.

``read_changes=true`` turns the stream into a CHANGE DATA FEED (the
Delta CDF / Iceberg changelog-stream analogue, streaming twin of
``governance.cdc.changelog_view``): appends emit ``insert`` events,
MoR position deletes emit ``delete`` events carrying the pre-image
row (read back from the still-present data file at the deleted
positions), MoR updates emit delete+insert pairs, equality deletes
emit the parent-live matching rows (masked by the parent's delete
state so a dead row is never re-emitted). Rows carry
``_change_type`` / ``_commit_snapshot_id`` / ``_change_ordinal``.
All of it is planned from the broadcast-small delete files —
O(changed data) per micro-batch, no diff job.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from urllib.parse import unquote, urlparse

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


# -- metadata access (pure Python: runs on the driver at planning time
# and must not touch a SparkSession) ----------------------------------------


def _truthy(v) -> bool:
    return str(v).lower() in ("true", "1", "yes")


_CDC_FIELDS = [("_change_type", T.StringType()),
               ("_commit_snapshot_id", T.LongType()),
               ("_change_ordinal", T.IntegerType())]


def _read_json(path: str, default):
    try:
        with open(path) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return default


def _table_root(options) -> str:
    wh = options.get("warehouse")
    if not wh:
        raise ValueError("lakehouse source requires option 'warehouse'")
    ident = options.get("table") or options.get("path")
    if not ident or "." not in ident:
        raise ValueError(
            "pass the table as load('namespace.table') or option 'table'")
    ns, name = ident.split(".", 1)
    root = os.path.join(wh, ns, name)
    if not os.path.isfile(os.path.join(root, "_meta", "table.json")):
        raise ValueError(f"not a lakehouse table: {ident!r} under {wh!r}")
    return root


def _meta(root: str) -> dict:
    return _read_json(os.path.join(root, "_meta", "table.json"), {})


def _snapshots(root: str) -> list[dict]:
    return _read_json(os.path.join(root, "_meta", "snapshots.json"), [])


def _refs(root: str) -> dict:
    r = _read_json(os.path.join(root, "_meta", "refs.json"), {})
    r.setdefault("branches", {})
    r.setdefault("tags", {})
    return r


def _main_head(root: str, snaps: list[dict]) -> int | None:
    pinned = _refs(root)["branches"].get("main")
    if pinned is not None:
        return pinned
    return snaps[-1]["snapshot_id"] if snaps else None


def _resolve_snapshot(root: str, options) -> dict | None:
    """Pin the snapshot at planning time (snapshot isolation)."""
    snaps = _snapshots(root)
    if not snaps:
        return None
    sid = options.get("snapshot_id")
    if sid is not None:
        sid = int(sid)
    else:
        ref = options.get("ref")
        if ref is None:
            sid = _main_head(root, snaps)
        else:
            r = _refs(root)
            sid = r["tags"].get(ref, r["branches"].get(ref))
            if sid is None and ref == "main":
                sid = _main_head(root, snaps)
            if sid is None:
                raise ValueError(f"ref {ref!r} not found")
    by_id = {s["snapshot_id"]: s for s in snaps}
    if sid not in by_id:
        raise ValueError(f"snapshot {sid} not found")
    return by_id[sid]


def _fields_to_struct(fields: list[dict]) -> T.StructType:
    from ..catalog import _parse_type

    return T.StructType(
        [T.StructField(f["name"], _parse_type(f["type"]), True)
         for f in fields]
    )


def _snapshot_schema(root: str, snap: dict) -> T.StructType:
    """The snapshot's OWN schema (Iceberg semantics: historical files
    physically carry the column names of their write-time version).
    The head snapshot always reads with the current schema — alters
    without a rewrite bump the version without a new snapshot."""
    meta = _meta(root)
    cur_version = meta.get("schema", {}).get("version", 1)
    head = _main_head(root, _snapshots(root))
    v = snap.get("schema_version")
    if snap["snapshot_id"] == head or v is None or v == cur_version:
        return _fields_to_struct(meta["schema"]["fields"])
    for h in meta.get("schema_history", []):
        if h["version"] == v:
            return _fields_to_struct(h["fields"])
    return _fields_to_struct(meta["schema"]["fields"])


def _stored_stats(root: str) -> dict[str, dict[str, tuple]]:
    """Merged write-time stats map — same merge order as
    ``LakeTable.stored_file_stats`` (catalog.py:1238): base map first,
    newer shards win on rewrite of the same path."""
    merged = _read_json(os.path.join(root, "_meta", "file_stats.json"), {})
    sdir = os.path.join(root, "_meta", "stats")
    if os.path.isdir(sdir):
        for fn in sorted(os.listdir(sdir)):
            if fn.endswith(".json"):
                merged.update(_read_json(os.path.join(sdir, fn), {}))
    return {f: {c: tuple(v) for c, v in cols.items()}
            for f, cols in merged.items()}


# -- filter rendering (V2 Filter objects → the pruning grammar) --------------


def _lit_sql(v) -> str | None:
    import datetime
    import decimal

    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, datetime.datetime):
        return "TIMESTAMP '" + v.isoformat(sep=" ") + "'"
    if isinstance(v, datetime.date):
        return "DATE '" + v.isoformat() + "'"
    return None


def _filter_sql(f) -> str | None:
    """One pushed filter → a conjunct in plans/pruning.py's grammar,
    or None when outside it (nested columns, exotic literals). Only
    used to SHRINK the file list — unsupported shapes just skip."""
    attr = getattr(f, "attribute", None)
    if not attr or len(attr) != 1 or not _IDENT.match(attr[0]):
        return None
    col = attr[0]
    if isinstance(f, IsNull):
        return f"{col} IS NULL"
    if isinstance(f, IsNotNull):
        return f"{col} IS NOT NULL"
    if isinstance(f, In):
        lits = [_lit_sql(v) for v in f.values]
        if lits and all(x is not None for x in lits):
            return f"{col} IN ({', '.join(lits)})"
        return None
    op = {EqualTo: "=", GreaterThan: ">", GreaterThanOrEqual: ">=",
          LessThan: "<", LessThanOrEqual: "<="}.get(type(f))
    if op is None:
        return None
    lit = _lit_sql(f.value)
    return f"{col} {op} {lit}" if lit is not None else None


# -- arrow-side reading ------------------------------------------------------


def _uri_to_path(uri: str) -> str:
    """`_metadata.file_path` URI → filesystem path (delete files record
    the reader-reported URI; partitions carry plain paths)."""
    if "://" in uri or uri.startswith("file:"):
        return unquote(urlparse(uri).path)
    return unquote(uri)


def _read_arrow(path: str):
    import pyarrow.orc as orc
    import pyarrow.parquet as pq

    if path.endswith(".orc"):
        return orc.read_table(path)
    return pq.read_table(path)


def _conform(tbl, arrow_schema):
    """Project a physical Arrow table onto the logical schema: by-name
    match, missing columns null-filled, physical extras (hidden
    partitioning's derived ``_p_*`` columns) dropped — the same
    contract as the JVM reader in ``scan_files``."""
    import pyarrow as pa

    cols = []
    for field in arrow_schema:
        if field.name in tbl.column_names:
            col = tbl.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
        else:
            col = pa.nulls(tbl.num_rows, field.type)
        cols.append(col)
    return pa.table(cols, schema=arrow_schema)


class _FilePart(InputPartition):
    """One data file + the delete/emit state resolved for it at
    planning time. Picklable plain data only — it ships to workers.

    ``kind``:
    * ``data`` — emit the file's rows minus masked deletes (batch
      scan, and stream inserts).
    * ``emit_pos`` — CDF delete events: emit ONLY the rows at
      ``emit_positions`` (a commit's new position-delete keys; those
      rows were live at the parent by construction).
    * ``emit_eq`` — CDF delete events for an equality delete: emit
      rows matching ``emit_keys`` that were live at the parent
      (``del_positions``/``eq_specs`` carry the PARENT's delete state
      as a mask).
    ``stamps`` appends the changelog metadata columns."""

    def __init__(self, path: str, del_positions: list[int] | None,
                 eq_specs: list[tuple[list[str], list[tuple]]] | None,
                 kind: str = "data",
                 stamps: dict | None = None,
                 emit_positions: list[int] | None = None,
                 emit_keys: tuple[list[str], list[tuple]] | None = None):
        self.path = path
        self.del_positions = del_positions or []
        self.eq_specs = eq_specs or []
        self.kind = kind
        self.stamps = stamps
        self.emit_positions = emit_positions or []
        self.emit_keys = emit_keys


def _null_safe_in(tbl, cols: list[str], keys) -> list[bool]:
    """Row-membership mask: tuple equality treats None == None —
    exactly the null-safe match the JVM eq-delete anti-join uses."""
    keyset = set(keys)
    col_lists = [tbl.column(c).to_pylist() for c in cols]
    return [tuple(vals) in keyset for vals in zip(*col_lists)]


def _stamp_columns(tbl, stamps: dict, arrow_schema):
    """Append the changelog metadata columns and re-target the schema
    (the last three fields of ``arrow_schema`` are the stamps)."""
    import pyarrow as pa

    n = tbl.num_rows
    base = arrow_schema.field
    tbl = tbl.append_column(
        base(len(arrow_schema) - 3),
        pa.array([stamps["change_type"]] * n,
                 base(len(arrow_schema) - 3).type))
    tbl = tbl.append_column(
        base(len(arrow_schema) - 2),
        pa.array([stamps["snapshot_id"]] * n,
                 base(len(arrow_schema) - 2).type))
    return tbl.append_column(
        base(len(arrow_schema) - 1),
        pa.array([stamps["ordinal"]] * n,
                 base(len(arrow_schema) - 1).type))


def _read_partition(part: _FilePart, arrow_schema):
    import numpy as np
    import pyarrow as pa

    data_schema = arrow_schema
    if part.stamps is not None:
        import pyarrow as _pa

        data_schema = _pa.schema(list(arrow_schema)[:-3])
    tbl = _read_arrow(part.path)
    if part.kind == "emit_pos":
        pos = [p for p in part.emit_positions if p < tbl.num_rows]
        tbl = tbl.take(pa.array(sorted(pos), type=pa.int64()))
    else:
        if part.del_positions:
            mask = np.ones(tbl.num_rows, dtype=bool)
            pos = np.asarray(part.del_positions, dtype=np.int64)
            mask[pos[pos < tbl.num_rows]] = False
            tbl = tbl.filter(pa.array(mask))
        for cols, keys in part.eq_specs:
            if not all(c in tbl.column_names for c in cols):
                continue
            hit = _null_safe_in(tbl, cols, keys)
            tbl = tbl.filter(pa.array([not h for h in hit], type=pa.bool_()))
        if part.kind == "emit_eq":
            cols, keys = part.emit_keys
            if all(c in tbl.column_names for c in cols):
                tbl = tbl.filter(pa.array(_null_safe_in(tbl, cols, keys), type=pa.bool_()))
            else:
                tbl = tbl.slice(0, 0)
    out = _conform(tbl, data_schema)
    if part.stamps is not None:
        out = _stamp_columns(out, part.stamps, arrow_schema)
    yield from out.to_batches()


def _plan_delete_state(root: str, snap: dict):
    """Resolve the snapshot's delete files into per-data-file state:
    {abs_path: [positions]} and [(applies_to_seq, cols, key_rows)].
    Driver-side, O(delete data) — small by MoR's premise."""
    pos_by_path: dict[str, list[int]] = {}
    for rel in snap.get("delete_files", []):
        t = _read_arrow(os.path.join(root, rel))
        for uri, pos in zip(t.column("_file").to_pylist(),
                            t.column("_pos").to_pylist()):
            pos_by_path.setdefault(
                os.path.normpath(_uri_to_path(uri)), []).append(pos)
    eq_specs: list[tuple[int, list[str], list[tuple]]] = []
    for d in snap.get("eq_delete_files", []):
        t = _read_arrow(os.path.join(root, d["path"]))
        cols = list(d["cols"])
        keys = list(zip(*[t.column(c).to_pylist() for c in cols])) \
            if t.num_rows else []
        eq_specs.append((d["seq"], cols, keys))
    return pos_by_path, eq_specs


def _file_partitions(root: str, snap: dict,
                     files: list[str]) -> list[_FilePart]:
    pos_by_path, eq_specs = _plan_delete_state(root, snap)
    seqs = snap.get("file_seqs", {})
    parts = []
    for rel in files:
        path = os.path.normpath(os.path.join(root, rel))
        eq = [(cols, keys) for seq, cols, keys in eq_specs
              if seq > seqs.get(rel, 0) and keys]
        parts.append(_FilePart(path, pos_by_path.get(path), eq))
    return parts


class _MultiPart(InputPartition):
    """Several coalesced small files read by one task."""

    def __init__(self, parts: list[_FilePart]):
        self.parts = parts


DEFAULT_PARTITION_BYTES = 128 * 1024 * 1024


def _coalesce_parts(parts: list[_FilePart], max_bytes: int):
    """Greedy small-file packing (the `spark.sql.files
    .maxPartitionBytes` analogue): one task per FILE is the right unit
    for large files, but a 10k-small-file table must not become 10k
    tasks — scheduler overhead would dwarf the reads. Files pack into
    partitions up to ``max_bytes``; an unstat-able file gets its own
    partition (conservative)."""
    out: list = []
    cur: list[_FilePart] = []
    size = 0
    for p in parts:
        try:
            sz = os.path.getsize(p.path)
        except OSError:
            sz = max_bytes
        if cur and size + sz > max_bytes:
            out.append(cur[0] if len(cur) == 1 else _MultiPart(cur))
            cur, size = [], 0
        cur.append(p)
        size += sz
    if cur:
        out.append(cur[0] if len(cur) == 1 else _MultiPart(cur))
    return out


# -- the data source ---------------------------------------------------------


class LakehouseBatchReader(DataSourceReader):
    def __init__(self, options, schema: T.StructType):
        self._root = _table_root(options)
        self._snap = _resolve_snapshot(self._root, options)
        self._schema = schema
        self._pruned: list[str] | None = None
        self._max_bytes = int(options.get("max_partition_bytes",
                                          DEFAULT_PARTITION_BYTES))

    def pushFilters(self, filters):
        """Stats-based file pruning through Spark's own pushdown: the
        translatable conjuncts shrink the file list via the SAME
        evaluator the catalog scan uses (plans/pruning.py). Every
        filter is yielded back as unsupported so Spark re-applies the
        exact predicate — pruning is I/O-only, never semantic."""
        if self._snap is not None:
            exprs = [e for e in (_filter_sql(f) for f in filters) if e]
            if exprs:
                from ..plans.pruning import prune_files

                self._pruned = prune_files(
                    self._snap["files"], _stored_stats(self._root),
                    self._schema, " AND ".join(exprs),
                )
        yield from filters

    def partitions(self):
        if self._snap is None:
            return []
        files = (self._pruned if self._pruned is not None
                 else self._snap["files"])
        return _coalesce_parts(
            _file_partitions(self._root, self._snap, files),
            self._max_bytes)

    def read(self, partition):
        from pyspark.sql.pandas.types import to_arrow_schema

        schema = to_arrow_schema(self._schema)
        subs = (partition.parts if isinstance(partition, _MultiPart)
                else [partition])
        for sub in subs:
            yield from _read_partition(sub, schema)


class LakehouseStreamReader(DataSourceStreamReader):
    """Tail the commit log as a micro-batch stream (append semantics;
    see the module docstring for the MoR / rewrite contract)."""

    def __init__(self, options, schema: T.StructType):
        self._root = _table_root(options)
        self._schema = schema
        self._start = int(options.get("starting_snapshot_id", 0))
        self._on_rewrite = (options.get("on_rewrite") or "fail").lower()
        if self._on_rewrite not in ("fail", "skip"):
            raise ValueError("on_rewrite must be 'fail' or 'skip'")
        self._cdc = _truthy(options.get("read_changes"))
        self._max_bytes = int(options.get("max_partition_bytes",
                                          DEFAULT_PARTITION_BYTES))
        # admission control (Delta maxFilesPerTrigger analogue): cap how
        # many NEW data files one micro-batch admits, so a backlog (or a
        # bursty writer) drains as several right-sized batches instead
        # of one giant one. The cursor tracks the last offset this
        # reader handed out or planned. The Python stream API does not
        # pass the checkpoint position into latestOffset, so seeding is
        # FRESH-START ONLY: initialOffset() is called exactly on fresh
        # starts, and there the configured start IS the engine position,
        # so a capped walk from it can never sit behind the checkpoint.
        # On a restart (no initialOffset call) the first batch is
        # unbounded — returning a capped offset computed from the
        # configured start could land BEHIND the engine's checkpoint,
        # and Spark would record it and re-plan already-committed
        # snapshots on the next trigger (duplicate delivery, the one
        # thing worse than a big batch). partitions() locks the cursor
        # onto the true position and every later batch is capped;
        # _planned additionally floors every planned range so a
        # behind-checkpoint start can never re-emit planned files.
        mft = options.get("max_files_per_trigger")
        self._max_files = int(mft) if mft is not None else None
        if self._max_files is not None and self._max_files < 1:
            raise ValueError("max_files_per_trigger must be >= 1")
        self._cursor: int | None = None
        self._fresh_start = False
        self._planned = 0

    def _trace(self, msg: str) -> None:
        import os as _os
        p = _os.environ.get("SPARK_GRAFT_DS_TRACE")
        if p:
            with open(p, "a") as f:
                f.write(f"{id(self)} {msg}\n")

    def initialOffset(self):
        # only ever called on a FRESH start (no checkpoint): the
        # configured start is authoritative, so the admission walk may
        # safely seed from it
        self._trace("initialOffset")
        self._fresh_start = True
        return {"snapshot_id": self._start}

    def latestOffset(self):
        self._trace(f"latestOffset cursor={self._cursor} fresh={self._fresh_start}")
        snaps = _snapshots(self._root)
        head = _main_head(self._root, snaps)
        head = head if head is not None else self._start
        if self._max_files is None:
            return {"snapshot_id": head}
        if self._cursor is None:
            if not self._fresh_start:
                # first call of this reader's life, and the engine has
                # not revealed whether a checkpoint exists (traced
                # protocol: latestOffset is polled BEFORE initialOffset
                # even on fresh starts). Any offset computed from the
                # configured start could land BEHIND a checkpoint —
                # Spark records whatever we return, and after a crash
                # in that window the stream would resume from the
                # regressed offset and re-deliver committed snapshots.
                # head is the only value provably >= every possible
                # checkpoint, so the first batch is unbounded
                # (documented); the cap binds from batch two. Lock the
                # cursor HERE too: if head == checkpoint no batch gets
                # planned (partitions never runs), and without the lock
                # a later burst would still drain uncapped. Duplicate
                # delivery is the one thing worse than a big batch.
                self._cursor = head
                return {"snapshot_id": head}
            # initialOffset() ran before this call, so this is provably
            # a fresh start and the configured start IS the engine
            # position — safe to seed and cap from batch one. NOTE:
            # traced engine behavior (processingTime AND availableNow,
            # Spark 4.1) polls latestOffset BEFORE initialOffset, so in
            # practice the restart branch above handles the first call
            # and this opportunistic seed binds only if a future engine
            # reorders the protocol. It can never be wrong, merely
            # unused.
            self._cursor = self._start
        if head <= self._cursor:
            return {"snapshot_id": self._cursor}
        by_id = {s["snapshot_id"]: s for s in snaps}
        admitted = self._cursor
        budget = self._max_files
        for snap in self._chain(self._cursor, head):
            parent = by_id.get(snap.get("parent_id") or 0)
            prev = set(parent["files"]) if parent else set()
            added = sum(1 for f in snap["files"] if f not in prev)
            if added > budget and admitted != self._cursor:
                break  # batch full — later commits wait their turn
            admitted = snap["snapshot_id"]
            budget -= added
            if budget <= 0:
                break
        self._cursor = admitted
        return {"snapshot_id": admitted}

    def _chain(self, start_id: int, end_id: int) -> list[dict]:
        """Main-branch parent chain covering (start, end] — commit
        order, branch commits excluded by construction.

        A non-zero start offset whose snapshot has been EXPIRED away
        raises instead of silently re-emitting the oldest retained
        snapshot's full file list as 'new' (the Delta/Iceberg
        'offset no longer exists' failure mode). start=0 is the
        stream-from-genesis case: there the oldest retained snapshot's
        files ARE the correct backfill."""
        by_id = {s["snapshot_id"]: s for s in _snapshots(self._root)}
        chain: list[dict] = []
        cur = end_id
        while cur and cur != start_id and cur in by_id:
            chain.append(by_id[cur])
            cur = by_id[cur]["parent_id"] or 0
        if start_id and cur != start_id:
            raise ValueError(
                f"stream offset snapshot {start_id} no longer exists "
                "(expired); restart the stream from a fresh checkpoint")
        chain.reverse()
        return chain

    def partitions(self, start, end):
        self._trace(f"partitions {start} {end}")
        s, e = start["snapshot_id"], end["snapshot_id"]
        # lock the admission cursor onto the engine's actual position
        # (snapshot ids are monotone): after a checkpoint restart the
        # first planned batch teaches the reader where the stream is
        self._cursor = max(self._cursor or 0, s, e)
        # defense in depth against offset rollback: the START of any
        # planned range is by definition already processed, so no later
        # range may re-emit snapshots at or below the highest start
        # seen — even if an anomalous latestOffset ever handed the
        # engine an offset behind its checkpoint, the replayed span
        # plans empty instead of delivering duplicates
        s = max(s, self._planned)
        self._planned = max(self._planned, s, e)
        if e <= s:
            return []
        by_id = {x["snapshot_id"]: x for x in _snapshots(self._root)}
        parts: list[_FilePart] = []
        for ordinal, snap in enumerate(self._chain(s, e), start=1):
            parent = by_id.get(snap.get("parent_id") or 0)
            prev_files = set(parent["files"]) if parent else set()
            removed = prev_files - set(snap["files"])
            if removed and self._on_rewrite == "fail":
                raise ValueError(
                    f"snapshot {snap['snapshot_id']} "
                    f"({snap.get('operation')}) rewrote "
                    f"{len(removed)} file(s); the stream is append-only "
                    "— set on_rewrite=skip to ignore rewrites")
            if removed:
                continue
            stamp = (lambda t, sid=snap["snapshot_id"], o=ordinal:
                     {"change_type": t, "snapshot_id": sid, "ordinal": o}
                     ) if self._cdc else (lambda t: None)
            for rel in snap["files"]:
                if rel not in prev_files:
                    parts.append(_FilePart(
                        os.path.normpath(os.path.join(self._root, rel)),
                        None, None, stamps=stamp("insert")))
            if self._cdc:
                parts.extend(self._cdc_delete_parts(snap, parent, stamp))
        # pack small insert files; each sub-part keeps its own stamps,
        # so packing across commits stays correct in CDF mode
        data = [p for p in parts if p.kind == "data"]
        other = [p for p in parts if p.kind != "data"]
        return _coalesce_parts(data, self._max_bytes) + other

    def _cdc_delete_parts(self, snap: dict, parent: dict | None, stamp):
        """CDF delete events for one additive commit: its NEW position
        keys become emit-rows-at-positions partitions (live at the
        parent by construction — a position can only be deleted once);
        its NEW equality deletes emit parent-live rows matching the
        keys from every file the delete's sequence covers, masked by
        the PARENT's delete state so an already-dead row is never
        re-emitted. All key resolution is the broadcast-small delete
        files — no diff job, O(changed data), the same plan shape as
        governance.cdc.changelog_view."""
        parts: list[_FilePart] = []
        prev_pos = set(parent.get("delete_files", [])) if parent else set()
        new_pos = [d for d in snap.get("delete_files", [])
                   if d not in prev_pos]
        if new_pos:
            by_path: dict[str, list[int]] = {}
            for rel in new_pos:
                t = _read_arrow(os.path.join(self._root, rel))
                for uri, pos in zip(t.column("_file").to_pylist(),
                                    t.column("_pos").to_pylist()):
                    by_path.setdefault(
                        os.path.normpath(_uri_to_path(uri)), []).append(pos)
            for path, positions in by_path.items():
                parts.append(_FilePart(
                    path, None, None, kind="emit_pos",
                    stamps=stamp("delete"), emit_positions=positions))
        prev_eq = ({d["path"] for d in parent.get("eq_delete_files", [])}
                   if parent else set())
        new_eq = [d for d in snap.get("eq_delete_files", [])
                  if d["path"] not in prev_eq]
        if new_eq and parent:
            mask_pos, mask_eq = _plan_delete_state(self._root, parent)
            seqs = parent.get("file_seqs", {})
            for d in new_eq:
                t = _read_arrow(os.path.join(self._root, d["path"]))
                cols = list(d["cols"])
                keys = list(zip(*[t.column(c).to_pylist() for c in cols])) \
                    if t.num_rows else []
                if not keys:
                    continue
                for rel in parent["files"]:
                    if seqs.get(rel, 0) >= d["seq"]:
                        continue
                    path = os.path.normpath(os.path.join(self._root, rel))
                    parent_eq = [
                        (c, k) for sq, c, k in mask_eq
                        if sq > seqs.get(rel, 0) and k and sq < d["seq"]
                    ]
                    parts.append(_FilePart(
                        path, mask_pos.get(path), parent_eq,
                        kind="emit_eq", stamps=stamp("delete"),
                        emit_keys=(cols, keys)))
        return parts

    def read(self, partition):
        from pyspark.sql.pandas.types import to_arrow_schema

        schema = to_arrow_schema(self._schema)
        subs = (partition.parts if isinstance(partition, _MultiPart)
                else [partition])
        for sub in subs:
            yield from _read_partition(sub, schema)

    def commit(self, end):
        self._cursor = max(self._cursor or 0, end["snapshot_id"])


# -- the write side ----------------------------------------------------------


def _shim_table(root: str):
    """A LakeTable handle with NO SparkSession — the commit protocol
    (flock mutex + CAS snapshot append, ``_commit``) and write-time
    stats recording (``_record_file_stats`` → pyarrow footer reads)
    are pure-metadata paths, so the data source's driver-side commit
    hook (which runs in the Python DS worker process, where no
    SparkSession exists) can use the exact same serialized commit
    every other writer uses. Two-phase commit falls out: executors
    write data files, and visibility is a single metadata transaction."""
    from ..catalog import LakehouseCatalog

    wh = os.path.dirname(os.path.dirname(root))
    ns, name = os.path.basename(os.path.dirname(root)), os.path.basename(root)
    return LakehouseCatalog(None, wh).load_table(f"{ns}.{name}")


class _WriteMsg(WriterCommitMessage):
    def __init__(self, rel_path: str | None, rows: int):
        self.rel_path = rel_path
        self.rows = rows


class _WriterCore:
    """Shared executor-side write: one data file per non-empty task,
    straight from Arrow batches (no row materialization)."""

    def __init__(self, options, schema: T.StructType):
        self._root = _table_root(options)
        meta = _meta(self._root)
        table_cols = [f["name"] for f in meta["schema"]["fields"]]
        incoming = [f.name for f in schema.fields]
        if incoming != table_cols:
            raise ValueError(
                f"schema mismatch: table has {table_cols}, "
                f"write has {incoming}")
        props = meta.get("properties", {})
        self._fmt = props.get("write.format.default", "parquet")
        self._sub = f"data/ds-{uuid.uuid4().hex[:12]}"

    def _write_one(self, batches) -> _WriteMsg:
        import pyarrow as pa

        arrs = [b for b in batches if b.num_rows]
        if not arrs:
            return _WriteMsg(None, 0)
        tbl = pa.Table.from_batches(arrs)
        from pyspark import TaskContext

        ctx = TaskContext.get()
        tid = ctx.partitionId() if ctx else 0
        ext = "orc" if self._fmt == "orc" else "parquet"
        rel = f"{self._sub}/part-{tid:05d}-{uuid.uuid4().hex[:8]}.{ext}"
        path = os.path.join(self._root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if ext == "orc":
            import pyarrow.orc as orc

            orc.write_table(tbl, path)
        else:
            import pyarrow.parquet as pq

            pq.write_table(tbl, path)
        return _WriteMsg(rel, tbl.num_rows)

    def _paths(self, messages) -> tuple[list[str], int]:
        files = sorted(m.rel_path for m in messages
                       if m is not None and m.rel_path)
        rows = sum(m.rows for m in messages if m is not None)
        return files, rows

    def _cleanup(self, messages) -> None:
        for m in messages or []:
            if m is not None and m.rel_path:
                try:
                    os.remove(os.path.join(self._root, m.rel_path))
                except OSError:
                    pass


class LakehouseBatchWriter(_WriterCore, DataSourceArrowWriter):
    def __init__(self, options, schema: T.StructType, overwrite: bool):
        super().__init__(options, schema)
        self._overwrite = overwrite

    def write(self, iterator):
        return self._write_one(iterator)

    def commit(self, messages):
        files, rows = self._paths(messages)
        t = _shim_table(self._root)
        summary = {"via": "python-datasource", "added_rows": rows}
        if self._overwrite:
            t._commit("overwrite", files=files, summary=summary)
        elif files:
            t._commit("append", add_files=files, summary=summary)
        else:
            return  # empty append: no snapshot
        t._record_file_stats(files)

    def abort(self, messages):
        self._cleanup(messages)


class LakehouseStreamWriter(_WriterCore, DataSourceStreamArrowWriter):
    """``df.writeStream.format("lakehouse")`` sink: each micro-batch
    lands as ONE atomic append commit stamped with its epoch id —
    exactly-once on at-least-once replay, because a replayed epoch is
    detected in the snapshot log (same ``stream_id`` + ``batch_id``
    in a commit summary) and its files are discarded instead of
    committed. Restart-safe: the epoch stamp survives in the log, not
    in writer memory. Caveat (same as Delta's txn retention): snapshot
    expiry that removes the marker's commit before a crashed epoch is
    replayed would let the replay double-apply — retain more
    snapshots than the longest plausible recovery gap. Multiple concurrent streams into one table need
    distinct ``stream_id`` options (defaults to the checkpoint-scoped
    query's run — collisions only if two different queries share a
    table AND neither sets stream_id AND their batch ids collide)."""

    _REPLAY_SCAN = 100  # commits searched backward for a replayed epoch

    def __init__(self, options, schema: T.StructType):
        super().__init__(options, schema)
        self._stream_id = options.get("stream_id") or "default"

    def write(self, iterator):
        return self._write_one(iterator)

    def commit(self, messages, batchId):
        files, rows = self._paths(messages)
        t = _shim_table(self._root)
        for s in reversed(t.snapshots()[-self._REPLAY_SCAN:]):
            marker = s.summary.get("streaming") if s.summary else None
            if (marker and marker.get("stream_id") == self._stream_id
                    and marker.get("batch_id") == batchId):
                self._cleanup(messages)  # replayed epoch: already durable
                return
        if not files:
            return
        t._commit("append", add_files=files, summary={
            "via": "python-datasource",
            "added_rows": rows,
            "streaming": {"stream_id": self._stream_id,
                          "batch_id": batchId},
        })
        t._record_file_stats(files)

    def abort(self, messages, batchId):
        self._cleanup(messages)


class LakehouseDataSource(DataSource):
    """``spark.dataSource.register(LakehouseDataSource)`` then read /
    write / readStream / writeStream with ``format("lakehouse")``."""

    @classmethod
    def name(cls) -> str:
        return "lakehouse"

    def schema(self) -> T.StructType:
        root = _table_root(self.options)
        snap = _resolve_snapshot(root, self.options)
        base = (_fields_to_struct(_meta(root)["schema"]["fields"])
                if snap is None else _snapshot_schema(root, snap))
        if _truthy(self.options.get("read_changes")):
            return T.StructType(
                list(base.fields)
                + [T.StructField(n, t, True) for n, t in _CDC_FIELDS])
        return base

    def reader(self, schema: T.StructType) -> LakehouseBatchReader:
        if _truthy(self.options.get("read_changes")):
            raise ValueError(
                "read_changes is a STREAMING option (readStream); for a "
                "batch changelog use governance.cdc.changelog_view")
        return LakehouseBatchReader(self.options, schema)

    def streamReader(self, schema: T.StructType) -> LakehouseStreamReader:
        return LakehouseStreamReader(self.options, schema)

    def writer(self, schema: T.StructType,
               overwrite: bool) -> LakehouseBatchWriter:
        return LakehouseBatchWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: T.StructType,
                     overwrite: bool) -> LakehouseStreamWriter:
        return LakehouseStreamWriter(self.options, schema)


def register_lakehouse_source(spark) -> None:
    """Idempotent format registration for the current session. Also
    enables Python-data-source filter pushdown (runtime conf, off by
    default in Spark 4) so ``pushFilters`` file pruning engages."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakehouseDataSource)
