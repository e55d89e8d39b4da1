"""Snapshot-level file pruning from persisted column stats.

Iceberg plans scans by evaluating the query predicate against manifest
min/max stats and hands the engine only surviving files (the reference
gets this via PyIceberg's plan_files). Spark's own parquet footer
pruning still *lists and opens* every file; at 100 TB the listing and
footer round-trips alone dominate a selective query. This module closes
that gap for our snapshot-log format: ``LakeTable.scan(filter=...)``
evaluates the predicate against the write-time stats map (per-commit
shards under ``_meta/stats/`` consolidated into ``file_stats.json`` —
the Iceberg manifest model, so commits stay O(files written)) and
builds the reader over the surviving subset only.

Design rules:

* **Conservative, never wrong.** A file is dropped only when a conjunct
  is *provably false* for its [min, max] interval. Anything we cannot
  analyze — OR trees, functions, casts, unknown literals, missing stats
  — keeps the file. The exact predicate is still applied to the scan,
  so pruning can only shrink I/O, never change results.
* **Top-level AND of simple comparisons.** ``col <op> literal`` (either
  side), ``col IS [NOT] NULL``, ``col IN (lit, ...)``, ``col BETWEEN
  a AND b``. This covers the reference's filter-string surface
  (update/delete/export predicates); a filter outside the grammar
  degrades to a full-file-list scan, not an error.
* **Driver-cheap.** Evaluation is pure-Python over the stats map —
  O(files × conjuncts), no Spark job, no file I/O (stats were persisted
  at write time).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from decimal import Decimal, InvalidOperation

from pyspark.sql import types as T

_TOKEN_RE = re.compile(
    r"""
    \s*(?:
      (?P<kw>AND|IS|NOT|NULL|IN|BETWEEN|TRUE|FALSE)\b
    | (?P<typed>(?:DATE|TIMESTAMP)\s*'(?:[^'])*')
    | (?P<str>'(?:[^']|'')*')
    | (?P<num>[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)
    | (?P<op><=|>=|!=|<>|==|=|<|>)
    | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<lpar>\()
    | (?P<rpar>\))
    | (?P<comma>,)
    )""",
    re.VERBOSE | re.IGNORECASE,
)

_FLIP = {"<": ">", ">": "<", "<=": ">=", ">=": "<="}

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


@dataclass
class _Conjunct:
    col: str
    op: str          # = != < <= > >= isnull isnotnull in
    value: object    # literal | list for IN | None


def _tokenize(expr: str) -> list[tuple[str, str]] | None:
    out, pos = [], 0
    while pos < len(expr):
        if expr[pos].isspace():
            pos += 1
            continue
        m = _TOKEN_RE.match(expr, pos)
        if not m or m.end() == pos:
            return None  # unknown syntax → no pruning
        kind = m.lastgroup
        tok = m.group(kind).strip()
        if kind == "kw":
            tok = tok.upper()
        out.append((kind, tok))
        pos = m.end()
    return out


def _unquote(s: str) -> str:
    return s[1:-1].replace("''", "'")


def _parse_literal(kind: str, tok: str):
    """→ ('num'|'str'|'bool', python value) — tagged for type checks.

    Numeric literals keep their lexical form: the comparison domain is
    chosen per column type in ``_coerce`` (exact ``Decimal`` for
    integral/decimal columns — ``float`` would collide distinct int64
    values >= 2**53 and mis-prune; native ``float`` for float/double)."""
    if kind == "num":
        return ("num", tok)
    if kind == "str":
        return ("str", _unquote(tok))
    if kind == "typed":
        body = tok.split("'", 1)[1][:-1]
        return ("str", body)  # DATE/TIMESTAMP literals compare as ISO text
    if kind == "kw" and tok in ("TRUE", "FALSE"):
        return ("bool", tok == "TRUE")
    return None


def parse_conjuncts(expr: str) -> list[_Conjunct] | None:
    """Parse a top-level-AND filter string; None = outside the grammar
    (caller must keep every file)."""
    toks = _tokenize(expr)
    if toks is None or not toks:
        return None
    out: list[_Conjunct] = []
    i, n = 0, len(toks)

    def lit_at(j):
        if j < n and toks[j][0] in ("num", "str", "typed") or (
            j < n and toks[j] == ("kw", "TRUE") or j < n and toks[j] == ("kw", "FALSE")
        ):
            return _parse_literal(*toks[j])
        return None

    while i < n:
        # ident-led comparison forms
        if toks[i][0] == "ident":
            col = toks[i][1]
            if i + 1 < n and toks[i + 1][0] == "op":
                lit = lit_at(i + 2)
                if lit is None:
                    return None
                out.append(_Conjunct(col, _norm_op(toks[i + 1][1]), lit))
                i += 3
            elif i + 2 < n and toks[i + 1] == ("kw", "IS") and toks[i + 2] == ("kw", "NULL"):
                out.append(_Conjunct(col, "isnull", None))
                i += 3
            elif (
                i + 3 < n
                and toks[i + 1] == ("kw", "IS")
                and toks[i + 2] == ("kw", "NOT")
                and toks[i + 3] == ("kw", "NULL")
            ):
                out.append(_Conjunct(col, "isnotnull", None))
                i += 4
            elif i + 1 < n and toks[i + 1] == ("kw", "IN"):
                if i + 2 >= n or toks[i + 2][0] != "lpar":
                    return None
                vals, j = [], i + 3
                while j < n and toks[j][0] != "rpar":
                    if toks[j][0] == "comma":
                        j += 1
                        continue
                    lit = lit_at(j)
                    if lit is None:
                        return None
                    vals.append(lit)
                    j += 1
                if j >= n:
                    return None
                out.append(_Conjunct(col, "in", vals))
                i = j + 1
            elif i + 1 < n and toks[i + 1] == ("kw", "BETWEEN"):
                lo = lit_at(i + 2)
                if lo is None or i + 3 >= n or toks[i + 3] != ("kw", "AND"):
                    return None
                hi = lit_at(i + 4)
                if hi is None:
                    return None
                out.append(_Conjunct(col, ">=", lo))
                out.append(_Conjunct(col, "<=", hi))
                i += 5
            else:
                return None
        # literal-led: literal op ident → flip
        elif toks[i][0] in ("num", "str", "typed"):
            lit = lit_at(i)
            if (
                lit is None
                or i + 2 >= n
                or toks[i + 1][0] != "op"
                or toks[i + 2][0] != "ident"
            ):
                return None
            op = _norm_op(toks[i + 1][1])
            out.append(_Conjunct(toks[i + 2][1], _FLIP.get(op, op), lit))
            i += 3
        else:
            return None
        # connective: AND or end
        if i < n:
            if toks[i] == ("kw", "AND"):
                i += 1
            else:
                return None  # OR / trailing junk → bail entirely
    return out


def _norm_op(op: str) -> str:
    return {"==": "=", "<>": "!="}.get(op, op)


def _ts_norm(v) -> "object | None":
    """Timestamp stat/literal → naive-UTC ``datetime`` comparison
    domain. LTZ parquet stats come back tz-aware (str() appends
    '+00:00'), which breaks lexicographic comparison against naive
    literals — '…+00:00' > '…' — and a non-conservative prune on the
    CoW probe path is silent data loss. Unparseable → None (keep)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        d = v
    else:
        s = str(v).replace("T", " ").strip()
        if s.endswith("Z"):
            s = s[:-1] + "+00:00"
        if len(s) == 10:
            s = s + " 00:00:00"  # date-only literal
        try:
            d = _dt.datetime.fromisoformat(s)
        except ValueError:
            return None
    if d.tzinfo is not None:
        d = d.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return d


def _coerce(dt: T.DataType, lit) -> object | None:
    """Literal → the comparison domain used for this column's stats.
    Integral/decimal columns compare as exact ``Decimal`` (doubles lose
    int64 identity past 2**53 → wrong '!='/'<'/'>' pruning = data loss
    on the CoW update/delete probe path), float/double as ``float``,
    timestamps as naive-UTC ``datetime`` (see ``_ts_norm``), everything
    else as ISO text. None = incomparable (keep the file)."""
    tag, v = lit
    if isinstance(dt, _NUMERIC):
        if tag != "num":
            return None
        try:
            if isinstance(dt, (T.FloatType, T.DoubleType)):
                return float(v)
            d = Decimal(v)
            return d if d.is_finite() else None
        except (ValueError, TypeError, InvalidOperation):
            return None
    if isinstance(dt, T.BooleanType):
        return str(v) if tag == "bool" else None
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return _ts_norm(v) if tag == "str" else None
    if isinstance(dt, (T.StringType, T.DateType)):
        return v if tag == "str" else None
    return None  # binary/array/struct — never prune


def _stat_value(dt: T.DataType, s):
    """Stat → the per-type comparison domain (same split as ``_coerce``:
    exact ``Decimal`` for integral/decimal, ``float`` for float/double,
    str otherwise). Stored shards hold strings, but the parquet-footer
    fallback yields raw Python objects (datetime/date/Decimal/bool) —
    normalize both the same way the writer does (str()) so comparisons
    never mix types. NaN stats → None (can't order → keep the file)."""
    if s is None:
        return None
    if isinstance(dt, _NUMERIC):
        try:
            if isinstance(dt, (T.FloatType, T.DoubleType)):
                f = float(s)
                return None if f != f else f
            d = Decimal(str(s))
            return d if d.is_finite() else None
        except (ValueError, TypeError, InvalidOperation):
            return None
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return _ts_norm(s)
    return s if isinstance(s, str) else str(s)


def file_may_match(
    stats: dict[str, tuple], schema: T.StructType, conjuncts: list[_Conjunct]
) -> bool:
    """False only when some conjunct is provably false on this file."""
    fields = {f.name: f.dataType for f in schema.fields}
    for c in conjuncts:
        dt = fields.get(c.col)
        if dt is None or c.col not in stats:
            continue  # unknown column / no stats → can't prune
        raw_mn, raw_mx, nc = stats[c.col]
        if c.op == "isnull":
            if nc == 0:
                return False
            continue
        if c.op == "isnotnull":
            # all-null file records no min/max but a positive null count
            if raw_mn is None and raw_mx is None and (nc or 0) > 0:
                return False
            continue
        mn, mx = _stat_value(dt, raw_mn), _stat_value(dt, raw_mx)
        if mn is None or mx is None:
            continue
        if c.op == "in":
            vals = [x for x in (_coerce(dt, v) for v in c.value) if x is not None]
            if len(vals) == len(c.value) and not any(mn <= v <= mx for v in vals):
                return False
            continue
        v = _coerce(dt, c.value)
        if v is None:
            continue
        if (
            (c.op == "=" and not (mn <= v <= mx))
            or (c.op == "!=" and mn == mx == v and nc == 0)
            or (c.op == "<" and not (mn < v))
            or (c.op == "<=" and not (mn <= v))
            or (c.op == ">" and not (mx > v))
            or (c.op == ">=" and not (mx >= v))
        ):
            return False
    return True


def prune_files(
    files: list[str],
    file_stats: dict[str, dict[str, tuple]],
    schema: T.StructType,
    filter_expr: str,
) -> list[str]:
    """Subset of ``files`` that may hold rows matching ``filter_expr``.
    Files without stats always survive; an unparseable filter keeps all."""
    conjuncts = parse_conjuncts(filter_expr)
    if not conjuncts:
        return list(files)
    return [
        f
        for f in files
        if f not in file_stats
        or file_may_match(file_stats[f], schema, conjuncts)
    ]
