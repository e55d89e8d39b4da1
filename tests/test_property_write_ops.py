"""Property pins for the round-8 write primitives: on arbitrary
single-writer inputs, replace_where is observably equivalent to
delete-then-insert, and overwrite_partitions to partition-delete-then-
insert — except both happen in ONE commit (also asserted). Hypothesis
drives the shapes; examples are capped because each round-trips a
Spark table."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.operators import crud

DAYS = ["d0", "d1", "d2", None]

rows_strategy = st.lists(
    st.tuples(st.integers(0, 50), st.sampled_from(DAYS)),
    min_size=0, max_size=12,
)


def _mk(spark, warehouse, name, rows):
    cat = LakehouseCatalog(spark, warehouse)
    t = cat.create_table(name, [("id", "long"), ("day", "string")])
    if rows:
        t.append(spark.createDataFrame(
            [(i, d) for i, d in rows], "id long, day string"))
    return t


def _collect(t):
    return sorted(
        ((r["id"], r["day"]) for r in t.scan().collect()),
        key=lambda x: (x[0], x[1] is not None, x[1] or ""),
    )


_N = [0]


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(base=rows_strategy, repl=rows_strategy, day=st.sampled_from(DAYS[:3]))
def test_replace_where_equiv_delete_insert(spark, tmp_path_factory,
                                           base, repl, day):
    wh = str(tmp_path_factory.mktemp("prop"))
    _N[0] += 1
    n = _N[0]
    repl_rows = [(i, day) for i, _ in repl]  # forced into the slice
    ta = _mk(spark, wh, f"default.a{n}", base)
    snaps_before = len(ta.snapshots())
    crud.replace_where(
        ta, f"day = '{day}'",
        spark.createDataFrame(repl_rows or [], "id long, day string"))
    assert len(ta.snapshots()) == snaps_before + 1  # exactly ONE commit
    tb = _mk(spark, wh, f"default.b{n}", base)
    crud.delete_rows(tb, f"day = '{day}'")
    if repl_rows:
        tb.append(spark.createDataFrame(repl_rows, "id long, day string"))
    assert _collect(ta) == _collect(tb)


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(base=rows_strategy, repl=rows_strategy)
def test_overwrite_partitions_equiv_delete_insert(spark, tmp_path_factory,
                                                  base, repl):
    wh = str(tmp_path_factory.mktemp("prop"))
    _N[0] += 1
    n = _N[0]
    cat = LakehouseCatalog(spark, wh)

    def mk(name):
        t = cat.create_table(
            name, [("id", "long"), ("day", "string")],
            partition_by=["day"])
        if base:
            t.append(spark.createDataFrame(
                [(i, d) for i, d in base], "id long, day string"))
        return t

    ta, tb = mk(f"default.pa{n}"), mk(f"default.pb{n}")
    repl_df = spark.createDataFrame(
        [(i, d) for i, d in repl] or [], "id long, day string")
    crud.overwrite_partitions(ta, repl_df)
    touched = {d for _, d in repl}
    if touched:
        conds = [f"day = '{d}'" for d in touched if d is not None]
        if None in touched:
            conds.append("day IS NULL")
        crud.delete_rows(tb, " OR ".join(conds))
    if repl:
        tb.append(spark.createDataFrame(
            [(i, d) for i, d in repl], "id long, day string"))
    assert _collect(ta) == _collect(tb)
