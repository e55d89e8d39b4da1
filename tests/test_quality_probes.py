"""Quality probes for rows-only registry entries (r12 VERDICT #2):
unit-level contracts against a real DuckDB connection over sf0.001."""

from __future__ import annotations

import duckdb
import pytest

from iceberg_lakehouse_spark.suite.quality_probes import (
    QUALITY_PROBES,
    _ANN_TRUTH_SQL,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def test_probe_names_are_rows_only_entries():
    """Every probed name must be a registered entry WITHOUT an oracle
    (probes exist precisely for the non-hashable tail)."""
    import __spark_entry__ as m

    qs, osql = m.queries(), m.oracle_sql()
    for name in QUALITY_PROBES:
        assert name in qs, name
        assert name not in osql, f"{name} is oracle-paired; drop probe"


def test_ann_recall_probe_scores_truth_and_miss(con):
    truth = [r[0] for r in con.execute(_ANN_TRUTH_SQL).fetchall()]
    assert len(truth) == 10
    probe = QUALITY_PROBES["ann_ivf_topk"]
    perfect = probe(con, SF, ["vec_id", "cosine_sim"],
                    [(v, 1.0) for v in truth])
    assert perfect["value"] == 1.0 and perfect["ok"]
    # half overlap → 0.5, still at the floor
    half = probe(con, SF, ["vec_id", "cosine_sim"],
                 [(v, 1.0) for v in truth[:5]]
                 + [(10_000 + i, 0.0) for i in range(5)])
    assert half["value"] == 0.5 and half["ok"]
    # total miss → floor violation
    miss = probe(con, SF, ["id", "cosine_sim"],
                 [(10_000 + i, 0.0) for i in range(10)])
    assert miss["value"] == 0.0 and not miss["ok"]


def test_exemplar_coverage_probe(con):
    total = con.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    probe = QUALITY_PROBES["diverse_exemplar_sample"]
    cols = ["cell", "vec_id", "centroid_sim", "n_covered"]
    good = probe(con, SF, cols, [(0, 1, 1.0, total - 3), (1, 2, 1.0, 3)])
    assert good["ok"] and good["value"] == 1.0
    # under-coverage (a vector lost by assignment) must trip
    bad = probe(con, SF, cols, [(0, 1, 1.0, total - 5), (1, 2, 1.0, 3)])
    assert not bad["ok"]
    # duplicate exemplar ids must trip even at full coverage
    dup = probe(con, SF, cols, [(0, 1, 1.0, total - 3), (1, 1, 1.0, 3)])
    assert not dup["ok"]


def test_bernoulli_rate_probe(con):
    total = con.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    probe = QUALITY_PROBES["random_sample_bernoulli"]
    cols = ["l_orderkey", "l_linenumber", "l_quantity"]
    ok = probe(con, SF, cols, [(i, 1, 1) for i in range(int(total * 0.05))])
    assert ok["ok"]
    empty = probe(con, SF, cols, [])
    assert not empty["ok"]
