"""ANALYZE column statistics + metadata-only join-strategy advice +
the explain_query MCP surface (round 8)."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance import advisor


def _cat(spark, warehouse):
    cat = LakehouseCatalog(spark, warehouse)
    dim = cat.create_table("default.dim", [("k", "long"), ("name", "string")])
    dim.append(spark.createDataFrame(
        [(i, f"n{i}") for i in range(50)], "k long, name string"))
    fact = cat.create_table(
        "default.fact", [("k", "long"), ("v", "double"), ("cat", "string")])
    # skewed: half the rows share k=0
    rows = [(0, float(i), f"c{i % 3}") for i in range(500)] + \
           [(i % 50, float(i), None) for i in range(500)]
    fact.append(spark.createDataFrame(rows, "k long, v double, cat string"))
    return cat, dim, fact


def test_analyze_persists_and_is_one_pass(spark, tmp_warehouse):
    _, _, fact = _cat(spark, tmp_warehouse)
    res = fact.analyze()
    assert res["row_count"] == 1000
    cols = res["columns"]
    assert set(cols) == {"k", "v", "cat"}
    # HLL rsd 5%: k has exactly 50 distinct values
    assert 45 <= cols["k"]["ndv"] <= 55
    assert cols["cat"]["nulls"] == 500
    assert cols["k"]["nulls"] == 0
    stored = fact.analyzed_stats()
    assert stored["stale"] is False
    assert stored["snapshot_id"] == fact.current_snapshot().snapshot_id


def test_analyze_stale_flag_and_column_subset(spark, tmp_warehouse):
    _, dim, fact = _cat(spark, tmp_warehouse)
    fact.analyze(columns=["k"])
    assert set(fact.analyzed_stats()["columns"]) == {"k"}
    fact.append(fact.spark.createDataFrame(
        [(99, 1.0, "x")], "k long, v double, cat string"))
    assert fact.analyzed_stats()["stale"] is True
    with pytest.raises(ValueError, match="unknown columns"):
        dim.analyze(columns=["nope"])


def test_analyze_empty_table(spark, tmp_warehouse):
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.empty", [("a", "long")])
    res = t.analyze()
    assert res["row_count"] == 0
    assert res["columns"]["a"] == {"ndv": 0, "nulls": 0}


def test_join_strategy_broadcasts_small_side_and_flags_skew(
    spark, tmp_warehouse
):
    cat, dim, fact = _cat(spark, tmp_warehouse)
    dim.analyze()
    fact.analyze()
    res = advisor.join_strategy(cat, "default.fact", "default.dim", ["k"])
    assert res["strategy"] == "broadcast"
    # both tiny here; the smaller side is chosen
    assert res["broadcast_side"] in ("left", "right")
    assert res["left_bytes"] > 0 and res["right_bytes"] > 0
    # fact has 1000 rows over ~51 keys — not skewed enough for the
    # 10k-rows-per-key flag; force it with a tighter synthetic check
    res2 = advisor.join_strategy(
        cat, "default.fact", "default.dim", ["k"], broadcast_threshold=0)
    assert res2["strategy"] == "shuffle"
    assert any("bucket" in r for r in res2["reasons"])


def test_join_strategy_skew_warning_fires(spark, tmp_warehouse):
    cat = LakehouseCatalog(spark, tmp_warehouse)
    hot = cat.create_table("default.hot", [("k", "long"), ("v", "long")])
    hot.append(spark.createDataFrame(
        [(0, i) for i in range(20001)], "k long, v long"))
    other = cat.create_table("default.oth", [("k", "long")])
    other.append(spark.createDataFrame([(0,)], "k long"))
    hot.analyze()
    res = advisor.join_strategy(cat, "default.hot", "default.oth", ["k"])
    assert res["skew_warnings"]
    w = res["skew_warnings"][0]
    assert w["side"] == "left" and w["column"] == "k"


def test_join_strategy_validates_columns_and_degrades_without_analyze(
    spark, tmp_warehouse
):
    cat, dim, fact = _cat(spark, tmp_warehouse)
    with pytest.raises(ValueError, match="join column"):
        advisor.join_strategy(cat, "default.fact", "default.dim", ["nope"])
    res = advisor.join_strategy(cat, "default.fact", "default.dim", ["k"])
    assert any("no ANALYZE stats" in r for r in res["reasons"])


def test_explain_query_tool(spark, tmp_warehouse, tmp_path):
    from iceberg_lakehouse_spark.server import LakehouseServer

    srv = LakehouseServer(home=str(tmp_path / "home"))
    srv.catalog.create_table("default.ex", [("a", "long")]).append(
        spark.createDataFrame([(1,), (2,)], "a long"))
    srv.engine.refresh()
    out = srv._tools["explain_query"][1](
        sql="SELECT a FROM ex WHERE a > 1")
    assert "PushedFilters" in out["plan"] or "Filter" in out["plan"]
    assert out["mode"] == "formatted"
    with pytest.raises(ValueError, match="explain mode"):
        srv._tools["explain_query"][1](sql="SELECT 1", mode="bogus")


def test_auto_analyze_maintenance_policy(spark, tmp_warehouse, tmp_path):
    """auto_analyze: maintenance re-runs ANALYZE exactly when the table
    committed past the analyzed snapshot; fresh stats are a no-op."""
    from iceberg_lakehouse_spark.governance.policies import (
        MaintenanceManager,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.auto", [("k", "long")])
    t.append(spark.createDataFrame([(1,), (2,)], "k long"))
    mm = MaintenanceManager(str(tmp_path / "maint.json"))
    mm.set_policy("default.auto", auto_analyze=True,
                  auto_compact_threshold=10_000,
                  auto_expire_retain_last=10_000)
    need = mm.check_needed(t)
    assert need["needs_analyze"] is True       # never analyzed
    res = mm.run(t)
    assert any(a["action"] == "analyze" and a["status"] == "completed"
               for a in res["actions"])
    assert t.analyzed_stats()["stale"] is False
    # fresh: nothing to do
    assert mm.check_needed(t)["needs_analyze"] is False
    assert not any(a["action"] == "analyze"
                   for a in mm.run(t)["actions"])
    # commit → stale → dry-run reports, real run refreshes
    t.append(spark.createDataFrame([(3,)], "k long"))
    assert mm.check_needed(t)["needs_analyze"] is True
    dry = mm.run(t, dry_run=True)
    assert any(a["action"] == "analyze" and a["status"] == "dry_run"
               for a in dry["actions"])
    assert t.analyzed_stats()["stale"] is True  # dry run changed nothing
    mm.run(t)
    assert t.analyzed_stats()["stale"] is False
    assert t.analyzed_stats()["row_count"] == 3


def test_auto_rebalance_index_maintenance_policy(spark, tmp_warehouse,
                                                 tmp_path):
    """auto_rebalance_index (r9): a maintenance policy on an ANN index
    table splits hot cells exactly when the median-relative ratio
    trips — the same governance loop auto_compact/auto_analyze ride.
    Non-index tables with the key set are a no-op."""
    import pyspark.sql.functions as F

    from iceberg_lakehouse_spark.governance.policies import (
        MaintenanceManager,
    )
    from iceberg_lakehouse_spark.operators import ann_index
    from iceberg_lakehouse_spark.session import load_sf_tables

    emb = load_sf_tables(spark, "/root/testdata/sf0.001")["embeddings"]
    cat = LakehouseCatalog(spark, tmp_warehouse)
    ann_index.build_ann_index(cat, "default.mnt_ivf", emb,
                              "vec_id", "embedding", n_cells=6,
                              kmeans_iters=1)
    t = cat.load_table("default.mnt_ivf")
    mm = MaintenanceManager(str(tmp_path / "maint.json"))
    mm.set_policy("default.mnt_ivf", auto_rebalance_index=3.0,
                  auto_compact_threshold=10_000,
                  auto_expire_retain_last=10_000)
    # balanced: nothing to do
    assert mm.check_needed(t)["needs_rebalance"] is False
    # drift: a 400-vector blob lands in one cell
    anchor = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    blob = spark.range(300000, 300400).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(v) for v in anchor]).alias("embedding"))
    ann_index.extend_ann_index(cat, "default.mnt_ivf", blob,
                               "vec_id", "embedding")
    need = mm.check_needed(t)
    assert need["needs_rebalance"] is True
    assert any("rebalance_ann_index" in a for a in need["actions_needed"])
    dry = mm.run(t, dry_run=True)
    assert any(a["action"] == "rebalance_ann_index"
               and a["status"] == "dry_run" for a in dry["actions"])
    res = mm.run(t)
    done = [a for a in res["actions"]
            if a["action"] == "rebalance_ann_index"]
    assert done and done[0]["status"] == "completed"
    assert done[0]["split_cells"]
    assert done[0]["n_cells_after"] > 6
    # non-index table: the key is inert
    t2 = cat.create_table("default.mnt_plain", [("k", "long")])
    t2.append(spark.createDataFrame([(1,)], "k long"))
    mm.set_policy("default.mnt_plain", auto_rebalance_index=3.0,
                  auto_compact_threshold=10_000,
                  auto_expire_retain_last=10_000)
    assert mm.check_needed(t2)["needs_rebalance"] is False
