"""Persisted PQ (product-quantization) ANN index (round 8): build /
probe (ADC) / extend / stats, plus the recall contract against exact
brute-force cosine — approximate top-k must overlap the truth, and the
exact-refine pass must recover it almost entirely."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.operators import pq
from iceberg_lakehouse_spark.session import load_sf_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_sf_tables(spark, SF)["embeddings"]


@pytest.fixture(scope="module")
def built(spark, emb, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("pqwh"))
    cat = LakehouseCatalog(spark, wh)
    pq.build_pq_index(cat, "default.pqe", emb, "vec_id", "embedding",
                      m=8, ksub=16, kmeans_iters=2)
    return cat


def _exact_topk(spark, emb, qvec, k):
    import pyspark.sql.functions as F

    from iceberg_lakehouse_spark.functions.similarity import cosine

    q = F.array(*[F.lit(float(v)) for v in qvec])
    return [
        r["vec_id"]
        for r in emb.select(
            "vec_id", cosine(F.col("embedding"), q).alias("s"))
        .orderBy(F.desc("s"), "vec_id").limit(k).collect()
    ]


def test_build_shapes_and_compression(built):
    cat = built
    t = cat.load_table("default.pqe")
    assert t.scan().count() == 500
    row = t.scan().first()
    assert len(row["codes"]) == 8
    assert all(0 <= c < 16 for c in row["codes"])
    book = cat.load_table("default.pqe__codebook").scan().collect()
    assert len(book) == 8 * 16
    stats = pq.pq_index_stats(cat, "default.pqe")
    assert stats["compression_ratio"] == 64.0  # 512 raw bytes -> 8 codes
    assert all(v["used"] >= 2 for v in stats["code_utilization"].values())


def test_probe_recall_and_refine(spark, built, emb):
    cat = built
    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    truth = _exact_topk(spark, emb, qvec, 10)
    approx = [r["id"] for r in
              pq.probe_pq_index(cat, "default.pqe", qvec, k=10).collect()]
    overlap = len(set(truth) & set(approx))
    # these synthetic embeddings are near-isotropic noise — PQ's worst
    # case: beyond the self-match the true neighbors differ by cosine
    # margins below the quantization floor. Random top-10 would overlap
    # 10 * 10/500 = 0.2; >= 2 pins a 10x-better-than-chance ADC, and
    # the refine pass below carries the real recall contract.
    assert overlap >= 2, f"ADC recall@10 too low: {overlap}/10"
    # the query IS a corpus vector: ADC must put it at rank 1 (distance
    # to its own codes is the quantization floor)
    assert approx[0] == truth[0]
    refined = [
        r["id"]
        for r in pq.probe_pq_index(
            cat, "default.pqe", qvec, k=10,
            refine_with=emb, refine_factor=8).collect()
    ]
    overlap_r = len(set(truth) & set(refined))
    assert overlap_r >= 8, f"refined recall@10 too low: {overlap_r}/10"
    assert overlap_r >= overlap  # refine never hurts


def test_extend_encodes_against_frozen_codebook(spark, built, emb):
    import pyspark.sql.functions as F

    cat = built
    before = cat.load_table("default.pqe").scan().count()
    batch = emb.limit(5).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    n = pq.extend_pq_index(cat, "default.pqe", batch, "vec_id", "embedding")
    assert n == 5
    t = cat.load_table("default.pqe")
    assert t.scan().count() == before + 5
    # a duplicated vector must get identical codes under the frozen book
    orig = {r["id"]: r["codes"] for r in
            t.scan(filter="id < 5").collect()}
    ext = {r["id"] - 100000: r["codes"] for r in
           t.scan(filter="id >= 100000").collect()}
    assert ext == {k: orig[k] for k in ext}


def test_geometry_validation(spark, built):
    cat = built
    with pytest.raises(ValueError, match="dims"):
        pq.probe_pq_index(cat, "default.pqe", [1.0, 2.0], k=3)
    bad = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="dimensional"):
        pq.extend_pq_index(cat, "default.pqe", bad, "vec_id", "embedding")
    with pytest.raises(ValueError, match="not a PQ index"):
        cat.create_table("default.notpq", [("id", "long")])
        pq.probe_pq_index(cat, "default.notpq", [0.0] * 64)


def test_build_rejects_bad_params(spark, tmp_warehouse, emb):
    cat = LakehouseCatalog(spark, tmp_warehouse)
    with pytest.raises(ValueError, match="divisible"):
        pq.build_pq_index(cat, "default.pq7", emb, "vec_id", "embedding",
                          m=7)
    with pytest.raises(ValueError, match="ksub"):
        pq.build_pq_index(cat, "default.pq1", emb, "vec_id", "embedding",
                          ksub=1)
