"""Trainable quality classifier (round 10): bit-reproducibility (the
fixed-point gradient design), partition-order independence, real
learning on a separable corpus, and error paths."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.functions import quality_model as qm


def _corpus(spark):
    """Separable by construction: 'good' docs are vowel-heavy prose
    with spaces, 'bad' docs are consonant runs — f_vowel and f_space
    split them linearly."""
    rows = []
    for i in range(30):
        rows.append((i, "aeiou " * (10 + i % 5) + "aa ee oo", "en"))
    for i in range(30, 60):
        rows.append((i, "zxcvbnm" * (8 + i % 5), "zh"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_training_is_bit_reproducible_and_order_independent(spark):
    """THE design contract: per-doc gradients quantize to integers and
    sum exactly, so the trained weights are byte-identical run to run
    AND across partitionings — a plain double sum would drift with
    Spark's partition order."""
    docs = _corpus(spark)
    w1 = qm.train_quality_classifier(docs)["weights"]
    w2 = qm.train_quality_classifier(docs)["weights"]
    w3 = qm.train_quality_classifier(docs.repartition(7))["weights"]
    w4 = qm.train_quality_classifier(docs.repartition(1))["weights"]
    assert [repr(x) for x in w1] == [repr(x) for x in w2]
    assert [repr(x) for x in w1] == [repr(x) for x in w3]
    assert [repr(x) for x in w1] == [repr(x) for x in w4]
    assert any(x != 0.0 for x in w1)


def test_learns_separable_corpus(spark):
    """The classifier actually LEARNS: on the separable corpus the
    trained model labels every doc correctly, and more iterations
    shrink the mean absolute error against the seed labels."""
    import pyspark.sql.functions as F

    docs = _corpus(spark)
    model = qm.train_quality_classifier(docs, iters=24)
    scored = qm.score_quality_classifier(docs, model)
    agg = scored.agg(
        F.avg((F.col("quality_label") == F.col("seed_label"))
              .cast("double")).alias("acc"),
        F.avg(F.abs(F.col("quality_score")
                    - F.col("seed_label"))).alias("mae"),
    ).first()
    assert agg["acc"] == 1.0, agg
    few = qm.train_quality_classifier(docs, iters=2)
    mae_few = qm.score_quality_classifier(docs, few).agg(
        F.avg(F.abs(F.col("quality_score") - F.col("seed_label")))
    ).first()[0]
    assert agg["mae"] < mae_few


def test_scoring_plan_is_map_only(spark):
    docs = _corpus(spark)
    model = qm.train_quality_classifier(docs, iters=1)
    plan = qm.score_quality_classifier(docs, model) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "PythonUDF" not in plan


def test_custom_label_and_text_columns(spark):
    rows = [(1, "aeiou aeiou", 950.0), (2, "zxcv", 20.0)]
    df = spark.createDataFrame(rows, "doc_id long, body string, score double")
    model = qm.train_quality_classifier(
        df, text_col="body",
        label_sql="CASE WHEN score > 100.0 THEN 1.0 ELSE 0.0 END")
    assert len(model["weights"]) == len(qm.FEATURES) + 1
    scored = qm.score_quality_classifier(
        df, model, text_col="body",
        label_sql="CASE WHEN score > 100.0 THEN 1.0 ELSE 0.0 END")
    got = {r["doc_id"]: r["seed_label"] for r in scored.collect()}
    assert got == {1: 1, 2: 0}


def test_error_paths(spark):
    docs = _corpus(spark)
    with pytest.raises(ValueError, match="iters"):
        qm.train_quality_classifier(docs, iters=0)
    with pytest.raises(ValueError, match="empty"):
        qm.train_quality_classifier(docs.where("doc_id < 0"))


def test_oracle_cte_matches_spark_on_tiny_corpus(spark):
    """Cross-engine pin at the unit level (the suite entry pins it at
    corpus level): DuckDB's unrolled CTE loop reproduces the Spark
    weights bit for bit on an in-memory table."""
    import duckdb

    rows = [(1, "aeiou vowels everywhere", "en"),
            (2, "zzzz qqqq xxxx", "zh"),
            (3, "the quick brown fox aeiou", "en"),
            (4, "bcdfg hjklm npqrst", "fr")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w = qm.train_quality_classifier(docs, iters=6)["weights"]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}', '{lg}')" for i, t, lg in rows)
        + ") t(doc_id, text, lang)")
    ctes, final = qm.duckdb_training_ctes(iters=6)
    cols = ", ".join(f"w{j}" for j in range(len(w)))
    ow = con.execute(f"WITH {ctes} SELECT {cols} FROM {final}").fetchone()
    assert [repr(x) for x in w] == [repr(x) for x in ow]
