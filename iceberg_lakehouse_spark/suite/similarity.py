"""Embedding similarity search (LLM-pipeline, BASELINE.json north star).

Brute-force cosine top-k is the exactness baseline: a map-only pass
computing dot products against a broadcast query vector, then a top-k
(TakeOrdered — no full sort). The scale path (IVF/LSH bucketing) lives
in ``functions/similarity.py`` and is exposed rows-only.

Float handling: embeddings are array<float>; both engines cast each
element to double *before* multiplying, and final similarities are
rounded to 6 dp so summation-order noise (≤1e-13) can never flip the
oracle hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..session import load_sf_tables
from . import register


from ..functions.similarity import dot as _dot  # single fold implementation


@register(
    "cosine_knn_bruteforce",
    """
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine_sim
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY cosine_sim DESC, e.vec_id
    LIMIT 10
    """,
    survey_ref="LLM-similarity: brute-force cosine top-k",
)
def cosine_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    emb = t["embeddings"]
    # one-row dimension side: crossJoin(broadcast(q)) — replicated to every
    # task, the fact side never moves. At 100 TB this is the right plan.
    # r14 (guide §1.2): the query vector's norm is folded ONCE on the
    # one-row broadcast side (same sqrt(dot) expression — bit-identical)
    # instead of being re-folded for every probe row; each probe row now
    # pays one dot fold + its own norm, not three folds.
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("_qn"),
    )
    e = emb.where(F.col("vec_id") != 0)
    joined = e.crossJoin(F.broadcast(q))
    a, b = F.col("embedding"), F.col("qv")
    sim = _dot(a, b) / (F.sqrt(_dot(a, a)) * F.col("_qn"))
    return (
        joined.select(
            "vec_id", "label", F.round(sim, 6).alias("cosine_sim")
        )
        .orderBy(F.desc("cosine_sim"), "vec_id")
        .limit(10)
    )


@register(
    "embedding_norms",
    """
    SELECT vec_id, label,
           ROUND(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6) AS l2_norm,
           len(embedding) AS dim
    FROM embeddings
    """,
    survey_ref="LLM-similarity: vector feature extraction",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_sf_tables(spark, sf_dir)
    a = F.col("embedding")
    return t["embeddings"].select(
        "vec_id",
        "label",
        F.round(F.sqrt(_dot(a, a)), 6).alias("l2_norm"),
        F.size("embedding").alias("dim"),
    )


@register(
    "label_centroid_profile",
    """
    SELECT label,
           COUNT(*) AS n_vectors,
           ROUND(SUM(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))) / COUNT(*), 4) AS avg_l2_norm,
           ROUND(SUM(CAST(embedding[1] AS DOUBLE)) / COUNT(*), 4) AS centroid_dim0
    FROM embeddings
    GROUP BY label
    """,
    survey_ref="LLM-similarity: per-cluster centroid stats",
)
def label_centroid_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounded to 4 dp: cross-partition double-sum order differs between
    engines; with |Σ| ≲ 1e3 and fp error ≲ 1e-11 the rounding is safe."""
    t = load_sf_tables(spark, sf_dir)
    a = F.col("embedding")
    return (
        t["embeddings"]
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.sum(F.sqrt(_dot(a, a))) / F.count("*"), 4).alias("avg_l2_norm"),
            F.round(
                F.sum(F.element_at("embedding", 1).cast("double")) / F.count("*"), 4
            ).alias("centroid_dim0"),
        )
    )
