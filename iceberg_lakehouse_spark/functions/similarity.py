"""Similarity search over embedding columns (LLM-pipeline).

Brute-force cosine is the exactness baseline (map-only against a
broadcast query + top-k). The scale paths:

  * IVF: coarse quantization — assign every vector to its nearest
    centroid once (map-only vs broadcast centroids); a query probes
    only the nprobe nearest cells, turning a 100 TB scan into a
    cell-pruned scan. Centroids here are deterministically sampled
    (hash-ordered) — a production build would k-means them; the index
    structure and probe path are identical.
  * Hyperplane LSH: sign-bit sketches vs broadcast random hyperplanes →
    bucket-equality join for near-dup candidate pairs.

All arithmetic is F.aggregate/zip_with over double-cast arrays —
JVM-side, no UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: F.Column) -> F.Column:
    return F.sqrt(dot(a, a))


def cosine(a: F.Column, b: F.Column) -> F.Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# SQL-string twins of the Column helpers for HOT constructors: one
# F.expr/selectExpr parse replaces dozens of Py4J lambda-plumbing
# round-trips, the same plan-construction economy the minhash path got
# in r6 (functions/dedup_text.py) — the bench rebuilds each DataFrame
# per run, so construction time is inside the per-query timing
# (VERDICT r6 #4). The expression trees (fold order, casts, literal
# types) are identical to the Column versions — only the construction
# path differs.


def _dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        f"CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _l2_sql(a: str) -> str:
    return f"sqrt({_dot_sql(a, a)})"


def _cosine_sql(a: str, b: str) -> str:
    return f"({_dot_sql(a, b)} / ({_l2_sql(a)} * {_l2_sql(b)}))"


def _vec_sql(vec: list[float]) -> str:
    """A literal array<double> as one SQL string (repr keeps full
    precision; CAST pins the type exactly as F.lit(float) would)."""
    return (
        "array("
        + ", ".join(f"CAST({float(v)!r} AS DOUBLE)" for v in vec)
        + ")"
    )


def knn_bruteforce(
    df: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector. The query
    is a broadcast literal; the scan is map-only; top-k is
    TakeOrdered (no global sort materialization)."""
    q = _vec_sql(query_vec)
    return (
        df.selectExpr(
            id_col,
            f"round({_cosine_sql(vec_col, q)}, 6) AS cosine_sim",
        )
        .orderBy(F.desc("cosine_sim"), id_col)
        .limit(k)
    )


def build_ivf_index(
    df: DataFrame, id_col: str, vec_col: str, n_cells: int = 16,
    kmeans_iters: int = 3,
) -> tuple[DataFrame, list[dict]]:
    """Assign each vector to its nearest of n_cells centroids.

    Init: the n_cells vectors with smallest md5(id) — a deterministic
    pseudo-random sample. Refinement: ``kmeans_iters`` Lloyd iterations,
    each fully distributed — assignment is an argmax over broadcast
    centroid literals (map-only), the centroid update is one
    posexplode→groupBy(cell, dim) mean (shuffle carries n_cells×dim
    partial sums, not vectors), and only the n_cells×dim means are
    collected per iteration. Empty cells keep their previous centroid.
    Returns (assigned_df with 'cell' column, centroids as list of dicts).
    """
    cents = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_cells)
        .collect()
    )
    centroids = [
        {"cell": i, "vec": [float(x) for x in r[vec_col]]} for i, r in enumerate(cents)
    ]
    for _ in range(kmeans_iters):
        assigned = df.select(
            _nearest_cell(F.col(vec_col), centroids).alias("cell"),
            F.col(vec_col).alias("_v"),
        )
        means = (
            assigned.select("cell", F.posexplode("_v").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()  # n_cells × dim rows — centroid-sized, not data-sized
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["dim"]] = r["m"]
        for c in centroids:
            if c["cell"] in by_cell:
                dims = by_cell[c["cell"]]
                c["vec"] = [float(dims[d]) for d in sorted(dims)]
    assigned = df.withColumn("cell", _nearest_cell(F.col(vec_col), centroids))
    return assigned, centroids


def _nearest_cell(vec: F.Column, centroids: list[dict]) -> F.Column:
    """argmax-cosine over broadcast centroid literals, as one expression:
    array of (sim, cell) structs → array_max → .cell"""
    pairs = F.array(
        *[
            F.struct(
                cosine(vec, F.array(*[F.lit(x) for x in c["vec"]])).alias("sim"),
                F.lit(c["cell"]).alias("cell"),
            )
            for c in centroids
        ]
    )
    return F.array_max(pairs)["cell"]


def ivf_search(
    assigned: DataFrame,
    centroids: list[dict],
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Probe the nprobe cells nearest the query; exact cosine within."""
    import math

    def cos_py(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    probe = [
        c["cell"]
        for c in sorted(centroids, key=lambda c: -cos_py(c["vec"], query_vec))[:nprobe]
    ]
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = cosine(F.col(vec_col), q)
    return (
        assigned.where(F.col("cell").isin(probe))  # cell pruning = partition pruning
        .select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), id_col)
        .limit(k)
    )


def hyperplane_sketch(
    df: DataFrame, id_col: str, vec_col: str, hyperplanes: list[list[float]]
) -> DataFrame:
    """Sign-bit sketch vs broadcast hyperplanes → bitstring column."""
    bits = F.concat(
        *[
            F.when(
                dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in h])) >= 0,
                F.lit("1"),
            ).otherwise("0")
            for h in hyperplanes
        ]
    )
    return df.select(F.col(id_col), F.col(vec_col), bits.alias("sketch"))


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str | None = None,
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold.
    ``block_col`` (e.g. an LSH sketch or cluster label) bounds the join:
    only same-block pairs are compared — the difference between O(n²)
    and O(Σ block²) at 100 TB."""
    a = df.select(
        F.col(id_col).alias("left_id"),
        F.col(vec_col).alias("va"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    b = df.select(
        F.col(id_col).alias("right_id"),
        F.col(vec_col).alias("vb"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    joined = a.join(b, ["blk"]) if block_col else a.crossJoin(b)
    sim = cosine(F.col("va"), F.col("vb"))
    return (
        joined.where(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id", F.round(sim, 6).alias("cosine_sim"))
        .where(F.col("cosine_sim") >= threshold)
    )


def diverse_exemplars(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    kmeans_iters: int = 3,
) -> DataFrame:
    """Coverage-maximizing subset selection over an embedding column —
    the embedding-space counterpart of stratified sampling, and the
    standard cheap stand-in for k-center/greedy coreset selection in
    training-data curation (cluster the corpus, keep each cluster's
    most central member): k-means the vectors into ``k`` cells
    (deterministic md5 seeding + distributed Lloyd refinement, the
    same machinery the ANN indexes build on), then per cell pick the
    member with the HIGHEST cosine to its centroid, deterministic
    (similarity, id) tie-break. Returns one row per non-empty cell:
    (cell, id, centroid_sim, n_covered) where n_covered is the cell
    population the exemplar represents — the weights a
    diversity-weighted training mixture needs.

    Scale shape: the k-means build is bounded-iteration map-only
    assignment + centroid-sized mean shuffles over a persisted
    projection; exemplar selection is ONE max_by aggregation over the
    assignment (map-side partial maxima, k rows out). Nothing
    corpus-sized is ever collected — centroids and the k exemplar rows
    only."""
    if k <= 0:
        raise ValueError(f"k must be positive (got {k})")
    # persisted: the k-means build reads the projection kmeans_iters+1
    # times and the exemplar aggregation once more — same rationale as
    # the index builders
    src = df.select(F.col(id_col), F.col(vec_col)).persist()
    try:
        assigned, centroids = build_ivf_index(
            src, id_col, vec_col, n_cells=k, kmeans_iters=kmeans_iters,
        )
        cent_df = df.sparkSession.createDataFrame(
            [(int(c["cell"]), [float(x) for x in c["vec"]])
             for c in centroids],
            "cell long, _cvec array<double>",
        )
        sim = F.round(cosine(F.col(vec_col), F.col("_cvec")), 9)
        out = (
            assigned.join(F.broadcast(cent_df), "cell")
            .groupBy("cell")
            .agg(
                F.max_by(
                    F.col(id_col),
                    F.struct(sim.alias("s"),
                             (-F.col(id_col).cast("double")).alias("nid")),
                ).alias("id"),
                F.round(F.max(sim), 6).alias("centroid_sim"),
                F.count(F.lit(1)).alias("n_covered"),
            )
            .select(
                F.col("cell").cast("long").alias("cell"),
                F.col("id").alias(id_col),
                "centroid_sim", "n_covered",
            )
            .orderBy("cell")
        )
        # materialize before releasing the cache (callers get a plain
        # small result, not a plan over an unpersisted 5-pass build)
        rows = out.collect()
        return df.sparkSession.createDataFrame(rows, out.schema)
    finally:
        src.unpersist()
