"""Persisted product-quantization (PQ) ANN index — the compressed
companion to the IVF index (``operators/ann_index.py``).

PQ (Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011 — public literature) splits each vector into ``m``
contiguous subvectors and vector-quantizes every subspace against its
own ``ksub``-entry codebook: a 64-dim float64 vector (512 bytes)
becomes ``m`` small codes (m bytes at ksub<=256) — the difference
between an index that fits in executor memory at 100 TB corpus scale
and one that does not. Search uses asymmetric distance computation
(ADC): the query stays exact; per sub-space distances from the query
slice to every codebook entry form an ``m x ksub`` lookup table
(driver-side, codebook-sized), and each candidate's approximate
distance is ``m`` table lookups — no vector math per row at probe
time, just integer indexing over the broadcast LUT literal.

Vectors are L2-NORMALIZED at encode and probe time, so squared-L2
ranking equals cosine ranking (||a-b||^2 = 2 - 2 cos on the unit
sphere) and the reported ``approx_cosine = 1 - dist/2`` is directly
comparable to the exact operators in ``functions/similarity.py``.

Storage — two ordinary snapshot tables (same discipline as the IVF and
dedup indexes):
  * ``<name>``            (id long, codes array<int>) — m bytes of
    payload per corpus vector;
  * ``<name>__codebook``  (sub int, code int, vec array<double>) —
    m x ksub rows, collected whole at probe time (codebook-sized,
    never corpus-sized).

Scale shape: codebook training explodes each vector into (sub,
subvector) rows ONCE and runs every Lloyd iteration as a single
map-only assignment + one (sub, code, dim)-keyed mean update whose
shuffle carries m x ksub x subdim partial sums — never vectors;
iteration count and m do not multiply the number of corpus scans.
Encoding is one map-only expression; probe is a scan of the CODES
table + TakeOrdered. Optional exact re-rank joins the top candidates
(bounded, broadcast) back to full vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import LakehouseCatalog, LakeTable
from ..functions.similarity import _py_l2, cosine, dot, l2_norm
from .dedup_index import _check_id_type

_PROPS = ("pq.m", "pq.ksub", "pq.dim")

_CODES_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("codes", T.ArrayType(T.IntegerType())),
])
_CODEBOOK_SCHEMA = T.StructType([
    T.StructField("sub", T.IntegerType()),
    T.StructField("code", T.IntegerType()),
    T.StructField("vec", T.ArrayType(T.DoubleType())),
])


def _codebook_name(name: str) -> str:
    return f"{name}__codebook"


def _normalize(vec: F.Column) -> F.Column:
    norm = F.sqrt(F.aggregate(
        vec, F.lit(0.0), lambda a, x: a + x * x))
    return F.transform(vec, lambda x: x / norm)


def _l2sq_cols(a: F.Column, b: F.Column) -> F.Column:
    """Squared L2 between two array columns — data-vs-data, so the plan
    stays tiny (no codebook literals baked into the expression tree;
    a 128-entry codebook as literals pushed plan compilation past the
    actual job cost in the first cut of this module)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def _explode_subvectors(df: DataFrame, vec_col: str, m: int,
                        subdim: int, keep: list[str],
                        normalize: bool = True) -> DataFrame:
    """(keep..., sub, sv): one map-only explode of each normalized
    vector into its m subvectors. ``normalize=False`` is the RESIDUAL
    path (operators/ivfpq.py): residuals are differences of already-
    normalized vectors and centroids — re-normalizing them would
    destroy the ||q - c - r||^2 decomposition ADC depends on."""
    nv = _normalize(F.col(vec_col)) if normalize else F.col(vec_col)
    return df.select(
        *keep,
        F.explode(F.array(*[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(nv, s * subdim + 1, subdim).alias("sv"),
            )
            for s in range(m)
        ])).alias("e"),
    ).select(*keep, F.col("e.sub").alias("sub"), F.col("e.sv").alias("sv"))


def _book_df(spark, book: list[list[list[float]]]) -> DataFrame:
    return spark.createDataFrame(
        [(s, i, c) for s, ents in enumerate(book) for i, c in
         enumerate(ents)],
        _CODEBOOK_SCHEMA,
    )


def _assign_codes(subs: DataFrame, book_df: DataFrame,
                  keys: list[str]) -> DataFrame:
    """argmin-L2 code per (keys..., sub): broadcast-join the codebook
    (m x ksub rows) and min_by with a deterministic (distance, code)
    tie-break. The join multiplies rows by ksub, map-side, then the
    aggregate collapses them — no shuffle grows beyond the subvector
    explosion itself."""
    j = subs.join(F.broadcast(book_df), "sub")
    return (
        j.withColumn("_d", _l2sq_cols(F.col("sv"), F.col("vec")))
        .groupBy(*keys, "sub")
        .agg(F.min_by("code", F.struct("_d", "code")).alias("code"))
    )


def _train_codebook(
    df: DataFrame, vec_col: str, dim: int, m: int, ksub: int, iters: int,
    normalize: bool = True,
) -> list[list[list[float]]]:
    """codebook[sub][code] = centroid (subdim floats). One subvector
    explode, persisted; each Lloyd iteration is ONE job (broadcast
    codebook join -> argmin -> codebook-sized mean update) regardless
    of m."""
    subdim = dim // m
    spark = df.sparkSession
    subs = _explode_subvectors(
        df.select(F.monotonically_increasing_id().alias("_rid"),
                  F.col(vec_col)),
        vec_col, m, subdim, keep=["_rid"], normalize=normalize,
    ).persist()
    try:
        # deterministic seeds: per sub, the ksub hash-smallest rows
        from pyspark.sql import Window

        w = Window.partitionBy("sub").orderBy(
            F.md5(F.col("sv").cast("string")))
        seeds = (
            subs.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= ksub)
            .collect()
        )
        book: list[list[list[float]]] = [[] for _ in range(m)]
        for r in seeds:
            book[int(r["sub"])].append([float(x) for x in r["sv"]])
        for s in range(m):
            if not book[s]:
                raise ValueError("cannot train a PQ codebook on an "
                                 "empty corpus")
        for _ in range(max(iters, 0)):
            assigned = _assign_codes(subs, _book_df(spark, book), ["_rid"])
            means = (
                assigned.join(subs, ["_rid", "sub"])
                .select("sub", "code", F.posexplode("sv").alias("dim", "x"))
                .groupBy("sub", "code", "dim")
                .agg(F.avg("x").alias("mu"))
                .collect()  # m x ksub x subdim rows — codebook-sized
            )
            upd: dict[tuple[int, int], dict[int, float]] = {}
            for r in means:
                upd.setdefault((int(r["sub"]), int(r["code"])), {})[
                    int(r["dim"])] = float(r["mu"])
            for (s, code), dims in upd.items():
                if code < len(book[s]):
                    book[s][code] = [dims[d] for d in sorted(dims)]
        return book
    finally:
        subs.unpersist()


def _encode(df: DataFrame, vec_col: str, book_df: DataFrame,
            dim: int, m: int, keys: tuple[str, ...] = ("id",),
            normalize: bool = True) -> DataFrame:
    """(keys..., codes array<int>) via the same broadcast-join argmin
    as training, then codes gathered in subspace order. ``keys`` lets
    the IVFADC composition carry the coarse cell id through encoding
    without a corpus-sized re-join."""
    subdim = dim // m
    keep = list(keys)
    subs = _explode_subvectors(df, vec_col, m, subdim, keep=keep,
                               normalize=normalize)
    assigned = _assign_codes(subs, book_df, keep)
    return (
        assigned.groupBy(*keep)
        .agg(F.array_sort(
            F.collect_list(F.struct("sub", "code"))).alias("_sc"))
        .select(
            *keep,
            F.transform(F.col("_sc"), lambda x: x["code"].cast("int"))
            .alias("codes"),
        )
    )


def build_pq_index(
    catalog: LakehouseCatalog,
    name: str,
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    ksub: int = 16,
    kmeans_iters: int = 2,
) -> LakeTable:
    """Train the m-subspace codebook, encode the corpus, persist both.
    Returns the codes LakeTable (the codebook rides alongside)."""
    if m <= 0 or ksub <= 1:
        raise ValueError("m must be positive and ksub > 1")
    _check_id_type(df, id_col)
    first = (
        df.where(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)).alias("d")).first()
    )
    if first is None:
        raise ValueError("cannot build a PQ index over an empty corpus")
    dim = int(first["d"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} is not divisible by m={m}")
    bad = df.where(
        F.col(vec_col).isNull() | (F.size(F.col(vec_col)) != dim)
    ).count()
    if bad:
        raise ValueError(
            f"{bad} vector(s) are NULL or not {dim}-dimensional"
        )
    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    book = _train_codebook(src, "_v", dim, m, ksub, kmeans_iters)
    props = {"pq.m": str(m), "pq.ksub": str(ksub), "pq.dim": str(dim)}
    codes_t = catalog.create_table(name, _CODES_SCHEMA, properties=props)
    book_t = catalog.create_table(_codebook_name(name), _CODEBOOK_SCHEMA)
    spark = df.sparkSession
    bdf = _book_df(spark, book)
    book_t.append(bdf)
    codes_t.append(_encode(src, "_v", bdf, dim, m))
    return codes_t


def _load(catalog: LakehouseCatalog, name: str):
    ct = catalog.load_table(name)
    props = ct.properties()
    missing = [p for p in _PROPS if p not in props]
    if missing:
        raise ValueError(
            f"table {name} is not a PQ index (missing properties: "
            f"{missing})")
    bt = catalog.load_table(_codebook_name(name))
    return ct, bt, int(props["pq.m"]), int(props["pq.ksub"]), int(
        props["pq.dim"])


def _collect_book(bt: LakeTable, m: int) -> list[list[list[float]]]:
    book: list[dict[int, list[float]]] = [dict() for _ in range(m)]
    for r in bt.scan().collect():
        book[int(r["sub"])][int(r["code"])] = [float(x) for x in r["vec"]]
    return [[sub[c] for c in sorted(sub)] for sub in book]


def extend_pq_index(
    catalog: LakehouseCatalog,
    name: str,
    new_df: DataFrame,
    id_col: str,
    vec_col: str,
) -> int:
    """Encode a new batch against the FROZEN codebook (map-only) and
    append. Quantization error drifts if the corpus distribution moves
    — rebuild when pq_index_stats shows dead codes piling up."""
    ct, bt, m, _ksub, dim = _load(catalog, name)
    _check_id_type(new_df, id_col)
    bad = new_df.where(
        F.col(vec_col).isNull() | (F.size(F.col(vec_col)) != dim)
    ).count()
    if bad:
        raise ValueError(
            f"{bad} vector(s) are NULL or not {dim}-dimensional")
    src = new_df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    rows = _encode(src, "_v", bt.scan(), dim, m)
    rows = rows.persist()
    try:
        n = rows.count()
        ct.append(rows)
    finally:
        rows.unpersist()
    return n


def probe_pq_index(
    catalog: LakehouseCatalog,
    name: str,
    query_vec: list[float],
    k: int = 10,
    refine_with: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_factor: int = 4,
) -> DataFrame:
    """Top-k by ADC: build the m x ksub LUT driver-side from the
    collected codebook, score every code row with m array lookups
    (map-only over the CODES table — no vector math per row), take the
    top candidates. With ``refine_with`` (an (id, vector) DataFrame,
    e.g. the original corpus), the top k x refine_factor candidates are
    re-ranked by EXACT cosine via a broadcast semi-join — candidates
    are bounded, so the exact pass is candidate-sized."""
    import math

    ct, bt, m, ksub, dim = _load(catalog, name)
    if len(query_vec) != dim:
        raise ValueError(
            f"query vector has {len(query_vec)} dims, index has {dim}")
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    q = [float(x) / qn for x in query_vec]
    book = _collect_book(bt, m)
    subdim = dim // m
    lut: list[float] = []
    for s in range(m):
        qs = q[s * subdim:(s + 1) * subdim]
        ents = book[s]
        for code in range(ksub):
            if code < len(ents):
                c = ents[code]
                lut.append(sum((a - b) * (a - b) for a, b in zip(qs, c)))
            else:
                lut.append(float("inf"))  # untrained code — never wins
    lut_col = F.array(*[F.lit(v) for v in lut])
    dist = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.element_at(
                lut_col,
                (s * ksub
                 + F.element_at(F.col("codes"), s.cast("int") + 1)
                 + 1).cast("int"),
            ),
        ),
        F.lit(0.0), lambda a, x: a + x,
    )
    scored = (
        ct.scan()
        .select("id", F.round(1 - dist / 2, 6).alias("approx_cosine"))
        .orderBy(F.desc("approx_cosine"), "id")
    )
    if refine_with is None:
        return scored.limit(k)
    cand = scored.limit(max(k, k * refine_factor)).select("id")
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        refine_with.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .join(F.broadcast(cand), "id", "left_semi")
        # r14: query norm pre-folded on the driver (_py_l2 —
        # bit-identical); one fold saved per refined candidate.
        .select("id", F.round(dot(F.col("_v"), qcol)
                              / (l2_norm(F.col("_v"))
                                 * F.lit(_py_l2(query_vec))), 6)
                .alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), "id")
        .limit(k)
    )


def pq_index_stats(catalog: LakehouseCatalog, name: str) -> dict:
    """Compression ratio + per-subspace code utilization (dead codes =
    rebuild signal on a drifted corpus)."""
    ct, bt, m, ksub, dim = _load(catalog, name)
    n = ct.scan().count()
    used = (
        ct.scan()
        .select(F.posexplode("codes").alias("sub", "code"))
        .groupBy("sub")
        .agg(F.countDistinct("code").alias("used"))
        .collect()
    )
    util = {int(r["sub"]): int(r["used"]) for r in used}
    return {
        "index": name, "rows": n, "m": m, "ksub": ksub, "dim": dim,
        "bytes_per_vector_raw": dim * 8,
        "bytes_per_vector_pq": m,
        "compression_ratio": (dim * 8) / m,
        "code_utilization": {
            s: {"used": util.get(s, 0), "ksub": ksub} for s in range(m)
        },
    }
