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
    destroy the ||q - c - r||^2 decomposition ADC depends on.

    r15 (guide §1.2 per-task work): the normalized vector is projected
    ONCE per row (``_nv``) and the m slice structs reference the alias
    — CollapseProject keeps a non-cheap alias that is referenced more
    than once, so the normalize fold (one interpreted 64-element
    aggregate + transform per evaluation — higher-order functions do
    not codegen) runs once per row instead of once per subvector.
    Measured: the PQ seed pass over sf0.1 embeddings dropped ~4×.
    Values are bit-identical — same expression, same inputs, just not
    re-evaluated m times."""
    nv = _normalize(F.col(vec_col)) if normalize else F.col(vec_col)
    pre = df.select(*keep, nv.alias("_nv"))
    return pre.select(
        *keep,
        F.explode(F.array(*[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(F.col("_nv"), s * subdim + 1, subdim).alias("sv"),
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


def _cands_df(spark, book: list[list[list[float]]]) -> DataFrame:
    """m rows of (sub, cands array<array<double>>), code-ordered — the
    per-sub codebook as broadcast DATA (never expression literals; see
    ``_l2sq_cols``). One row per subspace instead of one per (sub,
    code): joining it multiplies nothing, so the per-row argmin runs
    map-side over the candidate ARRAY instead of needing a ×ksub row
    blow-up + groupBy collapse (r15, guide §2.4)."""
    return spark.createDataFrame(
        [(s, ents) for s, ents in enumerate(book)],
        "sub int, _cands array<array<double>>",
    )


def _argmin_code(sv: F.Column, cands: F.Column) -> F.Column:
    """argmin-L2 code of subvector ``sv`` against the code-ordered
    candidate array — one map-side expression. ``array_min`` over
    (distance, code) structs compares lexicographically: smallest
    distance first, smallest code on ties — exactly the
    ``min_by(code, struct(_d, code))`` tie-break the old broadcast-
    join argmin used, over the same ``_l2sq_cols`` distances, so the
    assigned codes are bit-identical."""
    return F.array_min(
        F.transform(
            cands,
            lambda v, i: F.struct(
                _l2sq_cols(sv, v).alias("d"), i.alias("c")),
        )
    )["c"].cast("int")


def _train_codebook(
    df: DataFrame, vec_col: str, dim: int, m: int, ksub: int, iters: int,
    normalize: bool = True,
) -> list[list[list[float]]]:
    """codebook[sub][code] = centroid (subdim floats). One subvector
    explode, persisted; each Lloyd iteration is ONE job regardless of
    m — and, since r15, ONE tiny shuffle: the per-row code is an
    argmin expression against the m-row broadcast candidate table
    (``_argmin_code``), so the iteration is scan → map → partial-agg
    → codebook-sized exchange → collect. The old shape paid a ×ksub
    broadcast-join row blow-up, a corpus-sized groupBy(_rid, sub)
    argmin shuffle AND a corpus-sized re-join back to ``subs`` to
    recover the subvectors (plan-verified: Exchange 2 → 1 per
    iteration, the surviving one codebook-sized —
    plans/r15/pq_build_iteration_{before,after}.txt).
    Assigned codes are bit-identical (same distances, same tie-break);
    the (sub, code, dim) means are the same values averaged under the
    same grouping."""
    subdim = dim // m
    spark = df.sparkSession
    subs = _explode_subvectors(
        df.select(F.col(vec_col)),
        vec_col, m, subdim, keep=[], normalize=normalize,
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
            coded = (
                subs.join(F.broadcast(_cands_df(spark, book)), "sub")
                .select(
                    "sub",
                    _argmin_code(F.col("sv"), F.col("_cands"))
                    .alias("code"),
                    "sv",
                )
            )
            means = (
                coded
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


def _encode(df: DataFrame, vec_col: str, book: list[list[list[float]]],
            dim: int, m: int, keys: tuple[str, ...] = ("id",),
            normalize: bool = True) -> DataFrame:
    """(keys..., codes array<int>) — MAP-ONLY since r15 (guide §2.4):
    the whole codebook rides as one broadcast DATA row (array indexed
    by sub — never expression literals, the r8 lesson), and each row's
    m codes are a single zip_with of its subvector slices against the
    per-sub candidate arrays (``_argmin_code`` per pair — bit-identical
    distances and tie-break). The old shape exploded every vector into
    m rows, broadcast-joined ×ksub, and paid TWO corpus-sized shuffles
    (argmin groupBy + codes re-gather); this one has zero exchanges.
    ``keys`` lets the IVFADC composition carry the coarse cell id
    through encoding without a corpus-sized re-join. Callers that only
    hold the codebook TABLE collect it first (``_collect_book`` —
    codebook-sized, the probe path already does this)."""
    subdim = dim // m
    spark = df.sparkSession
    book_row = spark.createDataFrame(
        [(book,)], "_book array<array<array<double>>>")
    nv = _normalize(F.col(vec_col)) if normalize else F.col(vec_col)
    # _nv projected once per row and referenced by all m slices (the
    # m references keep CollapseProject from inlining the normalize
    # fold into each slice — see _explode_subvectors)
    pre = df.crossJoin(F.broadcast(book_row)).select(
        *keys, "_book", nv.alias("_nv"))
    svs = F.array(*[
        F.slice(F.col("_nv"), s * subdim + 1, subdim) for s in range(m)
    ])
    codes = F.zip_with(
        svs,
        F.col("_book"),
        lambda sv, cands: _argmin_code(sv, cands),
    )
    return pre.select(*keys, codes.alias("codes"))


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
    book_t.append(_book_df(spark, book))
    codes_t.append(_encode(src, "_v", book, dim, m))
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
    rows = _encode(src, "_v", _collect_book(bt, m), dim, m)
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
