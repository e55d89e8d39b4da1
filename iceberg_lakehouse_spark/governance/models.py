"""Versioned quality-model registry (round 11 — r10 VERDICT #5).

``functions.quality_model`` trains per invocation: every scorer
retrains from scratch, nothing records WHICH weights scored a corpus,
and a retrain on drifted labels silently changes downstream filtering.
This module gives the classifier the same lifecycle discipline the
stats cache gives NDV estimates: trained weights persist as rows of a
small LakeTable (one row per version, stamped with the source table's
snapshot at training time), scoring uses the PINNED promoted version
until an explicit promotion, and the contracts layer can embed a
version's weights as a ``min_quality_score`` constraint.

Promotion is a table PROPERTY (``model.promoted_version``), not a row
update: version rows are immutable history (audit: what scored what,
when), the property is one CAS-committed pointer, and rollback is
re-pointing — the same pointer-over-immutable-rows shape as snapshot
time travel.

Scale shape: a model row is a handful of doubles — every registry
operation is metadata-sized. Scoring applies the weights as ONE
whole-stage-codegen projection over the target corpus
(``score_quality_classifier`` — no Python, no shuffle), so the
lifecycle layer adds zero per-row cost at 100 TB.

Reference analogue: none (the reference has no trainable components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import LakehouseCatalog, LakeTable
from ..functions.quality_model import (
    DEFAULT_LABEL_SQL,
    score_quality_classifier,
    train_quality_classifier,
)

_DDL = ("version long, weights array<double>, features array<string>, "
        "iters long, lr double, n long, source_table string, "
        "source_snapshot_id long, text_col string, label_sql string")

_PROMOTED = "model.promoted_version"


def _registry(catalog: LakehouseCatalog, name: str,
              create: bool = False) -> LakeTable:
    try:
        t = catalog.load_table(name)
    except ValueError:
        if not create:
            raise
        from pyspark.sql import types as T

        return catalog.create_table(
            name, T.StructType.fromDDL(_DDL),
            properties={_PROMOTED: "0"})
    if _PROMOTED not in t.properties():
        raise ValueError(
            f"{name} exists but is not a model registry (missing "
            f"{_PROMOTED} property)")
    return t


def train_and_register(
    catalog: LakehouseCatalog,
    name: str,
    source_table: str,
    text_col: str = "text",
    label_sql: str = DEFAULT_LABEL_SQL,
    lr: float = 0.5,
    iters: int = 8,
    promote: bool = False,
) -> dict:
    """Train on the source table's CURRENT snapshot and append the
    weights as the next version (version = max + 1; the registry is
    created on first use). The new version is NOT live until promoted
    — ``promote=True`` (first version, or an explicitly trusted
    retrain) promotes in the same call. Returns the version row plus
    ``promoted``. Single-trainer assumption (like every maintenance
    writer): two concurrent calls can race the version counter;
    ``load_model`` detects the resulting duplicate loudly rather than
    picking one silently."""
    src = catalog.load_table(source_table)
    cur = src.current_snapshot()
    if cur is None:
        raise ValueError(f"source table {source_table} is empty")
    model = train_quality_classifier(
        src.scan(), text_col=text_col, label_sql=label_sql,
        lr=lr, iters=iters)
    reg = _registry(catalog, name, create=True)
    prev = reg.scan().agg(F.max("version")).first()[0]
    version = int(prev or 0) + 1
    spark = src.scan().sparkSession
    reg.append(spark.createDataFrame(
        [(version, model["weights"], model["features"],
          model["iters"], float(model["lr"]), model["n"],
          f"{src.namespace}.{src.table}", cur.snapshot_id,
          text_col, label_sql)],
        _DDL,
    ))
    out = {
        "registry": name, "version": version,
        "weights": model["weights"], "features": model["features"],
        "n": model["n"], "source_snapshot_id": cur.snapshot_id,
        "promoted": False,
    }
    if promote:
        promote_model_version(catalog, name, version)
        out["promoted"] = True
    return out


def retrain_latest(catalog: LakehouseCatalog, name: str) -> dict:
    """Unattended retrain (the ``auto_retrain_model`` maintenance
    policy's action): re-run training on the latest version's source
    table at its CURRENT snapshot, with the latest version's recorded
    hyperparameters (text_col/label_sql/lr/iters), and register the
    result as the next version — NEVER promoted; production scoring
    stays pinned until someone promotes."""
    reg = _registry(catalog, name)
    latest = reg.scan().orderBy(F.desc("version")).first()
    if latest is None:
        raise ValueError(
            f"model registry {name} has no versions to retrain from")
    return train_and_register(
        catalog, name, latest["source_table"],
        text_col=latest["text_col"] or "text",
        label_sql=latest["label_sql"] or DEFAULT_LABEL_SQL,
        lr=float(latest["lr"]), iters=int(latest["iters"]),
        promote=False,
    )


def promote_model_version(catalog: LakehouseCatalog, name: str,
                          version: int) -> dict:
    """Point the live-scoring pointer at ``version`` (must exist)."""
    reg = _registry(catalog, name)
    if reg.scan().where(F.col("version") == version).count() == 0:
        raise ValueError(
            f"model registry {name} has no version {version}")
    reg.set_properties({_PROMOTED: str(int(version))})
    return {"registry": name, "promoted_version": int(version)}


def load_model(catalog: LakehouseCatalog, name: str,
               version: int | None = None) -> dict:
    """The promoted version's weights (or an explicit ``version``),
    as the same dict shape ``train_quality_classifier`` returns, plus
    ``version``/``source_snapshot_id`` provenance."""
    reg = _registry(catalog, name)
    if version is None:
        version = int(reg.properties()[_PROMOTED])
        if version == 0:
            raise ValueError(
                f"model registry {name} has no promoted version — "
                "train_and_register(..., promote=True) or "
                "promote_model_version first")
    rows = reg.scan().where(F.col("version") == version).collect()
    if not rows:
        raise ValueError(
            f"model registry {name} has no version {version}")
    if len(rows) > 1:
        # two concurrent train_and_register calls raced the version
        # counter (the registry assumes one trainer at a time, like
        # every maintenance writer) — refuse to pick one silently
        raise ValueError(
            f"model registry {name} has {len(rows)} rows for version "
            f"{version} — concurrent trainers raced; delete the "
            "duplicates and retrain")
    row = rows[0]
    from ..functions.quality_model import FEATURES

    current = [n for n, _, _ in FEATURES]
    stored = list(row["features"])
    if stored != current:
        # scoring applies CURRENT feature SQL to these pinned weights;
        # a FEATURES add/remove/reorder since training would silently
        # misalign them (r11 ADVICE) — refuse instead
        raise ValueError(
            f"model registry {name} version {version} was trained on "
            f"features {stored} but the current feature set is "
            f"{current} — the pinned weights cannot be applied; "
            "retrain (train_and_register) under the current features")
    return {
        "version": int(row["version"]),
        "weights": [float(x) for x in row["weights"]],
        "features": stored,
        "iters": int(row["iters"]), "lr": float(row["lr"]),
        "n": int(row["n"]),
        "source_table": row["source_table"],
        "source_snapshot_id": int(row["source_snapshot_id"]),
    }


def model_versions(catalog: LakehouseCatalog, name: str) -> list[dict]:
    """Audit view: every version (ascending) with its provenance and
    whether it is the promoted one."""
    reg = _registry(catalog, name)
    promoted = int(reg.properties()[_PROMOTED])
    return [
        {"version": int(r["version"]), "n": int(r["n"]),
         "source_table": r["source_table"],
         "source_snapshot_id": int(r["source_snapshot_id"]),
         "promoted": int(r["version"]) == promoted}
        for r in reg.scan().orderBy("version").collect()
    ]


def score_with_latest_model(
    catalog: LakehouseCatalog,
    name: str,
    df: DataFrame,
    text_col: str = "text",
    label_sql: str = DEFAULT_LABEL_SQL,
    version: int | None = None,
) -> DataFrame:
    """Score ``df`` with the PROMOTED version (or a pinned explicit
    one): adds ``quality_score``/``quality_label`` plus
    ``model_version`` provenance. One codegen projection — retraining
    never happens here, which is the point: a retrain that has not
    been promoted cannot change production scoring."""
    model = load_model(catalog, name, version=version)
    return score_quality_classifier(
        df, model, text_col=text_col, label_sql=label_sql
    ).withColumn("model_version", F.lit(model["version"]).cast("long"))


def quality_score_constraint(
    catalog: LakehouseCatalog,
    name: str,
    min_score: float,
    text_column: str = "text",
    version: int | None = None,
) -> dict:
    """A contracts-layer constraint dict: rows whose promoted-model
    quality score falls below ``min_score`` are violations. The
    weights are EMBEDDED (with their version) so contract validation
    is self-contained and pinned — a later promotion does not silently
    change what an existing contract enforces; re-issue the constraint
    to adopt a new version."""
    model = load_model(catalog, name, version=version)
    return {
        "type": "min_quality_score",
        "column": text_column,
        "min": float(min_score),
        "model_registry": name,
        "model_version": model["version"],
        "weights": model["weights"],
        "features": model["features"],
    }
