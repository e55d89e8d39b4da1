"""Streaming → lakehouse sinks: land a stream into a snapshot table.

The missing half of the streaming story: `events.py` reads/transforms,
this module writes results into `LakeTable`s with exactly-once-per-
micro-batch semantics via foreachBatch. Each micro-batch commits one
snapshot, so time travel / CDC / incremental readers downstream see
stream progress as ordinary snapshot history — the same contract batch
writers get.

Modes:
  * append  — blind append (immutable event logs);
  * upsert  — MERGE by key per batch (dimension/state tables fed by a
    changelog stream); uses operators.crud.merge_into, so the incoming
    batch side is a DataFrame (no driver round-trip) and AQE picks the
    join strategy;
  * dedup_append — append only rows whose keys are not yet in the
    table (idempotent landing for at-least-once upstreams), as a
    left_anti join against the current snapshot.

At 100 TB the per-batch work is bounded by batch size, not table size,
except dedup_append's anti-join probe — for that, keep the key set
narrow (the anti-join shuffles only the key columns of the table side
after column pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..catalog import LakeTable
from ..operators import crud


def stream_to_table(
    stream: DataFrame,
    table: LakeTable,
    mode: str = "append",
    key_columns: list[str] | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Start a foreachBatch query landing ``stream`` into ``table``."""
    if mode in ("upsert", "dedup_append") and not key_columns:
        raise ValueError(f"mode {mode!r} requires key_columns")
    if mode not in ("append", "upsert", "dedup_append"):
        raise ValueError(f"unknown mode {mode!r}")

    def land(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if mode == "append":
            table.append(batch)
        elif mode == "upsert":
            crud.merge_into(table, batch, key_columns)
        else:  # dedup_append
            existing = table.scan().select(*key_columns)
            fresh = batch.dropDuplicates(key_columns).join(
                existing, key_columns, "left_anti"
            )
            if not fresh.isEmpty():
                table.append(fresh)

    writer = stream.writeStream.foreachBatch(land).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def curate_documents_stream(
    stream: DataFrame,
    table: LakeTable,
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 1000,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming corpus curation — the readStream twin of the batch
    ``curated_corpus`` composition: per micro-batch, (1) token-length
    band filter, (2) PII redaction (emails/phones → placeholders),
    (3) content fingerprinting, then (4) exact-dedup landing against
    the WHOLE table history (dedup_append on the fingerprint), so a
    document seen in any earlier batch never lands twice.

    Every transform is a native Column expression evaluated map-side
    inside the micro-batch; the only table-sized work is the
    dedup_append anti-join probe, which column-prunes to the
    fingerprint. The target table needs (…, ``text_col``, n_tokens,
    fp) columns; extra stream columns pass through. Tokenization and
    PII patterns come from the shared modules (functions.dedup_text /
    functions.pii) so the stream twin can't drift from the batch ops —
    and the email match is case-insensitive (a mixed-case email is
    still PII, and an unredacted copy would split the fingerprint)."""
    from pyspark.sql import functions as F

    from ..functions.dedup_text import tokens_col
    from ..functions.pii import redact

    n_tokens = (
        F.when(F.trim(F.col(text_col)) == "", 0)
        .otherwise(F.size(tokens_col(text_col)))
        .cast("bigint")
    )
    curated = (
        stream.withColumn("n_tokens", n_tokens)
        .where(F.col("n_tokens").between(min_tokens, max_tokens))
        .withColumn(text_col, redact(text_col))
        .withColumn("fp", F.md5(F.trim(F.lower(F.col(text_col)))))
    )
    return stream_to_table(
        curated,
        table,
        mode="dedup_append",
        key_columns=["fp"],
        checkpoint_dir=checkpoint_dir,
        available_now=available_now,
    )
