"""Custom stateful streaming operator via applyInPandasWithState —
the SURVEY custom-operator strategy (b) applied to streams: per-user
running session state that Spark's built-in windowing can't express
(running counters carried across micro-batches with timeout-based
emission).

Operator: per-user activity tracker. State = {event_count, total_value,
last_ts}. Each micro-batch folds new events into the state; when a user
goes idle past the timeout, the state is emitted as a closed session
summary and cleared. This is the streaming analogue of gap
sessionization (operators/asof.sessionize) with bounded state.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = "event_count LONG, total_value DOUBLE, last_ts_ms LONG"

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_count", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("closed", T.BooleanType()),
    ]
)


def _track_user(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        count, total, _last = state.get
        state.remove()
        yield pd.DataFrame(
            [{"user_id": user_id, "event_count": count,
              "total_value": total, "closed": True}]
        )
        return

    count, total, last_ms = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        count += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        if len(pdf):
            last_ms = max(last_ms, int(pdf["ts"].max().value // 1_000_000))
    state.update((count, total, last_ms))
    try:
        state.setTimeoutDuration(30_000)  # close session after 30s idle
    except Exception:  # NoTimeout mode: duration not applicable
        pass
    yield pd.DataFrame(
        [{"user_id": user_id, "event_count": count,
          "total_value": total, "closed": False}]
    )


def user_activity_tracker(
    stream: DataFrame, idle_timeout: bool = True
) -> DataFrame:
    """events stream → per-user running/closed session summaries.

    State is per-key and bounded: one (count,total,ts) triple per
    active user; idle users time out and clear. At 1000 executors the
    state store shards by user hash — no global state.

    ``idle_timeout=False`` disables the processing-time timeout: use it
    for bounded replays (trigger availableNow never idles, so a
    processing-time timeout would keep the query alive waiting to fire;
    continuous deployments keep the default)."""
    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=conf,
        )
    )
