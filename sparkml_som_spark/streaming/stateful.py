"""Custom stateful streaming operator via applyInPandasWithState:
a per-user running profile (event count, value sum, last-seen ts) that
survives across micro-batches.

This is the Spark-native replacement for hand-rolled stateful
operators: state lives in the state store (checkpointable, partitioned
by key), each micro-batch delivers Arrow batches per key, and the
watermark/timeout machinery bounds state growth at scale.

Note on recovery: state checkpointing requires a durable sink
(foreachBatch / kafka / file). The memory sink used in tests rejects
checkpoint resume by design.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_user_profile(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    last_ts = None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "last_ts": [last_ts],
        }
    )


def stateful_user_profile(stream: DataFrame) -> DataFrame:
    """Running per-user profile over an event stream. Output mode:
    update (one row per user per micro-batch that touched it)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
