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

from sparkml_som_spark.functions import round_half_away as _round_half_away


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
            "total_value": [_round_half_away(total)],
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


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas twin: the successor API to
# applyInPandasWithState.  Differences that matter at scale: typed state
# handles (ValueState/ListState/MapState) instead of one opaque tuple,
# per-state TTL support, and timers decoupled from the output mode.
# Same per-key running profile as `stateful_user_profile` so the two
# APIs can be asserted equal on identical input.
# ---------------------------------------------------------------------------

try:  # pragma: no cover - import guard for older builds / broken deps
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    # the TWS state protocol speaks protobuf (StateMessage_pb2); a broken
    # google.protobuf (as in this container) crashes the driver worker at
    # runtime, so gate on it up front
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    _HAS_TWS = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAS_TWS = False


class UserProfileProcessor(StatefulProcessor):
    """ValueState-backed running (n_events, total_value) per user."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._state = handle.getValueState(
            "profile", "n_events long, total_value double"
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, total = (self._state.get() or (0, 0.0)) if self._state.exists() else (0, 0.0)
        last_ts = None
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
        self._state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [_round_half_away(total)],
                "last_ts": [last_ts],
            }
        )

    def close(self) -> None:
        pass


def stateful_user_profile_tws(stream: DataFrame) -> DataFrame:
    """`transformWithStateInPandas` form of the per-user profile."""
    if not _HAS_TWS:
        raise NotImplementedError(
            "transformWithStateInPandas needs Spark >= 4.0 and a working "
            "google.protobuf install (the TWS state protocol)"
        )
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
