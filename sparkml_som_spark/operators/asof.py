"""Generic as-of (point-in-time) join, DataFrame-native.

Spark has no built-in as-of join (pandas-on-Spark `merge_asof` exists
but routes through pandas). This implements the classic
union-and-carry-forward form: tag right rows, union with left rows,
sort within each key partition by (ts, side) and carry the latest right
value forward with ``last(..., ignorenulls=True)``.

Scale: ONE shuffle by key (window partition), no range explosion, no
per-row Python — this is the shape that survives 100 TB, unlike a
range-join (O(n*m) per key) or a collect-based loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row (right_ts <=
    left_ts) with the same key. Left rows with no prior right row get
    nulls (left-asof semantics, matching DuckDB ``ASOF LEFT JOIN``).
    """
    lcols = left.columns
    r = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    l = left.select(
        F.col(on).alias(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    # side=0 sorts before side=1 at equal ts => right row at exactly
    # left_ts matches (>= semantics, like ASOF's default). The value
    # columns extend the ordering so ties between right rows sharing
    # (key, ts) resolve deterministically (greatest value wins) instead
    # of by partition-internal order.
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col("__ts").asc(),
            F.col("__side").asc(),
            *[F.col(f"__r_{c}").asc_nulls_first() for c in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried: list[Column] = [
        F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in value_cols
    ]
    return (
        l.unionByName(r)
        .select("*", *carried)
        .where(F.col("__side") == 1)
        .select(*[F.col(f"__l_{c}").alias(c) for c in lcols], *[f"{c}{suffix}" for c in value_cols])
    )
