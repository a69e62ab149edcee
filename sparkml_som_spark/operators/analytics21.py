"""Analytics operators, round 5 eighteenth wave: timezone-local
reporting (the UTC-storage / local-reporting conversion every global
product needs) and audience segment algebra (per-user behavior flags
to segment-combination counts).

Scale discipline: both are one map-side-combined aggregate — the
timezone conversion is a per-row codegen expression feeding a bounded
(local-day, type) grid, and the segment cube is bounded by 2^flags
after a single per-user reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import register
from sparkml_som_spark.sources import load_table

_TZ = "America/New_York"


@register(
    "tz_local_day_rollup",
    sql=f"""
    SELECT CAST(timezone('{_TZ}', timezone('UTC', ts::TIMESTAMP)) AS DATE) AS local_day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4)     AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    desc=f"timezone-local reporting: UTC event times rolled up by {_TZ} local day; conversion parity pinned across engines",
)
def tz_local_day_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UTC-storage / local-reporting split: event timestamps are
    stored timezone-naive UTC; the report groups by the user-facing
    LOCAL calendar day (America/New_York, including the DST offset) —
    the conversion that silently shifts ~5 hours of each day's traffic
    into the neighboring local day if skipped.

    Engine parity note (pinned by the oracle): Spark's
    `convert_timezone('UTC', tz, ts)` equals DuckDB's nested
    `timezone(tz, timezone('UTC', ts))` — DuckDB's single-argument
    form interprets the naive input as ALREADY zone-local and
    diverges.  The conversion is per-row codegen feeding a bounded
    (local_day, type) aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    local_day = F.to_date(
        F.convert_timezone(F.lit("UTC"), F.lit(_TZ), F.col("ts"))
    ).alias("local_day")
    return ev.groupBy(local_day, "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@register(
    "segment_algebra_users",
    sql="""
    WITH u AS (
        SELECT user_id,
               bool_or(event_type = 'click')    AS did_click,
               bool_or(event_type = 'purchase') AS did_purchase,
               bool_or(event_type = 'error')    AS did_error
        FROM events WHERE ts < '2024-01-04' GROUP BY user_id
    )
    SELECT did_click, did_purchase, did_error,
           CASE WHEN did_purchase AND NOT did_error THEN 'converted_clean'
                WHEN did_purchase AND did_error     THEN 'converted_rocky'
                WHEN did_click                      THEN 'engaged_only'
                ELSE 'dormant' END AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM u
    GROUP BY 1, 2, 3
    """,
    desc="audience segment algebra: per-user behavior flags (bool_or) to a bounded 2^flags segment cube with named segments",
)
def segment_algebra_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience segmentation as set algebra: one per-user reduction
    derives behavior flags (clicked / purchased / errored), and the
    segment cube counts every flag combination with a named segment —
    the targeting table a campaign system joins against.  Flags are
    scoped to the first three days (over the full month every user
    eventually does everything, collapsing the cube to one cell).

    One shuffle on user_id (map-side combined bool_or), then an
    aggregate over the bounded 2^flags grid; no per-event joins, no
    self-joins — membership algebra happens on the flags, not by
    intersecting event sets.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("ts") < "2024-01-04")
    u = ev.groupBy("user_id").agg(
        F.bool_or(F.col("event_type") == "click").alias("did_click"),
        F.bool_or(F.col("event_type") == "purchase").alias("did_purchase"),
        F.bool_or(F.col("event_type") == "error").alias("did_error"),
    )
    segment = (
        F.when(F.col("did_purchase") & ~F.col("did_error"), "converted_clean")
        .when(F.col("did_purchase") & F.col("did_error"), "converted_rocky")
        .when(F.col("did_click"), "engaged_only")
        .otherwise("dormant")
    )
    return u.groupBy("did_click", "did_purchase", "did_error").agg(
        F.min(segment).alias("segment"),
        F.count(F.lit(1)).alias("n_users"),
    ).select("did_click", "did_purchase", "did_error", "segment", "n_users")


# --------------------------------------------------------------------------
# 3. exact-dyadic exponential smoothing (EWMA level forecast)
# --------------------------------------------------------------------------


@register(
    "ewma_forecast_daily",
    sql="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ), o AS (
        SELECT event_type, day, n,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS r
        FROM d
    ), lvl AS (
        WITH RECURSIVE s(event_type, r, level) AS (
            SELECT event_type, r, n::DOUBLE FROM o WHERE r = 1
            UNION ALL
            SELECT o.event_type, o.r, (o.n + s.level) / 2
            FROM s JOIN o ON o.event_type = s.event_type AND o.r = s.r + 1
        )
        SELECT event_type, MAX(r) AS n_days,
               MAX(CASE WHEN r = (SELECT MAX(r2.r) FROM s r2
                                  WHERE r2.event_type = s.event_type)
                        THEN level END) AS level
        FROM s GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_days AS BIGINT) AS n_days,
           level                   AS forecast_next_day
    FROM lvl
    """,
    desc="exponential smoothing (alpha=1/2, exact dyadic) over the bounded daily table; recursive-CTE oracle, bit-equal fold",
)
def ewma_forecast_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-smoothed forecast of tomorrow's event count per
    type: level_t = (y_t + level_{t-1}) / 2 over the daily counts.
    Alpha = 1/2 keeps every term an exact dyadic rational, so the
    sequentially-folded level is BIT-EQUAL across engines with no
    rounding quarantine — the decayed-counter trick applied to a
    recursive (not window-expressible) computation.

    The corpus reduces once to the bounded (type, day) count table;
    the fold runs per type over that bounded table via applyInPandas
    (one group per type — the `pack_greedy_capacity` shape); the
    DuckDB oracle replays the identical fold as a recursive CTE.
    """
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        level = None
        for n in pdf["n"]:
            level = float(n) if level is None else (float(n) + level) / 2.0
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [len(pdf)],
                "forecast_next_day": [level],
            }
        )

    return d.groupBy("event_type").applyInPandas(
        fold, "event_type string, n_days bigint, forecast_next_day double"
    )
