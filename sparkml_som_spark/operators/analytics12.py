"""Analytics operators, round 5 ninth wave: distribution-drift
monitoring (total-variation distance), a seasonal-naive forecast
baseline with MAE/MAPE evaluation, interval-union coverage
(gaps-and-islands over overlapping intervals), and longest
active-day streaks.

Scale discipline, per operator:

- drift reduces each comparison window to a bounded (type, bucket)
  histogram first (map-side combine); the TV distance is computed
  over the bounded bucket grid joined with broadcast per-type totals
  — the corpus is scanned once and never joined row-to-row;
- the forecast evaluation self-joins the AGGREGATED daily-count
  table (bounded by the calendar) on an exact 7-day shift; errors
  are integer counts, so MAE/MAPE are exact-rational divisions;
- interval merging windows per user (bounded partitions) using the
  running-max-of-end prefix trick — the standard no-self-join
  interval-union shape, in exact integer microseconds;
- streaks use the date-minus-rank island anchor over the distinct
  (user, day) table: one shuffle on user_id, islands grouped with
  map-side combine, output bounded by users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import register
from sparkml_som_spark.sources import load_table


# --------------------------------------------------------------------------
# 1. distribution drift: total-variation distance between two periods
# --------------------------------------------------------------------------

_DRIFT_SPLIT = "2024-01-16"
_DRIFT_BUCKET = 50.0


@register(
    "drift_tv_distance",
    sql=f"""
    WITH b AS (
        SELECT event_type,
               CAST(FLOOR(value / {_DRIFT_BUCKET}) AS BIGINT) AS bucket,
               CASE WHEN ts < '{_DRIFT_SPLIT}' THEN 0 ELSE 1 END AS period
        FROM events
    ), h AS (
        SELECT event_type, bucket,
               COUNT(*) FILTER (WHERE period = 0) AS n0,
               COUNT(*) FILTER (WHERE period = 1) AS n1
        FROM b GROUP BY 1, 2
    ), tot AS (
        SELECT event_type, SUM(n0) AS t0, SUM(n1) AS t1 FROM h GROUP BY 1
    )
    SELECT h.event_type,
           CAST(MIN(tot.t0) AS BIGINT) AS n_before,
           CAST(MIN(tot.t1) AS BIGINT) AS n_after,
           ROUND(0.5 * SUM(ABS(h.n0::DOUBLE / tot.t0 - h.n1::DOUBLE / tot.t1)), 6)
               AS tv_distance
    FROM h JOIN tot ON tot.event_type = h.event_type
    GROUP BY h.event_type
    """,
    desc="distribution drift per event_type: total-variation distance between period value-histograms; exact count ratios, no libm",
)
def drift_tv_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-drift monitor: for each event_type, the total-variation
    distance between the value distributions of the first and second
    half of the month (bucketed at width 50) — TV = 0.5 * sum over
    buckets of |share_before - share_after|.  TV is the drift metric
    that needs no logarithm (unlike KL/PSI), so every term is an exact
    count ratio and the result is engine-stable.

    One corpus scan reduces to the bounded (type, bucket) histogram
    with map-side combine; per-type totals join back bounded; the
    final sum runs over <= |buckets| rows per type.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.floor(F.col("value") / _DRIFT_BUCKET).cast("long").alias("bucket"),
        F.when(F.col("ts") < _DRIFT_SPLIT, 0).otherwise(1).alias("period"),
    )
    h = b.groupBy("event_type", "bucket").agg(
        F.count(F.when(F.col("period") == 0, 1)).alias("n0"),
        F.count(F.when(F.col("period") == 1, 1)).alias("n1"),
    )
    tot = h.groupBy("event_type").agg(
        F.sum("n0").alias("t0"), F.sum("n1").alias("t1")
    )
    j = h.join(F.broadcast(tot), "event_type")
    return j.groupBy("event_type").agg(
        F.min("t0").alias("n_before"),
        F.min("t1").alias("n_after"),
        F.round(
            0.5
            * F.sum(
                F.abs(
                    F.col("n0").cast("double") / F.col("t0")
                    - F.col("n1").cast("double") / F.col("t1")
                )
            ),
            6,
        ).alias("tv_distance"),
    )


# --------------------------------------------------------------------------
# 2. seasonal-naive forecast baseline with MAE / MAPE evaluation
# --------------------------------------------------------------------------


@register(
    "forecast_seasonal_baseline",
    sql="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT a.event_type,
           CAST(COUNT(*) AS BIGINT)                              AS n_days,
           ROUND(AVG(ABS(a.n - f.n)), 6)                         AS mae,
           ROUND(AVG(ABS(a.n - f.n)::DOUBLE / a.n), 6)           AS mape
    FROM d a JOIN d f
      ON f.event_type = a.event_type AND f.day = a.day - INTERVAL 7 DAY
    GROUP BY a.event_type
    """,
    desc="seasonal-naive baseline (forecast = count 7 days earlier) evaluated with MAE/MAPE over the bounded daily table",
)
def forecast_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline evaluation: predict each day's event count
    with the count from 7 days earlier (the seasonal-naive baseline
    every real forecast must beat) and score MAE / MAPE per type.

    The corpus reduces once to the bounded (type, day) count table;
    the forecast join is a self-join of that BOUNDED table on an
    exact calendar shift — never a corpus-scale join.  Errors are
    integer count differences, so the scores are exact-rational
    averages.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    a = d.alias("a")
    f = d.alias("f")
    j = a.join(
        f,
        (F.col("f.event_type") == F.col("a.event_type"))
        & (F.col("f.day") == F.date_sub(F.col("a.day"), 7)),
    )
    err = F.abs(F.col("a.n") - F.col("f.n"))
    return j.groupBy(F.col("a.event_type").alias("event_type")).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.avg(err), 6).alias("mae"),
        F.round(F.avg(err.cast("double") / F.col("a.n")), 6).alias("mape"),
    )


# --------------------------------------------------------------------------
# 3. interval-union coverage per user (gaps-and-islands, overlap merge)
# --------------------------------------------------------------------------

_IVL_MINUTES = 30


@register(
    "interval_coverage_users",
    sql=f"""
    WITH iv AS (
        SELECT user_id, epoch_us(ts) AS s,
               epoch_us(ts) + {_IVL_MINUTES} * 60 * 1000000 AS e
        FROM events
    ), flagged AS (
        SELECT user_id, s, e,
               CASE WHEN s > MAX(e) OVER (
                        PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    OR MAX(e) OVER (
                        PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ), islands AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                     ROWS UNBOUNDED PRECEDING) AS island
        FROM flagged
    ), merged AS (
        SELECT user_id, island, MIN(s) AS ms, MAX(e) AS me
        FROM islands GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT)                        AS n_intervals,
           ROUND(SUM(me - ms) / 60000000.0, 4)             AS covered_minutes
    FROM merged GROUP BY user_id
    """,
    desc=f"interval-union coverage: merge overlapping {_IVL_MINUTES}-min activity intervals per user via the running-max-end prefix, exact micros",
)
def interval_coverage_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval algebra at scale: each event opens a 30-minute
    activity interval; overlapping intervals merge, and the query
    reports each user's merged-interval count and total covered
    minutes.

    The merge uses the running-max-of-end prefix over a per-user
    window — the textbook no-self-join interval-union — entirely in
    exact integer microseconds; the only float step is the final
    minutes conversion.  Partitions are bounded by one user's events.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    iv = ev.select(
        "user_id",
        us.alias("s"),
        (us + _IVL_MINUTES * 60 * 1000000).alias("e"),
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(
            F.col("s") > F.max("e").over(wprev), 1
        ).when(F.max("e").over(wprev).isNull(), 1).otherwise(0),
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(wrun))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(F.sum(F.col("me") - F.col("ms")) / 60000000.0, 4).alias(
            "covered_minutes"
        ),
    )


# --------------------------------------------------------------------------
# 4. longest consecutive-active-day streak per user
# --------------------------------------------------------------------------


@register(
    "streak_longest_active",
    sql="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), anchored AS (
        SELECT user_id, day,
               day - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
        FROM ud
    ), streaks AS (
        SELECT user_id, anchor, COUNT(*) AS len
        FROM anchored GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(MAX(len) AS BIGINT)   AS longest_streak,
           CAST(COUNT(*) AS BIGINT)   AS n_streaks,
           CAST(SUM(len) AS BIGINT)   AS active_days
    FROM streaks GROUP BY user_id
    """,
    desc="longest consecutive-day activity streak per user: date-minus-rank island anchors over the distinct (user, day) table",
)
def streak_longest_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement streaks: per user, the longest run of consecutive
    active days, the number of distinct runs, and total active days —
    the gaps-and-islands pattern with the date-minus-rank anchor
    (consecutive days share one anchor date because rank grows with
    the date).

    Shape: distinct (user, day) first (the only corpus-scale shuffle),
    then per-user rank windows over bounded partitions, then two
    bounded aggregations with map-side combine.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    anchored = ud.withColumn("anchor", F.date_sub("day", F.row_number().over(w)))
    streaks = anchored.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("len").alias("active_days"),
    )
