"""Analytics operators, round 5 nineteenth wave: survival analysis
(Kaplan-Meier time-to-conversion with right censoring) and
prediction-interval coverage for the forecast baseline.

Scale discipline:

- the KM estimator reduces the corpus to one (duration, event) row
  per user (a single user-keyed aggregate), then to the bounded
  distinct-duration life table; the product-limit fold runs over
  that bounded table in strictly increasing duration order, so both
  engines multiply the SAME exact ratios in the SAME order and the
  survival curve is bit-equal (the EWMA fold argument, applied to
  products);
- interval coverage derives residual quantiles from the bounded
  daily-count table and audits empirical coverage against the SAME
  bounded table — no corpus-scale second pass.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import register
from sparkml_som_spark.sources import load_table

_KM_HORIZON = "2024-01-08"


@register(
    "survival_km_purchase",
    sql=f"""
    WITH s AS (
        SELECT user_id, MIN(ts) FILTER (WHERE event_type = 'signup') AS su
        FROM events WHERE ts < '{_KM_HORIZON}' GROUP BY user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS pu
        FROM events e JOIN s ON s.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s.su AND e.ts < '{_KM_HORIZON}'
        GROUP BY e.user_id
    ), obs AS (
        SELECT s.user_id,
               CASE WHEN p.pu IS NOT NULL THEN date_diff('day', s.su, p.pu)
                    ELSE date_diff('day', s.su, TIMESTAMP '{_KM_HORIZON}') END AS dur,
               p.pu IS NOT NULL AS event
        FROM s LEFT JOIN p ON p.user_id = s.user_id
        WHERE s.su IS NOT NULL
    ), lt AS (
        SELECT d.dur AS t,
               (SELECT COUNT(*) FROM obs WHERE obs.dur >= d.dur)          AS n_risk,
               (SELECT COUNT(*) FROM obs WHERE obs.dur = d.dur AND event) AS n_events
        FROM (SELECT DISTINCT dur FROM obs WHERE event) d
    ), o AS (
        SELECT t, n_risk, n_events,
               ROW_NUMBER() OVER (ORDER BY t) AS r
        FROM lt
    ), km AS (
        WITH RECURSIVE k(r, t, n_risk, n_events, surv) AS (
            SELECT r, t, n_risk, n_events,
                   1.0::DOUBLE - n_events::DOUBLE / n_risk
            FROM o WHERE r = 1
            UNION ALL
            SELECT o.r, o.t, o.n_risk, o.n_events,
                   k.surv * (1.0::DOUBLE - o.n_events::DOUBLE / o.n_risk)
            FROM k JOIN o ON o.r = k.r + 1
        )
        SELECT * FROM k
    )
    SELECT CAST(t AS BIGINT)        AS day,
           CAST(n_risk AS BIGINT)   AS n_risk,
           CAST(n_events AS BIGINT) AS n_events,
           surv                     AS survival
    FROM km
    """,
    desc="Kaplan-Meier time-to-purchase with right censoring at the horizon; product-limit fold bit-equal via exact ratio products",
)
def survival_km_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival analysis for conversion: the Kaplan-Meier
    product-limit estimate of 'still hasn't purchased after t days
    since signup', with users unconverted at the horizon RIGHT
    CENSORED (they inform the risk sets without counting as events) —
    the churn/conversion curve naive averages get wrong precisely
    because of censoring.

    The corpus reduces to one (duration, event) row per user, then to
    the bounded life table over distinct event durations; the
    survival product folds over that table in increasing-duration
    order, multiplying exact integer ratios — both engines fold the
    same values in the same order, so the curve is bit-equal (no
    rounding quarantine).
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("ts") < _KM_HORIZON)
    s = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("su")
    ).where(F.col("su").isNotNull())
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(F.col("ts") >= F.col("su"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pu"))
    )
    obs = s.join(p, "user_id", "left").select(
        F.when(
            F.col("pu").isNotNull(), F.datediff(F.col("pu"), F.col("su"))
        )
        .otherwise(F.datediff(F.lit(_KM_HORIZON).cast("timestamp"), F.col("su")))
        .alias("dur"),
        F.col("pu").isNotNull().alias("event"),
    )
    # life table: bounded by distinct event durations; risk counts via
    # a non-equi join against the bounded duration list (broadcast)
    durs = obs.where("event").select("dur").distinct()
    lt = (
        obs.crossJoin(F.broadcast(durs).withColumnRenamed("dur", "t"))
        .groupBy("t")
        .agg(
            F.count(F.when(F.col("dur") >= F.col("t"), 1)).alias("n_risk"),
            F.count(F.when((F.col("dur") == F.col("t")) & F.col("event"), 1)).alias(
                "n_events"
            ),
        )
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t").reset_index(drop=True)
        surv, out = 1.0, []
        for _, row in pdf.iterrows():
            surv = surv * (1.0 - float(row["n_events"]) / float(row["n_risk"]))
            out.append((int(row["t"]), int(row["n_risk"]), int(row["n_events"]), surv))
        return pd.DataFrame(out, columns=["day", "n_risk", "n_events", "survival"])

    return lt.withColumn("g", F.lit(1)).groupBy("g").applyInPandas(
        fold, "day bigint, n_risk bigint, n_events bigint, survival double"
    )


@register(
    "forecast_interval_coverage",
    sql="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ), r AS (
        SELECT a.event_type, a.day, a.n - f.n AS resid, a.n, f.n AS fc
        FROM d a JOIN d f
          ON f.event_type = a.event_type AND f.day = a.day - INTERVAL 7 DAY
    ), q AS (
        SELECT event_type,
               quantile_cont(resid, 0.1) AS lo,
               quantile_cont(resid, 0.9) AS hi
        FROM r GROUP BY event_type
    )
    SELECT r.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(MIN(q.lo), 4)      AS resid_p10,
           ROUND(MAX(q.hi), 4)      AS resid_p90,
           ROUND(COUNT(*) FILTER (WHERE r.n >= r.fc + q.lo AND r.n <= r.fc + q.hi)::DOUBLE
                 / COUNT(*), 6)     AS empirical_coverage
    FROM r JOIN q ON q.event_type = r.event_type
    GROUP BY r.event_type
    """,
    desc="prediction-interval audit: seasonal-naive residual p10/p90 band, empirical coverage measured on the bounded daily table",
)
def forecast_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prediction-interval calibration for the seasonal-naive
    baseline: take the p10/p90 band of forecast residuals per type
    and measure how often the actuals fall inside forecast+band —
    the coverage audit that tells you whether '80% interval' means
    80%.

    Residuals, quantiles, and the coverage count all live on the
    bounded daily-count table (exact interpolated percentiles as in
    the SLA entry); the band joins back as a bounded broadcast.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    a, f = d.alias("a"), d.alias("f")
    r = a.join(
        f,
        (F.col("f.event_type") == F.col("a.event_type"))
        & (F.col("f.day") == F.date_sub(F.col("a.day"), 7)),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.col("a.n") - F.col("f.n")).alias("resid"),
        F.col("a.n").alias("n"),
        F.col("f.n").alias("fc"),
    )
    q = r.groupBy("event_type").agg(
        F.percentile("resid", F.lit(0.1)).alias("lo"),
        F.percentile("resid", F.lit(0.9)).alias("hi"),
    )
    j = r.join(F.broadcast(q), "event_type")
    inside = F.count(
        F.when(
            (F.col("n") >= F.col("fc") + F.col("lo"))
            & (F.col("n") <= F.col("fc") + F.col("hi")),
            1,
        )
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.min("lo"), 4).alias("resid_p10"),
        F.round(F.max("hi"), 4).alias("resid_p90"),
        F.round(inside.cast("double") / F.count(F.lit(1)), 6).alias(
            "empirical_coverage"
        ),
    )
