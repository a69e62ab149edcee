"""Analytics operators, round 5 eighth wave: experimentation readout
(two-proportion z-test), period-over-period reporting, a streaming
twin of the OHLC bars, and mean-reciprocal-rank audit of the
matryoshka prefix retrieval.

Scale discipline, per operator:

- the A/B readout reduces the corpus to one row per user (user-keyed
  aggregate), then to one row per arm, then to ONE result row — the
  z statistic is computed from four integers with IEEE-exact sqrt /
  division, so both engines emit identical bits;
- week-over-week growth lags over the AGGREGATED weekly table (345
  rows at sf0.01 — bounded by the calendar, not the corpus), never
  over raw orders;
- the streaming bars run the same watermark + windowed min_by/max_by
  aggregation Structured Streaming would run on a live feed; the
  AvailableNow drain makes the complete-mode sink deterministic and
  therefore value-hash comparable to the batch formula;
- prefix-MRR reuses `_dual_rankings` (one corpus stream vs broadcast
  queries) and audits only q rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import register
from sparkml_som_spark.sources import load_table


# --------------------------------------------------------------------------
# 1. A/B experiment readout: two-proportion z-test
# --------------------------------------------------------------------------


@register(
    "abtest_two_proportion",
    sql="""
    WITH s AS (
        SELECT user_id,
               MIN(ts) FILTER (WHERE event_type = 'signup')   AS su,
               MIN(ts) FILTER (WHERE event_type = 'purchase') AS pu
        FROM events GROUP BY 1
    ), u AS (
        SELECT user_id % 2 AS arm,
               CASE WHEN pu IS NOT NULL AND pu <= su + INTERVAL 2 DAY
                    THEN 1 ELSE 0 END AS conv
        FROM s WHERE su IS NOT NULL
    ), a AS (
        SELECT
            CAST(COUNT(*) FILTER (WHERE arm = 0) AS BIGINT) AS n_a,
            CAST(COUNT(*) FILTER (WHERE arm = 1) AS BIGINT) AS n_b,
            CAST(SUM(conv) FILTER (WHERE arm = 0) AS BIGINT) AS conv_a,
            CAST(SUM(conv) FILTER (WHERE arm = 1) AS BIGINT) AS conv_b
        FROM u
    )
    SELECT n_a, n_b, conv_a, conv_b,
           ROUND(conv_a::DOUBLE / n_a, 6) AS rate_a,
           ROUND(conv_b::DOUBLE / n_b, 6) AS rate_b,
           ROUND((conv_a::DOUBLE / n_a - conv_b::DOUBLE / n_b) /
                 sqrt(((conv_a + conv_b)::DOUBLE / (n_a + n_b)) *
                      (1 - (conv_a + conv_b)::DOUBLE / (n_a + n_b)) *
                      (1.0 / n_a + 1.0 / n_b)), 4) AS z_score,
           abs((conv_a::DOUBLE / n_a - conv_b::DOUBLE / n_b) /
               sqrt(((conv_a + conv_b)::DOUBLE / (n_a + n_b)) *
                    (1 - (conv_a + conv_b)::DOUBLE / (n_a + n_b)) *
                    (1.0 / n_a + 1.0 / n_b))) > 1.96 AS significant_95
    FROM a
    """,
    desc="two-proportion z-test: arms by user parity, conversion = purchase within 2 days of first signup; IEEE-exact statistic",
)
def abtest_two_proportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout: users split into arms by id parity (the
    deterministic stand-in for a bucketing service); conversion =
    first purchase within 2 days of first signup; pooled two-proportion
    z statistic with a 95% significance flag.

    The corpus collapses to one row per user in a single user-keyed
    aggregate, then to one result row.  sqrt and division on doubles
    are correctly-rounded IEEE ops, so the statistic is bit-identical
    across engines with no rounding quarantine needed before the
    final ROUND.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("su"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("pu"),
    )
    u = s.where(F.col("su").isNotNull()).select(
        (F.col("user_id") % 2).alias("arm"),
        F.when(
            F.col("pu").isNotNull()
            & (F.col("pu") <= F.col("su") + F.expr("INTERVAL 2 DAY")),
            1,
        )
        .otherwise(0)
        .alias("conv"),
    )
    a = u.agg(
        F.count(F.when(F.col("arm") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("arm") == 1, 1)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv"))).alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv"))).alias("conv_b"),
    )
    ra = F.col("conv_a").cast("double") / F.col("n_a")
    rb = F.col("conv_b").cast("double") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (ra - rb) / F.sqrt(
        pp * (1 - pp) * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return a.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        F.round(z, 4).alias("z_score"),
        (F.abs(z) > 1.96).alias("significant_95"),
    )


# --------------------------------------------------------------------------
# 2. week-over-week growth over the aggregated weekly table
# --------------------------------------------------------------------------


@register(
    "wow_revenue_growth",
    sql="""
    WITH wk AS (
        SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
               ROUND(SUM(o_totalprice), 4) AS revenue
        FROM orders GROUP BY 1
    )
    SELECT week, revenue,
           lag(revenue) OVER (ORDER BY week) AS prev_revenue,
           ROUND((revenue - lag(revenue) OVER (ORDER BY week)) /
                 lag(revenue) OVER (ORDER BY week), 6) AS wow_growth
    FROM wk
    QUALIFY prev_revenue IS NOT NULL
    """,
    desc="week-over-week revenue growth: lag over the bounded aggregated weekly table, never over raw orders",
)
def wow_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period reporting: weekly revenue with the previous
    week's value and the relative change.

    The lag window runs over the AGGREGATED weekly table — bounded by
    the calendar (345 weeks here), so the single-partition global
    ordering is a non-issue at any corpus size; the corpus-scale work
    is one map-side-combined aggregate.  Revenue is rounded once at
    the weekly row (quarantining engine sum-order noise); the growth
    ratio of two already-rounded doubles is then engine-exact.
    """
    o = load_table(spark, sf_dir, "orders")
    wk = o.groupBy(
        F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("week")
    ).agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"))
    w = Window.orderBy("week")
    return (
        wk.select(
            "week",
            "revenue",
            F.lag("revenue").over(w).alias("prev_revenue"),
        )
        .where(F.col("prev_revenue").isNotNull())
        .select(
            "week",
            "revenue",
            "prev_revenue",
            F.round(
                (F.col("revenue") - F.col("prev_revenue")) / F.col("prev_revenue"), 6
            ).alias("wow_growth"),
        )
    )


# --------------------------------------------------------------------------
# 3. streaming OHLC bars (twin of ohlc_daily_event_value)
# --------------------------------------------------------------------------


@register(
    "stream_ohlc_bars",
    sql="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           event_type,
           ROUND(arg_min(value, ts), 4) AS open,
           ROUND(MAX(value), 4)         AS high,
           ROUND(MIN(value), 4)         AS low,
           ROUND(arg_max(value, ts), 4) AS close,
           ROUND(SUM(value), 4)         AS volume,
           CAST(COUNT(*) AS BIGINT)     AS n_events
    FROM events
    GROUP BY 1, 2
    """,
    desc="streaming OHLC bars: watermark + 1-day window min_by/max_by aggregation, complete-mode sink oracle-audited",
)
def stream_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `ohlc_daily_event_value`: the same bars
    maintained by Structured Streaming — watermarked event time, 1-day
    windows, min_by/max_by for open/close — drained via AvailableNow
    into a memory sink and hash-compared to the batch formula.

    (event_type, ts) is duplicate-free in this dataset at every SF
    (verified), so ordering open/close by ts alone is deterministic
    and matches DuckDB's arg_min/arg_max.  State is bounded by the
    watermark; min_by/max_by are declarative aggregates, so the
    streaming plan keeps partial aggregation.
    """
    from sparkml_som_spark.operators.streaming_queries import (
        _run_to_memory,
        _stream_source,
    )

    stream, key = _stream_source(spark, sf_dir)
    bars = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.round(F.min_by("value", "ts"), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", "ts"), 4).alias("close"),
            F.round(F.sum("value"), 4).alias("volume"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "volume",
            "n_events",
        )
    )
    return _run_to_memory(
        spark, bars, f"sgs_stream_ohlc_{key}".replace(".", "_"), "complete"
    )


# --------------------------------------------------------------------------
# 4. prefix-retrieval MRR audit
# --------------------------------------------------------------------------


@register(
    "mrr_prefix_rank",
    sql="""
    WITH q AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5
    ), full_r AS (
        SELECT q.vec_id AS query_id, e.vec_id AS nid,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                            e.vec_id
               ) AS r
        FROM q JOIN embeddings e ON e.vec_id <> q.vec_id
    ), pre_r AS (
        SELECT q.vec_id AS query_id, e.vec_id AS nid,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(
                                (q.embedding::DOUBLE[])[1:16],
                                (e.embedding::DOUBLE[])[1:16]) DESC,
                            e.vec_id
               ) AS r
        FROM q JOIN embeddings e ON e.vec_id <> q.vec_id
    )
    SELECT f.query_id,
           f.nid                                    AS top1_nid,
           CAST(p.r AS BIGINT)                      AS prefix_rank,
           ROUND(1.0::DOUBLE / p.r, 6)              AS reciprocal_rank
    FROM (SELECT * FROM full_r WHERE r = 1) f
    JOIN pre_r p ON p.query_id = f.query_id AND p.nid = f.nid
    """,
    desc="MRR audit of prefix retrieval: where the full-dim top-1 lands in the 16-dim ranking; exact 1/rank",
)
def mrr_prefix_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank audit of the matryoshka prefix ranking: for
    each query, find where the TRUE (full-dimension) nearest neighbor
    lands in the 16-dim prefix ordering; 1/rank is the per-query MRR
    contribution — an exact rational, no libm.

    Reuses `_dual_rankings` (one corpus stream against broadcast
    queries); the audit output is q rows.
    """
    from sparkml_som_spark.operators.analytics10 import _dual_rankings

    ranked = _dual_rankings(spark, sf_dir)
    return ranked.where(F.col("rf") == 1).select(
        "query_id",
        F.col("nid").alias("top1_nid"),
        F.col("rp").cast("long").alias("prefix_rank"),
        F.round(F.lit(1.0) / F.col("rp"), 6).alias("reciprocal_rank"),
    )
