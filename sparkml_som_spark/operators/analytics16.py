"""Analytics operators, round 5 thirteenth wave: seasonality
profiling (day-of-week x hour grid) and order-to-ship SLA latency
percentiles.

Scale discipline: both reduce the corpus to a bounded grid in one
map-side-combined aggregate — the seasonality grid is 7x24, the SLA
table is one row per order priority; the exact percentiles run inside
the bounded per-priority aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import register
from sparkml_som_spark.sources import load_table


@register(
    "seasonality_profile_events",
    sql="""
    WITH g AS (
        SELECT dayofweek(ts) AS dow, hour(ts) AS hod, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ), t AS (
        SELECT SUM(n) AS total FROM g
    )
    SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,
           CAST(n AS BIGINT) AS n_events,
           ROUND(n::DOUBLE / t.total, 6) AS share
    FROM g, t
    """,
    desc="seasonality heatmap feed: (day-of-week, hour) event grid with corpus shares; one aggregate to a 7x24 grid",
)
def seasonality_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The seasonality profile behind every traffic heatmap: event
    counts and corpus shares over the (day-of-week, hour-of-day) grid.

    One map-side-combined aggregate to a 7x24 grid; the total joins
    back as a one-row broadcast.  Spark's dayofweek (1=Sunday) matches
    DuckDB's dayofweek+1, aligned explicitly in the expressions.
    """
    ev = load_table(spark, sf_dir, "events")
    # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday
    # ..6=Saturday -> align by using DuckDB's numbering on the Spark side
    g = ev.groupBy(
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    t = g.agg(F.sum("n_events").alias("total"))
    return g.crossJoin(F.broadcast(t)).select(
        "dow",
        "hod",
        "n_events",
        F.round(F.col("n_events").cast("double") / F.col("total"), 6).alias("share"),
    )


@register(
    "sla_ship_latency_percentiles",
    sql="""
    WITH lat AS (
        SELECT o.o_orderpriority AS priority,
               date_diff('day', o.o_orderdate, l.l_shipdate) AS days
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT)                 AS n_lineitems,
           ROUND(quantile_cont(days, 0.5), 4)       AS p50_days,
           ROUND(quantile_cont(days, 0.9), 4)       AS p90_days,
           ROUND(quantile_cont(days, 0.99), 4)      AS p99_days,
           CAST(MAX(days) AS BIGINT)                AS max_days
    FROM lat GROUP BY priority
    """,
    desc="order-to-ship SLA: exact interpolated latency percentiles per priority over integer day diffs",
)
def sla_ship_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment-SLA reporting: the p50/p90/p99 of order-to-ship
    latency (days) per order priority — the percentile view an ops
    dashboard tracks against its promise.

    Latencies are exact integer day differences; Spark's `percentile`
    and DuckDB's `quantile_cont` share the same linear-interpolation
    definition, so on integer inputs the percentiles agree bit-for-bit
    (the robust-MAD entry pinned this equivalence first).  The join
    shuffles on the order key once; percentiles aggregate per bounded
    priority group.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("days"),
    )
    return lat.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.round(F.percentile("days", F.lit(0.5)), 4).alias("p50_days"),
        F.round(F.percentile("days", F.lit(0.9)), 4).alias("p90_days"),
        F.round(F.percentile("days", F.lit(0.99)), 4).alias("p99_days"),
        F.max("days").cast("long").alias("max_days"),
    )
