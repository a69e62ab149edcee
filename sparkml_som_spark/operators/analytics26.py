"""Analytics operators, round 5 final wave: distribution-drift PSI and
delta-method ratio-metric A/B comparison — the two remaining staples of
a production eval/experimentation stack.

Scale discipline:

- PSI folds over (period x value-band) cells — one map-side-combined
  aggregate to a bounded contingency, Laplace-smoothed so empty cells
  never produce log-of-zero, with period totals joined back from a
  bounded two-row aggregate;
- the ratio metric aggregates per-customer units once (bounded customer
  rows, value rounded there), then each arm collapses to ONE row of
  moments (avg/var/cov built-ins) — the delta-method variance needs no
  resampling, no RNG, and no second pass over the facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import register
from sparkml_som_spark.sources import load_table

# --------------------------------------------------------------------------
# 1. population stability index between two periods
# --------------------------------------------------------------------------


@register(
    "psi_value_drift",
    sql="""
    WITH banded AS (
        SELECT CASE WHEN EXTRACT(day FROM ts) <= 15 THEN 'p1' ELSE 'p2' END
                   AS period,
               CAST(FLOOR(value / 25.0) AS BIGINT) AS band
        FROM events
    ), cells AS (
        SELECT band,
               SUM(CASE WHEN period = 'p1' THEN 1 ELSE 0 END) AS n1,
               SUM(CASE WHEN period = 'p2' THEN 1 ELSE 0 END) AS n2
        FROM banded GROUP BY band
    ), tot AS (
        SELECT SUM(n1) AS t1, SUM(n2) AS t2,
               CAST(COUNT(*) AS BIGINT) AS n_bands
        FROM cells
    ), p AS (
        SELECT c.band,
               (c.n1 + 0.5) / (t.t1 + 0.5 * t.n_bands) AS p1,
               (c.n2 + 0.5) / (t.t2 + 0.5 * t.n_bands) AS p2,
               t.n_bands
        FROM cells c, tot t
    )
    SELECT CAST(MIN(n_bands) AS BIGINT)            AS n_bands,
           ROUND(SUM((p2 - p1) * ln(p2 / p1)), 4)  AS psi,
           ROUND(MAX(ABS(p2 - p1)), 6)             AS max_band_shift
    FROM p
    """,
    desc="population stability index of event values between month halves; Laplace-smoothed bounded band cells, one-row totals join",
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-monitoring drift: the Population Stability Index of the
    event-value distribution between the first and second half of the
    month — the score-drift alarm (PSI > 0.2 = investigate) every
    deployed model carries, here as one bounded aggregate.

    Values band at width 25 (a bounded band table at any corpus size),
    each (band, period) cell counts with map-side combine, and the two
    period totals join back from a one-row broadcast.  Laplace
    smoothing (+0.5 per cell) keeps empty bands finite without
    epsilon-clamping, so the PSI fold is a plain sum over the bounded
    cell table; `ln` parity across engines is pinned the same way as
    the entropy entries (round-4 guard digit).
    """
    ev = load_table(spark, sf_dir, "events")
    banded = ev.select(
        F.when(F.dayofmonth("ts") <= 15, "p1").otherwise("p2").alias("period"),
        F.floor(F.col("value") / 25.0).cast("long").alias("band"),
    )
    cells = banded.groupBy("band").agg(
        F.sum(F.when(F.col("period") == "p1", 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("period") == "p2", 1).otherwise(0)).alias("n2"),
    )
    tot = cells.agg(
        F.sum("n1").alias("t1"),
        F.sum("n2").alias("t2"),
        F.count(F.lit(1)).cast("long").alias("n_bands"),
    )
    p = cells.crossJoin(F.broadcast(tot)).select(
        "n_bands",
        ((F.col("n1") + 0.5) / (F.col("t1") + 0.5 * F.col("n_bands"))).alias("p1"),
        ((F.col("n2") + 0.5) / (F.col("t2") + 0.5 * F.col("n_bands"))).alias("p2"),
    )
    return p.agg(
        F.min("n_bands").cast("long").alias("n_bands"),
        F.round(
            F.sum((F.col("p2") - F.col("p1")) * F.log(F.col("p2") / F.col("p1"))), 4
        ).alias("psi"),
        F.round(F.max(F.abs(F.col("p2") - F.col("p1"))), 6).alias("max_band_shift"),
    )


# --------------------------------------------------------------------------
# 2. delta-method ratio-metric A/B comparison
# --------------------------------------------------------------------------


@register(
    "ratio_metric_delta_ab",
    sql="""
    WITH units AS (
        SELECT CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1) <= '7'
                    THEN 'A' ELSE 'B' END AS arm,
               ROUND(SUM(o_totalprice), 4) AS x,
               CAST(COUNT(*) AS DOUBLE)    AS n
        FROM orders GROUP BY o_custkey
    ), moments AS (
        SELECT arm,
               CAST(COUNT(*) AS BIGINT) AS n_units,
               AVG(x)  AS mx,  AVG(n) AS mn,
               VAR_SAMP(x) AS vx, VAR_SAMP(n) AS vn,
               COVAR_SAMP(x, n) AS cxn
        FROM units GROUP BY arm
    )
    SELECT arm, n_units,
           ROUND(mx / mn, 6) AS revenue_per_order,
           ROUND(SQRT((vx + (mx / mn) * (mx / mn) * vn
                       - 2 * (mx / mn) * cxn) / n_units) / mn, 4) AS se_delta
    FROM moments
    """,
    desc="delta-method SE for the revenue-per-order ratio metric across md5-hash A/B arms; per-unit aggregate then one row of moments per arm",
)
def ratio_metric_delta_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation-stack staple: the revenue-per-order RATIO metric
    per A/B arm with its delta-method standard error — the correct SE
    when the analysis unit (customer) differs from the metric
    denominator (orders), where a naive per-order t-test is wrong.

    Arms assign by md5 prefix of the customer key (deterministic,
    reproducible, engine-identical — the split_train_val_test idiom).
    Per-customer units aggregate once with map-side combine (value
    rounded at the bounded unit row); each arm then collapses to a
    single row of built-in moments (avg/var_samp/covar_samp), and
    SE(R) = sqrt((var(x) + R^2 var(n) - 2 R cov(x, n)) / N) / mean(n)
    is driver-free arithmetic on those two rows.  No resampling, no
    RNG, one pass over the facts.
    """
    o = load_table(spark, sf_dir, "orders")
    units = (
        o.groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("x"),
            F.count(F.lit(1)).cast("double").alias("n"),
        )
        .select(
            F.when(
                F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1) <= "7",
                "A",
            )
            .otherwise("B")
            .alias("arm"),
            "x",
            "n",
        )
    )
    moments = units.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.avg("x").alias("mx"),
        F.avg("n").alias("mn"),
        F.var_samp("x").alias("vx"),
        F.var_samp("n").alias("vn"),
        F.covar_samp("x", "n").alias("cxn"),
    )
    r = F.col("mx") / F.col("mn")
    return moments.select(
        "arm",
        "n_units",
        F.round(r, 6).alias("revenue_per_order"),
        F.round(
            F.sqrt(
                (F.col("vx") + r * r * F.col("vn") - 2 * r * F.col("cxn"))
                / F.col("n_units")
            )
            / F.col("mn"),
            4,
        ).alias("se_delta"),
    )
