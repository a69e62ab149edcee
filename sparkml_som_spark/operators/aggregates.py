"""Modern SQL aggregate surface: median/mode, ordered listagg,
linear-regression aggregates, boolean aggregates, try_* arithmetic.

All of these are single-pass grouped aggregates over a fact scan —
partial/final aggregation with a bounded key space (returnflag,
priority, region), i.e. the cheapest distributed shape there is: no
joins, map-side combine, rows-out = group count. Each is pinned
against the DuckDB twin; where the two engines disagree on tie or
division-by-zero semantics the query text pins ONE deterministic
meaning (documented per entry) rather than relying on engine defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import register
from sparkml_som_spark.sources import load_table


@register(
    "agg_median_mode",
    sql="""
    WITH counts AS (
        SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2
    ), modes AS (
        SELECT l_returnflag, l_quantity AS qty_mode,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY cnt DESC, l_quantity ASC) AS rn
        FROM counts
    )
    SELECT l.l_returnflag,
           ROUND(median(l.l_quantity), 4)  AS qty_median,
           m.qty_mode                      AS qty_mode,
           CAST(COUNT(*) AS BIGINT)        AS n
    FROM lineitem l JOIN modes m
      ON m.l_returnflag = l.l_returnflag AND m.rn = 1
    GROUP BY l.l_returnflag, m.qty_mode
    """,
    desc="exact median + deterministic mode (lowest value on tie)",
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mode(col, deterministic=True)` pins Spark to the LOWEST value on
    a frequency tie; DuckDB's `mode()` tie-break is unspecified, so the
    oracle derives the same rule explicitly (ORDER BY cnt DESC, value
    ASC). Median is exact on both engines (interpolated for even n)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 4).alias("qty_median"),
        F.mode("l_quantity", True).alias("qty_mode"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_listagg_nations",
    sql="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           any_value(r_regionkey)                  AS region_key
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    desc="ordered listagg (WITHIN GROUP) + any_value on a dependent column",
)
def agg_listagg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg needs WITHIN GROUP (ORDER BY) for a deterministic result —
    the DataFrame-API `F.listagg` aggregates in partition order, which is
    legal-but-unstable, so the query goes through SQL text (also covering
    the SQL-surface checklist row). `any_value` is pinned only on a
    column functionally dependent on the group key (r_name -> r_regionkey),
    the one shape where every nondeterministic choice is the same value."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("agg_nation_v")
    load_table(spark, sf_dir, "region").createOrReplaceTempView("agg_region_v")
    return spark.sql(
        """
        SELECT r_name,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
               any_value(r_regionkey)                              AS region_key
        FROM agg_nation_v JOIN agg_region_v ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )


@register(
    "agg_regr_price_qty",
    sql="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs
    FROM lineitem
    GROUP BY l_returnflag
    """,
    desc="linear-regression aggregates: slope/intercept/r2/count",
)
def agg_regr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").cast("long").alias("n_pairs"),
    )


@register(
    "agg_bool_countif",
    sql="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000)                   AS all_over_1k,
           bool_or(o_totalprice > 400000)                  AS any_over_400k,
           CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_large
    FROM orders
    GROUP BY o_orderpriority
    """,
    desc="boolean aggregates: bool_and / bool_or / count_if",
)
def agg_bool_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count_if(F.col("o_totalprice") > 200000).cast("long").alias("n_large"),
    )


@register(
    "try_arith_orders",
    sql="""
    SELECT o_orderkey,
           TRY_CAST(o_orderstatus AS INT)                    AS status_num,
           ROUND(o_totalprice / NULLIF(o_custkey % 4, 0), 4) AS price_ratio,
           TRY_CAST(substr(o_orderdate::VARCHAR, 1, 4) AS INT) AS order_year
    FROM orders
    WHERE o_orderkey < 200
    """,
    desc="error-safe arithmetic: try_divide / try_cast / NULLIF guard",
)
def try_arith_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_divide/try_cast return NULL where strict evaluation errors
    (division by zero, bad cast). DuckDB has TRY_CAST but its integer
    division by zero raises, so the oracle spells the same semantics
    with NULLIF — the point under test is Spark's try_* surface, the
    oracle just needs matching values. o_orderstatus is non-numeric
    ('O'/'F'/'P') so try_cast NULLs on every row; o_custkey % 4 == 0
    exercises try_divide's NULL path on ~1/4 of rows."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 200)
    return o.select(
        "o_orderkey",
        F.expr("try_cast(o_orderstatus AS INT)").alias("status_num"),
        F.round(
            F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 4), 4
        ).alias("price_ratio"),
        F.expr(
            "try_cast(substr(cast(o_orderdate as string), 1, 4) AS INT)"
        ).alias("order_year"),
    )
