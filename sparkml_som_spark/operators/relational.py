"""Relational operator surface over the TPC-H-ish star schema.

The reference engine has no relational operators (SURVEY.md §2B) — this
module IS the rebuild's query surface, expressed declaratively so
Catalyst handles pushdown/pruning/join-ordering. Scale notes per query
in docstrings; dimension joins broadcast explicitly (`F.broadcast`)
so the plan holds when the fact side is 100 TB.

Floating aggregates are rounded to 4 decimals on BOTH sides (Spark +
oracle) so summation-order differences between engines can't flip the
driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import register
from sparkml_som_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# scan -> filter -> project -> aggregate
# --------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 4)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 4)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    desc="TPC-H Q1 analog: wide aggregate over the fact table",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: pure scan+hash-agg, 6 grouping keys — partial agg map-side,
    shuffle carries only 6 rows/partition. Filter pushes to parquet."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc), 4).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q6_revenue_forecast",
    sql="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    desc="TPC-H Q6 analog: selective filter + scalar aggregate",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: all four predicates push down to the parquet scan
    (min/max rowgroup skipping on l_shipdate); no shuffle at all —
    partial sums tree-reduce to one row."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))
    )


@register(
    "filter_project_parts",
    sql="""
    SELECT p_partkey, p_name, p_brand,
           ROUND(p_retailprice * 1.1, 4) AS uplift_price
    FROM part
    WHERE p_size >= 30 AND p_type LIKE '%BRASS%'
    """,
    desc="projection + predicate pushdown",
)
def filter_project_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: scan-only; both predicates and the 4-column projection reach
    the parquet reader (check PushedFilters/ReadSchema in explain)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.where((F.col("p_size") >= 30) & F.col("p_type").like("%BRASS%"))
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            F.round(F.col("p_retailprice") * 1.1, 4).alias("uplift_price"),
        )
    )


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------

@register(
    "q3_shipping_priority",
    sql="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1997-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    desc="TPC-H Q3 analog: 3-way join + agg + top-k",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: customer (filtered on segment) is broadcast; orders-lineitem
    is the one real shuffle, on the join key that the groupBy reuses.
    Top-k plans as TakeOrderedAndProject — no global sort."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    sql="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation   ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    desc="TPC-H Q5 analog: 6-way join, dims broadcast",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: region/nation/supplier/customer are all broadcast — the only
    shuffle is orders-lineitem on orderkey. Grouping key space = #nations."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nation),
            (cust.c_nationkey == nation.n_nationkey)
            & (supp.s_nationkey == nation.n_nationkey),
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q10_returned_items",
    sql="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    desc="TPC-H Q10 analog: returned-item revenue per customer",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "join_semi_active_customers",
    sql="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
    desc="left-semi join (EXISTS)",
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: semi-join never materializes the probe side's payload; with
    customer as the left side Spark picks broadcast/shuffled-hash based on
    stats — AQE converts at runtime when the filtered orders side is small."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti_dormant_customers",
    sql="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 350000)
    """,
    desc="left-anti join (NOT EXISTS)",
)
def join_anti_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no order above 350k. (Every testdata customer has
    at least one order, so the unconditioned NOT EXISTS matched zero
    rows on both engines — a vacuous check.)"""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 350000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


@register(
    "join_outer_nation_coverage",
    sql="""
    SELECT n_name,
           COUNT(c_custkey)                          AS n_customers,
           ROUND(COALESCE(SUM(c_acctbal), 0), 4)     AS total_acctbal
    FROM nation
    LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    desc="left-outer join preserving empty nations",
)
def join_outer_nation_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    return (
        nation.join(cust, cust.c_nationkey == nation.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round(F.coalesce(F.sum("c_acctbal"), F.lit(0.0)), 4).alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# aggregation variants
# --------------------------------------------------------------------------

@register(
    "agg_distinct_customers",
    sql="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*)                  AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    desc="distinct aggregate alongside plain count",
)
def agg_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: countDistinct plans as a two-phase expand+agg; keys bounded
    by priority cardinality (5)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@register(
    "rollup_sales",
    sql="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice), 4) AS sum_price,
           COUNT(*)                       AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    desc="hierarchical ROLLUP totals",
)
def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        F.count("*").alias("n"),
    )


@register(
    "cube_sales",
    sql="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    desc="CUBE over two dimensions",
)
def cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty")
    )


@register(
    "conditional_agg_order_mix",
    sql="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F')                   AS n_finished,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O')                   AS n_open,
           ROUND(SUM(CASE WHEN o_totalprice > 200000
                          THEN o_totalprice ELSE 0 END), 4)              AS big_order_value
    FROM orders
    GROUP BY o_orderpriority
    """,
    desc="conditional/pivot-style aggregation",
)
def conditional_agg_order_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.round(
            F.sum(F.when(F.col("o_totalprice") > 200000, F.col("o_totalprice")).otherwise(0.0)),
            4,
        ).alias("big_order_value"),
    )


# --------------------------------------------------------------------------
# sort / top-k / set ops
# --------------------------------------------------------------------------

@register(
    "sort_topk_lineitems",
    sql="""
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 4) AS price
    FROM lineitem
    ORDER BY price DESC, l_orderkey, l_linenumber
    LIMIT 15
    """,
    desc="global top-k (TakeOrderedAndProject, no full sort)",
)
def sort_topk_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice"), 4).alias("price"),
        )
        .orderBy(F.desc("price"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(15)
    )


@register(
    "set_union_partners",
    sql="""
    SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
    """,
    desc="UNION ALL with tag column",
)
def set_union_partners(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("kind")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("kind")
    )
    return cust.unionAll(supp)


@register(
    "set_intersect_nations",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    desc="INTERSECT (distinct semantics)",
)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


@register(
    "set_except_nations",
    sql="""
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    desc="EXCEPT (distinct semantics): nations with no supplier",
)
def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return nation.subtract(supp)


# --------------------------------------------------------------------------
# scalar functions: string / date / json
# --------------------------------------------------------------------------

@register(
    "string_funcs_parts",
    sql="""
    SELECT p_partkey,
           UPPER(p_brand)                         AS brand_upper,
           SUBSTR(p_name, 1, 6)                   AS name_prefix,
           LENGTH(p_name)                         AS name_len,
           CONCAT(p_brand, ':', p_type)           AS brand_type,
           REPLACE(p_type, ' ', '_')              AS type_slug
    FROM part
    WHERE p_size <= 10
    """,
    desc="string scalar functions",
)
def string_funcs_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.where(F.col("p_size") <= 10).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 6).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
    )


@register(
    "date_funcs_orders",
    sql="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT)  AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           COUNT(*)                                     AS n_orders,
           ROUND(SUM(o_totalprice), 4)                  AS total_value
    FROM orders
    GROUP BY order_year, order_month
    """,
    desc="date extraction + time-bucketed aggregate",
)
def date_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_value"),
        )
    )


@register(
    "json_extract_events",
    sql="""
    SELECT event_type,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT))           AS max_k,
           COUNT(*)                                                      AS n
    FROM events
    GROUP BY event_type
    """,
    desc="JSON field extraction from the events props column",
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count("*").alias("n"),
    )
