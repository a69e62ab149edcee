"""Bucketed-table joins: same results as plain joins, strictly fewer
shuffles in the physical plan."""

from pyspark.sql import functions as F

from sparkml_som_spark.plans import count_exchanges
from sparkml_som_spark.sources import load_table
from sparkml_som_spark.sources.bucketing import bucketed_join, write_bucketed

SF = "/root/testdata/sf0.001"


def test_bucketed_join_skips_shuffle(spark):
    orders = load_table(spark, SF, "orders").withColumnRenamed("o_orderkey", "orderkey")
    li = load_table(spark, SF, "lineitem").withColumnRenamed("l_orderkey", "orderkey")

    write_bucketed(orders, "orders_b", "orderkey", n_buckets=8)
    write_bucketed(li, "lineitem_b", "orderkey", n_buckets=8)

    # disable broadcast + AQE so the comparison shows the real shuffle
    # shape (with broadcast on, BOTH plans are exchange-free and the
    # assertion would be vacuous)
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")

        joined_b = bucketed_join(spark, "lineitem_b", "orders_b", on="orderkey")
        joined_p = li.join(orders, "orderkey")

        agg_b = joined_b.agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("v")).first()
        agg_p = joined_p.agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("v")).first()
        assert agg_b == agg_p

        # co-located layout: zero join-side exchanges; plain SMJ: one per side
        assert count_exchanges(joined_b) == 0
        assert count_exchanges(joined_p) == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
