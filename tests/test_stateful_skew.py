"""Stateful streaming operator + salted join, each checked against the
equivalent batch computation."""

import pytest
from pyspark.sql import functions as F

from sparkml_som_spark.operators.skew import salted_join
from sparkml_som_spark.sources import load_table
from sparkml_som_spark.streaming.stateful import stateful_user_profile

SF = "/root/testdata/sf0.001"


def test_stateful_user_profile_matches_batch(spark, tmp_path):
    path = str(tmp_path / "events")
    events = load_table(spark, SF, "events")
    events.write.mode("overwrite").parquet(path)
    batch = spark.read.parquet(path)

    stream = spark.readStream.schema(batch.schema).parquet(path)
    q = (
        stateful_user_profile(stream)
        .writeStream.format("memory")
        .queryName("user_profiles")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    # with update mode, the LAST row per user is the final state
    got = spark.sql(
        """
        SELECT user_id, n_events, total_value, last_ts FROM user_profiles
        """
    ).collect()
    final = {}
    for r in got:  # memory sink appends in batch order; last write wins
        final[r["user_id"]] = (r["n_events"], r["total_value"], r["last_ts"])

    want = {
        r["user_id"]: (r["n"], r["v"], r["mts"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("v"),
            F.max("ts").alias("mts"),
        )
        .collect()
    }
    assert {u: nv[0] for u, nv in final.items()} == {u: nv[0] for u, nv in want.items()}
    for u in want:
        assert final[u][1] == pytest.approx(want[u][1], abs=1e-3)
        # last_ts must equal the batch max(ts) exactly: pins the LTZ
        # normalization contract — pandas max() over the Arrow-delivered
        # timestamps round-trips through the state op unshifted
        assert final[u][2] == want[u][2], (u, final[u][2], want[u][2])


def test_salted_join_equals_plain_join(spark):
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = (
        orders.join(cust, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("v"))
        .collect()
    )
    salted = (
        salted_join(orders, cust, on="o_custkey", n_salts=8)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("v"))
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))
