"""Skew-mitigation utilities for joins on hot keys.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; `salted_join` is the explicit fallback for the pathological
ones — a hot key whose single hash partition would swamp one executor
no matter how AQE splits post-shuffle files.

Mechanics: the skewed (large) side gets a random salt in [0, n_salts);
the small side is exploded n_salts times with every salt value; the
join key becomes (key, salt). Each hot key now spreads over n_salts
partitions. Results are identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_SAFE_SALTED_JOINS = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `large` with `small` on column `on`, salted to spread
    hot keys. `small` is replicated n_salts x — keep it the dimension
    side. The salt mixes the key with spark_partition_id() and
    monotonically_increasing_id() — deterministic for a fixed task
    layout (no rand()), yet FULLY duplicate rows (the common shape of a
    pathological hot key) still fan out across salts; a salt hashed from
    row values alone would send all copies to one bucket and spread
    nothing.  Works for any column types (no xxhash64 over maps).

    Only left-shaped joins are supported: with the small side exploded
    n_salts times, right/full outer would emit spurious null-padded
    copies of small rows whose salt found no partner."""
    if how not in _SAFE_SALTED_JOINS:
        raise ValueError(
            f"salted_join supports {sorted(_SAFE_SALTED_JOINS)}; got {how!r} — "
            "right/full outer joins would duplicate unmatched small-side rows"
        )
    salted_large = large.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(F.col(on), F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(n_salts),
        ).cast("int"),
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_large.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")


from pyspark.sql import SparkSession  # noqa: E402

from sparkml_som_spark.operators.registry import register  # noqa: E402
from sparkml_som_spark.sources import load_table  # noqa: E402


@register(
    "skew_salted_join_segments",
    sql="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(e.value), 4) AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    desc="salted equi-join under the oracle: per-segment event totals, hot keys spread over 8 salts",
)
def skew_salted_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The event stream concentrates on few users (hot keys), so this is
    the salted-join shape under the correctness gate: large side salted,
    small side exploded 8x, join on (key, salt) — results provably equal
    to the unsalted join (the oracle IS the unsalted join).  At 100 TB
    AQE's skew splitting handles moderate skew; this explicit form is
    the fallback for a key too hot for post-shuffle file splitting."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, cust, on="user_id", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@register(
    "null_skew_split_join",
    sql="""
    SELECT COALESCE(c.c_mktsegment, 'unknown') AS segment,
           CAST(COUNT(*) AS BIGINT)            AS n_events,
           ROUND(SUM(e.value), 4)              AS sum_value
    FROM (
        SELECT CASE WHEN event_type = 'error' THEN NULL ELSE user_id END
                   AS join_key,
               value
        FROM events
    ) e
    LEFT JOIN customer c ON e.join_key = c.c_custkey
    GROUP BY 1
    """,
    desc="null-skew join split: null keys bypass the shuffle entirely, non-null side joins normally",
)
def null_skew_split_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical null-skew fix: in a left join, every NULL key rows
    hashes to ONE partition and can never match anyway — at 100 TB a
    10% null rate puts 10 TB on a single task.  Split first: null-key
    rows take a metadata-only null-padded path (no shuffle at all),
    non-null rows join normally; union the halves.  Results are
    identical to the naive left join (the oracle runs the naive form).
    Here event rows from 'error' events stand in for the nullable
    foreign key."""
    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("event_type") == "error", F.lit(None).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("join_key"),
        "value",
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("join_key"), "c_mktsegment"
    )
    nonnull = ev.where(F.col("join_key").isNotNull()).join(
        cust, "join_key", "left"
    )
    nulls = ev.where(F.col("join_key").isNull()).withColumn(
        "c_mktsegment", F.lit(None).cast("string")
    )
    return (
        nonnull.select("c_mktsegment", "value")
        .unionByName(nulls.select("c_mktsegment", "value"))
        .groupBy(F.coalesce("c_mktsegment", F.lit("unknown")).alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@register(
    "join_hint_shuffle_hash",
    sql="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT)     AS n_items,
           ROUND(SUM(l_quantity), 4)    AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY l_returnflag
    """,
    desc="SHUFFLE_HASH join hint: fact-fact join without per-partition sorts, plan-tested ShuffledHashJoin",
)
def join_hint_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy steering: Spark defaults fact-fact equi-joins to
    sort-merge, paying a full sort of BOTH sides per partition.  When
    one side's per-partition build fits executor memory, a
    SHUFFLE_HASH hint drops both sorts — at 100 TB that is the
    difference between 2x sort spill and a streaming hash probe.  The
    hint changes the physical strategy only; the oracle pins that the
    answer is byte-identical to the unhinted form."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    return (
        li.join(orders.hint("SHUFFLE_HASH"), li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
    )
