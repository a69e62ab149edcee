"""MERGE/upsert shapes without a table format: SCD Type 1 (overwrite in
place) and SCD Type 2 (keep history) expressed as pure DataFrame ops.

A 100 TB pipeline lands incremental batches against big base tables;
with a lakehouse format that is `MERGE INTO`, and without one it is the
join shapes below — worth having as first-class, oracle-checked
operators because the precedence/tie rules are where implementations
silently diverge.

Scale shape: one shuffle on the merge key for either variant (the
update batch is typically small → AQE broadcasts it; at equal sizes it
is a plain shuffled join).  SCD2's window ranks within key — the same
single shuffle serves the join and the rank.  Writing the result
partitioned/bucketed by the key keeps the NEXT merge co-located.

The "update batch" is derived deterministically from the base table
(keys 2000-3999, price scaled 1.1x) so the DuckDB oracle reconstructs
the identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import register
from sparkml_som_spark.sources import load_table


def _base_and_updates(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = load_table(spark, sf_dir, "orders")
    base = o.where(F.col("o_orderkey") < 3000).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = (
        o.where((F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 4000))
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 1.1, 4).alias("o_totalprice"),
        )
    )
    return base, updates


@register(
    "upsert_scd1_orders",
    sql="""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey < 3000
    ), updates AS (
        SELECT o_orderkey, o_orderstatus,
               ROUND(o_totalprice * 1.1, 4) AS o_totalprice
        FROM orders WHERE o_orderkey >= 2000 AND o_orderkey < 4000
    ), merged AS (
        SELECT COALESCE(u.o_orderkey, b.o_orderkey)       AS o_orderkey,
               COALESCE(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
               COALESCE(u.o_totalprice, b.o_totalprice)   AS o_totalprice,
               CASE WHEN u.o_orderkey IS NULL THEN 'kept'
                    WHEN b.o_orderkey IS NULL THEN 'inserted'
                    ELSE 'updated' END                    AS action
        FROM base b FULL OUTER JOIN updates u ON u.o_orderkey = b.o_orderkey
    )
    SELECT o_orderstatus, action,
           CAST(COUNT(*) AS BIGINT)    AS n,
           ROUND(SUM(o_totalprice), 4) AS sum_total
    FROM merged
    GROUP BY o_orderstatus, action
    """,
    desc="SCD Type 1 upsert (MERGE semantics): update wins, insert new, keep rest",
)
def upsert_scd1_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`MERGE INTO base USING updates WHEN MATCHED THEN UPDATE WHEN NOT
    MATCHED THEN INSERT` as one full outer join + coalesce — the update
    side wins wherever it exists.  The per-(status, action) audit output
    shows kept/updated/inserted row flows, the numbers an ingest job
    logs after every merge."""
    base, updates = _base_and_updates(spark, sf_dir)
    b = base.alias("b")
    u = updates.alias("u")
    merged = b.join(u, F.col("b.o_orderkey") == F.col("u.o_orderkey"), "full_outer").select(
        F.coalesce(F.col("u.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
        F.coalesce(F.col("u.o_orderstatus"), F.col("b.o_orderstatus")).alias("o_orderstatus"),
        F.coalesce(F.col("u.o_totalprice"), F.col("b.o_totalprice")).alias("o_totalprice"),
        F.when(F.col("u.o_orderkey").isNull(), "kept")
        .when(F.col("b.o_orderkey").isNull(), "inserted")
        .otherwise("updated")
        .alias("action"),
    )
    return merged.groupBy("o_orderstatus", "action").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 4).alias("sum_total"),
    )


@register(
    "upsert_scd2_orders",
    sql="""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS version
        FROM orders WHERE o_orderkey < 3000
    ), updates AS (
        SELECT o_orderkey, o_orderstatus,
               ROUND(o_totalprice * 1.1, 4) AS o_totalprice, 1 AS version
        FROM orders WHERE o_orderkey >= 2000 AND o_orderkey < 4000
    ), hist AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                  ORDER BY version DESC) AS rn
        FROM (SELECT * FROM base UNION ALL SELECT * FROM updates)
    )
    SELECT o_orderstatus,
           CAST(count_if(rn = 1) AS BIGINT)  AS n_current,
           CAST(count_if(rn > 1) AS BIGINT)  AS n_history,
           ROUND(SUM(CASE WHEN rn = 1 THEN o_totalprice ELSE 0 END), 4)
               AS sum_current
    FROM hist
    GROUP BY o_orderstatus
    """,
    desc="SCD Type 2 upsert: history preserved, latest version flagged current",
)
def upsert_scd2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type 2 merge: instead of overwriting, the new version is APPENDED
    and a rank-within-key marks the current row — the previous version
    stays queryable as history (the audit/backfill requirement Type 1
    destroys).  union + one window on the key; at scale the version
    column is an ingest timestamp and the same plan holds."""
    base, updates = _base_and_updates(spark, sf_dir)
    hist = base.withColumn("version", F.lit(0)).unionByName(
        updates.withColumn("version", F.lit(1))
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("version"))
    ranked = hist.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("o_orderstatus").agg(
        F.count_if(F.col("rn") == 1).alias("n_current"),
        F.count_if(F.col("rn") > 1).alias("n_history"),
        F.round(
            F.sum(F.when(F.col("rn") == 1, F.col("o_totalprice")).otherwise(0.0)), 4
        ).alias("sum_current"),
    )
