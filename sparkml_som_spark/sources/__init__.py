"""Table registry for the driver's star schema + generic readers.

``load_tables(spark, sf_dir)`` returns a dict of DataFrames and also
registers each as a temp view so ``spark.sql`` works against the same
names DuckDB uses in the oracle harness.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables — always broadcastable in joins.
DIM_TABLES = {"region", "nation", "supplier", "part", "customer"}


def load_table(spark: SparkSession, sf_dir: str, name: str, spread: bool = False) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.parquet has shipped with three different physical types for
        # `ts` across testdata generations: TIMESTAMP(NANOS) (rejected by the
        # parquet reader unless read as long), TIMESTAMP(MICROS) without a
        # timezone (inferred as TIMESTAMP_NTZ by Spark 4), and plain LTZ.
        # Normalize ALL of them to TIMESTAMP (LTZ) here, in the one place
        # every batch query, stream snapshot, and test fixture loads from:
        # withWatermark()/window() require LTZ, and the session timezone is
        # pinned UTC (session.py) so the cast never shifts wall-clock values.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # nanos read as long; integer div — float would lose precision.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type and ts_type != "timestamp":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(path)
    if spread:
        df = _spread(df)
    return df


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition when the scan has fewer splits than the
    cluster has cores.  Single-row-group parquet files arrive as ONE
    input split, which serializes every map-side stage (tokenization,
    hashing, vectorized UDFs) onto one core no matter the cluster size.
    Only use on tables feeding CPU-heavy per-row work: the repartition
    is a full shuffle of the table, which a well-split production layout
    (many files / row groups at 100 TB) would make redundant — the
    partition-count guard makes it a no-op exactly there."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None, register: bool = True
) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in names or TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_any(spark: SparkSession, path: str, fmt: str | None = None, **options) -> DataFrame:
    """Generic source dispatch: parquet/csv/json/orc/text by extension or fmt."""
    if fmt is None:
        ext = os.path.splitext(path)[1].lstrip(".").lower()
        fmt = {"pq": "parquet", "jsonl": "json", "txt": "text"}.get(ext, ext or "parquet")
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    return reader.format(fmt).options(**options).load(path)


def write_any(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
