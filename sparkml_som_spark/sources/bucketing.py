"""Bucketed tables: co-located joins and aggregations without shuffle.

At 100 TB the dominant cost of a fact-fact join (orders-lineitem) is
shuffling both sides on the join key. Writing both tables bucketed by
that key (same bucket count) lets Spark plan a sort-merge join with NO
exchange on either side — the co-location is baked into the layout.
This is the storage-side twin of the runtime techniques in
`operators/skew.py` and AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist df as a bucketed managed table (parquet). Joins between
    tables bucketed on the same column with the same bucket count skip
    the exchange entirely.

    Idempotent ACROSS sessions: a fresh session's in-memory catalog
    does not know tables a previous session wrote, but their warehouse
    directories survive on disk — saveAsTable then fails with
    LOCATION_ALREADY_EXISTS even in overwrite mode.  Drop the catalog
    entry AND clear the stale location before writing."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    loc = f"{warehouse}/{table_name.lower()}"
    shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    writer = writer.sortBy(sort_col or bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), on, how)
