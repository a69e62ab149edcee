"""Analytics operators, round 5 fourteenth wave: the WRITE half of
the custom Python DataSource surface (task-commit manifest protocol)
and a streaming count-min sketch maintained by algebraic cell merges.

Scale discipline:

- the jsonl sink writes one private file per task and reads back only
  manifest-committed files — write fan-out scales with partitions and
  an abandoned attempt can never corrupt the result (the exactly-once
  write contract, demonstrated end-to-end);
- the streaming sketch merges per-batch (row, bucket) cell counts
  into a persisted bounded cell table (depth x width rows) — integer
  addition is batch-order independent, so the final sketch is
  BIT-EQUAL to the batch-built sketch, which is the whole point of a
  mergeable summary: per-batch cost tracks the batch, never the
  corpus, and the state is queryable between batches.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkml_som_spark.operators.analytics9 import _CMS_DEPTH, _CMS_WIDTH
from sparkml_som_spark.operators.registry import register
from sparkml_som_spark.operators.sources_queries import _scratch
from sparkml_som_spark.sources import load_table


@register(
    "source_python_datasource_writer",
    sql="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(o_totalprice), 4) AS sum_price
    FROM orders
    WHERE o_orderkey <= 4000
    GROUP BY o_orderstatus
    """,
    desc="custom Python DataSource WRITER: per-task jsonl files + commit manifest; manifest-driven read-back under the hash",
)
def source_python_datasource_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The write half of the pluggable-source surface: a custom
    `DataSourceWriter` serializes each partition to a private jsonl
    file, the driver's commit() builds a manifest from the returned
    task messages, and the read-back trusts ONLY the manifest — the
    task-commit protocol that makes distributed writes exactly-once
    (an abandoned attempt's file exists on disk but is never listed).

    The round-trip aggregate must hash-match the relational form,
    putting a custom WRITER under the oracle next to the custom batch
    and stream readers.
    """
    import json

    from sparkml_som_spark.sources.pydatasource import ensure_sink_registered

    ensure_sink_registered(spark)
    o = load_table(spark, sf_dir, "orders")
    slice_df = o.where(F.col("o_orderkey") <= 4000).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = _scratch(sf_dir, "orders_jsonlsink")
    shutil.rmtree(path, ignore_errors=True)
    slice_df.repartition(4).write.format("jsonlsink").option("path", path).mode(
        "append"
    ).save()
    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    back = spark.read.schema(
        "o_orderkey bigint, o_orderstatus string, o_totalprice double"
    ).json(manifest["files"])
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
    )


@register(
    "stream_countmin_merge",
    sql=f"""
    WITH toks AS (
        SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
    ), tc AS (
        SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1
    ), tb AS (
        SELECT tok, cnt, i,
               CAST('0x' || substr(md5(i::VARCHAR || ':' || tok), 1, 15) AS BIGINT)
                   % {_CMS_WIDTH} AS bucket
        FROM tc, (SELECT unnest([0, 1, 2]) AS i)
    ), cells AS (
        SELECT i, bucket, CAST(SUM(cnt) AS BIGINT) AS cell
        FROM tb GROUP BY 1, 2
    ), est AS (
        SELECT t.tok, MIN(c.cell) AS est_cnt
        FROM tb t JOIN cells c ON c.i = t.i AND c.bucket = t.bucket
        GROUP BY 1
    )
    SELECT tc.tok,
           CAST(tc.cnt AS BIGINT)      AS exact_cnt,
           CAST(est.est_cnt AS BIGINT) AS est_cnt,
           est.est_cnt >= tc.cnt       AS lower_bound_ok
    FROM tc JOIN est ON est.tok = tc.tok
    """,
    desc="streaming count-min: per-batch cell counts merged additively into a persisted bounded sketch; final sketch bit-equal to batch",
)
def stream_countmin_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy-hitter sketching — the mergeability story run
    for real: documents arrive in rate-limited micro-batches, each
    batch reduces to its own (row, bucket) cell counts, and foreachBatch
    merges them ADDITIVELY into a persisted sketch of depth x width
    rows.  Integer addition is batch-order independent, so the final
    sketch is bit-equal to the batch-built one — the oracle replays the
    batch construction and the estimates must hash-match.

    Per-batch cost tracks the batch (its tokens -> 48 cells); the
    sketch state is bounded, queryable between batches, and survives
    restarts — none of which is true of an exact counter table over an
    unbounded vocabulary.
    """
    docs = load_table(spark, sf_dir, "documents")
    key = os.path.basename(os.path.normpath(sf_dir))
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".scratch",
        key,
        "docs_cms_src",
    )
    if not os.path.isdir(src):
        docs.repartition(16).write.mode("overwrite").parquet(src)
    cells_dir = _scratch(sf_dir, "cms_cells")
    shutil.rmtree(cells_dir, ignore_errors=True)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(src)
    )

    def batch_cells(df: DataFrame) -> DataFrame:
        tb = (
            df.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
            .select(
                "tok",
                F.explode(F.array(*[F.lit(i) for i in range(_CMS_DEPTH)])).alias("i"),
            )
            .withColumn(
                "bucket",
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(F.col("i").cast("string"), F.lit(":"), F.col("tok"))
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % _CMS_WIDTH,
            )
        )
        return tb.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("cell"))

    def merge(batch_df, batch_id):
        sess = batch_df.sparkSession
        new_cells = batch_cells(batch_df)
        if os.path.isdir(cells_dir):
            old = sess.read.parquet(cells_dir)
            new_cells = (
                old.unionByName(new_cells)
                .groupBy("i", "bucket")
                .agg(F.sum("cell").alias("cell"))
            )
        # write-to-temp + swap keeps the whole merge JVM-side (a
        # collect + createDataFrame round-trip pays a Python-worker
        # spawn per batch) and never reads the dir being replaced
        tmp = cells_dir + ".tmp"
        new_cells.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(cells_dir, ignore_errors=True)
        os.replace(tmp, cells_dir)

    # tiny per-batch state (48 cells): run the stream with a reduced
    # shuffle-partition count, same rationale as _run_to_memory — at
    # registry volumes per-task overhead dominates 32-way shuffles, and
    # AQE cannot coalesce inside a streaming plan
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = stream.writeStream.foreachBatch(merge).trigger(availableNow=True).start()
        try:
            q.awaitTermination(300)
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    cells = spark.read.parquet(cells_dir)
    tc = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tb = tc.select(
        "tok",
        "cnt",
        F.explode(F.array(*[F.lit(i) for i in range(_CMS_DEPTH)])).alias("i"),
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("tok"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _CMS_WIDTH,
    )
    est = (
        tb.join(F.broadcast(cells), ["i", "bucket"])
        .groupBy("tok")
        .agg(F.min("cell").alias("est_cnt"))
    )
    return tc.join(est, "tok").select(
        "tok",
        F.col("cnt").alias("exact_cnt"),
        "est_cnt",
        (F.col("est_cnt") >= F.col("cnt")).alias("lower_bound_ok"),
    )
