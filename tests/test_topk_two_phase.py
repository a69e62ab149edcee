"""The salted two-phase per-query top-k (round-8 ANN scale fix) must be
VALUE-IDENTICAL to the single-window form it replaced, and the
positional-gram builder must report true start positions."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparkml_som_spark.functions import cosine, word_grams_positional
from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_topk_per_query_equals_single_window(spark):
    from sparkml_som_spark.operators.similarity import N_QUERIES, topk_per_query

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = emb.join(F.broadcast(q), emb.vec_id != q.query_id).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qv"), F.col("v")).alias("cos_raw"),
    )
    k = 17  # not the production constant — the law must hold for any k
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    naive = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
    two_phase = topk_per_query(scored, k).select("query_id", "neighbor_id", "rank")
    assert naive.exceptAll(two_phase).count() == 0
    assert two_phase.exceptAll(naive).count() == 0
    # and with a salt count larger than the candidate count (every row
    # alone in its salt group) the law still holds
    degenerate = topk_per_query(scored, k, n_salt=10_000).select(
        "query_id", "neighbor_id", "rank"
    )
    assert naive.exceptAll(degenerate).count() == 0


def test_word_grams_positional_positions(spark):
    df = spark.createDataFrame(
        [("a b c d e",), ("x y",), ("solo",)], "text string"
    ).select(F.split(F.lower("text"), " ").alias("toks"))
    rows = (
        df.select(F.posexplode(word_grams_positional(F.col("toks"), 3)).alias("pos", "g"))
        .collect()
    )
    got = {(r["pos"], r["g"]) for r in rows}
    assert got == {(0, "a b c"), (1, "b c d"), (2, "c d e")}
