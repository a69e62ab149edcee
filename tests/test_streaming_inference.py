"""Streaming model serving: SOMModel.transform applied to a stream —
the pandas_udf BMU kernel must work unchanged under Structured
Streaming (same DataFrame API, streaming physical plan)."""

from sparkml_som_spark.som import SOM
from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_som_transform_on_stream_matches_batch(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    model = SOM(
        height=3, width=3, maxIter=3, seed=21, featuresCol="embedding", tMax=2.0, tMin=0.5
    ).fit(emb)

    path = str(tmp_path / "emb_stream")
    emb.write.mode("overwrite").parquet(path)
    batch = spark.read.parquet(path)

    stream = spark.readStream.schema(batch.schema).parquet(path)
    q = (
        model.transform(stream)
        .select("vec_id", "prediction")
        .writeStream.format("memory")
        .queryName("som_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    got = {r["vec_id"]: r["prediction"] for r in spark.sql("SELECT * FROM som_stream").collect()}
    want = {
        r["vec_id"]: r["prediction"]
        for r in model.transform(batch).select("vec_id", "prediction").collect()
    }
    assert got == want and len(got) == 500
