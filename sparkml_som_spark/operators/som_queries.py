"""SOM-backed queries for the driver contract.

The SOM itself is not SQL-expressible (iterative algorithm), so the
flagship query registers rows-only; a count-preservation invariant IS
oracle-checkable and ties the SOM path into the correctness gate
(SURVEY.md §5 oracle strategy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import register
from sparkml_som_spark.sources import load_table


_MODEL_CACHE: dict[str, object] = {}


def fit_default_som(spark: SparkSession, sf_dir: str):
    """Fit (or reuse) the default 5x5 SOM for this sf_dir. The model is
    deterministic for a fixed seed, so caching across queries in the
    same process changes nothing but wall time."""
    from sparkml_som_spark.som import SOM

    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    if sf_dir not in _MODEL_CACHE:
        som = SOM(
            height=5, width=5, maxIter=10, seed=42, featuresCol="embedding",
            tMax=4.0, tMin=0.5,
        )
        _MODEL_CACHE[sf_dir] = som.fit(emb)
    return _MODEL_CACHE[sf_dir], emb


@register(
    "som_cluster_summary",
    sql=None,  # iterative ML -> rows-only check
    desc="flagship: SOM cell occupancy + dominant label over embeddings",
)
def som_cluster_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit a 5x5 SOM on the embedding column, then per-cell: row count,
    dominant label, and mean distance-to-prototype. Deterministic for a
    fixed seed. This is the reference's entire pipeline (fit ->
    transform -> summarize) as one query."""
    model, emb = fit_default_som(spark, sf_dir)
    # two aggregations + a join read the transform output — persist so the
    # pandas_udf BMU kernel runs once, not once per action
    preds = model.transform(emb).persist()
    label_counts = (
        preds.groupBy("prediction", "label")
        .agg(F.count("*").alias("n"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("prediction").orderBy(F.desc("n"), F.asc("label"))
    dominant = (
        label_counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("prediction", F.col("label").alias("dominant_label"))
    )
    occupancy = preds.groupBy("prediction").agg(F.count("*").alias("n_rows"))
    from sparkml_som_spark.operators.registry import materialize_small

    result = (
        occupancy.join(dominant, "prediction")
        .select(
            F.col("prediction").alias("cell"),
            "n_rows",
            "dominant_label",
        )
        .orderBy("cell")
    )
    return materialize_small(result, cleanup=(preds,))


@register(
    "som_quantization_error",
    sql=None,  # iterative ML -> rows-only check
    desc="per-cell quantization error via the distanceCol extension",
)
def som_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell mean/max squared distance to the prototype — the
    model-quality view a SOM user reads. Uses distanceCol so prediction
    and distance come from one kernel pass."""
    model, emb = fit_default_som(spark, sf_dir)
    model.setDistanceCol("d2")
    try:
        preds = model.transform(emb).select("prediction", "d2").persist()
        from sparkml_som_spark.operators.registry import materialize_small

        result = (
            preds.groupBy("prediction")
            .agg(
                F.count("*").alias("n_rows"),
                F.round(F.avg("d2"), 4).alias("avg_d2"),
                F.round(F.max("d2"), 4).alias("max_d2"),
            )
            .select(F.col("prediction").alias("cell"), "n_rows", "avg_d2", "max_d2")
            .orderBy("cell")
        )
        return materialize_small(result, cleanup=(preds,))
    finally:
        model.setDistanceCol("")  # the cached model is shared across queries


@register(
    "som_count_invariant",
    sql="SELECT COUNT(*) AS n_rows FROM embeddings",
    desc="SOM transform preserves row count (oracle-checkable invariant)",
)
def som_count_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    model, emb = fit_default_som(spark, sf_dir)
    preds = model.transform(emb)
    # also asserts the prediction range invariant inside the query:
    # rows with out-of-range predictions would be dropped and break the count
    n_cells = model.getHeight() * model.getWidth()
    return (
        preds.where((F.col("prediction") >= 0) & (F.col("prediction") < n_cells))
        .agg(F.count("*").alias("n_rows"))
    )


@register(
    "som_hex_occupancy",
    sql=None,  # iterative ML -> rows-only check
    desc="hexagonal-topology SOM fit + per-cell occupancy (topology beyond the reference)",
)
def som_hex_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit a 3x3 HEXAGONAL map (the topology SOMParams.scala:63 declares
    as planned-but-absent) and return per-cell occupancy.  Uses its own
    small fit — the hex neighborhood metric is the thing under test, so
    it cannot share the cached rectangular model."""
    from sparkml_som_spark.som import SOM

    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    model = SOM(
        height=3, width=3, maxIter=5, seed=42, featuresCol="embedding",
        topology="hexagonal", tMax=2.0, tMin=0.5,
    ).fit(emb)
    return (
        model.transform(emb)
        .groupBy("prediction")
        .agg(F.count("*").alias("n_rows"))
        .select(F.col("prediction").alias("cell"), "n_rows")
        .orderBy("cell")
    )
