"""Analytics operators, round 5 seventeenth wave: the polymorphic
UDTF surface (Spark 4 `analyze` hook) and a clustering-quality metric
(simplified silhouette over the label partition).

Scale discipline:

- the n-gram UDTF is the DECLARED row-at-a-time API demonstration
  (like `udtf_chunk_documents`); the hot path for n-grams stays the
  JVM transform/slice form the dedup family uses — this entry pins
  the `analyze` plan-time contract (constant-argument validation,
  schema synthesis) under the oracle;
- the silhouette reduces the corpus to label centroids first
  (posexplode + map-side-combined (label, dim) means — the
  `centroid_embeddings_by_label` shape), broadcasts the bounded
  centroid table, and scores each vector against |labels| centroids
  in one pass — O(n * labels * dim) work with NO all-pairs term,
  which is why the simplified silhouette (centroid-based) is the
  variant that survives 100 TB while the textbook pairwise
  silhouette cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import register
from sparkml_som_spark.sources import load_table

_NGRAM_N = 2
_NGRAM_MIN_COUNT = 20


@register(
    "udtf_ngram_counts",
    sql=f"""
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ), grams AS (
        SELECT t[i] || ' ' || t[i+1] AS gram
        FROM toks, unnest(range(1, len(t))) AS u(i)
    )
    SELECT gram, CAST(COUNT(*) AS BIGINT) AS n
    FROM grams GROUP BY gram
    HAVING COUNT(*) >= {_NGRAM_MIN_COUNT}
    """,
    desc="polymorphic UDTF (analyze hook): lateral sgs_ngrams(text, 2) over documents; plan-time constant validation",
)
def udtf_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The polymorphic-UDTF surface: `sgs_ngrams(text, n)` synthesizes
    its output schema and validates its constant argument in the
    static `analyze` hook at PLAN time — the Spark 4 mechanism behind
    polymorphic table functions.  The query laterally explodes each
    document into bigrams and counts the frequent ones.

    Row-at-a-time Python is the declared point of this entry (as with
    `udtf_chunk_documents`); production n-grams stay JVM-side via
    transform/slice, which the dedup shingle family demonstrates.
    """
    from sparkml_som_spark.functions.udtfs import register_ngrams_udtf

    register_ngrams_udtf(spark)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("sgs_ngram_docs")
    return spark.sql(
        f"""
        SELECT g.gram, COUNT(*) AS n
        FROM sgs_ngram_docs d, LATERAL sgs_ngrams(d.text, {_NGRAM_N}) g
        GROUP BY g.gram
        HAVING COUNT(*) >= {_NGRAM_MIN_COUNT}
        """
    )


@register(
    "silhouette_simplified_labels",
    sql="""
    WITH dims AS (
        SELECT label, i,
               AVG(embedding[i]::DOUBLE) AS c
        FROM embeddings, unnest(range(1, 65)) AS u(i)
        GROUP BY label, i
    ), cents AS (
        SELECT label AS clabel, list(c ORDER BY i) AS carr FROM dims GROUP BY label
    ), scored AS (
        SELECT e.vec_id, e.label,
               MIN(CASE WHEN c.clabel = e.label
                        THEN list_distance(e.embedding::DOUBLE[], c.carr::DOUBLE[]) END) AS a,
               MIN(CASE WHEN c.clabel <> e.label
                        THEN list_distance(e.embedding::DOUBLE[], c.carr::DOUBLE[]) END) AS b
        FROM embeddings e, cents c
        GROUP BY e.vec_id, e.label
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT)                          AS n_vectors,
           ROUND(AVG((b - a) / GREATEST(a, b)), 4)           AS avg_silhouette,
           CAST(COUNT(*) FILTER (WHERE b > a) AS BIGINT)     AS n_well_assigned
    FROM scored GROUP BY label
    """,
    desc="simplified (centroid-based) silhouette per label: O(n*labels*dim), no all-pairs; well-assigned counts",
)
def silhouette_simplified_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality evaluation: the simplified silhouette —
    a(i) = distance to the OWN label centroid, b(i) = distance to the
    nearest OTHER centroid, s(i) = (b-a)/max(a,b) — averaged per
    label, plus how many vectors sit closer to their own centroid
    than to any other.

    The centroid table is bounded (labels x dims) and built with one
    map-side-combined pass; each vector then scores against the
    BROADCAST centroids — O(n * labels * dim) with no all-pairs term,
    the property that makes this the silhouette variant that survives
    100 TB (the textbook pairwise form is quadratic).
    """
    emb = load_table(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = (
        emb.select("label", F.posexplode("v").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "c"))), lambda s: s["c"]
            ).alias("carr")
        )
        .select(F.col("label").alias("clabel"), "carr")
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("v"), F.col("carr"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = (
        emb.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "label",
            F.when(F.col("clabel") == F.col("label"), dist).alias("da"),
            F.when(F.col("clabel") != F.col("label"), dist).alias("db"),
        )
        .groupBy("vec_id", "label")
        .agg(F.min("da").alias("a"), F.min("db").alias("b"))
    )
    s = (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b"))
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg(s), 4).alias("avg_silhouette"),
        F.count(F.when(F.col("b") > F.col("a"), 1)).alias("n_well_assigned"),
    )
