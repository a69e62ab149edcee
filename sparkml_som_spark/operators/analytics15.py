"""Analytics operators, round 5 twelfth wave: data-governance and
operational QA — k-anonymity auditing, embedding-column health
checks, join-key skew reporting, and a fixed-anchor freshness audit.

Scale discipline, per operator:

- the k-anonymity audit is ONE aggregate to the bounded
  quasi-identifier grid plus a one-row rollup — no per-row output;
- the embedding audit computes per-label norm statistics in a single
  pass (the L2 norm is a JVM-side fold, no Python), output bounded by
  labels;
- the skew report aggregates key frequencies (map-side combine), then
  TakeOrdered for the hot-key list and a one-row skew summary — the
  diagnostic run BEFORE choosing a salting strategy;
- freshness compares per-source max timestamps against a fixed
  anchor (deterministic — no wall clock in emitted values), bounded
  by sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import register
from sparkml_som_spark.sources import load_table

_KANON_K = 5


@register(
    "kanon_quasi_identifier_audit",
    sql=f"""
    WITH g AS (
        SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
               COUNT(*) AS group_size
        FROM customer GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT)                                    AS n_groups,
           CAST(COUNT(*) FILTER (WHERE group_size < {_KANON_K}) AS BIGINT)
                                                                       AS n_small_groups,
           CAST(SUM(CASE WHEN group_size < {_KANON_K} THEN group_size ELSE 0 END)
                AS BIGINT)                                             AS n_rows_at_risk,
           CAST(MIN(group_size) AS BIGINT)                             AS min_group_size,
           MIN(group_size) >= {_KANON_K}                               AS k_anonymous
    FROM g
    """,
    desc=f"k-anonymity audit (k={_KANON_K}) over the (nation, segment) quasi-identifier: small-group and at-risk-row accounting",
)
def kanon_quasi_identifier_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit: is the customer table k-anonymous over the
    (nationkey, mktsegment) quasi-identifier?  Reports the group
    count, how many groups fall below k, how many rows sit in those
    re-identifiable groups, and the overall verdict — the check a
    release gate runs before publishing a dataset.

    One aggregate to the bounded quasi-identifier grid (map-side
    combine), then a one-row rollup; nothing scales with the corpus
    except the single scan.
    """
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(F.count(F.lit(1)).alias("group_size"))
    small = F.col("group_size") < _KANON_K
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.count(F.when(small, 1)).alias("n_small_groups"),
        F.sum(F.when(small, F.col("group_size")).otherwise(0)).alias("n_rows_at_risk"),
        F.min("group_size").alias("min_group_size"),
        (F.min("group_size") >= _KANON_K).alias("k_anonymous"),
    )


@register(
    "embedding_norm_audit",
    sql="""
    WITH n AS (
        SELECT label,
               sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm,
               len(list_filter(embedding::DOUBLE[], x -> isnan(x))) AS n_nan
        FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT)                       AS n_vectors,
           ROUND(MIN(nrm), 4)                             AS min_norm,
           ROUND(MAX(nrm), 4)                             AS max_norm,
           ROUND(AVG(nrm), 4)                             AS avg_norm,
           CAST(COUNT(*) FILTER (WHERE nrm < 1e-6) AS BIGINT) AS n_near_zero,
           CAST(SUM(n_nan) AS BIGINT)                     AS n_nan_components
    FROM n GROUP BY label
    """,
    desc="embedding-column health: per-label L2-norm stats, near-zero-vector and NaN-component counts, one JVM-side pass",
)
def embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QA: per label, the L2-norm distribution (min/max/avg),
    the count of near-zero vectors (dead embeddings that poison cosine
    similarity), and NaN components — the health check run before any
    similarity or clustering job trusts the column.

    The norm is a JVM-side `aggregate` fold over the array (no
    Python); one corpus pass aggregates to the bounded label grid.
    """
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    v = F.col("embedding").cast("array<double>")
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    n_nan = F.size(F.filter(v, lambda x: F.isnan(x)))
    n = emb.select("label", nrm.alias("nrm"), n_nan.alias("n_nan"))
    return n.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.min("nrm"), 4).alias("min_norm"),
        F.round(F.max("nrm"), 4).alias("max_norm"),
        F.round(F.avg("nrm"), 4).alias("avg_norm"),
        F.count(F.when(F.col("nrm") < 1e-6, 1)).alias("n_near_zero"),
        F.sum("n_nan").alias("n_nan_components"),
    )


_SKEW_TOPN = 10


@register(
    "join_key_skew_audit",
    sql=f"""
    WITH kc AS (
        SELECT l_partkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY 1
    ), hot AS (
        SELECT key, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS r
        FROM kc
    )
    SELECT key, CAST(cnt AS BIGINT) AS cnt, CAST(r AS BIGINT) AS hot_rank,
           ROUND(cnt::DOUBLE * (SELECT COUNT(*) FROM kc) /
                 (SELECT SUM(cnt) FROM kc), 4) AS skew_factor
    FROM hot WHERE r <= {_SKEW_TOPN}
    """,
    desc=f"join-key skew report: top-{_SKEW_TOPN} hottest l_partkey values with per-key skew factor (cnt / mean cnt)",
)
def join_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The diagnostic run BEFORE choosing a join strategy: the hottest
    join-key values and each one's skew factor (its row count over the
    mean per-key count).  A factor near 1 means AQE alone is fine; a
    hot tail is what the salted-join helper (skew.py) exists for.

    Key frequencies aggregate with map-side combine; the hot list is
    TakeOrdered (bounded per-partition top-k + driver merge) and the
    mean joins back as a one-row broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    kc = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = kc.agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("cnt").alias("n_rows")
    )
    # rank assignment happens AFTER the TakeOrdered limit, so the
    # global window runs over <= _SKEW_TOPN rows
    hot = (
        kc.orderBy(F.desc("cnt"), F.asc("key"))
        .limit(_SKEW_TOPN)
        .withColumn(
            "hot_rank",
            F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("key"))),
        )
    )
    return hot.crossJoin(F.broadcast(stats)).select(
        "key",
        "cnt",
        F.col("hot_rank").cast("long").alias("hot_rank"),
        F.round(
            F.col("cnt").cast("double") * F.col("n_keys") / F.col("n_rows"), 4
        ).alias("skew_factor"),
    )


_FRESH_ANCHOR = "2024-02-01 00:00:00"


@register(
    "data_freshness_audit",
    sql=f"""
    SELECT event_type,
           MAX(ts)                                                    AS last_event_ts,
           CAST(COUNT(*) AS BIGINT)                                   AS n_events,
           ROUND((epoch_us(TIMESTAMP '{_FRESH_ANCHOR}') - epoch_us(MAX(ts)))
                 / 86400000000.0, 4)                                  AS staleness_days,
           (epoch_us(TIMESTAMP '{_FRESH_ANCHOR}') - epoch_us(MAX(ts)))
                 <= 2 * 86400000000                                   AS fresh_within_2d
    FROM events GROUP BY event_type
    """,
    desc="freshness audit vs a fixed anchor: per-type last event, staleness days, 2-day SLA flag — no wall clock in emitted values",
)
def data_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-freshness audit: per event type, the last event seen,
    staleness against a FIXED anchor timestamp, and a 2-day SLA flag.
    Anchoring to a constant (not the wall clock) keeps the emitted
    values deterministic — production would bind the anchor to the
    run's logical date the same way.

    One aggregate, bounded by event types; staleness is exact integer
    micros until the final days conversion.
    """
    ev = load_table(spark, sf_dir, "events")
    anchor = F.unix_micros(F.lit(_FRESH_ANCHOR).cast("timestamp"))
    stale_us = anchor - F.unix_micros(F.max("ts"))
    return ev.groupBy("event_type").agg(
        F.max("ts").alias("last_event_ts"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(stale_us / 86400000000.0, 4).alias("staleness_days"),
        (stale_us <= 2 * 86400000000).alias("fresh_within_2d"),
    )
