"""Analytics operators, round 5 twenty-first wave: distributed model
evaluation and exact allocation — ranking-metric AUC (Mann-Whitney),
NDCG@10 retrieval quality, largest-remainder quota apportionment, and
CUSUM drift detection.

Scale discipline:

- AUC never enumerates positive x negative pairs: the tie-corrected
  Mann-Whitney U folds over SCORE GROUPS (deliberately banded scores,
  bounded at any corpus size), so the only global window runs over
  that bounded table;
- NDCG reuses the broadcast-queries brute-force ranking (corpus streams
  once) and replaces libm log2 with hardcoded discount constants so the
  metric is bit-deterministic across engines;
- quota apportionment is one map-side-combined aggregate to the bounded
  source table plus a one-row total broadcast — the exact-integer
  answer to "sample N docs proportionally" that per-group Bernoulli
  sampling only approximates;
- CUSUM accumulates over the bounded day spine only, with the mean
  pinned by a one-row broadcast and rounded ONCE so the cumulative fold
  is bit-deterministic in day order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import register
from sparkml_som_spark.sources import load_table

# --------------------------------------------------------------------------
# 1. AUC via tie-corrected Mann-Whitney over score groups
# --------------------------------------------------------------------------


@register(
    "auc_urgent_order_price",
    sql="""
    WITH scored AS (
        SELECT CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT) AS score,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS label
        FROM orders
    ), grp AS (
        SELECT score,
               SUM(label)     AS n_pos,
               SUM(1 - label) AS n_neg
        FROM scored GROUP BY score
    ), cum AS (
        SELECT score, n_pos, n_neg,
               SUM(n_neg) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) - n_neg
                   AS neg_below
        FROM grp
    )
    SELECT CAST(SUM(n_pos) AS BIGINT) AS n_pos,
           CAST(SUM(n_neg) AS BIGINT) AS n_neg,
           ROUND(SUM(n_pos * (neg_below + n_neg / 2.0))
                 / (SUM(n_pos) * SUM(n_neg)), 6) AS auc
    FROM cum
    """,
    desc="ranking-metric AUC (tie-corrected Mann-Whitney) of price band predicting order urgency; folds over bounded score groups, never pos x neg pairs",
)
def auc_urgent_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed AUC: how well an order's price band ranks URGENT
    orders above the rest — the ranking metric every classifier eval
    reports, computed exactly with the tie-corrected Mann-Whitney U.

    The scale-honest shape: AUC is a statement about positive/negative
    PAIRS, but the pair enumeration is never materialized.  Scores are
    DELIBERATELY banded (floor(price/1000) — ~hundreds of bands at any
    corpus size) so the score-group table the fold runs over is
    bounded; the AUC of the banded predictor is exact, with ties inside
    a band given their standard 0.5 credit:
    U = sum_g n_pos_g * (negatives_below_g + n_neg_g / 2).  The only
    global window orders the bounded score-group table.  Exact integer
    arithmetic until the single final division.
    """
    o = load_table(spark, sf_dir, "orders")
    scored = o.select(
        F.floor(F.col("o_totalprice") / 1000.0).cast("long").alias("score"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("label"),
    )
    grp = scored.groupBy("score").agg(
        F.sum("label").alias("n_pos"),
        F.sum(1 - F.col("label")).alias("n_neg"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = grp.withColumn("neg_below", F.sum("n_neg").over(w) - F.col("n_neg"))
    u = F.sum(F.col("n_pos") * (F.col("neg_below") + F.col("n_neg") / 2.0))
    return cum.agg(
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum("n_neg").cast("long").alias("n_neg"),
        F.round(u / (F.sum("n_pos") * F.sum("n_neg")), 6).alias("auc"),
    )


# --------------------------------------------------------------------------
# 2. NDCG@10 retrieval quality over the brute-force cosine ranking
# --------------------------------------------------------------------------

# 1/log2(i + 1) for rank i = 1..10, hardcoded so no libm log appears in
# any emitted value (JVM Math.log vs C log2 differ in ulps)
_DCG_W = {
    1: 1.0,
    2: 0.6309297535714575,
    3: 0.5,
    4: 0.43067655807339306,
    5: 0.38685280723454163,
    6: 0.3562071871080222,
    7: 0.3333333333333333,
    8: 0.31546487678572877,
    9: 0.3010299956639812,
    10: 0.2890648263178879,
}
_DCG_W_SQL = "CASE " + " ".join(
    f"WHEN {{col}} = {i} THEN {w!r}::DOUBLE" for i, w in _DCG_W.items()
) + " END"


@register(
    "ndcg_label_retrieval",
    sql=f"""
    WITH topk AS (
        SELECT query_id, q_label, n_label, rank FROM (
            SELECT q.vec_id AS query_id, q.label AS q_label, e.label AS n_label,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(
                           q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                                e.vec_id
                   ) AS rank
            FROM (SELECT * FROM embeddings WHERE vec_id < 5) q
            JOIN embeddings e ON e.vec_id <> q.vec_id
        ) WHERE rank <= 10
    ), rel AS (
        SELECT query_id, rank,
               CASE WHEN n_label = q_label THEN 1 ELSE 0 END AS rel,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY CASE WHEN n_label = q_label THEN 1 ELSE 0 END DESC,
                            rank
               ) AS irank
        FROM topk
    )
    SELECT query_id,
           CAST(SUM(rel) AS BIGINT) AS n_relevant,
           ROUND(COALESCE(
               SUM(rel * {_DCG_W_SQL.format(col="rank")})
               / NULLIF(SUM(rel * {_DCG_W_SQL.format(col="irank")}), 0), 0.0), 6)
               AS ndcg
    FROM rel GROUP BY query_id
    """,
    desc="NDCG@10 of label-match relevance over the exact cosine ranking; hardcoded log2 discounts, broadcast queries, corpus streams once",
)
def ndcg_label_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality eval: NDCG@10 per query where a neighbor is
    relevant iff it shares the query's label — the eval loop behind
    every embedding-model comparison, run on the exact cosine ranking.

    Reuses the brute-force shape (queries broadcast, corpus streams
    once, per-query top-10 via ROW_NUMBER); the ideal ranking re-sorts
    the SAME retrieved set by relevance (ties by observed rank), so
    NDCG = DCG / IDCG is 1.0 exactly when all relevant hits pack the
    top.  The log2 discounts are hardcoded constants — JVM `Math.log`
    and C `log2` differ in ulps, so no libm call appears in any emitted
    value and the metric is bit-deterministic across engines.
    """
    emb = load_table(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("label").alias("q_label"),
    )
    cos = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / (
        F.sqrt(F.aggregate(F.col("qv"), F.lit(0.0), lambda a, x: a + x * x))
        * F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x))
    )
    scored = emb.join(F.broadcast(q), emb.vec_id != q.query_id).select(
        "query_id",
        "q_label",
        F.col("label").alias("n_label"),
        cos.alias("cos_raw"),
        "vec_id",
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("vec_id"))
    topk = (
        scored.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= 10)
        .select(
            "query_id",
            F.when(F.col("n_label") == F.col("q_label"), 1).otherwise(0).alias("rel"),
            "rank",
        )
    )
    wi = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("rank"))
    rel = topk.withColumn("irank", F.row_number().over(wi))
    wmap = F.create_map(*[F.lit(x) for kv in _DCG_W.items() for x in kv])
    dcg = F.sum(F.col("rel") * wmap[F.col("rank")])
    idcg = F.sum(F.col("rel") * wmap[F.col("irank")])
    return rel.groupBy("query_id").agg(
        F.sum("rel").cast("long").alias("n_relevant"),
        F.round(
            F.coalesce(dcg / F.nullif(idcg, F.lit(0)), F.lit(0.0)), 6
        ).alias("ndcg"),
    )


# --------------------------------------------------------------------------
# 3. largest-remainder (Hamilton) quota apportionment
# --------------------------------------------------------------------------

_QUOTA_BUDGET = 997  # prime, so fractional remainders are never all zero


@register(
    "quota_largest_remainder",
    sql=f"""
    WITH g AS (
        SELECT source, SUM(n_chars) AS weight FROM documents GROUP BY source
    ), t AS (
        SELECT SUM(weight) AS total FROM g
    ), e AS (
        SELECT g.source, g.weight,
               ({_QUOTA_BUDGET} * CAST(g.weight AS DOUBLE)) / t.total AS exact_share
        FROM g, t
    ), b AS (
        SELECT source, weight, exact_share,
               CAST(FLOOR(exact_share) AS BIGINT) AS base_quota,
               exact_share - FLOOR(exact_share)   AS remainder,
               ROW_NUMBER() OVER (
                   ORDER BY exact_share - FLOOR(exact_share) DESC, source
               ) AS rem_rank,
               {_QUOTA_BUDGET} - SUM(CAST(FLOOR(exact_share) AS BIGINT)) OVER ()
                   AS leftover
        FROM e
    )
    SELECT source,
           CAST(weight AS BIGINT) AS weight,
           base_quota,
           CAST(base_quota + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS quota
    FROM b
    """,
    desc="largest-remainder (Hamilton) apportionment of a fixed sample budget across doc sources by char weight; bounded group table, one-row total broadcast",
)
def quota_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer sampling quotas: apportion a fixed budget of 997
    sample slots across document sources proportionally to their total
    characters, by Hamilton's largest-remainder method — quotas sum to
    the budget EXACTLY, which per-group Bernoulli sampling can only
    approximate in expectation.

    One map-side-combined aggregate to the bounded source table, a
    one-row total broadcast for the exact shares, floors for the base
    quotas, and the leftover slots go to the largest fractional
    remainders (ties by source).  All windows run over the bounded
    source table.  The share `(budget * weight) / total` is a single
    double division of exact integers — bit-identical across engines —
    so the remainder ranking never diverges from the oracle.
    """
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("source").agg(F.sum("n_chars").alias("weight"))
    t = g.agg(F.sum("weight").alias("total"))
    e = g.crossJoin(F.broadcast(t)).select(
        "source",
        "weight",
        (
            (F.lit(_QUOTA_BUDGET) * F.col("weight").cast("double")) / F.col("total")
        ).alias("exact_share"),
    )
    b = (
        e.withColumn("base_quota", F.floor("exact_share").cast("long"))
        .withColumn("remainder", F.col("exact_share") - F.floor("exact_share"))
        .withColumn(
            "rem_rank",
            F.row_number().over(Window.orderBy(F.desc("remainder"), F.asc("source"))),
        )
        .withColumn(
            "leftover",
            F.lit(_QUOTA_BUDGET)
            - F.sum("base_quota").over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
    )
    return b.select(
        "source",
        F.col("weight").cast("long").alias("weight"),
        "base_quota",
        (
            F.col("base_quota")
            + F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
        ).cast("long").alias("quota"),
    )


# --------------------------------------------------------------------------
# 4. CUSUM drift detection over the bounded day spine
# --------------------------------------------------------------------------


@register(
    "cusum_drift_revenue",
    sql="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               ROUND(SUM(o_totalprice), 4) AS rev
        FROM orders GROUP BY 1
    ), m AS (
        SELECT ROUND(AVG(rev), 4) AS mean_rev FROM daily
    ), c AS (
        SELECT d.day, d.rev,
               SUM(d.rev - m.mean_rev) OVER (ORDER BY d.day
                                             ROWS UNBOUNDED PRECEDING) AS cusum
        FROM daily d, m
    )
    SELECT day, rev,
           ROUND(cusum, 4) AS cusum,
           CASE WHEN ABS(cusum) = MAX(ABS(cusum)) OVER () THEN 1 ELSE 0 END
               AS is_peak_shift
    FROM c
    """,
    desc="CUSUM drift series on daily revenue: bounded day spine, one-row rounded mean broadcast, deterministic day-ordered cumulative fold; peak |CUSUM| flags the likeliest changepoint",
)
def cusum_drift_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift / changepoint screening: the CUSUM series of daily revenue
    against its long-run mean — the classic control-chart fold whose
    peak |CUSUM| day is the maximum-likelihood single changepoint under
    a mean-shift model.

    Scale shape: revenue aggregates to the bounded day spine with
    map-side combine and is rounded ONCE there; the mean is a one-row
    broadcast, itself rounded so the cumulative fold subtracts the same
    constant in both engines; the running sum then proceeds in day
    order — a deterministic sequential fold over ~thousands of calendar
    days at any corpus size, bit-identical across engines.  The peak
    flag compares against a one-pass global max window over the same
    bounded table.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 4).alias("rev")
    )
    m = daily.agg(F.round(F.avg("rev"), 4).alias("mean_rev"))
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = (
        daily.crossJoin(F.broadcast(m))
        .withColumn("cusum", F.sum(F.col("rev") - F.col("mean_rev")).over(wc))
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "day",
        "rev",
        F.round("cusum", 4).alias("cusum"),
        F.when(F.abs("cusum") == F.max(F.abs("cusum")).over(wall), 1)
        .otherwise(0)
        .alias("is_peak_shift"),
    )
