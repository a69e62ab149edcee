"""Statistical aggregates + regexp scalar functions (SURVEY.md §2B
scalar-function coverage, matched against DuckDB equivalents)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkml_som_spark.functions import word_tokens
from sparkml_som_spark.functions import round_half_away
from sparkml_som_spark.operators.registry import register
from sparkml_som_spark.sources import load_table


@register(
    "stats_agg_lineitem",
    sql="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 4)              AS price_stddev,
           ROUND(var_samp(l_quantity), 4)                      AS qty_var,
           ROUND(corr(l_extendedprice, l_quantity), 4)         AS price_qty_corr,
           ROUND(covar_samp(l_extendedprice, l_discount), 4)   AS price_disc_covar,
           ROUND(arg_min(l_extendedprice,
                 epoch(l_shipdate)::BIGINT * 100000000 + l_orderkey * 10 + l_linenumber), 4)
                                                               AS earliest_price,
           ROUND(arg_max(l_extendedprice,
                 epoch(l_shipdate)::BIGINT * 100000000 + l_orderkey * 10 + l_linenumber), 4)
                                                               AS latest_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    desc="stddev/variance/corr/covar + argmin/argmax aggregates",
)
def stats_agg_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # min_by/max_by on a tied key is nondeterministic (and engines break
    # ties differently) — extend the ordering key with the unique
    # (orderkey, linenumber) so both engines agree row-for-row.
    tiebreak = (
        F.unix_timestamp("l_shipdate") * F.lit(100000000)
        + F.col("l_orderkey") * 10
        + F.col("l_linenumber")
    )
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_discount"), 4).alias("price_disc_covar"),
        F.round(F.min_by("l_extendedprice", tiebreak), 4).alias("earliest_price"),
        F.round(F.max_by("l_extendedprice", tiebreak), 4).alias("latest_price"),
    )


@register(
    "regexp_extract_parts",
    sql="""
    SELECT p_partkey,
           CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INT)  AS brand_num,
           regexp_replace(p_type, '[aeiou]', '_', 'g')          AS type_devoweled,
           CASE WHEN regexp_matches(p_name, '^[a-m]') THEN 1 ELSE 0 END AS first_half_alpha
    FROM part
    WHERE p_size < 15
    """,
    desc="regexp extract/replace/match scalar functions",
)
def regexp_extract_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.where(F.col("p_size") < 15).select(
        "p_partkey",
        F.regexp_extract("p_brand", r"([0-9]+)", 1).cast("int").alias("brand_num"),
        F.regexp_replace("p_type", r"[aeiou]", "_").alias("type_devoweled"),
        F.when(F.col("p_name").rlike(r"^[a-m]"), 1).otherwise(0).alias("first_half_alpha"),
    )


@register(
    "udaf_geomean_orders",
    sql="""
    SELECT o_orderpriority,
           ROUND(exp(AVG(ln(o_totalprice))), 4) AS geo_mean_price,
           COUNT(*)                             AS n
    FROM orders
    WHERE o_totalprice > 0
    GROUP BY o_orderpriority
    """,
    desc="custom UDAF: grouped-agg pandas UDF (geometric mean)",
)
def udaf_geomean_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow grouped-agg pandas UDF — the UDAF surface. The same quantity
    is expressible as exp(avg(ln(x))) in pure SQL (the oracle does), so
    this intentionally checks the custom-aggregate machinery against a
    built-in formulation."""

    @F.pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        # Spark disallows mixing grouped-agg pandas UDFs with built-in
        # aggregates in one agg(), so the count is a pandas UDF too
        return len(v)

    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    return orders.groupBy("o_orderpriority").agg(
        F.round(geo_mean("o_totalprice"), 4).alias("geo_mean_price"),
        n_rows("o_totalprice").alias("n"),
    )


@register(
    "media_feature_pipeline",
    # The decode step is env-stubbed (no image libs), but every column
    # of the RESULT — content hash, canonical id, copy count, byte size
    # — is computed from the payload bytes themselves, so the full
    # mapInPandas plumbing still gets a value-hash oracle: a dropped,
    # duplicated, or bit-corrupted Arrow batch changes the hash.
    sql="""
    SELECT sha256(text)                      AS sha256,
           CAST(MIN(doc_id) AS BIGINT)       AS canonical_id,
           CAST(COUNT(*) AS BIGINT)          AS n_copies,
           ROUND(AVG(octet_length(CAST(text AS BLOB))), 4) AS avg_bytes
    FROM documents
    GROUP BY 1
    """,
    desc="multimodal: binary payloads -> mapInPandas feature extraction (hash/size columns under full oracle)",
)
def media_feature_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises the full multimodal path on real data: documents.text is
    cast to binary payloads (a stand-in for image bytes — the testdata
    has no blob column), pushed through the Arrow-batched decode +
    feature extraction, then near-dup-grouped by content hash."""
    from sparkml_som_spark.operators.multimodal import extract_image_features

    docs = load_table(spark, sf_dir, "documents", spread=True)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("image/fake").alias("mime"),
        F.lit(8).alias("width"),
        F.lit(8).alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
    feats = extract_image_features(media)
    return feats.groupBy("sha256").agg(
        F.min("media_id").alias("canonical_id"),
        F.count("*").alias("n_copies"),
        F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
    )


@register(
    "grouped_map_ols_per_source",
    sql="""
    SELECT source,
           ROUND(regr_slope(n_chars, n_tok), 6)     AS slope,
           ROUND(regr_intercept(n_chars, n_tok), 6) AS intercept,
           CAST(COUNT(*) AS BIGINT)                 AS n
    FROM (
        SELECT source, n_chars,
               len(string_split(lower(text), ' ')) AS n_tok
        FROM documents
    )
    GROUP BY source
    """,
    desc="applyInPandas grouped-map: per-source OLS fit, oracle = regr_slope/intercept",
)
def grouped_map_ols_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grouped-map (`groupBy().applyInPandas`) surface with a REAL
    oracle: each source's (token count -> char count) OLS line is fit
    with NumPy inside the group function, and DuckDB's closed-form
    regr_slope/regr_intercept must reproduce it exactly.

    This is the model-per-group pattern (per-tenant forecaster,
    per-segment calibration).  Scale: one shuffle on the group key;
    each group's pandas frame must fit an executor — true for
    per-source/per-tenant groups, and the reason the SOM does NOT use
    grouped-map for its global codebook (it uses mapInPandas partial
    aggregation instead, see SCALE.md)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        F.col("n_chars").cast("double").alias("n_chars"),
        F.size(word_tokens(F.col("text"))).cast("double").alias("n_tok"),
    )

    def fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
        x, y = pdf["n_tok"].to_numpy(), pdf["n_chars"].to_numpy()
        # closed-form OLS (matches regr_slope/regr_intercept definitions)
        xm, ym = x.mean(), y.mean()
        slope = ((x - xm) * (y - ym)).sum() / ((x - xm) ** 2).sum()
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "slope": [round_half_away(slope, 6)],
                "intercept": [round_half_away(ym - slope * xm, 6)],
                "n": [len(pdf)],
            }
        )

    return docs.groupBy("source").applyInPandas(
        fit_group, schema="source string, slope double, intercept double, n long"
    )


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "profile_table_columns",
    sql="""
    """
    + "\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS col_name,
           CAST(COUNT(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT)                 AS n_distinct,
           ROUND(MIN({c}), 4) AS min_v,
           ROUND(MAX({c}), 4) AS max_v
    FROM lineitem"""
        for c in _PROFILE_COLS
    ),
    desc="one-pass column profiler (ANALYZE): per-column nulls, distinct, min/max from a single scan",
)
def profile_table_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANALYZE/profiling pass every engine runs before planning and
    every data team runs before training: per-column null counts,
    distinct cardinality, and value bounds.  All four columns profile in
    ONE scan (one wide agg row, unpivoted driver-side via stack) —
    the naive per-column UNION ALL form (which the oracle uses) scans
    the table once per column, 4x the IO at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.round(F.min(c), 4).alias(f"{c}__min"),
            F.round(F.max(c), 4).alias(f"{c}__max"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (col_name, n_nulls, n_distinct, min_v, max_v)"
        )
    )
