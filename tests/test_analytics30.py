"""Round-9 third wave (analytics30) — semantic laws beyond the DuckDB
oracle (which pins exact values): synchronized-LPA determinism, cosine
recommender arithmetic, hard-negative label hygiene, quantile-sketch
mergeability, jackknife recomputation, normalizer idempotence."""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# community_lpa_parts


def test_lpa_is_deterministic_and_partitions_nodes(spark, sf_dir):
    """Synchronized LPA is a pure function of the graph: two runs agree
    exactly (async/scan-order LPA would not), sizes are non-increasing,
    and the top-20 total never exceeds the node count."""
    from sparkml_som_spark.operators.analytics30 import community_lpa_parts
    from sparkml_som_spark.sources import load_table

    r1 = [tuple(r) for r in community_lpa_parts(spark, sf_dir).collect()]
    r2 = [tuple(r) for r in community_lpa_parts(spark, sf_dir).collect()]
    assert r1 == r2
    sizes = [n for _, n in r1]
    assert sizes == sorted(sizes, reverse=True)
    n_nodes = (
        load_table(spark, sf_dir, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(sizes) <= n_nodes
    assert all(n >= 1 for n in sizes)


# ---------------------------------------------------------------------------
# recs_item_item_cosine


@pytest.fixture(scope="module")
def rec_rows(spark, sf_dir):
    from sparkml_som_spark.operators.analytics30 import recs_item_item_cosine

    return recs_item_item_cosine(spark, sf_dir).collect()


def test_recs_rank_shape(rec_rows):
    """Per-brand ranks are contiguous from 1 and cosine is
    non-increasing down each brand's list."""
    by_brand = {}
    for r in rec_rows:
        by_brand.setdefault(r["brand"], []).append(r)
    for brand, rows in by_brand.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        sims = [r["cos_sim"] for r in rows]
        assert all(a >= b for a, b in zip(sims, sims[1:]))
        assert all(0.0 < r["cos_sim"] <= 1.0 for r in rows)
        assert all(r["rec_brand"] != brand for r in rows)


def test_recs_cosine_matches_support_arithmetic(spark, sf_dir, rec_rows):
    """cos(i,j) recomputed from distinct customer-brand supports equals
    the reported value for every emitted pair."""
    from sparkml_som_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("u")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"), F.col("p_brand").alias("b")
    )
    ub = li.join(orders, "ok").join(part, "pk").select("u", "b").distinct()
    support = {r["b"]: r["n"] for r in ub.groupBy("b").agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in rec_rows:
        want = r["co_users"] / math.sqrt(support[r["brand"]] * support[r["rec_brand"]])
        assert r["cos_sim"] == pytest.approx(want, abs=5e-5)


# ---------------------------------------------------------------------------
# hard_negative_mining


def test_hard_negatives_have_different_labels(spark, sf_dir):
    from sparkml_som_spark.operators.analytics30 import (
        _HN_QUERIES,
        _HN_TOPK,
        hard_negative_mining,
    )

    rows = hard_negative_mining(spark, sf_dir).collect()
    assert len(rows) == _HN_QUERIES * _HN_TOPK
    by_q = {}
    for r in rows:
        assert r["neighbor_label"] != r["query_label"]
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == _HN_QUERIES
    for rows_q in by_q.values():
        rows_q.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows_q] == list(range(1, _HN_TOPK + 1))
        sims = [r["cos_sim"] for r in rows_q]
        assert all(a >= b for a, b in zip(sims, sims[1:]))


# ---------------------------------------------------------------------------
# quantile_mergeable_sketch


def test_quantile_sketch_error_certificate(spark, sf_dir):
    """Every exact order statistic lands inside its reported bin, and
    the approximate quantiles are monotone p50 <= p90 <= p99."""
    from sparkml_som_spark.operators.analytics30 import quantile_mergeable_sketch

    rows = quantile_mergeable_sketch(spark, sf_dir).collect()
    assert rows
    for r in rows:
        for nm in ("p50", "p90", "p99"):
            assert r[f"{nm}_in_bin"] is True
        assert r["approx_p50"] <= r["approx_p90"] <= r["approx_p99"]


def test_quantile_sketch_merge_is_shard_invariant(spark, sf_dir):
    """THE mergeability law: partials built under any sharding merge to
    the identical histogram, so the read-off quantiles cannot depend on
    how the data was split."""
    from sparkml_som_spark.operators.analytics30 import _QS_BIN_W, _QS_SHARDS
    from sparkml_som_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")

    def merged(shards: int):
        partials = ev.groupBy(
            "event_type",
            (F.col("user_id") % shards).alias("shard"),
            F.floor(F.col("value") / _QS_BIN_W).cast("long").alias("bin"),
        ).agg(F.count(F.lit(1)).alias("cnt"))
        return {
            (r["event_type"], r["bin"]): r["n"]
            for r in partials.groupBy("event_type", "bin")
            .agg(F.sum("cnt").alias("n"))
            .collect()
        }

    assert merged(1) == merged(_QS_SHARDS) == merged(3)


# ---------------------------------------------------------------------------
# jackknife_ratio_ci


def test_jackknife_matches_numpy_recomputation(spark, sf_dir):
    """Recompute the delete-one-month jackknife from the per-month
    sufficient statistics in plain Python and compare all four outputs."""
    from sparkml_som_spark.operators.analytics30 import jackknife_ratio_ci
    from sparkml_som_spark.sources import load_table

    row = jackknife_ratio_ci(spark, sf_dir).collect()
    assert len(row) == 1
    row = row[0]

    strata = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("m"))
        .agg(F.sum("o_totalprice").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    st = sum(r["s"] for r in strata)
    nt = sum(r["n"] for r in strata)
    k = len(strata)
    r_i = [(st - r["s"]) / (nt - r["n"]) for r in strata]
    jm = sum(r_i) / k
    se = math.sqrt((k - 1.0) / k * sum((x - jm) ** 2 for x in r_i))

    assert row["n_strata"] == k
    assert row["ratio_overall"] == pytest.approx(st / nt, abs=1e-5)
    assert row["jk_mean"] == pytest.approx(jm, abs=1e-5)
    assert row["jk_se"] == pytest.approx(se, abs=1e-3)
    # the jackknife mean of a smooth ratio sits within a few SE/sqrt(k)
    # of the plug-in ratio
    assert abs(row["jk_mean"] - row["ratio_overall"]) < row["jk_se"]


# ---------------------------------------------------------------------------
# normalize_dedup_gain


def test_normalize_gain_identity_and_bounds(spark, sf_dir):
    """gained == dup_normalized - dup_raw (set-algebra identity) and
    normalization can only surface MORE duplicates, never fewer."""
    from sparkml_som_spark.operators.analytics30 import normalize_dedup_gain

    for r in normalize_dedup_gain(spark, sf_dir).collect():
        assert r["gained"] == r["dup_normalized"] - r["dup_raw"]
        assert r["dup_normalized"] >= r["dup_raw"] >= 0
        assert r["n_docs"] > 0


def test_normalizer_is_idempotent(spark, sf_dir):
    """Applying the canonicalizer twice equals applying it once, for
    every document — the property that makes it safe as a dedup key."""
    from sparkml_som_spark.operators.analytics30 import _NORM_PUNCT
    from sparkml_som_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")

    def norm(col):
        return F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(col), _NORM_PUNCT, ""), r"\s+", " "
            )
        )

    n_diff = (
        docs.select(norm(F.col("text")).alias("n1"))
        .select("n1", norm(F.col("n1")).alias("n2"))
        .where(F.col("n1") != F.col("n2"))
        .count()
    )
    assert n_diff == 0
