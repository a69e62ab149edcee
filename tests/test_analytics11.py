"""analytics11 mechanics: z-test replay in Python, growth-ratio law,
streaming-vs-batch OHLC equality, and MRR consistency with the
matryoshka recall audit."""

import math

from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import load_all
from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


def test_abtest_python_replay(spark):
    """The z statistic must equal a direct Python computation from the
    four integer counts the query itself reports."""
    reg = _registry()
    r = reg["abtest_two_proportion"].fn(spark, SF).collect()[0]
    n_a, n_b, c_a, c_b = r["n_a"], r["n_b"], r["conv_a"], r["conv_b"]
    assert 0 <= c_a <= n_a and 0 <= c_b <= n_b
    p = (c_a + c_b) / (n_a + n_b)
    z = (c_a / n_a - c_b / n_b) / math.sqrt(p * (1 - p) * (1 / n_a + 1 / n_b))
    assert r["z_score"] == round(z, 4)
    assert r["significant_95"] == (abs(z) > 1.96)


def test_wow_growth_law(spark):
    """growth == (rev - prev)/prev for every row, and prev matches the
    previous calendar week's revenue."""
    reg = _registry()
    rows = sorted(
        reg["wow_revenue_growth"].fn(spark, SF).collect(), key=lambda r: r["week"]
    )
    assert rows
    for r in rows:
        assert r["wow_growth"] == round(
            (r["revenue"] - r["prev_revenue"]) / r["prev_revenue"], 6
        )


def test_stream_ohlc_equals_batch(spark):
    """The streaming bars drained via AvailableNow must equal the
    batch OHLC operator row-for-row (modulo window_start vs day)."""
    reg = _registry()
    stream_rows = {
        (r["event_type"], r["window_start"].date()): (
            r["open"], r["high"], r["low"], r["close"], r["volume"], r["n_events"],
        )
        for r in reg["stream_ohlc_bars"].fn(spark, SF).collect()
    }
    batch_rows = {
        (r["event_type"], r["day"]): (
            r["open"], r["high"], r["low"], r["close"], r["volume"], r["n_events"],
        )
        for r in reg["ohlc_daily_event_value"].fn(spark, SF).collect()
    }
    assert stream_rows == batch_rows


def test_mrr_consistent_with_recall(spark):
    """If a query's full-dim top-1 sits within the prefix top-10, the
    recall audit must count at least one common neighbor; rank 1 means
    the prefix ranking agrees on the winner."""
    reg = _registry()
    mrr = {r["query_id"]: r for r in reg["mrr_prefix_rank"].fn(spark, SF).collect()}
    rec = {
        r["query_id"]: r for r in reg["ann_matryoshka_prefix"].fn(spark, SF).collect()
    }
    assert set(mrr) == set(rec)
    for qid, r in mrr.items():
        assert r["prefix_rank"] >= 1
        assert r["reciprocal_rank"] == round(1.0 / r["prefix_rank"], 6)
        if r["prefix_rank"] <= 10:
            assert rec[qid]["n_common"] >= 1
