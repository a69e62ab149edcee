"""analytics8 mechanics: prefix-scan correctness vs a naive window,
Pareto dominance law, CEP flag replay, and centroid reconciliation."""

import datetime

import pytest
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import load_all
from sparkml_som_spark.plans import formatted_plan
from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


def test_prefix_max_matches_naive_window(spark):
    """distributed_prefix_max must agree with the single-task window
    form on a small table, for every row."""
    from sparkml_som_spark.operators.analytics8 import distributed_prefix_max

    df = spark.range(500).select(
        F.col("id").alias("k"),
        ((F.col("id") * 37 % 101) * 1.0).alias("v"),
    )
    got = {
        r["k"]: r["prev_max"]
        for r in distributed_prefix_max(df, "k", "v", n_parts=7).collect()
    }
    rows = sorted(((r["k"], r["v"]) for r in df.collect()))
    run = float("-inf")
    for k, v in rows:
        assert got[k] == run, (k, got[k], run)
        run = max(run, v)


def test_pareto_no_dominated_and_complete(spark):
    """No emitted point may be dominated by any (price, qty) pair in
    the data, and every non-dominated per-price max must be emitted."""
    rows = _registry()["pareto_frontier_lineitems"].fn(spark, SF).collect()
    frontier = {(r["price"], r["qty"]) for r in rows}
    li = load_table(spark, SF, "lineitem").select(
        F.col("l_extendedprice").alias("p"), F.col("l_quantity").alias("q")
    ).collect()
    pairs = {(r["p"], r["q"]) for r in li}
    for fp, fq in frontier:
        assert not any(
            (p <= fp and q >= fq and (p < fp or q > fq)) for p, q in pairs
        ), (fp, fq)
    # completeness: every pair not dominated by another must be on the frontier
    for p, q in pairs:
        dominated = any(
            (p2 <= p and q2 >= q and (p2 < p or q2 > q)) for p2, q2 in pairs
        )
        assert dominated or (p, q) in frontier, (p, q)


def test_cep_flags_replay(spark):
    """Replay the pattern in Python: matched/clean counts per day must
    agree exactly."""
    rows = {r["day"]: r for r in
            _registry()["cep_click_purchase_no_error"].fn(spark, SF).collect()}
    ev = load_table(spark, SF, "events").collect()
    clicks = [(r["user_id"], r["ts"]) for r in ev if r["event_type"] == "click"]
    errors = [(r["user_id"], r["ts"]) for r in ev if r["event_type"] == "error"]
    per_day = {}
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        pts, user = r["ts"], r["user_id"]
        lo = pts - datetime.timedelta(minutes=30)
        cands = [cts for u, cts in clicks if u == user and lo <= cts < pts]
        matched = bool(cands)
        clean = matched and not any(
            u == user and max(cands) < ets < pts for u, ets in errors
        )
        d = pts.date()
        tot, m, cl = per_day.get(d, (0, 0, 0))
        per_day[d] = (tot + 1, m + matched, cl + clean)
    assert set(rows) == set(per_day)
    for d, (tot, m, cl) in per_day.items():
        r = rows[d]
        assert (r["n_purchases"], r["n_matched"], r["n_clean"]) == (tot, m, cl)


def test_centroids_reconcile(spark):
    """Centroid of each (label, dim) must equal the rounded mean of the
    raw components; counts must equal the label sizes; output is the
    bounded labels x dims grid."""
    rows = _registry()["centroid_embeddings_by_label"].fn(spark, SF).collect()
    emb = load_table(spark, SF, "embeddings").collect()
    by_label = {}
    for r in emb:
        by_label.setdefault(r["label"], []).append(list(r["embedding"]))
    dims = len(emb[0]["embedding"])
    assert len(rows) == len(by_label) * dims
    got = {(r["label"], r["dim_idx"]): r for r in rows}
    for label, vecs in by_label.items():
        for d in range(dims):
            r = got[(label, d + 1)]
            mean = sum(float(v[d]) for v in vecs) / len(vecs)
            assert r["centroid"] == pytest.approx(round(mean, 4), abs=1e-9)
            assert r["n"] == len(vecs)


def test_centroids_single_shuffle_no_udf(spark):
    """The centroid plan must be pure JVM (no Python eval) with one
    aggregation exchange."""
    df = _registry()["centroid_embeddings_by_label"].fn(spark, SF)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") <= 2, plan  # partial+final agg exchange (+AQE read)
