"""analytics5 mechanics: exact-dyadic decay sums, interpolation
geometry, fixed-point PageRank invariants, Markov row-stochasticity,
PMI fan-out caps, constraint verdicts, and feature-scale ranges — plus
the plan shapes the scale story depends on."""

import math

import pytest
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import load_all
from sparkml_som_spark.plans import formatted_plan
from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


# -- decayed_activity_counts ------------------------------------------------


def test_decayed_counts_match_python_reference(spark):
    """Replay the decay sum in plain Python from the raw events — the
    Spark result must be bit-exact (the dyadic-arithmetic claim)."""
    ev = load_table(spark, SF, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = {}
    for r in ev.collect():
        daily[(r["event_type"], r["day"])] = (
            daily.get((r["event_type"], r["day"]), 0) + 1
        )
    out = _registry()["decayed_activity_counts"].fn(spark, SF).collect()
    assert len(out) > 0
    for r in out:
        expect = 0.0
        present = 0
        for j in range(7):
            n = daily.get((r["event_type"], r["day"] - __import__("datetime").timedelta(days=j)), 0)
            if n:
                present += 1
                expect += n * 0.5**j
        assert r["decayed_count"] == expect  # EXACT, not approx
        assert r["n_days_present"] == present
        assert r["n_today"] == daily[(r["event_type"], r["day"])]


def test_decayed_counts_broadcasts_bounded_side(spark):
    """The decay join must broadcast the bounded daily table — a
    corpus-scale shuffle join here would be the wrong plan."""
    df = _registry()["decayed_activity_counts"].fn(spark, SF)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


# -- interpolate_linear_revenue --------------------------------------------


def test_interpolation_geometry(spark):
    """Observed days pass through unchanged; gap days lie on the line
    between their neighbors (monotone between an increasing pair,
    within [min, max] of the two anchors always)."""
    rows = sorted(
        _registry()["interpolate_linear_revenue"].fn(spark, SF).collect(),
        key=lambda r: r["day"],
    )
    assert len(rows) == 365
    # build anchor list
    anchors = [(i, r["revenue"]) for i, r in enumerate(rows) if not r["was_gap"]]
    assert anchors, "no observed days in 1995 — fixture assumption broken"
    for i, r in enumerate(rows):
        if r["was_gap"]:
            prevs = [(j, v) for j, v in anchors if j < i]
            nexts = [(j, v) for j, v in anchors if j > i]
            if prevs and nexts:
                (j0, v0), (j1, v1) = prevs[-1], nexts[0]
                expect = v0 + (v1 - v0) * (i - j0) / (j1 - j0)
                assert r["revenue"] == pytest.approx(expect, abs=1e-3)
            elif prevs:
                assert r["revenue"] == prevs[-1][1]
            else:
                assert r["revenue"] == nexts[0][1]


# -- pagerank_nation_flows --------------------------------------------------


def test_pagerank_fixed_point_invariants(spark):
    """Ranks are positive, bounded by the scale, and close to the
    float-arithmetic reference (fixed-point floor error is at most a
    few ppm per edge, amplified by 3 iterations)."""
    out = {r["n_nationkey"]: r["rank_ppm"] for r in
           _registry()["pagerank_nation_flows"].fn(spark, SF).collect()}
    assert len(out) == 25
    base = 1_000_000 * 15 // 100 // 25
    assert all(base <= v <= 1_000_000 for v in out.values())
    # float reference from the same edge set
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    s = load_table(spark, SF, "supplier")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .agg(F.count("*").alias("w"))
        .collect()
    )
    outw = {}
    for e in edges:
        outw[e["src"]] = outw.get(e["src"], 0) + e["w"]
    ranks = {v: 1.0 / 25 for v in out}
    for _ in range(3):
        nxt = {v: 0.15 / 25 for v in out}
        for e in edges:
            nxt[e["dst"]] += 0.85 * ranks[e["src"]] * e["w"] / outw[e["src"]]
        ranks = nxt
    for v, fp in out.items():
        assert fp / 1e6 == pytest.approx(ranks[v], abs=5e-4), (v, fp, ranks[v])


# -- markov_event_transitions ----------------------------------------------


def test_markov_rows_are_stochastic(spark):
    """Per-src probabilities sum to exactly n_src/n_src-ish 1 (within
    float addition of <=5 exact divisions) and counts reconcile with
    the total number of lagged events."""
    rows = _registry()["markov_event_transitions"].fn(spark, SF).collect()
    assert rows
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append(r)
    ev = load_table(spark, SF, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n"] for r in rows) == n_events - n_users
    for src, group in by_src.items():
        assert sum(r["prob"] for r in group) == pytest.approx(1.0, abs=1e-12)
        assert all(r["n_src"] == group[0]["n_src"] for r in group)
        assert sum(r["n"] for r in group) == group[0]["n_src"]


# -- pmi_term_pairs ---------------------------------------------------------


def test_pmi_caps_and_ratio(spark):
    """Every emitted pair respects the df band, the min-support floor,
    and the exact count-ratio definition of pmi_ratio."""
    from sparkml_som_spark.operators.analytics5 import (
        _PMI_DF_HI_FRAC,
        _PMI_DF_HI_MUL,
        _PMI_DF_LO_MUL,
        _PMI_MIN_SUPPORT,
        _PMI_TOP,
    )

    rows = _registry()["pmi_term_pairs"].fn(spark, SF).collect()
    assert 0 < len(rows) <= _PMI_TOP
    from sparkml_som_spark.functions import word_tokens

    docs = load_table(spark, SF, "documents")
    toks = (
        docs.select("doc_id", F.explode(word_tokens(F.col("text"))).alias("t"))
        .where(F.length("t") >= 3)
        .distinct()
        .collect()
    )
    ndocs = len({r["doc_id"] for r in toks})
    df = {}
    for r in toks:
        df[r["t"]] = df.get(r["t"], 0) + 1
    for r in rows:
        assert r["t1"] < r["t2"]
        assert r["n12"] >= _PMI_MIN_SUPPORT
        for t, dcol in ((r["t1"], "df1"), (r["t2"], "df2")):
            assert r[dcol] == df[t]
            assert r[dcol] * _PMI_DF_LO_MUL >= ndocs
            assert r[dcol] * _PMI_DF_HI_MUL <= ndocs * _PMI_DF_HI_FRAC
        assert r["pmi_ratio"] == r["n12"] * ndocs * 1.0 / (r["df1"] * r["df2"])


# -- constraint_check_orders ------------------------------------------------


def test_constraint_suite_verdicts(spark):
    """The fixture data is clean: every constraint passes, observed
    values are consistent with their definitions, and the suite has
    exactly the declared six checks."""
    rows = {r["check_name"]: r for r in
            _registry()["constraint_check_orders"].fn(spark, SF).collect()}
    assert set(rows) == {
        "completeness_custkey",
        "uniqueness_orderkey",
        "min_totalprice_positive",
        "max_totalprice_bound",
        "status_in_domain",
        "ri_orders_to_customer",
    }
    assert all(r["pass"] for r in rows.values()), rows
    assert rows["completeness_custkey"]["observed"] == 1.0
    assert rows["uniqueness_orderkey"]["observed"] == 1.0
    assert rows["status_in_domain"]["observed"] == 0.0
    assert rows["ri_orders_to_customer"]["observed"] == 0.0


def test_constraint_suite_single_scan_for_scalars(spark):
    """The five scalar constraints must come from ONE aggregate over
    orders — the plan may scan orders at most twice in total (once for
    the metrics aggregate, once for the RI anti-join)."""
    df = _registry()["constraint_check_orders"].fn(spark, SF)
    plan = formatted_plan(df)
    assert plan.count("orders.parquet") <= 2, plan


# -- feature_scale_lineitem -------------------------------------------------


def test_feature_scale_ranges(spark):
    """min-max outputs span exactly [0, 1]; z-scores are centered
    (mean ~ 0) and unit-scaled (std ~ 1) up to the rounded-stats
    quantization."""
    df = _registry()["feature_scale_lineitem"].fn(spark, SF)
    rows = df.collect()
    n = len(rows)
    assert n == load_table(spark, SF, "lineitem").count()
    mm = [r["price_minmax"] for r in rows]
    assert min(mm) == 0.0 and max(mm) == 1.0
    assert all(0.0 <= v <= 1.0 for v in mm)
    zs = [r["price_z"] for r in rows]
    mean_z = sum(zs) / n
    var_z = sum((z - mean_z) ** 2 for z in zs) / (n - 1)
    assert abs(mean_z) < 1e-3
    assert abs(math.sqrt(var_z) - 1.0) < 1e-3


def test_feature_scale_no_window_no_second_shuffle(spark):
    """The transform must be stats-broadcast onto the scan: no Window
    node, and the one-row stats side joined via broadcast."""
    df = _registry()["feature_scale_lineitem"].fn(spark, SF)
    plan = formatted_plan(df)
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
