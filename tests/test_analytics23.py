"""analytics23 mechanics: funnel latency consistency with the funnel
counters, and LTV cumulative/conservation laws."""

from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import load_all
from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


def test_funnel_latency_consistent_with_counters(spark):
    """Latency row counts must equal the funnel's stage counts, and
    every hop latency obeys the funnel's 7-day qualification window."""
    reg = _registry()
    lat = {r["hop"]: r for r in reg["funnel_stage_latency"].fn(spark, SF).collect()}
    fun = reg["funnel_conversion_events"].fn(spark, SF).collect()[0]
    assert lat["signup_to_click"]["n_users"] == fun["n_click"]
    assert lat["click_to_purchase"]["n_users"] == fun["n_purchase"]
    for hop, r in lat.items():
        assert 0 <= r["p50_hours"] <= r["p90_hours"] <= r["max_hours"]
        assert r["max_hours"] < 7 * 24


def test_ltv_cumulative_and_conservation(spark):
    """cum_value is the running sum of week_value per cohort, and the
    grand total equals the purchase value of signup users counted from
    their cohort week."""
    reg = _registry()
    rows = reg["cohort_ltv_matrix"].fn(spark, SF).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], []).append(r)
    assert by_cohort
    for cw, items in by_cohort.items():
        items.sort(key=lambda r: r["week_offset"])
        run = 0.0
        for r in items:
            run = round(run + r["week_value"], 4)
            assert abs(r["cum_value"] - run) < 1e-3, (cw, r)
    ev = load_table(spark, SF, "events")
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).cast("date").alias("cw"))
    )
    total = (
        ev.where(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .where(F.col("ts") >= F.col("cw"))
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    assert abs(sum(r["week_value"] for r in rows) - total) < 1e-2


def test_backlog_replay_and_terminal_zero(spark):
    """The running backlog must equal a Python sweep over order spans,
    and must return to zero after the last end day."""
    reg = _registry()
    rows = sorted(
        reg["open_orders_backlog"].fn(spark, SF).collect(), key=lambda r: r["day"]
    )
    assert rows
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    spans = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("s"))
        .agg(F.to_date(F.max("l_shipdate")).alias("e"))
        .collect()
    )
    import datetime

    deltas = {}
    for r in spans:
        deltas[r["s"]] = deltas.get(r["s"], 0) + 1
        d1 = r["e"] + datetime.timedelta(days=1)
        deltas[d1] = deltas.get(d1, 0) - 1
    run, want = 0, {}
    for day in sorted(deltas):
        run += deltas[day]
        want[day] = (deltas[day], run)
    got = {r["day"]: (r["net_change"], r["open_orders"]) for r in rows}
    for day, v in got.items():
        assert want[day] == v, day
    assert rows[-1]["open_orders"] == 0 or rows[-1]["net_change"] != 0
    # total conservation: sum of deltas is zero
    assert sum(r["net_change"] for r in rows) == 0


def test_benford_shares_partition(spark):
    """Observed shares sum to 1 across the nine digits; counts
    partition the orders table; Benford shares are the known
    constants."""
    reg = _registry()
    rows = {r["digit"]: r for r in reg["benford_first_digit_audit"].fn(spark, SF).collect()}
    assert set(rows) <= set(range(1, 10))
    total = load_table(spark, SF, "orders").count()
    assert sum(r["n_orders"] for r in rows.values()) == total
    assert abs(sum(r["observed_share"] for r in rows.values()) - 1.0) < 1e-3
    from sparkml_som_spark.operators.analytics23 import _BENFORD

    for d, r in rows.items():
        assert r["benford_share"] == _BENFORD[d]
        assert abs(r["abs_diff"] - round(abs(r["observed_share"] - _BENFORD[d]), 6)) < 2e-6


def test_gini_python_replay_and_bounds(spark):
    """Gini must match a direct Python computation over sorted
    per-customer revenues, and lie in [0, 1)."""
    reg = _registry()
    r = reg["gini_revenue_concentration"].fn(spark, SF).collect()[0]
    rev = sorted(
        (round(x["s"], 4), x["o_custkey"])
        for x in load_table(spark, SF, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("s"))
        .collect()
    )
    n = len(rev)
    S = sum(v for v, _ in rev)
    T = sum((idx + 1) * v for idx, (v, _) in enumerate(rev))
    want = (2 * T - (n + 1) * S) / (n * S)
    assert r["n_customers"] == n
    assert abs(r["gini"] - round(want, 6)) < 1e-5
    assert 0.0 <= r["gini"] < 1.0
