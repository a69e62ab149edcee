"""analytics7 + stream_decayed_counters mechanics: equi-depth bucket
balance, attribution credit conservation, MAD definitions, tombstone
reconciliation, and the streaming merge's batch-order independence."""

import datetime

import pytest
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import load_all
from sparkml_som_spark.plans import formatted_plan
from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


def test_equidepth_buckets_balanced(spark):
    """Bucket populations may differ by at most 1 (the defining
    property), ranges must be non-overlapping and ordered, and the
    Spark plan must not contain a partitionless Window."""
    from sparkml_som_spark.operators.analytics7 import _EQD_BUCKETS

    df = _registry()["histogram_equidepth_prices"].fn(spark, SF)
    rows = sorted(df.collect(), key=lambda r: r["bucket"])
    assert [r["bucket"] for r in rows] == list(range(_EQD_BUCKETS))
    counts = [r["n_rows"] for r in rows]
    assert max(counts) - min(counts) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"]


def test_attribution_credit_conserved(spark):
    """Total credit across days equals the number of purchases that
    had at least one qualifying touch — each such purchase distributes
    exactly one unit."""
    rows = _registry()["attribution_multi_touch"].fn(spark, SF).collect()
    assert rows
    ev = load_table(spark, SF, "events").collect()
    purchases = [(r["event_id"], r["user_id"], r["ts"]) for r in ev
                 if r["event_type"] == "purchase"]
    clicks = [(r["user_id"], r["ts"]) for r in ev if r["event_type"] == "click"]
    touched = 0
    for pid, user, pts in purchases:
        lo = pts - datetime.timedelta(days=7)
        if any(u == user and lo <= cts < pts for u, cts in clicks):
            touched += 1
    total_credit = sum(r["credit"] for r in rows)
    assert total_credit == pytest.approx(touched, abs=0.01 * len(rows))
    assert sum(r["n_purchases_touched"] for r in rows) >= touched


def test_robust_mad_definitions(spark):
    """med/mad must equal the (rounded) Python percentile replay and
    outlier counts must match the 2-robust-sigma predicate over the
    agreed constants."""
    rows = {r["event_type"]: r for r in
            _registry()["robust_mad_event_values"].fn(spark, SF).collect()}
    ev = load_table(spark, SF, "events").select("event_type", "value").collect()
    groups = {}
    for r in ev:
        groups.setdefault(r["event_type"], []).append(r["value"])

    def pct(xs, q):
        xs = sorted(xs)
        d = (len(xs) - 1) * q
        i, g = int(d), d - int(d)
        return xs[i] if g == 0 else xs[i] * (1 - g) + xs[i + 1] * g

    assert set(rows) == set(groups)
    for et, xs in groups.items():
        med = round(pct(xs, 0.5), 4)
        assert rows[et]["med"] == pytest.approx(med, abs=1e-9)
        mad = round(pct([abs(x - med) for x in xs], 0.5), 4)
        assert rows[et]["mad"] == pytest.approx(mad, abs=1e-9)
        n_out = sum(1 for x in xs if abs(x - med) > 2.0 * 1.4826 * mad)
        assert rows[et]["n_outliers"] == n_out
        assert rows[et]["n"] == len(xs)


def test_tombstone_audit_reconciles(spark):
    """retained + deleted must equal the per-day event count, and the
    deleted side must exactly cover the tombstoned users' events."""
    rows = {r["day"]: r for r in
            _registry()["delete_tombstone_audit"].fn(spark, SF).collect()}
    ev = load_table(spark, SF, "events").collect()
    tomb = {r["user_id"] for r in ev if r["event_type"] == "error"}
    per_day = {}
    for r in ev:
        d = r["ts"].date()
        tot, dele, users = per_day.get(d, (0, 0, set()))
        tot += 1
        if r["user_id"] in tomb:
            dele += 1
            users = users | {r["user_id"]}
        per_day[d] = (tot, dele, users)
    assert set(rows) == set(per_day)
    for d, (tot, dele, users) in per_day.items():
        r = rows[d]
        assert r["n_retained"] + r["n_deleted"] == tot
        assert r["n_deleted"] == dele
        assert r["n_users_deleted"] == len(users)


def test_tombstone_single_scan(spark):
    """The audit must read events for the fact side once plus once for
    the bounded tombstone build — never a third scan for a separate
    deleted-side pass."""
    df = _registry()["delete_tombstone_audit"].fn(spark, SF)
    assert formatted_plan(df).count("events.parquet") <= 2


def test_stream_decayed_equals_batch_recompute(spark):
    """The incrementally-merged stream state must equal a direct batch
    recompute of the decayed sum EXACTLY (the dyadic/linearity claim),
    for every event type."""
    out = {r["event_type"]: r for r in
           _registry()["stream_decayed_counters"].fn(spark, SF).collect()}
    ev = load_table(spark, SF, "events").select(
        "event_type", F.to_date("ts").alias("day")
    ).collect()
    daily = {}
    for r in ev:
        daily[(r["event_type"], r["day"])] = daily.get((r["event_type"], r["day"]), 0) + 1
    types = {et for et, _ in daily}
    assert set(out) == types
    for et in types:
        days = {d: n for (t, d), n in daily.items() if t == et}
        as_of = max(days)
        decayed = sum(n * 0.5 ** (as_of - d).days for d, n in sorted(days.items()))
        r = out[et]
        assert r["as_of_day"] == as_of
        assert r["n_total"] == sum(days.values())
        assert r["decayed_count"] == decayed  # EXACT equality


def test_sketch_merge_guard_and_exact(spark):
    """wau_exact must equal the direct set-union replay (same as
    rolling_active_users) and every merged-sketch estimate must be
    inside the 5% contract."""
    rows = {r["day"]: r for r in
            _registry()["sketch_merge_rolling_distinct"].fn(spark, SF).collect()}
    ev = load_table(spark, SF, "events").select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct().collect()
    by_day = {}
    for r in ev:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    for day, r in rows.items():
        union = set()
        for j in range(7):
            union |= by_day.get(day - datetime.timedelta(days=j), set())
        assert r["wau_exact"] == len(union)
        assert r["est_within_5pct"] is True


def test_reachability_hops_are_shortest(spark):
    """Replay BFS in Python over the same strong-edge subgraph — hop
    labels must be exact shortest-path distances, capped at 3."""
    out = {r["n_nationkey"]: r["hop"] for r in
           _registry()["reachability_3hop_nations"].fn(spark, SF).collect()}
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
    n_e = len(edges)
    tot = sum(e["w"] for e in edges)
    strong = [(e["src"], e["dst"]) for e in edges
              if e["src"] != e["dst"] and 2 * e["w"] * n_e >= 3 * tot]
    dist = {0: 0}
    frontier = {0}
    for hop in (1, 2, 3):
        nxt = {d for sr, d in strong if sr in frontier and d not in dist}
        for v in nxt:
            dist[v] = hop
        frontier = nxt
    assert out == dist


def test_multiformat_union_triples_base(spark):
    """The union aggregate must be exactly 3x the parquet base per
    status — csv/json round-trip loses nothing and widens nothing."""
    rows = {r["o_orderstatus"]: r for r in
            _registry()["source_multiformat_union"].fn(spark, SF).collect()}
    base = {r["o_orderstatus"]: r for r in
            load_table(spark, SF, "orders")
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"), F.sum("o_orderkey").alias("ck"))
            .collect()}
    assert set(rows) == set(base)
    for st, r in rows.items():
        assert r["n_rows"] == 3 * base[st]["n"]
        assert r["key_checksum"] == 3 * base[st]["ck"]
