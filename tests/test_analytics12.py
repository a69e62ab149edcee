"""analytics12 mechanics: TV-distance laws, seasonal-baseline
alignment, interval-union replay in Python, and streak replay."""

import datetime

from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import load_all
from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


def test_tv_distance_laws(spark):
    """TV in [0,1]; totals partition the per-type event count."""
    reg = _registry()
    rows = reg["drift_tv_distance"].fn(spark, SF).collect()
    totals = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r["event_type"] for r in rows} == set(totals)
    for r in rows:
        assert 0.0 <= r["tv_distance"] <= 1.0
        assert r["n_before"] + r["n_after"] == totals[r["event_type"]]


def test_forecast_seasonal_python_replay(spark):
    """MAE must match a Python replay over the daily count table."""
    reg = _registry()
    got = {r["event_type"]: r for r in reg["forecast_seasonal_baseline"].fn(spark, SF).collect()}
    daily = {}
    for r in (
        load_table(spark, SF, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ):
        daily[(r["event_type"], r["day"])] = r["n"]
    by_type = {}
    for (et, day), n in daily.items():
        prev = daily.get((et, day - datetime.timedelta(days=7)))
        if prev is not None:
            by_type.setdefault(et, []).append(abs(n - prev))
    for et, errs in by_type.items():
        assert got[et]["n_days"] == len(errs)
        assert got[et]["mae"] == round(sum(errs) / len(errs), 6)


def test_interval_union_python_replay(spark):
    """Covered minutes must equal a Python sweep-line union of the
    same 30-minute intervals."""
    from sparkml_som_spark.operators.analytics12 import _IVL_MINUTES

    reg = _registry()
    got = {r["user_id"]: r for r in reg["interval_coverage_users"].fn(spark, SF).collect()}
    per_user = {}
    for r in load_table(spark, SF, "events").select("user_id", "ts").collect():
        s = int(r["ts"].timestamp() * 1_000_000)
        per_user.setdefault(r["user_id"], []).append((s, s + _IVL_MINUTES * 60 * 1_000_000))
    assert set(got) == set(per_user)
    for uid, ivs in per_user.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        covered = sum(e - s for s, e in merged) / 60_000_000.0
        assert got[uid]["n_intervals"] == len(merged)
        assert abs(got[uid]["covered_minutes"] - round(covered, 4)) < 1e-6


def test_streak_python_replay(spark):
    """Longest streak must equal a direct Python scan of each user's
    sorted distinct active days."""
    reg = _registry()
    got = {r["user_id"]: r for r in reg["streak_longest_active"].fn(spark, SF).collect()}
    days = {}
    for r in load_table(spark, SF, "events").select("user_id", F.to_date("ts").alias("d")).distinct().collect():
        days.setdefault(r["user_id"], set()).add(r["d"])
    for uid, ds in days.items():
        sd = sorted(ds)
        longest = cur = 1
        streaks = 1
        for a, b in zip(sd, sd[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                streaks += 1
                cur = 1
            longest = max(longest, cur)
        g = got[uid]
        assert g["longest_streak"] == longest
        assert g["n_streaks"] == streaks
        assert g["active_days"] == len(ds)
