"""analytics21 mechanics: timezone conversion replay with zoneinfo
and segment-cube conservation."""

from zoneinfo import ZoneInfo

from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import load_all
from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


def test_tz_rollup_zoneinfo_replay(spark):
    """Local-day assignment must match Python's zoneinfo conversion
    for every event, and totals must conserve the corpus."""
    from sparkml_som_spark.operators.analytics21 import _TZ

    reg = _registry()
    got = {
        (r["local_day"], r["event_type"]): r["n_events"]
        for r in reg["tz_local_day_rollup"].fn(spark, SF).collect()
    }
    tz = ZoneInfo(_TZ)
    utc = ZoneInfo("UTC")
    want = {}
    for r in load_table(spark, SF, "events").select("ts", "event_type").collect():
        local_day = r["ts"].replace(tzinfo=utc).astimezone(tz).date()
        k = (local_day, r["event_type"])
        want[k] = want.get(k, 0) + 1
    assert got == want


def test_segment_cube_conservation(spark):
    """Segment user counts partition the distinct in-window users, and
    segment names follow the flag logic."""
    reg = _registry()
    rows = reg["segment_algebra_users"].fn(spark, SF).collect()
    assert len(rows) >= 2, "expected a diverse cube at fixture scale"
    n_users = (
        load_table(spark, SF, "events")
        .where(F.col("ts") < "2024-01-04")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        if r["did_purchase"] and not r["did_error"]:
            assert r["segment"] == "converted_clean"
        elif r["did_purchase"]:
            assert r["segment"] == "converted_rocky"
        elif r["did_click"]:
            assert r["segment"] == "engaged_only"
        else:
            assert r["segment"] == "dormant"


def test_som_grid_search_invariants(spark):
    """The winner has the minimum quantization error; QE does not
    increase with map capacity on the fixture; one winner exists.
    Asserted on the raw scoreboard; the registered entry surfaces the
    same contract as a hashable verdict row."""
    from sparkml_som_spark.operators.som_queries import som_grid_scoreboard

    reg = _registry()
    rows = sorted(som_grid_scoreboard(spark, SF), key=lambda r: r[2])
    assert len(rows) == 3
    costs = [r[3] for r in rows]
    assert costs == sorted(costs, reverse=True), costs
    best = min(costs)
    winners = [r for r in rows if r[4]]
    # the smaller-map tiebreak is applied on the scoreboard itself:
    # EXACTLY one is_best row, and it is the smallest-cell min-QE row
    assert len(winners) == 1
    assert winners[0][3] == best
    assert winners[0][2] == min(r[2] for r in rows if r[3] == best)
    # every candidate fit consumed the full table
    n_emb = len(set(r[5] for r in rows))
    assert n_emb == 1 and rows[0][5] > 0
    verdict = reg["som_grid_search"].fn(spark, SF).collect()
    assert len(verdict) == 1
    v = verdict[0]
    assert (
        v["n_candidates"],
        v["n_best"],
        v["best_is_min_qe"],
        v["n_invalid_qe"],
    ) == (3, 1, True, 0)
    assert v["n_train_rows"] == rows[0][5]


def test_ewma_fold_python_replay(spark):
    """The smoothed level must equal a direct Python fold over the
    sorted daily counts, bit-for-bit (dyadic alpha)."""
    reg = _registry()
    got = {r["event_type"]: r for r in reg["ewma_forecast_daily"].fn(spark, SF).collect()}
    daily = {}
    for r in (
        load_table(spark, SF, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ):
        daily.setdefault(r["event_type"], []).append((r["day"], r["n"]))
    for et, pairs in daily.items():
        level = None
        for _, n in sorted(pairs):
            level = float(n) if level is None else (float(n) + level) / 2.0
        assert got[et]["forecast_next_day"] == level, et
        assert got[et]["n_days"] == len(pairs)
