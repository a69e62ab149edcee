"""analytics22 mechanics: Kaplan-Meier replay with lifelines-free
Python, and interval-coverage laws."""

import datetime

from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import load_all
from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


def test_km_python_replay(spark):
    """Survival values must equal a direct Python product-limit
    computation from the (duration, event) observations, bit-for-bit."""
    from sparkml_som_spark.operators.analytics22 import _KM_HORIZON

    reg = _registry()
    got = {r["day"]: r for r in reg["survival_km_purchase"].fn(spark, SF).collect()}
    horizon = datetime.datetime.fromisoformat(_KM_HORIZON)
    ev = load_table(spark, SF, "events").where(F.col("ts") < _KM_HORIZON).collect()
    su, pu = {}, {}
    for r in sorted(ev, key=lambda r: r["ts"]):
        if r["event_type"] == "signup":
            su.setdefault(r["user_id"], r["ts"])
    for r in sorted(ev, key=lambda r: r["ts"]):
        if (
            r["event_type"] == "purchase"
            and r["user_id"] in su
            and r["ts"] >= su[r["user_id"]]
        ):
            pu.setdefault(r["user_id"], r["ts"])
    obs = []
    for u, s in su.items():
        if u in pu:
            obs.append(((pu[u].date() - s.date()).days, True))
        else:
            obs.append(((horizon.date() - s.date()).days, False))
    event_ts = sorted({d for d, e in obs if e})
    surv = 1.0
    for t in event_ts:
        n_risk = sum(1 for d, _ in obs if d >= t)
        n_ev = sum(1 for d, e in obs if e and d == t)
        surv = surv * (1.0 - n_ev / n_risk)
        g = got[t]
        assert g["n_risk"] == n_risk, t
        assert g["n_events"] == n_ev, t
        assert g["survival"] == surv, t
    # survival is non-increasing and within (0, 1]
    vals = [got[t]["survival"] for t in sorted(got)]
    assert all(b <= a for a, b in zip(vals, vals[1:]))
    # survival may legitimately reach exactly 0 when the final risk
    # set converts entirely (everyone purchases at fixture scale)
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_interval_coverage_laws(spark):
    """Coverage in [0,1]; band non-degenerate (lo <= hi); n_days
    matches the forecast-eval entry's day counts."""
    reg = _registry()
    rows = {r["event_type"]: r for r in reg["forecast_interval_coverage"].fn(spark, SF).collect()}
    base = {r["event_type"]: r for r in reg["forecast_seasonal_baseline"].fn(spark, SF).collect()}
    assert set(rows) == set(base)
    for et, r in rows.items():
        assert 0.0 <= r["empirical_coverage"] <= 1.0
        assert r["resid_p10"] <= r["resid_p90"]
        assert r["n_days"] == base[et]["n_days"]
