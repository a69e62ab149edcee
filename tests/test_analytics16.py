"""analytics16 mechanics: seasonality grid conservation and SLA
percentile replay with NumPy interpolation."""

import numpy as np
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import load_all
from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


def test_seasonality_conservation(spark):
    """Grid cells partition the corpus; shares sum to 1; dow/hod in
    range."""
    reg = _registry()
    rows = reg["seasonality_profile_events"].fn(spark, SF).collect()
    total = load_table(spark, SF, "events").count()
    assert sum(r["n_events"] for r in rows) == total
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert 0 <= r["dow"] <= 6
        assert 0 <= r["hod"] <= 23


def test_sla_percentiles_numpy_replay(spark):
    """Percentiles must match NumPy's linear interpolation on the same
    integer day latencies."""
    reg = _registry()
    got = {r["priority"]: r for r in reg["sla_ship_latency_percentiles"].fn(spark, SF).collect()}
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    lat = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_orderpriority").alias("p"),
            F.datediff("l_shipdate", "o_orderdate").alias("d"),
        )
        .collect()
    )
    by_p = {}
    for r in lat:
        by_p.setdefault(r["p"], []).append(r["d"])
    assert set(got) == set(by_p)
    for p, days in by_p.items():
        arr = np.asarray(sorted(days), dtype=np.float64)
        g = got[p]
        assert g["n_lineitems"] == len(days)
        for q, col in ((0.5, "p50_days"), (0.9, "p90_days"), (0.99, "p99_days")):
            want = round(float(np.quantile(arr, q, method="linear")), 4)
            assert abs(g[col] - want) < 1e-6, (p, col, g[col], want)
        assert g["max_days"] == max(days)
