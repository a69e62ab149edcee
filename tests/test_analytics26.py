"""analytics26 mechanics: PSI nonnegativity + pandas replay, and the
delta-method ratio SE replayed from raw moments."""

import hashlib
import math

import numpy as np

from sparkml_som_spark.operators.registry import load_all

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


def test_psi_nonnegative_and_replays(spark):
    """Each PSI term (p2-p1)*ln(p2/p1) is nonnegative, so PSI >= 0;
    the full value must match a pandas replay of the smoothed cells."""
    reg = _registry()
    row = reg["psi_value_drift"].fn(spark, SF).collect()[0]
    ev = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "case when dayofmonth(ts) <= 15 then 'p1' else 'p2' end as period",
        "cast(floor(value / 25.0) as long) as band",
    ).toPandas()
    cells = ev.groupby("band").period.value_counts().unstack(fill_value=0)
    n1 = cells.get("p1", 0)
    n2 = cells.get("p2", 0)
    b = len(cells)
    p1 = (n1 + 0.5) / (n1.sum() + 0.5 * b)
    p2 = (n2 + 0.5) / (n2.sum() + 0.5 * b)
    psi = float(((p2 - p1) * np.log(p2 / p1)).sum())
    assert row.n_bands == b
    assert row.psi >= 0.0
    assert abs(row.psi - round(psi, 4)) < 1e-3
    assert abs(row.max_band_shift - round(float((p2 - p1).abs().max()), 6)) < 1e-6


def test_ratio_delta_se_replays(spark):
    """Arms partition all customers; ratio and delta-method SE must
    match a numpy replay from the per-customer units."""
    reg = _registry()
    rows = {r.arm: r for r in reg["ratio_metric_delta_ab"].fn(spark, SF).collect()}
    assert set(rows) == {"A", "B"}
    units = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_custkey")
        .agg({"o_totalprice": "sum", "*": "count"})
        .toPandas()
    )
    units.columns = ["o_custkey", "n", "x"]
    units["x"] = units["x"].round(4)
    units["arm"] = [
        "A" if hashlib.md5(str(k).encode()).hexdigest()[0] <= "7" else "B"
        for k in units.o_custkey
    ]
    assert sum(r.n_units for r in rows.values()) == len(units)
    for arm, g in units.groupby("arm"):
        x, n = g.x.to_numpy(float), g.n.to_numpy(float)
        R = x.mean() / n.mean()
        se = (
            math.sqrt(
                (
                    x.var(ddof=1)
                    + R * R * n.var(ddof=1)
                    - 2 * R * float(np.cov(x, n, ddof=1)[0, 1])
                )
                / len(g)
            )
            / n.mean()
        )
        assert rows[arm].n_units == len(g)
        assert abs(rows[arm].revenue_per_order - round(R, 6)) < 1e-6
        assert abs(rows[arm].se_delta - round(se, 4)) < 1e-3
        assert rows[arm].se_delta > 0
