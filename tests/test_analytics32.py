"""Round-9 fifth wave (analytics32) — laws beyond the DuckDB oracle:
a hashlib recomputation of the Poisson bootstrap (pinning the
deterministic draw end-to-end) and a literal per-customer replay of the
point-in-time join's leakage-free semantics."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _poisson_w_py(key: str, r: int) -> int:
    """Replicate r's draw: one md5 per replicate PAIR (key:r//2), with
    hex chars 1-15 feeding the even replicate and 17-31 the odd one —
    the round-10 halved-hash scheme the operator uses."""
    from sparkml_som_spark.operators.analytics32 import _BOOT_THRESH

    digest = hashlib.md5(f"{key}:{r // 2}".encode()).hexdigest()
    start = 16 * (r % 2)
    h = int(digest[start : start + 15], 16)
    for k, t in enumerate(_BOOT_THRESH):
        if h < t:
            return k
    return len(_BOOT_THRESH)


def test_poisson_bootstrap_matches_hashlib_recomputation(spark, sf_dir):
    """The whole chain — md5 draw, inverse CDF, replicate means, SE —
    recomputed in pure Python must agree with the Spark result."""
    from sparkml_som_spark.operators.analytics32 import (
        _BOOT_R,
        poisson_bootstrap_ci,
    )
    from sparkml_som_spark.sources import load_table

    row = poisson_bootstrap_ci(spark, sf_dir).collect()
    assert len(row) == 1
    row = row[0]

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    xs = [(r["o_orderkey"], float(r["o_totalprice"])) for r in orders]
    pm = sum(x for _, x in xs) / len(xs)
    means = []
    for r in range(_BOOT_R):
        sw = swx = 0.0
        for k, x in xs:
            w = _poisson_w_py(str(k), r)
            sw += w
            swx += w * x
        means.append(swx / sw)
        # replicate mass concentrates around n (Poisson(1) sum)
        assert abs(sw - len(xs)) < 6 * math.sqrt(len(xs))
    bm = sum(means) / _BOOT_R
    se = math.sqrt(sum((m - bm) ** 2 for m in means) / (_BOOT_R - 1))

    assert row["n_orders"] == len(xs)
    assert row["point_mean"] == pytest.approx(pm, abs=0.02)
    assert row["boot_mean"] == pytest.approx(bm, abs=0.02)
    assert row["boot_se"] == pytest.approx(se, abs=1e-3)
    assert row["ci_lo"] < row["point_mean"] < row["ci_hi"]
    # the bootstrap mean of a smooth statistic sits within a few SE of
    # the point estimate
    assert abs(row["boot_mean"] - row["point_mean"]) < 3 * row["boot_se"]


def test_pit_join_matches_per_customer_replay(spark, sf_dir):
    """Literal replay: sort each customer's orders, accumulate spend,
    assign each order the STRICTLY-prior state, band, aggregate —
    must equal the operator's grid exactly (to output rounding)."""
    from sparkml_som_spark.operators.analytics32 import pit_feature_join
    from sparkml_som_spark.sources import load_table

    got = {
        (r["segment"], r["prior_band"]): (
            r["n_orders"],
            r["avg_prior_spend"],
            r["avg_price"],
        )
        for r in pit_feature_join(spark, sf_dir).collect()
    }

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
        .collect()
    )
    seg = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .collect()
    }
    by_cust: dict = {}
    for r in orders:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    cells: dict = {}
    for ck, rows in by_cust.items():
        rows.sort(key=lambda r: (r["o_orderdate"], r["o_orderkey"]))
        spend = 0.0
        for i, r in enumerate(rows):
            band = "3+" if i >= 3 else str(i)
            key = (seg[ck], band)
            n, s_prior, s_price = cells.get(key, (0, 0.0, 0.0))
            cells[key] = (n + 1, s_prior + spend, s_price + float(r["o_totalprice"]))
            spend += float(r["o_totalprice"])
    want = {
        k: (n, round(sp / n, 2), round(px / n, 2))
        for k, (n, sp, px) in cells.items()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=0.02)
        assert got[k][2] == pytest.approx(want[k][2], abs=0.02)


def test_pit_first_order_has_zero_prior(spark, sf_dir):
    """Leakage guard: band '0' rows (a customer's first order) must
    report exactly zero prior spend."""
    from sparkml_som_spark.operators.analytics32 import pit_feature_join

    rows = pit_feature_join(spark, sf_dir).collect()
    zero = [r for r in rows if r["prior_band"] == "0"]
    assert zero
    for r in zero:
        assert r["avg_prior_spend"] == 0.0
