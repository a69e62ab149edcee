"""analytics15 mechanics: k-anonymity accounting replay, norm-audit
reconciliation with NumPy, skew-factor laws, and freshness ordering."""

import numpy as np
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import load_all
from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


def test_kanon_accounting(spark):
    """Group counts and at-risk rows must match a Python replay."""
    from sparkml_som_spark.operators.analytics15 import _KANON_K

    reg = _registry()
    r = reg["kanon_quasi_identifier_audit"].fn(spark, SF).collect()[0]
    groups = {}
    for c in load_table(spark, SF, "customer").select("c_nationkey", "c_mktsegment").collect():
        k = (c["c_nationkey"], c["c_mktsegment"])
        groups[k] = groups.get(k, 0) + 1
    small = [v for v in groups.values() if v < _KANON_K]
    assert r["n_groups"] == len(groups)
    assert r["n_small_groups"] == len(small)
    assert r["n_rows_at_risk"] == sum(small)
    assert r["min_group_size"] == min(groups.values())
    assert r["k_anonymous"] == (min(groups.values()) >= _KANON_K)


def test_embedding_norm_audit_numpy(spark):
    """Per-label norm stats must match NumPy within rounding."""
    reg = _registry()
    got = {r["label"]: r for r in reg["embedding_norm_audit"].fn(spark, SF).collect()}
    by_label = {}
    for r in load_table(spark, SF, "embeddings").select("label", "embedding").collect():
        by_label.setdefault(r["label"], []).append(
            float(np.linalg.norm(np.asarray(r["embedding"], dtype=np.float64)))
        )
    assert set(got) == set(by_label)
    for lbl, norms in by_label.items():
        g = got[lbl]
        assert g["n_vectors"] == len(norms)
        assert abs(g["min_norm"] - round(min(norms), 4)) < 1e-6
        assert abs(g["max_norm"] - round(max(norms), 4)) < 1e-6
        assert abs(g["avg_norm"] - round(sum(norms) / len(norms), 4)) < 1e-3
        assert g["n_nan_components"] == 0


def test_skew_audit_laws(spark):
    """Hot ranks are 1..N in non-increasing count order; skew factors
    positive; counts match a direct groupBy."""
    reg = _registry()
    rows = sorted(
        reg["join_key_skew_audit"].fn(spark, SF).collect(), key=lambda r: r["hot_rank"]
    )
    assert [r["hot_rank"] for r in rows] == list(range(1, len(rows) + 1))
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    top = (
        load_table(spark, SF, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("l_partkey"))
        .limit(len(rows))
        .collect()
    )
    assert [(r["l_partkey"], r["c"]) for r in top] == [(r["key"], r["cnt"]) for r in rows]
    for r in rows:
        assert r["skew_factor"] > 0


def test_freshness_consistent_with_max_ts(spark):
    """Staleness must decrease as last_event_ts increases; SLA flag
    consistent with the 2-day bound."""
    reg = _registry()
    rows = reg["data_freshness_audit"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["staleness_days"] >= 0
        assert r["fresh_within_2d"] == (r["staleness_days"] <= 2.0)
