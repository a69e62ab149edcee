"""analytics10 mechanics: Bloom one-sidedness under a direct Python
replay, trigram conservation, reconciliation completeness against the
known mutation rule, and matryoshka recall bounds."""

import hashlib

from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import load_all
from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


def _md5_mod(salt: int, key, mod: int) -> int:
    h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:15]
    return int(h, 16) % mod


def test_bloom_zero_false_negatives_and_python_replay(spark):
    """The Bloom pass set replayed in Python must equal Spark's, and
    every true member must pass (one-sided guarantee)."""
    from sparkml_som_spark.operators.analytics10 import _BLOOM_BITS, _BLOOM_K

    reg = _registry()
    r = reg["bloom_semijoin_customers"].fn(spark, SF).collect()[0]
    assert r["zero_false_negatives"] is True
    assert r["n_false_positives"] >= 0
    assert r["n_bloom_pass"] == r["n_true_members"] + r["n_false_positives"]

    cust = [x["c_custkey"] for x in load_table(spark, SF, "customer").collect()]
    orders = load_table(spark, SF, "orders")
    build = {
        x["o_custkey"]
        for x in orders.where(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1996-01-01")
        ).collect()
    }
    bits = {(i, _md5_mod(i, k, _BLOOM_BITS)) for k in build for i in range(_BLOOM_K)}
    passed = {
        k
        for k in cust
        if all((i, _md5_mod(i, k, _BLOOM_BITS)) in bits for i in range(_BLOOM_K))
    }
    truth = set(cust) & build
    assert truth <= passed
    assert len(passed) == r["n_bloom_pass"]
    assert len(truth) == r["n_true_members"]


def test_trigram_conservation(spark):
    """Sum of trigram counts == sum over users of max(0, n_events-2)."""
    reg = _registry()
    rows = reg["path_trigrams_events"].fn(spark, SF).collect()
    total = sum(r["n_paths"] for r in rows)
    per_user = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert total == sum(max(0, r["n"] - 2) for r in per_user)


def test_reconcile_matches_mutation_rule(spark):
    """Every reported key must obey the known derivation: deleted keys
    are exactly the %101==0 keys, changed keys exactly the %97==0
    (and not deleted) keys — nothing more, nothing less."""
    reg = _registry()
    rows = reg["table_diff_reconcile"].fn(spark, SF).collect()
    got = {(r["o_orderkey"], r["status"]) for r in rows}
    keys = [
        r["o_orderkey"] for r in load_table(spark, SF, "orders").select("o_orderkey").collect()
    ]
    expect = set()
    for k in keys:
        if k % 101 == 0:
            expect.add((k, "deleted"))
        elif k % 97 == 0:
            expect.add((k, "changed"))
    assert got == expect


def test_matryoshka_recall_bounds(spark):
    """recall in [0,1]; n_common <= k; full-rank self-consistency:
    recall == n_common / k."""
    reg = _registry()
    rows = reg["ann_matryoshka_prefix"].fn(spark, SF).collect()
    from sparkml_som_spark.operators.analytics10 import _MAT_QUERIES

    assert len(rows) == _MAT_QUERIES
    for r in rows:
        assert 0 <= r["n_common"] <= r["k"]
        assert abs(r["recall_at_k"] - round(r["n_common"] / r["k"], 4)) < 1e-9
