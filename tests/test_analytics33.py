"""Round-9 sixth wave (analytics33) — laws beyond the DuckDB oracle:
a pure-Python fixed-point PPR replay and the purged split's partition /
embargo arithmetic."""

import pytest
from pyspark.sql import functions as F


def test_ppr_matches_python_replay(spark, sf_dir):
    """Replay the exact integer PPR (same edges, same seeds, same
    per-edge floor division) in pure Python and compare the full
    top-20 expansion."""
    from sparkml_som_spark.operators.analytics30 import _LPA_MIN_W
    from sparkml_som_spark.operators.analytics33 import (
        _PPR_DAMP_DEN,
        _PPR_DAMP_NUM,
        _PPR_ITERS,
        _PPR_SCALE,
        _PPR_SEED_BRAND,
        _PPR_TOPK,
        seed_expansion_ppr,
    )
    from sparkml_som_spark.sources import load_table

    got = [
        (r["part_key"], r["rank_ppb"])
        for r in seed_expansion_ppr(spark, sf_dir).collect()
    ]

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .collect()
    )
    by_order: dict = {}
    for r in li:
        by_order.setdefault(r["o"], []).append(r["p"])
    w: dict = {}
    for ps in by_order.values():
        ps = sorted(set(ps))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                w[(ps[i], ps[j])] = w.get((ps[i], ps[j]), 0) + 1
    edges: dict = {}
    for (u, v), c in w.items():
        if c >= _LPA_MIN_W:
            edges[(u, v)] = c
            edges[(v, u)] = c
    wout: dict = {}
    for (u, _v), c in edges.items():
        wout[u] = wout.get(u, 0) + c
    nodes = {r["p"] for r in li}
    brand = {
        r["p_partkey"]
        for r in load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == _PPR_SEED_BRAND)
        .select("p_partkey")
        .collect()
    }
    seeds = nodes & brand
    k = len(seeds)
    tele = ((_PPR_DAMP_DEN - _PPR_DAMP_NUM) * (_PPR_SCALE // k)) // _PPR_DAMP_DEN
    r = {s: _PPR_SCALE // k for s in seeds}
    for _ in range(_PPR_ITERS):
        contrib: dict = {}
        for (u, v), c in edges.items():
            if u in r:
                contrib[v] = contrib.get(v, 0) + (r[u] * c) // wout[u]
        nxt: dict = {}
        for s in seeds:
            nxt[s] = tele
        for v, csum in contrib.items():
            nxt[v] = nxt.get(v, 0) + (_PPR_DAMP_NUM * csum) // _PPR_DAMP_DEN
        r = {v: x for v, x in nxt.items() if x > 0}
    want = sorted(
        ((v, x) for v, x in r.items() if v not in seeds),
        key=lambda t: (-t[1], t[0]),
    )[:_PPR_TOPK]
    assert got == want
    # no seed leaks into the expansion, ranks strictly positive
    assert all(v not in seeds and x > 0 for v, x in got)


def test_purged_split_partition_and_embargo(spark, sf_dir):
    """The three splits partition the events exactly; cutoffs recompute
    from (min, max) with the same integer arithmetic; the train->test
    gap clears the embargo width."""
    from sparkml_som_spark.operators.analytics33 import (
        _SPLIT_EMBARGO_PCT,
        _SPLIT_TRAIN_PCT,
        purged_time_split,
    )
    from sparkml_som_spark.sources import load_table

    rows = {r["split"]: r for r in purged_time_split(spark, sf_dir).collect()}
    assert set(rows) == {"train", "embargo", "test"}

    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    assert sum(r["n_events"] for r in rows.values()) == n

    span = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    ).first()
    lo, hi = span["lo"], span["hi"]
    train_end = lo + (hi - lo) * _SPLIT_TRAIN_PCT // 100
    embargo_end = lo + (hi - lo) * (_SPLIT_TRAIN_PCT + _SPLIT_EMBARGO_PCT) // 100
    embargo_us = (hi - lo) * _SPLIT_EMBARGO_PCT // 100

    def us(ts):
        import calendar

        return calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond

    assert us(rows["train"]["max_ts"]) <= train_end
    assert us(rows["embargo"]["min_ts"]) > train_end
    assert us(rows["embargo"]["max_ts"]) <= embargo_end
    assert us(rows["test"]["min_ts"]) > embargo_end
    for r in rows.values():
        assert r["embargo_us"] == embargo_us
        assert r["leakage_free"] is True
        assert r["train_test_gap_us"] > embargo_us


def test_split_leakage_matches_hashlib_replay(spark, sf_dir):
    """Recompute the (split_a, split_b) pair grid in pure Python from
    the shared near-dup edge table and hashlib md5 band assignment."""
    import hashlib

    from sparkml_som_spark.operators.analytics14 import (
        _SPLIT_TRAIN_HI,
        _SPLIT_VAL_HI,
    )
    from sparkml_som_spark.operators.analytics33 import split_dedup_leakage
    from sparkml_som_spark.operators.dedup import jaccard_sym_edges

    rows = split_dedup_leakage(spark, sf_dir).collect()
    got = {(r["split_a"], r["split_b"]): r["n_pairs"] for r in rows}
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r["is_leak"] == (r["split_a"] != r["split_b"])

    def split(doc_id):
        p = hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
        return "train" if p <= _SPLIT_TRAIN_HI else ("val" if p <= _SPLIT_VAL_HI else "test")

    pairs = {
        (r["src"], r["dst"])
        for r in jaccard_sym_edges(spark, sf_dir).collect()
        if r["src"] < r["dst"]
    }
    want: dict = {}
    for a, b in pairs:
        key = tuple(sorted((split(a), split(b))))
        want[key] = want.get(key, 0) + 1
    assert got == want
