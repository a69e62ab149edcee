"""analytics6 mechanics: rolling-distinct reconciliation, bitmap
popcount vs countDistinct, chi-square marginals, weighted-sample
distribution sanity, and greedy packing vs a direct Python fold."""

import pytest
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import load_all
from sparkml_som_spark.plans import formatted_plan
from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


def test_rolling_active_users_reconciles(spark):
    """dau on each day equals the exact per-day distinct count; wau_7d
    equals the union of the trailing 7 daily sets (checked directly
    from the raw pairs); wau >= dau always."""
    rows = {r["day"]: r for r in
            _registry()["rolling_active_users"].fn(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    pairs = ev.select("user_id", F.to_date("ts").alias("day")).distinct().collect()
    by_day = {}
    for p in pairs:
        by_day.setdefault(p["day"], set()).add(p["user_id"])
    assert set(rows) == set(by_day)
    import datetime

    for day, r in rows.items():
        assert r["dau"] == len(by_day[day])
        window_union = set()
        for j in range(7):
            window_union |= by_day.get(day - datetime.timedelta(days=j), set())
        assert r["wau_7d"] == len(window_union)
        assert r["wau_7d"] >= r["dau"]


def test_bitmap_distinct_matches_count_distinct(spark):
    """The popcount-of-bit_or result must equal the exact
    countDistinct per group — bitmaps are an execution strategy, not
    an approximation."""
    out = {r["event_type"]: r for r in
           _registry()["bitmap_distinct_users"].fn(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    exact = {
        r["event_type"]: (r["nd"], r["ne"])
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"), F.count("*").alias("ne"))
        .collect()
    }
    assert set(out) == set(exact)
    for et, r in out.items():
        assert (r["n_distinct_users"], r["n_events"]) == exact[et]


def test_chisq_marginals_and_total(spark):
    """Observed cells must sum to the join cardinality; expected cells
    must reproduce the marginals exactly; each chi2 term must match
    its definition."""
    rows = _registry()["chisq_status_segment"].fn(spark, SF).collect()
    grand = sum(r["n"] for r in rows)
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    assert grand == o.join(c, o.o_custkey == c.c_custkey).count()
    # expected sums along each margin equal observed margin totals
    by_status = {}
    by_status_exp = {}
    for r in rows:
        by_status[r["status"]] = by_status.get(r["status"], 0) + r["n"]
        by_status_exp[r["status"]] = by_status_exp.get(r["status"], 0.0) + r["expected"]
    for s in by_status:
        assert by_status_exp[s] == pytest.approx(by_status[s], rel=1e-9)
    for r in rows:
        assert r["chi2_term"] == pytest.approx(
            (r["n"] - r["expected"]) ** 2 / r["expected"], rel=1e-12
        )


def test_weighted_sample_is_top_k_of_es_keys(spark):
    """The selected set must be exactly the k docs with the largest
    u^(1/w) keys over the whole table (replayed in Python), and the
    emitted u must be the md5-derived dyadic."""
    import hashlib

    from sparkml_som_spark.operators.analytics6 import _WS_K

    sel = _registry()["weighted_sample_docs"].fn(spark, SF).collect()
    assert len(sel) == _WS_K
    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars").collect()

    def u_of(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) / 2**32

    keys = sorted(
        ((u_of(r["doc_id"]) ** (1.0 / r["n_chars"]), r["doc_id"]) for r in docs),
        reverse=True,
    )
    expect_ids = {d for _, d in keys[:_WS_K]}
    assert {r["doc_id"] for r in sel} == expect_ids
    for r in sel:
        assert r["u"] == u_of(r["doc_id"])


def test_weighted_sample_plan_is_take_ordered(spark):
    """Top-k must compile to TakeOrderedAndProject — never a global
    sort materialization."""
    df = _registry()["weighted_sample_docs"].fn(spark, SF)
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_pack_greedy_matches_python_fold(spark):
    """Replay the greedy fold directly in Python from the tokenized
    sizes — bins, totals, and the assignment checksum must be exact,
    and no bin may overflow unless it holds a single oversized doc."""
    from sparkml_som_spark.functions import word_tokens
    from sparkml_som_spark.operators.corpus_ops2 import _PACK_BUDGET

    out = {r["source"]: r for r in
           _registry()["pack_greedy_capacity"].fn(spark, SF).collect()}
    sized = (
        load_table(spark, SF, "documents")
        .select("source", "doc_id", F.size(word_tokens(F.col("text"))).alias("n"))
        .collect()
    )
    groups = {}
    for r in sized:
        groups.setdefault(r["source"], []).append((r["doc_id"], r["n"]))
    assert set(out) == set(groups)
    for source, docs in groups.items():
        fill, bin_id, total, checksum = 0, 0, 0, 0
        fills, counts = {}, {}
        for doc_id, n in sorted(docs):
            if bin_id == 0 or fill + n > _PACK_BUDGET:
                bin_id += 1
                fill = n
            else:
                fill += n
            fills[bin_id] = fill
            counts[bin_id] = counts.get(bin_id, 0) + 1
            total += n
            checksum += doc_id * bin_id
        r = out[source]
        assert (r["n_bins"], r["total_tokens"], r["bin_checksum"]) == (
            bin_id,
            total,
            checksum,
        )
        for b, f in fills.items():
            # a bin may exceed the budget only as a singleton oversized doc
            assert f <= _PACK_BUDGET or counts[b] == 1
