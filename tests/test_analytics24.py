"""analytics24 mechanics: AUC equals the naive pairwise definition,
NDCG matches a direct Python replay of the retrieved ranking, quotas
apportion the budget exactly, and the CUSUM fold telescopes."""

import numpy as np

from sparkml_som_spark.operators.registry import load_all

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


def test_auc_equals_naive_pairwise(spark):
    """The score-group Mann-Whitney fold must equal the O(pos*neg)
    pairwise definition: mean over all (pos, neg) pairs of
    1[s_p > s_n] + 0.5 * 1[s_p == s_n]."""
    reg = _registry()
    row = reg["auc_urgent_order_price"].fn(spark, SF).collect()[0]
    scored = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .selectExpr(
            "cast(floor(o_totalprice / 1000.0) as long) as score",
            "case when o_orderpriority = '1-URGENT' then 1 else 0 end as label",
        )
        .toPandas()
    )
    pos = scored.loc[scored.label == 1, "score"].to_numpy()
    neg = scored.loc[scored.label == 0, "score"].to_numpy()
    assert row.n_pos == len(pos) and row.n_neg == len(neg)
    cmp = pos[:, None] - neg[None, :]
    naive = ((cmp > 0).sum() + 0.5 * (cmp == 0).sum()) / (len(pos) * len(neg))
    assert abs(row.auc - round(naive, 6)) < 1e-9


def test_ndcg_matches_python_replay(spark):
    """NDCG per query must equal a direct numpy replay of the cosine
    top-10 with label-match relevance, and lie in [0, 1]."""
    reg = _registry()
    got = {r.query_id: r for r in reg["ndcg_label_retrieval"].fn(spark, SF).collect()}
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    vecs = np.array([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    norms = np.linalg.norm(vecs, axis=1)
    labels = emb.label.to_numpy()
    ids = emb.vec_id.to_numpy()
    w = np.array([1.0 / np.log2(i + 1) for i in range(1, 11)])
    for q in range(5):
        qi = int(np.where(ids == q)[0][0])
        cos = vecs @ vecs[qi] / (norms * norms[qi])
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != q),
            key=lambda i: (-cos[i], ids[i]),
        )[:10]
        rel = np.array([1 if labels[i] == labels[qi] else 0 for i in order])
        dcg = float((rel * w).sum())
        idcg = float((np.sort(rel)[::-1] * w).sum())
        expect = 0.0 if idcg == 0 else dcg / idcg
        assert got[q].n_relevant == int(rel.sum())
        assert abs(got[q].ndcg - round(expect, 6)) < 1e-6
        assert 0.0 <= got[q].ndcg <= 1.0


def test_quota_sums_to_budget_exactly(spark):
    """Hamilton apportionment: quotas sum to the budget EXACTLY, each
    quota is base or base+1, and no quota strays more than one slot
    from its exact proportional share."""
    reg = _registry()
    rows = reg["quota_largest_remainder"].fn(spark, SF).collect()
    total_w = sum(r.weight for r in rows)
    assert sum(r.quota for r in rows) == 997
    for r in rows:
        assert r.quota in (r.base_quota, r.base_quota + 1)
        exact = 997 * r.weight / total_w
        assert abs(r.quota - exact) < 1.0


def test_cusum_telescopes_and_flags_peak(spark):
    """The CUSUM fold telescopes (last value == sum of deviations from
    the rounded mean, so |last| is bounded by the mean-rounding slack),
    and the peak flag marks exactly the max-|CUSUM| rows."""
    reg = _registry()
    rows = reg["cusum_drift_revenue"].fn(spark, SF).collect()
    rows.sort(key=lambda r: r.day)
    mean = round(sum(r.rev for r in rows) / len(rows), 4)
    acc, peak = 0.0, 0.0
    for r in rows:
        acc += r.rev - mean
        assert abs(r.cusum - round(acc, 4)) < 1e-6
        peak = max(peak, abs(r.cusum))
    flagged = [r for r in rows if r.is_peak_shift == 1]
    assert flagged and all(abs(r.cusum) == peak for r in flagged)
    # telescoping: the final CUSUM is n * (true_mean - rounded_mean),
    # bounded by the half-ulp rounding slack per day
    assert abs(rows[-1].cusum) <= len(rows) * 0.00005 + 1e-6
