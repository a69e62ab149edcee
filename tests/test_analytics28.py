"""BM25 ranked retrieval (analytics28) — formula and ranking
properties beyond the DuckDB oracle (which pins exact values at 3
SFs): saturation monotonicity and the top-k contract."""

import pytest


@pytest.fixture(scope="module")
def bm25_rows(spark, sf_dir):
    from sparkml_som_spark.operators.analytics28 import bm25_rank_docs

    return bm25_rank_docs(spark, sf_dir).collect()


def test_bm25_topk_size_and_order(bm25_rows):
    from sparkml_som_spark.operators.analytics28 import _BM25_TOPK

    assert len(bm25_rows) == _BM25_TOPK
    scores = [r["bm25"] for r in bm25_rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_term_count_bounded_by_query(bm25_rows):
    from sparkml_som_spark.operators.analytics28 import _BM25_QUERY

    assert all(1 <= r["n_terms"] <= len(_BM25_QUERY) for r in bm25_rows)


def test_bm25_contribution_saturates():
    """The tf saturation property that distinguishes BM25 from raw tf:
    per-term contribution is increasing in f but bounded by
    idf * (k1 + 1) — verified on the closed form the entry uses."""
    import math

    from sparkml_som_spark.operators.analytics28 import _BM25_B, _BM25_K1

    n, df, dlen, avgdl = 1000, 50, 60, 55.0
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
    denom_norm = _BM25_K1 * (1 - _BM25_B + _BM25_B * dlen / avgdl)

    def contrib(f: int) -> float:
        return idf * f * (_BM25_K1 + 1) / (f + denom_norm)

    vals = [contrib(f) for f in (1, 2, 5, 20, 1000)]
    assert vals == sorted(vals)  # monotone in f
    assert vals[-1] < idf * (_BM25_K1 + 1)  # saturates below the bound
