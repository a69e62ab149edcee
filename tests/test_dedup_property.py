"""Property test: the inverted-index shingle Jaccard pipeline agrees
with a pure-Python brute-force computation on randomized corpora."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkml_som_spark.operators.dedup import shingle_pairs_with_jaccard

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


def _py_shingles(text, n=3):
    toks = text.lower().split(" ")
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@st.composite
def corpus(draw):
    n_docs = draw(st.integers(min_value=2, max_value=8))
    docs = []
    for i in range(n_docs):
        n_words = draw(st.integers(min_value=1, max_value=12))
        words = [draw(st.sampled_from(WORDS)) for _ in range(n_words)]
        docs.append((i, " ".join(words)))
    return docs


@given(corpus())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_shingle_jaccard_matches_bruteforce(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["a_id"], r["b_id"]): r["jaccard_raw"]
        for r in shingle_pairs_with_jaccard(df, n=3).collect()
    }

    shingles = {i: _py_shingles(t) for i, t in docs}
    want = {}
    ids = sorted(shingles)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            common = shingles[a] & shingles[b]
            if common:
                want[(a, b)] = len(common) / len(shingles[a] | shingles[b])

    assert set(got) == set(want)
    for pair, j in want.items():
        assert got[pair] == pytest.approx(j, rel=1e-9)
