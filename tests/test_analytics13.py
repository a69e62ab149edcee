"""analytics13 mechanics: share-of-parent conservation, vocab
coverage laws, chunk-plan closed form vs a Python replay, and RAG
pack budget/order laws."""

import math

from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import load_all
from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


def test_share_of_parent_conservation(spark):
    """Within each region the nation shares must sum to ~1, and every
    share lies in (0, 1]."""
    reg = _registry()
    rows = reg["share_of_parent_revenue"].fn(spark, SF).collect()
    assert rows
    by_region = {}
    for r in rows:
        assert 0.0 < r["share_of_region"] <= 1.0
        assert 0.0 < r["share_of_total"] <= 1.0
        by_region.setdefault(r["region"], []).append(r["share_of_region"])
    for region, shares in by_region.items():
        assert abs(sum(shares) - 1.0) < 1e-4, (region, sum(shares))
    assert abs(sum(r["share_of_total"] for r in rows) - 1.0) < 1e-4


def test_vocab_coverage_laws(spark):
    """OOV <= total; coverage == 1 - oov/total; corpus-wide token
    total matches a direct count."""
    reg = _registry()
    rows = reg["tokenizer_vocab_coverage"].fn(spark, SF).collect()
    total = (
        load_table(spark, SF, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .count()
    )
    assert sum(r["n_tokens"] for r in rows) == total
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert r["coverage"] == round(1.0 - r["n_oov"] / r["n_tokens"], 6)


def test_chunk_plan_python_replay(spark):
    """The closed-form chunk count must equal the naive while-loop
    chunker for every doc, and the coverage invariant must hold."""
    from sparkml_som_spark.operators.analytics13 import _CHUNK_LEN, _CHUNK_STRIDE

    reg = _registry()
    rows = reg["chunk_overlap_plan"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        n = r["n_tokens"]
        starts = [0]
        while starts[-1] + _CHUNK_LEN < n:
            starts.append(starts[-1] + _CHUNK_STRIDE)
        assert r["n_chunks"] == len(starts), (n, r["n_chunks"], len(starts))
        assert r["last_start"] == starts[-1]
        assert r["covers_all"] is True


def test_rag_pack_budget_and_order(spark):
    """Packed docs per query: ranks form a prefix 1..m (greedy in rank
    order), cum_tokens is the running sum, and the budget holds."""
    from sparkml_som_spark.operators.analytics13 import _RAG_BUDGET

    reg = _registry()
    rows = reg["rag_context_pack"].fn(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert by_q
    for qid, items in by_q.items():
        items.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in items] == list(range(1, len(items) + 1))
        cum = 0
        for r in items:
            cum += r["n_tokens"]
            assert r["cum_tokens"] == cum
        assert cum <= _RAG_BUDGET
