"""Corpus-ops-2 invariants: decontamination broadcasts the benchmark
side, hash sampling is layout-independent, packing respects its budget
arithmetic, entropy stays in-range.  Value-level parity vs DuckDB is
covered by the oracle gate; these tests pin the SCALE properties the
oracle can't see."""

import pytest

from sparkml_som_spark.operators.registry import load_all
from sparkml_som_spark.plans import assert_broadcast_join, formatted_plan

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_decontam_broadcasts_benchmark_side(spark, registry):
    """The benchmark shingle set must join as the BROADCAST side — at
    100 TB the corpus cannot be shuffled for a contamination check."""
    df = registry["decontam_ngram_overlap"].fn(spark, SF)
    assert assert_broadcast_join(df), formatted_plan(df)


def test_decontam_counts_bounded(spark, registry):
    rows = registry["decontam_ngram_overlap"].fn(spark, SF).collect()
    assert rows, "benchmark split produced no corpus sources"
    for r in rows:
        assert 0 <= r["n_contaminated"] <= r["n_docs"]
        assert 0.0 <= r["contam_rate"] <= 1.0
        assert r["source"] not in ("src0", "src1")


def test_sample_hash_is_layout_independent(spark, registry):
    """md5-prefix sampling must select the same membership regardless of
    partitioning — the property that makes it safe for incremental
    reprocessing (df.sample would fail this)."""
    from pyspark.sql import functions as F

    from sparkml_som_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    keep = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) <= "1f"
    a = sorted(r["doc_id"] for r in docs.where(keep).select("doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in docs.repartition(7).where(keep).select("doc_id").collect()
    )
    assert a == b and len(a) > 0


def test_pack_fill_rate_and_bin_bounds(spark, registry):
    """ceil-cumsum binning: total tokens never exceed n_bins * budget
    (fill_rate <= 1), and every source packs into >= 1 bin."""
    rows = registry["pack_sequences_cumsum"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_bins"] >= 1
        assert r["total_tokens"] <= r["n_bins"] * 256
        assert 0.0 < r["fill_rate"] <= 1.0


def test_entropy_in_alphabet_range(spark, registry):
    """Shannon entropy of char distribution: 0 < H <= log2(alphabet).
    The corpus alphabet is lowercase words + space (< 64 symbols)."""
    rows = registry["char_entropy_quality"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["min_entropy"] <= r["avg_entropy"] <= r["max_entropy"] <= 6.0


def test_repetition_fractions_in_range(spark, registry):
    rows = registry["quality_repetition"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_repetitive"] <= r["n_docs"]
        assert 0.0 <= r["avg_dup_trigram"] <= 1.0
        assert 0.0 < r["avg_top_bigram"] <= 2.0


def test_pack_binning_property(spark):
    """Randomized packing invariants, brute-force checked in Python:
    bin ids are contiguous from 1, every bin's cumulative end stays
    within bin_id * budget, and each doc lands in exactly the bin its
    running cumsum dictates."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(7)
    budget = 50
    rows = [(i, "s%d" % (i % 3), rng.randint(1, 49)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        (r["source"], r["doc_id"]): r["bin"]
        for r in df.withColumn(
            "bin", F.floor((F.sum("n_tokens").over(w) + (budget - 1)) / float(budget))
        ).collect()
    }
    # brute force
    by_src = {}
    for i, s, n in sorted(rows):
        cum = by_src.get(s, 0) + n
        by_src[s] = cum
        want = -(-cum // budget)  # ceil
        assert got[(s, i)] == want


def test_sample_hash_rate_and_determinism(spark):
    """md5-prefix <= '1f' selects ~32/256 of uniformly distributed ids,
    and the SAME ids under any engine-side evaluation order."""
    from pyspark.sql import functions as F

    df = spark.range(20000).select(F.col("id").alias("doc_id"))
    keep = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) <= "1f"
    n = df.where(keep).count()
    assert 0.105 <= n / 20000 <= 0.145  # 12.5% +- binomial noise
    import hashlib

    py = sum(
        1 for i in range(20000) if hashlib.md5(str(i).encode()).hexdigest()[:2] <= "1f"
    )
    assert n == py
