"""analytics20 mechanics: UDTF analyze-time validation and silhouette
reconciliation with NumPy."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import load_all
from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


def test_ngrams_udtf_analyze_validation(spark):
    """A non-positive constant n must fail at PLAN time (analyze), not
    at execution; a valid call yields the expected bigrams."""
    from sparkml_som_spark.functions.udtfs import register_ngrams_udtf

    register_ngrams_udtf(spark)
    rows = spark.sql("SELECT * FROM sgs_ngrams('a b c', 2)").collect()
    assert [(r["pos"], r["gram"]) for r in rows] == [(0, "a b"), (1, "b c")]
    with pytest.raises(Exception) as exc:
        spark.sql("SELECT * FROM sgs_ngrams('a b c', 0)").collect()
    assert "positive constant" in str(exc.value)


def test_ngram_counts_conservation(spark):
    """Each doc contributes exactly max(0, n_tokens-1) bigrams; the
    HAVING-filtered output totals must be <= that grand total."""
    reg = _registry()
    rows = reg["udtf_ngram_counts"].fn(spark, SF).collect()
    assert rows
    docs = load_table(spark, SF, "documents")
    grand = docs.select(
        F.greatest(F.size(F.split(F.lower("text"), " ")) - 1, F.lit(0)).alias("g")
    ).agg(F.sum("g")).collect()[0][0]
    assert sum(r["n"] for r in rows) <= grand
    from sparkml_som_spark.operators.analytics20 import _NGRAM_MIN_COUNT

    assert all(r["n"] >= _NGRAM_MIN_COUNT for r in rows)


def test_silhouette_numpy_replay(spark):
    """The per-label average simplified silhouette must match a NumPy
    replay (centroids, distances, (b-a)/max(a,b))."""
    reg = _registry()
    got = {r["label"]: r for r in reg["silhouette_simplified_labels"].fn(spark, SF).collect()}
    data = load_table(spark, SF, "embeddings").select("vec_id", "label", "embedding").collect()
    by_label = {}
    for r in data:
        by_label.setdefault(r["label"], []).append(np.asarray(r["embedding"], dtype=np.float64))
    cents = {lbl: np.mean(np.stack(vs), axis=0) for lbl, vs in by_label.items()}
    agg = {lbl: [] for lbl in by_label}
    well = {lbl: 0 for lbl in by_label}
    for r in data:
        v = np.asarray(r["embedding"], dtype=np.float64)
        a = float(np.linalg.norm(v - cents[r["label"]]))
        b = min(
            float(np.linalg.norm(v - c)) for lbl, c in cents.items() if lbl != r["label"]
        )
        agg[r["label"]].append((b - a) / max(a, b))
        if b > a:
            well[r["label"]] += 1
    for lbl, sc in agg.items():
        g = got[lbl]
        assert g["n_vectors"] == len(sc)
        assert abs(g["avg_silhouette"] - round(sum(sc) / len(sc), 4)) < 1e-3, lbl
        assert g["n_well_assigned"] == well[lbl]
