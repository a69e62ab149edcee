"""FIXTURES.md A3: sparse and dense encodings of the same values must
produce identical models and predictions (the reference kept separate
sparse kernels, BLAS.scala:73-92 / MLUtils.scala:77-84; this engine
densifies per Arrow batch — agreement is the contract either way)."""

import numpy as np
from pyspark.ml.linalg import Vectors

from sparkml_som_spark.som import SOM


def _twin_dfs(spark, n=60, d=12, seed=3):
    rng = np.random.default_rng(seed)
    dense_rows = rng.random((n, d))
    # sparsify: zero out ~70% of entries, same values in both encodings
    mask = rng.random((n, d)) < 0.7
    vals = np.where(mask, 0.0, dense_rows)
    sparse_df = spark.createDataFrame(
        [
            (Vectors.sparse(d, {i: float(v) for i, v in enumerate(row) if v != 0.0}),)
            for row in vals
        ],
        ["features"],
    )
    dense_df = spark.createDataFrame([(row.tolist(),) for row in vals], "features array<double>")
    return sparse_df, dense_df


def test_sparse_dense_same_model_and_predictions(spark):
    sparse_df, dense_df = _twin_dfs(spark)
    # identical partitioning => identical seeded init => identical fit
    m_sparse = SOM(height=2, width=2, maxIter=4, seed=9, tol=0.0).fit(sparse_df.coalesce(1))
    m_dense = SOM(height=2, width=2, maxIter=4, seed=9, tol=0.0).fit(dense_df.coalesce(1))
    np.testing.assert_allclose(m_sparse.prototypes, m_dense.prototypes, rtol=1e-12)

    p_sparse = [r["prediction"] for r in m_sparse.transform(sparse_df.coalesce(1)).collect()]
    p_dense = [r["prediction"] for r in m_dense.transform(dense_df.coalesce(1)).collect()]
    assert p_sparse == p_dense
