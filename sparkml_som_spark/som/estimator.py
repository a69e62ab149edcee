"""Distributed batch Self-Organizing Map, DataFrame-native.

Re-expresses the reference training loop (`SOM.scala:79-267`) in
Spark-first terms:

- The features column is decoded from Arrow ONCE into per-partition
  NumPy blocks, persisted MEMORY_AND_DISK; each training iteration is
  pure GEMM over those cached blocks (replacing the per-row
  `findClosest` at `SOM.scala:306-326` with one batched
  `|x|^2+|c|^2-2xC^T` argmin per block),
- partial aggregation runs per partition (the reference's
  mapPartitions combiner, `SOM.scala:192-209`) and combines via
  ``treeAggregate`` (depth 2) — the bounded-key `reduceByKey` analog
  (`SOM.scala:209-212`) with O(sqrt(P)) driver fan-in,
- the codebook is an explicit per-iteration broadcast
  (`SOM.scala:182`), destroyed afterwards,
- cost comes out of the same reduce rather than an accumulator
  (accumulators can double-count on task retries; a reduce cannot),
- inference (`transform`) stays fully in the DataFrame API via an
  Arrow-vectorized pandas_udf, so it composes with any downstream plan.

Scale notes (100 TB north star): per-iteration driver traffic is one
(n_cells, dim) float64 array per tree-combine leg — independent of data
size, growing only with grid size. Broadcast size is
height*width*d*8 bytes (a 20x20 map on 1024-d embeddings is ~3 MB).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark import keyword_only
from pyspark.ml import Estimator, Model
from pyspark.ml.functions import vector_to_array
from pyspark.ml.util import (
    DefaultParamsReadable,
    DefaultParamsReader,
    DefaultParamsWritable,
    DefaultParamsWriter,
    MLReader,
    MLWritable,
    MLWriter,
)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

from sparkml_som_spark.som import kernel as K
from sparkml_som_spark.som.params import SOMParams
from sparkml_som_spark.som.summary import SOMTrainingSummary

def _features_as_array(df: DataFrame, col: str) -> DataFrame:
    """Normalize the features column to array<double> named `__features`.

    Accepts array<float/double> (preferred, Arrow-friendly) or
    ml VectorUDT (adapter via vector_to_array) — the reference only
    accepted ml.linalg.Vector (`SOM.scala:84-86`).
    """
    dtype = df.schema[col].dataType
    if isinstance(dtype, T.ArrayType):
        expr = F.col(col).cast(T.ArrayType(T.DoubleType()))
    elif dtype.typeName() in ("vector", "vectorudt"):
        expr = vector_to_array(F.col(col)).cast(T.ArrayType(T.DoubleType()))
    else:
        raise TypeError(
            f"featuresCol {col!r} must be array<numeric> or ml Vector, got {dtype.simpleString()}"
        )
    return df.select(expr.alias("__features")).filter(F.col("__features").isNotNull())


def _batch_matrix(series: pd.Series) -> np.ndarray:
    """pandas Series of array<double> -> (n, d) float64 C-contiguous."""
    return np.asarray(np.stack(series.to_numpy()), dtype=np.float64)


def _sparse_rows_df(df: DataFrame, col: str) -> DataFrame:
    """VectorUDT column -> its underlying (type, size, indices, values)
    struct fields via unwrap_udt — Arrow-friendly (nnz-sized transfer),
    where vector_to_array would densify every row."""
    return (
        df.where(F.col(col).isNotNull())
        .select(F.unwrap_udt(F.col(col)).alias("u"))
        .select("u.*")
    )


def _row_nnz(r) -> tuple[np.ndarray, np.ndarray]:
    """Unwrapped vector row -> (indices, values) of its nonzeros.
    type 1 = dense encoding, type 0 = sparse encoding."""
    if r["type"] == 1:
        v = np.asarray(r["values"], dtype=np.float64)
        nz = np.flatnonzero(v)
        return nz.astype(np.int64), v[nz]
    return (
        np.asarray(r["indices"], dtype=np.int64),
        np.asarray(r["values"], dtype=np.float64),
    )


def _row_dense(r, dim: int) -> np.ndarray:
    """Unwrapped vector row -> dense float64 vector."""
    if r["type"] == 1:
        return np.asarray(r["values"], dtype=np.float64)
    v = np.zeros(dim, dtype=np.float64)
    idx, vals = _row_nnz(r)
    v[idx] = vals
    return v


def _pdf_sparse_block(u: pd.DataFrame, dim: int):
    """pandas batch of unwrapped vector structs -> (CSR block over the
    valid rows, positions of those rows).  Null vectors (null struct ->
    null `type`) are excluded and surface as null predictions."""
    types = u["type"]
    indptr = [0]
    idx_chunks: list[np.ndarray] = []
    val_chunks: list[np.ndarray] = []
    valid: list[int] = []
    for i in range(len(u)):
        if pd.isna(types.iloc[i]):
            continue
        if types.iloc[i] == 1:
            v = np.asarray(u["values"].iloc[i], dtype=np.float64)
            nz = np.flatnonzero(v)
            idx_chunks.append(nz.astype(np.int64))
            val_chunks.append(v[nz])
        else:
            idx_chunks.append(np.asarray(u["indices"].iloc[i], dtype=np.int64))
            val_chunks.append(np.asarray(u["values"].iloc[i], dtype=np.float64))
        indptr.append(indptr[-1] + len(idx_chunks[-1]))
        valid.append(i)
    block = (
        np.asarray(indptr, dtype=np.int64),
        np.concatenate(idx_chunks) if idx_chunks else np.empty(0, np.int64),
        np.concatenate(val_chunks) if val_chunks else np.empty(0, np.float64),
        len(valid),
        dim,
    )
    return block, np.asarray(valid, dtype=np.int64)


def _to_sparse_block(rows, dim: int):
    """Partition iterator of unwrapped vector rows -> ONE CSR block
    tuple (kernel.SparseBlock).  The sparse twin of `_to_block`."""
    indptr = [0]
    idx_chunks: list[np.ndarray] = []
    val_chunks: list[np.ndarray] = []
    for r in rows:
        idx, vals = _row_nnz(r)
        idx_chunks.append(idx)
        val_chunks.append(vals)
        indptr.append(indptr[-1] + len(idx))
    if len(indptr) > 1:
        yield (
            np.asarray(indptr, dtype=np.int64),
            np.concatenate(idx_chunks) if idx_chunks else np.empty(0, np.int64),
            np.concatenate(val_chunks) if val_chunks else np.empty(0, np.float64),
            len(indptr) - 1,
            dim,
        )


class SOM(Estimator, SOMParams, DefaultParamsWritable, DefaultParamsReadable):
    """Spark ML Estimator for Kohonen's batch SOM (reference `SOM.scala:38`).

    Params-only state, so `DefaultParamsWritable/Readable` give full
    `Pipeline.save`/`Pipeline.load` compatibility (a warm-start
    `setInitialModel` is deliberately not serialized — persist the model
    itself instead)."""

    # Training matrices at or below this size are collected to the driver
    # once and iterated locally (same kernel, no per-iteration Spark job).
    # Class attribute so tests can force either path.
    _LOCAL_FIT_BYTES: int = 256 << 20

    @keyword_only
    def __init__(self, **kwargs) -> None:
        super().__init__()
        self._initial_model: SOMModel | None = None
        self._set(**kwargs)

    @keyword_only
    def setParams(self, **kwargs) -> "SOM":
        self._set(**kwargs)
        return self

    # fluent setters, mirroring SOM.scala:54-77
    def setFeaturesCol(self, v: str) -> "SOM":
        return self._set(featuresCol=v)

    def setPredictionCol(self, v: str) -> "SOM":
        return self._set(predictionCol=v)

    def setDistanceCol(self, v: str) -> "SOM":
        return self._set(distanceCol=v)

    def setHeight(self, v: int) -> "SOM":
        return self._set(height=v)

    def setWidth(self, v: int) -> "SOM":
        return self._set(width=v)

    def setTMax(self, v: float) -> "SOM":
        return self._set(tMax=v)

    def setTMin(self, v: float) -> "SOM":
        return self._set(tMin=v)

    def setMaxIter(self, v: int) -> "SOM":
        return self._set(maxIter=v)

    def setTol(self, v: float) -> "SOM":
        return self._set(tol=v)

    def setTopology(self, v: str) -> "SOM":
        return self._set(topology=v)

    def setNeighborhoodKernel(self, v: str) -> "SOM":
        return self._set(neighborhoodKernel=v)

    def setTemperatureDecay(self, v: str) -> "SOM":
        return self._set(temperatureDecay=v)

    def setSeed(self, v: int) -> "SOM":
        return self._set(seed=v)

    def setInitialModel(self, model: "SOMModel") -> "SOM":
        """Warm start (reference `SOM.scala:122-131`; its shape `require`s
        compared Ints to Param objects and never fired — here the check is
        real and runs against the grid params now and the data dim at fit)."""
        if model.prototypes.shape[0] != self.getHeight() * self.getWidth():
            raise ValueError(
                f"initial model has {model.prototypes.shape[0]} cells, "
                f"estimator grid is {self.getHeight()}x{self.getWidth()}"
            )
        self._initial_model = model
        return self

    # Inputs denser than this ratio of nonzeros — or narrower than the
    # min dimension — take the dense path; only sparse AND wide inputs
    # (e.g. HashingTF/CountVectorizer TF-IDF at d=2^14+) keep CSR blocks
    # end-to-end.  Below the dim floor the densified blocks are small
    # and one GEMM per iteration beats the CSR bincount kernels ~2x
    # (measured at d=256: dense 1.7 s vs sparse 3.7 s for the same fit);
    # above it, densification is what OOMs executors and CSR wins on
    # memory AND time.  Class attrs so tests can force either path.
    _SPARSE_DENSITY_THRESHOLD: float = 0.2
    _SPARSE_MIN_DIM: int = 2048
    _SPARSE_SAMPLE_ROWS: int = 256

    def _sparse_stats(self, dataset: DataFrame, col: str) -> tuple[int, float] | None:
        """(dim, density) estimated from a bounded sample of a VectorUDT
        column; None for array columns (always dense)."""
        if dataset.schema[col].dataType.typeName() not in ("vector", "vectorudt"):
            return None
        rows = _sparse_rows_df(dataset, col).limit(self._SPARSE_SAMPLE_ROWS).collect()
        if not rows:
            return None
        nnz = tot = dim = 0
        for r in rows:
            if r["type"] == 1:
                v = np.asarray(r["values"])
                dim = max(dim, len(v))
                nnz += int(np.count_nonzero(v))
                tot += len(v)
            else:
                dim = max(dim, int(r["size"]))
                nnz += len(r["values"])
                tot += int(r["size"])
        return dim, (nnz / tot if tot else 1.0)

    def _init_codebook(self, feats: DataFrame, sparse_dim: int | None = None) -> np.ndarray:
        """Random init: height*width samples WITH replacement, seeded
        (reference `initRandom`, `SOM.scala:295-298`). RDD takeSample keeps
        the with-replacement + seeded semantics a DataFrame
        orderBy(rand).limit cannot express.

        Note: like the reference, the sample (and therefore the fitted
        model) depends on the input's partition layout as well as the
        seed — identical seed + identical partitioning => identical
        model; repartitioning changes the draw. Pin `setInitialModel`
        for layout-independent reproducibility."""
        n_cells = self.getHeight() * self.getWidth()
        seed = self.getOrDefault(self.seed)
        if sparse_dim is not None:
            sample = feats.rdd.takeSample(True, n_cells, seed=seed)
            if not sample:
                raise ValueError("cannot fit SOM on an empty dataset (no non-null feature rows)")
            # codebook is dense from the start (the weighted-mean update
            # densifies it after one iteration anyway)
            return np.stack([_row_dense(r, sparse_dim) for r in sample])
        sample = feats.rdd.map(lambda r: r[0]).takeSample(True, n_cells, seed=seed)
        if not sample:
            raise ValueError("cannot fit SOM on an empty dataset (no non-null feature rows)")
        return np.asarray(sample, dtype=np.float64)

    def _fit(self, dataset: DataFrame) -> "SOMModel":
        self._validate()
        spark = dataset.sparkSession
        sc = spark.sparkContext
        h, w = self.getHeight(), self.getWidth()
        n_cells = h * w
        max_iter = self.getOrDefault(self.maxIter)
        tol = self.getOrDefault(self.tol)
        kern = self.getNeighborhoodKernel()
        decay = self.getTemperatureDecay()
        t_max, t_min = self.getTMax(), self.getTMin()

        feat_col = self.getOrDefault(self.featuresCol)
        # Sparse route (reference parity: sparse-aware BLAS/distance at
        # BLAS.scala:73-92, MLUtils.scala:77-84): VectorUDT inputs whose
        # sampled density is below the threshold keep CSR blocks
        # end-to-end — a d=2^18 TF-IDF corpus never densifies, where the
        # dense path would OOM executors on the decoded blocks.
        stats = self._sparse_stats(dataset, feat_col)
        use_sparse = (
            stats is not None
            and stats[1] < self._SPARSE_DENSITY_THRESHOLD
            and stats[0] >= self._SPARSE_MIN_DIM
        )
        if use_sparse:
            sparse_dim, sparse_density = stats
            feats = _sparse_rows_df(dataset, feat_col)
        else:
            feats = _features_as_array(dataset, feat_col)
        # Persist the narrow feature projection unconditionally (the
        # reference's "iff caller didn't" guard, SOM.scala:82,88-90,
        # checked the input dataset — but fit makes several passes over
        # the *projection* (count, seeded takeSample, block build), and
        # each pass re-decodes rows unless feats itself is cached).
        feats.persist(StorageLevel.MEMORY_AND_DISK)

        # Decode each partition to ONE NumPy block (dense ndarray or CSR
        # tuple): per-iteration work is then pure GEMM / bincount over
        # those cached blocks with no Arrow/pickle decode in the loop
        # (the "treeAggregate on NumPy blocks" variant from SURVEY.md §3
        # — DataFrame mapInPandas paid ~2x per-iteration overhead
        # re-decoding the same rows).
        if use_sparse:
            def _to_block(rows, _d=sparse_dim):
                yield from _to_sparse_block(rows, _d)
        else:
            def _to_block(rows):
                buf = [r[0] for r in rows]
                if buf:
                    yield np.asarray(buf, dtype=np.float64)

        n_rows = feats.count()

        if self._initial_model is not None:
            codebook = self._initial_model.prototypes.astype(np.float64).copy()
            first = feats.first()
            if first is not None:
                first_dim = sparse_dim if use_sparse else len(first[0])
                if first_dim != codebook.shape[1]:
                    raise ValueError(
                        f"initial model dimension {codebook.shape[1]} does not match "
                        f"data dimension {first_dim}"
                    )
        else:
            codebook = self._init_codebook(feats, sparse_dim if use_sparse else None)
        dim = codebook.shape[1]

        grid_d = K.grid_distances(h, w, self.getTopology())
        history: list[float] = []
        it = 0
        converged = False
        # Small codebooks ride the task closure (cheaper than creating and
        # destroying a broadcast every iteration); big ones broadcast once
        # per iteration so executors fetch them a single time.
        use_broadcast = codebook.nbytes >= 1 << 20

        # Small-data fast path: when the full training matrix fits easily
        # on the driver, collect the decoded blocks ONCE and run every
        # iteration as pure local NumPy — the math is the identical
        # kernel call; what disappears is max_iter job launches, each a
        # fixed scheduling cost that dominates sub-second aggregations.
        # Above the threshold the distributed aggregate/treeAggregate
        # path below runs unchanged (the 100 TB path; per-iteration
        # driver traffic stays one (n_cells, dim) array either way).
        local_blocks: list | None = None
        blocks = None
        est_bytes = (
            int(n_rows * sparse_density * dim * 12) if use_sparse else n_rows * dim * 8
        )
        if est_bytes <= self._LOCAL_FIT_BYTES:
            collected = feats.rdd.mapPartitions(_to_block).collect()
            if collected:
                # dense blocks vstack to ONE matrix (single GEMM per
                # iteration); sparse blocks stay a list — concatenation
                # buys nothing for the bincount kernels
                if use_sparse:
                    local_blocks = collected
                else:
                    local_blocks = [
                        collected[0] if len(collected) == 1 else np.vstack(collected)
                    ]
        if local_blocks is None:
            # Right-size parallelism to the data: each training job pays a
            # fixed per-task scheduling cost, so datasets spread over many
            # small partitions are overhead-bound. Coalesce (no shuffle)
            # toward ~100k rows per block; large data keeps its layout.
            blocks = feats.rdd.mapPartitions(_to_block)
            n_parts = blocks.getNumPartitions()
            target = max(1, min(n_parts, n_rows // 100_000 + 1))
            if target < n_parts:
                blocks = blocks.coalesce(target)
            blocks = blocks.persist(StorageLevel.MEMORY_AND_DISK)

        n_samples_trained = -1
        while it < max_iter and not converged:
            temp = K.temperature(it, max_iter, t_max, t_min, decay)
            if local_blocks is not None:
                cb = np.ascontiguousarray(codebook)
                cn2 = np.einsum("ij,ij->i", cb, cb)
                sums = np.zeros((n_cells, dim), dtype=np.float64)
                counts = np.zeros(n_cells, dtype=np.int64)
                cost = 0.0
                for blk in local_blocks:
                    s, c, co = K.aggregate_block(blk, cb, n_cells, cn2)
                    sums += s
                    counts += c
                    cost += co
            else:
                bc = sc.broadcast(codebook) if use_broadcast else None
                cb_direct = None if use_broadcast else codebook

                def seq_op(acc, block, _bc=bc, _cb=cb_direct, _n=n_cells):
                    cb = np.ascontiguousarray(_bc.value if _bc is not None else _cb)
                    cn2 = np.einsum("ij,ij->i", cb, cb)
                    s, c, co = K.aggregate_block(block, cb, _n, cn2)
                    return (acc[0] + s, acc[1] + c, acc[2] + co)

                def comb_op(a, b):
                    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])

                zero = (
                    np.zeros((n_cells, dim), dtype=np.float64),
                    np.zeros(n_cells, dtype=np.int64),
                    0.0,
                )
                # Partial aggregation per partition (reference mapPartitions,
                # SOM.scala:192-209) + combine (the bounded reduceByKey analog,
                # SOM.scala:209-212). Single-stage aggregate while the driver
                # fan-in is small; tree combine (depth 2, O(sqrt(P)) fan-in)
                # once partition count would swamp the driver — the extra
                # stage costs a full job-launch latency, so it must not be
                # paid on small clusters.
                if blocks.getNumPartitions() <= 256:
                    sums, counts, cost = blocks.aggregate(zero, seq_op, comb_op)
                else:
                    sums, counts, cost = blocks.treeAggregate(zero, seq_op, comb_op, depth=2)
                if bc is not None:
                    bc.destroy()

            weights = K.neighborhood(grid_d, temp, kern)
            new_codebook = K.smooth_update(codebook, sums, counts, weights)
            converged = K.max_movement2(codebook, new_codebook) <= tol * tol
            codebook = new_codebook
            history.append(cost)
            # conservation anchor: every BMU assignment lands in exactly
            # one cell, so the per-cell count total IS the row count the
            # distributed aggregation consumed this iteration
            n_samples_trained = int(counts.sum())
            it += 1

        model = SOMModel(prototypes=codebook)
        model._resetUid(self.uid)
        self._copyValues(model)
        # inference stays sparse when training was sparse (the transform
        # UDF then receives nnz-sized Arrow batches, never dense rows)
        model._sparse_inference = use_sparse
        predictions = model.transform(dataset)
        model.summary = SOMTrainingSummary(
            predictions=predictions,
            prediction_col=self.getOrDefault(self.predictionCol),
            features_col=self.getOrDefault(self.featuresCol),
            height=h,
            width=w,
            t_max=t_max,
            t_min=t_min,
            max_iter=max_iter,
            tol=tol,
            topology=self.getTopology(),
            neighborhood_kernel=kern,
            temperature_decay=decay,
            training_cost=history[-1] if history else float("nan"),
            objective_history=history,
            n_samples=n_samples_trained,
        )
        if blocks is not None:
            blocks.unpersist()
        feats.unpersist()
        return model


class _SOMModelWriter(MLWriter):
    """ML-format writer: params via DefaultParamsWriter metadata + the
    codebook as a parquet table — so `PipelineModel.save` containing a
    SOM stage works out of the box."""

    def __init__(self, instance: "SOMModel") -> None:
        super().__init__()
        self.instance = instance

    def saveImpl(self, path: str) -> None:
        DefaultParamsWriter.saveMetadata(self.instance, path, self.sc)
        self.instance.prototypes_df(self.sparkSession).write.mode("overwrite").parquet(
            os.path.join(path, "prototypes")
        )


class _SOMModelReader(MLReader):
    def __init__(self, cls) -> None:
        super().__init__()
        self._clazz = cls

    def load(self, path: str) -> "SOMModel":
        metadata = DefaultParamsReader.loadMetadata(path, self.sc)
        rows = (
            self.sparkSession.read.parquet(os.path.join(path, "prototypes"))
            .orderBy("cell")
            .collect()
        )
        prototypes = np.asarray([r["vector"] for r in rows], dtype=np.float64)
        model = self._clazz(prototypes=prototypes)
        model._resetUid(metadata["uid"])
        DefaultParamsReader.getAndSetParams(model, metadata)
        return model


class SOMModel(Model, SOMParams, MLWritable):
    """Fitted SOM (reference `SOMModel.scala:27-98`) + save/load, which the
    reference lacks (`README.md:91`).  Implements MLWritable/MLReadable so
    both the model alone and a `PipelineModel` containing it persist via
    the standard `save`/`load` surface."""

    def __init__(self, prototypes: np.ndarray | None = None) -> None:
        super().__init__()
        self.prototypes = (
            np.asarray(prototypes, dtype=np.float64) if prototypes is not None else None
        )
        self.summary: SOMTrainingSummary | None = None
        # set by SOM._fit when training ran on CSR blocks; keeps
        # inference nnz-sized for VectorUDT inputs
        self._sparse_inference: bool = False

    def setFeaturesCol(self, v: str) -> "SOMModel":
        return self._set(featuresCol=v)

    def setPredictionCol(self, v: str) -> "SOMModel":
        return self._set(predictionCol=v)

    def setDistanceCol(self, v: str) -> "SOMModel":
        return self._set(distanceCol=v)

    def has_summary(self) -> bool:
        return self.summary is not None

    def _bmu_udf(self, spark: SparkSession):
        bc = spark.sparkContext.broadcast(self.prototypes)

        @F.pandas_udf("prediction int, distance double")
        def predict_udf(arrs: pd.Series) -> pd.DataFrame:
            cb = np.ascontiguousarray(bc.value)
            cn2 = np.einsum("ij,ij->i", cb, cb)
            # null features -> null prediction/distance (fit drops nulls;
            # transform must not crash and must preserve the row count)
            valid = arrs.notna().to_numpy()
            pred = pd.array([pd.NA] * len(arrs), dtype="Int32")
            dist = pd.array([pd.NA] * len(arrs), dtype="Float64")
            if valid.any():
                x = _batch_matrix(arrs[valid])
                idx, d2 = K.find_bmu(x, cb, cn2)
                pred[valid] = idx.astype(np.int32)
                dist[valid] = d2
            return pd.DataFrame({"prediction": pred, "distance": dist})

        return predict_udf

    def _features_expr(self, df: DataFrame):
        col = self.getOrDefault(self.featuresCol)
        dtype = df.schema[col].dataType
        if isinstance(dtype, T.ArrayType):
            return F.col(col).cast(T.ArrayType(T.DoubleType()))
        return vector_to_array(F.col(col)).cast(T.ArrayType(T.DoubleType()))

    def _use_sparse_inference(self, df: DataFrame) -> bool:
        col = self.getOrDefault(self.featuresCol)
        return (
            self._sparse_inference
            and df.schema[col].dataType.typeName() in ("vector", "vectorudt")
        )

    def _bmu_udf_sparse(self, spark: SparkSession):
        """Sparse twin of `_bmu_udf`: consumes the unwrap_udt struct, so
        Arrow moves nnz entries instead of d-length dense rows, and the
        kernel is the CSR bincount path — a d=2^18 TF-IDF batch never
        densifies."""
        bc = spark.sparkContext.broadcast(self.prototypes)
        dim = int(self.prototypes.shape[1])

        @F.pandas_udf("prediction int, distance double")
        def predict_sparse(u: pd.DataFrame) -> pd.DataFrame:
            cb = np.ascontiguousarray(bc.value)
            cn2 = np.einsum("ij,ij->i", cb, cb)
            block, valid = _pdf_sparse_block(u, dim)
            pred = pd.array([pd.NA] * len(u), dtype="Int32")
            dist = pd.array([pd.NA] * len(u), dtype="Float64")
            if valid.size:
                idx, d2 = K.find_bmu_sparse(block, cb, cn2)
                pred[valid] = idx.astype(np.int32)
                dist[valid] = d2
            return pd.DataFrame({"prediction": pred, "distance": dist})

        return predict_sparse

    def _transform(self, dataset: DataFrame) -> DataFrame:
        """Append the BMU index column (reference `SOMModel.scala:76-81`),
        via a vectorized pandas_udf against an explicit broadcast — the
        reference shipped prototypes in the UDF closure per-task. The
        optional distanceCol (an extension) emits the squared distance to
        the BMU from the same kernel pass."""
        pred_col = self.getOrDefault(self.predictionCol)
        dist_col = self.getDistanceCol()
        if not pred_col and not dist_col:
            # empty names disable output (SchemaUtils.scala:90)
            return dataset
        if self._use_sparse_inference(dataset):
            udf = self._bmu_udf_sparse(dataset.sparkSession)
            feat_in = F.unwrap_udt(F.col(self.getOrDefault(self.featuresCol)))
        else:
            udf = self._bmu_udf(dataset.sparkSession)
            feat_in = self._features_expr(dataset)
        out = dataset.withColumn("__bmu", udf(feat_in))
        if pred_col:
            out = out.withColumn(pred_col, F.col("__bmu.prediction"))
        if dist_col:
            out = out.withColumn(dist_col, F.col("__bmu.distance"))
        return out.drop("__bmu")

    def predict(self, features) -> int:
        """Single-vector convenience (reference `SOMModel.scala:88-90`)."""
        x = np.asarray(features, dtype=np.float64)[None, :]
        idx, _ = K.find_bmu(x, self.prototypes)
        return int(idx[0])

    def compute_cost(self, dataset: DataFrame) -> float:
        """Sum of squared distances to BMU (reference `SOMModel.scala:92-97`).
        Map + global sum: no shuffle."""
        spark = dataset.sparkSession
        bc = spark.sparkContext.broadcast(self.prototypes)

        if self._use_sparse_inference(dataset):
            dim = int(self.prototypes.shape[1])

            @F.pandas_udf(T.DoubleType())
            def min_d2_sparse(u: pd.DataFrame) -> pd.Series:
                cb = np.ascontiguousarray(bc.value)
                cn2 = np.einsum("ij,ij->i", cb, cb)
                block, valid = _pdf_sparse_block(u, dim)
                out = np.zeros(len(u))  # null features contribute zero cost
                if valid.size:
                    _, d2 = K.find_bmu_sparse(block, cb, cn2)
                    out[valid] = d2
                return pd.Series(out)

            expr = min_d2_sparse(
                F.unwrap_udt(F.col(self.getOrDefault(self.featuresCol)))
            )
        else:

            @F.pandas_udf(T.DoubleType())
            def min_d2(arrs: pd.Series) -> pd.Series:
                cb = np.ascontiguousarray(bc.value)
                cn2 = np.einsum("ij,ij->i", cb, cb)
                valid = arrs.notna().to_numpy()
                out = np.zeros(len(arrs))  # null features contribute zero cost
                if valid.any():
                    x = _batch_matrix(arrs[valid])
                    _, d2 = K.find_bmu(x, cb, cn2)
                    out[valid] = d2
                return pd.Series(out)

            expr = min_d2(self._features_expr(dataset))

        row = dataset.select(F.sum(expr).alias("cost")).first()
        return float(row["cost"])

    computeCost = compute_cost  # reference-style alias

    def prototypes_df(self, spark: SparkSession) -> DataFrame:
        """Codebook as a DataFrame (cell, row, col, vector) — joins against
        per-cell aggregates; always broadcastable (height*width rows)."""
        w = self.getWidth()
        rows = [
            (int(i), int(i // w), int(i % w), [float(v) for v in vec])
            for i, vec in enumerate(self.prototypes)
        ]
        return spark.createDataFrame(rows, "cell int, row int, col int, vector array<double>")

    # --- persistence (closes the reference's stated gap, README.md:91) ---
    def write(self) -> MLWriter:
        return _SOMModelWriter(self)

    @classmethod
    def read(cls) -> _SOMModelReader:
        return _SOMModelReader(cls)

    def save(self, path: str) -> None:
        """Overwriting save; the writer carries its own SparkSession, so
        this works from any thread (no getActiveSession dependency)."""
        self.write().overwrite().save(path)

    @classmethod
    def load(cls, *args) -> "SOMModel":
        """`load(path)` (MLReadable surface) or the legacy
        `load(spark, path)` — the session argument is accepted and
        ignored (the reader resolves its own)."""
        if not args or len(args) > 2:
            raise TypeError("load expects (path) or (spark, path)")
        return cls.read().load(args[-1])
