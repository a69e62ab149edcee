"""Scan-cost probe for product quantization: measures the claim ADC
exists for — scoring a query against the corpus by reading 4-bit CODES
instead of raw fp vectors is cheaper per row.

Builds a deterministic synthetic corpus (unit-norm d=64, values from
id arithmetic — no RNG in the distributed path), trains the standard
8x16 codebooks on the first 2048 rows, pre-materializes BOTH
representations (raw vectors / codes) in cache, then times two
equivalent jobs at 1x (100k rows) and 10x (1M rows):

- exact scan: per Arrow batch, one (batch, d) x (d, nq) GEMM against
  the 5 broadcast queries, then a global per-query MIN aggregate;
- ADC scan: per Arrow batch, m lookup-gathers into the broadcast
  (nq, m, k) LUT summed, same global aggregate.

Same driver plan shape, same aggregation — the difference is bytes
read per row (512 raw vs 32 codes) and FLOPs per row-query (64 MACs
vs 8 gathers).  Also asserts the two jobs agree on the exact-vs-ADC
relationship per query (ADC min distance >= 0 and finite).

Usage: PYTHONPATH=/root/repo python tools/pq_scan_probe.py
Writes one JSON line; the measured rows go into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SMALL = 100_000
N_BIG = 1_000_000
DIM = 64
NQ = 64  # enough queries that per-row scoring cost dominates the scan


def synthetic_vectors(spark, n: int):
    """Deterministic unit-norm vectors: v[j] = f(id, j) via integer
    arithmetic, normalized per row inside a vectorized UDF."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def gen(ids):
        iv = ids.to_numpy()[:, None].astype(np.int64)  # (batch, 1)
        j = np.arange(DIM)[None, :]
        raw = ((iv * 1_000_003 + j * 7919) % 10_007) / 10_007.0 - 0.5
        raw /= np.linalg.norm(raw, axis=1, keepdims=True)
        return pd.Series([r.tolist() for r in raw])

    return spark.range(n).select(F.col("id").alias("vec_id"), gen("id").alias("v"))


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from sparkml_som_spark.operators.similarity import pq_encode, pq_train_lloyd
    from sparkml_som_spark.session import get_spark

    spark = get_spark("pq-scan-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def run(n: int) -> dict:
        vecs = synthetic_vectors(spark, n).persist()
        sample = np.stack(
            [np.asarray(r["v"]) for r in vecs.where(F.col("vec_id") < 2048).orderBy("vec_id").collect()]
        )
        cbs = pq_train_lloyd(sample)
        m, k, sub = cbs.shape
        enc_held: list = []
        codes = pq_encode(vecs, cbs, cleanup=enc_held).select("vec_id", "codes").persist()
        codes.count()  # materialize both caches outside the timed region
        vecs.count()

        Q = sample[:NQ]
        bc_q = spark.sparkContext.broadcast(Q)
        luts = np.stack(
            [
                ((Q[:, j * sub : (j + 1) * sub][:, None, :] - cbs[j][None, :, :]) ** 2).sum(-1)
                for j in range(m)
            ],
            axis=1,
        )
        bc_lut = spark.sparkContext.broadcast(luts)

        from pyspark.sql import types as T

        out_schema = T.StructType([T.StructField("mins", T.ArrayType(T.DoubleType()))])

        def exact_scan(it):
            Qv = bc_q.value
            qn2 = (Qv * Qv).sum(1)
            for pdf in it:
                X = np.stack([np.asarray(x) for x in pdf["v"]])
                d2 = (X * X).sum(1)[:, None] + qn2[None, :] - 2.0 * (X @ Qv.T)
                yield pd.DataFrame({"mins": [d2.min(0).tolist()]})

        def adc_scan(it):
            L = bc_lut.value
            for pdf in it:
                Cd = np.stack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
                out = np.zeros((Cd.shape[0], L.shape[0]))
                for j in range(L.shape[1]):
                    out += L[:, j, Cd[:, j]].T
                yield pd.DataFrame({"mins": [out.min(0).tolist()]})

        def timed(df, fn):
            # per-batch partial mins inside the scan; the driver folds the
            # tiny partials — so the timed region is read + score, not an
            # exploded row-per-(row, query) shuffle
            t0 = time.time()
            parts = df.mapInPandas(fn, out_schema).collect()
            mins = np.min(np.stack([np.asarray(p["mins"]) for p in parts]), axis=0)
            return time.time() - t0, mins

        w_exact, mins_exact = timed(vecs, exact_scan)
        w_adc, mins_adc = timed(codes, adc_scan)

        # the index-size win is the robust local measurement: cached
        # bytes per representation (the scan-speed gap is muted here
        # because both paths are Arrow-conversion-bound against an
        # in-memory cache; at IO-bound scale bytes == time)
        mem = {
            info.name(): info.memSize()
            for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        }
        sizes = sorted(mem.values(), reverse=True)
        vec_bytes, code_bytes = (sizes + [0, 0])[:2]
        assert np.all(mins_adc >= 0) and np.all(np.isfinite(mins_adc))
        # queries are corpus rows (self included): exact min == 0 per query
        assert np.all(np.abs(mins_exact) < 1e-9)
        vecs.unpersist()
        codes.unpersist()
        bc_q.destroy()
        bc_lut.destroy()
        for h in enc_held:
            h.destroy()
        return {
            "rows": n,
            "exact_scan_sec": round(w_exact, 3),
            "adc_scan_sec": round(w_adc, 3),
            "adc_speedup": round(w_exact / w_adc, 2),
            "vector_cache_mb": round(vec_bytes / 1e6, 1),
            "code_cache_mb": round(code_bytes / 1e6, 1),
            "index_compression_x": round(vec_bytes / max(code_bytes, 1), 1),
        }

    small = run(N_SMALL)
    big = run(N_BIG)
    print(json.dumps({"pq_scan": {"small": small, "big_10x": big}}))
    spark.stop()


if __name__ == "__main__":
    main()
