"""Skew probe for `distributed_global_rank` (the weak spot uniform-row
probes can't see): a zipf-skewed sort key would collapse a naive range
partitioning into one fat partition — every row with the hot value
lands together and one task sorts/ranks most of the data.

The implementation is robust to this BY CONSTRUCTION, and this probe
measures it: the rank's contract requires a TOTAL order (sort_cols must
include a tiebreaker), and `repartitionByRange` partitions on the full
key TUPLE — so rows sharing the hot `n_chars` value still split across
range partitions on the tiebreaker.  The probe builds a corpus where
~90% of rows share ONE sort-key value (far worse than any real length
distribution), ranks it at 1x and 100x rows, and records:

- wall time at both sizes (superlinear growth => skew cliff),
- per-partition row counts of the pinned intermediate
  (max/mean ratio ~1.0 => the hot value split cleanly),
- exact rank invariants at both sizes (sum of ranks == N*(N-1)/2,
  min == 0, max == N-1, n_distinct == N) and a full value check vs
  `row_number()` at the small size.

Usage: PYTHONPATH=/root/repo python tools/rank_skew_probe.py
Writes one JSON line; the measured row goes into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SMALL = 60_000
N_BIG = 6_000_000  # 100x
N_PARTS = 8
HOT_SHARE = 0.9  # 90% of rows share one sort-key value


def skewed_df(spark, n: int):
    from pyspark.sql import functions as F

    # deterministic zipf-ish skew: hot value 777 for 90% of rows, the
    # rest spread over 1000 values keyed by id arithmetic (no RNG — the
    # probe must be reproducible)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, F.lit(777))
        .otherwise((F.col("id") % 1000).cast("int"))
        .alias("n_chars"),
    )


def probe(spark, n: int, check_exact: bool) -> dict:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparkml_som_spark.operators.corpus_ops3 import distributed_global_rank

    df = skewed_df(spark, n)
    df.count()  # warm the input outside the timed region
    held: list = []
    t0 = time.time()
    ranked = distributed_global_rank(
        df, [F.col("n_chars").desc(), F.col("doc_id").asc()], n_parts=N_PARTS, cleanup=held
    )
    inv = ranked.agg(
        F.count("*").alias("n"),
        F.countDistinct("rank").alias("n_distinct"),
        F.min("rank").alias("mn"),
        F.max("rank").alias("mx"),
        F.sum("rank").alias("s"),
    ).collect()[0]
    wall = time.time() - t0
    # partition balance of the pinned intermediate: the hot key must
    # have split on the tiebreaker, so no partition dominates
    parts = [
        r["n"]
        for r in held[0]
        .groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert inv["n"] == n and inv["n_distinct"] == n
    assert inv["mn"] == 0 and inv["mx"] == n - 1
    assert inv["s"] == n * (n - 1) // 2
    if check_exact:
        w = Window.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        want = df.withColumn("rank", F.row_number().over(w) - 1)
        assert ranked.exceptAll(want).count() == 0
    for h in held:
        h.unpersist()
    mean = sum(parts) / len(parts)
    return {
        "rows": n,
        "wall_sec": round(wall, 3),
        "n_partitions": len(parts),
        "max_over_mean_partition": round(max(parts) / mean, 3),
        "exact_vs_window": check_exact,
    }


def main() -> None:
    from sparkml_som_spark.session import get_spark

    spark = get_spark("rank-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    small = probe(spark, N_SMALL, check_exact=True)
    big = probe(spark, N_BIG, check_exact=False)
    print(
        json.dumps(
            {
                "probe": "distributed_global_rank under 90%-hot-key skew",
                "hot_share": HOT_SHARE,
                "small": small,
                "big_100x": big,
                "wall_ratio_100x": round(big["wall_sec"] / small["wall_sec"], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
