"""Build a ~Nx replica of an existing SF dir for SCALING MEASUREMENT ONLY
(VERDICT r15 ask #3: one credible scaling datapoint beyond sf0.1).

The driver's testdata is read-only and capped at sf0.1; this tool writes a
synthetic larger set under /root/repo/.scratch/scaled/sf<x> by unioning K
key-shifted copies of each sf0.1 fact table.  Keys are shifted by
copy_idx * stride (stride = a power of ten above the max key) so uniqueness
and key-joins survive; foreign keys into replicated parents are shifted by
the SAME stride so the join fanout per key is preserved.  Dimension tables
bounded by the schema (region, nation) are copied as-is.

The result is NOT oracle-comparable (the oracle canon is pinned to the
driver's deterministic generator) — it exists so tools/scale_bench.py can
measure 8-vs-32-core ratios at 10x the rows, where per-entry fixed costs
stop dominating.  Nothing on any query path reads this directory.

Usage: PYTHONPATH=/root/repo python tools/make_scaled_data.py [--mult 10]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# key columns shifted per copy: table -> (primary keys / FKs into
# replicated parents).  customer/supplier/part are replicated too so the
# per-key join fanout (orders per customer, lineitems per part) stays at
# the sf0.1 shape instead of multiplying.
SHIFT = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation"]
STRIDE = 100_000_000  # > any sf0.1 key; keeps shifted ranges disjoint


def main() -> int:
    mult = 10
    if "--mult" in sys.argv:
        mult = int(sys.argv[sys.argv.index("--mult") + 1])
    out_dir = os.path.join(REPO, ".scratch", "scaled", f"sf{mult}x0.1")
    done = os.path.join(out_dir, "_SCALED_SUCCESS")
    if os.path.exists(done):
        print(out_dir)
        return 0
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import functions as F

    from sparkml_som_spark.session import get_spark
    from sparkml_som_spark.sources import load_table

    spark = get_spark("make-scaled-data")
    spark.sparkContext.setLogLevel("ERROR")
    for name in COPY:
        shutil.copyfile(
            os.path.join(SRC, f"{name}.parquet"), os.path.join(out_dir, f"{name}.parquet")
        )
    for name, keys in SHIFT.items():
        # load_table normalizes the events `ts` physical type the same way
        # every query path does, so the scaled copy round-trips cleanly
        df = load_table(spark, SRC, name)
        copies = []
        for i in range(mult):
            c = df
            for k in keys:
                c = c.withColumn(k, (F.col(k) + F.lit(i * STRIDE)).cast(dict(df.dtypes)[k]))
            copies.append(c)
        u = copies[0]
        for c in copies[1:]:
            u = u.unionByName(c)
        # one dir per table (load_table reads the path generically); a few
        # files so the scan parallelizes like a production layout
        tgt = os.path.join(out_dir, f"{name}.parquet")
        u.repartition(8).write.mode("overwrite").parquet(tgt)
        print(f"{name}: {df.count()} -> {spark.read.parquet(tgt).count()} rows")
    with open(done, "w") as f:
        f.write("ok\n")
    print(out_dir)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
