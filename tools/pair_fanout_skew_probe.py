"""Hot-group pair-fanout probe for the co-occurrence pair builders —
the shared scale hazard of `community_lpa_parts` (per-order item
pairs), `recs_item_item_cosine` (per-customer brand pairs),
`basket_lift_brand_pairs`, and `triangle_count_copurchase`.

The pair build is a self-join on the group key with fan-out C(n, 2)
per group.  TPC-H groups are tiny (orders carry <= 7 items, customers
touch <= ~25 brands), so the registered entries are safe on their own
inputs — but a real 100 TB basket/co-click table has hyper-active
keys: ONE group with 8k items contributes 32M pairs, all produced by
the single join task that owns that key.  That is the classic
quadratic hot-key cliff: wall grows with C(hot, 2) while every other
task idles.

Mitigation measured here: cap items per group at K=256 by
DETERMINISTIC hash rank (row_number over md5(item) within the group)
BEFORE the pair build — the standard hyper-active-user downsample in
item-item CF and co-occurrence graph builds (a group with thousands of
items carries almost no pairwise signal per pair anyway; the hash rank
keeps the kept subset stable across runs and engines).  Groups at or
under the cap are UNTOUCHED — the probe asserts the non-hot pair set
is bit-identical — and the hot group's fan-out drops from C(H,2) to
C(256,2) = 32,640, flat no matter how hot the key gets.

Data is built with id arithmetic only (no RNG — reproducible), one
JSON line out; the measured rows go into SCALE.md.

Usage: PYTHONPATH=/root/repo python tools/pair_fanout_skew_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_GROUPS = 15_000
ITEMS_PER = 6
CAP_K = 256
HOTS = [0, 2_000, 8_000]
HOT_GROUP = -1  # group key reserved for the hot basket


def baskets(spark, hot: int):
    """15k groups x 6 items (the TPC-H shape) + one group with `hot`
    items.  Item ids overlap across groups (id % 2000) so pairs
    actually repeat and the HAVING w >= 2 filter has work to do."""
    from pyspark.sql import functions as F

    base = spark.range(N_GROUPS * ITEMS_PER).select(
        (F.col("id") % N_GROUPS).alias("g"),
        ((F.col("id") * 37) % 2_000).alias("p"),
    )
    if hot == 0:
        return base
    hot_df = spark.range(hot).select(
        F.lit(HOT_GROUP).alias("g"), (F.col("id") + 10_000).alias("p")
    )
    return base.unionByName(hot_df)


def pair_build(df, cap: bool):
    """The exact shape community_lpa_parts / recs_item_item_cosine use:
    distinct membership -> optional per-group cap -> self-join with
    p < p2 -> weight count with a min-support HAVING."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    li = df.distinct()
    if cap:
        w = Window.partitionBy("g").orderBy(F.md5(F.col("p").cast("string")), "p")
        li = li.withColumn("_r", F.row_number().over(w)).where(
            F.col("_r") <= CAP_K
        ).drop("_r")
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
    )


def main() -> None:
    from pyspark.sql import functions as F

    from sparkml_som_spark.session import get_spark

    spark = get_spark("pair-fanout-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict[str, float]] = {}
    for hot in HOTS:
        df = baskets(spark, hot).cache()
        df.count()
        row: dict[str, float] = {}
        for cap in (False, True):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                n_pairs = pair_build(df, cap).count()
                best = min(best, time.time() - t0)
            row["capped_s" if cap else "uncapped_s"] = round(best, 3)
            row["capped_pairs" if cap else "uncapped_pairs"] = n_pairs
        out[f"hot={hot}"] = row
        df.unpersist()

    # correctness of the cap: pairs NOT involving the hot group are
    # bit-identical with and without the cap (every base group is
    # under K, so the cap may only touch the hot group's pairs)
    df = baskets(spark, HOTS[-1]).cache()
    df.count()
    nonhot = lambda pairs: pairs.where(  # noqa: E731
        ~F.col("u").between(10_000, 10_000 + HOTS[-1])
        & ~F.col("v").between(10_000, 10_000 + HOTS[-1])
    )
    diff = (
        nonhot(pair_build(df, False)).exceptAll(nonhot(pair_build(df, True))).count()
        + nonhot(pair_build(df, True)).exceptAll(nonhot(pair_build(df, False))).count()
    )
    df.unpersist()
    out["nonhot_pairset_diff"] = diff
    assert diff == 0, "cap changed pairs outside the hot group"

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
