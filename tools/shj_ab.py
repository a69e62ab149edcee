"""Interleaved in-session A/B of shuffled-hash-join configs (r15 cont.).

Guide §3.1: Spark prefers sort-merge; `preferSortMergeJoin=false` lets the
planner pick SHJ statically, and AQE can rewrite SMJ->SHJ at runtime when
every post-shuffle partition is under `maxShuffledHashJoinLocalMapThreshold`.
Both are runtime SQL confs, so this runs an ABAB(AB) loop in ONE session
(the only trustworthy protocol on this host — cross-session drift is
±20-40%, PERF_DIAG_r14/r15): for each entry, alternate variants, min-of-N
per variant, rows asserted equal across variants in-session.

Usage:
  PYTHONPATH=/root/repo python tools/shj_ab.py --variant aqe|static|both \
      [--reps 4] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BASE = {
    "spark.sql.join.preferSortMergeJoin": "true",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0",
}
VARIANTS = {
    # AQE runtime SMJ->SHJ rewrite: static plans unchanged, fires only when
    # every post-shuffle partition fits the local-map threshold (128 MB).
    "aqe": {
        "spark.sql.join.preferSortMergeJoin": "true",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": str(128 * 1024 * 1024),
    },
    # Static planner choice of SHJ when its size conditions are met.
    "static": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0",
    },
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--variant", default="aqe", choices=["aqe", "static", "both"])
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from sparkml_som_spark.session import get_spark

    spark = get_spark("shj-ab")
    spark.sparkContext.setLogLevel("ERROR")
    from sparkml_som_spark.sources import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, SF_DIR, t).count()
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    def _identity(v):
        return v * 1.0

    _warm = F.pandas_udf(_identity, "double")
    spark.range(1024).repartition(32).select(_warm(F.col("id").cast("double"))).count()

    queries = entrymod.queries()
    variants = ["aqe", "static"] if args.variant == "both" else [args.variant]

    def set_conf(conf: dict) -> None:
        for k, v in conf.items():
            spark.conf.set(k, v)

    def canon(rows) -> list[str]:
        return sorted(repr(tuple(r)) for r in rows)

    for name in args.names:
        fn = queries[name]
        # one untimed warm pass under base conf
        set_conf(BASE)
        spark.sparkContext.setJobDescription(f"shjab:{name}:warm")
        base_rows = canon(fn(spark, SF_DIR).collect())
        rec = {"name": name}
        labels = ["base"] + variants
        times: dict[str, list[float]] = {v: [] for v in labels}
        for rep in range(args.reps):
            # alternate the variant order per rep: with a fixed order, a
            # monotone in-session warming trend systematically favors the
            # later variant (measured: entries with IDENTICAL final plans
            # read -10% for the last-run variant) — reversing the order
            # every rep cancels the bias
            for lab in labels if rep % 2 == 0 else list(reversed(labels)):
                set_conf(BASE if lab == "base" else VARIANTS[lab])
                spark.sparkContext.setJobDescription(f"shjab:{name}:{lab}")
                t0 = time.time()
                rows = fn(spark, SF_DIR).collect()
                times[lab].append(round(time.time() - t0, 3))
                if lab != "base" and canon(rows) != base_rows:
                    rec["MISMATCH"] = lab
        set_conf(BASE)
        rec.update({lab: {"min": min(ts), "all": ts} for lab, ts in times.items()})
        spark.sparkContext.setJobDescription(None)
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
