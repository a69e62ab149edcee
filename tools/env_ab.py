"""Interleaved in-session A/B of env-flag-gated code paths (r16 cont.).

The r16 continuation gates each candidate rewrite behind an env flag
read at CALL time (SPARK_GRAFT_RANK_LEGACY, SPARK_GRAFT_UDTF_PICKLE,
...), so one session can flip between the old and new path per rep —
the only trustworthy protocol on this host (cross-session drift is
±20-40%, PERF_DIAG_r14/r15), with order alternation per rep to cancel
the in-session warming trend (OPTIMIZATION_r15.md §1).

Usage:
  PYTHONPATH=/root/repo python tools/env_ab.py --flag SPARK_GRAFT_RANK_LEGACY \
      [--reps 5] name [name ...]

Variant "legacy" runs with FLAG=1, variant "new" with the flag unset.
Rows are canonicalized and asserted equal across variants in-session.
Prints one JSON line per entry with min/all seconds per variant and a
pairwise better-count for the new path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--flag", required=True)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from sparkml_som_spark.session import get_spark

    spark = get_spark("env-ab")
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

    def set_variant(lab: str) -> None:
        if lab == "legacy":
            os.environ[args.flag] = "1"
        else:
            os.environ.pop(args.flag, None)

    def canon(rows) -> list[str]:
        return sorted(repr(tuple(r)) for r in rows)

    for name in args.names:
        fn = queries[name]
        set_variant("legacy")
        spark.sparkContext.setJobDescription(f"envab:{name}:warm")
        base_rows = canon(fn(spark, SF_DIR).collect())
        rec = {"name": name, "flag": args.flag}
        labels = ["legacy", "new"]
        times: dict[str, list[float]] = {v: [] for v in labels}
        for rep in range(args.reps):
            for lab in labels if rep % 2 == 0 else list(reversed(labels)):
                set_variant(lab)
                spark.sparkContext.setJobDescription(f"envab:{name}:{lab}")
                t0 = time.time()
                rows = fn(spark, SF_DIR).collect()
                times[lab].append(round(time.time() - t0, 3))
                if lab == "new" and canon(rows) != base_rows:
                    rec["MISMATCH"] = True
        set_variant("new")
        rec.update({lab: {"min": min(ts), "all": ts} for lab, ts in times.items()})
        rec["new_better_pairwise"] = sum(
            1 for a, b in zip(times["legacy"], times["new"]) if b < a
        )
        spark.sparkContext.setJobDescription(None)
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
