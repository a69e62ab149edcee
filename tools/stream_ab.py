"""Interleaved A/B of the r15 foreachBatch job-count reduction.

The legacy per-epoch path (epoch distinct-collect + sequential state
writes + probe checkpoint-then-overwrite) is kept behind the
SPARK_GRAFT_STREAM_R15_LEGACY env flag, which the entry reads at call
time on the driver — so ONE session can alternate legacy/new per rep
(the only trustworthy protocol on this host) and assert the returned
rows equal across variants.

Usage:
  PYTHONPATH=/root/repo python tools/stream_ab.py [--reps 4] name [name ...]
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
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument(
        "--env-var",
        default="SPARK_GRAFT_STREAM_R15_LEGACY",
        help="flag env selecting the OLD variant when =1 "
        "(r16: SPARK_GRAFT_STREAM_R16_PREV for r15-vs-fused)",
    )
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from sparkml_som_spark.session import get_spark

    spark = get_spark("stream-ab")
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

    def canon(rows) -> list[str]:
        return sorted(repr(tuple(r)) for r in rows)

    for name in args.names:
        fn = queries[name]
        os.environ[args.env_var] = "1"
        spark.sparkContext.setJobDescription(f"streamab:{name}:warm")
        base_rows = canon(fn(spark, SF_DIR).collect())
        rec: dict = {"name": name}
        times: dict[str, list[float]] = {"legacy": [], "new": []}
        windows: dict[str, list[list[int]]] = {"legacy": [], "new": []}
        for rep in range(args.reps):
            # alternate variant order per rep so a monotone in-session
            # warming trend cannot systematically favor the later variant
            order = (("legacy", "1"), ("new", "0"))
            for lab, flag in order if rep % 2 == 0 else tuple(reversed(order)):
                os.environ[args.env_var] = flag
                spark.sparkContext.setJobDescription(f"streamab:{name}:{lab}")
                t0 = time.time()
                rows = fn(spark, SF_DIR).collect()
                t1 = time.time()
                times[lab].append(round(t1 - t0, 3))
                # absolute ms window so an event log can attribute job
                # counts per variant (streaming threads override the
                # job description, so labels alone cannot)
                windows[lab].append([int(t0 * 1000), int(t1 * 1000)])
                if canon(rows) != base_rows:
                    rec["MISMATCH"] = lab
        os.environ.pop(args.env_var, None)
        rec.update(
            {
                lab: {"min": min(ts), "all": ts, "windows_ms": windows[lab]}
                for lab, ts in times.items()
            }
        )
        spark.sparkContext.setJobDescription(None)
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
