"""Matching-leg re-measure (VERDICT r14 ask #2): time named bench
entries standalone in a window where the leg that dominates their
profile is FAST, instead of trusting a whole-suite session whose
max-of-legs canary conflates the two host subsystems.

The r14 finding (PERF_DIAG_r14.md §3b): on this host the jvm-codegen
and pandas_udf canary legs move independently — each still transiently
reaches its all-time best, but rarely in the same window.  So an entry
whose raw bench ratio crossed 2x of its frozen best on a 1.4x-canary
session needs one clean standalone measurement taken when ITS leg's
canary is near 1.0 before any fix is considered.

Protocol per attempt:
1. start a fresh session, warm tables + Python workers (bench.py's
   warm recipe, untimed);
2. time the requested leg's canary (best-of-3 after an untimed warm
   pass) against its frozen best from BASELINE_QUERIES_EXT.json
   ("__host_canary__");
3. if the leg ratio <= --gate (default 1.15): run each entry untimed
   once (steady state), then record best-of-3 timed runs;
4. else: report the leg ratio and exit 2 (try again later — the
   fast state is transient, minutes-scale).

Usage: PYTHONPATH=/root/repo python tools/leg_fast_remeasure.py \
           [--leg jvm|udf] [--gate 1.15] [--poll N] [--poll-gap SEC] \
           name [name ...]

``--poll N`` keeps the warmed session alive and re-reads the leg
canary up to N more times, SEC (default 45) apart, measuring the
moment the gate passes — the fast state is transient and a cold
session samples only its own ~30 s startup window.
Writes one JSON line; results go into PERF_DIAG_r15.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    argv = sys.argv[1:]
    leg = "jvm"
    gate = 1.15
    if "--leg" in argv:
        i = argv.index("--leg")
        leg = argv[i + 1]
        del argv[i : i + 2]
    if "--gate" in argv:
        i = argv.index("--gate")
        gate = float(argv[i + 1])
        del argv[i : i + 2]
    polls = 0
    poll_gap = 45.0
    if "--poll" in argv:
        i = argv.index("--poll")
        polls = int(argv[i + 1])
        del argv[i : i + 2]
    if "--poll-gap" in argv:
        i = argv.index("--poll-gap")
        poll_gap = float(argv[i + 1])
        del argv[i : i + 2]
    names = argv
    if not names:
        print("usage: leg_fast_remeasure.py [--leg jvm|udf] [--gate X] name...")
        return 1

    with open(os.path.join(REPO, "BASELINE_QUERIES_EXT.json")) as f:
        ext = json.load(f)
    leg_best = ext["__host_canary__"][f"{leg}_best"]

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from sparkml_som_spark.session import get_spark
    from sparkml_som_spark.sources import TABLE_NAMES, load_table

    spark = get_spark("leg-fast-remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLE_NAMES:
        load_table(spark, SF_DIR, t).count()

    # warm the Python-worker/Arrow path (bench.py's recipe) so the udf
    # canary — and any entry with a pandas stage — starts steady
    import pandas as pd  # noqa: F401

    def _identity(v):
        return v * 1.0

    warm_udf = F.pandas_udf(_identity, "double")
    spark.range(1024).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ).select(warm_udf(F.col("id").cast("double"))).count()

    def _timed(fn) -> float:
        t0 = time.time()
        fn()
        return time.time() - t0

    def jvm_run():
        spark.range(400_000_000).selectExpr("sum(id * 2651 % 97)").collect()

    def udf_run():
        spark.range(2_000_000).repartition(
            int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        ).select(warm_udf(F.col("id").cast("double")).alias("v")).selectExpr(
            "sum(v)"
        ).collect()

    canary_fn = jvm_run if leg == "jvm" else udf_run
    canary_fn()  # untimed: first-touch codegen is not host speed

    # --poll N: the fast state is transient (minutes-scale) and a cold
    # session samples a single ~30 s window at startup — eight cold
    # attempts in r15 never landed on it.  Polling keeps ONE warmed
    # session alive and re-reads the leg canary every --poll-gap
    # seconds (idle between reads, so the probe itself does not hold
    # the host busy), measuring the instant the gate passes.  The
    # canary is still read in the same session immediately before the
    # entries, so the measurement protocol is unchanged.
    leg_sec = min(_timed(canary_fn) for _ in range(3))
    leg_ratio = round(leg_sec / leg_best, 3)
    polls_left = polls
    poll_history = [leg_ratio]
    while leg_ratio > gate and polls_left > 0:
        polls_left -= 1
        time.sleep(poll_gap)
        leg_sec = min(_timed(canary_fn) for _ in range(3))
        leg_ratio = round(leg_sec / leg_best, 3)
        poll_history.append(leg_ratio)

    out = {
        "leg": leg,
        "leg_sec": round(leg_sec, 3),
        "leg_best": leg_best,
        "leg_ratio": leg_ratio,
        "gate": gate,
        "polls_used": len(poll_history) - 1,
        "poll_history": poll_history,
        "sf_dir": SF_DIR,
        "entries": {},
    }
    if leg_ratio > gate:
        out["verdict"] = "host not in the fast state for this leg; retry"
        print(json.dumps(out))
        spark.stop()
        return 2

    queries = entrymod.queries()
    for name in names:
        fn = queries[name]
        fn(spark, SF_DIR).collect()  # untimed steady-state warm
        samples = [round(_timed(lambda: fn(spark, SF_DIR).collect()), 3) for _ in range(3)]
        best = min(samples)
        frozen = ext.get(name, {}).get("best_sec")
        out["entries"][name] = {
            "samples": samples,
            "best_of_3": best,
            "frozen_best": frozen,
            "ratio_vs_frozen_best": round(best / frozen, 3) if frozen else None,
        }
    # re-read the leg canary AFTER the entries so a mid-probe mood swing
    # is visible in the record
    leg_sec_post = min(_timed(canary_fn) for _ in range(3))
    out["leg_ratio_post"] = round(leg_sec_post / leg_best, 3)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
