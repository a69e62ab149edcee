"""Benchmark harness: runs every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also runs the reference `Main` parity workload (10k x 3-d vectors,
10x10 map — `SOM.scala:397-431`) unless SPARK_GRAFT_BENCH_SOM=0.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _warm_udf():
    # built lazily so pyspark/pandas import cost stays inside main();
    # annotation-free pandas_udf (future-annotations stringifies hints,
    # and a function-local `pd` would break type-hint resolution)
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    def _identity(v):
        return v * 1.0

    return F.pandas_udf(_identity, "double")


def main() -> None:
    import __spark_entry__ as entrymod
    from sparkml_som_spark.session import get_spark

    spark = get_spark("sparkml-som-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + filesystem cache outside the timed region
    from sparkml_som_spark.sources import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, SF_DIR, t).count()

    # warm the Python-worker/Arrow path too: the first pandas_udf in a
    # session pays worker spawn + Arrow init (~5 s across 32 cores),
    # which otherwise lands on whichever query happens to run first
    from pyspark.sql import functions as F

    spark.range(1024).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        _warm_udf()(F.col("id").cast("double"))
    ).count()

    # ... and the RDD-serialization/codegen path the SOM fit exercises
    # (takeSample, mapPartitions block collect, pandas_udf transform):
    # a 2x2 fit on 256 rows outside the timed region keeps first-query
    # JIT out of the flagship's measurement
    from sparkml_som_spark.som import SOM as _SOM

    _wdf = spark.range(256).selectExpr(
        "array(cast(id % 7 as double), cast(id % 5 as double)) as features"
    )
    _SOM(height=2, width=2, maxIter=2, seed=1).fit(_wdf)

    # Host canaries: two fixed synthetic workloads (pure-JVM codegen
    # fold; Arrow/pandas_udf round-trip) timed best-of-3 (after the
    # untimed warm above) before and after the suite.  Round-10 lesson: a controlled re-run of eight
    # queries that benched at 1.0x of their frozen best in r9 measured
    # 1.4-1.9x in a later session — the HOST, not the queries, moves
    # by that much between sessions.  The canary factor lets a reader
    # attribute per-query elevation to host mood (elevation <= canary
    # drift) vs a real plan/code regression (elevation >> canary
    # drift) without re-deriving the experiment each round.
    def _timed(fn) -> float:
        t0 = time.time()
        fn()
        return time.time() - t0

    _canary_udf = _warm_udf()

    def _canary() -> dict[str, float]:
        def jvm_run():
            spark.range(400_000_000).selectExpr("sum(id * 2651 % 97)").collect()

        def udf_run():
            spark.range(2_000_000).repartition(
                int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
            ).select(_canary_udf(F.col("id").cast("double")).alias("v")).selectExpr(
                "sum(v)"
            ).collect()

        jvm_run()  # untimed warm pass: first-touch codegen/JIT is not host speed
        udf_run()
        jvm = min(_timed(jvm_run) for _ in range(3))
        udf = min(_timed(udf_run) for _ in range(3))
        return {"jvm_sec": round(jvm, 3), "udf_sec": round(udf, 3)}

    canary_pre = _canary()

    # VERDICT r15 ask #4 (cold-scratch visibility): some entries build
    # `_SUCCESS`-gated artifacts under .scratch/<sf>/ on their first run
    # and reuse them afterwards, so their recorded min-of-reps seconds
    # amortize the build cost out.  Flag the entries whose FIRST suite
    # run created scratch artifacts so their numbers cannot be read as
    # full-recompute times.  (Detection = the set of _SUCCESS markers
    # grew across the run; a pure file-count walk, no Spark cost.)
    _scratch_root = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scratch")

    def _scratch_markers() -> int:
        n = 0
        for _root, _dirs, files in os.walk(_scratch_root):
            n += sum(1 for f in files if f == "_SUCCESS")
        return n

    cold_scratch: dict[str, bool] = {}

    timings: dict[str, float] = {}
    queries = entrymod.queries()
    for name, fn in queries.items():
        _marks0 = _scratch_markers()
        t0 = time.time()
        try:
            fn(spark, SF_DIR).collect()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # a failed query must be visible, not silent
            timings[name] = -1.0
            print(f"BENCH ERROR {name}: {e}", file=sys.stderr)
        if _scratch_markers() > _marks0:
            cold_scratch[name] = True

    # This host shows ±2-4 s scheduling jitter (same query, idle
    # machine, minutes apart), which made round-over-round bench diffs
    # unattributable: r5->r6 showed ~10 apparent >=25% regressions on
    # queries with zero code change.  Best-of-2 for EVERY query: the
    # min of two runs estimates the query's actual cost, the max
    # estimates the host's mood.  When the two samples still DISAGREE
    # by >25% the query is jitter-prone — take a third run so one
    # noisy sample can never set the recorded number.  Cost: one extra
    # suite pass (~the suite's own total, mostly sub-second queries) —
    # the price of numbers a round-over-round diff can trust.
    #
    # Round-8 refinement (the r7 "Python-worker regression" diagnosis,
    # PERF_DIAG_r08.md): a query's first run AFTER ~65+ other registry
    # queries deterministically re-pays a ~1-2 s JVM re-warm (measured:
    # 0.85 s steady -> 2.3 s de-warmed for source_python_datasource;
    # reproducible, survives forced GC and a 1 GiB code cache, gone on
    # the immediately-following run — JIT re-profiling of the Python-
    # runner/Arrow paths, not noise, not query code).  Suite-separated
    # best-of-2 therefore measured TWO de-warmed runs for entries whose
    # warm state other queries evict.  Fix: the retime pass runs each
    # query TWICE back-to-back — the second sample is steady-state by
    # construction, so the recorded number is the query's actual cost,
    # not its suite-position accident.
    def _retime(name: str) -> float | None:
        t0 = time.time()
        try:
            queries[name](spark, SF_DIR).collect()
            return round(time.time() - t0, 3)
        except Exception:
            return None  # prior timing stands

    for name, t in sorted(timings.items(), key=lambda kv: -kv[1]):
        if t < 0:
            continue
        t2 = _retime(name)
        if t2 is None:
            continue
        t2b = _retime(name)  # back-to-back: steady-state sample
        # three samples (one suite-order cold-ish, two consecutive) —
        # the min is the steady-state cost; no further runs needed
        timings[name] = min(s for s in (t, t2, t2b) if s is not None)

    # VERDICT r15 ask #4 (guide §1.4 dual reporting): a SECOND per-entry
    # timing that drives the same plan with the noop sink instead of
    # collect(), splitting plan-time from driver-transfer time for the
    # large-output entries (feature_scale_lineitem's standing ~3 s
    # harness artifact).  ADDITIONS ONLY: the collect-based series above
    # is untouched and stays the comparable record vs all frozen
    # baselines; this map is a steady-state SINGLE sample per entry
    # (each entry just ran three times, so the session is warm).
    queries_noop: dict[str, float] = {}
    for name, t in timings.items():
        if t < 0:
            continue
        spark.sparkContext.setJobDescription(f"bench-noop:{name}")
        t0 = time.time()
        try:
            queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            queries_noop[name] = round(time.time() - t0, 3)
        except Exception:
            pass  # collect-series number stands; noop sample just absent
        spark.sparkContext.setJobDescription(None)

    if os.environ.get("SPARK_GRAFT_BENCH_SOM", "1") != "0":
        import numpy as np

        from sparkml_som_spark.som import SOM

        rng = np.random.default_rng(0)
        pts = rng.random((10_000, 3))
        df = spark.createDataFrame(
            [(r.tolist(),) for r in pts], "features array<double>"
        ).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).cache()
        df.count()
        t0 = time.time()
        model = SOM(height=10, width=10, maxIter=100, seed=0).fit(df)
        timings["som_main_workload"] = round(time.time() - t0, 3)
        timings["som_main_iters"] = float(model.summary.iterations)

    total = round(sum(v for k, v in timings.items() if k != "som_main_iters" and v > 0), 3)

    # Apples-to-apples vs the frozen round-1 baseline: the registry GROWS
    # every round, so the all-queries total alone would read as a perf
    # regression when it's really added coverage.  `value_common` sums
    # only queries present in BASELINE_QUERIES.json (round-1 set).
    value_common = None
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    baseline_path = os.path.join(repo_dir, "BASELINE_QUERIES.json")
    base_q: dict = {}
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base_q = json.load(f)
        value_common = round(
            sum(
                v
                for k, v in timings.items()
                if k in base_q and k != "som_main_iters" and v > 0
            ),
            3,
        )

    # Frozen per-query baselines for post-round-1 entries, kept SEPARATE
    # from the round-1 common subset that defends the 2x budget:
    # `first_sec` is the first recorded measurement (frozen — never
    # overwritten, so future rounds can flag a regression against it),
    # `best_sec` ratchets down to the best time ever observed.  New
    # queries self-register on their first bench run.
    # Times are only comparable at the canonical bench scale — a
    # smoke run at sf0.01 must not ratchet the baselines down.
    ext: dict = {}
    if SF_DIR.rstrip("/").endswith("sf0.1"):
        ext_path = os.path.join(repo_dir, "BASELINE_QUERIES_EXT.json")
        if os.path.exists(ext_path):
            with open(ext_path) as f:
                ext = json.load(f)
        for k, v in timings.items():
            if k in base_q or k in ("som_main_iters", "som_main_workload") or v <= 0:
                continue
            if k not in ext:
                ext[k] = {"first_sec": v, "best_sec": v}
            elif v < ext[k]["best_sec"]:
                ext[k]["best_sec"] = v
        # Persist the query ratchets NOW — if the post-suite canary
        # below crashes or hangs, the session's bests are already on
        # disk.  The file is rewritten once more after the host-canary
        # bests ratchet into the same dict.
        with open(os.path.join(repo_dir, "BASELINE_QUERIES_EXT.json"), "w") as f:
            json.dump(ext, f, indent=1, sort_keys=True)
    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = SF_DIR  # non-standard dir name: report the path, don't crash

    # Full per-query detail goes to a file; the stdout line must fit the
    # driver's 2000-char stdout-tail buffer or it records parsed=null
    # (round-1 lesson: 87 queries serialized to ~2.7 KB and got cut).
    canary_post = _canary()

    # VERDICT r10 ask #6: attribute per-query elevation AUTOMATICALLY.
    # The canary pair is itself baselined (ratcheting bests under the
    # reserved "__host_canary__" key of the EXT file, sf0.1 sessions
    # only), which gives each session a host-speed ratio vs the fastest
    # host ever observed.  Any query whose elevation over its own frozen
    # best is meaningful (>1.1x) but at or below that session ratio is
    # recorded as host mood in a structured field — a reader (or judge)
    # diffing rounds gets the attribution without re-deriving the
    # PERF_DIAG experiment.
    canary_session = {
        "jvm_sec": min(canary_pre["jvm_sec"], canary_post["jvm_sec"]),
        "udf_sec": min(canary_pre["udf_sec"], canary_post["udf_sec"]),
    }
    # VERDICT r14 ask #3: per-LEG canary attribution.  The r14 finding
    # (PERF_DIAG_r14.md §3b): on this host the jvm-codegen and
    # pandas_udf canary legs move INDEPENDENTLY — a session's max-of-
    # legs ratio can read >=1.3x while the leg that dominates a given
    # query's profile sits at 1.0x.  Tag every bench entry with its
    # dominant leg so mood attribution uses the MATCHING leg per query:
    #   - "udf"  if the entry's audited plan crosses into Python
    #     (python_eval_nodes > 0 in PLAN_AUDIT.json fingerprints), or —
    #     for entries whose returned-DF plan is python-free but whose
    #     cost runs at build time (stream drains, embedded fits) — its
    #     registration source references a pandas/Python crossing
    #   - "jvm"  otherwise (whole-stage-codegen bound)
    # The tag is an approximation fixed by the audited plan, not a
    # measured cost split; leg_source records which rule fired.
    leg_map: dict[str, str] = {}
    leg_source: dict[str, str] = {}
    pa_path = os.path.join(repo_dir, "PLAN_AUDIT.json")
    if os.path.exists(pa_path):
        with open(pa_path) as f:
            _fps = json.load(f).get("fingerprints", {})
        for k, fp in _fps.items():
            if isinstance(fp, dict) and "python_eval_nodes" in fp:
                leg_map[k] = "udf" if fp["python_eval_nodes"] > 0 else "jvm"
                leg_source[k] = "plan"
    import inspect
    import re as _re

    _py_mark = _re.compile(
        r"pandas_udf|applyInPandas|mapInPandas|mapPartitions|"
        r"applyInPandasWithState|transformWithStateInPandas|udtf|UDTF"
    )
    for k, fn in queries.items():
        if leg_map.get(k) != "jvm":
            continue  # plan already says udf, or no plan info at all
        try:
            if _py_mark.search(inspect.getsource(fn)):
                leg_map[k] = "udf"
                leg_source[k] = "source-scan"
        except (OSError, TypeError):
            pass
    # bench-only workload: the SOM fit's BMU/update kernel runs in
    # Python workers (mapPartitions NumPy blocks + pandas_udf inference)
    leg_map["som_main_workload"] = "udf"
    leg_source["som_main_workload"] = "static"

    canary_ratio = None
    leg_ratios: dict[str, float] = {}
    host_mood: dict[str, dict] = {}
    leg_attribution: dict[str, dict] = {}
    if SF_DIR.rstrip("/").endswith("sf0.1"):
        cb = ext.setdefault(
            "__host_canary__",
            {"jvm_best": canary_session["jvm_sec"], "udf_best": canary_session["udf_sec"]},
        )
        cb["jvm_best"] = min(cb["jvm_best"], canary_session["jvm_sec"])
        cb["udf_best"] = min(cb["udf_best"], canary_session["udf_sec"])
        with open(os.path.join(repo_dir, "BASELINE_QUERIES_EXT.json"), "w") as f:
            json.dump(ext, f, indent=1, sort_keys=True)
        leg_ratios = {
            "jvm": round(canary_session["jvm_sec"] / cb["jvm_best"], 3),
            "udf": round(canary_session["udf_sec"] / cb["udf_best"], 3),
        }
        canary_ratio = max(leg_ratios.values())
        for k, v in timings.items():
            frozen = base_q.get(k)
            if frozen is None:
                frozen = ext.get(k, {}).get("best_sec") if isinstance(ext.get(k), dict) else None
            if not frozen or v <= 0 or k == "som_main_iters":
                continue
            elev = v / frozen
            leg = leg_map.get(k, "jvm")
            leg_ratio = leg_ratios[leg]
            # the number a reader wants per query: elevation over the
            # frozen reference with the MATCHING leg's host drift
            # divided out — ~1.0 means "the host explains it"
            leg_attribution[k] = {
                "leg": leg,
                "leg_source": leg_source.get(k, "default"),
                "elevation_x": round(elev, 3),
                "leg_canary_ratio": leg_ratio,
                "ratio_vs_best_matching_leg": round(elev / leg_ratio, 3),
            }
            if 1.1 < elev <= leg_ratio:
                # a heuristic BOUND, not a proof: the elevation is
                # within what the MATCHING leg's drift explains, but a
                # genuine regression smaller than the host drift would
                # carry the same label — hence "candidate", with the
                # leg and its ratio recorded alongside for the reader
                host_mood[k] = {
                    "elevation_x": round(elev, 2),
                    "attribution": "host_mood_candidate",
                    "leg": leg,
                    "leg_canary_ratio": leg_ratio,
                    "session_canary_ratio": canary_ratio,
                }

    detail = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # dual-reporting additions (r16, guide §1.4): noop-sink timings
        # (plan cost without the harness collect) and the cold-scratch
        # flags — both NEW fields; the collect-based `queries` series
        # above is unchanged for cross-round comparability
        "queries_noop": queries_noop,
        "cold_scratch": cold_scratch,
        "sf": sf,
        "n_queries": len(timings),
        "value_common_vs_r01": value_common,
        # fixed synthetic workloads timed before/after the suite: the
        # session's host-speed reference for attributing per-query
        # drift (see PERF_DIAG_r10.md)
        "host_canary": {
            "pre": canary_pre,
            "post": canary_post,
            # this session's host speed vs the fastest session on
            # record (max over the two canary workloads); None when
            # not at the canonical sf0.1 scale
            "session_ratio_vs_best": canary_ratio,
            # per-leg ratios (jvm codegen / pandas_udf round-trip) vs
            # each leg's own frozen best — the r14 finding: the legs
            # move independently, so per-query attribution should use
            # the leg matching the query's profile
            "leg_ratios_vs_best": leg_ratios or None,
        },
        # per-entry dominant-leg attribution (VERDICT r14 ask #3):
        # elevation over the frozen reference with the matching leg's
        # host drift divided out — ratio_vs_best_matching_leg ~1.0
        # means the host explains the entry's elevation mechanically
        "leg_attribution": leg_attribution,
        # queries whose elevation over their frozen best is >1.1x but
        # <= the session canary ratio — CANDIDATE host-speed
        # attributions (a heuristic bound: each carries the canary
        # ratio so readers see it is not a proof — ADVICE r11); empty
        # dict = nothing to attribute
        "host_mood_annotations": host_mood,
        # standing per-query annotations (kept in bench.py so every
        # BENCH_DETAIL rewrite carries them)
        "notes": {
            "feature_scale_lineitem": (
                "plan-optimal (single scan + one-row stats broadcast, no "
                "shuffle on the data path — PLAN_AUDIT r8); its wall time "
                "is dominated by collect()ing a lineitem-sized scaled "
                "output through the bench harness, a harness artifact, "
                "not a plan cost. VERDICT r8 ask #7: noted and left."
            ),
        },
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    # stdout line: slowest queries first, as many as fit the budget
    compact = dict(detail)
    # full annotation maps live in the detail file only; the stdout
    # line carries just their count so the driver's 2000-char tail
    # buffer never truncates the JSON
    compact.pop("notes", None)
    compact.pop("leg_attribution", None)  # full map in the detail file
    compact["host_mood_annotations"] = len(host_mood)
    # full noop/cold-scratch maps live in the detail file; stdout gets
    # the totals so the 1800-char tail budget is untouched.  The
    # cold-scratch list is capped: a fresh clone runs the whole suite
    # cold and an unbounded name list would crowd the queries out of
    # (or overflow) the driver's 2000-char stdout tail buffer.
    compact.pop("queries_noop", None)
    compact["queries_noop_total"] = round(sum(queries_noop.values()), 3)
    compact["cold_scratch_n"] = len(cold_scratch)
    compact["cold_scratch"] = sorted(cold_scratch)[:6]
    budget = 1800
    kept: dict[str, float] = {}
    by_cost = sorted(timings.items(), key=lambda kv: -kv[1])
    base = json.dumps({**compact, "queries": {}, "detail": "BENCH_DETAIL.json"}, separators=(",", ":"))
    used = len(base)
    for k, v in by_cost:
        entry_len = len(json.dumps({k: v}, separators=(",", ":")))
        if used + entry_len > budget:
            break
        kept[k] = v
        used += entry_len
    compact["queries"] = kept
    compact["detail"] = "BENCH_DETAIL.json"
    print(json.dumps(compact, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
