"""Hot-key skew probes for the inverted-index dedup and the
sessionization window — the two remaining scale hazards the round-6
rank probe did not cover.

Probe A — `shingle_pairs_with_jaccard` with one shingle at ~90%
document frequency (a stop-phrase far worse than any real corpus).
Without the `_NGRAM_MAX_DF` cap the candidate join would fan out
quadratically on that key ((0.9N)^2/2 pairs: 3.6M at 1x, 3.6e10 at
100x).  The probe verifies the cap holds the fan-out AND that recall
survives: planted exact-duplicate pairs (rare shingles, df=2) must all
be found with Jaccard 1.0 at both sizes, while the candidate-pair
count stays LINEAR (exactly the planted pairs — the hot shingle
contributes none).

Probe B — gap sessionization (`lag` + running sum over
`Window.partitionBy(user_id)`) where ONE user owns ~90% of all events.
The hot user's rows all flow through a single window task; the probe
measures whether that task is a wall-clock cliff at 100x and verifies
the session contract (row conservation; an hourly timestamp jump every
1000 ids bounds any session's size).

Both probes build data with id arithmetic only (no RNG — reproducible),
time 1x (60k rows / 3k docs) vs 100x, and print one JSON line; the
measured rows go into SCALE.md.

Usage: PYTHONPATH=/root/repo python tools/dedup_session_skew_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS_SMALL = 3_000
DOCS_BIG = 300_000  # 100x
EV_SMALL = 60_000
EV_BIG = 6_000_000  # 100x


def skewed_docs(spark, n: int):
    """~89% of docs share ONE 3-shingle ('hot alpha beta'); per hundred
    ids, ids 98+99 are a planted exact-duplicate pair on rare shingles;
    the rest are all-unique tokens."""
    from pyspark.sql import functions as F

    i = F.col("id")
    k = (i / 100).cast("long")  # dup-pair family key
    return spark.range(n).select(
        i.alias("doc_id"),
        F.when(
            i % 100 >= 98,
            F.concat_ws(
                " ", F.lit("dup"), k.cast("string"), F.lit("da"),
                k.cast("string"), F.lit("db"), k.cast("string"),
            ),
        )
        .when(
            i % 100 < 89,
            F.concat_ws(
                " ", F.concat(F.lit("u"), i), F.concat(F.lit("w"), i),
                F.lit("hot"), F.lit("alpha"), F.lit("beta"),
            ),
        )
        .otherwise(
            F.concat_ws(
                " ", F.concat(F.lit("u"), i), F.concat(F.lit("w"), i),
                F.concat(F.lit("x"), i), F.concat(F.lit("y"), i),
                F.concat(F.lit("z"), i),
            )
        )
        .alias("text"),
    )


def probe_dedup(spark, n: int) -> dict:
    from pyspark.sql import functions as F

    from sparkml_som_spark.operators.dedup import _NGRAM_MAX_DF, shingle_pairs_with_jaccard

    docs = skewed_docs(spark, n)
    docs.count()  # warm the input outside the timed region
    held: list = []
    t0 = time.time()
    pairs = shingle_pairs_with_jaccard(docs, n=3, max_df=_NGRAM_MAX_DF, cleanup=held)
    agg = pairs.agg(
        F.count("*").alias("n_pairs"),
        F.count_if(F.col("jaccard_raw") >= 0.999).alias("n_exact"),
        F.min("jaccard_raw").alias("mn_j"),
    ).collect()[0]
    wall = time.time() - t0
    for h in held:
        h.unpersist()
    # the ONLY candidate pairs are the planted duplicates: one pair per
    # hundred-block, each sharing only df=2 shingles, Jaccard exactly 1.
    # The ~89%-hot shingle is capped out of candidate generation, so the
    # pair count is LINEAR in the corpus, not quadratic in the hot DF.
    expected = n // 100
    assert agg["n_pairs"] == expected, (agg["n_pairs"], expected)
    assert agg["n_exact"] == expected, (agg["n_exact"], expected)
    assert agg["mn_j"] >= 0.999
    return {"docs": n, "wall_sec": round(wall, 3), "candidate_pairs": agg["n_pairs"]}


def skewed_events(spark, n: int, uniform: bool = False):
    """~90% of events belong to user 777 (or spread over 6000 users
    when `uniform` — the no-skew control); 2-minute spacing with an
    hourly jump every 1000 ids (deterministic session breaks)."""
    from pyspark.sql import functions as F

    i = F.col("id")
    secs = i * 120 + (i / 1000).cast("long") * 3600
    # uniform control: contiguous 1000-event blocks per user — same
    # per-user spacing and session sizes as the hot user, spread over
    # n/1000 users, so the work profile differs ONLY in the skew
    user = (
        (i / 1000).cast("long").alias("user_id")
        if uniform
        else F.when(i % 10 < 9, F.lit(777)).otherwise(1000 + i % 97).alias("user_id")
    )
    return spark.range(n).select(
        i.alias("event_id"),
        user,
        F.timestamp_seconds(F.lit(1_700_000_000) + secs).alias("ts"),
    )


def probe_session(spark, n: int, two_phase: bool, uniform: bool = False) -> dict:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = skewed_events(spark, n, uniform=uniform)
    ev.count()  # warm the input outside the timed region
    t0 = time.time()
    if two_phase:
        from sparkml_som_spark.operators.relational3 import two_phase_sessionize

        sess = two_phase_sessionize(ev)
    else:
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        run = w.rowsBetween(Window.unboundedPreceding, 0)
        prev = F.lag("ts").over(w)
        new_sess = F.when(
            prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")), 1
        ).otherwise(0)
        sess = (
            ev.withColumn("sess_id", F.sum(new_sess).over(run))
            .groupBy("user_id", "sess_id")
            .agg(F.count("*").alias("n_events"))
        )
    agg = sess.agg(
        F.sum("n_events").alias("total"),
        F.max("n_events").alias("mx"),
        F.count("*").alias("n_sessions"),
    ).collect()[0]
    wall = time.time() - t0
    # conservation: every event lands in exactly one session; the hourly
    # jump every 1000 ids caps hot-user sessions at 1000 events (its
    # events are ~2.2 min apart, under the 30-min gap); uniform-control
    # users are >2 min apart each, so the cap holds there trivially too
    assert agg["total"] == n
    assert agg["mx"] <= 1000, agg["mx"]
    return {
        "rows": n,
        "wall_sec": round(wall, 3),
        "n_sessions": agg["n_sessions"],
        "max_session_events": agg["mx"],
    }


def session_equivalence(spark, n: int) -> None:
    """Two-phase output must equal the single-window sessionizer on the
    skewed data, row for row (session ids, sizes, membership)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparkml_som_spark.operators.relational3 import two_phase_sessionize

    ev = skewed_events(spark, n)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    want = (
        ev.withColumn("sess_id", F.sum(new_sess).over(run).cast("long"))
        .groupBy("user_id", "sess_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
                "dur_s"
            ),
        )
    )
    got = two_phase_sessionize(ev)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def main() -> None:
    from sparkml_som_spark.session import get_spark

    spark = get_spark("dedup-session-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    d_small = probe_dedup(spark, DOCS_SMALL)
    d_big = probe_dedup(spark, DOCS_BIG)
    session_equivalence(spark, EV_SMALL)
    s_small = probe_session(spark, EV_SMALL, two_phase=False)
    s_big = probe_session(spark, EV_BIG, two_phase=False)
    tp_small = probe_session(spark, EV_SMALL, two_phase=True)
    tp_big = probe_session(spark, EV_BIG, two_phase=True)
    # no-skew control at 100x: what the job costs when no user is hot —
    # the yardstick for "did the hot user add wall-clock, and does the
    # two-phase form hold the skewed cost at the uniform cost"
    u_big = probe_session(spark, EV_BIG, two_phase=False, uniform=True)
    print(
        json.dumps(
            {
                "dedup_hot_shingle": {
                    "small": d_small,
                    "big_100x": d_big,
                    "wall_ratio_100x": round(d_big["wall_sec"] / d_small["wall_sec"], 2),
                },
                "session_hot_user_single_window": {
                    "small": s_small,
                    "big_100x": s_big,
                    "wall_ratio_100x": round(s_big["wall_sec"] / s_small["wall_sec"], 2),
                    "skew_cost_vs_uniform_100x": round(
                        s_big["wall_sec"] / u_big["wall_sec"], 2
                    ),
                },
                "session_hot_user_two_phase": {
                    "small": tp_small,
                    "big_100x": tp_big,
                    "wall_ratio_100x": round(
                        tp_big["wall_sec"] / tp_small["wall_sec"], 2
                    ),
                    "skew_cost_vs_uniform_100x": round(
                        tp_big["wall_sec"] / u_big["wall_sec"], 2
                    ),
                    "equivalence_vs_single_window": "exact at 60k rows",
                },
                "session_uniform_control_100x": u_big,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
