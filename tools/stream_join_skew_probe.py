"""Hot-user skew probe for stream-stream interval joins (VERDICT r7
ask #7) — the last skew family without a measurement: join STATE under
a dominant key.

Structured Streaming's symmetric-hash join keeps ALL buffered rows for
a join key in one state-store partition and linearly scans them per
matching input row, so a user owning ~90% of both sides makes per-key
work QUADRATIC in that user's in-watermark row count.  The first probe
run confirmed this the hard way: hot 60k-rows-per-side ran >20 minutes
while the uniform twin finished in seconds.  This probe therefore:

- measures uniform vs hot at 1x (60k rows/side) and 10x (600k) with a
  HARD CAP (600 s — a capped run records wall=cap, truncated=true; the
  cliff is the finding, not a number to wait on);
- measures the standard MITIGATION: fold event time into the join key
  (bucket = floor(epoch/600 s); a signup in bucket b joins clicks in
  buckets {b, b+1} as a union of two equi-joins).  The hot user's
  state shards across time buckets, so the per-key scan is bounded by
  bucket span instead of the whole watermark horizon.  Inner-join
  semantics for the mitigation variants (state behavior is the
  phenomenon; outer-ness is orthogonal).

Events use id arithmetic only (no RNG); 8 time-range files with
ascending pinned mtimes so AvailableNow replays them as 8 watermark-
advancing micro-batches.

Usage: PYTHONPATH=/root/repo python tools/stream_join_skew_probe.py
Writes one JSON line per variant as it completes; the measured rows go
into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SMALL = 60_000
N_BIG = 600_000  # 10x
N_FILES = 8
CAP_SEC = 600
BUCKET_SEC = 600
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "stream_skew_probe")


def build_side(spark, n: int, hot: bool, etype: str, path: str) -> None:
    """Events with ts = epoch + id seconds; hot: user 0 owns 90%."""
    from pyspark.sql import functions as F

    i = F.col("id")
    user = (
        F.when(i % 10 != 0, F.lit(0)).otherwise((i % 1000) + 1)
        if hot
        else i % 1000
    )
    df = spark.range(n).select(
        i.alias("event_id"),
        user.cast("long").alias("user_id"),
        F.lit(etype).alias("event_type"),
        F.timestamp_seconds(F.lit(1_600_000_000) + i).alias("ts"),
    )
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    per = n // N_FILES
    for f in range(N_FILES):
        lo = i >= f * per
        hi = i < (f + 1) * per if f < N_FILES - 1 else i >= f * per
        part = os.path.join(path, f"_b{f}")
        df.where(lo & hi).coalesce(1).write.mode("overwrite").parquet(part)
        pq = [x for x in os.listdir(part) if x.endswith(".parquet")][0]
        dst = os.path.join(path, f"f{f}.parquet")
        shutil.move(os.path.join(part, pq), dst)
        shutil.rmtree(part)
        os.utime(dst, (1_600_000_000 + f * 100, 1_600_000_000 + f * 100))


def bucketed_inner(s_stream, c_stream, window_sec: int = 2):
    """Inner interval join with event time folded into the equi-key:
    per-key state is bounded by the bucket span, not the watermark
    horizon — the hot-key mitigation for stream-stream joins."""
    from pyspark.sql import functions as F

    s = s_stream.withWatermark("ts", "1 hour").select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("s_ts"),
        F.floor(F.unix_timestamp("ts") / BUCKET_SEC).alias("s_bucket"),
    )
    c = c_stream.withWatermark("ts", "1 hour").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
        F.floor(F.unix_timestamp("ts") / BUCKET_SEC).alias("c_bucket"),
    )
    cond_time = (F.col("c_ts") >= F.col("s_ts")) & (
        F.col("c_ts") < F.col("s_ts") + F.expr(f"INTERVAL {window_sec} SECONDS")
    )
    cols = [
        "user_id",
        "signup_id",
        "click_id",
        (F.unix_timestamp("c_ts") - F.unix_timestamp("s_ts")).alias("secs_after"),
    ]
    j_same = s.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_bucket") == F.col("s_bucket"))
        & cond_time,
    ).select(*cols)
    j_next = s.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_bucket") == F.col("s_bucket") + 1)
        & cond_time,
    ).select(*cols)
    return j_same.unionByName(j_next)


def run(spark, n: int, hot: bool, variant: str) -> dict:
    from pyspark.sql import functions as F

    from sparkml_som_spark.streaming.windows import interval_join_stream_left

    tag = f"{variant}_{'hot' if hot else 'uni'}_{n}"
    s_path = os.path.join(SCRATCH, f"signup_{tag}")
    c_path = os.path.join(SCRATCH, f"click_{tag}")
    build_side(spark, n, hot, "signup", s_path)
    build_side(spark, n, hot, "click", c_path)
    schema = spark.read.parquet(s_path).schema

    def src(p):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(p)
        )

    if variant == "outer":
        # 2 s window: rows are 1 s apart globally, so match fan-out is
        # ~1-2 per signup in both variants — the probe isolates state
        # skew, not a semantic match explosion
        out = interval_join_stream_left(src(s_path), src(c_path), window="2 seconds")
    else:
        out = bucketed_inner(src(s_path), src(c_path))
    sink = f"skewprobe_{tag}"
    t0 = time.time()
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(CAP_SEC)
    wall = time.time() - t0
    max_rows = 0
    max_mem = 0
    for p in q.recentProgress:
        for so in p.get("stateOperators", []):
            max_rows = max(max_rows, so.get("numRowsTotal", 0))
            max_mem = max(max_mem, so.get("memoryUsedBytes", 0))
    n_out = spark.table(sink).count() if finished else -1
    q.stop()
    try:
        spark.catalog.dropTempView(sink)
    except Exception:
        pass
    rec = {
        "variant": variant,
        "rows_per_side": n,
        "hot": hot,
        "wall_sec": round(wall, 1),
        "truncated": not finished,
        "max_state_rows": max_rows,
        "max_state_mb": round(max_mem / 1e6, 1),
        "output_rows": n_out,
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    from sparkml_som_spark.session import get_spark

    spark = get_spark("stream-join-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    res = {}
    res["outer_uniform_1x"] = run(spark, N_SMALL, hot=False, variant="outer")
    res["outer_hot_1x"] = run(spark, N_SMALL, hot=True, variant="outer")
    res["outer_uniform_10x"] = run(spark, N_BIG, hot=False, variant="outer")
    res["bucketed_hot_1x"] = run(spark, N_SMALL, hot=True, variant="bucketed")
    res["bucketed_hot_10x"] = run(spark, N_BIG, hot=True, variant="bucketed")
    res["bucketed_uniform_10x"] = run(spark, N_BIG, hot=False, variant="bucketed")
    print(json.dumps({"stream_join_skew": res}))
    shutil.rmtree(SCRATCH, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
