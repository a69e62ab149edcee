"""Hot-user skew probe for the stream-stream LEFT OUTER interval join
(VERDICT r7 ask #7) — the last skew family without a measurement: join
STATE under a dominant key.

Builds synthetic signup/click streams with id arithmetic only (no RNG):
in the HOT variant one user owns ~90% of both sides; the UNIFORM
variant spreads the same rows over 1000 users.  Events are written as 8
time-range files with ascending pinned mtimes, so AvailableNow replays
them as 8 micro-batches with an advancing watermark — state from old
batches must evict exactly as it would on a live stream.

Measures, for {uniform, hot} x {1x = 60k, 100x = 6M rows/side}:
- wall-clock of the full drain,
- max state rows + state memory across micro-batches (the
  stateOperators progress metrics — the number that grows without
  bound if watermark eviction breaks),
- output row count (sanity: hot and uniform runs must conserve rows).

Usage: PYTHONPATH=/root/repo python tools/stream_join_skew_probe.py
Writes one JSON line; the measured rows go into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SMALL = 60_000
N_BIG = 6_000_000
N_FILES = 8
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
        part = os.path.join(path, f"_b{f}")
        df.where((i >= f * per) & (i < (f + 1) * per if f < N_FILES - 1 else i >= f * per)).coalesce(
            1
        ).write.mode("overwrite").parquet(part)
        pq = [x for x in os.listdir(part) if x.endswith(".parquet")][0]
        dst = os.path.join(path, f"f{f}.parquet")
        shutil.move(os.path.join(part, pq), dst)
        shutil.rmtree(part)
        os.utime(dst, (1_600_000_000 + f * 100, 1_600_000_000 + f * 100))


def run(spark, n: int, hot: bool) -> dict:
    from pyspark.sql import functions as F

    from sparkml_som_spark.streaming.windows import interval_join_stream_left

    tag = f"{'hot' if hot else 'uni'}_{n}"
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

    # 2-second interval window: rows are 1 s apart globally, so match
    # fan-out stays ~1-2 per signup in BOTH variants — the probe
    # isolates state/task skew, not a semantic match explosion (a hot
    # user with dense timestamps under a wide window is a data-shape
    # question, not a state-partitioning one)
    out = interval_join_stream_left(src(s_path), src(c_path), window="2 seconds")
    sink = f"skewprobe_{tag}"
    t0 = time.time()
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    wall = time.time() - t0
    max_rows = 0
    max_mem = 0
    for p in q.recentProgress:
        for so in p.get("stateOperators", []):
            max_rows = max(max_rows, so.get("numRowsTotal", 0))
            max_mem = max(max_mem, so.get("memoryUsedBytes", 0))
    n_out = spark.table(sink).count()
    spark.catalog.dropTempView(sink)
    q.stop()
    return {
        "rows_per_side": n,
        "hot": hot,
        "wall_sec": round(wall, 1),
        "max_state_rows": max_rows,
        "max_state_mb": round(max_mem / 1e6, 1),
        "output_rows": n_out,
    }


def main() -> None:
    from sparkml_som_spark.session import get_spark

    spark = get_spark("stream-join-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    res = {
        "uniform_1x": run(spark, N_SMALL, hot=False),
        "hot_1x": run(spark, N_SMALL, hot=True),
        "uniform_100x": run(spark, N_BIG, hot=False),
        "hot_100x": run(spark, N_BIG, hot=True),
    }
    res["wall_ratio_hot_vs_uniform_100x"] = round(
        res["hot_100x"]["wall_sec"] / max(res["uniform_100x"]["wall_sec"], 0.1), 2
    )
    res["state_ratio_hot_vs_uniform_100x"] = round(
        res["hot_100x"]["max_state_rows"] / max(res["uniform_100x"]["max_state_rows"], 1), 2
    )
    print(json.dumps({"stream_join_skew": res}))
    shutil.rmtree(SCRATCH, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
