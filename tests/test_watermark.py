"""Watermark semantics: events older than the watermark are dropped
from windowed aggregation — the property that bounds state at scale.

Deterministic construction: three checkpointed stream runs against a
durable file sink (watermark state persists in the checkpoint between
runs), so batch boundaries are explicit:
  run 1: on-time events on day D           -> watermark advances near D
  run 2: 3 events 30 days late + 2 on-time -> late rows must be dropped
  run 3: a far-future event                -> closes day-D window
The final sink must contain day D WITHOUT the late rows and no window
for the late day at all.
"""

import datetime as dt

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 6, 10)


def test_late_events_dropped_by_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, ts timestamp, value double"

    def push(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("day"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    push([(i, BASE + dt.timedelta(minutes=i), 1.0) for i in range(10)])
    run()
    push(
        [(100 + i, BASE - dt.timedelta(days=30), 1.0) for i in range(3)]
        + [(200 + i, BASE + dt.timedelta(minutes=30 + i), 1.0) for i in range(2)]
    )
    run()
    push([(300, BASE + dt.timedelta(days=5), 1.0)])
    run()

    emitted = {r["day"]: r["n"] for r in spark.read.parquet(out).collect()}
    late_day = (BASE - dt.timedelta(days=30)).replace(hour=0, minute=0)
    day_d = BASE.replace(hour=0, minute=0)
    # late rows dropped entirely: their day's window never materializes
    assert late_day not in emitted, emitted
    # day D closed with exactly the 12 on-time rows (10 + 2), late 3 excluded
    assert emitted.get(day_d) == 12, emitted
