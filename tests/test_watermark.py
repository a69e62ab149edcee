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


import pytest


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_ntz_events_normalized_for_watermark(spark, tmp_path, unit):
    """The testdata's events.parquet has shipped as TIMESTAMP(NANOS) in
    one generation and plain TIMESTAMP(MICROS)-without-timezone (Spark 4
    infers TIMESTAMP_NTZ) in another; withWatermark rejects NTZ outright
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).  Pin the contract: whatever
    physical type the file carries, load_table must hand back an LTZ
    `ts` on which every watermark entry builds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkml_som_spark.sources import load_table
    from sparkml_som_spark.streaming.windows import (
        dedup_stream,
        session_window_stream,
        sliding_window_stream,
        tumbling_window_stream,
    )

    sf_dir = str(tmp_path / "sf_ntz")
    ts = [BASE + dt.timedelta(minutes=i) for i in range(20)]
    table = pa.table(
        {
            "event_id": pa.array(range(20), pa.int64()),
            # us/no-tz -> Spark infers NTZ; ns -> TIMESTAMP(NANOS), which
            # the reader only accepts via the nanosAsLong legacy conf —
            # the two physical types past testdata generations shipped
            "ts": pa.array(ts, pa.timestamp(unit)),
            "user_id": pa.array([i % 3 for i in range(20)], pa.int64()),
            "event_type": pa.array(["click"] * 20),
            "value": pa.array([1.0] * 20),
            "props": pa.array(['{"a": 1}'] * 20),
        }
    )
    import os

    os.makedirs(sf_dir, exist_ok=True)
    pq.write_table(
        table, os.path.join(sf_dir, "events.parquet"), store_schema=False
    )
    if unit == "us":
        # raw read really is NTZ (the regression's precondition)...
        assert (
            dict(spark.read.parquet(os.path.join(sf_dir, "events.parquet")).dtypes)["ts"]
            == "timestamp_ntz"
        )
    # ...and load_table normalizes every physical type to LTZ
    batch = load_table(spark, sf_dir, "events")
    assert dict(batch.dtypes)["ts"] == "timestamp"

    src = str(tmp_path / "stream_src")
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    # every watermark-bearing operator must at least ANALYZE (this is
    # exactly what threw in round 3); run one end-to-end for the values
    for build in (tumbling_window_stream, sliding_window_stream, session_window_stream, dedup_stream):
        build(stream).schema  # forces analysis

    q = (
        tumbling_window_stream(stream)
        .writeStream.format("memory")
        .queryName("t_ntz_tumbling")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    rows = spark.table("t_ntz_tumbling").collect()
    assert sum(r["n_events"] for r in rows) == 20
