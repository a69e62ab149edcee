"""Checkpoint-recovery correctness: a watermarked streaming aggregate
stopped after draining part of the source and RESTARTED from its
checkpoint must (a) not reprocess the files it already committed and
(b) end bit-equal to the batch recompute over the full source —
exactly-once across a restart, the property a 100 TB backfill relies
on."""

import os

from pyspark.sql import functions as F

from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _drain(spark, src_dir, schema, ckpt, sink):
    """One AvailableNow run: 1-day tumbling count/sum per event_type,
    complete-mode rewrite of the parquet sink via foreachBatch."""
    stream = spark.readStream.schema(schema).parquet(src_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("tv"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "tv")
    )

    def write_batch(bdf, bid):
        bdf.write.mode("overwrite").parquet(sink)

    q = (
        agg.writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()


def test_restart_from_checkpoint_no_loss_no_dup(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    # phase 1: only the first half of the data exists
    first = ev.where(F.col("event_id") % 2 == 0)
    second = ev.where(F.col("event_id") % 2 == 1)
    first.write.mode("overwrite").parquet(src)
    _drain(spark, src, ev.schema, ckpt, sink)
    mid = {
        (r["ws"], r["event_type"]): r["n"]
        for r in spark.read.parquet(sink).collect()
    }
    assert sum(mid.values()) == first.count(), "phase 1 must cover exactly half"

    # phase 2: more files arrive; restart from the SAME checkpoint
    second.write.mode("append").parquet(src)
    _drain(spark, src, ev.schema, ckpt, sink)

    got = {
        (r["ws"], r["event_type"]): (r["n"], r["tv"])
        for r in spark.read.parquet(sink).collect()
    }
    want = {
        (r["ws"], r["event_type"]): (r["n"], r["tv"])
        for r in (
            ev.groupBy(
                F.date_trunc("day", "ts").alias("ws"), "event_type"
            )
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("tv"))
            .collect()
        )
    }
    # counts must match the full batch recompute exactly: the restart
    # neither lost the first half nor re-counted it
    assert {k: v[0] for k, v in got.items()} == {k: v[0] for k, v in want.items()}
    # sums match at the rounding quarantine
    for k in want:
        assert abs(got[k][1] - want[k][1]) < 1e-6, k

    # the checkpoint's offset log must show the second run resumed
    # past the first run's committed batch (no replay from zero)
    commits = sorted(os.listdir(os.path.join(ckpt, "commits")))
    assert len([c for c in commits if not c.startswith(".")]) >= 2
