"""Streaming windows verified against their batch twins — the batch
query over the same files is the oracle (SURVEY.md §5)."""

import pytest

from sparkml_som_spark.sources import load_table
from sparkml_som_spark.streaming import (
    session_window_stream,
    sliding_window_stream,
    tumbling_window_stream,
)
from sparkml_som_spark.streaming.windows import run_stream_to_memory

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_stream(spark, tmp_path_factory):
    # materialize events as a file stream source (one file = one microbatch
    # granule); truncate ts to microseconds exactly like the batch loader
    path = str(tmp_path_factory.mktemp("stream") / "events")
    load_table(spark, SF, "events").write.mode("overwrite").parquet(path)
    batch = spark.read.parquet(path)
    stream = spark.readStream.schema(batch.schema).parquet(path)
    return stream, batch


def _run_and_fetch(spark, stream_df, name):
    q = run_stream_to_memory(stream_df, name)
    q.awaitTermination(120)
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def _as_sets(df):
    return {tuple(r) for r in df.collect()}


def test_tumbling_stream_matches_batch(spark, event_stream):
    stream, batch = event_stream
    got = _run_and_fetch(spark, tumbling_window_stream(stream), "t_tumbling")
    # batch twin: same transformation on the batch frame (watermark is a
    # no-op in batch mode)
    import pyspark.sql.functions as F

    want = (
        batch.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )
    assert _as_sets(got) == _as_sets(want)


def test_session_stream_matches_batch(spark, event_stream):
    stream, batch = event_stream
    got = _run_and_fetch(spark, session_window_stream(stream), "t_session")
    import pyspark.sql.functions as F

    want = (
        batch.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events", "total_value")
    )
    assert _as_sets(got) == _as_sets(want)


def test_sliding_stream_matches_batch(spark, event_stream):
    stream, batch = event_stream
    got = _run_and_fetch(spark, sliding_window_stream(stream), "t_sliding")
    import pyspark.sql.functions as F

    want = (
        batch.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.avg("value"), 4).alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
    )
    assert _as_sets(got) == _as_sets(want)


def test_stream_dedup_drops_replayed_batch(spark, tmp_path):
    """Write the same events file twice (a replayed micro-batch); the
    deduped stream must contain each event_id exactly once."""
    import pyspark.sql.functions as F

    from sparkml_som_spark.streaming.windows import dedup_stream

    src = str(tmp_path / "dup_events")
    ev = load_table(spark, SF, "events").limit(200).cache()
    n_unique = ev.count()
    ev.write.mode("overwrite").parquet(src)
    # duplicate every row by appending the same rows as new files
    ev.write.mode("append").parquet(src)

    batch = spark.read.parquet(src)
    assert batch.count() == 2 * n_unique  # precondition: duplicates exist
    stream = spark.readStream.schema(batch.schema).parquet(src)

    q = run_stream_to_memory(dedup_stream(stream), "t_dedup", mode="append")
    q.awaitTermination(120)
    q.stop()
    got = spark.sql("SELECT event_id, COUNT(*) AS n FROM t_dedup GROUP BY event_id")
    assert got.count() == n_unique
    assert got.agg(F.max("n")).first()[0] == 1
    ev.unpersist()


def test_interval_join_stream_matches_batch(spark, event_stream):
    """Stream-stream interval join == batch interval join over the same
    files (append mode: every matched pair is emitted exactly once)."""
    import pyspark.sql.functions as F

    from sparkml_som_spark.streaming.windows import interval_join_stream, run_stream_to_memory

    stream, batch = event_stream
    out = interval_join_stream(
        stream.where(F.col("event_type") == "signup"),
        stream.where(F.col("event_type") == "click"),
    )
    q = run_stream_to_memory(out, "t_ijoin", mode="append")
    q.awaitTermination(120)
    q.stop()
    got = spark.sql("SELECT * FROM t_ijoin")

    s = batch.where(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("signup_id"), F.col("ts").alias("s_ts")
    )
    c = batch.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    want = s.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("s_ts"))
        & (F.col("c_ts") < F.col("s_ts") + F.expr("INTERVAL 10 MINUTES")),
    ).select(
        "user_id",
        "signup_id",
        "click_id",
        (F.unix_timestamp("c_ts") - F.unix_timestamp("s_ts")).alias("secs_after"),
    )
    assert len(_as_sets(got)) > 0
    assert _as_sets(got) == _as_sets(want)


def test_bucketed_interval_join_equivalent_to_textbook(spark, event_stream):
    """The hot-key mitigation (event time folded into the equi-key,
    {b, b+1} bucket probe) must be OUTPUT-IDENTICAL to the textbook
    stream-stream interval join — `exceptAll` in both directions, so
    a duplicated match (a click caught by both bucket probes) or a
    dropped match (window crossing more than one bucket boundary)
    both fail, not just set-level agreement."""
    import pyspark.sql.functions as F

    from sparkml_som_spark.streaming.windows import (
        interval_join_stream,
        interval_join_stream_bucketed,
        run_stream_to_memory,
    )

    stream, _batch = event_stream
    plain = interval_join_stream(
        stream.where(F.col("event_type") == "signup"),
        stream.where(F.col("event_type") == "click"),
    )
    bucketed = interval_join_stream_bucketed(
        stream.where(F.col("event_type") == "signup"),
        stream.where(F.col("event_type") == "click"),
    )
    for out, name in ((plain, "t_ijoin_plain"), (bucketed, "t_ijoin_bkt")):
        q = run_stream_to_memory(out, name, mode="append")
        q.awaitTermination(120)
        q.stop()
    got_plain = spark.sql("SELECT * FROM t_ijoin_plain")
    got_bkt = spark.sql("SELECT * FROM t_ijoin_bkt")
    assert got_plain.count() > 0
    assert got_bkt.exceptAll(got_plain).count() == 0
    assert got_plain.exceptAll(got_bkt).count() == 0


def test_bucketed_interval_join_rejects_undersized_bucket(spark, event_stream):
    """bucket_sec < window_sec would silently MISS matches whose click
    lands two buckets ahead; the helper must refuse instead."""
    import pytest as _pytest
    import pyspark.sql.functions as F

    from sparkml_som_spark.streaming.windows import interval_join_stream_bucketed

    stream, _batch = event_stream
    with _pytest.raises(ValueError, match="bucket_sec"):
        interval_join_stream_bucketed(
            stream.where(F.col("event_type") == "signup"),
            stream.where(F.col("event_type") == "click"),
            window_sec=600,
            bucket_sec=300,
        )


def test_transform_with_state_matches_applyinpandas(spark, event_stream, tmp_path):
    """The Spark-4 transformWithStateInPandas profile must equal the
    applyInPandasWithState profile on the same single-batch stream.

    Skipped where google.protobuf is unusable: the TWS runtime's state
    protocol needs it (`StateMessage_pb2`), and this container ships a
    broken protobuf install (no pip allowed).  The operator itself is
    import-gated the same way."""
    pytest.importorskip("google.protobuf.descriptor")

    from sparkml_som_spark.streaming.stateful import (
        stateful_user_profile,
        stateful_user_profile_tws,
    )

    def drain(out, name):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / name))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return {
            r["user_id"]: (r["n_events"], r["total_value"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }

    stream, _batch = event_stream
    old = drain(stateful_user_profile(stream), "tws_old")
    new = drain(stateful_user_profile_tws(stream), "tws_new")
    assert old == new and len(old) > 0


def test_stream_incremental_dedup_multibatch(spark):
    """The fingerprint index must be built across SEVERAL micro-batches
    (rate-limited source) and end exactly at the distinct
    (source, fingerprint) set — nothing lost or double-ingested at
    batch boundaries."""
    from pyspark.sql import functions as F

    from sparkml_som_spark.operators.registry import load_all
    from sparkml_som_spark.sources import load_table

    SF = "/root/testdata/sf0.001"
    reg = load_all()
    out = {
        r["source"]: r["n_unique"]
        for r in reg["stream_incremental_dedup_index"].fn(spark, SF).collect()
    }
    want = {
        r["source"]: r["n"]
        for r in load_table(spark, SF, "documents")
        .groupBy("source")
        .agg(F.countDistinct(F.md5("text")).alias("n"))
        .collect()
    }
    assert out == want


def test_left_outer_join_watermark_gated_nulls(spark):
    """The left-outer stream join must emit (a) every matched pair and
    (b) null rows for EXACTLY the unmatched signups whose window upper
    bound lies below the global watermark (min of the two filtered
    inputs' max ts, minus the 1 h delay) — younger unmatched signups
    stay in state and must NOT reach the sink."""
    from pyspark.sql import functions as F

    from sparkml_som_spark.operators.registry import load_all
    from sparkml_som_spark.sources import load_table

    reg = load_all()
    sink = reg["stream_left_outer_join"].fn(spark, SF)
    got_nulls = {r["signup_id"] for r in sink.where(F.col("click_id").isNull()).collect()}
    got_matched = {
        (r["signup_id"], r["click_id"])
        for r in sink.where(F.col("click_id").isNotNull()).collect()
    }

    ev = load_table(spark, SF, "events")
    s = ev.where(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("signup_id"), F.col("ts").alias("s_ts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    cond = (
        (F.col("cu") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("s_ts"))
        & (F.col("c_ts") < F.col("s_ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    j = s.join(c, cond, "left")
    want_matched = {
        (r["signup_id"], r["click_id"])
        for r in j.where(F.col("click_id").isNotNull()).collect()
    }
    assert got_matched == want_matched

    wm_sig = s.agg(F.max("s_ts")).collect()[0][0]
    wm_clk = c.agg(F.max("c_ts")).collect()[0][0]
    wm = min(wm_sig, wm_clk)
    unmatched = j.where(F.col("click_id").isNull()).select("signup_id", "s_ts").collect()
    import datetime

    want_nulls = {
        r["signup_id"]
        for r in unmatched
        if r["s_ts"] + datetime.timedelta(minutes=10)
        < wm - datetime.timedelta(hours=1)
    }
    assert got_nulls == want_nulls
    # the boundary genuinely bites on this fixture: some unmatched
    # signups must be retained, or the test shows nothing
    assert len(want_nulls) < len(unmatched)
