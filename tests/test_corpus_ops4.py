"""corpus_ops4 mechanics: z-order locality, resample fan-out bounds,
frame-plan arithmetic, anomaly flags, posting-list caps — plus the
plan shapes the scale story depends on."""

from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import load_all
from sparkml_som_spark.plans import formatted_plan
from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


def test_zorder_stays_jvm_side(spark):
    """The z-value is codegen arithmetic: no Python evaluation node may
    appear, and the audit is one keyed aggregation."""
    df = _registry()["zorder_layout_events"].fn(spark, SF)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    rows = df.collect()
    assert 0 < len(rows) <= 256
    # interleaving invariant: a z-bucket spans at most 16 consecutive
    # ub values and 16 vb values (top 4 bits of each dim fixed)
    for r in rows:
        assert r["max_ub"] - r["min_ub"] < 16
        assert r["max_vb"] - r["min_vb"] < 16
        assert r["bbox_area"] <= 256


def test_zorder_expr_is_bijective():
    """The interleave must be a bijection from (8-bit, 8-bit) onto
    [0, 65536) — checked exhaustively via DuckDB (the same engine that
    runs the oracle side of the query), no Spark needed."""
    import duckdb

    from sparkml_som_spark.operators.corpus_ops4 import _zorder_expr

    z = _zorder_expr("(i % 256)", "(i // 256)")
    n_distinct, zmin, zmax = duckdb.sql(
        f"SELECT COUNT(DISTINCT ({z})), MIN({z}), MAX({z})"
        " FROM range(65536) t(i)"
    ).fetchone()
    assert (n_distinct, zmin, zmax) == (65536, 0, 65535)


def test_mixture_resample_fanout_bounds(spark):
    """Each domain's output rows must lie in [floor(w)*n, ceil(w)*n] —
    the hash-Bernoulli can only add 0 or 1 repeat per doc."""
    import math

    reg = _registry()
    weights = {
        (r["source"], r["lang"]): r["sample_weight"]
        for r in reg["corpus_mixture_weights"].fn(spark, SF).collect()
    }
    out = reg["mixture_resample_apply"].fn(spark, SF).collect()
    assert set(weights) == {(r["source"], r["lang"]) for r in out}
    for r in out:
        w = weights[(r["source"], r["lang"])]
        n = r["n_docs_in"]
        assert math.floor(w) * n <= r["n_rows_out"] <= math.ceil(w) * n


def test_mixture_resample_broadcasts_weights(spark):
    """The bounded per-domain weight table must broadcast onto the
    corpus scan, never sort-merge against it."""
    df = _registry()["mixture_resample_apply"].fn(spark, SF)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan


def test_video_frame_plan_prunes_payload(spark):
    """The frame planner must read only metadata columns — documents.text
    (the payload stand-in's source) must not reach the scan."""
    df = _registry()["media_video_frame_plan"].fn(spark, SF)
    plan = formatted_plan(df)
    import re

    for m in re.finditer(r"ReadSchema: (\S+)", plan):
        assert "text" not in m.group(1), plan


def test_anomaly_zscore_flags_only_outliers(spark):
    rows = _registry()["anomaly_zscore_daily"].fn(spark, SF).collect()
    for r in rows:
        assert abs(r["z"]) > 2.0
        assert r["n"] >= 1


def test_profile_single_scan(spark):
    """The one-pass profiler must read the table ONCE (one parquet scan
    node) — the per-column rescan shape is exactly what it replaces."""
    import re

    df = _registry()["profile_table_columns"].fn(spark, SF)
    plan = formatted_plan(df)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan


def test_approx_guards_hold(spark):
    reg = _registry()
    for name in ("approx_distinct_users", "approx_percentile_prices"):
        rows = reg[name].fn(spark, SF).collect()
        assert rows
        assert all(r["approx_ok"] for r in rows), name


def test_curriculum_phases_partition_and_order(spark):
    """Phases partition the corpus (sizes sum to N, within 1 of N/P)
    and quality is non-increasing across phase boundaries."""
    from sparkml_som_spark.operators.corpus_ops4 import _CURRICULUM_PHASES
    from sparkml_som_spark.sources import load_table

    n = load_table(spark, SF, "documents").count()
    rows = sorted(
        _registry()["curriculum_phases"].fn(spark, SF).collect(),
        key=lambda r: r["phase"],
    )
    assert [r["phase"] for r in rows] == list(range(_CURRICULUM_PHASES))
    assert sum(r["n_docs"] for r in rows) == n
    for r in rows:
        assert abs(r["n_docs"] - n / _CURRICULUM_PHASES) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a["min_q"] >= b["max_q"] - 1e-9  # easy-first ordering


def test_retention_rates_bounded_and_anchored(spark):
    """Week-0 retention is 1.0 by construction (the signup event itself
    is activity at offset 0) and every rate lies in (0, 1]."""
    rows = _registry()["retention_cohort_matrix"].fn(spark, SF).collect()
    assert rows
    by_cohort0 = {r["cohort_week"]: r for r in rows if r["week_offset"] == 0}
    for r in by_cohort0.values():
        assert r["n_active"] == r["n_cohort"]
        assert r["retention"] == 1.0
    for r in rows:
        assert 0 < r["retention"] <= 1.0
        assert 0 <= r["week_offset"] <= 4


def test_inverted_index_caps_and_sorts_postings(spark):
    from sparkml_som_spark.operators.corpus_ops4 import (
        _IDX_MIN_DF,
        _IDX_POSTINGS_K,
    )

    rows = _registry()["inverted_index_postings"].fn(spark, SF).collect()
    assert rows, "expected at least one term over the df threshold"
    for r in rows:
        assert r["df"] >= _IDX_MIN_DF
        # postings emit as a comma-joined string (the driver's pandas
        # canon cannot hash list cells — r11 driver err)
        assert isinstance(r["postings"], str) and r["postings"]
        ids = [int(x) for x in r["postings"].split(",")]
        assert 1 <= len(ids) <= _IDX_POSTINGS_K
        assert ids == sorted(ids)
        # the cap keeps the SMALLEST doc_ids: postings are a prefix of
        # the full sorted posting list, so max(postings) < any doc_id
        # beyond the cap -- spot-check via df when the list is full
        if r["df"] > _IDX_POSTINGS_K:
            assert len(ids) == _IDX_POSTINGS_K
