"""Analytics operators, round 5 sixth wave: graph triangle counting
with degree-ordered orientation, market-basket association rules,
OHLC time bars, a count-min sketch with its one-sided error guard,
an ORC source round-trip, and intraday time-weighted averages.

The reference (`/root/reference/`, sparkml-som) has no graph, retail
or time-series surface — these extend the engine's analytics family
per the round-5 plan; all six are SQL-expressible and run under the
full DuckDB value-hash oracle.

Scale discipline, per operator:

- triangle counting orients every edge from its lower-(degree, id)
  endpoint to the higher one, which bounds the wedge fan-out per node
  by O(sqrt(m)) regardless of hub degree — the standard trick that
  makes the wedge self-join survive power-law graphs; the degree
  table is |V| rows and rides a broadcast join;
- association rules reduce the corpus to a distinct (order, brand)
  table first; the pair self-join is keyed on the order id (equi,
  co-partitioned) with per-order fan-out bounded by the brand count,
  and all supports / totals join back as broadcasts;
- OHLC bars window over (event_type, day) partitions — bounded by a
  day of one type, never a global order — then aggregate map-side;
- the count-min sketch is a pure aggregation sketch: cell counts are
  (depth x width) rows built with map-side combine, broadcast back
  onto the term table; estimates never see row-level data twice;
- the ORC round-trip keeps the scan column-pruned on read-back;
- time-weighted averages use a lead() window scoped to (type, day) —
  the same bounded-partition shape as the bars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import materialize_reused, register
from sparkml_som_spark.sources import load_table, read_any, write_any


# --------------------------------------------------------------------------
# 1. triangle counting over the part co-purchase graph
# --------------------------------------------------------------------------


# NOTE: the Spark side reads the shared `copurchase_edges` table, which
# is built behind analytics30's `_PAIR_CAP` hot-group guard; this oracle
# is cap-free.  The two are equivalent only while no order carries
# >= _PAIR_CAP distinct parts (TPC-H max is 7 vs cap 256) — that data
# invariant is pinned by
# tests/test_analytics9.py::test_pair_cap_never_triggers_on_bench_corpus.
@register(
    "triangle_count_copurchase",
    sql="""
    WITH op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_size <= 12
    ), e AS (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ), nodes AS (
        SELECT COUNT(DISTINCT n) AS k
        FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
    ), tri AS (
        SELECT COUNT(*) AS c
        FROM e e1
        JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
        JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
    )
    SELECT CAST((SELECT k FROM nodes) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT c FROM tri) AS BIGINT) AS n_triangles
    """,
    desc="graph triangle count on the small-part co-purchase graph; degree-ordered edge orientation bounds wedge fan-out",
)
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count triangles in the graph whose nodes are small parts
    (p_size <= 12 — the analysis segment) and whose edges connect
    parts appearing in the same order.  The node filter is two
    broadcast endpoint joins against the persisted shared edge table,
    pruning the graph to ~6% of its edges before any wedge work — the
    full-catalog graph is ~100x the wedge volume and adds nothing to
    the operator demonstration.

    The oracle enumerates triangles in the textbook ``a < b < c`` key
    order.  The Spark side counts the SAME triangles (the count is
    orientation-invariant) but orients each edge from its lower
    (degree, node) endpoint — with that orientation the out-degree of
    every node is O(sqrt(2m)), so the wedge self-join below never
    explodes on a hub part the way a raw id-ordered orientation can.
    The degree table (|V| rows) travels by broadcast; the wedge →
    edge-existence join is a plain equi-join on (s, t).
    """
    # edge source: the SHARED build-once `copurchase_edges` artifact
    # (round 10) — one unordered row per co-purchased part pair, built
    # once per corpus and read by LPA / PPR / this entry.  The small-
    # part restriction commutes with the pair build (a small-small
    # edge survives either order of filter and self-join), so the two
    # broadcast semijoin-style endpoint filters below reproduce the
    # filter-first graph exactly; weights are ignored here.
    from sparkml_som_spark.operators.analytics30 import copurchase_edges

    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size") <= 12)
        .select(F.col("p_partkey").alias("pk"))
    )
    e = (
        copurchase_edges(spark, sf_dir)
        .join(F.broadcast(part.withColumnRenamed("pk", "u")), "u")
        .join(F.broadcast(part.withColumnRenamed("pk", "v")), "v")
        .select("u", "v")
        .persist()
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient each edge low->high by the (degree, node) total order;
    # carry the head's (degree, node) key so the wedge condition below
    # needs no extra join
    ed = (
        e.join(F.broadcast(deg).withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(F.broadcast(deg).withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    )
    fwd = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
    # wedge enumeration reads `oriented` three times (e1, e2, the
    # existence probe) — persist it so the edge/degree joins upstream
    # run once, not per branch
    oriented = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("td"),
    ).persist()
    wedges = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), "s")
        .where(
            F.struct(F.col("e1.td"), F.col("e1.t"))
            < F.struct(F.col("e2.td"), F.col("e2.t"))
        )
        .select(F.col("e1.t").alias("ws"), F.col("e2.t").alias("wt"))
    )
    tris = wedges.join(
        oriented.select(F.col("s").alias("ws"), F.col("t").alias("wt")),
        ["ws", "wt"],
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    out = nodes.crossJoin(edges).crossJoin(tris).select(
        "n_nodes", "n_edges", "n_triangles"
    )
    from sparkml_som_spark.operators.registry import materialize_small

    return materialize_small(out, cleanup=(e, oriented))


# --------------------------------------------------------------------------
# 2. market-basket association rules (brand pairs: support/confidence/lift)
# --------------------------------------------------------------------------


@register(
    "basket_lift_brand_pairs",
    sql="""
    WITH ob AS (
        SELECT DISTINCT l_orderkey AS o, p_brand AS b
        FROM lineitem JOIN part ON p_partkey = l_partkey
    ), n AS (
        SELECT COUNT(DISTINCT o) AS n_orders FROM ob
    ), s AS (
        SELECT b, COUNT(*) AS cnt FROM ob GROUP BY 1
    ), p AS (
        SELECT a.b AS brand_a, c.b AS brand_b, COUNT(*) AS co_cnt
        FROM ob a JOIN ob c ON a.o = c.o AND a.b < c.b
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b,
           CAST(co_cnt AS BIGINT)                                   AS co_cnt,
           ROUND(co_cnt::DOUBLE / n_orders, 6)                      AS support,
           ROUND(co_cnt::DOUBLE / sa.cnt, 6)                        AS conf_a_to_b,
           ROUND(co_cnt::DOUBLE * n_orders / (sa.cnt * sb.cnt), 6)  AS lift
    FROM p, n
    JOIN s sa ON sa.b = brand_a
    JOIN s sb ON sb.b = brand_b
    WHERE co_cnt >= 30
    """,
    desc="association rules over co-ordered brand pairs: support, confidence, lift; broadcast singles + one-row total",
)
def basket_lift_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket mining at brand granularity: for every brand pair
    co-occurring in >= 30 orders, the support / confidence / lift of
    the rule a=>b.

    Shape: reduce to the distinct (order, brand) table once (broadcast
    part dimension onto the lineitem scan), self-join on the order key
    only (per-order fan-out <= |brands| choose 2), then decorate with
    the broadcast singles table (|brands| rows) and the one-row order
    total — no corpus-scale shuffle after the first distinct.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
        # ob feeds FOUR consumers (n, s, and both sides of the pair
        # self-join); without materialization each replays the
        # lineitem-join + distinct (opt r15, guide §2.4).  Eager local
        # checkpoint = one compute + bounded executor-resident blocks
        # (distinct (order, brand) is far smaller than lineitem).
        .transform(materialize_reused)
    )
    n = ob.agg(F.countDistinct("o").alias("n_orders"))
    s = ob.groupBy("b").agg(F.count(F.lit(1)).alias("cnt"))
    pairs = (
        ob.alias("a")
        .join(ob.alias("c"), "o")
        .where(F.col("a.b") < F.col("c.b"))
        .groupBy(F.col("a.b").alias("brand_a"), F.col("c.b").alias("brand_b"))
        .agg(F.count(F.lit(1)).alias("co_cnt"))
        .where(F.col("co_cnt") >= 30)
    )
    co = F.col("co_cnt").cast("double")
    return (
        pairs.crossJoin(F.broadcast(n))
        .join(
            F.broadcast(s).withColumnRenamed("b", "brand_a").withColumnRenamed("cnt", "cnt_a"),
            "brand_a",
        )
        .join(
            F.broadcast(s).withColumnRenamed("b", "brand_b").withColumnRenamed("cnt", "cnt_b"),
            "brand_b",
        )
        .select(
            "brand_a",
            "brand_b",
            "co_cnt",
            F.round(co / F.col("n_orders"), 6).alias("support"),
            F.round(co / F.col("cnt_a"), 6).alias("conf_a_to_b"),
            F.round(co * F.col("n_orders") / (F.col("cnt_a") * F.col("cnt_b")), 6).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# 3. OHLC time bars over the event stream
# --------------------------------------------------------------------------


@register(
    "ohlc_daily_event_value",
    sql="""
    WITH w AS (
        SELECT event_type, CAST(ts AS DATE) AS day, value,
               first_value(value) OVER (
                   PARTITION BY event_type, CAST(ts AS DATE)
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS op,
               last_value(value) OVER (
                   PARTITION BY event_type, CAST(ts AS DATE)
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS cl
        FROM events
    )
    SELECT event_type, day,
           ROUND(MIN(op), 4)            AS open,
           ROUND(MAX(value), 4)         AS high,
           ROUND(MIN(value), 4)         AS low,
           ROUND(MIN(cl), 4)            AS close,
           ROUND(SUM(value), 4)         AS volume,
           CAST(COUNT(*) AS BIGINT)     AS n_events
    FROM w GROUP BY 1, 2
    """,
    desc="OHLC bars per (event_type, day): first/last by (ts, event_id) + min/max/sum, bounded window partitions",
)
def ohlc_daily_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bar downsampling (the OHLC shape every metrics store
    needs): per (event_type, day), the opening/closing value in strict
    (ts, event_id) order plus high/low/volume.

    The window partitions by (event_type, day) — one day of one type,
    bounded — never by a global order, so the shuffle keys stay small
    and uniform.  first/last ride the same frame; the final aggregate
    is map-side combined.
    """
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    w = (
        Window.partitionBy("event_type", "day")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    bars = ev.select(
        "event_type",
        "day",
        "value",
        F.first("value").over(w).alias("op"),
        F.last("value").over(w).alias("cl"),
    )
    return bars.groupBy("event_type", "day").agg(
        F.round(F.min("op"), 4).alias("open"),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.round(F.min("cl"), 4).alias("close"),
        F.round(F.sum("value"), 4).alias("volume"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# 4. count-min sketch heavy hitters with the one-sided error guard
# --------------------------------------------------------------------------

_CMS_DEPTH = 3
_CMS_WIDTH = 16  # narrow on purpose: forces real collisions at sf0.01


@register(
    "countmin_heavy_hitters",
    sql=f"""
    WITH toks AS (
        SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
    ), tc AS (
        SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1
    ), tb AS (
        SELECT tok, cnt, i,
               CAST('0x' || substr(md5(i::VARCHAR || ':' || tok), 1, 15) AS BIGINT)
                   % {_CMS_WIDTH} AS bucket
        FROM tc, (SELECT unnest([0, 1, 2]) AS i)
    ), cells AS (
        SELECT i, bucket, CAST(SUM(cnt) AS BIGINT) AS cell
        FROM tb GROUP BY 1, 2
    ), est AS (
        SELECT t.tok, MIN(c.cell) AS est_cnt
        FROM tb t JOIN cells c ON c.i = t.i AND c.bucket = t.bucket
        GROUP BY 1
    )
    SELECT tc.tok,
           CAST(tc.cnt AS BIGINT)               AS exact_cnt,
           CAST(est.est_cnt AS BIGINT)          AS est_cnt,
           CAST(est.est_cnt - tc.cnt AS BIGINT) AS overcount,
           est.est_cnt >= tc.cnt                AS lower_bound_ok
    FROM tc JOIN est ON est.tok = tc.tok
    """,
    desc=f"count-min sketch ({_CMS_DEPTH}x{_CMS_WIDTH}, md5-derived rows) vs exact counts; one-sided error guard audited",
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation audited against exact
    counts: every term's estimate must be >= its true count (the
    sketch's one-sided guarantee), and the overcount is emitted so the
    collision error is visible.  Width is deliberately narrow (16) so
    collisions actually occur at test scale.

    The sketch is a pure aggregation: (depth x width) cell counts with
    map-side combine — mergeable across partitions / days by cell-wise
    addition, which is what makes it the scale path for streaming
    heavy hitters.  The md5-derived row hashes are the same expression
    in both engines (the `dedup_simhash` idiom), so the whole sketch
    runs under the full value-hash oracle.
    """
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tb = tc.select(
        "tok",
        "cnt",
        F.explode(F.array(*[F.lit(i) for i in range(_CMS_DEPTH)])).alias("i"),
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("tok"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _CMS_WIDTH,
    )
    cells = tb.groupBy("i", "bucket").agg(F.sum("cnt").alias("cell"))
    est = (
        tb.join(F.broadcast(cells), ["i", "bucket"])
        .groupBy("tok")
        .agg(F.min("cell").alias("est_cnt"))
    )
    return tc.join(est, "tok").select(
        "tok",
        F.col("cnt").alias("exact_cnt"),
        "est_cnt",
        (F.col("est_cnt") - F.col("cnt")).alias("overcount"),
        (F.col("est_cnt") >= F.col("cnt")).alias("lower_bound_ok"),
    )


# --------------------------------------------------------------------------
# 5. ORC source round-trip
# --------------------------------------------------------------------------


@register(
    "source_orc_events",
    sql="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)  AS n_rows,
           ROUND(SUM(value), 4)      AS sum_value
    FROM events
    WHERE event_id <= 2000
    GROUP BY event_type
    """,
    desc="ORC sink + source round-trip: write slice as ORC, read back column-pruned, aggregate",
)
def source_orc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip: write an events slice as ORC (the third
    columnar format next to parquet and the csv/json text paths),
    read it back, and aggregate.  The read-back selects only the two
    columns it needs, so ORC's column pruning is exercised, not just
    the happy-path scan.
    """
    import os

    from sparkml_som_spark.operators.sources_queries import _scratch

    ev = load_table(spark, sf_dir, "events")
    slice_df = ev.where(F.col("event_id") <= 2000).select(
        "event_id", "event_type", "value"
    )
    path = _scratch(sf_dir, "events_orc")
    write_any(slice_df, path, fmt="orc")
    back = read_any(spark, path, fmt="orc").select("event_type", "value")
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


# --------------------------------------------------------------------------
# 6. intraday time-weighted average
# --------------------------------------------------------------------------


@register(
    "twa_intraday_value",
    sql="""
    WITH seg AS (
        SELECT event_type, CAST(ts AS DATE) AS day, value,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY event_type, CAST(ts AS DATE)
                   ORDER BY ts, event_id
               ) - epoch_us(ts) AS dt_us
        FROM events
    )
    SELECT event_type, day,
           ROUND(SUM(value * dt_us) / SUM(dt_us), 4) AS twa_value,
           CAST(COUNT(*) AS BIGINT)                  AS n_segments
    FROM seg
    WHERE dt_us IS NOT NULL
    GROUP BY 1, 2
    """,
    desc="time-weighted average per (event_type, day): lead() segment durations, bounded window partitions",
)
def twa_intraday_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per (event_type, day) — the
    irregular-sampling average where each observation is weighted by
    how long it was current (until the next event that day).

    Durations come from a lead() window scoped to (event_type, day) —
    bounded partitions, same shape as the OHLC bars — in exact integer
    microseconds (`unix_micros` == DuckDB `epoch_us`), so the only
    float arithmetic is the final weighted mean.
    """
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    seg = ev.select(
        "event_type",
        "day",
        "value",
        (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias("dt_us"),
    ).where(F.col("dt_us").isNotNull())
    return seg.groupBy("event_type", "day").agg(
        F.round(F.sum(F.col("value") * F.col("dt_us")) / F.sum("dt_us"), 4).alias(
            "twa_value"
        ),
        F.count(F.lit(1)).alias("n_segments"),
    )
