"""Analytics operators, round 5 third wave: rolling distinct-user
windows, bitmap-accelerated exact distinct counting, chi-square
contingency analysis, deterministic weighted sampling, and exact greedy
sequence packing (applyInPandas vs. a recursive-CTE oracle).

Scale discipline, per operator:

- rolling active users reduces the stream to DISTINCT (user, day)
  pairs first (one shuffle, map-side distinct), then fans each pair
  out over its 7-day contribution window — the fan-out is exactly x7,
  never data-dependent, and the re-aggregation shuffles on day;
- bitmap distinct packs 32 users per row BEFORE the wide shuffle: the
  exchange carries |users|/32 rows per group instead of one row per
  (group, user) — the roaring-bitmap trick expressed in pure built-in
  bit arithmetic (bit_or + bit_count), exact, not a sketch;
- the chi-square contingency table is bounded (|status| x |segment|);
  the only corpus-scale work is one co-keyed join + one aggregate;
- weighted sampling is a single top-k (TakeOrdered, no global sort
  materialization) over a content-hash key — reproducible sampling
  with no RNG state, the same determinism contract as
  `mixture_resample_apply`;
- greedy packing is inherently sequential PER STRATUM, so it runs as
  applyInPandas over the stratum key (one shuffle, each group a
  pandas loop) — the only honest distributed shape for an
  order-dependent fold, mirrored exactly by the oracle's recursive
  CTE.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkml_som_spark.functions import word_tokens
from sparkml_som_spark.operators.corpus_ops2 import _PACK_BUDGET
from sparkml_som_spark.operators.registry import register
from sparkml_som_spark.sources import load_table


# --------------------------------------------------------------------------
# 1. rolling active users (DAU / trailing-7-day WAU)
# --------------------------------------------------------------------------

_RAU_DAYS = 6  # trailing window: today + 6 preceding days


@register(
    "rolling_active_users",
    sql=f"""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), spine AS (
        SELECT DISTINCT day FROM ud
    )
    SELECT s.day,
           CAST(COUNT(DISTINCT CASE WHEN ud.day = s.day THEN ud.user_id END)
                AS BIGINT) AS dau,
           CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS wau_7d
    FROM spine s
    JOIN ud ON ud.day <= s.day AND ud.day >= s.day - {_RAU_DAYS}
    GROUP BY s.day
    """,
    desc="rolling engagement: daily active users and trailing-7-day distinct active users from one distinct-pair pass",
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU and trailing-7-day WAU per day — the rolling DISTINCT that
    plain window frames cannot express (COUNT(DISTINCT) OVER a moving
    frame isn't supported; per-day distinct sets don't compose).

    The scale-correct shape: reduce the stream to DISTINCT (user, day)
    pairs FIRST (map-side distinct, one shuffle), then fan each pair
    out over the <=7 window anchors it contributes to and re-count
    distinct per anchor day.  Fan-out is a constant x7 — data-size
    independent — and the final aggregate shuffles on day.  The
    never-do-this alternative (self-joining raw events) would fan out
    the full stream.  The day spine broadcasts (bounded by calendar)."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    spine = ud.select(F.col("day").alias("anchor")).distinct()
    joined = ud.join(
        F.broadcast(spine),
        (F.col("day") <= F.col("anchor"))
        & (F.col("day") >= F.date_sub(F.col("anchor"), _RAU_DAYS)),
    )
    return (
        joined.groupBy("anchor")
        .agg(
            F.countDistinct(
                F.when(F.col("day") == F.col("anchor"), F.col("user_id"))
            ).alias("dau"),
            F.countDistinct("user_id").alias("wau_7d"),
        )
        .select(F.col("anchor").alias("day"), "dau", "wau_7d")
    )


# --------------------------------------------------------------------------
# 2. bitmap-accelerated exact distinct
# --------------------------------------------------------------------------


@register(
    "bitmap_distinct_users",
    sql="""
    WITH blocks AS (
        SELECT event_type, user_id // 32 AS blk,
               bit_or(1::BIGINT << CAST(user_id % 32 AS INTEGER)) AS mask,
               COUNT(*) AS n_events
        FROM events
        GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(SUM(bit_count(mask)) AS BIGINT) AS n_distinct_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events
    FROM blocks
    GROUP BY event_type
    """,
    desc="exact distinct via bitmap blocks: 32 users packed per row with bit_or before the shuffle, popcount after — the roaring trick in built-ins",
)
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user counts per event_type via bitmap packing —
    the technique that makes exact COUNT(DISTINCT) affordable at
    100 TB.  A naive count-distinct shuffles one row per (group, user);
    here each partition first bit_or's users into 32-bit blocks
    (map-side combine on (group, user DIV 32)), so the exchange carries
    |users|/32 rows per group, then popcount (bit_count) sums the
    cardinality exactly.  Not a sketch: bit-exact, engine-exact integer
    arithmetic end to end.

    The same shape extends to segment-level roaring bitmaps and to
    bitmap INTERSECTION (audience overlap) — bit_and over the same
    blocks."""
    ev = load_table(spark, sf_dir, "events")
    blocks = ev.groupBy(
        "event_type", F.expr("user_id DIV 32").alias("blk")
    ).agg(
        F.expr(
            "bit_or(shiftleft(1L, CAST(user_id % 32 AS INT)))"
        ).alias("mask"),
        F.count("*").alias("n_events"),
    )
    return blocks.groupBy("event_type").agg(
        F.sum(F.bit_count("mask")).alias("n_distinct_users"),
        F.sum("n_events").alias("n_events"),
    )


# --------------------------------------------------------------------------
# 3. chi-square contingency analysis
# --------------------------------------------------------------------------


@register(
    "chisq_status_segment",
    sql="""
    WITH obs AS (
        SELECT o.o_orderstatus AS status, c.c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ), rt AS (
        SELECT status, CAST(SUM(n) AS BIGINT) AS row_tot FROM obs GROUP BY 1
    ), ct AS (
        SELECT segment, CAST(SUM(n) AS BIGINT) AS col_tot FROM obs GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS grand FROM obs
    )
    SELECT obs.status, obs.segment, obs.n,
           rt.row_tot * ct.col_tot * 1.0 / tot.grand AS expected,
           (obs.n - rt.row_tot * ct.col_tot * 1.0 / tot.grand)
           * (obs.n - rt.row_tot * ct.col_tot * 1.0 / tot.grand)
           / (rt.row_tot * ct.col_tot * 1.0 / tot.grand) AS chi2_term
    FROM obs
    JOIN rt USING (status)
    JOIN ct USING (segment)
    CROSS JOIN tot
    """,
    desc="chi-square contingency analysis: per-cell expected counts and chi2 contributions for order status x market segment",
)
def chisq_status_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence analysis of order status vs. customer
    market segment: the per-cell expected count under independence and
    each cell's contribution to the chi-square statistic — the audit
    table behind a data-drift or A/B sanity check.

    Per-cell values are derived from exact integer marginals with one
    fixed IEEE expression (multiply, divide, square), so both engines
    emit identical bits with no rounding step; the driver can sum
    `chi2_term` for the statistic.  The output stays per-cell because a
    global float sum WOULD be summation-order sensitive — the bounded
    cell table is the engine-exact contract, the scalar is one trivial
    reduction away.

    Scale shape: one co-keyed join + one aggregate to the bounded
    (status x segment) table; the marginal joins all run on bounded
    tables."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    obs = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count("*").alias("n"))
    )
    rt = obs.groupBy("status").agg(F.sum("n").alias("row_tot"))
    ct = obs.groupBy("segment").agg(F.sum("n").alias("col_tot"))
    tot = obs.agg(F.sum("n").alias("grand"))
    expected = (
        F.col("row_tot") * F.col("col_tot") * F.lit(1.0) / F.col("grand")
    )
    return (
        obs.join(F.broadcast(rt), "status")
        .join(F.broadcast(ct), "segment")
        .crossJoin(F.broadcast(tot))
        .select(
            "status",
            "segment",
            "n",
            expected.alias("expected"),
            (
                (F.col("n") - expected) * (F.col("n") - expected) / expected
            ).alias("chi2_term"),
        )
    )


# --------------------------------------------------------------------------
# 4. deterministic weighted sampling (Efraimidis-Spirakis)
# --------------------------------------------------------------------------

_WS_K = 50


@register(
    "weighted_sample_docs",
    sql=f"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) / 4294967296.0 AS u
        FROM documents
    )
    SELECT doc_id, n_chars, u
    FROM keyed
    ORDER BY POWER(u, 1.0 / n_chars) DESC, doc_id
    LIMIT {_WS_K}
    """,
    desc="weighted sampling without replacement (Efraimidis-Spirakis top-k by u^(1/w)) with a content-hash uniform — reproducible, RNG-free",
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement by the Efraimidis-
    Spirakis one-pass reduction: each row gets key ``u^(1/w)`` (u
    uniform, w = n_chars) and the k largest keys ARE a weighted sample
    without replacement.  This turns distributed weighted sampling
    into a plain top-k — TakeOrdered, per-partition heaps, no global
    sort, no sequential pass, no RNG coordination.

    u derives from a content hash (md5 prefix / 2^32 — an EXACT dyadic
    value both engines compute bit-identically), so the sample is
    reproducible across engines, retries, and cluster layouts; the
    emitted columns (doc_id, n_chars, u) are all engine-exact.  The
    sort key's POWER() is the one libm call — it decides ordering
    only, never an emitted value, so a last-ulp divergence could
    matter only on an exact key collision (u are distinct hashes)."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "n_chars",
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
            ).cast("long")
            / F.lit(4294967296.0)
        ).alias("u"),
    )
    return keyed.orderBy(
        F.pow(F.col("u"), F.lit(1.0) / F.col("n_chars")).desc(), "doc_id"
    ).limit(_WS_K)


# --------------------------------------------------------------------------
# 5. exact greedy sequence packing (applyInPandas vs recursive CTE)
# --------------------------------------------------------------------------


@register(
    "pack_greedy_capacity",
    sql=f"""
    WITH RECURSIVE sized AS (
        SELECT source, doc_id,
               CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
    ), walk AS (
        SELECT source, rn, doc_id, n_tokens,
               n_tokens AS fill, CAST(1 AS BIGINT) AS bin
        FROM sized WHERE rn = 1
        UNION ALL
        SELECT s.source, s.rn, s.doc_id, s.n_tokens,
               CASE WHEN w.fill + s.n_tokens > {_PACK_BUDGET}
                    THEN s.n_tokens ELSE w.fill + s.n_tokens END,
               CASE WHEN w.fill + s.n_tokens > {_PACK_BUDGET}
                    THEN w.bin + 1 ELSE w.bin END
        FROM walk w JOIN sized s ON s.source = w.source AND s.rn = w.rn + 1
    )
    SELECT source,
           CAST(MAX(bin) AS BIGINT) AS n_bins,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(doc_id * bin) AS BIGINT) AS bin_checksum
    FROM walk
    GROUP BY source
    """,
    desc="exact greedy capacity packing per source (sequential fold via applyInPandas), pinned against a recursive-CTE oracle",
)
def pack_greedy_capacity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT greedy sequential packing: walk each source's documents in
    doc_id order and start a new bin whenever adding the next document
    would exceed the {_PACK_BUDGET}-token budget (an oversized document
    gets a bin alone).  This is the true streaming-packer semantics
    that `pack_sequences_cumsum` approximates — the cumsum form can
    split a document across a budget boundary; the greedy form never
    does.

    A capacity-break fold is order-dependent state, inexpressible as a
    window (`SUM ... OVER` can't reset on a data-dependent condition),
    so the distributed shape is applyInPandas over the stratum key: one
    shuffle on source, a vectorized pandas loop per group — the same
    honest-sequential pattern as the SOM fit's per-partition kernels.
    The DuckDB oracle replays the identical fold as a recursive CTE,
    pinning per-source bin counts AND the exact doc->bin assignment
    (id-weighted checksum).

    Scale note: strata process independently (parallelism = number of
    sources); within a stratum the fold is inherently sequential —
    packing 100 TB means sharding each source first (the composed
    manifest pipeline's shard key does exactly that), then packing per
    shard."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    sized = docs.select(
        "source", "doc_id", F.size(word_tokens(F.col("text"))).alias("n_tokens")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        fill, bin_id = 0, 0
        total, checksum = 0, 0
        for doc_id, n in zip(pdf["doc_id"], pdf["n_tokens"]):
            n = int(n)
            if bin_id == 0 or fill + n > _PACK_BUDGET:
                bin_id += 1
                fill = n
            else:
                fill += n
            total += n
            checksum += int(doc_id) * bin_id
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n_bins": [bin_id],
                "total_tokens": [total],
                "bin_checksum": [checksum],
            }
        )

    return sized.groupBy("source").applyInPandas(
        pack, "source string, n_bins long, total_tokens long, bin_checksum long"
    )
