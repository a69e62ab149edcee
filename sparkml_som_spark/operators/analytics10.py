"""Analytics operators, round 5 seventh wave: a Bloom-filter
semi-join pre-filter with false-positive accounting, user-journey
trigram mining, merkle-style two-snapshot reconciliation, and
matryoshka (prefix-dimension) ANN with an exact recall audit.

The reference (`/root/reference/`) has none of these; they extend the
engine's sketch / sequence / data-reconciliation families per the
round-5 plan.  All four run under the full DuckDB value-hash oracle.

Scale discipline, per operator:

- the Bloom filter is the classic shuffle-avoidance pre-filter: the
  build side reduces to <= 2*|keys| (i, bit-position) rows, dedups to
  <= k*m set bits (here 2x1024 — broadcastable at ANY corpus size),
  and the probe side joins that broadcast instead of shuffling
  against the full build table; the exact semi-join runs only to
  AUDIT the filter (zero false negatives, counted false positives);
- trigram paths window per user (bounded partitions) and aggregate
  to at most |event_types|^3 rows with map-side combine;
- reconciliation compares bucket-level (count, bit_xor(row_hash))
  digests first — order-independent, overflow-free — and joins
  row-level data ONLY inside differing buckets (broadcast bucket
  list), the merkle-tree shape that diffs 100 TB snapshots without
  a full-corpus join;
- matryoshka ANN scores the corpus once against broadcast queries;
  the prefix ranking reads 16 of 64 dims (the cheap first pass a
  tiered retrieval system would run), and because both ranks land on
  the same row the top-k recall audit is a conditional count — no
  audit join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkml_som_spark.functions import cosine
from sparkml_som_spark.operators.registry import register
from sparkml_som_spark.sources import load_table

_BLOOM_BITS = 1024
_BLOOM_K = 2


def _md5_mod(col, salt_col, mod: int):
    """60-bit md5-derived hash mod `mod` — the engine-shared idiom
    (Spark conv(hex,16,10) == DuckDB '0x'||hex cast; see
    dedup.py simhash notes)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(salt_col.cast("string"), F.lit(":"), col.cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % mod
    )


# --------------------------------------------------------------------------
# 1. Bloom-filter semi-join with exact audit
# --------------------------------------------------------------------------


@register(
    "bloom_semijoin_customers",
    sql=f"""
    WITH bk AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'
    ), bits AS (
        SELECT DISTINCT i,
               CAST('0x' || substr(md5(i::VARCHAR || ':' || k::VARCHAR), 1, 15) AS BIGINT)
                   % {_BLOOM_BITS} AS pos
        FROM bk, (SELECT unnest([0, 1]) AS i)
    ), probe AS (
        SELECT c_custkey AS k, i,
               CAST('0x' || substr(md5(i::VARCHAR || ':' || c_custkey::VARCHAR), 1, 15) AS BIGINT)
                   % {_BLOOM_BITS} AS pos
        FROM customer, (SELECT unnest([0, 1]) AS i)
    ), pass AS (
        SELECT p.k FROM probe p JOIN bits b ON b.i = p.i AND b.pos = p.pos
        GROUP BY p.k HAVING COUNT(*) = {_BLOOM_K}
    ), truth AS (
        SELECT c_custkey AS k FROM customer JOIN bk ON bk.k = c_custkey
    )
    SELECT CAST((SELECT COUNT(*) FROM customer) AS BIGINT)  AS n_customers,
           CAST((SELECT COUNT(*) FROM truth) AS BIGINT)     AS n_true_members,
           CAST((SELECT COUNT(*) FROM pass) AS BIGINT)      AS n_bloom_pass,
           CAST((SELECT COUNT(*) FROM pass) -
                (SELECT COUNT(*) FROM truth) AS BIGINT)     AS n_false_positives,
           (SELECT COUNT(*) FROM truth t JOIN pass p ON p.k = t.k) =
                (SELECT COUNT(*) FROM truth)                AS zero_false_negatives
    """,
    desc=f"Bloom pre-filter (k={_BLOOM_K}, m={_BLOOM_BITS}) for the 1995-buyers semi-join; exact audit of FPs and the zero-FN guarantee",
)
def bloom_semijoin_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join pre-filtering with a Bloom filter, audited exactly:
    build a k=2, m=1024 filter over customers who ordered in 1995,
    probe every customer against the broadcast bit set, and compare
    with the true semi-join — the filter must pass every true member
    (one-sided guarantee) and the false-positive count is emitted.

    The filter is represented as its SET BIT POSITIONS — at most k*m
    rows no matter how large the build side — so at 100 TB the probe
    side joins a fixed-size broadcast instead of shuffling against
    the build table; the exact semi-join here exists only to audit.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    bk = (
        orders.where(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1996-01-01")
        )
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    salts = F.explode(F.array(*[F.lit(i) for i in range(_BLOOM_K)])).alias("i")
    bits = (
        bk.select("k", salts)
        .select("i", _md5_mod(F.col("k"), F.col("i"), _BLOOM_BITS).alias("pos"))
        .distinct()
    )
    probe = cust.select(F.col("c_custkey").alias("k"), salts).select(
        "k", "i", _md5_mod(F.col("k"), F.col("i"), _BLOOM_BITS).alias("pos")
    )
    passed = (
        probe.join(F.broadcast(bits), ["i", "pos"])
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("hits"))
        .where(F.col("hits") == _BLOOM_K)
        .select("k")
    )
    truth = cust.join(bk, cust.c_custkey == bk.k).select(cust.c_custkey.alias("k"))
    # one full-outer join of the two small key sets feeds EVERY audit
    # count from a single aggregate; only the customer total needs the
    # (single) one-row cross join
    audit = (
        truth.select(F.col("k").alias("tk"))
        .join(passed.select(F.col("k").alias("pk")), F.col("tk") == F.col("pk"), "full")
        .agg(
            F.count("tk").alias("n_true_members"),
            F.count("pk").alias("n_bloom_pass"),
            F.count(F.when(F.col("tk").isNotNull() & F.col("pk").isNotNull(), 1)).alias(
                "n_true_passing"
            ),
        )
    )
    n_cust = cust.agg(F.count(F.lit(1)).alias("n_customers"))
    return (
        n_cust.crossJoin(audit)
        .select(
            "n_customers",
            "n_true_members",
            "n_bloom_pass",
            (F.col("n_bloom_pass") - F.col("n_true_members")).alias("n_false_positives"),
            (F.col("n_true_passing") == F.col("n_true_members")).alias(
                "zero_false_negatives"
            ),
        )
    )


# --------------------------------------------------------------------------
# 2. user-journey trigram mining
# --------------------------------------------------------------------------


@register(
    "path_trigrams_events",
    sql="""
    WITH s AS (
        SELECT user_id, event_type AS e1,
               lead(event_type)    OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM s WHERE e3 IS NOT NULL
    GROUP BY 1, 2, 3
    """,
    desc="frequent length-3 user journeys: per-user lead() pairing to bounded |event_types|^3 counts",
)
def path_trigrams_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining, the fixed-length case: count every
    consecutive event-type trigram inside each user's (ts, event_id)
    timeline — the user-journey table behind 'what do users do next'.

    One shuffle on user_id for the lead() window (partitions bounded
    by a user's history), then an aggregate whose key space is at most
    |event_types|^3 with map-side combine doing nearly all reduction
    — same scale shape as the Markov-transition operator, one step
    deeper.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type").over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    return s.groupBy("e1", "e2", "e3").agg(F.count(F.lit(1)).alias("n_paths"))


# --------------------------------------------------------------------------
# 3. merkle-style snapshot reconciliation
# --------------------------------------------------------------------------

_RECON_BUCKETS = 64
# snapshot B is derived deterministically from orders: every 101st key
# deleted, every 97th key repriced — both engines build the same B
_RECON_SQL_B = """
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1.5
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 101 <> 0
"""


@register(
    "table_diff_reconcile",
    sql=f"""
    WITH a AS (
        SELECT o_orderkey, o_totalprice FROM orders
    ), b AS (
{_RECON_SQL_B}
    ), ha AS (
        SELECT o_orderkey, o_orderkey % {_RECON_BUCKETS} AS bucket,
               CAST('0x' || substr(md5(o_orderkey::VARCHAR || '|' ||
                    CAST(FLOOR(o_totalprice * 100) AS BIGINT)::VARCHAR), 1, 15) AS BIGINT) AS h
        FROM a
    ), hb AS (
        SELECT o_orderkey, o_orderkey % {_RECON_BUCKETS} AS bucket,
               CAST('0x' || substr(md5(o_orderkey::VARCHAR || '|' ||
                    CAST(FLOOR(o_totalprice * 100) AS BIGINT)::VARCHAR), 1, 15) AS BIGINT) AS h
        FROM b
    ), da AS (
        SELECT bucket, COUNT(*) AS n, bit_xor(h) AS x FROM ha GROUP BY 1
    ), db AS (
        SELECT bucket, COUNT(*) AS n, bit_xor(h) AS x FROM hb GROUP BY 1
    ), diff_buckets AS (
        SELECT da.bucket FROM da JOIN db ON db.bucket = da.bucket
        WHERE da.n <> db.n OR da.x <> db.x
    ), drill AS (
        SELECT ha.o_orderkey, ha.h AS h_a, hb.h AS h_b
        FROM (SELECT ha.* FROM ha JOIN diff_buckets d ON d.bucket = ha.bucket) ha
        LEFT JOIN (SELECT hb.* FROM hb JOIN diff_buckets d ON d.bucket = hb.bucket) hb
               ON hb.o_orderkey = ha.o_orderkey
    )
    SELECT o_orderkey,
           CASE WHEN h_b IS NULL THEN 'deleted' ELSE 'changed' END AS status
    FROM drill WHERE h_b IS NULL OR h_b <> h_a
    """,
    desc="merkle-style snapshot diff: bucket (count, bit_xor) digests first, row-level drill-down only in differing buckets",
)
def table_diff_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-snapshot reconciliation without a full-corpus join: compare
    per-bucket digests — (row count, bit_xor of a row hash), both
    order-independent and overflow-free — and join row-level data only
    inside buckets whose digests differ.  Snapshot B is a
    deterministic mutation of orders (every 101st key deleted, every
    97th repriced), so both engines reconstruct identical inputs.

    At 100 TB the digest pass is one map-side-combined aggregate per
    snapshot (`{_RECON_BUCKETS}` result rows) and the drill-down
    touches only the differing buckets' partitions — the merkle-tree
    shape anti-entropy repair uses.  The price folds into the hash as
    exact floor-cents (double-to-string is engine-specific; floor on
    identical doubles is not).
    """
    a = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    b = a.where(F.col("o_orderkey") % 101 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, F.col("o_totalprice") + 1.5)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )

    def hashed(df: DataFrame) -> DataFrame:
        cents = F.floor(F.col("o_totalprice") * 100).cast("long")
        return df.select(
            "o_orderkey",
            (F.col("o_orderkey") % _RECON_BUCKETS).alias("bucket"),
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("o_orderkey").cast("string"),
                            F.lit("|"),
                            cents.cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )

    ha, hb = hashed(a), hashed(b)
    da = ha.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"), F.bit_xor("h").alias("x"))
    db = hb.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"), F.bit_xor("h").alias("x"))
    diff_buckets = (
        da.alias("da")
        .join(db.alias("db"), "bucket")
        .where((F.col("da.n") != F.col("db.n")) | (F.col("da.x") != F.col("db.x")))
        .select("bucket")
    )
    ha_d = ha.join(F.broadcast(diff_buckets), "bucket")
    hb_d = hb.join(F.broadcast(diff_buckets), "bucket")
    drill = ha_d.select("o_orderkey", F.col("h").alias("h_a")).join(
        hb_d.select("o_orderkey", F.col("h").alias("h_b")), "o_orderkey", "left"
    )
    return drill.where(
        F.col("h_b").isNull() | (F.col("h_b") != F.col("h_a"))
    ).select(
        "o_orderkey",
        F.when(F.col("h_b").isNull(), F.lit("deleted"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


# --------------------------------------------------------------------------
# 4. matryoshka prefix-dimension ANN with exact recall audit
# --------------------------------------------------------------------------

_MAT_QUERIES = 5
_MAT_K = 10
_MAT_PREFIX = 16


def _dual_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, nid, rf, rp): each corpus vector's rank for each of
    the `_MAT_QUERIES` queries under the full-dimension cosine (rf)
    and the `_MAT_PREFIX`-dim prefix cosine (rp), ties broken by nid.
    One corpus stream against broadcast queries; shared by the
    matryoshka recall audit and the prefix-MRR audit."""
    emb = load_table(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where(F.col("vec_id") < _MAT_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = emb.join(F.broadcast(q), emb.vec_id != q.query_id).select(
        "query_id",
        F.col("vec_id").alias("nid"),
        cosine(F.col("qv"), F.col("v")).alias("cos_full"),
        cosine(
            F.slice(F.col("qv"), 1, _MAT_PREFIX), F.slice(F.col("v"), 1, _MAT_PREFIX)
        ).alias("cos_pre"),
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("cos_full"), F.asc("nid"))
    wp = Window.partitionBy("query_id").orderBy(F.desc("cos_pre"), F.asc("nid"))
    return scored.select(
        "query_id",
        "nid",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wp).alias("rp"),
    )


@register(
    "ann_matryoshka_prefix",
    sql=f"""
    WITH q AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_MAT_QUERIES}
    ), dr AS (
        SELECT q.vec_id AS query_id, e.vec_id AS nid,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                            e.vec_id
               ) AS rf,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(
                                (q.embedding::DOUBLE[])[1:{_MAT_PREFIX}],
                                (e.embedding::DOUBLE[])[1:{_MAT_PREFIX}]) DESC,
                            e.vec_id
               ) AS rp
        FROM q JOIN embeddings e ON e.vec_id <> q.vec_id
    )
    SELECT query_id,
           CAST({_MAT_K} AS BIGINT)  AS k,
           CAST(COUNT(*) FILTER (WHERE rf <= {_MAT_K} AND rp <= {_MAT_K}) AS BIGINT)
                                     AS n_common,
           ROUND(COUNT(*) FILTER (WHERE rf <= {_MAT_K} AND rp <= {_MAT_K})::DOUBLE
                 / {_MAT_K}, 4)      AS recall_at_k
    FROM dr
    GROUP BY query_id
    """,
    desc=f"matryoshka retrieval: {_MAT_PREFIX}-of-64-dim prefix ranking audited against full-dim exact top-{_MAT_K} recall",
)
def ann_matryoshka_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-dimension (matryoshka) retrieval audit: rank the corpus
    for each query by cosine over only the first 16 of 64 dims — the
    cheap first pass of a tiered retrieval system — and measure its
    exact recall@k against the full-dimension ranking.

    Both rankings stream the corpus once against broadcast queries
    (same shape as `ann_topk_bruteforce`); the prefix pass reads a
    quarter of the vector bytes, which at 100 TB is the point.  Both
    ranks land on the same row, so the top-k intersection is a plain
    conditional count — no audit join at all.
    """
    # both ranks live on the same row, so the intersection size is a
    # plain conditional count — no top-k self-join needed at all
    ranked = _dual_rankings(spark, sf_dir)
    common = F.count(F.when((F.col("rf") <= _MAT_K) & (F.col("rp") <= _MAT_K), 1))
    return ranked.groupBy("query_id").agg(
        F.lit(_MAT_K).cast("long").alias("k"),
        common.alias("n_common"),
        F.round(common / F.lit(_MAT_K), 4).alias("recall_at_k"),
    )
