"""Analytics operators, round 5 tenth wave: hierarchy share-of-parent
reporting, tokenizer vocabulary-coverage QA, a declarative
overlap-chunk planner (the JVM-side twin of the Python UDTF chunker),
and RAG context assembly (ANN top-k + token-budget greedy pack in one
query).

Scale discipline, per operator:

- share-of-parent aggregates the corpus ONCE to the bounded nation
  grid (broadcast dimension joins), derives region totals from the
  bounded grid, and rounds each level once so the share ratios divide
  already-quarantined doubles — no window over raw rows;
- vocabulary coverage builds the vocab from the corpus token counts
  (bounded by distinct tokens, deterministic count-then-token
  ordering), broadcasts it, and scores the corpus in one pass;
- the chunk planner is pure integer arithmetic per doc (no Python,
  no explode of chunk rows until the plan needs them) — whole-stage
  codegen end-to-end, the scale path beside `udtf_chunk_documents`'
  deliberately row-at-a-time API demonstration;
- RAG packing composes the brute-force ANN ranking (corpus streamed
  once vs broadcast queries) with a per-query running-sum budget cut
  over q*k rows — the pack window is bounded by k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkml_som_spark.functions import cosine
from sparkml_som_spark.operators.registry import register
from sparkml_som_spark.sources import load_table


# --------------------------------------------------------------------------
# 1. hierarchy share-of-parent revenue report
# --------------------------------------------------------------------------


@register(
    "share_of_parent_revenue",
    sql="""
    WITH nat AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               ROUND(SUM(o.o_totalprice), 4) AS nation_rev
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2
    ), reg AS (
        SELECT region, ROUND(SUM(nation_rev), 4) AS region_rev FROM nat GROUP BY 1
    ), tot AS (
        SELECT ROUND(SUM(region_rev), 4) AS total_rev FROM reg
    )
    SELECT nat.region, nat.nation, nat.nation_rev, reg.region_rev,
           ROUND(nat.nation_rev / reg.region_rev, 6) AS share_of_region,
           ROUND(nat.nation_rev / tot.total_rev, 6)  AS share_of_total
    FROM nat JOIN reg ON reg.region = nat.region, tot
    """,
    desc="hierarchical share-of-parent: nation revenue within region and total; each level rounded once at its bounded grid",
)
def share_of_parent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reporting staple: each nation's revenue, its share of the
    region, and its share of the corpus total.

    The corpus aggregates ONCE to the bounded nation grid (all
    dimension hops are broadcast joins); region and total levels are
    derived from that bounded grid, each rounded once so the share
    ratios divide already-quarantined doubles — engine-exact without
    any window over raw rows.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nat = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.round(F.sum("o_totalprice"), 4).alias("nation_rev"))
    )
    reg = nat.groupBy("region").agg(F.round(F.sum("nation_rev"), 4).alias("region_rev"))
    tot = reg.agg(F.round(F.sum("region_rev"), 4).alias("total_rev"))
    return (
        nat.join(F.broadcast(reg), "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "region",
            "nation",
            "nation_rev",
            "region_rev",
            F.round(F.col("nation_rev") / F.col("region_rev"), 6).alias(
                "share_of_region"
            ),
            F.round(F.col("nation_rev") / F.col("total_rev"), 6).alias(
                "share_of_total"
            ),
        )
    )


# --------------------------------------------------------------------------
# 2. tokenizer vocabulary-coverage QA
# --------------------------------------------------------------------------

_VOCAB_K = 20


@register(
    "tokenizer_vocab_coverage",
    sql=f"""
    WITH toks AS (
        SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ), vocab AS (
        SELECT tok FROM (
            SELECT tok, COUNT(*) AS cnt,
                   ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS r
            FROM toks GROUP BY tok
        ) WHERE r <= {_VOCAB_K}
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT)                       AS n_tokens,
           CAST(COUNT(*) FILTER (WHERE v.tok IS NULL) AS BIGINT) AS n_oov,
           ROUND(1.0 - COUNT(*) FILTER (WHERE v.tok IS NULL)::DOUBLE / COUNT(*), 6)
               AS coverage
    FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
    GROUP BY t.source
    """,
    desc=f"tokenizer QA: corpus-derived top-{_VOCAB_K} vocab (count-then-token ordering), per-source OOV rate via broadcast vocab join",
)
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary QA: build the top-K vocabulary from corpus
    token counts (deterministic count-then-token ordering) and report
    each source's token total, out-of-vocabulary count, and coverage —
    the health check run before committing to a tokenizer.

    The vocab derives from the bounded distinct-token count table and
    broadcasts onto the corpus token stream; per-source stats are one
    map-side-combined aggregate.  The OOV join is LEFT so unseen
    tokens count, not vanish.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    # top-K selection as orderBy+limit (TakeOrderedAndProject — a
    # bounded per-partition top-k + driver merge, no global window)
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(_VOCAB_K)
        .select(F.col("tok").alias("vtok"))
    )
    j = toks.join(F.broadcast(vocab), toks.tok == vocab.vtok, "left")
    oov = F.count(F.when(F.col("vtok").isNull(), 1))
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        oov.alias("n_oov"),
        F.round(1.0 - oov.cast("double") / F.count(F.lit(1)), 6).alias("coverage"),
    )


# --------------------------------------------------------------------------
# 3. declarative overlap-chunk planner
# --------------------------------------------------------------------------

_CHUNK_LEN = 40
_CHUNK_STRIDE = 30


@register(
    "chunk_overlap_plan",
    sql=f"""
    WITH d AS (
        SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens
        FROM documents
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(CASE WHEN n_tokens <= {_CHUNK_LEN} THEN 1
                ELSE 1 + CAST(CEIL((n_tokens - {_CHUNK_LEN}) / {_CHUNK_STRIDE}.0) AS BIGINT)
                END AS BIGINT)      AS n_chunks,
           CAST(CASE WHEN n_tokens <= {_CHUNK_LEN} THEN 0
                ELSE {_CHUNK_STRIDE} * CAST(CEIL((n_tokens - {_CHUNK_LEN}) / {_CHUNK_STRIDE}.0) AS BIGINT)
                END AS BIGINT)      AS last_start,
           CASE WHEN n_tokens <= {_CHUNK_LEN} THEN TRUE
                ELSE {_CHUNK_STRIDE} * CAST(CEIL((n_tokens - {_CHUNK_LEN}) / {_CHUNK_STRIDE}.0) AS BIGINT)
                     < n_tokens
                END                 AS covers_all
    FROM d
    """,
    desc=f"overlap-chunk planner (len {_CHUNK_LEN}, stride {_CHUNK_STRIDE}): pure integer arithmetic per doc, codegen end-to-end — the JVM twin of the UDTF chunker",
)
def chunk_overlap_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunk PLANNING as closed-form integer arithmetic:
    per doc, the chunk count for (len=40, stride=30) overlap chunking,
    the last chunk's start offset, and the coverage invariant (the
    last chunk reaches the end of the doc).

    This is the whole-stage-codegen twin of `udtf_chunk_documents`
    (which exists to demonstrate the row-at-a-time Python UDTF API):
    at 100 TB you want the planner and any chunk materialization to
    stay JVM-side, exploding only the chunks a downstream stage
    actually consumes.
    """
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.lower("text"), " "))
    extra = F.ceil((n - _CHUNK_LEN) / float(_CHUNK_STRIDE)).cast("long")
    n_chunks = F.when(n <= _CHUNK_LEN, F.lit(1)).otherwise(1 + extra).cast("long")
    last_start = (
        F.when(n <= _CHUNK_LEN, F.lit(0)).otherwise(_CHUNK_STRIDE * extra).cast("long")
    )
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        n_chunks.alias("n_chunks"),
        last_start.alias("last_start"),
        F.when(n <= _CHUNK_LEN, F.lit(True))
        .otherwise(_CHUNK_STRIDE * extra < n)
        .alias("covers_all"),
    )


# --------------------------------------------------------------------------
# 4. RAG context assembly: ANN top-k + token-budget greedy pack
# --------------------------------------------------------------------------

_RAG_QUERIES = 5
_RAG_K = 5
_RAG_BUDGET = 150


@register(
    "rag_context_pack",
    sql=f"""
    WITH q AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_RAG_QUERIES}
    ), ranked AS (
        SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                            e.vec_id
               ) AS rank
        FROM q JOIN embeddings e ON e.vec_id <> q.vec_id
    ), topk AS (
        SELECT query_id, ranked.doc_id AS doc_id, rank,
               len(string_split(lower(d.text), ' ')) AS n_tokens
        FROM ranked JOIN documents d ON d.doc_id = ranked.doc_id
        WHERE rank <= {_RAG_K}
    ), packed AS (
        SELECT query_id, doc_id, rank, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY query_id ORDER BY rank
                                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM topk
    )
    SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM packed WHERE cum_tokens <= {_RAG_BUDGET}
    """,
    desc=f"RAG context assembly: exact top-{_RAG_K} ANN + {_RAG_BUDGET}-token greedy pack in rank order, one composed query",
)
def rag_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retrieval-augmented-generation context builder as ONE
    query: exact top-k cosine neighbors per query vector, joined to
    their documents, packed greedily in rank order until the token
    budget is exhausted.

    Composition keeps each stage's scale shape: the ANN ranking
    streams the corpus once against broadcast queries; the doc join
    touches q*k rows; the budget cut is a running sum over a window
    bounded by k.  Ties and token counts are deterministic, so the
    packed context is byte-stable across engines.
    """
    emb = load_table(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    docs = load_table(spark, sf_dir, "documents")
    q = emb.where(F.col("vec_id") < _RAG_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("doc_id"))
    ranked = (
        emb.join(F.broadcast(q), emb.vec_id != q.query_id)
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= _RAG_K)
    )
    topk = ranked.join(docs.select("doc_id", "text"), "doc_id").select(
        "query_id",
        "doc_id",
        "rank",
        F.size(F.split(F.lower("text"), " ")).cast("long").alias("n_tokens"),
    )
    wp = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        topk.withColumn("cum_tokens", F.sum("n_tokens").over(wp))
        .where(F.col("cum_tokens") <= _RAG_BUDGET)
        .select("query_id", "doc_id", F.col("rank").cast("long").alias("rank"), "n_tokens", "cum_tokens")
    )
