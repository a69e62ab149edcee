"""Delta-vs-index scale probe for `dedup_incremental_components`
(VERDICT r13 ask #4) — the incremental cluster-maintenance entry whose
scaling knob is the DELTA/INDEX ratio.

The registered entry's claim: merging a new ingest batch into an
existing corpus's cluster assignment costs (delta banding) + (band-
index probe) + (bounded verify) + (min-label over STAR edges + delta
edges) — never a re-cluster of the corpus.  The hazard at 100 TB is a
hidden corpus-sized term in the incremental leg: if the probe join,
the star build, or the label propagation secretly scaled with the
FULL edge history, a daily delta against a billion-doc corpus would
cost like the rebuild it exists to avoid.

This probe measures both axes with the entry's OWN machinery
(`minhash_band_buckets`, `exact_jaccard_verify`,
`min_label_components` — not a reimplementation):

* axis 1 — fixed delta (500 docs), existing corpus 2k / 20k / 200k
  (100x): incremental wall vs the full rebuild's wall at each size.
  The incremental leg may keep a SCAN-shaped corpus term (the probe
  join reads the persisted index; at 100 TB that index is bucketed by
  (band, sig) so the scan prunes to matching buckets — locally it is
  a flat parquet read), but must stay far below the rebuild.
* axis 2 — fixed corpus (20k), delta 100 / 1k / 10k (100x):
  incremental wall must track DELTA size.

Corpus is built with id arithmetic only (no RNG — reproducible):
every 5th id-triple is an exact-dup triple (20% of docs carry a dup
edge), and every 4th delta doc duplicates an existing dup-triple's
text so cross-corpus merges actually exercise the star union.

One JSON line per measured row; the table goes into SCALE.md.

Usage: PYTHONPATH=/root/repo python tools/incr_components_scale_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(REPO, ".scratch", "probe_incr_cc_r14")

N_DELTA_FIXED = 500
EXISTING_SIZES = [2_000, 20_000, 200_000]
N_EXISTING_FIXED = 20_000
DELTA_SIZES = [100, 1_000, 10_000]
TOKENS_PER_DOC = 40


def synth_docs(spark, n_existing: int, n_delta: int):
    """(doc_id, text) with deterministic dup structure.  Existing ids
    [0, n_existing); delta ids [n_existing, n_existing + n_delta).
    Existing: ids in a triple {15m, 15m+1, 15m+2} share text (every
    5th triple → 20% of docs have an exact dup).  Delta: every 4th doc
    reuses an existing dup-triple's text key (cross-corpus edge), the
    rest are unique."""
    from pyspark.sql import functions as F

    n_triples = max(1, n_existing // 15)
    base = spark.range(n_existing).select(
        F.col("id").alias("doc_id"),
        F.when(
            (F.col("id") % 15) < 3, (F.col("id") - (F.col("id") % 15))
        )
        .otherwise(F.col("id") + 1_000_000_000)
        .alias("key"),
    )
    delta = spark.range(n_delta).select(
        (F.col("id") + n_existing).alias("doc_id"),
        F.when(
            F.col("id") % 4 == 0, (F.floor(F.col("id") / 4) % n_triples) * 15
        )
        .otherwise(F.col("id") + 2_000_000_000)
        .alias("key"),
    )
    both = base.unionByName(delta)
    # tokens are xxhash64-mixed per (key, position): an AFFINE scheme
    # (key*a + j*b mod p) makes every doc a window of one global
    # arithmetic progression, so docs whose offsets differ by a small
    # token shift become ACCIDENTAL near-dups and chain into giant
    # components — the first draft of this probe hit exactly that
    loks = F.transform(
        F.sequence(F.lit(0), F.lit(TOKENS_PER_DOC - 1)),
        lambda j: F.concat(
            F.lit("tok"),
            F.pmod(F.xxhash64(F.col("key"), j), F.lit(100_000)).cast("string"),
        ),
    )
    return both.select("doc_id", F.array_join(loks, " ").alias("text"))


def incremental_leg(spark, docs, split: int, idx_path: str, asg_path: str) -> int:
    """The registered entry's incremental body against PRE-BUILT
    persisted artifacts: band the delta, probe the persisted index,
    verify candidates, star-merge with the persisted assignment,
    min-label to fixpoint.  Returns the cluster-row count (the
    action)."""
    from pyspark.sql import functions as F

    from sparkml_som_spark.operators.dedup import (
        exact_jaccard_verify,
        min_label_components,
        minhash_band_buckets,
    )

    index_existing = spark.read.parquet(idx_path)
    assign = spark.read.parquet(asg_path)
    delta = minhash_band_buckets(docs.where(F.col("doc_id") >= split))
    index = index_existing.unionByName(delta)
    cand = (
        delta.alias("x")
        .join(
            index.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col("x.doc_id") != F.col("y.doc_id")),
        )
        .select(
            F.least("x.doc_id", "y.doc_id").alias("a_id"),
            F.greatest("x.doc_id", "y.doc_id").alias("b_id"),
        )
        .distinct()
    )
    delta_edges = exact_jaccard_verify(docs, cand).select("a_id", "b_id")
    star = assign.where(F.col("node") != F.col("label")).select(
        F.col("node").alias("a_id"), F.col("label").alias("b_id")
    )
    merged = star.unionByName(delta_edges)
    sym = merged.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).union(merged.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
    return min_label_components(sym).count()


def rebuild_leg(spark, docs) -> int:
    """Full recompute with the SAME machinery (band the whole corpus,
    self-join candidates, verify, min-label) — the cost the
    incremental shape exists to avoid paying per batch."""
    from pyspark.sql import functions as F

    from sparkml_som_spark.operators.dedup import (
        exact_jaccard_verify,
        min_label_components,
        minhash_band_buckets,
    )

    buckets = minhash_band_buckets(docs)
    cand = (
        buckets.alias("x")
        .join(
            buckets.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id"))
        .distinct()
    )
    edges = exact_jaccard_verify(docs, cand).select("a_id", "b_id")
    sym = edges.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).union(edges.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
    return min_label_components(sym).count()


def build_artifacts(spark, docs, split: int, idx_path: str, asg_path: str) -> None:
    """The build-once persisted index + assignment (exactly what
    `dedup_incremental_components` _SUCCESS-gates) for the existing
    half of `docs` — built OUTSIDE the timed region, like production
    where the index predates the batch."""
    from pyspark.sql import functions as F

    from sparkml_som_spark.operators.dedup import (
        exact_jaccard_verify,
        min_label_components,
        minhash_band_buckets,
    )

    existing = docs.where(F.col("doc_id") < split)
    buckets = minhash_band_buckets(existing)
    buckets.write.mode("overwrite").parquet(idx_path)
    idx = spark.read.parquet(idx_path)
    cand = (
        idx.alias("x")
        .join(
            idx.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id"))
        .distinct()
    )
    edges = exact_jaccard_verify(docs, cand).select("a_id", "b_id")
    sym = edges.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).union(edges.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
    min_label_components(sym).write.mode("overwrite").parquet(asg_path)


def timed_best2(fn) -> tuple[float, int]:
    best, out = None, None
    for _ in range(2):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2), out


def main() -> None:
    from sparkml_som_spark.session import get_spark

    spark = get_spark("incr-cc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(SCRATCH, ignore_errors=True)

    rows = []

    def measure(n_existing: int, n_delta: int, axis: str) -> None:
        docs = synth_docs(spark, n_existing, n_delta).persist()
        docs.count()
        idx_path = os.path.join(SCRATCH, f"idx_{n_existing}_{n_delta}")
        asg_path = os.path.join(SCRATCH, f"asg_{n_existing}_{n_delta}")
        t0 = time.time()
        build_artifacts(spark, docs, n_existing, idx_path, asg_path)
        print(
            f"# built index+assignment for existing={n_existing} "
            f"delta={n_delta} in {time.time() - t0:.1f}s",
            flush=True,
        )
        incr_sec, incr_rows = timed_best2(
            lambda: incremental_leg(spark, docs, n_existing, idx_path, asg_path)
        )
        reb_sec, _ = timed_best2(lambda: rebuild_leg(spark, docs))
        row = {
            "axis": axis,
            "n_existing": n_existing,
            "n_delta": n_delta,
            "incr_sec": incr_sec,
            "rebuild_sec": reb_sec,
            "incr_over_rebuild": round(incr_sec / reb_sec, 2),
            "cluster_rows": incr_rows,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        docs.unpersist()

    for n in EXISTING_SIZES:
        measure(n, N_DELTA_FIXED, "corpus_100x_fixed_delta")
    for d in DELTA_SIZES:
        measure(N_EXISTING_FIXED, d, "delta_100x_fixed_corpus")

    # scaling summaries the SCALE.md table quotes directly
    ax1 = [r for r in rows if r["axis"] == "corpus_100x_fixed_delta"]
    ax2 = [r for r in rows if r["axis"] == "delta_100x_fixed_corpus"]
    print(
        json.dumps(
            {
                "incr_wall_ratio_at_100x_corpus": round(
                    ax1[-1]["incr_sec"] / ax1[0]["incr_sec"], 2
                ),
                "rebuild_wall_ratio_at_100x_corpus": round(
                    ax1[-1]["rebuild_sec"] / ax1[0]["rebuild_sec"], 2
                ),
                "incr_wall_ratio_at_100x_delta": round(
                    ax2[-1]["incr_sec"] / ax2[0]["incr_sec"], 2
                ),
            }
        ),
        flush=True,
    )
    shutil.rmtree(SCRATCH, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
