"""Hot-document cap-bound probe for `pmi_term_pairs` (VERDICT r13
ask #4) — verifies the per-doc cap's closed-form pair bound under an
adversarially hot document.

`pmi_term_pairs`' pair build is a self-join keyed on doc_id, so its
per-key fan-out is C(in-band terms in the doc, 2) — the quadratic
hot-KEY hazard is a hot DOC.  Two bounds exist in the registered
shape:

* the df band itself: in-band vocabulary is structurally bounded at
  (total token rows) / (0.05 * ndocs) = avg_terms_per_doc / 0.05, so
  no document can carry more in-band terms than ~20x the corpus's
  average document;
* the `_PMI_DOC_CAP` = 64 deterministic per-doc cap (row_number over
  term order), which hard-bounds EVERY doc's pair contribution at
  C(64, 2) = 2016 regardless of how many in-band terms it carries.

This probe builds an id-arithmetic corpus (no RNG), injects one hot
document carrying H in-band terms, and measures the pair-build stage
capped (the registered shape) vs uncapped:

* closed-form check: capped pair instances grow by EXACTLY
  C(min(H, 64), 2) when the hot doc appears; uncapped grow by C(H, 2);
* non-hot isolation: the capped leg's pair multiset restricted to
  non-hot documents is identical with and without the hot doc (the
  cap is per-doc, so one doc's heat cannot perturb another's pairs);
* wall: the capped build stays flat in H while the uncapped build
  carries the C(H, 2) term.

Corpus: 4,000 docs over a 400-term vocabulary; term t lives in a
contiguous 400-doc slice (df = 10% of ndocs — inside the [5%, 80%]
band), giving ~40 in-band terms per base doc (under the cap, so the
cap binds ONLY on the hot doc and the isolation check is exact).

One JSON line per measured row; results table lives in SCALE.md.

Usage: PYTHONPATH=/root/repo python tools/pmi_hot_doc_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 4_000
VOCAB = 400
DF_SLICE = 400  # docs per term: 10% of N_DOCS — inside the [5%, 80%] band
HOTS = [0, 128, 400]
HOT_DOC_ID = N_DOCS  # id reserved for the hot document
CAP = 64  # mirrors _PMI_DOC_CAP


def token_rows(spark, hot: int):
    """(doc_id, term) in-band membership rows: term t covers docs
    [t * 10, t * 10 + DF_SLICE) mod N_DOCS (per-term df = DF_SLICE), plus
    one hot doc carrying the first `hot` vocabulary terms."""
    from pyspark.sql import functions as F

    base = (
        spark.range(VOCAB * DF_SLICE)
        .select(
            (F.col("id") % VOCAB).alias("t"),
            F.floor(F.col("id") / VOCAB).alias("k"),
        )
        .select(
            ((F.col("t") * 10 + F.col("k")) % N_DOCS).alias("doc_id"),
            F.concat(F.lit("term"), F.format_string("%04d", F.col("t"))).alias(
                "term"
            ),
        )
        .distinct()
    )
    if hot == 0:
        return base
    hot_df = spark.range(hot).select(
        F.lit(HOT_DOC_ID).alias("doc_id"),
        F.concat(F.lit("term"), F.format_string("%04d", F.col("id"))).alias("term"),
    )
    return base.unionByName(hot_df)


def pair_instances(toks, cap: bool):
    """The registered entry's pair-build stage (per-doc cap by
    row_number over term order, self-join with t1 < t2), returning the
    TOTAL pair-instance count and the per-stage wall.  `cap=False`
    removes only the cap — the hazard variant."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    capped = toks
    if cap:
        w = Window.partitionBy("doc_id").orderBy("term")
        capped = (
            toks.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= CAP)
            .select("doc_id", "term")
        )
    right = capped.select(F.col("doc_id").alias("r_doc"), F.col("term").alias("t2"))
    pairs = capped.withColumnRenamed("term", "t1").join(
        right, (F.col("doc_id") == F.col("r_doc")) & (F.col("t1") < F.col("t2"))
    )
    return pairs.count()


def nonhot_pair_multiset(spark, toks):
    """Aggregated (t1, t2, n12) multiset over NON-hot docs only, under
    the cap — the isolation invariant's comparison object."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("doc_id").orderBy("term")
    capped = (
        toks.where(F.col("doc_id") != HOT_DOC_ID)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= CAP)
        .select("doc_id", "term")
    )
    right = capped.select(F.col("doc_id").alias("r_doc"), F.col("term").alias("t2"))
    return {
        (r["t1"], r["t2"]): r["n12"]
        for r in (
            capped.withColumnRenamed("term", "t1")
            .join(right, (F.col("doc_id") == F.col("r_doc")) & (F.col("t1") < F.col("t2")))
            .groupBy("t1", "t2")
            .agg(F.count("*").alias("n12"))
            .collect()
        )
    }


def timed_best2(fn):
    best, out = None, None
    for _ in range(2):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2), out


def main() -> None:
    from sparkml_som_spark.session import get_spark

    spark = get_spark("pmi-hot-doc-probe")
    spark.sparkContext.setLogLevel("ERROR")

    base_capped = base_uncapped = None
    baseline_multiset = None
    for hot in HOTS:
        toks = token_rows(spark, hot).persist()
        n_toks = toks.count()
        cap_sec, cap_pairs = timed_best2(lambda: pair_instances(toks, cap=True))
        unc_sec, unc_pairs = timed_best2(lambda: pair_instances(toks, cap=False))
        if hot == 0:
            base_capped, base_uncapped = cap_pairs, unc_pairs
            baseline_multiset = nonhot_pair_multiset(spark, toks)
        else:
            # closed-form cap bound: the hot doc adds EXACTLY
            # C(min(H, CAP), 2) capped / C(H, 2) uncapped pair instances
            k = min(hot, CAP)
            assert cap_pairs - base_capped == k * (k - 1) // 2, (
                cap_pairs,
                base_capped,
                k,
            )
            assert unc_pairs - base_uncapped == hot * (hot - 1) // 2, (
                unc_pairs,
                base_uncapped,
                hot,
            )
            # non-hot isolation: the capped pair multiset over non-hot
            # docs is untouched by the hot doc's presence
            assert nonhot_pair_multiset(spark, toks) == baseline_multiset
        print(
            json.dumps(
                {
                    "hot_terms": hot,
                    "token_rows": n_toks,
                    "capped_pairs": cap_pairs,
                    "uncapped_pairs": unc_pairs,
                    "capped_sec": cap_sec,
                    "uncapped_sec": unc_sec,
                    "hot_capped_contrib": (cap_pairs - base_capped) if hot else 0,
                    "hot_uncapped_contrib": (unc_pairs - base_uncapped) if hot else 0,
                }
            ),
            flush=True,
        )
        toks.unpersist()
    print(json.dumps({"closed_form_checks": "all passed", "cap": CAP}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
