"""Measure how representative queries scale across sf0.001 -> 0.1
(100x rows).  Near-flat wall-clock growth at local scale means the cost
is job-launch floor + per-row work, with no superlinear term (the thing
that would explode at 100 TB).  Results table lives in SCALE.md.

Usage: PYTHONPATH=/root/repo python tools/scale_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
QUERIES = [
    "q3_shipping_priority",        # broadcast-dim join + agg
    "q12_priority_class",          # fact-fact shuffle join
    "window_topk_orders_per_customer",  # window on one shuffle
    "dedup_minhash_lsh",           # banded LSH candidate generation
    "decontam_ngram_overlap",      # broadcast semi-join on corpus scan
    "char_entropy_quality",        # explode + map-side-combined agg
    "som_count_invariant",         # SOM fit + transform pass
    "shard_assignment_balanced",   # two-phase distributed global ranking
    "negative_sampling_pairs",     # stride-bijection self-join
    "histogram_event_values",      # floor-binned map-side combine
    "pipeline_training_manifest",  # trim -> dedup -> rank -> shard composed
    "corpus_mixture_weights",      # corpus agg + one-row broadcast total
    "length_trim_quantile",        # one-row quantile bounds broadcast
    "funnel_cohort_daily",         # 3 keyed hops + per-day rollup
    "zorder_layout_events",        # codegen bit-interleave + bounded agg
    "inverted_index_postings",     # capped postings, co-partitioned df
    "retention_cohort_matrix",     # user_id-co-partitioned hops
    "dpp_partitioned_fact_join",   # runtime partition pruning
    "incremental_agg_merge",       # delta-only refresh + partial merge
    "curriculum_phases",           # quality rank -> phase rollup
    "mixture_resample_apply",      # broadcast weights + hash fan-out
    "anomaly_zscore_daily",        # bounded-table window
    "decayed_activity_counts",     # bounded-first decay join (dyadic-exact)
    "pagerank_nation_flows",       # edge agg + 3 broadcast-rank iterations
    "pmi_term_pairs",              # df-banded capped pair self-join
    "bitmap_distinct_users",       # 32-wide bit_or pack before shuffle
    "rolling_active_users",        # distinct-pair x7 fan-out
    "histogram_equidepth_prices",  # two-phase rank -> bounded buckets
    "pack_greedy_capacity",        # applyInPandas sequential fold per stratum
    "feature_scale_lineitem",      # one-row stats broadcast onto scan
    "attribution_multi_touch",     # user-keyed interval join + pid window
    "sketch_merge_rolling_distinct",  # per-day HLL sketches unioned per anchor
    "triangle_count_copurchase",   # degree-oriented wedge join
    "basket_lift_brand_pairs",     # order-keyed pair self-join + broadcasts
    "countmin_heavy_hitters",      # mergeable sketch cells + broadcast back
    "bloom_semijoin_customers",    # bounded bit-set broadcast probe
    "table_diff_reconcile",        # bucket digests + differing-bucket drill
    "ann_matryoshka_prefix",       # single-pass dual ranking vs broadcast queries
    "interval_coverage_users",     # per-user running-max-end prefix merge
    "drift_tv_distance",           # bounded histogram + broadcast totals
    "rag_context_pack",            # ANN + budget pack composition
    "dedup_canonical_pick",        # cluster + quality argmax composition
    "split_train_val_test",        # codegen md5 bands + bounded audit
    "session_bounce_rollup",       # per-user session windows + day rollup
    "kanon_quasi_identifier_audit",  # one-aggregate privacy audit
    "join_key_skew_audit",         # key-frequency agg + TakeOrdered
    "cogroup_order_reconcile",     # bucketed cogrouped-map reconciliation
    "silhouette_simplified_labels",  # centroid-based, no all-pairs
    "survival_km_purchase",        # bounded life-table product fold
    "open_orders_backlog",         # delta events + bounded-spine cumsum
    "gini_revenue_concentration",  # two-phase-rank-powered Gini
    "stream_countmin_merge",       # per-batch additive sketch merges
    "auc_urgent_order_price",      # Mann-Whitney fold over bounded bands
    "ndcg_label_retrieval",        # broadcast-queries ranking eval
    "quota_largest_remainder",     # bounded source table + one-row total
    "cusum_drift_revenue",         # bounded day-spine cumulative fold
    "gains_lift_price_bands",      # bounded-band cumulative windows
    "info_gain_urgency_features",  # bounded contingency cells
    "kappa_langid_agreement",      # langid pipeline + bounded confusion
    "psi_value_drift",             # Laplace-smoothed bounded band cells
    "ratio_metric_delta_ab",       # one row of moments per arm
    # round-7 wave
    "sessionize_two_phase",        # bucket-local windows + session-level merge
    "dedup_incremental_minhash",   # delta probes the band index
    "cross_source_overlap",        # pair-set join to bounded source grid
    "near_dup_rate_by_source",     # pair-involvement left join
    "quality_char_bigram_logloss", # bigram stream + bounded-vocab broadcast
    "embedding_pq_encode",         # sampled-Lloyd train + one encode pass
    "ann_pq_adc",                  # code scan + LUT lookups, pair audit
    "som_outlier_audit",           # distanceCol pass + 25-cell thresholds
    "som_per_label_models",        # applyInPandas, one SOM per label
    "window_rank_family_events",   # ntile/percent_rank/cume_dist windows
    "stream_trending_topk",        # windowed counts + bounded post-rank
    "stream_left_outer_join",      # watermark-gated outer join state
    # round-8 wave
    "dedup_substring_runs",        # positional-gram index + diagonal chaining
    "dedup_span_coverage",         # span interval-union per doc
    "dedup_incremental_substring", # delta probes the persisted gram index
    "bpe_train_merges",            # corpus pass + bounded vocab merge loop
    "pii_luhn_audit",              # codegen digit fold, bounded rollup
    "quality_bigram_filter",       # bigram broadcast + two-phase rank cut
    "ann_ivf_pq",                  # residual PQ + probed-cell partial top-k
    "asof_tolerance_join",         # carry-forward asof + tolerance filter
    "stream_minhash_dedup_guard",  # per-batch band probe + verified admission
    "semdedup_grid_cosine",        # grid-blocked within-cell cosine dedup
    "sql_group_by_all",            # GROUP BY ALL sugar == plain hash agg
    "bpe_apply_segment",           # vocab-bounded segmentation map join
    "dedup_span_explain",          # chain islands + token-slice join back
    # round-9 wave
    "stream_interval_join_bucketed",  # time-bucketed equi-key join state
    "dedup_incremental_components",   # star edges + delta probe relabel
    "bm25_rank_docs",                 # postings-bounded BM25 + TakeOrdered
    "cdc_apply_changes",              # latest-change window + anti/union apply
    "dsir_importance_weights",        # hashed-ngram features + broadcast LM ratio
    "quality_naive_bayes",            # token-likelihood NB vs bounded vocab
    "phrase_search_positional",       # positional postings + adjacency join
    "hybrid_rrf_fusion",              # BM25 + cosine rank lists, RRF merge
    "community_lpa_parts",            # bounded-round synchronized LPA
    "recs_item_item_cosine",          # per-customer C(b,2) pair fan-out
    "hard_negative_mining",           # broadcast queries + salted top-k
    "quantile_mergeable_sketch",      # additive histogram cells + read-off
    "jackknife_ratio_ci",             # per-stratum stats + 80-row fold
    "normalize_dedup_gain",           # codegen canonicalize + distinct agg
    "stream_quantile_merge",          # per-batch histogram cells, additive merge
    "match_recognize_funnel",         # per-user islands + rn-equi accept join
    "lsh_tuning_curve",               # one signature set, banded 6-config sweep
    "poisson_bootstrap_ci",           # 64 parallel aggregates, one-row shuffle
    "pit_feature_join",               # union-and-carry as-of, one keyed shuffle
    "seed_expansion_ppr",             # sparse-frontier PPR over bounded edges
    "purged_time_split",              # one agg + scalar cutoffs + grouped pass
    "split_dedup_leakage",            # bounded pair-set join to split grid
    # round-10 wave
    "som_grouped_cv",                 # md5 group folds + K independent fits
    "sample_dedup_stratified",        # within-cell dedup + k-per-cell draw
    "media_audio_chunk_plan",         # metadata-only overlapping chunker
    # round-11 wave
    "rerank_cross_features",          # bounded-pool cross-features rerank
    "semdedup_som_cells",             # top-2 SOM-cell blocked dedup + audits
    "stream_dedup_stratified_sample",  # per-batch cell guard + hash reservoir
]


def main() -> None:
    import __spark_entry__ as entrymod
    from sparkml_som_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    only = [q for q in os.environ.get("SCALE_PROBE_ONLY", "").split(",") if q]
    names = [q for q in QUERIES if q in only] if only else QUERIES
    out: dict[str, list[float]] = {}
    for name in names:
        fn = queries[name]
        times = []
        for sf in SFS:
            fn(spark, sf).collect()  # warm (cache fits, JIT)
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf).collect()
                best = min(best, time.time() - t0)
            times.append(round(best, 3))
        out[name] = times
        print(name, times, flush=True)
    print(json.dumps({"sfs": [0.001, 0.01, 0.1], "seconds": out}))
    spark.stop()


if __name__ == "__main__":
    main()
