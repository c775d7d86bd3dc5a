"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship incremental-load pipeline at sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 (+ the LLM-data-pipeline extensions), each paired with a
DuckDB-runnable ANSI-SQL oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dwh_etl_ods_spark_jobs_spark.plans import (  # noqa: E402
    catalog_job,
    coverage,
    curation,
    graph,
    job_filters,
    job_rules,
    pipeline,
    quality,
    showcase,
    sketches,
    staged,
    staged_r9,
    staged_r10,
)

# The driver's CORRECTNESS gate records the FIRST 50 queries() entries;
# anything beyond is silently skipped (observed r5: 54 entries, 4 dropped).
# Order so (a) queries changed this round and (b) entries never/longest
# unverified land inside the window; rotate the _TAIL every round so no
# query goes unverified two rounds running (pinned by
# tests/test_entry_contract.py::test_tail_freshness_invariant).
#
# r10 WINDOW PLAN (executes the r9 commitment, VERDICT r9 #1; battery
# consolidated 120 + 28 staged_r10 - 9 retired = 139 — the 9 retirement
# candidates from plans/staged_r10.py:42-58 (text_stats_tokens,
# text_filter_pipeline, dedup_ngram_jaccard, ann_lsh_multiprobe,
# ann_ivf_nprobe2, tpch_q5_local_volume, tpch_q14_promo_share,
# full_outer_coalesce, sessionize_gap) moved to per-module
# RETIRED_QUERIES, oracle-gated by tests/test_retired_surfaces.py):
#   _HEAD = 28 newly registered plans/staged_r10.py entries (never gated)
#         + 22 rotation-due r7-remainder entries (the committed "first 22"
#           — after the 7 in-block retirements the rotation-due block is
#           23 entries, so the only overflow is json_extract, covered by
#           the committed r10 tools/check_oracle.py --log-sweep run).
#   _TAIL = first the 38 surviving r8-hard-gate-verified entries
#           (rotation-due r11) + json_extract, then the 50 r9-gated
#           entries (fresh).
# r11 COMMITMENT (exact arithmetic, enforced by the freshness test):
# plans/staged_r11.py holds 11 entries (auc_price_returns,
# calibration_price_returns, dedup_weighted_jaccard,
# minhash_estimate_eval, ohlc_daily_value, nearest_click_join,
# fd_violation_census, embedding_distance_histogram,
# bootstrap_order_value_ci, graph_bfs_reach, hll_error_eval), so
# _HEAD_r11 = those 11 + ALL 39 rotation-due _TAIL entries below
# (hll_set_algebra .. corpus_prep_pipeline, then json_extract) = 50
# exactly — zero rotation-due overflow. Everything else outside the
# window gets the committed tools/check_oracle.py --log-sweep run
# (tools/sweep_log.json). Battery 139 + 11 = 150 at registration unless
# r11 retirements land.
# r12 COMMITMENT (one round ahead, same discipline): plans/staged_r12.py
# holds 9 entries (intra_doc_repetition, pr_threshold_sweep,
# ndcg_bm25_eval, cohens_kappa_agreement, corr_matrix_onepass,
# cms_join_size_estimate, edit1_name_linkage, zipf_alpha_by_source,
# quantile_band_coverage). After the r11 rotation the r12 rotation-due
# block is the 50 r10-gated entries (this _HEAD: 28 staged_r10 + 22
# r7-remainder), so _HEAD_r12 = 9 staged_r12 + the FIRST 41 of them;
# the 9 overflow (tail of the r7-remainder block) get the committed
# logged sweep. Battery 150 + 9 = 159 at r12 registration unless
# retirements land.
# r13 SEED (no window arithmetic committed yet — the r12 rotation must
# land first): plans/staged_r13.py holds 9 further parity-pinned
# entries (rendezvous_shard_churn, salted_topk_per_type,
# merkle_bucket_diff, ucb_event_arms, user_growth_accounting,
# copurchase_pairs, daily_revenue_acf, pinball_band_loss,
# personalized_pagerank_topk).
_HEAD = [
    # ---- 28 newly registered staged_r10 entries (first driver gating) ----
    "decayed_segment_value",
    "sorted_neighborhood_linkage",
    "embedding_jl_projection",
    "seasonal_weekday_outliers",
    "tokenizer_fertility_by_lang",
    "dedup_containment_census",
    "graph_k_core_census",
    "ks_drift_stat",
    "rrf_hybrid_fusion",
    "l_diversity_census",
    "dedup_prefix_filter_jaccard",
    "mutual_info_lang_source",
    "kl_unigram_drift",
    "pps_systematic_sample",
    "winsorized_priority_stats",
    "gap_fill_lerp_daily",
    "mutual_knn_pairs",
    "phrase_match_census",
    "graph_label_prop_census",
    "ann_recall_eval",
    "salted_join_revenue",
    "kmeans_step_exact",
    "dedup_blocking_quality",
    "twap_event_value",
    "grouped_weighted_quantiles",
    "feature_mi_ranking",
    "cluster_aware_split",
    "quantile_normalize_views",
    # ---- 22 rotation-due (r7-block remainder, last swept r9) ----
    "clean_date_clamp_range_sentinel",
    "clean_value_canonicalization",
    "pii_hash_sha256",
    "month_spine",
    "art_outcomes_asof",
    "art_outcomes_monthly",
    "text_pii_redaction",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "dedup_cc_survivors",
    "tsql_scalar_functions",
    "set_ops_except_intersect",
    "multimodal_decode_meta",
    "multimodal_frame_sample",
    "window_frames",
    "asof_join_latest",
    "semi_join_exists",
    "record_linkage_fuzzy",
    "union_date_repair",
    "pricing_summary",
    "star_join_agg",
    "pivot_wide_agg",
]
_TAIL = [
    # ---- r8-hard-gate-verified block: rotation-due FIRST in r11 ----
    "hll_set_algebra",
    "hdr_percentile_calibrate",
    "bpe_train_merges",
    "bpe_token_counts",
    "dedup_incremental_lsh",
    "k_anonymity_census",
    "snapshot_diff_orders",
    "fk_orphan_census",
    "encoding_artifact_census",
    "chi2_lang_source",
    "hard_negative_mining",
    "hopping_hll_distinct",
    "tpch_q3_priority",
    "tpch_q17_small_qty",
    "tpch_q18_big_orders",
    "tpch_q19_disjunctive",
    "tpch_q22_idle_rich",
    "session_path_trigrams",
    "scd2_temporal_join",
    "quarantine_reason_census",
    "backfill_chunked_delta",
    "range_sorted_checksum",
    "dq_expectations",
    "job_source_filters",
    "text_repetition_gopher",
    "decontaminate_ngram_overlap",
    "cross_source_leakage",
    "semantic_dedup_clusters",
    "substring_span_census",
    "tfidf_top_terms",
    "bigram_lm_logprob",
    "boilerplate_para_removal",
    "retention_cohorts",
    "countmin_heavy_hitters",
    "table_profile_sweep",
    "incremental_state_merge",
    "mix_temperature_weights",
    "corpus_prep_pipeline",
    # ---- r10 rotation-due overflow (committed r10 logged sweep) ----
    "json_extract",
    # ---- r9-hard-gate-verified (CORRECTNESS_r09 green), freshest ----
    "quantile_binning_census",
    "target_encoding_priority",
    "key_skew_diagnostics",
    "json_malformed_census",
    "temporal_split_embargo",
    "attribution_touchpoints",
    "rfm_quintile_features",
    "cusum_changepoint_flags",
    "golden_record_mode",
    "token_pmi_topk",
    "file_provenance_ranges",
    "negative_edge_samples",
    "wasserstein_drift",
    "benford_digit_audit",
    "cdc_feed_apply",
    "weighted_price_quantiles",
    "mktsegment_entropy",
    "mix_allocation_exact",
    "hybrid_retrieval_rerank",
    "tombstone_delete_census",
    "grouping_sets_agg",
    "merge_upsert_scd1",
    "job_rules_canonicalization",
    "array_vector_ops",
    "sql_api_not_in_subquery",
    "dedup_simhash_pairs",
    "incremental_antijoin_nullsafe",
    "catalog_job_pipeline",
    "graph_triangle_census",
    "ann_pq_adc_topk",
    "bm25_topk_retrieval",
    "scd2_state_history",
    "semantic_decontaminate",
    "bloom_pruned_join",
    "stratified_sample_exact",
    "epoch_shuffle_order",
    "embedding_quantize_int8",
    "corr_regression_stats",
    "interval_overlap_join",
    "graph_pagerank_topk",
    "chunk_sliding_window",
    "outlier_mad_census",
    "funnel_conversion",
    "locf_gap_fill",
    "rank_functions_suite",
    "zorder_locality",
    "unpivot_melt",
    "dedupe_latest_window",
    "groupby_max_dedup",
    "lookup_fold_broadcast",
]


def _window_order(d: dict) -> dict:
    out = {k: d[k] for k in _HEAD if k in d}
    out.update({k: v for k, v in d.items() if k not in _HEAD and k not in _TAIL})
    out.update({k: d[k] for k in _TAIL if k in d})
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the canonical incremental load (dedupe -> clean -> anti-join
    -> hash) on /root/testdata/sf0.001 events."""
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.operators import (
        anti_join_new,
        dedupe_latest,
        hash_pii,
        range_sentinel,
    )

    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    sf_dir = "/root/testdata/sf0.001"
    ev = read_events(spark, sf_dir)
    latest = ev.transform(
        dedupe_latest(["user_id", "event_type"], [F.col("ts").desc(), F.col("event_id").desc()])
    )
    cleaned = latest.transform(range_sentinel("value", -1e6, 1e6, 999.0, cast_to="double"))
    target = cleaned.filter(F.col("event_id") % 10 < 7).select("user_id", "event_type")
    delta = cleaned.transform(anti_join_new(target, ["user_id", "event_type"]))
    return delta.transform(hash_pii({"user_id": "UserIdHash"})).select(
        "user_id", "event_type", "event_id", "ts", "value", "UserIdHash"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    q.update(showcase.QUERIES)
    q.update(pipeline.QUERIES)
    q.update(coverage.QUERIES)
    q.update(curation.QUERIES)
    q.update(job_rules.QUERIES)
    q.update(job_filters.QUERIES)
    q.update(catalog_job.QUERIES)
    q.update(sketches.QUERIES)
    q.update(graph.QUERIES)
    q.update(quality.QUERIES)
    q.update(staged.STAGED_QUERIES)  # registered r8 (VERDICT r7 #1)
    q.update(staged_r9.STAGED_QUERIES)  # registered r9 (VERDICT r8 #1)
    q.update(staged_r10.STAGED_QUERIES)  # registered r10 (VERDICT r9 #1)
    return _window_order(q)


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o.update(showcase.ORACLES)
    o.update(pipeline.ORACLES)
    o.update(coverage.ORACLES)
    o.update(curation.ORACLES)
    o.update(job_rules.ORACLES)
    o.update(job_filters.ORACLES)
    o.update(catalog_job.ORACLES)
    o.update(sketches.ORACLES)
    o.update(graph.ORACLES)
    o.update(quality.ORACLES)
    o.update(staged.STAGED_ORACLES)  # registered r8 (VERDICT r7 #1)
    o.update(staged_r9.STAGED_ORACLES)  # registered r9 (VERDICT r8 #1)
    o.update(staged_r10.STAGED_ORACLES)  # registered r10 (VERDICT r9 #1)
    return _window_order(o)
