"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over machine_telemetry_etl_ml_pipeline_spark.registry —
every implemented operator from SURVEY.md §2 is registered there as a
(spark_builder, duckdb_oracle_sql) pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from machine_telemetry_etl_ml_pipeline_spark import registry  # noqa: E402
from machine_telemetry_etl_ml_pipeline_spark import registry_ext  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext2  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext3  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext4  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext5  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext6  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext7  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext8  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext9  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext10  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext11  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext12  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext13  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext14  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext15  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext16  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext17  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext18  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext19  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext20  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext21  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext22  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext23  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext24  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext25  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext26  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext27  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext28  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext29  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext30  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext31  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_ext32  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_llm  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark import registry_udf  # noqa: E402,F401  (extends REGISTRY)
from machine_telemetry_etl_ml_pipeline_spark.session import tune_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: latest-per-key dedup
    over events (the reference's signature DISTINCT ON idiom,
    /root/reference/project/db.py:237-246) — scan -> shuffle -> window
    -> filter, the engine's spine."""
    tune_session(spark)
    return registry.REGISTRY["ref_latest_per_key"].fn(spark, "/root/testdata/sf0.001")


# The driver's correctness gate verifies a ~50-entry prefix of
# queries() per round. Rotate the window each round: r1 covered the
# reference + ext core, r2 TPC-H Q1/3/4/6/14 + LLM suite + UDFs, r3
# completed TPC-H 22/22 + round-2/3 LLM ops + streaming surfaces, r4
# went 50/50 green, r5 checked 50 never-checked entries (49 green;
# the 1 red was an oracle float bug, re-proven green in r6), r6 and
# r7 each went 50/50 green on their never-checked batches. The r8
# window below = EXACTLY the 50 entries that have never had a driver
# CORRECTNESS row (the r6 ext18-ext28 batches + r7's
# ext_variant_roundtrip — the full debt ledger, SCALE.md), ordered
# highest-risk first: iterative graph/ML recurrences with
# MATERIALIZED-CTE oracles (k-core, SSSP, GMM-EM, HMM, forest, MMR),
# then the remaining batches in registration order. A green r8 run
# drives verification debt to ZERO: every one of the 385 registered
# entries will then have a driver row. Every window entry is locally
# green at sf0.001 AND sf0.01 oracle-exact with a scale differential
# (SCALE.md) and 32-vs-7-partition deterministic.
_PRIORITY = [
    # === r9 window head: the 9-entry driver-row debt (VERDICT r8
    # items 1-2) — the only entries without a green driver row.
    # ext_table_checksum re-specced r9 to a representation-proof
    # int64 checksum (fold mod 2^62 -> BIGINT, registry_ext19.py)
    # after the r8 hash-only red on its ~2^70 DECIMAL(38,0) output.
    "ext_table_checksum",
    "llm_semdedup_prune_scaled",
    "llm_embedding_neardup_scaled",
    "ext_approx_quantile_sketch_merge",
    "stream_stream_join_full_outer",
    "ext_approx_count_distinct",
    "ext_sample",
    "ext_sample_stratified",
    "llm_multimodal_decode",
    # --- r9 additions (surface freeze: <=5) queue directly behind
    # the debt block so they get driver rows in-round ---
    "ml_model_exact_scoring",
    "ml_kfold_cv",
    "ml_conformal_interval",
    "llm_sequence_packing",
    "ml_rolling_origin_backtest",
    # --- entries whose IMPLEMENTATION changed this round (collect-to-
    # literals: gbt/logistic/gmm; k-core monotone early exit; forest
    # conditional-aggregate training; RAKE segment arrays; the
    # equi-depth histogram's OOM-fix rollup re-spec) — their existing
    # green rows are from the old code, so they queue for fresh rows
    # ahead of the old-row re-confirmations ---
    "ml_gbt_stumps",
    "ml_logistic_regression_gd",
    "ml_gmm_em_1d",
    "graph_k_core",
    "ml_random_forest_vote",
    "llm_keyword_rake",
    "ext_equiheight_histogram",
    # --- r9 window fill: re-confirmation of the OLDEST driver rows
    # (r1 reference core + r3 TPC-H) on current code — their green
    # rows are 6-8 rounds old and the shared operator layer has
    # evolved since; fresh rows maximize information per slot ---
    "ref_scan_count", "ref_projection_rename", "ref_null_fill",
    "ref_filter_eq", "ref_filter_range", "ref_filter_ilike",
    "ref_filter_bounds", "ref_latest_n", "ref_range_scan",
    "ref_latest_per_key", "ref_top_k_highest_value",
    "ref_top_k_lowest_value", "ref_nulls_last_sort",
    "ref_distinct_sorted", "ref_stats_global", "ref_stats_filtered",
    "ref_count_distinct", "ref_grouped_comparison",
    "ref_time_features", "ref_label_encoding", "ref_table_counts",
    "ref_zscore_standardize", "ref_sink_batch_insert",
    "ref_sink_insert_defaults", "ref_sink_insert_json",
    "ref_ddl_create_table", "ref_surrogate_ids",
    "tpch_q1", "tpch_q3", "tpch_q6", "tpch_q4", "tpch_q14",
    "tpch_q5", "tpch_q7", "tpch_q8", "tpch_q10", "tpch_q12",
    "tpch_q19", "tpch_q13",
    # --- ~50-entry r9 window boundary ---
    "tpch_q18", "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q21",
    "tpch_q22", "tpch_q2", "tpch_q11", "tpch_q9", "tpch_q20",
    # --- r8 window (all 49-green; ext_table_checksum rehomed to the
    # r9 head above — dict.fromkeys dedupe keeps first position) ---
    "graph_k_core",
    "graph_weighted_sssp",
    "ml_gmm_em_1d",
    "ml_hmm_forward",
    "ml_random_forest_vote",
    "llm_mmr_rerank",
    "graph_clustering_coefficient",
    "graph_degree_assortativity",
    "graph_common_neighbors",
    "ml_churn_labels_point_in_time",
    "ext_holt_winters_seasonal",
    "ext_variant_roundtrip",
    # --- r8 window: remaining never-checked, registration order ---
    # registry_ext18: linear interpolation + ML-eval metrics
    "ext_interpolate_linear",
    "ml_average_precision",
    "ml_cohens_kappa",
    "ml_cramers_v",
    # registry_ext19: bitmap distinct, Bollinger, URL canonicalization
    # (ext_table_checksum rehomed to the r9 head)
    "ext_bitmap_distinct",
    "ext_bollinger_bands",
    "llm_url_canonicalize",
    # registry_ext20: Kendall tau-b, Theil-Sen, Z-order, code
    # detection, embedding outliers
    "ml_kendall_tau",
    "ml_theil_sen_slope",
    "ext_zorder_cluster",
    "llm_code_detect",
    "llm_embedding_outliers",
    # registry_ext21: RFM, ABC, ANOVA, MCC, Brier
    "ext_rfm_segmentation",
    "ext_abc_classification",
    "ml_anova_oneway",
    "ml_matthews_corrcoef",
    "ml_brier_score",
    # registry_ext23-24: readability, RAKE, lang-ID confusion, DPP
    "llm_readability_flesch",
    "llm_keyword_rake",
    "llm_langid_confusion",
    "ext_dynamic_partition_pruning",
    # registry_ext25: LOO target encoding, span corruption,
    # fertility, learning curve
    "ml_target_encoding_loo",
    "llm_span_corruption",
    "llm_tokenizer_fertility",
    "ml_learning_curve",
    # registry_ext26: DID, CUPED, McNemar, cross-lingual overlap
    "ml_diff_in_diff",
    "ml_cuped_adjustment",
    "ml_mcnemar_test",
    "llm_crosslingual_ngram_overlap",
    # registry_ext27: SPRT, winsorized mean, inter-arrival stats,
    # preference pairs, blocked fuzzy linkage
    "ml_sprt_stopping",
    "ml_winsorized_mean",
    "ext_interarrival_stats",
    "llm_preference_pairs",
    "ext_entity_blocking_fuzzy",
    # registry_ext28: item-item CF, token-budget fill, intervals
    "ml_item_item_cosine",
    "llm_token_budget_fill",
    "ext_interval_arithmetic",
    # --- 50-entry window boundary ---
    # (the 9 r8-addition / rows-only-upgrade names that queued here
    # were rehomed to the r9 head — single listing per name keeps the
    # no-duplicates contract)
    # --- r7 driver window (all green in CORRECTNESS_r07; the four
    # rows-only upgrades above were removed from this block — their
    # only listing is now the r9 head) ---
    "ext_dq_rule_report",
    "ext_crosstab",
    "ext_grouping_id",
    "ext_topn_other",
    "ext_percent_change_wow",
    "ext_bitwise_agg",
    "ext_benford_screen",
    "ext_skew_metrics",
    "ext_grouped_zscore",
    "ext_distinct_subset",
    "ext_posexplode",
    "ext_month_boundaries",
    "ext_higher_order_funcs",
    "llm_chunk_dedup_stats",
    "llm_embedding_centroids",
    "llm_nearest_centroid_accuracy",
    "llm_vector_quantize",
    "ext_equiheight_histogram",
    "stream_foreach_batch_idempotent",
    "ext_aqe_skew_join",
    "graph_label_propagation",
    "ml_gbt_stumps",
    "ml_kaplan_meier",
    "ext_skyline_pareto",
    "ext_seasonal_dow_index",
    "ext_offset_clause",
    "ext_union_by_name",
    "ext_asof_join_nearest",
    "ext_mode_aggregate",
    "ml_quantile_pinball_eval",
    "ml_isotonic_regression",
    "ext_snapshot_diff_cdc",
    "llm_bpe_merge_iterate",
    "ml_ols_inference",
    "ext_approx_top_k_sketch_merge",
    "stream_python_datasource",
    "stream_session_dynamic_gap",
    "ext_map_higher_order",
    "ml_subsample_ci",
    "ext_asof_join_tolerance",
    "ml_gini_lorenz",
    "ml_text_classifier_e2e",
    "ml_markov_transition_matrix",
    "ml_mutual_information",
    "ext_sequence_pattern_vshape",
    "ext_resample_ohlc",
    # --- r6 driver window (all 50 green in CORRECTNESS_r06) ---
    "ext_decimal_exact",
    "ext_session_variables",
    "ext_execute_immediate",
    "ext_sql_scripting",
    "ext_sql_scripting_loop",
    "stream_chained_window_agg",
    "ext_source_text",
    "ext_source_binaryfile",
    "ext_merge_schema_evolution",
    "ml_logistic_regression_gd",
    "ml_kmeans_lloyd",
    "ml_pca_power_iteration",
    "graph_triangle_count",
    "graph_bfs_distances",
    "ml_roc_auc",
    "ml_calibration_bins",
    "ml_ridge_regression_normal_eq",
    "ml_ks_drift",
    "ml_psi_drift_bins",
    "ml_ndcg_at_k",
    "ext_count_min_sketch",
    "ml_spearman_corr",
    "ml_lift_gains",
    "ml_ab_ztest_conversion",
    "ml_welch_ttest",
    "ml_mann_whitney_u",
    "ml_decision_stump",
    "ml_decision_tree_depth2",
    "ml_confusion_matrix",
    "ext_holt_linear",
    "ext_cusum_changepoint",
    "ext_autocorrelation",
    "ext_interval_merge",
    "llm_semdedup_prune",
    "llm_quota_sample_by_source",
    "ext_shard_balance_report",
    "llm_embedding_norm_stats",
    "llm_zipf_topk_terms",
    "llm_url_domain_stats",
    "llm_weighted_sample",
    "llm_hashed_features",
    "llm_multimodal_audio_energy",
    "ext_sql_pipe_syntax",
    "ext_collation_ci",
    "ext_lateral_column_alias",
    "ext_identifier_clause",
    "ext_bucketed_join_colocated",
    "ext_bloom_prefilter_join",
    "ext_incremental_join_view",
    "ext_conditional_reset_cumsum",
    # r1-r5 driver-green entries follow in registry registration
    # order (their green rows persist; the local exact-bar sweep
    # re-checks all of them each round).
]


def _ordered_names() -> list[str]:
    rest = [n for n in registry.REGISTRY if n not in set(_PRIORITY)]
    # keep the r1-verified reference core + join/setop/window families
    # right after the priority block (registry registration order already
    # reflects that grouping); dedupe preserving first (window) position
    ordered = [n for n in _PRIORITY if n in registry.REGISTRY] + rest
    return list(dict.fromkeys(ordered))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: registry.REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted entries get the
    driver's weaker rows-only check."""
    return {
        name: registry.REGISTRY[name].oracle
        for name in _ordered_names()
        if registry.REGISTRY[name].oracle is not None
    }
