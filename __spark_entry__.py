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
# went 50/50 green (red-row fix + claims audit + backlog). The r5
# window below is the VERIFICATION round the r4 verdict mandated: all
# 50 slots are never-driver-checked entries, highest engine-specific
# risk first — (a) the streaming quartet (watermark eviction, state
# store, checkpoint resume), (b) the exact SQL-ML batch, (c) the Arrow
# UDF trio, (d) the three queries whose gap/oracle/ranking semantics
# changed per ADVICE r4 (sessionized funnel micros gap, first-touch
# oracle argmin, naive-bayes rounded ranking — naive bayes sits in
# (b)), (e) engine surfaces (XML, _metadata, time travel, TVF,
# parameterized SQL, HLL merge, null semantics, decimal), (f) float/
# time-heavy stats, (g) the r4 LLM text/array batch. The remaining 19
# never-checked entries + the ext_approx_count_distinct rows-only
# re-proof are pinned right after the boundary as the r6 window.
_PRIORITY = [
    "stream_checkpoint_resume",
    "stream_stream_join_outer",
    "stream_topk_update_mode",
    "stream_stateful_user_stats",
    "ml_naive_bayes_sql",
    "ml_fpgrowth_itemsets",
    "ml_als_recommend",
    "ml_chi_square_assoc",
    "udf_arrow_optimized",
    "udf_pandas_iter",
    "udf_map_in_pandas",
    "ext_sessionized_funnel",
    "ext_attribution_first_touch",
    "ext_source_xml",
    "ext_metadata_columns",
    "ext_snapshot_time_travel",
    "ext_sql_tvf",
    "ext_parameterized_sql",
    "ext_hll_sketch_merge",
    "ext_null_semantics",
    "ext_lateral_view_sql",
    "ext_decimal_exact",
    "ext_observation_metrics",
    "ext_ewma_smoothing",
    "ext_mad_outliers",
    "ext_time_weighted_avg",
    "ext_asof_join_forward",
    "ext_grouped_median",
    "ext_running_distinct_users",
    "ext_json_nested_roundtrip",
    "ext_session_dynamic_gap",
    # backward as-of: implementation+oracle tie-pinned this round (the
    # 10x differential red on its forward twin) — re-prove the green
    "ext_asof_join",
    "llm_winnowing_fingerprints",
    "llm_segment_dedup",
    "llm_bpe_merge_step",
    "llm_bigram_logprob",
    "llm_vocab_coverage",
    "llm_tfidf_topk_terms",
    "llm_ngram_containment",
    "llm_char_entropy",
    "llm_boilerplate_prefix",
    "llm_minhash_band_tuning",
    "llm_ann_filtered_topk",
    "llm_knn_label_accuracy",
    "llm_source_temperature_mix",
    "llm_dedup_cluster_sizes",
    "llm_jaccard_histogram",
    "llm_oov_rate_by_source",
    "llm_length_bands_by_source",
    "llm_corpus_dashboard",
    # --- 50-entry window boundary ---
    # r6 queue (71 entries — overflows one window; the driver takes
    # the first 50, the rest spill to r7): the last r1-r4
    # never-driver-checked entries + the ext_approx_count_distinct
    # rows-only re-proof + every r5 addition (corpus curation, Spark-4
    # SQL surfaces, graph, iterative ML, sources, ML-eval/drift/
    # sketch batches, experimentation analytics, SQL programmability)
    # in risk order. After r6+r7, zero registry entries lack a driver
    # row. Every entry below is locally green at sf0.01 AND sf0.001
    # AND scale-differentialed (SCALE.md campaign section).
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
    "ext_sample",
    "ext_sample_stratified",
    "llm_multimodal_decode",
    "ext_approx_count_distinct",
    # added in r5 (VERDICT r4 item 7): bucketed co-located join
    "ext_bucketed_join_colocated",
    # added in r5: corpus-curation batch (registry_ext8)
    "llm_quota_sample_by_source",
    "ext_shard_balance_report",
    "llm_embedding_norm_stats",
    "llm_zipf_topk_terms",
    # added in r5 batch 2 (registry_ext9): Spark-4 SQL surfaces +
    # graph/time-series/iterative-ML analytics
    "ext_sql_pipe_syntax",
    "ext_collation_ci",
    "ext_autocorrelation",
    "graph_triangle_count",
    "ml_logistic_regression_gd",
    "graph_bfs_distances",
    "llm_url_domain_stats",
    "ext_equiheight_histogram",
    "ml_kmeans_lloyd",
    # added in r5 batch 4 (registry_ext10): window composition + SQL-ML
    "ext_conditional_reset_cumsum",
    "ml_decision_stump",
    "ext_lateral_column_alias",
    "llm_semdedup_prune",
    "llm_multimodal_audio_energy",
    "ext_incremental_join_view",
    "ml_pca_power_iteration",
    "ml_confusion_matrix",
    "ext_source_binaryfile",
    "ext_merge_schema_evolution",
    "ext_identifier_clause",
    "ml_decision_tree_depth2",
    # added in r5 batch 6 (registry_ext11): ML evaluation + scale toolkit
    "ml_roc_auc",
    "ml_calibration_bins",
    "ml_ridge_regression_normal_eq",
    "ext_bloom_prefilter_join",
    "llm_weighted_sample",
    "llm_hashed_features",
    # added in r5 batch 7 (registry_ext12): drift monitoring + ranking eval
    "ml_ks_drift",
    "ml_psi_drift_bins",
    "ml_ndcg_at_k",
    # added in r5 batch 8 (registry_ext13): CMS sketch + interval merge
    # + rank correlation + lift table
    "ext_count_min_sketch",
    "ext_interval_merge",
    "ml_spearman_corr",
    "ml_lift_gains",
    "stream_chained_window_agg",
    "ext_holt_linear",
    # added in r5 batch 9 (registry_ext14): experimentation analytics
    "ml_ab_ztest_conversion",
    "ml_welch_ttest",
    "ml_mann_whitney_u",
    "ext_cusum_changepoint",
    "ext_source_text",
    # added in r5 batch 10 (registry_ext15): SQL programmability
    "ext_session_variables",
    "ext_execute_immediate",
    "ext_sql_scripting",
    "ext_sql_scripting_loop",
    # r1-r4 driver-green entries follow in registry registration
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
