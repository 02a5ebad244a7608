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
# queries() per round. Since r9 every one of the 394 registered
# entries has a green driver row (verification debt is zero), so the
# standing rotation policy is: (1) entries whose IMPLEMENTATION
# changed this round queue first — their existing green rows are
# from the old code; (2) any new registrations queue next (prove-at-
# creation); (3) the window fills with the entries holding the
# OLDEST driver rows, oldest-first, to drive the median row age down
# (VERDICT r9 item 2). The r11 fill = the 46 r3-era rows (TPC-H
# tail, r3 LLM prep, recursive CTE/variant/UDTF, operational
# sources/writes, r3 streaming, warehouse analytics) + 4 r4-era
# rows; the r10 window (re-verified last round) rotates behind the
# boundary. Every window entry is locally green at
# sf0.001 AND sf0.01 oracle-exact and 32-vs-7-partition
# deterministic; names are listed ONCE (tests/test_contract.py
# enforces no duplicates — the r9 close-out broke that by leaving 7
# stale second listings in place, fixed here).
_PRIORITY = [
    # === r11 window head: entries whose implementation changed this
    # round queue first (their green rows are from old code) — the
    # four TPC-H money sums moved to exact integer units after the
    # r11 100x probe (60M lineitem rows) caught round(sum(double),4)
    # order-divergence flipping their 4dp hashes one grid step:
    # q6/q17 on 1-row global sums, q8 on ~15e9 yearly totals, q9 on
    # nation-year profit groups. Each is oracle-exact at all six SFs
    # (0.001/0.01/0.1/10x/30x/100x) + 32-vs-7 deterministic on the
    # new shape; the channel and armor are documented in SCALE.md.
    "tpch_q6", "tpch_q8", "tpch_q9", "tpch_q17",
    # The r11 100x LEDGER SWEEP (extending the ~30-entry probe toward
    # the full registry) then caught two more: ext_approx_count_distinct
    # OOM'd at 100x (multi-distinct Expand shape -> rewritten as two
    # single-distinct aggregates + 1-row crossJoin panel) and
    # ext_bucketed_join_colocated's round(sum(money),2) sat one 2dp step
    # off across engines at ~12M terms/group (-> integer-units armor).
    # Both re-proved: oracle-exact at sf0.001/0.01/0.1 AND 100x,
    # 32-vs-7 deterministic.
    "ext_approx_count_distinct", "ext_bucketed_join_colocated",
    # ...and a third: ext_incremental_rollup's round(sum(totalprice),4)
    # diverged at ~1.5e10/group, where the 4dp grid is ~50 ULPs — the
    # channel is magnitude-to-grid ratio, not term count (only ~60k
    # terms/group). Integer-cents armor; same re-proof protocol.
    "ext_incremental_rollup",
    # --- r11 window fill: the r3-era rows — the stalest driver rows
    # after the r10 rotation (TPC-H tail, r3 LLM prep ops, recursive
    # CTE/variant/UDTF, operational sources/writes, r3 streaming rows,
    # warehouse analytics), oldest-row-first per VERDICT r10 item 2 ---
    "ext_salted_agg", "tpch_q2", "tpch_q5",
    "tpch_q7", "tpch_q10", "tpch_q11",
    "tpch_q12", "tpch_q13", "tpch_q15",
    "tpch_q16", "tpch_q18", "tpch_q19",
    "tpch_q20", "tpch_q21", "tpch_q22",
    "llm_pack_sequences", "llm_source_mix", "llm_quality_filter_by_lang",
    "llm_decontaminate", "llm_unigram_logprob", "llm_dedup_keep_first",
    "llm_dedup_keep_best", "llm_chunk_documents", "llm_train_test_split",
    "ext_recursive_cte", "ext_variant_json", "ext_sql_udf",
    "udf_python_udtf", "ext_compact_small_files", "ext_dynamic_partition_overwrite",
    "ext_source_csv_corrupt", "ext_manifest_pruned_scan", "ext_source_orc",
    "stream_session_counts", "stream_sliding_counts", "stream_static_join",
    "stream_dedup_within_watermark", "ext_merge_upsert", "ext_funnel_conversion",
    "ext_cohort_retention", "ext_gap_islands", "ext_scd2_history",
    "ext_salted_join",
    # --- then the next-stalest r4-era rows to fill the ~50 window ---
    "ext_gap_fill_ffill", "ext_rolling_median", "llm_novel_ngram_ratio",
    "ext_session_dynamic_gap",
    # --- ~50-entry r11 window boundary ---
    # --- r4+ driver-green rows continue (newer rows persist; the
    # local exact-bar sweep re-checks all 394 each round) ---
    "llm_tfidf_topk_terms", "llm_winnowing_fingerprints",
    # --- the r10 window (freshest rows, verified last round) rotates
    # to the back of the explicit list: r10 changed-implementation
    # pair, then the r1/r2-era families re-verified in r10 ---
    "ext_equiheight_histogram", "llm_keyword_rake",
    "ext_join_left_order_counts", "ext_join_semi", "ext_join_anti",
    "ext_join_theta", "ext_union_all", "ext_union_distinct",
    "ext_intersect", "ext_except", "ext_rollup",
    "ext_cube", "ext_window_rank", "ext_window_lag_lead",
    "ext_percentiles", "ext_max_by", "ext_scalar_string",
    "ext_scalar_date", "ext_explode_wordcount", "ext_json_extract",
    "ext_tumbling_window", "ext_sliding_window", "ext_session_windows",
    "ext_scalar_math", "ext_window_running",
    "tpch_q4", "tpch_q14", "llm_dedup_exact_stats",
    "llm_minhash_signatures", "llm_lsh_candidate_pairs", "llm_ngram_jaccard",
    "llm_simhash", "llm_cosine_topk", "llm_ann_lsh_topk",
    "llm_ann_multiprobe_topk", "llm_embedding_neardup", "llm_language_id",
    "llm_token_counts", "llm_quality_score", "llm_pipeline_end_to_end",
    "llm_multimodal_pack", "ext_scalar_subquery", "ext_correlated_subquery",
    "ext_in_subquery", "udf_pandas_scalar", "udf_apply_in_pandas",
    "udf_python_row", "ext_window_distribution", "ext_window_first_last",
    "ext_window_range_frame", "ext_array_functions", "ext_map_functions",
    "ext_regexp_functions", "ext_date_format", "ext_pivot",
    "ext_unpivot", "ext_grouping_sets", "ext_string_agg",
    "ext_corr_covar", "ext_union_missing_cols", "ext_join_revenue_by_nation",
    "stream_tumbling_counts", "ml_kmeans_anomaly", "ml_gbt_regression_eval",
    "ml_gbt_classifier_eval", "ext_source_jsonl",
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
