"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`etl_spark_eks_spark`: the engine's query registry
(one entry per SURVEY.md §2 operator) provides ``queries()`` and
``oracle_sql()``; ``entry()`` runs the flagship pricing-summary query
(TPC-H-Q1 shape — the reference job's scan->transform->aggregate path,
reference workflow-examples/pyspark-taxi-trip.py:37-51) at sf0.001.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from etl_spark_eks_spark import registry  # noqa: E402
from etl_spark_eks_spark.session import apply_engine_conf  # noqa: E402

registry.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_engine_conf(spark)
    return registry.QUERIES["q_b17_pricing_summary"](spark, SMOKE_SF_DIR)


# The round driver caps each CORRECTNESS run at the FIRST 50 keys of the
# dict this module returns, in order — registry insertion order is
# therefore a measurement decision, not cosmetics. After round 5's run
# every key in the suite has an official row (CORRECTNESS_r05: 50/50
# clean — the 4 previously-unevidenced keys, all 30 round-5 additions,
# the 13 rows-only refreshes, q_b102's re-measure, and 2 r1 re-checks).
# Round 6 therefore leads with: (1) the 64 operators ADDED in round 6
# (q_b123-q_b152, q_c82-q_c109, q_m11-q_m16 — all oracle-backed, no official
# row yet), (2) the 3 keys REWORKED this round whose oracles changed
# identically on both engines (q_c68/q_c78 sort-key stride + prefix-sum
# bucketing per ADVICE; q_b122's overflow band re-planted for the 10.7x
# exception-storm fix) — re-verified locally, need fresh official rows,
# (3) the OLDEST official greens — the r1-era keys whose last driver
# check is round 1 and which missed r5's 50-slot cap (q_a4..q_b59
# family): 64 + 3 = 67 lead keys — seventeen over the 50-slot cap. The
# REWORKED trio sits inside the cap (their old official rows describe
# pre-rework oracles — refreshing them outranks first rows for keys
# whose machinery already has a green family row), so the seven
# newest additions (q_c102/q_b145/q_c103/q_b146/q_m16/q_b147/q_b148/
# q_b149/q_c104/q_c105/q_c106/q_b150/q_c107/q_c108/q_b151/q_c109/
# q_b152; family rows q_c96/B75/C22/C35/M7/B73/B47/B83/C13/C10/C49/
# B37/C36/C46/B81/C83/B61) queue at 51-67.
# The whole r1-era and r2-era green backlog queues behind for
# round 7.
# Every key remains present and runnable regardless of order;
# tools/verify_driver.py checks all of them.
_PRIORITY: tuple[str, ...] = (
    # -- (1) round-6 additions: first official rows --
    "q_b123_group_by_all", "q_b124_crosstab", "q_b125_hll_sketch",
    "q_b126_file_metadata", "q_b127_identifier_clause",
    "q_b128_collated_compare",
    "q_c82_blocklist_phrases", "q_c83_source_overlap_matrix",
    "q_c84_token_budget_waterfill", "q_c85_embedding_source_drift",
    "q_m11_payload_entropy", "q_c86_range_prefix_sum",
    "q_c87_bpe_merge_rounds", "q_b129_url_functions",
    "q_b130_interval_arithmetic", "q_b131_rocksdb_state_store",
    "q_c88_shard_mix_audit", "q_c89_knn_matmul",
    "q_b132_runtime_bloom_join", "q_b133_sql_scripting",
    "q_b134_execute_immediate", "q_b135_struct_surgery",
    "q_c90_dedup_decision_record", "q_m12_caption_pair_curation",
    "q_c91_dsir_importance", "q_c92_perplexity_buckets",
    "q_b136_join_strategy_hints", "q_m13_aspect_bucket",
    "q_c93_intradoc_dedup", "q_c94_matryoshka_recall",
    "q_b137_column_defaults", "q_c95_gopher_rules",
    "q_c96_exact_substring_spans", "q_b138_incremental_backlog",
    "q_c97_semdedup", "q_b139_exchange_reuse",
    "q_c98_semantic_decontam", "q_c99_calibration_bins",
    "q_b140_aqe_skew_join", "q_m14_pcm_energy_segments",
    "q_m15_scene_cut_shots",
    "q_b141_approx_percentile_bound", "q_b142_content_digest",
    "q_b143_multiplexed_stream_union", "q_c100_vocab_coverage_curve",
    "q_b144_dynamic_partition_overwrite", "q_c101_source_divergence_matrix",
    # -- (2) reworked this round (new stride/bucketing/overflow band,
    #        oracles changed) — placed INSIDE the 50-slot cap because
    #        their existing official rows describe the pre-rework
    #        oracles; the newest additions below queue behind instead,
    #        each machinery-evidenced through an earlier family row --
    "q_c68_curriculum_phases", "q_c78_training_data_plan",
    "q_b122_try_arithmetic",
    # -- newest additions (51-57): q_c102/q_b145/q_c103/q_b146/q_m16/
    #    q_b147/q_b148/q_b149, family rows per the note above --
    "q_c102_substring_span_surgery",
    "q_b145_ignore_missing_files", "q_c103_dup_rate_estimation",
    "q_b146_output_file_sizing", "q_m16_manifest_reconciliation",
    "q_b147_polymorphic_udtf", "q_b148_dynamic_session_gap",
    "q_b149_calendar_gap_fill", "q_c104_lang_confusion_matrix",
    "q_c105_quality_rate_confidence", "q_c106_threshold_selection",
    "q_b150_modern_string_funcs", "q_c107_exact_apportionment",
    "q_c108_shuffle_uniformity_audit", "q_b151_sql_unpivot_clause",
    "q_c109_source_diversity_sample", "q_b152_insert_by_name",
    # -- (3) oldest official greens (r1), missed r5's cap --
    "q_a4_limit20", "q_a5_count",
    "q_a6_repartition_roundtrip", "q_a7_write_roundtrip",
    "q_a8_catalog_projection",
    "q_b1_register_star", "q_b2_json_extract", "q_b3_partitioned_write",
    "q_b4_filter_conj", "q_b5_filter_disj_in", "q_b6_project_arith",
    "q_b7_case_when", "q_b8_join_inner", "q_b9_join_outer",
    "q_b10_join_semi", "q_b11_join_anti", "q_b15_join_asof",
    "q_b16_cross_small", "q_b18_count_distinct", "q_b24_drop_duplicates",
    "q_b26_ranking", "q_b27_topn_per_group", "q_b28_lag_lead",
    "q_b29_running_sum", "q_b30_sliding_avg", "q_b31_ntile",
    "q_b32_sort_multi", "q_b33_topk", "q_b34_union", "q_b35_intersect",
    "q_b36_except", "q_b37_string_funcs", "q_b38_regex",
    "q_b39_date_funcs", "q_b40_math_funcs", "q_b58_percentiles",
    "q_b59_pivot", "q_b23_grouping_sets",
    "q_a1_scan", "q_a2_add_ingest_ts",
    # -- (4) r2-era greens, next-oldest evidence (queue for round 7) --
    "q_b17_pricing_summary", "q_b12_join_broadcast", "q_b13_join_theta",
    "q_b14_join_3way", "q_b19_approx_cd", "q_b20_having", "q_b21_rollup",
    "q_b22_cube", "q_b25_revenue_by_nation", "q_a9_compat_current_date",
    "q_b41_array_explode", "q_b42_props_map", "q_b43_scalar_subquery",
    "q_b44_exists_subquery", "q_b45_tumbling", "q_b46_sliding",
    "q_b47_session", "q_b50_exactly_once_rerun", "q_b51_python_udf",
    "q_b52_pandas_udf", "q_b53_grouped_map", "q_b54_grouped_agg_udaf",
    "q_b55_udtf_explode", "q_b56_stateful_user_stats",
    "q_b60_bucketed_join", "q_b61_persistent_catalog",
    "q_b62_schema_drift", "q_b63_salted_grouped_map",
    "q_b64_window_navigation",
    "q_c1_exact_dedup", "q_c2_near_dedup_jaccard", "q_c3_knn_cosine",
    "q_c4_embedding_stats", "q_c5_top_terms", "q_c6_doc_stats",
    "q_c7_tfidf", "q_c10_quality_score", "q_c11_token_count_regex",
    "q_c13_lang_id", "q_c16_ngram_jaccard", "q_c18_dedup_clusters",
    "q_c19_curation_pipeline", "q_c20_pii_scrub", "q_c22_hash_sample",
    "q_c23_domain_mix", "q_c24_pack_shards", "q_c25_decontaminate",
    "q_c28_repetition_metrics", "q_c29_content_split",
)


def _ordered(mapping: dict) -> dict:
    out = {k: mapping[k] for k in _PRIORITY if k in mapping}
    out.update((k, v) for k, v in mapping.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted => rows-only)."""
    return _ordered(dict(registry.ORACLES))
