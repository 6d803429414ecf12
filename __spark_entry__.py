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
# therefore a measurement decision, not cosmetics. Merged r1-r4 evidence:
# 170 keys have an official hash-green row, 16 rows-only keys have
# healthy official runs, and exactly 4 keys — q_b104_null_safe_join,
# q_b105_running_distinct, q_c67_corpus_datasheet, q_c68_curriculum_phases,
# added after round 4's driver run — have no official row at all.
# Round 5 therefore leads with: (1) those 4 keys (all oracle-backed),
# (2) the 30 operators ADDED in round 5 (q_b106-q_b122, q_c69-q_c81 —
# all oracle-backed), (3) the 13 rows-only keys whose last official
# run is r3 (q_b48, q_b49, q_b74, q_c8, q_c9, q_c12, q_c14, q_c17,
# q_c21, q_c30, q_c39, q_c44, q_m4) plus q_b102, whose r4 bench entry
# was flagged >2x and re-measured this round (0.95x, noise — SCALE.md),
# (4) back-fills the remaining slots with the OLDEST official greens
# as regression re-checks. Arithmetic: 4 + 30 + 14 = 48 lead keys,
# so exactly 2 r1-era greens (q_a1, q_a2) make the 50-slot cap; the
# remaining r1/r2 greens queue behind for next round.
# Every key remains present and runnable regardless of order;
# tools/verify_driver.py checks all of them.
_PRIORITY: tuple[str, ...] = (
    # -- (1) the only keys with no official driver row (added post-r4-run) --
    "q_b104_null_safe_join", "q_b105_running_distinct",
    "q_c67_corpus_datasheet", "q_c68_curriculum_phases",
    # -- (2) operators added in round 5: first official rows --
    "q_b106_bitmap_distinct", "q_b107_boolean_aggregates",
    "q_b108_transpose", "q_b109_interval_overlap_join",
    "q_c69_weighted_reservoir", "q_c70_interleave_curriculum",
    "q_c71_pii_class_audit", "q_c72_ngram_novelty",
    "q_b110_stream_update_mode", "q_c73_signature_probe_neardup",
    "q_b111_text_source", "q_b112_binaryfile_source",
    "q_b113_apply_in_arrow", "q_b114_offset_pagination",
    "q_c74_zorder_layout", "q_b115_mode_median",
    "q_b116_event_sequence_match", "q_b117_cached_multi_action",
    "q_c75_segment_dedup_rewrite", "q_c76_epoch_upsample",
    "q_c77_vocab_oov_audit", "q_b118_stream_progress_metrics",
    "q_c78_training_data_plan", "q_b119_analyze_cbo_stats",
    "q_c79_contrastive_pairs", "q_b120_distribute_sort_by",
    "q_b121_parameterized_sql", "q_c80_fertility_regression",
    "q_c81_modality_coverage_audit", "q_b122_try_arithmetic",
    # -- (3) rows-only keys last officially run in r3, + the r4 bench flag --
    "q_b48_watermark_stream", "q_b49_stream_dedup",
    "q_b74_stream_outer_join", "q_c8_minhash_bands",
    "q_c9_simhash_neardup", "q_c12_fingerprint", "q_c14_knn_ann_lsh",
    "q_c17_knn_ivf", "q_c21_knn_pq", "q_c30_kmeans",
    "q_c39_knn_random_projection", "q_c44_coreset_medoids",
    "q_m4_media_phash_neardup",
    "q_b102_stat_aggregates",
    # -- (4) oldest official greens (r1): regression re-checks --
    "q_a1_scan", "q_a2_add_ingest_ts", "q_a4_limit20", "q_a5_count",
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
    # -- (5) r2-era greens, next-oldest evidence --
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
