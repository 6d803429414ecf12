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
# therefore a measurement decision, not cosmetics. After round 6's run
# (CORRECTNESS_r06: 50/50 clean — all 47 lead round-6 additions plus the
# 3 reworked keys) exactly SEVENTEEN keys still lack an official driver
# row: the round-6 additions that queued at slots 51-67 past the cap
# (q_b145-q_b152, q_c102-q_c109, q_m16 — all green under the identical
# local oracle gate, tests/test_oracle.py). Round 7 therefore leads
# with: (1) those 17 first-evidence keys, then (2) the oldest official
# greens — the r1-era core (q_a1..q_b59 family, last driver row round 1)
# — filling the remaining 33 cap slots so no key's official evidence
# goes >3 rounds stale. The rest of the r1/r2-era backlog queues behind
# for round 8's rotation.
# ROUND-8 NOTE: every operator ADDED in round 7 (q_b154-q_b175
# surfaces/composites, q_c110-q_c123 pipeline ops, q_m17-q_m18 — all
# oracle-green locally, 36 keys) has no official row yet and should
# lead round 8's slots, followed by the remaining r1/r2-era rotation.
# Every key remains present and runnable regardless of order;
# tools/verify_driver.py checks all of them.
_PRIORITY: tuple[str, ...] = (
    # -- (1) the 17 keys with no official row yet (round-6 slots 51-67) --
    "q_b145_ignore_missing_files", "q_b146_output_file_sizing",
    "q_b147_polymorphic_udtf", "q_b148_dynamic_session_gap",
    "q_b149_calendar_gap_fill", "q_b150_modern_string_funcs",
    "q_b151_sql_unpivot_clause", "q_b152_insert_by_name",
    "q_c102_substring_span_surgery", "q_c103_dup_rate_estimation",
    "q_c104_lang_confusion_matrix", "q_c105_quality_rate_confidence",
    "q_c106_threshold_selection", "q_c107_exact_apportionment",
    "q_c108_shuffle_uniformity_audit", "q_c109_source_diversity_sample",
    "q_m16_manifest_reconciliation",
    # -- (2) oldest official greens (last row r1) — 33 rotation slots
    #    (q_a1/q_a2 were re-verified in r5, so they queue in (3)) --
    "q_a4_limit20", "q_a5_count",
    "q_a6_repartition_roundtrip", "q_a7_write_roundtrip",
    "q_a8_catalog_projection",
    "q_b1_register_star", "q_b2_json_extract", "q_b3_partitioned_write",
    "q_b4_filter_conj", "q_b5_filter_disj_in", "q_b6_project_arith",
    "q_b7_case_when", "q_b8_join_inner", "q_b9_join_outer",
    "q_b10_join_semi", "q_b11_join_anti", "q_b15_join_asof",
    "q_b16_cross_small", "q_b18_count_distinct", "q_b23_grouping_sets",
    "q_b24_drop_duplicates", "q_b26_ranking", "q_b27_topn_per_group",
    "q_b28_lag_lead", "q_b29_running_sum", "q_b30_sliding_avg",
    "q_b31_ntile", "q_b32_sort_multi", "q_b33_topk", "q_b34_union",
    "q_b35_intersect", "q_b36_except", "q_b37_string_funcs",
    # -- (3) remaining r1-era greens, queue for round 8 --
    "q_b38_regex",
    "q_b39_date_funcs", "q_b40_math_funcs", "q_b58_percentiles",
    "q_b59_pivot", "q_a1_scan", "q_a2_add_ingest_ts",
    # -- (4) r2-era greens, next-oldest evidence --
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
