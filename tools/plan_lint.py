#!/usr/bin/env python
"""Plan lint: walk EVERY registered query's physical plan and flag the
three 100 TB anti-patterns mechanically, instead of auditing plans
anecdotally:

  1. cartesian   — CartesianProduct / BroadcastNestedLoopJoin (a join
                   that compares every pair; at scale this is the
                   cliff, not a slowdown)
  2. py_row      — BatchEvalPython / row-at-a-time Python UDF in the
                   plan (the 10-100x slow path vs Arrow batches)
  3. single_part — an Exchange SinglePartition feeding work that is
                   not by-construction tiny (serial-task cliff)

Each hit is either in the query's documented allowlist (the docstring
owns the justification) or a lint FAILURE. tests/test_plans.py runs
this as a test, so a new operator that silently plans a cartesian or
a Python row loop fails CI with a pointer here.

Usage: python tools/plan_lint.py [--only=k1,k2]   (exit 1 on violations)
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.001"

# Allowlists: every entry is justified in the named query's docstring.
ALLOW_CARTESIAN = {
    "q_b16_cross_small",       # the intentional CROSS JOIN surface demo
    "q_b19_approx_cd",         # 1-row x 1-row join of the two aggregate halves (code comment: 4x faster than one Expand-planned agg)
    "q_b83_event_gap_detection",  # type-list x hour-spine (5 x ~720) — the deliberate gap spine
    "q_b13_join_theta",        # theta join IS the declared operator
    "q_c3_knn_cosine",         # brute-force kNN: broadcast queries x corpus is the baseline contract
    "q_c79_contrastive_pairs", # same broadcast-anchors x corpus contract (docstring: ANN ladder composes for big anchor sets)
    "q_c94_matryoshka_recall", # same broadcast-queries x corpus contract (docstring: exact recall baseline; ANN ladder is the scale path)
    "q_c98_semantic_decontam", # same broadcast-eval x corpus contract (docstring: k-sized eval side; C97 sign buckets are the big-k pre-filter)
    "q_c101_source_divergence_matrix", # broadcast 190-row pair dim x CONTRACTED vocab table (docstring: vocab x k^2 map-side, corpus touched once)
    "q_b149_calendar_gap_fill",   # keys x broadcast 1-row date-bounds fold (the spine construction; never touches the fact table)
    "q_c107_exact_apportionment", # strata x broadcast 1-row total/target fold (the quota derivation)
    "q_c14_knn_ann_lsh",       # ANN probe: query x bucket candidates (bucketed, k-sized side)
    "q_c17_knn_ivf",           # probe x centroid table (k-sized)
    "q_c21_knn_pq",            # probe x codebook (k-sized)
    "q_c30_kmeans",            # point x centroid assignment (k centroids)
    "q_c39_knn_random_projection",
    "q_c44_coreset_medoids",   # medoid x medoid (k x k)
    "q_c15_embedding_neardup", # bucketed pair verify vs 1-row stats
    "q_c4_embedding_stats",    # crossJoin(broadcast 1-row stats table)
    "q_c43_embedding_winsorize",  # 1-row bounds table
    "q_c53_int8_quantize",     # 1-row quantizer bounds
    "q_c57_embedding_outliers",   # 1-row moment table
    "q_c59_split_divergence",  # tiny distribution x distribution compare
    "q_c67_corpus_datasheet",  # 1-row fold x 1-row fold datasheet join
    "q_c2_near_dedup_jaccard", # documented allpairs-within-block strategy demo
    "q_c18_dedup_clusters",    # same blocked allpairs (C8 is the scale path)
    "q_c58_cluster_canonicals",
    "q_c12_fingerprint",       # winnowing window constant x token stream
    "q_c38_bigram_lm",         # 1-row vocab-size table
    "q_c26_unigram_logprob",   # 1-row corpus-total table
    "q_c52_doc_perplexity",    # 1-row LM normalizer
    "q_c48_zipf_histogram",    # 1-row total
    "q_c31_length_quantiles",  # 1-row quantile bounds
    "q_c66_feed_anomaly_zscore",  # types-sized moment table
    "q_c41_source_drift",      # snapshot x snapshot distribution compare (sources-sized)
    "q_c49_classifier_quality",   # 1-row broadcast weight vector
    "q_c105_quality_rate_confidence",  # 1-row corpus-rate broadcast (C26's class)
    "q_c63_k_anonymity",       # cells-sized generalization table
    "q_c23_domain_mix",        # broadcast rate VALUES table pre-AQE shows BNLJ on null-aware anti
    "q_c25_decontaminate",     # broadcast benchmark-hash anti join (null-aware)
    "q_c29_content_split",     # broadcast split-bounds row
    "q_c55_ngram_contamination",  # broadcast benchmark shingle set
    "q_c64_containment_neardup",  # pigeonhole prefix probe (docstring: measured shape)
    "q_c68_curriculum_phases",    # 1-row budget total
    "q_c76_epoch_upsample",    # 1-row budget x language-count rate table (docstring: zero corpus shuffle)
    "q_c84_token_budget_waterfill",  # 1-row totals/fill x langs-sized allocation table
    "q_c45_length_banded_packing",  # band-offset table
    "q_c24_pack_shards",       # bucket-offset broadcast
    "q_m3_media_shard_pack",
    "q_m5_media_curation",
    "q_m10_tar_member_offsets",
    "q_m4_media_phash_neardup",   # banded pair verify
    "q_m9_cdc_chunk_dedup",
    "q_c22_hash_sample",
    "q_c36_stratified_sample",    # per-stratum rate row
    "q_c40_temperature_mix",      # per-group rate table
    "q_c56_quota_sample",
    "q_c33_domain_caps",
    "q_c46_stable_seq_ids",
    "q_c47_sketch_partials",
    "q_c5_top_terms",             # 1-row doc-count
    "q_c7_tfidf",                 # 1-row doc-count
    "q_c60_bm25_topk",            # 1-row avgdl + query-term broadcast
    "q_c10_quality_score",
    "q_c54_filter_ensemble",
    "q_c19_curation_pipeline",
    "q_c27_incremental_dedup",    # broadcast batch probe
    "q_c73_signature_probe_neardup",  # broadcast batch band/token tables
    "q_c34_snapshot_diff",
    "q_c37_shared_chunks",
    "q_c50_boilerplate_ngrams",
    "q_c61_pagerank",             # broadcast rank table (edges never shuffle)
    "q_c72_ngram_novelty",
    "q_b43_scalar_subquery",      # scalar subquery = 1-row broadcast by definition
    "q_b78_observed_metrics",
    "q_b109_interval_overlap_join",  # hash join on bkt; tiny side may plan BNLJ pre-AQE at sf0.001
    "q_b88_robust_stats",         # 1-row median/MAD bounds
    "q_b102_stat_aggregates",
    "q_c62_unicode_normalize",
    "q_c71_pii_class_audit",
    "q_c11_token_count_regex",
    "q_c13_lang_id",
    "q_c20_pii_scrub",
    "q_c28_repetition_metrics",
    "q_c32_doc_chunking",
    "q_c51_bpe_pair_stats",       # vocab-bounded pair scan
    "q_c65_scd2_history",
    "q_c8_minhash_bands",         # banded self-join candidates
    "q_c9_simhash_neardup",
    "q_c16_ngram_jaccard",
    # 1-row totals tables broadcast-cross-joined (C26's class)
    "q_c91_dsir_importance",
    "q_c92_perplexity_buckets",
}
ALLOW_PY_ROW = {
    "q_b51_python_udf",   # the row-at-a-time surface demo the contract requires
    "q_b55_udtf_explode", # UDTF row interface
    "q_b73_python_udtf",  # python UDTF row interface
    "q_b97_python_datasource",  # python data source reader runs row generators
    "q_b147_polymorphic_udtf",  # python UDTF row interface (the analyze()-time polymorphism is the operator)
}
ALLOW_SINGLE_PART = {
    # global-scalar audit folds: the whole output IS one (or a few)
    # rows built from partial-aggregated counts — the single partition
    # holds the k-byte final fold, never corpus rows
    "q_c103_dup_rate_estimation",   # 1-row six-count conditional agg
    "q_b146_output_file_sizing",    # 1-row content/audit fold + per-file stats agg
    "q_b149_calendar_gap_fill",     # 1-row date-bounds fold feeding the spine
    "q_c105_quality_rate_confidence",  # 1-row corpus-rate fold broadcast back
    "q_c107_exact_apportionment",   # remainder-rank window over the |strata| (20-row) quota table
    # bucket-/band-offset windows over n/bucket_size tables (plan-tested)
    "q_c24_pack_shards", "q_c45_length_banded_packing",
    "q_c88_shard_mix_audit",
    "q_c46_stable_seq_ids", "q_c68_curriculum_phases",
    "q_m3_media_shard_pack", "q_m5_media_curation",
    "q_m10_tar_member_offsets",
    # k-sized / report-sized tails documented in the docstrings
    "q_b33_topk", "q_b58_percentiles", "q_c31_length_quantiles",
    "q_c12_fingerprint", "q_c42_inverted_index", "q_c44_coreset_medoids",
    "q_c5_top_terms", "q_c48_zipf_histogram", "q_c60_bm25_topk",
    "q_c100_vocab_coverage_curve",  # global rank window over the contracted VOCAB table (C77/C48 discipline)
    "q_c67_corpus_datasheet", "q_b108_transpose",
    "q_b84_recursive_cte",  # frontier is depth-bounded
    "q_c30_kmeans", "q_c61_pagerank",  # k-sized centroid/rank folds
    "q_c59_split_divergence", "q_c41_source_drift",
    "q_b90_multiset_ops", "q_b95_pipe_syntax",
    # global vocab-rank window runs over the VOCAB table (vocab-sized,
    # never the corpus — docstring-owned)
    "q_c77_vocab_oov_audit",
    # C68-style prefix sum: offset window over quality-rank buckets,
    # bounded by the 1e6+1 quantization levels, not n
    "q_c78_training_data_plan",
    # 1-row corpus-total fold (C26's class); C92 additionally runs the
    # C78-style offset window over quantized-score buckets per lang
    "q_c91_dsir_importance",
    "q_c92_perplexity_buckets",
    # waterfill rank window runs on the |languages|-row table
    "q_c84_token_budget_waterfill",
    # offsets window over the |partitions|-row totals table
    "q_c86_range_prefix_sum",
    # bloom_filter_agg subquery folds the build side to ONE filter
    # value (1-row by construction) + a 1-group final agg
    "q_b132_runtime_bloom_join",
    "q_c38_bigram_lm", "q_c49_classifier_quality",
    "q_c9_simhash_neardup", "q_m4_media_phash_neardup",
    "q_c2_near_dedup_jaccard", "q_c18_dedup_clusters",
    "q_c58_cluster_canonicals", "q_c16_ngram_jaccard",
    "q_c34_snapshot_diff",
    # global scalar aggregates: the final single-partition exchange
    # folds per-partition PARTIAL aggregates (#partitions rows), the
    # map-side combine having already reduced the data — the canonical
    # two-phase COUNT/SUM shape, fine at any scale
    "q_a5_count", "q_b1_register_star", "q_b18_count_distinct",
    "q_b19_approx_cd", "q_b85_funnel_analysis",
    # 1-row stat/bound/budget/spine-seed tables feeding broadcasts
    # (each documented in its query's docstring)
    "q_b43_scalar_subquery", "q_b83_event_gap_detection",
    "q_c26_unigram_logprob", "q_c40_temperature_mix",
    "q_c43_embedding_winsorize", "q_c76_epoch_upsample",
    "q_c7_tfidf",
}
# Streaming queries run real streams inside the builder; their plans are
# micro-batch internals, not batch plans — lint the batch surface only.
SKIP = {
    "q_b48_watermark_stream", "q_b49_stream_dedup",
    "q_b50_exactly_once_rerun", "q_b56_stateful_user_stats",
    "q_b57_stream_stream_join", "q_b66_stream_static_join",
    "q_b72_foreachbatch_upsert", "q_b74_stream_outer_join",
    "q_b91_stream_complete_mode", "q_b98_stream_session_window",
    "q_b110_stream_update_mode",
}


def lint(only=None) -> dict[str, list[str]]:
    from etl_spark_eks_spark import registry
    from etl_spark_eks_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="plan-lint")
    spark.sparkContext.setLogLevel("ERROR")

    keys = [k for k in registry.QUERIES if k not in SKIP]
    if only:
        keys = [k for k in keys if k in only]
    violations: dict[str, list[str]] = {}
    for k in keys:
        df = registry.QUERIES[k](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        hits = []
        if (
            "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
        ) and k not in ALLOW_CARTESIAN:
            hits.append("cartesian")
        if (
            "BatchEvalPython" in plan or "PythonUDTF" in plan
        ) and k not in ALLOW_PY_ROW:
            hits.append("py_row")
        # explain("formatted") prints the exchange as "(n) Exchange" with
        # "Arguments: SinglePartition ..." on its own line, so match the
        # argument token alone — the contiguous "Exchange SinglePartition"
        # form only appears in simple-mode explain output.
        if "SinglePartition" in plan and k not in ALLOW_SINGLE_PART:
            hits.append("single_part")
        if hits:
            violations[k] = hits
    return violations


def main() -> int:
    only = None
    for arg in sys.argv[1:]:
        if arg.startswith("--only="):
            only = set(arg.split("=", 1)[1].split(","))
    v = lint(only)
    for k, hits in sorted(v.items()):
        print(f"VIOLATION {k}: {', '.join(hits)}")
    print(f"== {len(v)} violations ==")
    return 1 if v else 0


if __name__ == "__main__":
    raise SystemExit(main())
