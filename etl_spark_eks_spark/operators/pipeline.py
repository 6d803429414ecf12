"""The end-to-end LLM-training-data curation pipeline (SURVEY §2 C19):
quality gate -> exact dedup -> near-dup suppression, composed from the
Tier C operator families into one declarative plan.

This is the flagship composition the reference's job shape implies
(scan -> transform -> sink, reference pyspark-taxi-trip.py:37-51) done
for a 100 TB text corpus: every stage is a DataFrame transform, so
Catalyst sees ONE logical plan — the quality filter prunes rows before
any hashing, the exact-dedup hash-shuffle carries only survivors, and
the pairwise near-dup stage runs over the (smaller still) exact-unique
set. Stage order IS the optimization: each rung of the dedup ladder
(SCALE.md) shrinks the input to the more expensive rung after it.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_spark_eks_spark.catalog import load_table, widen
from etl_spark_eks_spark.functions.text import token_stats, tokenize
from etl_spark_eks_spark.operators.dedup import jaccard_near_dedup
from etl_spark_eks_spark.operators.sampling import (
    hash_bucket,
    running_total_before,
)
from etl_spark_eks_spark.registry import query


@query(
    "q_c19_curation_pipeline",
    oracle="""
    WITH stats AS (
      SELECT doc_id, lang, text,
             len(list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '')) AS n_tokens,
             CAST(len(list_distinct(list_filter(
                      string_split_regex(text, '\\s+'), x -> x <> '')))
                  AS DOUBLE)
               / len(list_filter(string_split_regex(text, '\\s+'),
                                 x -> x <> '')) AS dr
      FROM documents
    ), quality AS (
      SELECT doc_id, lang, text, n_tokens FROM stats
      WHERE n_tokens BETWEEN 20 AND 1000 AND dr >= 0.3
    ), exact_unique AS (
      SELECT doc_id, lang, text, n_tokens FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY sha256(text)
                                     ORDER BY doc_id) AS rn
        FROM quality
      ) WHERE rn = 1
    ), toks AS (
      SELECT doc_id, lang,
             list_distinct(list_filter(string_split_regex(text, '\\s+'),
                                       t -> t <> '')) AS toks
      FROM exact_unique
    ), sized AS (
      SELECT doc_id, lang, toks, len(toks) AS n_toks FROM toks
    ), pairs AS (
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM sized a JOIN sized b
        ON a.lang = b.lang
       AND a.doc_id < b.doc_id
       AND abs(a.n_toks - b.n_toks) <= 0.2 * greatest(a.n_toks, b.n_toks)
      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / (a.n_toks + b.n_toks - len(list_intersect(a.toks, b.toks)))
              >= 0.8
    )
    SELECT e.doc_id, e.lang, CAST(e.n_tokens AS BIGINT) AS n_tokens
    FROM exact_unique e
    WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.b = e.doc_id)
    """,
)
def q_c19_curation_pipeline(spark, sf_dir):
    """C19 (extension): the whole curation ladder as one query —

    1. quality gate (20-1000 tokens, distinct ratio >= 0.3): per-row
       expressions, no shuffle, prunes before anything expensive;
    2. exact dedup: sha256 hash-shuffle of survivors, min-doc_id keeper
       per content hash;
    3. near-dup suppression at Jaccard >= 0.8 (same pair contract as
       C2/C18): a doc is dropped if ANY smaller-id doc is its near-dup
       (one left_anti join against the pair list's right side).

    Rule 3 is the greedy-by-id policy: unlike C18's connected
    components it can drop a chain's middle links whose smaller
    neighbor was itself dropped — the standard cheap variant (one
    anti-join, no iteration) when cluster EXACTNESS isn't required;
    C18 is the exact-clustering upgrade. Both policies keep the
    smallest id of any direct near-dup pair.

    Returns the clean corpus as (doc_id, lang, n_tokens).
    """
    d = load_table(spark, sf_dir, "documents")
    stats = token_stats(F.col("text"))
    docs = d.select(
        "doc_id",
        "lang",
        "text",
        stats["n_tokens"].alias("n_tokens"),
        stats["distinct_ratio"].alias("dr"),
    )
    quality = docs.filter(
        F.col("n_tokens").between(20, 1000) & (F.col("dr") >= 0.3)
    )
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    exact_unique = (
        quality.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "text", "n_tokens")
    )
    pairs = jaccard_near_dedup(
        exact_unique, "text", "doc_id", ["lang"], 0.8, 0.2, strategy="allpairs"
    )
    dropped = pairs.select(F.col("doc_id_2").alias("doc_id"))
    return exact_unique.join(dropped, "doc_id", "left_anti").select(
        "doc_id", "lang", "n_tokens"
    )


# The classifier CTE replicates q_c49's oracle fragment exactly
# (md5-derived weights, portable across engines).
_C54_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\s+'),
                            t -> t <> '')) AS token
  FROM documents
),
feats AS (
  SELECT doc_id,
         (('0x' || substr(md5(token), 1, 8))::BIGINT % 256) AS fidx
  FROM toks
),
weights AS (
  SELECT i AS fidx,
         (((('0x' || substr(md5('w' || CAST(i AS VARCHAR)), 1, 8))
            ::BIGINT % 2001) - 1000) / 1000.0) AS w
  FROM generate_series(0, 255) t(i)
),
probs AS (
  SELECT doc_id,
         ROUND(1 / (1 + EXP(-(SUM(w) - 0.1))), 6) AS prob
  FROM feats JOIN weights USING (fidx)
  GROUP BY doc_id
),
m AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
           AS n_tokens,
         CAST(len(list_distinct(list_filter(
                string_split_regex(text, '\s+'), x -> x <> '')))
              AS DOUBLE)
           / len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
           AS dr,
         CAST(n_chars - len(list_filter(
                string_split_regex(text, '\s+'), x -> x <> '')) + 1
              AS DOUBLE)
           / len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
           AS atl
  FROM documents
  WHERE len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) > 0
)
SELECT m.doc_id,
       concat_ws(',',
         CASE WHEN NOT (m.n_tokens BETWEEN 20 AND 1000) THEN 'length' END,
         CASE WHEN NOT (m.dr >= 0.3) THEN 'repetition' END,
         CASE WHEN NOT (m.atl BETWEEN 3 AND 10) THEN 'token_shape' END,
         CASE WHEN NOT (p.prob >= 0.5) THEN 'classifier' END
       ) AS reasons_csv,
       (CASE WHEN NOT (m.n_tokens BETWEEN 20 AND 1000) THEN 1 ELSE 0 END
        + CASE WHEN NOT (m.dr >= 0.3) THEN 1 ELSE 0 END
        + CASE WHEN NOT (m.atl BETWEEN 3 AND 10) THEN 1 ELSE 0 END
        + CASE WHEN NOT (p.prob >= 0.5) THEN 1 ELSE 0 END) AS n_failed,
       (m.n_tokens BETWEEN 20 AND 1000 AND m.dr >= 0.3
        AND m.atl BETWEEN 3 AND 10 AND p.prob >= 0.5) AS keep
FROM m JOIN probs p USING (doc_id)
"""


@query("q_c54_filter_ensemble", oracle=_C54_ORACLE)
def q_c54_filter_ensemble(spark, sf_dir):
    """C54 (extension): curation filter ENSEMBLE with per-rule
    attribution — every document evaluated against the whole rule
    ladder at once (length bounds, distinct-token repetition gate,
    token-shape sanity, C49's model classifier), emitting the keep
    verdict plus WHICH rules failed as a stable CSV. The attribution
    column is what C19's single-verdict pipeline can't give: corpus
    triage ("62% of rejects are length — re-chunk, don't re-scrape")
    requires knowing why each doc fell, and a production curation run
    logs exactly this table next to the kept corpus.

    All heuristic rules are per-row projections sharing one scan;
    the classifier arm reuses C49's broadcast-weight serving stage
    (classifier_quality_prob — same plan: tokens never shuffle, one
    doc_id aggregation), joined back on doc_id. Reasons concatenate
    in a FIXED rule order (concat_ws skips the null non-failures
    identically in both engines), so the string is hash-stable.

    Scale: one corpus scan for the heuristics + the classifier's
    explode/agg pass, joined on doc_id — the ensemble adds rules as
    columns, not passes; co-partitioning on doc_id makes the verdict
    join AQE-reusable."""
    from etl_spark_eks_spark.operators.text_analysis import (
        classifier_quality_prob,
    )

    d = load_table(spark, sf_dir, "documents")
    stats = token_stats(F.col("text"))
    n = stats["n_tokens"]
    m = d.select(
        "doc_id",
        n.alias("n_tokens"),
        stats["distinct_ratio"].alias("dr"),
        ((F.col("n_chars") - n + 1).cast("double") / n).alias("atl"),
    ).filter(F.col("n_tokens") > 0)
    probs = classifier_quality_prob(spark, d)
    j = m.join(probs, "doc_id")
    fail_len = ~F.col("n_tokens").between(20, 1000)
    fail_rep = ~(F.col("dr") >= 0.3)
    fail_shape = ~F.col("atl").between(3, 10)
    fail_clf = ~(F.col("prob") >= 0.5)
    as_flag = lambda c, name: F.when(c, F.lit(name))  # noqa: E731
    n_failed = sum(
        F.when(c, 1).otherwise(0)
        for c in (fail_len, fail_rep, fail_shape, fail_clf)
    )
    return j.select(
        "doc_id",
        F.concat_ws(
            ",",
            as_flag(fail_len, "length"),
            as_flag(fail_rep, "repetition"),
            as_flag(fail_shape, "token_shape"),
            as_flag(fail_clf, "classifier"),
        ).alias("reasons_csv"),
        n_failed.cast("int").alias("n_failed"),
        (~fail_len & ~fail_rep & ~fail_shape & ~fail_clf).alias("keep"),
    )


@query(
    "q_c78_training_data_plan",
    oracle=r"""
    WITH q AS (
      SELECT doc_id,
             ('0x' || substr(md5(sha256(text)), 1, 8))::BIGINT % 1000
               AS bucket,
             len(list_filter(string_split_regex(text, '\s+'),
                             x -> x <> '')) AS n_tokens,
             ROUND(CAST(len(list_distinct(list_filter(
                     string_split_regex(text, '\s+'), x -> x <> '')))
                   AS DOUBLE)
                   / len(list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> '')), 6) AS quality
      FROM documents
    ),
    train AS (
      SELECT doc_id, n_tokens, quality,
             CAST(1000000 - ROUND(quality * 1000000) AS BIGINT)
               * 1000000000000 + doc_id AS sort_key
      FROM q WHERE bucket < 900 AND n_tokens >= 20
    ),
    phased AS (
      SELECT doc_id, n_tokens, quality, sort_key,
             CAST(FLOOR(CAST(COALESCE(SUM(n_tokens) OVER (
                    ORDER BY sort_key ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS DOUBLE) / 20000) AS BIGINT)
               AS phase
      FROM train
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, quality, phase,
           CAST(FLOOR(CAST(COALESCE(SUM(n_tokens) OVER (
                  PARTITION BY phase
                  ORDER BY sort_key ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) AS DOUBLE) / 4000) AS BIGINT)
             AS shard_id
    FROM phased
    ORDER BY doc_id
    """,
)
def q_c78_training_data_plan(spark, sf_dir):
    """C78 (extension): the END-TO-END training-run data plan — what a
    user of this engine actually ships to the trainer, as ONE
    declarative query. Stages, each individually proven elsewhere:

    1. leakage-safe TRAIN selection (C29's content-keyed permille
       bucket of sha256(text) < 900) fused with a minimal quality
       floor (>= 20 tokens) — per-row, zero shuffle, prunes first;
    2. quality-ordered CURRICULUM phases (C68: quantized 6dp bigint
       sort key, stride 1e12 so doc_id < 1e12 never bleeds into the
       next quality level, into the shared two-phase prefix sum with
       bucket_size=1e12 — the bucket IS the quality rank, 20k-token
       budgets — best data in phase 0);
    3. within-phase SHARD packing (C24's machinery partitioned by
       phase, 4k-token shards) — the dataloader's file-granularity
       unit, phase-aligned so a phase boundary is always a shard
       boundary.

    Output manifest: (doc_id, n_tokens, quality, phase, shard_id) —
    join it back to text/payloads at materialization time (M6's
    pattern). Every stage is a pure function of content, so the whole
    plan is reproducible under retries, appends, and re-runs; the
    oracle replays it as two plain SQL windows.

    Scale: one corpus projection + the prefix sum's two tiny shuffles,
    run TWICE (global for phases, phase-partitioned for shards) —
    with bucket == quality rank the serial offset window is bounded
    by the 1e6+1 quantization levels (per phase for the shard pass),
    independent of n; no global sort, no stage sees more than
    (quality-level count x phases) rows at the driver.
    This is the composition argument made concrete: the capstone plan
    costs what its heaviest primitive costs (C68's prefix sum), not
    the sum of a pipeline of materializations."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokenize("text")
    b = hash_bucket(F.sha2(F.col("text"), 256))
    q = widen(d).select(
        "doc_id",
        b.alias("bucket"),
        F.size(toks).alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("quality"),
    )
    train = q.filter((F.col("bucket") < 900) & (F.col("n_tokens") >= 20))
    # Stride 1e12 (doc_id precondition: doc_id < 1e12; max key ~1.000001e18
    # stays inside bigint). bucket_size=1e12 makes the prefix-sum bucket
    # exactly the quality rank — a DENSE key (<= 1e6+1 non-empty buckets),
    # so the serial offset window is bounded by the quantization domain,
    # not by n as the old sparse sort_key/100 bucketing was.
    keyed = train.withColumn(
        "sort_key",
        (F.lit(1_000_000) - F.round(F.col("quality") * 1_000_000)).cast(
            "bigint"
        )
        * 1_000_000_000_000
        + F.col("doc_id"),
    )
    phased = running_total_before(
        keyed, "sort_key", "n_tokens", bucket_size=1_000_000_000_000
    ).select(
        "doc_id",
        "n_tokens",
        "quality",
        "sort_key",
        F.floor(F.col("__cum_before").cast("double") / 20_000)
        .cast("bigint")
        .alias("phase"),
    )
    sharded = running_total_before(
        phased,
        "sort_key",
        "n_tokens",
        bucket_size=1_000_000_000_000,
        partition_cols=("phase",),
    )
    return sharded.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "quality",
        "phase",
        F.floor(F.col("__cum_before").cast("double") / 4_000)
        .cast("bigint")
        .alias("shard_id"),
    ).orderBy("doc_id")
