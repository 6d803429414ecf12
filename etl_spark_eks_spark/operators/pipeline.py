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

from etl_spark_eks_spark.catalog import load_table
from etl_spark_eks_spark.functions.text import token_stats
from etl_spark_eks_spark.operators.dedup import jaccard_near_dedup
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
