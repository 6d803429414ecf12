"""Scalar function surface (SURVEY §2 B37-B42): strings, regex,
date/time, math, arrays/explode, JSON-as-map.

All are JVM-side built-ins inside whole-stage codegen — no Python in the
hot path. Oracle SQL sticks to dialect-safe constructs (DuckDB and
Spark agree on these exact semantics; asserted by the differential
tests).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark_eks_spark.catalog import load_table
from etl_spark_eks_spark.functions.text import tokenize
from etl_spark_eks_spark.registry import query


@query(
    "q_b37_string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           TRIM(CONCAT('  ', c_name, '  ')) AS name_trimmed,
           LENGTH(c_name) AS name_len,
           (c_name LIKE '%1%') AS has_one
    FROM customer
    """,
)
def q_b37_string_funcs(spark, sf_dir):
    """B37: upper/lower/substring/trim/concat/length/like."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
        F.length("c_name").cast("long").alias("name_len"),
        F.col("c_name").like("%1%").alias("has_one"),
    )


@query(
    "q_b38_regex",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_name, '[0-9]', 'x', 'g') AS masked,
           regexp_matches(c_name, '[0-9]{2}') AS has_2digits
    FROM customer
    """,
)
def q_b38_regex(spark, sf_dir):
    """B38: regexp extract/replace/match with dialect-safe patterns.
    (DuckDB regexp_replace needs the 'g' flag to match Spark's
    replace-all semantics.)"""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", "[0-9]", "x").alias("masked"),
        F.col("c_name").rlike("[0-9]{2}").alias("has_2digits"),
    )


@query(
    "q_b39_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(day(o_orderdate) AS INTEGER) AS dom,
           date_trunc('month', o_orderdate) AS month_start,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3mo
    FROM orders
    """,
)
def q_b39_date_funcs(spark, sf_dir):
    """B39: year/month/day, date_trunc, day difference, month arithmetic
    (both engines clamp month-end: Jan 31 + 1 month = Feb 29)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_y2k"),
        # timestamp (not date) output: date-typed cells render differently
        # across engines' pandas conversion; timestamps are unambiguous
        F.add_months(F.col("o_orderdate").cast("date"), 3)
        .cast("timestamp")
        .alias("plus3mo"),
    )


@query(
    "q_b40_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_extendedprice - 50000) AS abs_dev,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           SQRT(l_extendedprice) AS price_sqrt,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
           ROUND(l_discount * 100, 2) AS disc_pct
    FROM lineitem
    """,
)
def q_b40_math_funcs(spark, sf_dir):
    """B40: abs/ceil/floor/sqrt/mod/round. ceil/floor cast to BIGINT on
    both sides (Spark returns LONG, DuckDB DOUBLE)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000).alias("abs_dev"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod7"),
        F.round(F.col("l_discount") * 100, 2).alias("disc_pct"),
    )


@query(
    "q_b41_array_explode",
    oracle="""
    SELECT doc_id, token, len(string_split(text, ' ')) AS n_tokens
    FROM (SELECT doc_id, text, unnest(string_split(text, ' ')) AS token
          FROM documents WHERE doc_id < 20) t
    """,
)
def q_b41_array_explode(spark, sf_dir):
    """B41: split -> array -> explode (the UDTF shape), with array size.
    Bounded to 20 docs so the expansion is test-sized; at scale explode
    is partition-local (no shuffle)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    toks = d.select(
        "doc_id",
        F.split("text", " ").alias("tokens"),
    )
    return toks.select(
        "doc_id",
        F.explode("tokens").alias("token"),
        F.size("tokens").cast("long").alias("n_tokens"),
    )


@query(
    "q_b42_props_map",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           (CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 = 0) AS k_round
    FROM events
    """,
)
def q_b42_props_map(spark, sf_dir):
    """B42: JSON props parsed to a typed map, then key access — the
    parsed-payload form of B2 (from_json vs get_json_object)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", F.from_json("props", "map<string,int>").alias("m")
    )
    return parsed.select(
        "event_id",
        F.col("m")["k"].alias("k"),
        ((F.col("m")["k"] % 10) == 0).alias("k_round"),
    )


@query(
    "q_b71_array_hof",
    oracle="""
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT)
             AS total_chars,
           CAST(len(list_filter(t, x -> length(x) > 4)) AS BIGINT)
             AS n_long_tokens,
           CAST(list_max(list_transform(t, x -> length(x))) AS BIGINT)
             AS max_token_len,
           ROUND(CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
                 / len(t), 6) AS avg_token_len
    FROM (SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS t
          FROM documents)
    """,
)
def q_b71_array_hof(spark, sf_dir):
    """B71: higher-order array functions — transform / filter /
    aggregate over the token array, entirely inside Catalyst (no
    explode, no UDF, no shuffle). The lambda surface is how array-typed
    columns (token lists, embeddings) are processed per-row at scale:
    explode-then-groupBy pays a corpus-sized generate plus a shuffle to
    reassemble what a fold computes in place.

    The transform(length) result is bound to one projected column and
    referenced by sum/max — mirroring the materialize-expensive-arrays
    rule from the MinHash path (functions/text.py:84): higher-order
    lambdas are interpreted (no codegen CSE), so repeated inline copies
    of the same transform would each re-evaluate.

    Scale: pure per-row projection pipelined into the scan; zero
    shuffle at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokenize("text")
    withs = d.select("doc_id", toks.alias("t")).withColumn(
        "lens", F.transform("t", lambda x: F.length(x))
    )
    total = F.aggregate("lens", F.lit(0), lambda a, x: a + x)
    return withs.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        total.cast("long").alias("total_chars"),
        F.size(F.filter("t", lambda x: F.length(x) > 4))
        .cast("long")
        .alias("n_long_tokens"),
        F.array_max("lens").cast("long").alias("max_token_len"),
        F.round(
            total.cast("double") / F.size("t"), 6
        ).alias("avg_token_len"),
    )


@query(
    "q_b76_explode_outer",
    oracle=r"""
    WITH sh AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 48
                  THEN list_transform(range(1, len(t) - 46),
                         i -> array_to_string(t[i : i + 47], ' '))
                  ELSE [] END AS s
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(text, '\s+'),
                               x -> x <> '') AS t
            FROM documents)
    )
    SELECT doc_id, unnest(s) AS shingle FROM sh WHERE len(s) > 0
    UNION ALL
    SELECT doc_id, NULL AS shingle FROM sh WHERE len(s) = 0
    """,
)
def q_b76_explode_outer(spark, sf_dir):
    """B76: explode_outer — generator rows for empty arrays. A plain
    explode DROPS rows whose array is empty (here: documents shorter
    than the 48-token shingle width), which silently shrinks any
    per-document accounting downstream. explode_outer keeps the row
    with a NULL element — the LEFT-JOIN-LATERAL semantics — so
    short documents survive into per-doc aggregates as zero-shingle
    rows instead of vanishing. The distinction is exactly the
    silent-drop class B69/B75 guard against, at the operator level.

    Scale: identical cost to explode (partition-local generate, no
    shuffle); the NULL branch adds one row per empty-array input."""
    d = load_table(spark, sf_dir, "documents")
    from etl_spark_eks_spark.functions.text import shingles

    sh = d.select(
        "doc_id", shingles(tokenize("text"), 48).alias("s")
    )
    return sh.select(
        "doc_id", F.explode_outer("s").alias("shingle")
    )


@query(
    "q_b77_union_missing_columns",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(NULL AS VARCHAR) AS o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def q_b77_union_missing_columns(spark, sf_dir):
    """B77: schema-evolving union — unionByName with
    allowMissingColumns combines an old-schema batch (no priority
    column) with a new-schema batch, null-filling the missing column
    BY NAME. Positional union would mis-align or reject the drifted
    schemas; this is the DataFrame-level twin of B62's mergeSchema
    read (drift at the union, not the scan), the routine shape when a
    landing zone carries batches from before and after a producer
    deploy.

    Scale: union is a plan concatenation — no shuffle, no data
    movement; the null fill is a projection."""
    o = load_table(spark, sf_dir, "orders")
    old_batch = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    new_batch = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    return old_batch.unionByName(new_batch, allowMissingColumns=True)


@query(
    "q_b79_map_functions",
    oracle=r"""
    WITH counts AS (
      SELECT doc_id, token, COUNT(*) AS cnt
      FROM (SELECT doc_id,
                   unnest(list_filter(string_split_regex(text, '\s+'),
                                      x -> x <> '')) AS token
            FROM documents WHERE doc_id < 50) t
      GROUP BY doc_id, token
    ), totals AS (
      SELECT doc_id, SUM(cnt) AS tot FROM counts GROUP BY doc_id
    )
    SELECT c.doc_id, c.token, c.cnt,
           ROUND(CAST(c.cnt AS DOUBLE) / t.tot, 6) AS share
    FROM counts c JOIN totals t USING (doc_id)
    WHERE c.cnt >= 2
    """,
)
def q_b79_map_functions(spark, sf_dir):
    """B79: map-typed higher-order functions — the per-document term
    frequency MAP built with map_from_entries, thinned with map_filter
    (counts >= 2), reweighted with transform_values (count -> share of
    doc), merged with map_zip_with, then exploded back to rows for
    comparison. Map columns are how per-entity feature bundles travel
    through a pipeline as one value (feature stores, per-doc vocab
    stats); this is the map-lambda surface complementing B71's array
    lambdas.

    Scale: the map is per-document — bounded by doc vocabulary, never
    corpus vocabulary; construction is the same one-shuffle (doc_id,
    token) count every per-doc text stat pays, and every map lambda is
    per-row. The total used by transform_values comes from
    aggregate() over the map's own values, and map_zip_with fuses the
    kept counts with their shares in place — no second shuffle, no
    self-join."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    counts = (
        d.select("doc_id", F.explode(tokenize("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
    )
    as_map = counts.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("token", "cnt"))
        ).alias("tf")
    )
    tot = F.aggregate(
        F.map_values("tf"), F.lit(0).cast("long"), lambda a, x: a + x
    )
    kept = F.map_filter("tf", lambda k, v: v >= 2)
    shares = F.transform_values(
        kept, lambda k, v: F.round(v.cast("double") / tot, 6)
    )
    zipped = F.map_zip_with(
        kept,
        shares,
        lambda k, c, s: F.struct(c.alias("cnt"), s.alias("share")),
    )
    return (
        as_map.select("doc_id", F.explode(zipped).alias("token", "cs"))
        .select(
            "doc_id",
            "token",
            F.col("cs.cnt").alias("cnt"),
            F.col("cs.share").alias("share"),
        )
    )


@query(
    "q_b94_variant_type",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS sum_k,
           CAST(COUNT(*) FILTER (
             CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
           ) AS BIGINT) AS n_high
    FROM events
    GROUP BY event_type
    """,
)
def q_b94_variant_type(spark, sf_dir):
    """B94: the VARIANT semi-structured type (Spark 4's headline
    open-lakehouse feature) — props parsed ONCE into VARIANT's binary
    encoding with `parse_json`, fields then extracted by typed path
    (`variant_get`) as many times as needed. B2's `get_json_object`
    re-parses the raw JSON string per extraction expression; VARIANT
    moves the parse to ingestion, after which every access is a
    binary-offset lookup — the difference between O(extractions) and
    O(1) parses per row, and the representation parquet can SHRED
    into typed subcolumns at write time (pushdown/pruning on JSON
    fields).

    The oracle reads the same fields through DuckDB's JSON path —
    value equality across the two encodings is exactly the VARIANT
    contract being checked.

    Scale: parse_json is a per-row projection (pipelines into the
    scan); the aggregate is one map-side-combined shuffle. At 100 TB
    the pattern is parse at landing, store VARIANT, extract freely
    downstream."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.try_variant_get(F.col("v"), "$.k", "int")
    return v.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).cast("long").alias("sum_k"),
        F.count(F.when(k >= 50, 1)).cast("long").alias("n_high"),
    )


@query(
    "q_b128_collated_compare",
    oracle="""
    WITH m AS (
      SELECT lang, source,
             CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END
               AS mixed
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lower(mixed)) AS BIGINT)
             AS n_sources_lcase,
           CAST(COUNT(DISTINCT mixed) AS BIGINT) AS n_variants_binary,
           CAST(SUM(CASE WHEN lower(mixed) = source THEN 1 ELSE 0 END)
                AS BIGINT) AS n_lcase_eq,
           CAST(SUM(CASE WHEN mixed = source THEN 1 ELSE 0 END)
                AS BIGINT) AS n_binary_eq
    FROM m GROUP BY lang ORDER BY lang
    """,
)
def q_b128_collated_compare(spark, sf_dir):
    """B128: string COLLATIONS (Spark 4.0) — comparison/grouping under
    UTF8_LCASE vs the default UTF8_BINARY. The fixture plants case
    variation (even doc_ids get an uppercased source), then counts per
    language: distinct sources under the case-insensitive collation
    (case variants MERGE) vs binary (they split, ~2x), and equality
    hits under each. Collated equality runs inside codegen on the JVM
    — this replaces the lower()-wrapping idiom that defeats pushdown
    and bloats shuffle keys; the oracle spells the semantics with
    explicit lower() since DuckDB's default collation is binary.

    Outputs are COUNTS, not collated group keys — a collated group's
    representative value is whichever variant the engine keeps
    (nondeterministic across partition orders), so keys never leak
    into the result. Scale: ordinary two-phase aggregation."""
    d = load_table(spark, sf_dir, "documents")
    m = d.select(
        "lang",
        "source",
        F.when(F.col("doc_id") % 2 == 0, F.upper("source"))
        .otherwise(F.col("source"))
        .alias("mixed"),
    )
    lcase = F.expr("COLLATE(mixed, 'UTF8_LCASE')")
    return (
        m.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(lcase).alias("n_sources_lcase"),
            F.countDistinct("mixed").alias("n_variants_binary"),
            F.sum(
                F.when(lcase == F.col("source"), 1).otherwise(0)
            ).alias("n_lcase_eq"),
            F.sum(
                F.when(F.col("mixed") == F.col("source"), 1).otherwise(0)
            ).alias("n_binary_eq"),
        )
        .orderBy("lang")
    )


@query(
    "q_b129_url_functions",
    oracle="""
    WITH u AS (
      SELECT doc_id, lang, source,
             'https://' || source || '.example.com/' || lang || '/doc/'
               || CAST(doc_id AS VARCHAR) || '?ref=r'
               || CAST(doc_id % 7 AS VARCHAR) || '&utm=feed' AS url
      FROM documents
    )
    SELECT source || '.example.com' AS host,
           'r' || CAST(ref AS VARCHAR) AS ref,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM (SELECT source, lang, doc_id % 7 AS ref FROM u)
    GROUP BY host, ref
    ORDER BY host, ref
    """,
)
def q_b129_url_functions(spark, sf_dir):
    """B129: the URL function family — ``parse_url(url, HOST/PATH/
    QUERY/REF)`` and per-key query extraction ``parse_url(url, QUERY,
    key)`` — the provenance primitive of every web corpus (domain
    extraction for source attribution, dedup keys, robots/licensing
    joins). Fixture documents carry no URLs, so deterministic ones are
    SYNTHESIZED from (source, lang, doc_id) and parsed BACK: Spark's
    parser output is checked against independently-constructed
    expected strings in the oracle (DuckDB has no URL parser — the
    synthesis makes the comparison exact rather than vacuous).

    Scale: parse_url is a per-row JVM expression inside codegen —
    pipelines into the scan, no shuffle until the host-level census
    (keys-sized agg)."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref=r"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&utm=feed"),
    )
    parsed = d.select(
        "lang",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref"),
    )
    return (
        parsed.groupBy("host", "ref")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("host", "ref")
    )


@query(
    "q_b135_struct_surgery",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority AS priority,
           lower(o_orderstatus) AS status,
           CAST(o_orderkey % 16 AS BIGINT) AS audit_bucket,
           'priority,status,audit_bucket' AS meta_fields
    FROM orders
    ORDER BY o_orderkey
    LIMIT 100
    """,
)
def q_b135_struct_surgery(spark, sf_dir):
    """B135: nested-struct column SURGERY — ``withField`` (add a new
    field AND replace an existing one in place) and ``dropFields``,
    the Spark 3.1+ API that edits one leaf of a nested column without
    rebuilding the whole struct by hand (the pre-withField idiom —
    re-listing every field in a new struct() — silently drops fields
    added upstream and breaks on schema evolution; surgery composes,
    reconstruction doesn't). This is how event-envelope pipelines
    evolve payload schemas: stamp an audit field, normalize a leaf,
    retire a deprecated one, leaving sibling fields untouched.

    The surgered struct's FIELD LIST is pinned into the result as a
    literal derived from the actual output schema (so dropFields
    demonstrably dropped), and the leaves are projected to scalars —
    struct cells themselves are not driver-canonicalizable (the
    q_c42/q_c43 sort_values lesson).

    Scale: pure per-row codegen expressions; Catalyst prunes untouched
    struct leaves at the scan (nested schema pruning), so editing one
    field never pays for reading the others' bytes downstream."""
    o = load_table(spark, sf_dir, "orders")
    meta = F.struct(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
        (F.col("o_totalprice") * 100).cast("bigint").alias("total_cents"),
    )
    surgered = (
        meta.withField("audit_bucket", (F.col("o_orderkey") % 16))
        .withField("status", F.lower(F.col("o_orderstatus")))
        .dropFields("total_cents")
    )
    df = o.select("o_orderkey", surgered.alias("meta"))
    field_names = ",".join(
        f.name for f in df.schema["meta"].dataType.fields
    )
    return (
        df.select(
            "o_orderkey",
            F.col("meta.priority").alias("priority"),
            F.col("meta.status").alias("status"),
            F.col("meta.audit_bucket").cast("bigint").alias("audit_bucket"),
            F.lit(field_names).alias("meta_fields"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


@query(
    "q_b150_modern_string_funcs",
    oracle="""
    SELECT doc_id,
           split_part(source, 'r', 2) AS src_tail,
           CAST(len(regexp_extract_all(text, 'the')) AS BIGINT)
             AS n_the,
           CAST(levenshtein(left(text, 16), source) AS BIGINT)
             AS edit_to_source,
           left(text, 8) AS head8,
           right(source, 2) AS tail2,
           translate(lang, 'en', 'EN') AS lang_up
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
)
def q_b150_modern_string_funcs(spark, sf_dir):
    """B150: the MODERN string-function surface (Spark 3.5+ SQL
    additions) — `split_part` (field extraction without the
    split+element_at two-step and its array materialization),
    `regexp_count` (occurrence counting without extract_all's array),
    `levenshtein` (the fuzzy-match primitive under entity
    resolution), `left`/`right` (prefix/suffix without length
    arithmetic), `translate` (character mapping without regexp). B37
    covers the classic string core; these are the functions a
    migration FROM a warehouse dialect (Snowflake/BigQuery/Postgres
    all ship them) hits first, so their presence-with-identical-
    semantics is itself the compatibility claim — every one mirrored
     1:1 in the DuckDB oracle.

    Scale: all per-row codegen projections in the scan — the point
    of split_part/regexp_count over their array-building equivalents
    is precisely that nothing intermediate materializes per row.
    Levenshtein is O(len^2) per row; bounded here to a 16-char
    prefix, the entity-resolution shape (compare keys, not
    documents)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.split_part(F.col("source"), F.lit("r"), F.lit(2)).alias(
            "src_tail"
        ),
        F.regexp_count("text", F.lit("the")).cast("long").alias("n_the"),
        F.levenshtein(F.left("text", F.lit(16)), F.col("source"))
        .cast("long")
        .alias("edit_to_source"),
        F.left("text", F.lit(8)).alias("head8"),
        F.right("source", F.lit(2)).alias("tail2"),
        F.translate("lang", "en", "EN").alias("lang_up"),
    ).orderBy("doc_id")


@query(
    "q_b158_lateral_view_posexplode",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0
                  THEN list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> '')[1:5]
                  ELSE [] END AS arr
      FROM documents WHERE doc_id % 37 = 0
    )
    SELECT doc_id,
           CAST(CASE WHEN len(arr) = 0 THEN NULL ELSE i END AS BIGINT)
             AS pos,
           CASE WHEN len(arr) = 0 THEN NULL ELSE arr[i + 1] END AS tok
    FROM t, UNNEST(CASE WHEN len(arr) = 0 THEN [CAST(0 AS BIGINT)]
                        ELSE range(CAST(0 AS BIGINT),
                                   CAST(len(arr) AS BIGINT)) END) AS u(i)
    """,
)
def q_b158_lateral_view_posexplode(spark, sf_dir):
    """B158: LATERAL VIEW OUTER posexplode — the HiveQL-dialect
    generator surface that text SQL arriving from a Hive/Athena
    migration is written in (the B121/B133 gateway story again; the
    DataFrame equivalents are B41's explode and B76's explode_outer,
    but `LATERAL VIEW` is its own grammar production, not sugar the
    parser shares with them). Three contracts in one statement:
    POSEXPLODE emits the 0-based ORDINAL with each element (the
    position column an array-order-sensitive consumer needs — B41's
    explode loses it), OUTER keeps empty-array rows as (NULL, NULL)
    instead of dropping the parent row (B76's semantics, spelled in
    Hive), and the generated columns join the parent row laterally.
    Odd doc_ids carry a planted empty array so the OUTER path is
    exercised on every run; the oracle reproduces the ordinal and the
    NULL row relationally (UNNEST over an index range).

    Scale: generators run inside the projection — no shuffle, output
    rows = total array length; the 5-element slice bounds fan-out.
    Catalyst plans the same Generate node as the DataFrame form, so
    nothing is lost by arriving through the Hive dialect."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 37 == 0
    )
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.slice(toks, 1, 5))
        .otherwise(F.array().cast("array<string>"))
        .alias("arr"),
    ).createOrReplaceTempView("b158_docs")
    return spark.sql(
        """
        SELECT doc_id, CAST(pos AS LONG) AS pos, tok
        FROM b158_docs
        LATERAL VIEW OUTER posexplode(arr) AS pos, tok
        """
    )


@query(
    "q_b177_stack_inline_generators",
    oracle="""
    WITH agg AS (
      SELECT o_orderpriority,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_open,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_finished,
             CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
             CAST(MAX(o_totalprice) AS DOUBLE) AS hi
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, 'stack' AS surface, 'open' AS k,
           CAST(n_open AS DOUBLE) AS v FROM agg
    UNION ALL
    SELECT o_orderpriority, 'stack', 'finished',
           CAST(n_finished AS DOUBLE) FROM agg
    UNION ALL
    SELECT o_orderpriority, 'inline', 'min_price', lo FROM agg
    UNION ALL
    SELECT o_orderpriority, 'inline', 'max_price', hi FROM agg
    ORDER BY o_orderpriority, surface, k
    """,
)
def q_b177_stack_inline_generators(spark, sf_dir):
    """B177: the remaining SQL GENERATOR functions — ``stack(n, ...)``
    (wide row -> n rows; the generator-form unpivot, vs B151's
    UNPIVOT clause and B59's DataFrame pivot) and ``inline(array<
    struct>)`` (array-of-struct -> rows x columns in one step, where
    B158's posexplode emits the struct whole and needs a second
    projection). Each is checked against its relational desugaring —
    stack == UNION ALL of column pairs, inline == unnest of the
    struct fields — the same definition-not-keyword oracle strategy
    as B160's PIVOT (DuckDB has neither function; the semantics are
    engine-free).

    One per-priority aggregate feeds both cohorts, tagged by
    `surface`, so the hash gate certifies the two generators against
    the same 5 input rows.

    Scale: generators run inside WholeStageCodegen on the aggregate's
    5-row output — zero shuffle beyond the aggregate's own; at any
    scale stack/inline cost is output-row construction, the floor."""
    from etl_spark_eks_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH agg AS (
          SELECT o_orderpriority,
                 SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                   AS n_open,
                 SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                   AS n_finished,
                 CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
                 CAST(MAX(o_totalprice) AS DOUBLE) AS hi
          FROM orders GROUP BY o_orderpriority
        ), stacked AS (
          SELECT o_orderpriority, 'stack' AS surface, k, v
          FROM agg
          LATERAL VIEW stack(2, 'open', CAST(n_open AS DOUBLE),
                                'finished', CAST(n_finished AS DOUBLE))
            AS k, v
        ), inlined AS (
          SELECT o_orderpriority, 'inline' AS surface, k, v
          FROM agg
          LATERAL VIEW inline(array(
                 named_struct('k', 'min_price', 'v', lo),
                 named_struct('k', 'max_price', 'v', hi)))
            AS k, v
        )
        SELECT o_orderpriority, surface, k, v FROM stacked
        UNION ALL
        SELECT o_orderpriority, surface, k, v FROM inlined
        ORDER BY o_orderpriority, surface, k
        """
    )
