"""Aggregations (SURVEY §2 B17-B25).

All plans are hash aggregates with map-side partial aggregation — the
shape that scales: at 100 TB the shuffle carries only (group key,
partial state), never raw rows. Group-by keys here are low-cardinality
(returnflag/linestatus/nation), so the final agg is tiny regardless of
input size; AQE coalesces the post-shuffle partitions.

Float discipline: large-magnitude double SUMs accumulate in
DECIMAL(38,6) and cast back to double (exact + associative, so Spark's
partial-sum order and DuckDB's sequential order agree bit-for-bit; see
functions/exact.py). AVGs stay ROUND(AVG, 6) — small magnitude, and
decimal AVG types diverge across engines. Per-row arithmetic is
IEEE-deterministic and stays unrounded.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark_eks_spark.catalog import load_table, register_views
from etl_spark_eks_spark.functions.exact import dsum
from etl_spark_eks_spark.registry import query

Q1_CUTOFF = "1998-09-02 00:00:00"


@query(
    "q_b17_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)           AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)      AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE)                      AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                         AS DECIMAL(38,6))) AS DOUBLE)                      AS sum_charge,
           ROUND(AVG(l_quantity), 6)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 6)                                   AS avg_price,
           ROUND(AVG(l_discount), 6)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_b17_pricing_summary(spark, sf_dir):
    """B17 (flagship): TPC-H-Q1-shaped pricing summary —
    scan -> pushed filter -> project -> partial+final hash agg -> sort.

    Same macro-shape as the reference's job (scan -> transform ->
    aggregate -> sink, pyspark-taxi-trip.py:37-51) but expressed as one
    single-action declarative plan so Catalyst pushes the l_shipdate
    predicate into the parquet scan and prunes to 7 columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_b18_count_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_supps
    FROM lineitem
    """,
)
def q_b18_count_distinct(spark, sf_dir):
    """B18: exact global distinct count (expand + two-phase agg in Spark)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
    )


@query(
    "q_b19_approx_cd",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey)  AS exact_parts,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS parts_within_bound,
           TRUE AS orders_within_bound
    FROM lineitem
    """,
)
def q_b19_approx_cd(spark, sf_dir):
    """B19: HyperLogLog++ approximate count-distinct — the 100 TB path
    (single pass, fixed memory, mergeable sketch, no expand).

    The raw HLL estimate is engine-specific, so it cannot be hashed
    against DuckDB directly. Instead the query EMITS ITS OWN VERDICT as
    data: it computes both the approximate and the exact count and
    returns (exact, |approx-exact|/exact <= 5% boolean). The oracle is
    the exact count plus literal TRUE — the hash gate then verifies
    both the exact value and that the sketch met its error contract.
    (The exact countDistinct is affordable here because it is only the
    verification harness; the operator under demonstration remains
    approx_count_distinct.)"""
    li = load_table(spark, sf_dir, "lineitem")
    within = lambda approx, exact: (  # noqa: E731
        F.abs(F.col(approx) - F.col(exact)) <= 0.05 * F.col(exact)
    )
    # The two halves run as SEPARATE aggregates joined on their 1-row
    # results: putting countDistinct (Expand-planned) and the HLL
    # sketches into one agg makes Spark evaluate the sketches over the
    # expanded (3x) row stream — measured 6.0 s vs 1.5 s for the two
    # independent passes at sf0.1.
    approx = li.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
    )
    exact = li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    return approx.crossJoin(exact).select(
        "exact_parts",
        "exact_orders",
        within("approx_parts", "exact_parts").alias("parts_within_bound"),
        within("approx_orders", "exact_orders").alias("orders_within_bound"),
    )


@query(
    "q_b20_having",
    oracle="""
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_spend,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 8
    ORDER BY o_custkey
    """,
)
def q_b20_having(spark, sf_dir):
    """B20: post-aggregation filter (HAVING) — filter applies to agg output,
    so it cannot be pushed below the agg; Catalyst keeps it above."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            dsum("o_totalprice").alias("total_spend"),
            F.count("*").alias("n_orders"),
        )
        .filter(F.col("n_orders") >= 8)
        .orderBy("o_custkey")
    )


@query(
    "q_b21_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_b21_rollup(spark, sf_dir):
    """B21: hierarchical subtotals — Spark Expand + single hash agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        F.count("*").alias("cnt"),
    )


@query(
    "q_b22_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_b22_cube(spark, sf_dir):
    """B22: all grouping combinations (2^k expand)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_extendedprice").alias("sum_price"),
        F.count("*").alias("cnt"),
    )


@query(
    "q_b23_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_b23_grouping_sets(spark, sf_dir):
    """B23: explicit grouping sets via SQL (the DataFrame API has no
    grouping-sets builder; spark.sql is the idiomatic route)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_b24_drop_duplicates",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber
    FROM lineitem
    """,
)
def q_b24_drop_duplicates(spark, sf_dir):
    """B24: distinct rows over a projected key set.

    Implemented as project -> dropDuplicates so partial dedup happens
    map-side before the shuffle (same plan as groupBy keys). Projecting
    first is the scale-correct order: dedup on full rows would shuffle
    every column.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus", "l_linenumber").dropDuplicates()


@query(
    "q_b25_revenue_by_nation",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q_b25_revenue_by_nation(spark, sf_dir):
    """B25: fact-dim rollup (TPC-H Q5 shape) — lineitem ⋈ orders ⋈
    customer ⋈ nation, revenue per nation.

    Scale design: nation (25 rows) and customer (dim) are broadcast; the
    only big shuffle is lineitem ⋈ orders on orderkey. AQE picks
    broadcast automatically below the threshold; the explicit hint makes
    it deterministic for the tiny dims.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            dsum(revenue).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q_b58_percentiles",
    oracle="""
    SELECT lang,
           ROUND(quantile_cont(n_chars, 0.25), 6) AS p25,
           ROUND(quantile_cont(n_chars, 0.50), 6) AS p50,
           ROUND(quantile_cont(n_chars, 0.90), 6) AS p90
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def q_b58_percentiles(spark, sf_dir):
    """B58 (extension): EXACT linear-interpolated percentiles per group
    — the distribution profile a curation pass reads before choosing
    length cutoffs. Spark's `percentile` and DuckDB's `quantile_cont`
    share the same interpolation contract, so this is value-exact
    (unlike `approx_percentile`, which q_b19-style rows-only checks
    would need). Scale note: exact percentile buffers each group's
    values on the reducer — right up to millions of rows per group;
    beyond that switch to `approx_percentile` (t-digest, mergeable
    map-side) and accept the documented error bound.
    """
    d = load_table(spark, sf_dir, "documents")
    p = F.expr("percentile(n_chars, array(0.25, 0.50, 0.90))")
    return (
        d.groupBy("lang")
        .agg(p.alias("ps"))
        .select(
            "lang",
            F.round(F.element_at("ps", 1), 6).alias("p25"),
            F.round(F.element_at("ps", 2), 6).alias("p50"),
            F.round(F.element_at("ps", 3), 6).alias("p90"),
        )
        .orderBy("lang")
    )


@query(
    "q_b59_pivot",
    oracle="""
    SELECT source,
           COUNT(*) FILTER (WHERE lang = 'de') AS de,
           COUNT(*) FILTER (WHERE lang = 'en') AS en,
           COUNT(*) FILTER (WHERE lang = 'es') AS es,
           COUNT(*) FILTER (WHERE lang = 'fr') AS fr,
           COUNT(*) FILTER (WHERE lang = 'zh') AS zh
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def q_b59_pivot(spark, sf_dir):
    """B59 (extension): PIVOT — long-to-wide reshape (documents per
    source x language). The pivot VALUES are declared literally, which
    is the scale-correct form: with explicit values Spark runs ONE
    groupBy pass with conditional aggregates (map-side combined);
    leaving them implicit costs an extra distinct-values job over the
    full input first.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .pivot("lang", ["de", "en", "es", "fr", "zh"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("source")
    )


@query(
    "q_b78_observed_metrics",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           ROUND(SUM(l_quantity), 6) AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def q_b78_observed_metrics(spark, sf_dir):
    """B78: observed metrics — ``df.observe`` attaches named aggregate
    counters to the PRE-filter scan, so the pipeline reports what the
    filter discarded without a second pass over the data. This is the
    production data-quality pattern (row counts / null rates / domain
    sums at each stage, shipped to metrics) that a naive
    ``df.count()`` audit doubles the scan cost for. The query's
    RESULT is the post-filter aggregate (the oracle); the observation
    values are asserted against an independent computation in
    tests/test_plans.py.

    Scale: observations piggyback on the action's existing tasks as
    accumulator-style partial aggregates — zero extra scan, zero
    shuffle; cost is a few doubles per task heartbeat."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation()
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_scanned"),
        F.round(F.sum("l_quantity"), 6).alias("qty_scanned"),
    )
    return (
        observed.filter(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        )
    )


@query(
    "q_b81_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           l_quantity AS value
    FROM lineitem WHERE l_linenumber = 1
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem WHERE l_linenumber = 1
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_linenumber = 1
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
    FROM lineitem WHERE l_linenumber = 1
    """,
)
def q_b81_unpivot(spark, sf_dir):
    """B81: UNPIVOT / melt — wide-to-long reshape, the inverse of B59's
    PIVOT. ``DataFrame.unpivot`` plans a single Expand over the scan
    (each input row emitted once per value column), so the reshape is
    per-row and shuffle-free — the n-fold row growth streams straight
    into whatever consumes it, never materializing wide+long together.

    Scale: Expand is map-side; at 100 TB the cost is exactly the
    row-multiplication the semantics demand, with column pruning still
    reaching the scan (only the 2 id + 4 measure columns are read)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )


@query(
    "q_b88_robust_stats",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           ROUND(quantile_cont(l_quantity, 0.25), 6) AS q1_qty,
           ROUND(quantile_cont(l_quantity, 0.75), 6) AS q3_qty,
           ROUND(quantile_cont(l_quantity, 0.75)
                 - quantile_cont(l_quantity, 0.25), 6) AS iqr_qty,
           ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price,
           ROUND(stddev_pop(l_quantity), 6) AS sd_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_b88_robust_stats(spark, sf_dir):
    """B88: exact robust distribution aggregates — median, quartiles,
    IQR, p95, population stddev per group. The outlier-insensitive
    stats layer (SLA latencies, price distributions, data-quality
    bounds) that AVG/STDDEV alone misrepresent; `percentile` here is
    the EXACT interpolated (percentile_cont) aggregate, the precision
    contract C31's `percentile_approx` trades away.

    Scale: exact percentiles are the one classic agg that does NOT
    map-side-combine — the aggregate buffer holds the group's values
    (OK here: 3 groups of bounded-at-fixture size; the shuffle still
    carries only (key, value) pairs). At 100 TB this query's honest
    cost is a sort per group; the engine's scale ladder is explicit:
    exact `percentile` when groups fit a reducer, `percentile_approx`
    (C31, mergeable GK sketch) beyond — same query shape, one function
    swap, documented error bound. stddev_pop DOES combine (sum/sumsq
    partials) and rides the same shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.25)), 6).alias("q1_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.75)), 6).alias("q3_qty"),
        F.round(
            F.percentile("l_quantity", F.lit(0.75))
            - F.percentile("l_quantity", F.lit(0.25)),
            6,
        ).alias("iqr_qty"),
        F.round(
            F.percentile("l_extendedprice", F.lit(0.95)), 6
        ).alias("p95_price"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("sd_qty"),
    )


_B95_PIPE_SQL = """
FROM lineitem
|> WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
|> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
|> AGGREGATE COUNT(*) AS count_order,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
               AS sum_qty,
             CAST(SUM(CAST(disc_price AS DECIMAL(38,6))) AS DOUBLE)
               AS sum_disc_price
   GROUP BY l_returnflag, l_linestatus
"""


@query(
    "q_b95_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS count_order,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_qty,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_b95_pipe_syntax(spark, sf_dir):
    """B95: SQL pipe syntax (Spark 4's `|>` operator chain) — the
    flagship pricing-summary shape written as a linear dataflow:
    FROM |> WHERE |> EXTEND |> AGGREGATE. Pipe SQL is surface, not
    semantics: Catalyst lowers it to exactly the plan the nested
    SELECT produces (same pushdown, same partial aggregation), which
    is what the oracle equivalence demonstrates. It matters for the
    migration story — users coming from dataframe-style thinking (or
    GoogleSQL pipes) write top-to-bottom transformations without
    subquery nesting, and each |> stage is independently testable by
    truncating the chain.

    Column discipline matches B17: DECIMAL(38,6) accumulation for the
    large-magnitude sums (functions/exact.py)."""
    register_views(spark, sf_dir)
    return spark.sql(_B95_PIPE_SQL)


@query(
    "q_b102_stat_aggregates",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           ROUND(covar_pop(l_quantity, l_discount), 6) AS qty_disc_covar,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS price_per_qty,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4)
             AS price_intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS fit_r2
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_b102_stat_aggregates(spark, sf_dir):
    """B102: bivariate statistical aggregates — Pearson correlation,
    population covariance, and the regr_* least-squares family
    (slope/intercept/R²) per group. The exploratory-stats surface a
    warehouse user expects (is price linear in quantity? does
    discount track volume?) computed as single-pass aggregates: all
    of these fold to the same five running moments (n, Σx, Σy, Σxy,
    Σx²), so the plan is one map-side-combined shuffle identical in
    shape to SUM/AVG — no second pass, no window, and the moments
    merge associatively across partitions.

    Float discipline: the normalized outputs (corr, slope, R²) are
    ratios of large co-moments — ROUND 6; the intercept subtracts two
    large products and carries more cancellation noise — ROUND 4
    (measured: 6dp flips its last digit across partition orders).

    Scale: per-group state is five doubles regardless of rows; this
    is the aggregate family where Spark's partial/final split is doing
    real numerical work (co-moment merging), not just summing."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias(
            "qty_disc_covar"
        ),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias(
            "price_per_qty"
        ),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
            "price_intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias(
            "fit_r2"
        ),
    )


_B103_SPARK_SQL = """
WITH ranked AS (
  SELECT c_nationkey, c_name, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_name) AS rk
  FROM customer
)
SELECT c_nationkey,
       COUNT(*) AS n_top,
       listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name) AS top_names
FROM ranked WHERE rk <= 5
GROUP BY c_nationkey
"""


@query(
    "q_b103_listagg",
    oracle="""
    WITH ranked AS (
      SELECT c_nationkey, c_name, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_name) AS rk
      FROM customer
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_top,
           string_agg(c_name, ',' ORDER BY c_name) AS top_names
    FROM ranked WHERE rk <= 5
    GROUP BY c_nationkey
    """,
)
def q_b103_listagg(spark, sf_dir):
    """B103: ordered string aggregation — `listagg(...) WITHIN GROUP
    (ORDER BY ...)` (SQL:2016, Spark 4.0+) over the top-5
    highest-balance customers per nation. The report/export surface
    (denormalized CSV cells, alert digests) done declaratively, with
    the two determinism traps both pinned: the rank window
    tie-breaks on name (acctbal ties are real), and the aggregation
    order is explicit — an unordered listagg/collect_list is
    partition-order-dependent and would flip the value hash between
    runs, let alone engines.

    Scale: the rank filter bounds every aggregation buffer at 5
    names BEFORE the groupBy (the C42 hot-key lesson — an unranked
    listagg over a skewed group would materialize the whole group in
    one buffer); window and final agg share the c_nationkey
    partitioning, so the plan is one exchange plus a sort. Emitted
    as the delimited STRING an export actually stores — scalar,
    driver-hashable, same contract as C42's postings_csv."""
    register_views(spark, sf_dir)
    return spark.sql(_B103_SPARK_SQL)


@query(
    "q_b106_bitmap_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def q_b106_bitmap_distinct(spark, sf_dir):
    """B106: EXACT distinct counting via bitmap aggregates
    (bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg /
    bitmap_or_agg / bitmap_count, Spark 3.5+) — the third rung of the
    count-distinct ladder: B18 is the naive exact form (shuffles every
    distinct value), B19 is approximate HLL (mergeable, 2% error), this
    is exact AND mergeable: each 32k-id bucket folds into a 4KB bitmap
    map-side, the shuffle carries (group, bucket, bitmap) instead of
    raw ids, and bucket bitmaps OR together associatively. The oracle
    is the plain COUNT(DISTINCT) it must equal exactly.

    Scale: this is how warehouses do exact distinct users at 100 TB —
    shuffle volume is bounded by (groups x id-range/32768) bitmaps, not
    by row count, and the partial aggregate is a bitwise OR (no sort,
    no hash set). The two-level fold below IS the incremental-rollup
    shape: persisted per-bucket bitmaps can absorb new days of data by
    re-ORing only touched buckets."""
    ev = load_table(spark, sf_dir, "events")
    per_bucket = (
        ev.select(
            "event_type",
            F.bitmap_bucket_number(F.col("user_id")).alias("bkt"),
            F.col("user_id").alias("uid"),
        )
        .groupBy("event_type", "bkt")
        .agg(
            F.bitmap_construct_agg(F.bitmap_bit_position(F.col("uid"))).alias(
                "bm"
            ),
            F.count("*").alias("n"),
        )
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).cast("long").alias("n_users"),
        F.sum("n").cast("long").alias("n_events"),
    )


@query(
    "q_b107_boolean_aggregates",
    oracle="""
    SELECT event_type,
           bool_and(value > 0)  AS all_positive,
           bool_or(value > 400) AS any_large,
           CAST(count_if(value > 250) AS BIGINT) AS n_over_250,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def q_b107_boolean_aggregates(spark, sf_dir):
    """B107: boolean/conditional aggregate family — bool_and / bool_or
    / count_if per group (the data-quality assertion surface: 'every
    reading positive', 'any outlier present', 'how many breached the
    threshold'). Declarative, null-skipping, and — unlike the
    CASE-WHEN-SUM idioms they replace — self-documenting in the plan.

    Scale: all three fold to single-byte/8-byte partial states with
    associative merges, so the shuffle carries (group, bool, bool,
    long) regardless of input size — the cheapest aggregate family
    there is; same one-exchange shape as B17."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bool_and(F.col("value") > 0).alias("all_positive"),
        F.bool_or(F.col("value") > 400).alias("any_large"),
        F.count_if(F.col("value") > 250).alias("n_over_250"),
        F.count("*").alias("n_events"),
    )


@query(
    "q_b108_transpose",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
             CAST(COUNT(*) AS DOUBLE) AS n_items,
             ROUND(AVG(l_discount), 6) AS avg_disc
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT 'sum_qty' AS metric,
           MAX(CASE WHEN l_returnflag = 'A' THEN sum_qty END) AS "A",
           MAX(CASE WHEN l_returnflag = 'N' THEN sum_qty END) AS "N",
           MAX(CASE WHEN l_returnflag = 'R' THEN sum_qty END) AS "R"
    FROM m
    UNION ALL
    SELECT 'n_items',
           MAX(CASE WHEN l_returnflag = 'A' THEN n_items END),
           MAX(CASE WHEN l_returnflag = 'N' THEN n_items END),
           MAX(CASE WHEN l_returnflag = 'R' THEN n_items END)
    FROM m
    UNION ALL
    SELECT 'avg_disc',
           MAX(CASE WHEN l_returnflag = 'A' THEN avg_disc END),
           MAX(CASE WHEN l_returnflag = 'N' THEN avg_disc END),
           MAX(CASE WHEN l_returnflag = 'R' THEN avg_disc END)
    FROM m
    """,
)
def q_b108_transpose(spark, sf_dir):
    """B108: DataFrame transpose (Spark 4.0's `df.transpose`) — flip a
    small aggregate table so metrics become rows and groups become
    columns, the report/dashboard orientation (B59's pivot rotates
    values into columns; transpose rotates the WHOLE frame). The melt
    side of the pair is B81's unpivot.

    Scale: transpose collects the frame's first column to the driver
    to mint the output schema — by contract a driver-sized operation,
    correct ONLY downstream of an aggregate (here: 3 groups x 4
    metrics). The 100 TB discipline is aggregate-then-transpose,
    never transpose-the-corpus; the input here is the already-reduced
    B17-style summary, which is exactly that shape."""
    li = load_table(spark, sf_dir, "lineitem")
    summary = (
        li.groupBy("l_returnflag")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            F.count("*").cast("double").alias("n_items"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        )
        .orderBy("l_returnflag")
    )
    # transpose: first column's values become column names; remaining
    # rows keyed by the former column names
    t = summary.transpose()
    first = t.columns[0]
    return t.withColumnRenamed(first, "metric")


@query(
    "q_b115_mode_median",
    oracle="""
    WITH ranked AS (
        SELECT l_returnflag, l_quantity,
               COUNT(*) AS cnt,
               ROW_NUMBER() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY COUNT(*) DESC, l_quantity ASC
               ) AS rn
        FROM lineitem GROUP BY l_returnflag, l_quantity
    ),
    best AS (
        SELECT l_returnflag, l_orderkey,
               ROW_NUMBER() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice DESC, l_orderkey DESC
               ) AS rn
        FROM lineitem
    )
    SELECT m.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(MEDIAN(m.l_quantity::DOUBLE), 6) AS median_qty,
           MAX(r.l_quantity) AS mode_qty,
           MAX(b.l_orderkey) AS top_revenue_order
    FROM lineitem m
    JOIN ranked r ON r.l_returnflag = m.l_returnflag AND r.rn = 1
    JOIN best   b ON b.l_returnflag = m.l_returnflag AND b.rn = 1
    GROUP BY m.l_returnflag
    ORDER BY m.l_returnflag
    """,
)
def q_b115_mode_median(spark, sf_dir):
    """B115: order-statistic / argmax aggregate family — exact
    ``median`` (interpolated, the percentile_cont(0.5) shorthand),
    ``mode`` with ``deterministic=True`` (ties resolve to the LOWEST
    value — without it the answer is partition-order-dependent and the
    value hash would flip run to run), and ``max_by`` (argmax: WHICH
    order carried the group's highest revenue — the lookup that
    otherwise costs a join back). The max_by ordering key is
    ``struct(l_extendedprice, l_orderkey)`` — struct comparison is
    lexicographic, so equal prices break ties on the key and the
    argmax is total-ordered; a bare double ordering key would be
    nondeterministic under price ties, same class of bug as an
    unordered listagg (B103).

    The oracle spells both tie-broken aggregates as count/row_number
    rewrites — the semantics, independently derived, rather than
    trusting DuckDB's mode/arg_max tie behavior to coincide.

    Scale: median and mode are the two non-trivially-mergeable members
    — Spark plans them as sort-based aggregates carrying the group's
    values; fine while a group fits a reducer (3 groups here), and the
    documented ladder beyond that is B88's percentile_approx for
    median and a count-groupBy + max_by two-pass for mode (both
    mergeable, both one shuffle). max_by itself is a 16-byte
    associative state — scales like MAX."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.median("l_quantity"), 6).alias("median_qty"),
            F.mode("l_quantity", True).alias("mode_qty"),
            F.max_by(
                "l_orderkey", F.struct("l_extendedprice", "l_orderkey")
            ).alias("top_revenue_order"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_b123_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
    """,
)
def q_b123_group_by_all(spark, sf_dir):
    """B123: GROUP BY ALL / ORDER BY ALL resolution (Spark 3.4+/4.x,
    same syntax DuckDB pioneered) — the grouping keys are inferred
    from the non-aggregate select items, the ordering from the whole
    select list. Pure analyzer surface: the resolved plan is identical
    to the explicit GROUP BY 1,2, so partial aggregation and the
    one-shuffle shape are unchanged; the operator exists so a user's
    modern-SQL scripts run verbatim on both engines.

    Scale: identical to B17's pricing-summary shape — map-side
    combine into a keys-sized result."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_items,
               SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
        FROM lineitem
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@query(
    "q_b124_crosstab",
    oracle="""
    SELECT CAST(l_returnflag AS VARCHAR) AS l_returnflag_l_linestatus,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS F,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END)
                AS BIGINT) AS O
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag_l_linestatus
    """,
)
def q_b124_crosstab(spark, sf_dir):
    """B124: contingency table via ``df.stat.crosstab`` — the
    two-variable frequency matrix (returnflag x linestatus). The
    column set is data-dependent (one per distinct linestatus), so the
    result is projected through an explicit, sorted column list to pin
    the schema; the oracle spells the same table as the CASE-pivot it
    desugars to.

    Scale: crosstab plans as a single groupBy over the pair column
    with a driver-side pivot of the DISTINCT VALUE GRID — fine while
    the distinct combinations are report-sized (the documented
    contract; it errors beyond 1e4 distinct pairs), and the ladder
    beyond that is B59's pivot with explicit values or a plain
    two-key groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    ct = li.stat.crosstab("l_returnflag", "l_linestatus")
    value_cols = sorted(c for c in ct.columns if c != "l_returnflag_l_linestatus")
    return ct.select(
        "l_returnflag_l_linestatus",
        *[F.col(f"`{c}`").alias(c) for c in value_cols],
    ).orderBy("l_returnflag_l_linestatus")


@query(
    "q_b125_hll_sketch",
    oracle="""
    WITH exact AS (
      SELECT l_returnflag,
             CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, exact_orders, TRUE AS est_within_5pct
    FROM exact ORDER BY l_returnflag
    """,
)
def q_b125_hll_sketch(spark, sf_dir):
    """B125: Apache DataSketches HLL aggregates (Spark 3.5+) —
    ``hll_sketch_agg`` builds a per-group sketch, ``hll_union_agg``
    MERGES sketches across groups, ``hll_sketch_estimate`` reads the
    estimate out. The mergeability is the 100 TB point: per-partition
    (or per-day) sketches union associatively, so a year of daily
    distinct-user sketches rolls up without ever re-touching raw data
    — B19's approx_count_distinct gives one number, a stored sketch
    gives every future rollup for free.

    DuckDB has no compatible sketch, so the oracle checks the
    DETERMINISTIC contract instead: exact per-group distincts (both
    engines) plus the assertion that the sketch estimate lands within
    5% of exact — HLL with default lgK=12 is far tighter than that at
    these cardinalities, and the sketch hash of a fixed input is
    deterministic, so the flag is stable, not flaky."""
    li = load_table(spark, sf_dir, "lineitem")
    per_group = li.groupBy("l_returnflag").agg(
        F.expr("hll_sketch_agg(l_orderkey)").alias("sk"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    return (
        per_group.select(
            "l_returnflag",
            "exact_orders",
            (
                F.abs(
                    F.expr("hll_sketch_estimate(sk)")
                    - F.col("exact_orders")
                )
                / F.col("exact_orders")
                < 0.05
            ).alias("est_within_5pct"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_b139_exchange_reuse",
    oracle="""
    WITH agg AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
      FROM orders GROUP BY o_custkey
    ), top AS (
      SELECT o_custkey, rev, 'top' AS bucket
      FROM agg ORDER BY rev DESC, o_custkey LIMIT 5
    ), bot AS (
      SELECT o_custkey, rev, 'bottom' AS bucket
      FROM agg ORDER BY rev ASC, o_custkey LIMIT 5
    )
    SELECT o_custkey,
           ROUND(CAST(rev AS DOUBLE), 4) AS rev,
           bucket
    FROM (SELECT * FROM top UNION ALL SELECT * FROM bot)
    ORDER BY bucket, o_custkey
    """,
)
def q_b139_exchange_reuse(spark, sf_dir):
    """B139: Catalyst exchange reuse — one aggregate subplan consumed
    by two branches (top-5 and bottom-5 customers by revenue) costs
    ONE scan and ONE shuffle, not two: the physical ReuseExchange
    rule replaces the second branch's identical Exchange with a
    ReusedExchange node (pinned in tests/test_plans.py). This is the
    declarative payoff the reference's imperative job can't get — a
    hand-scheduled pipeline re-reads the input per report branch,
    while expressing both branches over the same DataFrame lets the
    optimizer share the heavy work automatically.

    At 100 TB the reuse is the difference between one pass over the
    fact table and N passes for an N-branch extremes/percentile
    report; each branch's tail is a TakeOrderedAndProject (k-sized,
    no extra shuffle). Exact money math: DECIMAL(38,6) sums, rounded
    once at the edge."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev")
    )
    top = (
        agg.orderBy(F.col("rev").desc(), "o_custkey")
        .limit(5)
        .withColumn("bucket", F.lit("top"))
    )
    bot = (
        agg.orderBy(F.col("rev").asc(), "o_custkey")
        .limit(5)
        .withColumn("bucket", F.lit("bottom"))
    )
    return (
        top.unionByName(bot)
        .select(
            "o_custkey",
            F.round(F.col("rev").cast("double"), 4).alias("rev"),
            "bucket",
        )
        .orderBy("bucket", "o_custkey")
    )


@query(
    "q_b141_approx_percentile_bound",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS exact_p50,
           ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS exact_p95,
           TRUE AS p50_within_bound,
           TRUE AS p95_within_bound
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_b141_approx_percentile_bound(spark, sf_dir):
    """B141: approximate percentiles with a SELF-VERIFYING error
    bound — the quantile member of the sketch family (B19 = distinct
    count, B125 = mergeable HLL binaries, C47 = sketch partials).
    `percentile_approx` (Greenwald-Khanna) guarantees rank error
    <= 1/accuracy; the query turns that guarantee into a checked
    boolean: the approximate value must land between the EXACT
    percentiles at q +/- eps (eps = 5x the rank bound — monotonicity
    of the quantile function converts a rank bound into a value
    interval). The oracle pins the exact arms and TRUE flags, the
    B19 contract: the sketch's value is implementation-specific, its
    CORRECTNESS CLAIM is not.

    Why it matters at 100 TB: exact `percentile` (B88) buffers each
    group's values on a reducer — fine while groups fit, impossible
    at corpus scale. The GK sketch is constant-memory and MERGEABLE
    (map-side partials combine), so this is the documented scale
    ladder's upper rung, here sharing one aggregation pass with the
    exact arms that audit it. In production only the approx arm
    survives; the exact arms are the verification harness."""
    acc = 1000
    eps = 5.0 / acc
    li = load_table(spark, sf_dir, "lineitem")
    # ONE array-percentile per family: six exact arms as separate
    # aggregates each re-buffer and re-select the group (measured
    # 6.3 s -> collapsing to one array call shares a single pass),
    # and the two approx arms share one GK sketch the same way.
    qs = [0.5 - eps, 0.5, 0.5 + eps, 0.95 - eps, 0.95, 0.95 + eps]
    g = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.percentile(
            "l_extendedprice", F.array(*[F.lit(q) for q in qs])
        ).alias("ex"),
        F.percentile_approx(
            "l_extendedprice",
            F.array(F.lit(0.5), F.lit(0.95)),
            F.lit(acc),
        ).alias("ap"),
    )
    ex = lambda i: F.element_at("ex", i)  # noqa: E731
    ap = lambda i: F.element_at("ap", i)  # noqa: E731
    return g.select(
        "l_returnflag",
        "n",
        F.round(ex(2), 6).alias("exact_p50"),
        F.round(ex(5), 6).alias("exact_p95"),
        ap(1).between(ex(1), ex(3)).alias("p50_within_bound"),
        ap(2).between(ex(4), ex(6)).alias("p95_within_bound"),
    ).orderBy("l_returnflag")


@query(
    "q_b142_content_digest",
    oracle="""
    SELECT COALESCE(source, '__ALL__') AS source,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(('0x' || substr(md5(
                  CAST(doc_id AS VARCHAR) || chr(31) || lang || chr(31)
                  || source || chr(31) || CAST(n_chars AS VARCHAR)
                  || chr(31) || text), 1, 12))::BIGINT
                AS DECIMAL(38,0))) AS VARCHAR) AS digest
    FROM documents
    GROUP BY ROLLUP(source)
    ORDER BY source
    """,
)
def q_b142_content_digest(spark, sf_dir):
    """B142: order-independent table CONTENT DIGEST — one scan, one
    k-row rollup, no sort, no collect: per-slice and whole-table
    fingerprints as the SUM of a per-row md5-prefix integer over a
    canonical field concatenation. SUM is commutative/associative, so
    the digest is invariant to row order, partitioning, and plan
    choice — the property a replication audit needs (verify a 100 TB
    copy against its source by comparing k+1 numbers computed
    independently on each side, partial sums merging map-side; file
    checksums can't do this because parquet bytes differ across
    writers/compression even when CONTENT is identical). M7 audits
    per-PAYLOAD checksums; this fingerprints the relational content
    itself. The md5 prefix is the repo's engine-portable hash (the
    hash_bucket convention), 12 hex chars = 48 bits per row summed
    into DECIMAL(38,0) — no overflow until ~1e23 rows; emitted as a
    string so the exact integer survives every serialization edge.

    The canonical form (field sep 0x1F, string casts) is part of the
    digest's definition — both engines build the identical byte
    string, which is what makes the fingerprint portable across
    engines, not just across copies."""
    sep = F.lit("\x1f")
    d = load_table(spark, sf_dir, "documents")
    row = F.concat(
        F.col("doc_id").cast("string"), sep, F.col("lang"), sep,
        F.col("source"), sep, F.col("n_chars").cast("string"), sep,
        F.col("text"),
    )
    h = (
        F.conv(F.substring(F.md5(row), 1, 12), 16, 10)
        .cast("bigint")
        .cast("decimal(38,0)")
    )
    return (
        d.rollup("source")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(h).cast("string").alias("digest"),
        )
        .select(
            F.coalesce("source", F.lit("__ALL__")).alias("source"),
            "n_rows",
            "digest",
        )
        .orderBy("source")
    )


@query(
    "q_b151_sql_unpivot_clause",
    oracle="""
    WITH src AS (SELECT * FROM lineitem WHERE l_orderkey < 100)
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           l_quantity AS val FROM src
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM src
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM src
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM src
    ORDER BY l_orderkey, l_linenumber, measure
    """,
)
def q_b151_sql_unpivot_clause(spark, sf_dir):
    """B151: the SQL `UNPIVOT` clause — B81 covers the DataFrame
    `unpivot`/melt API; this is the ANSI-SQL surface a warehouse
    migration writes (Snowflake/BigQuery/Oracle dialect), planning
    through the same Expand node. The distinction matters for the
    gateway story (B133/B134/B121): SQL arriving as TEXT must parse,
    not just have a DataFrame equivalent. The oracle deliberately
    uses the UNION ALL desugaring — proving the clause EQUALS its
    relational definition rather than comparing two engines'
    implementations of the same keyword.

    Scale: Expand is map-side row multiplication (B81's note) —
    exactly the 4x the semantics demand, column pruning intact."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "b151_lineitem"
    )
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, measure, val
        FROM (SELECT l_orderkey, l_linenumber, l_quantity,
                     l_extendedprice, l_discount, l_tax
              FROM b151_lineitem WHERE l_orderkey < 100)
        UNPIVOT (val FOR measure IN (l_quantity, l_extendedprice,
                                     l_discount, l_tax))
        ORDER BY l_orderkey, l_linenumber, measure
        """
    )


@query(
    "q_b159_filter_clause_aggregates",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)
             AS n_discounted,
           CAST(SUM(CAST(l_quantity AS BIGINT))
                FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS open_qty,
           CAST(COUNT(DISTINCT l_suppkey)
                FILTER (WHERE l_tax = 0) AS BIGINT) AS notax_suppliers
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_b159_filter_clause_aggregates(spark, sf_dir):
    """B159: ANSI `FILTER (WHERE ...)` aggregate clause — per-aggregate
    predicates in one grouping pass, the text-SQL surface of the
    conditional-aggregation idiom the C-tier audit layer leans on
    (C103/C105 via CASE WHEN). FILTER is the standard's spelling and
    what migrating Postgres/DuckDB SQL arrives written in; it also
    composes where CASE cannot: `COUNT(DISTINCT x) FILTER (...)`
    counts distinct values AMONG matching rows, while
    COUNT(DISTINCT CASE WHEN ... THEN x END) must thread a NULL
    through the distinct set to fake it. The oracle runs the LITERAL
    same text (B150/B155's presence-with-identical-semantics
    discipline).

    Plan payload: all four aggregates — two filtered, one filtered
    DISTINCT — evaluate in the ONE hash-aggregate pass over the scan
    (the distinct adds the standard Expand, exactly as unfiltered
    B18); four separate filtered scans is what the clause saves.

    Scale: map-side partial aggregation applies the predicates before
    any shuffle; bytes exchanged are |groups| x |aggregates|,
    independent of the filters' selectivity."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_items,
               COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
               SUM(CAST(l_quantity AS LONG))
                 FILTER (WHERE l_linestatus = 'O') AS open_qty,
               COUNT(DISTINCT l_suppkey) FILTER (WHERE l_tax = 0)
                 AS notax_suppliers
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "q_b160_sql_pivot_clause",
    oracle="""
    SELECT o_orderpriority,
           ROUND(COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'O'
                 THEN CAST(o_totalprice AS DECIMAL(38,6)) END)
                 AS DOUBLE), 0), 2) AS open_total,
           ROUND(COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'F'
                 THEN CAST(o_totalprice AS DECIMAL(38,6)) END)
                 AS DOUBLE), 0), 2) AS finished_total,
           ROUND(COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'P'
                 THEN CAST(o_totalprice AS DECIMAL(38,6)) END)
                 AS DOUBLE), 0), 2) AS pending_total
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_b160_sql_pivot_clause(spark, sf_dir):
    """B160: the SQL `PIVOT` clause — B151's mirror (that one proved
    UNPIVOT == its UNION ALL desugaring; this proves PIVOT == its
    conditional-aggregate desugaring) and the text surface of B59's
    DataFrame pivot. The oracle is DELIBERATELY the desugared form —
    SUM(CASE WHEN status = v THEN x END) per pivot value — so the
    clause is checked against its relational definition, not against
    another engine's PIVOT keyword (DuckDB's PIVOT grammar differs;
    the semantics cannot).

    The IN list is EXPLICIT ('O','F','P' aliased) — the schema is
    static at plan time, which is what makes text-SQL PIVOT safe in a
    pipeline; B59 documents the dynamic-values variant (an extra
    distinct-scan) as the exploratory form. COALESCE(...,0) pins the
    absent-cell convention on both engines.

    Scale: one hash aggregate over the scan, |priorities| x 3 cells —
    PIVOT is GROUP BY in a trench coat; no shuffle beyond the one the
    aggregate pays.

    Float discipline (r7 ADVICE): the pivot cells are large-magnitude
    SUMs of doubles, order-dependent in the last ulp — a total within
    ~1 ulp of a half-cent boundary could ROUND(.,2) differently across
    engines or partition counts. Both the PIVOT aggregate and the
    oracle therefore accumulate in DECIMAL(38,6) (the B92/dsum
    discipline, functions/exact.py) and present as ROUND for
    display."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               ROUND(COALESCE(CAST(open_total AS DOUBLE), 0), 2)
                 AS open_total,
               ROUND(COALESCE(CAST(finished_total AS DOUBLE), 0), 2)
                 AS finished_total,
               ROUND(COALESCE(CAST(pending_total AS DOUBLE), 0), 2)
                 AS pending_total
        FROM (SELECT o_orderpriority, o_orderstatus,
                     CAST(o_totalprice AS DECIMAL(38,6)) AS o_totalprice
              FROM orders)
        PIVOT (SUM(o_totalprice)
               FOR o_orderstatus IN ('O' AS open_total,
                                     'F' AS finished_total,
                                     'P' AS pending_total))
        ORDER BY o_orderpriority
        """
    )


@query(
    "q_b163_grouping_id_disambiguation",
    oracle="""
    SELECT COALESCE(l_returnflag, '__ALL__') AS returnflag,
           COALESCE(l_linestatus, '__ALL__') AS linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY gid, returnflag, linestatus
    """,
)
def q_b163_grouping_id_disambiguation(spark, sf_dir):
    """B163: GROUPING() / GROUPING_ID() — the disambiguators that make
    B21/B22/B23's multi-level aggregates actually consumable. A
    ROLLUP emits NULL group keys for the subtotal levels, but a NULL
    can ALSO be a real data value — a consumer reading `key IS NULL`
    as "subtotal row" silently merges genuine-NULL groups into the
    totals (the classic OLAP-cube bug). GROUPING(col) is the per-
    column this-is-a-subtotal bit and GROUPING_ID the packed bitmask
    — the level selector a report filters on (`WHERE gid = 0` = leaf
    rows only). The COALESCE to '__ALL__' in the output is exactly
    the rendering the bits make safe.

    Both engines implement the ANSI functions; the oracle runs the
    literal same text, pinning bit ORDER (left arg = high bit) as
    well as values — the part implementations disagree on most.

    Scale: free — the bits are computed in the same Expand node the
    rollup already plans; no extra pass, no extra shuffle."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, '__ALL__') AS returnflag,
               COALESCE(l_linestatus, '__ALL__') AS linestatus,
               CAST(GROUPING(l_returnflag) AS LONG) AS g_flag,
               CAST(GROUPING(l_linestatus) AS LONG) AS g_status,
               CAST(GROUPING_ID(l_returnflag, l_linestatus) AS LONG) AS gid,
               COUNT(*) AS n_items
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY gid, returnflag, linestatus
        """
    )
