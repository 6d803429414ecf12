"""Subqueries (SURVEY §2 B43-B44) — expressed through spark.sql so
Catalyst's subquery rewriting (scalar subquery -> join,
correlated EXISTS -> left semi join) does the decorrelation.
"""

from __future__ import annotations

from etl_spark_eks_spark.catalog import load_table, register_views
from etl_spark_eks_spark.registry import query

_B43_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
"""

_B44_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderpriority = '1-URGENT'
    AND o.o_totalprice > 150000
)
"""


@query("q_b43_scalar_subquery", oracle=_B43_SQL)
def q_b43_scalar_subquery(spark, sf_dir):
    """B43: scalar subquery (orders above 2x the global average price).
    Catalyst plans the scalar as an independent stage + broadcast."""
    register_views(spark, sf_dir)
    return spark.sql(_B43_SQL)


@query("q_b44_exists_subquery", oracle=_B44_SQL)
def q_b44_exists_subquery(spark, sf_dir):
    """B44: correlated EXISTS, decorrelated by Catalyst to a left semi
    join on o_custkey."""
    register_views(spark, sf_dir)
    return spark.sql(_B44_SQL)


_B84_SPARK_SQL = """
WITH RECURSIVE chain AS (
  SELECT c_custkey AS start_key, c_custkey AS cur, 0 AS depth
  FROM customer
  UNION ALL
  SELECT start_key, cur DIV 2, depth + 1
  FROM chain WHERE cur > 0
)
SELECT start_key, MAX(depth) AS depth_to_root,
       CAST(SUM(cur) AS BIGINT) AS path_sum
FROM chain
GROUP BY start_key
"""

_B84_ORACLE_SQL = """
WITH RECURSIVE chain AS (
  SELECT c_custkey AS start_key, c_custkey AS cur, 0 AS depth
  FROM customer
  UNION ALL
  SELECT start_key, cur // 2, depth + 1
  FROM chain WHERE cur > 0
)
SELECT start_key, MAX(depth) AS depth_to_root,
       CAST(SUM(cur) AS BIGINT) AS path_sum
FROM chain
GROUP BY start_key
"""


_B86_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
"""


@query("q_b86_lateral_join", oracle=_B86_SQL)
def q_b86_lateral_join(spark, sf_dir):
    """B86: correlated LATERAL subquery in FROM (Spark 3.2+ SQL
    surface) — each customer's two most expensive orders, written as
    a per-row dependent subquery with ORDER BY + LIMIT rather than a
    window. The declarative form of B27's top-n-per-group; the point
    is that Catalyst DECORRELATES it: the planned shape is a rank
    window over orders partitioned by o_custkey with WindowGroupLimit
    pushdown (top-2 kept per partition BEFORE the full sort
    materializes), then one join back to customer — never a per-row
    re-execution of the inner query, which is what the SQL literally
    says and what would be quadratic at scale.

    Scale: identical plan to the hand-written window top-n — one
    shuffle of orders on custkey with group-limit pruning inside the
    sort, customer side broadcast. Verified by plan test (WindowGroupLimit
    present, no nested-loop join)."""
    register_views(spark, sf_dir)
    return spark.sql(_B86_SQL)


@query("q_b84_recursive_cte", oracle=_B84_ORACLE_SQL)
def q_b84_recursive_cte(spark, sf_dir):
    """B84: recursive CTE (WITH RECURSIVE, Spark 4's SQL-native
    iteration surface) — walk every customer's synthetic parent chain
    (parent = key DIV 2, root 0) and aggregate depth-to-root and
    path sum. This is the declared-SQL sibling of C18's hand-built
    connected-components loop: bounded-depth hierarchy traversal
    (org charts, category trees, bill-of-materials) stays in one SQL
    statement; C18's contraction loop remains the right tool when the
    iteration count is data-dependent and unbounded.

    Scale: each recursion step is a distributed projection+filter over
    the previous step (no self-join), the frontier shrinks as chains
    terminate, and total steps are log2(max key) — the materialized
    intermediate is rows x depth, never rows x rows. The only shuffle
    is the final group-by on start_key."""
    register_views(spark, sf_dir)
    return spark.sql(_B84_SPARK_SQL)


@query(
    "q_b121_parameterized_sql",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
               AS total
    FROM orders
    WHERE o_orderstatus = 'O'
      AND o_totalprice >= 1000.0
      AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_b121_parameterized_sql(spark, sf_dir):
    """B121: PARAMETERIZED SQL (Spark 3.4+ named parameter markers) —
    the injection-safe templating surface every SQL gateway needs:
    values bind as TYPED LITERALS at parse time (`:status`,
    `:min_total`, array parameter expanded through `array_contains`),
    never by string concatenation, so a user-supplied
    `'; DROP TABLE--` is just data. This is the API the reference's
    Athena surface exposes as prepared statements/execution
    parameters, re-expressed on `spark.sql(sqlText, args=...)`.

    Because parameters fold to literals BEFORE optimization, the plan
    is identical to the hand-written query — pushdown, pruning and
    partial aggregation all intact (same reason B101's SQL UDFs cost
    nothing). The oracle is the expanded query, which is exactly the
    semantics being claimed: binding == inlining.

    Scale: parse-time binding means plan CACHING by template works —
    a dashboard re-issuing the template with new dates reuses the
    analyzed structure; no engine-side change at any data size."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "b121_orders"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                   AS total
        FROM b121_orders
        WHERE o_orderstatus = :status
          AND o_totalprice >= :min_total
          AND array_contains(:priorities, o_orderpriority)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={
            "status": "O",
            "min_total": 1000.0,
            "priorities": ["1-URGENT", "2-HIGH", "3-MEDIUM"],
        },
    )


_B161_SQL = """
    WITH o AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o.o_orderkey, o.o_custkey, ROUND(o.o_totalprice, 2) AS price
    FROM o
    WHERE 2 * o.cents * (
        SELECT COUNT(*) FROM o i WHERE i.o_custkey = o.o_custkey
    ) > 3 * (
        SELECT SUM(i.cents) FROM o i WHERE i.o_custkey = o.o_custkey
    )
    ORDER BY o.o_orderkey
"""


@query("q_b161_correlated_scalar_subquery", oracle=_B161_SQL)
def q_b161_correlated_scalar_subquery(spark, sf_dir):
    """B161: CORRELATED scalar subquery — each order compared against
    its own customer's average ("orders 1.5x above this customer's
    norm"). B43 is the uncorrelated case (one global scalar,
    broadcast); correlation changes everything about execution: a
    tuple-at-a-time re-execution of the inner query is O(n) subquery
    runs, so Catalyst DECORRELATES — rewrites the subquery into a
    per-custkey aggregate joined back on the correlation key
    (DecorrelateInnerQuery / RewriteCorrelatedScalarSubquery), turning
    the apply into one aggregate + one equi-join. The oracle runs the
    literal same text; DuckDB performs the same flattening — agreeing
    ANSWERS through independent decorrelations is the semantics check.

    Plan contract: the executed plan contains an Aggregate on
    o_custkey joined to orders — never a nested-loop re-evaluation.
    Both sides read orders twice (self-aggregate + probe), which
    B117's caching pattern collapses when this shape sits in a hot
    path.

    Scale: the decorrelated form is a map-side-combined per-customer
    aggregate (|customers| rows) joined on the grouping key —
    broadcastable when customers fit, shuffled-hash otherwise; either
    way linear, where the naive correlated execution is quadratic.

    Float discipline (r7 ADVICE): the natural form `price > 1.5 *
    AVG(price)` is a double-aggregate whose last-ulp depends on
    summation order, so a row sitting exactly on the boundary could
    flip membership between engines or partition layouts. The
    predicate is therefore cross-multiplied into EXACT integer-cents
    arithmetic — `2·cents·COUNT > 3·SUM(cents)` (prices are exact
    2-dp, recovered losslessly by ROUND(·*100)) — as TWO correlated
    scalar subqueries over the same group, both decorrelated, in the
    identical text both engines run."""
    register_views(spark, sf_dir)
    return spark.sql(_B161_SQL)


@query(
    "q_b169_not_in_null_semantics",
    oracle="""
    WITH probe AS (
      SELECT CASE WHEN o_orderkey % 50 = 0 THEN NULL
                  ELSE o_custkey END AS k
      FROM orders WHERE o_totalprice > 300000
    )
    SELECT 'not_in' AS method,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer WHERE c_custkey NOT IN (SELECT k FROM probe)
    UNION ALL
    SELECT 'not_exists' AS method,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.k = c.c_custkey)
    ORDER BY method
    """,
)
def q_b169_not_in_null_semantics(spark, sf_dir):
    """B169: NOT IN vs NOT EXISTS under NULLs — the three-valued-logic
    trap pinned as an operator. `x NOT IN (S)` is `x <> s1 AND x <>
    s2 AND ...`; one NULL in S makes every conjunct UNKNOWN-at-best,
    so the predicate NEVER passes and the query silently returns
    ZERO rows — the classic exclusion-list bug (a single NULL in the
    blocklist un-blocks nothing and empties the result instead).
    `NOT EXISTS` with an equality correlate ignores NULL probes and
    returns the intended complement. Both cohorts run in one
    statement; the oracle is the literal same text — both engines
    implement the same ANSI semantics, and PINNING the surprising
    answer (n=0 for NOT IN) is the point: an engine that 'fixed' it
    would be wrong.

    Execution note: NOT IN plans as a NULL-AWARE anti join (Spark's
    NAAJ — a broadcast variant exists precisely because the
    null-check makes the general case expensive); NOT EXISTS is a
    plain LeftAnti. Same report shape as B162's cohort counts.

    Scale: the probe side is filtered-small and broadcast; the
    customer scan is one pass. The operator's value is semantic
    documentation, priced at one extra anti join."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "b169_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "b169_orders"
    )
    return spark.sql(
        """
        WITH probe AS (
          SELECT CASE WHEN o_orderkey % 50 = 0 THEN NULL
                      ELSE o_custkey END AS k
          FROM b169_orders WHERE o_totalprice > 300000
        )
        SELECT 'not_in' AS method, COUNT(*) AS n_customers
        FROM b169_customer WHERE c_custkey NOT IN (SELECT k FROM probe)
        UNION ALL
        SELECT 'not_exists' AS method, COUNT(*) AS n_customers
        FROM b169_customer c
        WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.k = c.c_custkey)
        ORDER BY method
        """
    )


@query(
    "q_b170_lateral_topk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 2) AS acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey)
               AS rn
      FROM customer
    ),
    segs AS (SELECT DISTINCT c_mktsegment FROM customer)
    SELECT s.c_mktsegment, r.c_custkey, r.acctbal
    FROM segs s JOIN ranked r
      ON r.c_mktsegment = s.c_mktsegment AND r.rn <= 2
    ORDER BY s.c_mktsegment, r.c_custkey
    """,
)
def q_b170_lateral_topk_per_group(spark, sf_dir):
    """B170: correlated LATERAL subquery with ORDER BY + LIMIT — the
    top-k-per-group shape spelled the way migrating Postgres SQL
    writes it (`FROM dims d, LATERAL (SELECT ... WHERE key = d.key
    ORDER BY ... LIMIT k) t`), vs B27's window spelling. The ORACLE
    is deliberately the ROW_NUMBER desugaring: the check is that the
    lateral form means exactly the window form (per group: the same
    k rows under the same total order — ties broken by c_custkey in
    the LIMIT's sort so boundary ties can't diverge).

    Execution note: Spark decorrelates the lateral into a
    per-partition ranked join (DecorrelateLateralSubquery), not a
    per-outer-row re-execution — the same decorrelation contract as
    B161, extended to LIMIT. With k bounded, WindowGroupLimit
    machinery keeps the per-group work k-sized.

    Scale: |groups| outer rows each bind a k-row inner result; the
    inner sort is per-group (keyed), never global."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "b170_customer"
    )
    return spark.sql(
        """
        SELECT s.c_mktsegment, t.c_custkey,
               ROUND(t.c_acctbal, 2) AS acctbal
        FROM (SELECT DISTINCT c_mktsegment FROM b170_customer) s,
        LATERAL (
          SELECT c_custkey, c_acctbal
          FROM b170_customer i
          WHERE i.c_mktsegment = s.c_mktsegment
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 2
        ) t
        ORDER BY s.c_mktsegment, t.c_custkey
        """
    )
