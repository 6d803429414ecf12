"""Composite TPC-H-shaped workload queries (SURVEY §2 B164-B166).

The rest of the B-tier isolates one operator per key; these three are
the MULTI-operator plans a warehouse actually runs — selective dim
filters driving multi-way joins into grouped aggregates with top-N
tails — adapted to the fixture's columns (reference: the same
scan→join→aggregate macro-shape as the reference job, composed). They
exist to prove the engine's pieces COMPOSE: predicate pushdown on
three tables at once, broadcast vs shuffle join choice per join (AQE
decides from runtime sizes — no hints), partial aggregation under the
joins, and TakeOrderedAndProject tails instead of global sorts.

Float discipline: every revenue SUM accumulates in DECIMAL(38,6)
(functions/exact.py dsum / dsum_sql — exact + associative, so Spark's
partial-agg order and DuckDB's sequential order agree bit-for-bit).
Every LIMIT is totally ordered (revenue DESC, then a unique key) so
boundary ties cannot flip membership cross-engine.

Date constants live in one place below; the fixture's order/ship dates
span 1995-2001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark_eks_spark.catalog import load_table
from etl_spark_eks_spark.functions.exact import dsum, dsum_sql
from etl_spark_eks_spark.registry import query

Q3_CUTOFF = "1998-06-01 00:00:00"
Q5_START, Q5_END = "1997-01-01 00:00:00", "1998-01-01 00:00:00"
Q10_START, Q10_END = "1997-01-01 00:00:00", "1997-04-01 00:00:00"

_REVENUE = "l_extendedprice * (1 - l_discount)"


@query(
    "q_b164_tpch_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           {dsum_sql(_REVENUE)} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
      AND l.l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def q_b164_tpch_q3(spark, sf_dir):
    """B164: TPC-H Q3 (shipping priority) — the canonical selective
    3-way join: BUILDING-segment customers drive orders placed before
    the cutoff into lineitems shipped after it, grouped per order,
    top-10 by revenue. (The fixture has no o_shippriority column;
    o_orderpriority stands in — same plan, same semantics.)

    Plan contract: both date predicates and the segment equality push
    into their scans (three PushedFilters); customer is dim-sized so
    AQE broadcasts it into orders, the orders→lineitem join shuffles
    on orderkey (both sides fact-sized); the aggregate is partial
    under the join output; the LIMIT plans TakeOrderedAndProject —
    10 rows per partition fold, never a global sort of the aggregate.

    At 100 TB: the segment filter kills ~4/5 of customers before the
    join, the date filters prune parquet row groups on both fact
    scans — the query is IO-bound on exactly the rows it returns,
    which is the entire point of pushdown composing with joins."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(Q3_CUTOFF).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(Q3_CUTOFF).cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc(), "o_orderdate", "l_orderkey"
        )
        .limit(10)
    )


@query(
    "q_b165_tpch_q5",
    oracle=f"""
    SELECT n.n_name,
           {dsum_sql(_REVENUE)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '{Q5_START}'
      AND o.o_orderdate < TIMESTAMP '{Q5_END}'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def q_b165_tpch_q5(spark, sf_dir):
    """B165: TPC-H Q5 (local supplier volume) — the 6-way join:
    revenue by nation for orders in one year where the SUPPLIER is in
    the customer's own nation, restricted to one region. The
    c_nationkey = s_nationkey equality is the interesting edge: it is
    a join predicate between two tables that are not otherwise
    adjacent, so join ORDER matters — Catalyst (CBO + AQE) must route
    customer and supplier through the fact chain rather than
    cartesian-ing the dims.

    Plan contract: region→nation→supplier is a broadcast chain (all
    dim-sized); the fact chain orders→lineitem shuffles on orderkey;
    customer broadcasts into it; the nation-consistency predicate
    applies as a join condition, not a post-filter. Result is
    |nations-in-region| rows — the aggregate collapses everything
    map-side first.

    At 100 TB: one year of orders ≈ 1/7 of the fact table read after
    row-group pruning; every dim join is broadcast so the only big
    exchange is the orderkey shuffle both TPC-H fact tables already
    share (bucketed layouts, B60, eliminate even that)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q5_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_END).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q_b166_tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {dsum_sql(_REVENUE)} AS revenue,
           ROUND(c.c_acctbal, 2) AS c_acctbal,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '{Q10_START}'
      AND o.o_orderdate < TIMESTAMP '{Q10_END}'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_b166_tpch_q10(spark, sf_dir):
    """B166: TPC-H Q10 (returned-item reporting) — the churn query:
    which customers returned the most revenue in one quarter. A 4-way
    join where the GROUP BY keys come from the DIM side (customer
    attributes + nation) while the measure comes from the fact side —
    the shape that punishes engines which can't keep the aggregate
    partial through a dim-keyed grouping.

    Plan contract: quarter predicate and returnflag push into the two
    fact scans; nation broadcasts; customer broadcasts into the
    order/lineitem join output; top-20 is TakeOrderedAndProject on
    (revenue DESC, c_custkey) — the unique tiebreak that keeps
    boundary ties engine-stable.

    At 100 TB the grouping key cardinality is |customers who returned
    anything that quarter| — large but hash-aggregable; the top-20
    tail means nothing downstream ever sees more than 20 rows per
    partition."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_END).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )
