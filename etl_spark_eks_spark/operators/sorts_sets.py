"""Sorts, limits, top-k, and set operations (SURVEY §2 B32-B36).

Scale notes: global top-k uses Spark's TakeOrderedAndProject (per-
partition heaps + driver merge of k rows — never a full global sort);
set ops are expressed so partial aggregation happens before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark_eks_spark.catalog import load_table
from etl_spark_eks_spark.registry import query


@query(
    "q_b32_sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderstatus DESC, o_orderpriority ASC NULLS FIRST,
             o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_b32_sort_multi(spark, sf_dir):
    """B32: multi-column sort, mixed direction, explicit nulls ordering.
    LIMIT makes the selected row set order-dependent (so the oracle
    verifies the ordering, not just content)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.col("o_orderstatus").desc(),
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .limit(100)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
    )


@query(
    "q_b33_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_b33_topk(spark, sf_dir):
    """B33: global top-k — TakeOrderedAndProject."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_b34_union",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q_b34_union(spark, sf_dir):
    """B34: UNION (distinct) of two key sets via unionByName + distinct
    (map-side partial dedup before the shuffle)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select(F.col("c_custkey").alias("custkey"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.unionByName(o).distinct()


@query(
    "q_b35_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_b35_intersect(spark, sf_dir):
    """B35: INTERSECT (distinct semantics) — customers with both an 'F'
    and an 'O' order."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    op = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return f.intersect(op)


@query(
    "q_b36_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    """,
)
def q_b36_except(spark, sf_dir):
    """B36: EXCEPT (distinct) — customers with no six-figure order."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.subtract(o)
