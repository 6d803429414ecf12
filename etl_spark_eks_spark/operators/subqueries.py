"""Subqueries (SURVEY §2 B43-B44) — expressed through spark.sql so
Catalyst's subquery rewriting (scalar subquery -> join,
correlated EXISTS -> left semi join) does the decorrelation.
"""

from __future__ import annotations

from etl_spark_eks_spark.catalog import register_views
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
