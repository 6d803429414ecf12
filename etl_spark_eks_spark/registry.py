"""Query registry backing the ``__spark_entry__`` driver contract.

Every operator in SURVEY.md §2 registers here with:
- a Spark callable ``(spark, sf_dir) -> DataFrame``
- optionally an ANSI-SQL oracle string DuckDB runs on the same parquet
  (omitted for non-SQL-expressible ops -> driver does a rows-only check).

Rules enforced by convention (SURVEY §5.2):
- alias every computed column identically in Spark and SQL;
- large-magnitude float SUMs accumulate in DECIMAL(38,6) and cast back
  to double on BOTH sides (functions/exact.py: exact + associative, so
  Spark's partial-sum order and DuckDB's sequential order agree
  bit-for-bit — ROUND(SUM(double), 6) was measured to flip its 6th
  decimal cross-engine on ~6e8-magnitude sums, q_b60 round 1);
- small-magnitude float aggregates (AVG, ratios) ROUND(x, 6) on both
  sides; per-row IEEE arithmetic is deterministic and stays unrounded;
- CAST integer sums to BIGINT in DuckDB (its native int sum is HUGEINT);
- sort-key every LIMIT;
- no plan-time now()/random() without a fixed literal.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query (and optional DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run."""
    from etl_spark_eks_spark import operators  # noqa: F401

    operators.load_all()
