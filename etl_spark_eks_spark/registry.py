"""Query registry backing the ``__spark_entry__`` driver contract.

Every operator in SURVEY.md §2 registers here with:
- a Spark callable ``(spark, sf_dir) -> DataFrame``
- optionally an ANSI-SQL oracle string DuckDB runs on the same parquet
  (omitted for non-SQL-expressible ops -> driver does a rows-only check).

Rules enforced by convention (SURVEY §5.2):
- alias every computed column identically in Spark and SQL;
- ROUND(x, 6) any float *aggregate* on both sides (per-row IEEE
  arithmetic is deterministic and left unrounded). Known limit: a
  parallel SUM's addition ORDER differs between Spark partials and
  DuckDB, so the result carries ~1 ulp of engine-dependent noise
  (~2e-16 relative). At the sf0.01 oracle gate that is far below the
  6-dp rounding; at sf0.1 a handful of 1e10-magnitude sums
  (q_b17/b22/b25-class) can flip their 6th decimal and hash-mismatch —
  measured, nondeterministic run to run, and inherent to cross-engine
  FP comparison rather than a semantic divergence (counts, schemas,
  and all other columns still match);
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
