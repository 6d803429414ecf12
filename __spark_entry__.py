"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`etl_spark_eks_spark`: the engine's query registry
(one entry per SURVEY.md §2 operator) provides ``queries()`` and
``oracle_sql()``; ``entry()`` runs the flagship pricing-summary query
(TPC-H-Q1 shape — the reference job's scan->transform->aggregate path,
reference workflow-examples/pyspark-taxi-trip.py:37-51) at sf0.001.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from etl_spark_eks_spark import registry  # noqa: E402
from etl_spark_eks_spark.session import apply_engine_conf  # noqa: E402

registry.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_engine_conf(spark)
    return registry.QUERIES["q_b17_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted => rows-only)."""
    return dict(registry.ORACLES)
