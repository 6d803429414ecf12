"""Oracle-differential tests (SURVEY §5.2 #1): every registered query
with an oracle runs on Spark AND DuckDB over the same parquet; results
must match exactly (count + schema + order-insensitive values) — the
same gate the driver applies at sf0.01.

Queries without an oracle get a rows-sanity check.
"""

from __future__ import annotations

import pytest

from etl_spark_eks_spark import registry

registry.load_all()

ORACLE_KEYS = sorted(registry.ORACLES)
ROWS_ONLY_KEYS = sorted(k for k in registry.QUERIES if k not in registry.ORACLES)

from compare import assert_results_equal  # noqa: E402


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match(name, spark, duck, sf_dir):
    spark_pdf = registry.QUERIES[name](spark, sf_dir).toPandas()
    oracle_pdf = duck.execute(registry.ORACLES[name]).fetchdf()
    assert_results_equal(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_runs(name, spark, sf_dir):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
