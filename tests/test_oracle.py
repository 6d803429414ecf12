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


def test_staged_sentinel_invalidates_on_fixture_change(tmp_path):
    """The staged-landing sentinel must be keyed on fixture CONTENT:
    regenerating the source parquet in place (new mtime/size) must
    flip is_staged to False so q_b92/q_b93-style landing copies
    re-stage instead of silently serving stale data (ADVICE r4)."""
    import os
    import time

    from etl_spark_eks_spark.sources.parquet_io import (
        fixture_fingerprint,
        is_staged,
        mark_staged,
    )

    sf = tmp_path / "sf"
    tbl = sf / "orders.parquet"
    tbl.mkdir(parents=True)
    part = tbl / "part-0.parquet"
    part.write_bytes(b"v1-bytes")

    landing = str(tmp_path / "landing")
    fp1 = fixture_fingerprint(str(sf), "orders")
    assert not is_staged(landing, fp1)
    mark_staged(landing, fp1)
    assert is_staged(landing, fp1)

    # regenerate the fixture in place: same name, new content+mtime
    time.sleep(0.01)
    part.write_bytes(b"v2-bytes-longer")
    fp2 = fixture_fingerprint(str(sf), "orders")
    assert fp2 != fp1
    assert not is_staged(landing, fp2)  # stale landing must re-stage
    mark_staged(landing, fp2)
    assert is_staged(landing, fp2)

    # single-file (non-directory) fixtures fingerprint too
    single = tmp_path / "sf2"
    single.mkdir()
    (single / "events.parquet").write_bytes(b"x")
    assert fixture_fingerprint(str(single), "events")
    # missing table -> stable empty-content fingerprint, no crash
    assert fixture_fingerprint(str(single), "nope") == fixture_fingerprint(
        str(single), "nope"
    )
