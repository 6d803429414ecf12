"""values_df contract tests (round-9 advisor items): the SQL-VALUES
local-relation helper replaced createDataFrame for every small dim, so
its edge behavior must match what createDataFrame gave callers —
typed EMPTY relations, parameterized-type ddl, loud non-finite floats."""

from __future__ import annotations

import pytest

from etl_spark_eks_spark.functions.local_relation import (
    _split_ddl,
    values_df,
)


def test_values_df_empty_rows_typed_empty(spark):
    """q_b118 filters driver-collected telemetry down to possibly zero
    rows: an empty rows list must return a typed EMPTY DataFrame (as
    createDataFrame([], ddl) did), never raise."""
    df = values_df(spark, [], "a bigint, b string, c double")
    assert df.count() == 0
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint",
        "string",
        "double",
    ]


def test_values_df_parameterized_type_ddl(spark):
    """Commas nested in type parameters must not split columns."""
    df = values_df(spark, [(1, 2.5)], "x bigint, y decimal(38,6)")
    assert df.schema.simpleString() == "struct<x:bigint,y:decimal(38,6)>"
    row = df.first()
    assert row["x"] == 1 and float(row["y"]) == 2.5


def test_values_df_nonfinite_float_raises(spark):
    """repr(inf) is not a SQL literal — refuse loudly instead of
    emitting invalid (or column-resolving) SQL."""
    for bad in (float("inf"), float("-inf"), float("nan")):
        with pytest.raises(ValueError):
            values_df(spark, [(bad,)], "v double")


def test_split_ddl_paren_and_angle_aware():
    assert _split_ddl("a decimal(38,6), b map<string,int>, c bigint") == [
        ["a", "decimal(38,6)"],
        ["b", "map<string,int>"],
        ["c", "bigint"],
    ]
    with pytest.raises(ValueError):
        _split_ddl("a decimal(38,6), just_a_name")
