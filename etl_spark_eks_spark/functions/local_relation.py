"""JVM-local small-dimension tables via SQL VALUES.

``spark.createDataFrame(py_list)`` routes local rows through a pickled
Python RDD: the resulting plan node is ``Scan ExistingRDD``, and EVERY
execution schedules Python workers to deserialize the handful of rows —
measured ~0.5 s per scan warm (and broadcast dims re-scan per
execution). A SQL ``VALUES`` list is a JVM ``LocalRelation`` instead:
constant-folded at plan time, zero Python, zero scan (the q_c118 fix,
round 8: 4.3 s -> 0.25 s for a query that IS such a grid).

Use this for every small static/driver-built dimension that feeds a
broadcast join. NOT for materializing collected results back to a
DataFrame (``createDataFrame(df.collect(), df.schema)``) — those are
one-shot by design and may carry types VALUES can't spell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return repr(v) + "D"  # force DOUBLE literal, shortest round-trip repr
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    raise TypeError(f"values_df cannot spell {type(v).__name__} literals")


def values_df(spark: SparkSession, rows, ddl: str) -> DataFrame:
    """Local relation from ``rows`` (tuples) with the EXACT schema
    ``ddl`` ("name type, ..."): every column is CAST so the result
    schema matches what createDataFrame produced before the migration
    (python int -> BIGINT etc.) and oracle schema hashes are unmoved."""
    cols = [c.strip().rsplit(None, 1) for c in ddl.split(",")]
    if not rows:
        raise ValueError("values_df needs at least one row")
    width = len(cols)
    body = ", ".join(
        "(" + ", ".join(_lit(v) for v in row) + ")" for row in rows
    )
    select = ", ".join(
        f"CAST(c{i} AS {typ}) AS {name}"
        for i, (name, typ) in enumerate(cols)
    )
    anon = ", ".join(f"c{i}" for i in range(width))
    return spark.sql(
        f"SELECT {select} FROM (VALUES {body}) AS v({anon})"
    )
