"""Vector math over ArrayType(Float) embedding columns — pure Catalyst
higher-order functions (zip_with + aggregate), no UDFs.

Precision contract: elements are cast to double BEFORE multiply, and
accumulation is a sequential left fold — bit-identical to the DuckDB
oracle's list_zip/list_sum double pipeline (verified exact over every
pair at sf0.001 in tests). Float32 shortcuts (like DuckDB's native
list_cosine_similarity) differ at ~1e-7 and are deliberately not used.

Scale: these are per-row expressions — they vectorize inside whole-stage
codegen and add zero shuffles. 100 TB similarity search is then purely a
candidate-generation problem (see operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold double dot product of two float array columns."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize; with pre-normalized vectors cosine becomes a plain
    dot product (halves the work in pairwise search)."""
    a = F.col(a) if isinstance(a, str) else a
    n = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
