"""Data-layout operators (SURVEY §2 C35): sort-ordered parquet layout
for zone-map (min/max footer stats) pruning.

At 100 TB the cheapest query is the one that never reads the file:
parquet footers carry per-column min/max, and every modern scanner
(Spark, DuckDB, Athena — the reference's declared SQL surface,
reference addons.tf:259-263) skips files/row-groups whose range cannot
match the predicate. That only works if the data is RANGE-CLUSTERED on
the predicate column — which is a write-time layout decision, not a
read-time optimization. This module is that decision as an operator.
"""

from __future__ import annotations

from etl_spark_eks_spark.catalog import load_table
from etl_spark_eks_spark.registry import query
from etl_spark_eks_spark.sources.parquet_io import fresh_scratch

_LAYOUT_FILES = 8


def file_ranges(out_dir: str, column: str) -> list[tuple]:
    """Per-file (min, max) of ``column`` read from parquet FOOTERS only
    (no data pages) — exactly the stats a zone-map-pruning scanner
    consults. Returns [(path, min, max)] sorted by min."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for path in glob.glob(os.path.join(out_dir, "*.parquet")):
        md = pq.ParquetFile(path).metadata
        idx = md.schema.names.index(column)
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                los.append(st.min)
                his.append(st.max)
        if los:
            out.append((path, min(los), max(his)))
    out.sort(key=lambda t: t[1])
    return out


@query(
    "q_c35_sorted_layout",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice
    FROM lineitem
    """,
)
def q_c35_sorted_layout(spark, sf_dir):
    """C35 (extension): range-clustered sorted parquet layout — the
    fact table rewritten as ``repartitionByRange(l_shipdate)`` +
    ``sortWithinPartitions``, so each output file owns a disjoint
    shipdate range and its footer min/max becomes an exact zone map: a
    date-predicate scan prunes every non-matching file without opening
    it. The content is untouched (the oracle is the identity SELECT —
    layout must be lossless); the layout property itself —
    non-overlapping per-file ranges, verified from footers alone — is
    asserted in tests/test_tier_c.py via :func:`file_ranges`.

    Scale: one range-partitioning shuffle (sampled boundaries keep the
    output files equal-sized even under value skew) + a per-partition
    sort that spills — the standard one-pass layout job run after
    corpus assembly, amortized over every downstream scan. The sort
    key list is the knob: (l_shipdate, l_orderkey) clusters for time
    predicates first, key lookups second — the single-dimension
    ordering a Z-/Hilbert-curve generalizes when two predicates matter
    equally."""
    tag = sf_dir.strip("/").replace("/", "_")
    out = fresh_scratch("q_c35", tag, "out")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice"
    )
    (
        li.repartitionByRange(_LAYOUT_FILES, "l_shipdate", "l_orderkey")
        .sortWithinPartitions("l_shipdate", "l_orderkey")
        .write.mode("overwrite")
        .parquet(out)
    )
    return spark.read.parquet(out).select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice"
    )
