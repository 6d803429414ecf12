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

from pyspark.sql import functions as F

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


_Z_BITS = 8  # per-dimension quantization width; z-value uses 2*_Z_BITS bits


def zvalue_column(qa, qb):
    """Morton (Z-curve) interleave of two ``_Z_BITS``-bit quantized
    columns, built entirely from JVM bitwise expressions (shiftright /
    AND / multiply-by-power-of-two folded constant) — no UDF, stays
    inside whole-stage codegen. ``qa``'s bits land in odd positions
    (it gets the tie-break priority), ``qb``'s in even."""
    from pyspark.sql import functions as F

    z = F.lit(0)
    for i in range(_Z_BITS):
        bit_a = F.shiftright(qa, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(qb, i).bitwiseAND(F.lit(1))
        z = z + bit_a * F.lit(1 << (2 * i + 1)) + bit_b * F.lit(1 << (2 * i))
    return z


@query(
    "q_c74_zorder_layout",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
    FROM lineitem
    """,
)
def q_c74_zorder_layout(spark, sf_dir):
    """C74 (extension): Z-ORDER (Morton-curve) multi-column layout —
    the 2-D generalization C35's docstring points at. A 1-D range
    cluster on l_partkey gives perfect zone maps on l_partkey and
    USELESS ones on l_suppkey (every file spans the full supplier
    range); interleaving the bits of both quantized keys into one sort
    key localizes files in BOTH dimensions at once, so footer min/max
    prunes predicates on either column. The lakehouse engines (Delta
    OPTIMIZE ZORDER BY, Iceberg sort orders) sell exactly this rewrite;
    here it is ~15 lines of bitwise Catalyst expressions.

    Shape: 1-row min/max agg over the two keys (broadcast crossJoin) ->
    integer quantization to 8 bits per dimension ((x-lo)*256 integer-div
    span, exact cross-engine) -> bit-interleave (zvalue_column, pure
    JVM) -> repartitionByRange(z) + sortWithinPartitions(z) write. The
    content is untouched — the oracle is the identity SELECT, as C35 —
    and the layout property (both dimensions prune from footers alone;
    a 1-D layout provably cannot on the second) is asserted in
    tests/test_tier_c.py from parquet footer stats.

    Scale: identical cost envelope to C35 — one stats agg (map-side
    fold to 1 row), one range shuffle on the z key, per-partition
    spillable sort; runs once after corpus assembly, amortized over
    every 2-D-predicate scan. Knobs: bits per dimension (8 here; 16 for
    billion-key domains) and the dimension list — beyond ~4 dimensions
    per-dimension selectivity collapses (each gets 2*BITS/d bits) and a
    Hilbert curve or separate layouts win; that cliff is a documented
    property of the encoding, not of this plan."""
    from pyspark.sql import functions as F

    tag = sf_dir.strip("/").replace("/", "_")
    out = fresh_scratch("q_c74", tag, "out")
    cols = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_quantity"]
    li = load_table(spark, sf_dir, "lineitem").select(*cols)
    bounds = li.agg(
        F.min("l_partkey").alias("p_lo"), F.max("l_partkey").alias("p_hi"),
        F.min("l_suppkey").alias("s_lo"), F.max("l_suppkey").alias("s_hi"),
    )
    q = li.crossJoin(F.broadcast(bounds))
    span = 1 << _Z_BITS
    qa = ((F.col("l_partkey") - F.col("p_lo")) * span).cast("long") / (
        F.col("p_hi") - F.col("p_lo") + 1
    )
    qb = ((F.col("l_suppkey") - F.col("s_lo")) * span).cast("long") / (
        F.col("s_hi") - F.col("s_lo") + 1
    )
    z = zvalue_column(F.floor(qa).cast("int"), F.floor(qb).cast("int"))
    (
        q.withColumn("zval", z)
        .repartitionByRange(_LAYOUT_FILES, "zval")
        .sortWithinPartitions("zval")
        .select(*cols)
        .write.mode("overwrite")
        .parquet(out)
    )
    return spark.read.parquet(out).select(*cols)


@query(
    "q_b146_output_file_sizing",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6)))
                      AS DOUBLE), 4) AS total_price,
           TRUE AS within_cap,
           TRUE AS file_count_bounded,
           TRUE AS files_internally_sorted
    FROM lineitem
    """,
)
def q_b146_output_file_sizing(spark, sf_dir):
    """B146: OUTPUT FILE SIZING — the small-files control every
    100 TB writer needs: `repartition(P)` fixes task parallelism,
    `sortWithinPartitions` orders rows inside each task, and
    `maxRecordsPerFile=N` rolls each task's output into bounded
    files. Unbounded, a 1000-task job writes 1000 arbitrary-size
    files per day and the lake dies by listing cost and tiny-file
    overhead; bounded-and-sorted, every file is zone-map friendly
    (its min/max actually prune, C35's claim) and dataloader-sized
    (M3's shard contract).

    The audit reads back through the `_metadata` hidden column
    (B126's surface) and CHECKS the three contract clauses as
    booleans the oracle pins TRUE (the B19 self-verifying shape,
    since SQL cannot see files): (1) no file exceeds N records,
    (2) the file count lands in [ceil(n/N), ceil(n/N)+P] — each of
    the P tasks rounds up at most once — and (3) every file is
    INTERNALLY sorted by the sort key — checked with a per-file lag
    window ordered by `_metadata.row_index` (the PHYSICAL row order;
    ordering the window by l_shipdate itself would make the check
    vacuously true), the property that makes per-file min/max
    statistics selective instead of full-range.

    Content columns (row count, DECIMAL-exact revenue) prove the
    round-trip changed nothing while the layout changed completely."""
    import math

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    tag = sf_dir.strip("/").replace("/", "_")
    out = fresh_scratch("q_b146", tag, "out")
    parts, cap = 4, 5000
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    (
        li.repartition(parts)
        .sortWithinPartitions("l_shipdate")
        .write.option("maxRecordsPerFile", cap)
        .parquet(out)
    )
    rb = spark.read.parquet(out).select(
        "l_orderkey",
        "l_shipdate",
        "l_extendedprice",
        F.col("_metadata.file_name").alias("fname"),
        F.col("_metadata.row_index").alias("ridx"),
    )
    n = li.count()
    w_file = Window.partitionBy("fname").orderBy("ridx")
    per_file = (
        rb.withColumn("prev_ship", F.lag("l_shipdate").over(w_file))
        .withColumn(
            "disorder",
            (F.col("prev_ship") > F.col("l_shipdate")).cast("int"),
        )
        .groupBy("fname")
        .agg(
            F.count("*").alias("recs"),
            F.sum(F.coalesce(F.col("disorder"), F.lit(0))).alias(
                "disorders"
            ),
        )
    )
    stats = per_file.agg(
        F.count("*").alias("n_files"),
        F.max("recs").alias("max_recs"),
        F.sum("disorders").alias("total_disorders"),
    ).first()
    lo = math.ceil(n / cap)
    return (
        rb.agg(
            F.count("*").cast("long").alias("n_rows"),
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(38,6)")
                ).cast("double"),
                4,
            ).alias("total_price"),
        )
        .select(
            "n_rows",
            "total_price",
            F.lit(bool(stats["max_recs"] <= cap)).alias("within_cap"),
            F.lit(
                bool(lo <= stats["n_files"] <= lo + parts)
            ).alias("file_count_bounded"),
            F.lit(bool(stats["total_disorders"] == 0)).alias(
                "files_internally_sorted"
            ),
        )
    )


@query(
    "q_b176_rebalance_hint",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT heat) AS BIGINT) AS n_keys,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6)))
                      AS DOUBLE), 4) AS total_price,
           TRUE AS hot_key_split,
           TRUE AS no_file_exceeds_hot_key
    FROM (SELECT l_extendedprice,
                 CASE WHEN l_orderkey % 10 < 8 THEN 'hot'
                      ELSE 'cold_' || CAST(l_orderkey % 10 AS VARCHAR)
                 END AS heat
          FROM lineitem)
    """,
)
def q_b176_rebalance_hint(spark, sf_dir):
    """B176: the AQE REBALANCE hint — the write-side answer to key
    skew. `repartition(key)` on a skewed key writes one elephant file
    per hot key (here a synthetic 80/20 key: 80% of lineitem lands on
    'hot'); `df.hint("rebalance", key)` keeps the key clustering but
    lets AQE SPLIT oversized partitions and COALESCE tiny ones to the
    advisory size — bounded output files regardless of skew, without
    choosing a partition count by hand (B146 bounds records per task;
    this bounds the task sizes themselves). The advisory size is
    derived from the measured row count so the split engages at every
    fixture scale.

    Self-verifying booleans (the B19 shape — SQL cannot see files):
    (1) hot_key_split: the output has MORE files than distinct keys,
    impossible under plain key-repartitioning, so the hot partition
    genuinely split; (2) no_file_exceeds_hot_key: no single file
    holds the whole hot key's rows. Content columns prove values
    survived the round trip untouched.

    Scale: REBALANCE is the production default for the final exchange
    before a lake write — at 1000 executors a hand-tuned
    repartition(N) is wrong the day the data grows; the advisory
    target is a cluster-level constant. Reference analogue: the
    s3a committer tuning (spark-operator-taxi.yaml:17-31) assumes
    sanely-sized output objects; this is the operator that makes
    them sane."""
    tag = sf_dir.strip("/").replace("/", "_")
    out = fresh_scratch("q_b176", tag, "out")
    # repartition(16) + localCheckpoint pins 16 MAP tasks under the
    # rebalance shuffle. Both are fixture crutches a cluster does not
    # need — but they are load-bearing here: (a) AQE's skew split
    # assigns MAPPER RANGES to the split partitions, and the fixture
    # scan is one task, below split granularity (a 100 TB scan has
    # thousands of mappers); (b) the checkpoint is what keeps the
    # repartition alive at all — CollapseRepartition folds a bare
    # repartition into the adjacent rebalance exchange, and
    # EliminateSorts strips a sortWithinPartitions blocker as
    # redundant-before-shuffle (both observed; only a lineage cut
    # survives the optimizer).
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_extendedprice",
            F.when(F.col("l_orderkey") % 10 < 8, F.lit("hot"))
            .otherwise(
                F.concat(F.lit("cold_"), (F.col("l_orderkey") % 10))
            )
            .alias("heat"),
        )
        .repartition(16)
        .localCheckpoint(eager=True)
    )
    n = li.count()
    hot_rows = li.filter(F.col("heat") == "hot").count()
    # ~12 advisory-sized pieces of the whole dataset; ~40 B/row in
    # shuffle format. max() keeps the floor sane at sf0.001.
    advisory = max(16_384, n * 40 // 12)
    confs = {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(advisory),
        # default 1 MiB floor would re-merge everything at fixture scale
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1024",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li.hint("rebalance", "heat").write.mode("overwrite").parquet(out)
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    rb = spark.read.parquet(out).select(
        "l_extendedprice",
        "heat",
        F.col("_metadata.file_name").alias("fname"),
    )
    per_file = rb.groupBy("fname").agg(F.count("*").alias("recs"))
    stats = per_file.agg(
        F.count("*").alias("n_files"), F.max("recs").alias("max_recs")
    ).first()
    # Derived from the data already in hand (NOT hardcoded to the
    # current fixture's 3 residues): the hot_key_split bar must track
    # the actual key cardinality or a fixture change would silently
    # compare file count against a stale constant.
    n_keys = li.select("heat").distinct().count()
    return rb.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count_distinct("heat").cast("long").alias("n_keys"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast(
                "double"
            ),
            4,
        ).alias("total_price"),
    ).select(
        "n_rows",
        "n_keys",
        "total_price",
        F.lit(bool(stats["n_files"] > n_keys)).alias("hot_key_split"),
        F.lit(bool(stats["max_recs"] < hot_rows)).alias(
            "no_file_exceeds_hot_key"
        ),
    )
