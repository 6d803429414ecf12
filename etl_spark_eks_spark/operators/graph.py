"""Graph analytics over relational data (SURVEY §2 C61).

Complements dedup.py's connected-components (C18: data-dependent
iteration to fixpoint) with the other canonical distributed-graph
shape: fixed-iteration-count numeric propagation (PageRank). Both are
loops of join+aggregate rounds over an edge table — the pattern every
Pregel-style computation lowers to when expressed in DataFrames.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark_eks_spark.catalog import load_table
from etl_spark_eks_spark.registry import query

_PR_ITERS = 3
_PR_DAMP = 0.85


def _pr_iter_sql(prev: str, out: str) -> str:
    """One DuckDB PageRank round: shares (ROUND(r/deg, 15), per-row
    IEEE-deterministic) summed per destination in DECIMAL(38,18)
    (exact + associative, so DuckDB's sequential order and Spark's
    partial-agg tree produce the identical decimal)."""
    return f"""
    {out} AS (
      SELECT d.node, d.deg,
             ROUND(0.15 / n.n + {_PR_DAMP} * CAST(SUM(CAST(
                     ROUND(p.r / p.deg, 15) AS DECIMAL(38,18)))
                   AS DOUBLE), 15) AS r
      FROM edges e
      JOIN {prev} p ON e.src = p.node
      JOIN deg d ON e.dst = d.node
      CROSS JOIN n
      GROUP BY d.node, d.deg, n.n
    )"""


@query(
    "q_c61_pagerank",
    oracle=f"""
    WITH edges0 AS (
      SELECT DISTINCT 'S' || CAST(l_suppkey AS VARCHAR) AS src,
                      'C' || CAST(o_custkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT src, dst FROM edges0
      UNION ALL
      SELECT dst AS src, src AS dst FROM edges0
    ),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
    n AS (SELECT COUNT(*) AS n FROM deg),
    r0 AS (
      SELECT node, deg, ROUND(1.0 / n.n, 15) AS r FROM deg CROSS JOIN n
    ),
    {_pr_iter_sql("r0", "r1")},
    {_pr_iter_sql("r1", "r2")},
    {_pr_iter_sql("r2", "r3")}
    SELECT node, CAST(deg AS BIGINT) AS degree,
           ROUND(r * n.n, 6) AS rank_rel
    FROM r3 CROSS JOIN n
    ORDER BY rank_rel DESC, node LIMIT 20
    """,
)
def q_c61_pagerank(spark, sf_dir):
    """C61 (extension): PageRank (3 damped iterations, d=0.85) over
    the supply network — the undirected supplier<->customer graph
    induced by lineitem⋈orders ("who trades with whom"), reporting
    the 20 most central participants with rank relative to uniform
    (rank_rel = r * n: 1.0 = average). The fixed-iteration numeric
    propagation shape (influence scoring, trust rank, citation
    weighting over a shared-chunk graph like C37's) that complements
    C18's iterate-to-fixpoint label propagation. Undirected edges
    (each pair materialized both ways) keep every node's out-degree
    >= 1, so there are no dangling nodes and rank mass is conserved
    without a redistribution term.

    Scale: per iteration the rank table is n_nodes rows (node, deg,
    r) — broadcast-sized long past this fixture (16k nodes at sf0.1;
    still MBs at thousands of times that), so the edges⋈ranks join
    broadcasts and EDGES NEVER SHUFFLE; the only exchange per round
    is the map-side-combined groupBy(dst). Edges and deg are
    computed once and persisted across rounds (the C18 lesson:
    without it each round's plan re-derives the join from parquet).
    When the node table outgrows broadcast, the same loop runs with
    edges pre-partitioned by src and ranks co-partitioned — one
    plan-shape change, documented not silent.

    Float discipline: shares ROUND(r/deg, 15) are per-row IEEE ops
    on identical inputs; per-destination sums accumulate in
    DECIMAL(38,18) (exact, associative — functions/exact.py); the
    damping update is per-row double arithmetic. Every intermediate
    is therefore bit-identical cross-engine, so even the ORDER BY on
    the double rank is deterministic (ties then break on node)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    half = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = (
        half.unionAll(
            half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        # Bound the materialized partition count: the persisted edge
        # RDD's partitioning is frozen (AQE cannot re-coalesce a cached
        # plan), so without this every iteration stage inherits the
        # static shuffle-partition default — measured 41 s -> ~3 s at
        # sf0.01 from this line alone. At real scale the number scales
        # with |edges|; src-hash partitioning also co-locates each
        # node's out-edges for the share join.
        # Lazy checkpoints (round 12): deg.count() below is the first
        # action, so edges AND deg materialize inside that one job
        # instead of two dedicated checkpoint jobs — same frozen
        # 16-partition layout, same plan-growth truncation (the
        # LogicalRDD wrap happens at checkpoint call, eager or not).
        .repartition(16, "src")
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.groupBy("src")
        .agg(F.count("*").alias("deg"))
        .withColumnRenamed("src", "node")
        .localCheckpoint(eager=False)
    )
    n_nodes = deg.count()
    # Round 13: attach the DESTINATION degree to the edge table once
    # (broadcast join over the node-sized deg; lazy checkpoint rides
    # round 0's aggregate), so each round's groupBy(dst) carries deg
    # as a constant-per-group MIN instead of paying a broadcast(deg)
    # join — one fewer broadcast-build job per round (3 total), same
    # values by construction (every deg long rides unchanged).
    edged = edges.join(
        F.broadcast(
            deg.select(F.col("node").alias("dst"), F.col("deg").alias("ddeg"))
        ),
        "dst",
    ).localCheckpoint(eager=False)
    ranks = deg.withColumn("r", F.round(F.lit(1.0) / n_nodes, 15))
    for it in range(_PR_ITERS):
        shares = ranks.select(
            "node", F.round(F.col("r") / F.col("deg"), 15).alias("share")
        )
        ranks = (
            edged.join(F.broadcast(shares), edged.src == shares.node)
            .groupBy("dst")
            .agg(
                F.sum(F.col("share").cast("decimal(38,18)"))
                .cast("double")
                .alias("in_sum"),
                F.min("ddeg").alias("deg"),
            )
            .select(
                F.col("dst").alias("node"),
                "deg",
                F.round(
                    0.15 / n_nodes + _PR_DAMP * F.col("in_sum"), 15
                ).alias("r"),
            )
        )
        # Seal each non-final round (C18's idiom): the next round's
        # broadcast of `shares` otherwise re-executes every prior
        # round's join+agg — O(iters^2) work and a lineage that
        # deepens per round. The checkpointed table is n_nodes rows.
        # Lazy (round 12): the seal still truncates the plan at
        # checkpoint call, but each round's rows now materialize
        # inside the NEXT round's broadcast build (computed once,
        # cached at first touch) rather than in a dedicated per-round
        # job — the whole 3-round propagation runs in the consumer's
        # single action. The FINAL round stays declarative: its
        # upstream is the sealed previous table, keeping the
        # broadcast-join + single-exchange shape visible to plan
        # tests (and to AQE).
        if it < _PR_ITERS - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return (
        ranks.select(
            "node",
            F.col("deg").cast("long").alias("degree"),
            F.round(F.col("r") * n_nodes, 6).alias("rank_rel"),
        )
        .orderBy(F.col("rank_rel").desc(), "node")
        .limit(20)
    )
