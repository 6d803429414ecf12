"""Window functions (SURVEY §2 B26-B31).

Every window here partitions by a key (customer/user) — at 100 TB that
means one shuffle on the partition key and per-partition sorting, never
a global sort. Unpartitioned windows (a known scale anti-pattern: all
rows to one task) are deliberately absent.

Determinism: every ORDER BY carries a unique tie-break column so
row_number/rank/frames are reproducible and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_spark_eks_spark.catalog import load_table
from etl_spark_eks_spark.registry import query


@query(
    "q_b26_ranking",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_b26_ranking(spark, sf_dir):
    """B26: row_number / rank / dense_rank per customer by price."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "q_b27_topn_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def q_b27_topn_per_group(spark, sf_dir):
    """B27: top-3 orders per customer — rank-filter; Spark pushes the
    rank predicate into the window (WindowGroupLimit) so each partition
    keeps only 3 rows during the sort."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "q_b28_lag_lead",
    oracle="""
    SELECT user_id, event_id, ts,
           LAG(event_id)  OVER w AS prev_event_id,
           LEAD(event_id) OVER w AS next_event_id,
           date_diff('second', LAG(ts) OVER w, ts) AS gap_sec
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_b28_lag_lead(spark, sf_dir):
    """B28: lag/lead over each user's event timeline + inter-event gap.

    Gap is computed on whole seconds via epoch longs (integer math —
    identical in both engines; interval subtraction dialects differ).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    # DuckDB date_diff('second', a, b) counts whole-second boundary
    # crossings = epoch_second(b) - epoch_second(a) on truncated seconds.
    gap = F.unix_timestamp(F.date_trunc("second", F.col("ts"))) - F.unix_timestamp(
        F.date_trunc("second", prev_ts)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        gap.alias("gap_sec"),
    )


@query(
    "q_b29_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_spend
    FROM orders
    """,
)
def q_b29_running_sum(spark, sf_dir):
    """B29: running sum per customer over order history."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 6).alias("running_spend"),
    )


@query(
    "q_b30_sliding_avg",
    oracle="""
    SELECT user_id, event_id, ts,
           ROUND(AVG(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS value_ma3
    FROM events
    """,
)
def q_b30_sliding_avg(spark, sf_dir):
    """B30: 3-row sliding average of event values per user."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.avg("value").over(w), 6).alias("value_ma3"),
    )


@query(
    "q_b31_ntile",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_b31_ntile(spark, sf_dir):
    """B31: ntile quartiles + percent_rank within order status."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@query(
    "q_b64_window_navigation",
    oracle="""
    SELECT user_id, event_id, ts,
           FIRST_VALUE(value) OVER w AS first_val,
           LAST_VALUE(value) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND UNBOUNDED FOLLOWING)
             AS last_val,
           NTH_VALUE(value, 2) OVER w AS second_val,
           ROUND(CUME_DIST() OVER w, 6) AS cd
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_b64_window_navigation(spark, sf_dir):
    """B64: window navigation — first/last/nth value and cume_dist per
    user's time-ordered event stream (session entry value, latest
    value, second touch, position quantile).

    The frame matters and is explicit on both sides: with the default
    RANGE frame `last_value` sees only rows up to CURRENT ROW, so the
    whole-partition navigation requires UNBOUNDED PRECEDING..UNBOUNDED
    FOLLOWING; `first_value`/`nth_value` are frame-insensitive here
    because the defaults already include the partition head. Same
    single shuffle on user_id as every other window in this module —
    all four functions share one Window spec pair, so Spark computes
    them in one pass."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w_full).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "q_b70_range_frame",
    oracle="""
    SELECT user_id, event_id, ts,
           COUNT(*) OVER w AS n_trailing_1h,
           ROUND(SUM(value) OVER w, 6) AS value_trailing_1h
    FROM (SELECT user_id, event_id, ts, value,
                 CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def q_b70_range_frame(spark, sf_dir):
    """B70: event-time RANGE frame — trailing 1-hour count and sum of
    ``value`` per user at every event. The frame is defined by a VALUE
    distance on the ordering key (all events within 3600 s before this
    one), not a row count — the semantics ROWS frames (B29/B30) cannot
    express when events arrive irregularly. This is the per-event
    rolling-feature query of an online feature store (activity in the
    last hour at each interaction).

    The ordering key is whole epoch seconds (timestamp->long cast =
    floor), computed identically in DuckDB via FLOOR(epoch(ts)) — an
    integer key sidesteps the engines' sub-second precision divergence
    (parquet ns: Spark truncates to µs, DuckDB keeps ns), and RANGE
    frames include all peer rows of equal key, so tie order within a
    second cannot change the result.

    Scale: one shuffle on user_id + per-partition sort — identical cost
    shape to every other window here; the frame bounds advance
    monotonically through the sorted partition (each row extends the
    trailing edge and drops expired rows — amortized O(1) per row). No
    state beyond the frame's rows is held; skewed users bound the
    frame by time, not corpus size."""
    ev = load_table(spark, sf_dir, "events")
    # ts arrives as TIMESTAMP_NTZ (fixture is timestamp[us], no tz) which
    # cannot cast straight to BIGINT; the session tz is pinned UTC so the
    # NTZ->TIMESTAMP->epoch-seconds route preserves the wall clock exactly.
    sec = F.col("ts").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.count("*").over(w).alias("n_trailing_1h"),
        F.round(F.sum("value").over(w), 6).alias("value_trailing_1h"),
    )


@query(
    "q_b105_running_distinct",
    oracle="""
    SELECT event_id, user_id, ts,
           COUNT(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS distinct_types_so_far
    FROM events WHERE user_id < 100
    """,
)
def q_b105_running_distinct(spark, sf_dir):
    """B105: running DISTINCT count over a window — per user, how many
    distinct event_types have been seen up to each event (the
    engagement-breadth curve; also the streaming-state shape behind
    'alert when a session touches its Nth surface'). Spark does not
    support DISTINCT aggregates in window frames, so this is the
    canonical REWRITE: flag each (user, type)'s FIRST occurrence with
    one row_number, then running-SUM the flags — algebraically equal
    to the distinct count because each type contributes exactly once,
    at its first row. The oracle deliberately uses DuckDB's NATIVE
    windowed COUNT(DISTINCT ...) — the equivalence of the rewrite is
    the thing being checked, not one engine against itself.

    Scale: both windows partition by user_id (the flag window
    sub-partitions by type — same exchange, finer sort key), so the
    corpus shuffles once; per-row state is one boolean, never a
    per-frame distinct set — which is also why the rewrite BEATS a
    native distinct frame at scale: a frame-local distinct re-scans
    the frame per row (O(n^2) per user), the flag-sum is O(n log n)
    sort + linear scan. Ordering tie-breaks on event_id so
    first-occurrence attribution is deterministic."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 100)
        .select("event_id", "user_id", "event_type", "ts")
    )
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        e.withColumn(
            "is_first",
            (F.row_number().over(w_first) == 1).cast("long"),
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            F.sum("is_first").over(w_run).alias("distinct_types_so_far"),
        )
    )


@query(
    "q_b156_named_window_clause",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_before,
           ROUND(SUM(o_totalprice) OVER w, 2) AS spend_before,
           ROUND(AVG(o_totalprice) OVER w3, 6) AS avg3
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey),
           w3 AS (PARTITION BY o_custkey ORDER BY o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def q_b156_named_window_clause(spark, sf_dir):
    """B156: named WINDOW clause — the SQL-text surface for SHARING a
    window specification across expressions (`WINDOW w AS (...)`,
    one definition, many OVER references; Spark requires
    re-framed variants as sibling definitions in the same clause —
    ANSI's `OVER (w ROWS ...)` inline extension is not in its
    grammar, a documented dialect edge). The DataFrame API has had this since day one (one Window
    object, many .over() calls — B26/B29 use it); arriving TEXT SQL
    (the B121/B133/B134 gateway story) writes it this way, and
    restating a 4-line spec per expression is the copy-paste-drift
    bug the clause exists to prevent. The oracle runs the LITERAL
    same text (DuckDB implements the identical ANSI clause).

    Plan payload: all four functions resolve to the SAME window spec,
    so Catalyst computes them in ONE Window node — one sort, one
    pass; avg3's sibling window shares the partitioning/sort, so its
    second Window node rides the SAME exchange (no extra shuffle). At
    100 TB that is the difference between one shuffle and four.

    Float discipline: running sums of doubles ROUND 2 (cents-exact
    inputs), the 3-row average ROUND 6 — both associative-safe inside
    one partition's ordered frame."""
    from etl_spark_eks_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER w AS LONG) AS rn,
               COUNT(*) OVER w AS n_before,
               ROUND(SUM(o_totalprice) OVER w, 2) AS spend_before,
               ROUND(AVG(o_totalprice) OVER w3, 6) AS avg3
        FROM orders
        WHERE o_custkey < 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey),
               w3 AS (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """
    )
