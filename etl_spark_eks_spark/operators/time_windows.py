"""Time-window aggregations (SURVEY §2 B45-B47) in their batch form —
the same F.window/F.session_window expressions run unchanged under
readStream (see operators/stream_queries.py), which is the point:
one definition serves both the batch and the event-driven path.

Scale: window aggregation shuffles on (key, window bucket) with
map-side partial aggregation; session windows shuffle on user key then
sort locally — no global ordering anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark_eks_spark.catalog import load_table
from etl_spark_eks_spark.functions.exact import dsum
from etl_spark_eks_spark.registry import query


@query(
    "q_b45_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS win_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_b45_tumbling(spark, sf_dir):
    """B45: 1-hour tumbling windows over the event stream (batch form)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "q_b46_sliding",
    oracle="""
    SELECT time_bucket(INTERVAL '30 minutes', ts)
             - off.o * INTERVAL '30 minutes' AS win_start,
           time_bucket(INTERVAL '30 minutes', ts)
             - off.o * INTERVAL '30 minutes' + INTERVAL '1 hour' AS win_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events, (SELECT unnest([0, 1]) AS o) off
    GROUP BY 1, 2
    """,
)
def q_b46_sliding(spark, sf_dir):
    """B46: 1-hour windows sliding every 30 minutes — each event lands in
    exactly 2 windows (oracle materializes both via an offset unnest)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "q_b47_session",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM seq
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def q_b47_session(spark, sf_dir):
    """B47: session windows with a 30-minute inactivity gap per user.

    Spark semantics: a session is [first_ts, last_ts + gap); an event at
    exactly last_ts + gap starts a NEW session — hence the oracle's
    ``>= INTERVAL '30 minutes'`` island break (gaps-and-islands SQL).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
