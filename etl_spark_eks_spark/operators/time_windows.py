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


@query(
    "q_b83_event_gap_detection",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    observed AS (
      SELECT DISTINCT event_type, date_trunc('hour', ts) AS hour
      FROM events
    )
    SELECT t.event_type, s.hour
    FROM types t CROSS JOIN spine s
    WHERE NOT EXISTS (
      SELECT 1 FROM observed o
      WHERE o.event_type = t.event_type AND o.hour = s.hour
    )
    """,
)
def q_b83_event_gap_detection(spark, sf_dir):
    """B83: feed-gap detection against a generated date spine — which
    (event_type, hour) slots inside the feed's own time range produced
    ZERO events. Windowed aggregation (B45) can only describe hours
    that exist; a silent upstream outage is exactly the hours that
    don't, and this is the monitoring query the reference's SQS-driven
    ingest (eventsource-sqs.yaml:13-20) needs to notice a stalled
    queue.

    Shape: 1-row min/max agg -> `explode(sequence(lo, hi, 1 hour))`
    builds the spine (bounded by the time range, never by the data),
    cross-joined with the distinct type dim, then a broadcast LEFT
    ANTI against the observed (type, hour) pairs.

    Scale: the corpus is touched twice, both narrow column-pruned
    passes (min/max of ts; distinct of (type, trunc(ts))) with
    map-side partials; everything after is spine-sized
    (types x hours), which is broadcastable at any corpus size."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("hour")
    )
    types = e.select("event_type").distinct()
    observed = e.select(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).distinct()
    return types.crossJoin(spine).join(
        observed, ["event_type", "hour"], "left_anti"
    )


@query(
    "q_b85_funnel_analysis",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
    UNION ALL SELECT '2_click', COUNT(*) FROM c
    UNION ALL SELECT '3_purchase', COUNT(*) FROM p
    """,
)
def q_b85_funnel_analysis(spark, sf_dir):
    """B85: funnel analysis — ordered event-sequence progression
    (first view -> first click AFTER it -> first purchase after that)
    counted per stage. The ORDER constraint is what plain per-type
    counts can't express: a click before any view must not advance the
    funnel. This is the conversion query every event feed (the
    reference's SQS ingest) ultimately exists to answer.

    Shape: each stage is a map-side-combined MIN agg over a
    type-filtered scan, joined to the previous stage's per-user
    frontier on user_id — every join and agg keys on user_id, so at
    cluster scale AQE reuses one co-partitioning across all three
    stages instead of re-shuffling (the cascade narrows monotonically:
    stage n+1's input is a semi-filtered subset of stage n's users).
    The final result is three 1-row counts unioned — driver-sized."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def staged(df, label):
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(label).alias("stage"), "n_users"
        )

    return (
        staged(v, "1_view")
        .unionByName(staged(c, "2_click"))
        .unionByName(staged(p, "3_purchase"))
    )


@query(
    "q_c65_scd2_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn_type
      FROM events WHERE user_id < 200
    ),
    runs AS (
      SELECT user_id, event_type, MIN(ts) AS valid_from
      FROM ordered GROUP BY user_id, event_type, rn - rn_type
    ),
    hist AS (
      SELECT user_id, event_type, valid_from,
             LEAD(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY valid_from) AS valid_to
      FROM runs
    )
    SELECT user_id, event_type, valid_from, valid_to,
           (valid_to IS NULL) AS is_current
    FROM hist
    """,
)
def q_c65_scd2_history(spark, sf_dir):
    """C65 (extension): SCD Type-2 history build — collapse each
    user's event stream into attribute-validity intervals: one row per
    RUN of consecutive identical event_types, with valid_from /
    valid_to half-open bounds and an is_current flag on the open run.
    This is the other half of the lakehouse upsert story: B87's MERGE
    keeps only the latest value (SCD-1); the dimension table that can
    answer "what was this user doing AS OF last Tuesday" needs the
    interval form, and building it from an append-only event log is
    exactly this query. The run-collapse is the gaps-and-islands
    identity (rn − rn_per_type is constant within a run — same device
    as B47's batch sessionization but keyed on value change, not time
    gap), then one LEAD closes each interval with the next run's
    start.

    Scale: both row_numbers, the run aggregation, and the LEAD all
    partition by user_id, so the corpus shuffles ONCE on user and
    every later step reuses that partitioning with local sorts; state
    per user is its run list, never the raw events. Ordering
    tie-breaks on event_id, making run assignment — hence the whole
    history — deterministic under equal timestamps. The user_id < 200
    slice keeps the oracle's verify cost bounded; the plan is
    slice-independent."""
    from pyspark.sql import Window

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 200)
        .select("user_id", "event_type", "ts", "event_id")
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    runs = (
        e.withColumn("grp", F.row_number().over(w_all) - F.row_number().over(w_type))
        .groupBy("user_id", "event_type", "grp")
        .agg(F.min("ts").alias("valid_from"))
    )
    w_hist = Window.partitionBy("user_id").orderBy("valid_from")
    return runs.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_hist).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


@query(
    "q_c66_feed_anomaly_zscore",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             COUNT(*) AS n_events
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    stats AS (
      SELECT event_type,
             COUNT(*) AS n_days,
             CAST(SUM(n_events) AS BIGINT) AS s1,
             CAST(SUM(n_events * n_events) AS BIGINT) AS s2
      FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.day, CAST(d.n_events AS BIGINT) AS n_events,
           (d.n_events - CAST(s1 AS DOUBLE) / n_days)
             / sqrt(CAST(n_days * s2 - s1 * s1 AS DOUBLE)
                    / (CAST(n_days AS DOUBLE) * n_days)) AS zscore,
           abs((d.n_events - CAST(s1 AS DOUBLE) / n_days)
             / sqrt(CAST(n_days * s2 - s1 * s1 AS DOUBLE)
                    / (CAST(n_days AS DOUBLE) * n_days))) > 2.0
             AS anomalous
    FROM daily d JOIN stats USING (event_type)
    WHERE n_days * s2 > s1 * s1
    """,
)
def q_c66_feed_anomaly_zscore(spark, sf_dir):
    """C66 (extension): feed-volume anomaly detection — per
    (event_type, day) ingest counts z-scored against that type's own
    daily distribution, days with |z| > 2 flagged. The monitoring
    query that catches what B83's gap detector cannot: a feed that
    never stops but silently halves (or a retry storm that doubles
    it) produces no empty hour, only an anomalous count.

    Numeric contract — deliberately NOT the stddev builtin: both
    engines' stddev aggregates use different single-pass algorithms
    whose last-ulp disagreement would sit exactly where ROUND can
    flip. Instead the z-score is derived from exact integer moments
    (n, Σc, Σc² — bigint sums of bigint counts), so every double in
    the expression comes from the same integer inputs through IEEE
    basic ops (divide, sqrt — both correctly rounded by the
    standard), making the result BIT-identical cross-engine with no
    rounding guard at all. Population variance in the exact form
    (n·Σc² − (Σc)²)/n²; zero-variance types are excluded by the
    integer predicate n·Σc² > (Σc)².

    Scale: one (type, day) map-side-combined shuffle over the raw
    events, then a types-sized stats agg broadcast back onto the
    daily table — the audit is two small exchanges past the scan at
    any corpus size."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n_events"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("n_events").cast("long").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("long").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_days")
    var = (F.col("n_days") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
        "double"
    ) / (F.col("n_days").cast("double") * F.col("n_days"))
    z = (F.col("n_events") - mean) / F.sqrt(var)
    return (
        daily.join(F.broadcast(stats), "event_type")
        .filter(
            F.col("n_days") * F.col("s2") > F.col("s1") * F.col("s1")
        )
        .select(
            "event_type",
            "day",
            F.col("n_events").cast("long").alias("n_events"),
            z.alias("zscore"),
            (F.abs(z) > 2.0).alias("anomalous"),
        )
    )


@query(
    "q_b116_event_sequence_match",
    oracle="""
    WITH seqs AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY date_trunc('milliseconds', ts), event_id)
                   AS seq
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           seq,
           CAST(LENGTH(seq) AS BIGINT) AS n_events,
           CAST(LENGTH(seq) - LENGTH(REPLACE(seq, 'e', '')) AS BIGINT)
               AS n_errors,
           (LENGTH(seq) - LENGTH(REPLACE(seq, 'vp', ''))) / 2
               AS n_direct_vp,
           regexp_matches(seq, 'v[^e]*c[^e]*p') AS has_clean_conversion
    FROM seqs
    ORDER BY user_id
    """,
)
def q_b116_event_sequence_match(spark, sf_dir):
    """B116: ordered event-SEQUENCE pattern matching — the
    MATCH_RECOGNIZE / complex-event-processing analogue Spark has no
    native operator for. Each user's event history becomes a compact
    symbol string (one initial per event type, totally ordered by
    (epoch-ms, event_id) — the fixture's five types have distinct
    initials), and sequence questions become string/regex questions:
    did a view lead to a click lead to a purchase with no error
    between them ('v[^e]*c[^e]*p'), how many immediate view→purchase
    adjacencies ('vp' literal count via the replace-length identity,
    whose left-to-right non-overlap semantics are identical across
    engines). B85's funnel counts stage arrivals; this keeps the whole
    ordered trace, so any regular-language pattern is one expression
    away. The full symbol string is a returned column — the value hash
    therefore pins the exact total order, not just derived counts.

    The regex is deliberately alternation-free and anchored by
    existence (regexp_matches), where Java regex and RE2 agree;
    counting under greedy backtracking vs RE2 automata is the
    documented dialect hazard this query's design avoids.

    Scale: one shuffle on user_id; collect_list holds one user's
    events (the per-entity-trace invariant every CEP engine shares —
    a 10M-event single user needs B63's salting or a time-sliced
    pre-fold first, documented not silent). The sort is per-group
    array_sort, never a global orderBy; the ms tie-break + event_id
    makes the symbol string deterministic at both engines' timestamp
    precisions (events.ts is ns in parquet, µs in Spark — ms + id is
    stable under both truncations; date_trunc not unix_micros because
    the fixture loads as TIMESTAMP_NTZ, which unix_* refuses)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.date_trunc("millisecond", "ts").alias("ms"),
        F.substring("event_type", 1, 1).alias("ini"),
    )
    seqs = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ms", "event_id", "ini"))),
                lambda x: x["ini"],
            ),
        ).alias("seq")
    )
    return (
        seqs.select(
            "user_id",
            "seq",
            F.length("seq").cast("long").alias("n_events"),
            (F.length("seq") - F.length(F.regexp_replace("seq", "e", "")))
            .cast("long")
            .alias("n_errors"),
            (
                (F.length("seq") - F.length(F.regexp_replace("seq", "vp", "")))
                / 2
            ).alias("n_direct_vp"),
            F.col("seq").rlike("v[^e]*c[^e]*p").alias("has_clean_conversion"),
        )
        .orderBy("user_id")
    )


@query(
    "q_b130_interval_arithmetic",
    oracle="""
    SELECT event_type,
           CAST(MIN(ts + 36 * INTERVAL 1 HOUR) AS VARCHAR) AS min_sla_ts,
           CAST(MAX(date_trunc('day', ts) + INTERVAL 1 MONTH
                    - INTERVAL 3 DAY) AS VARCHAR) AS max_billing_ts,
           CAST(MAX(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts))
                AS BIGINT) AS max_age_days
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_b130_interval_arithmetic(spark, sf_dir):
    """B130: ANSI interval arithmetic — ``timestamp_add``, mixed
    month/day interval composition via ``make_interval`` (calendar
    months do NOT commute with fixed-length durations, which is why
    they are distinct interval classes), ``date_trunc``, and
    ``timestamp_diff`` day ages. The retention/SLA/billing-cutoff
    arithmetic every event pipeline ships; timestamps compare as
    strings so the oracle pins the exact calendar result, not an
    epoch approximation.

    Scale: all per-row codegen expressions folded into one keys-sized
    aggregate."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.timestamp_add("HOUR", F.lit(36), F.col("ts")).alias("sla_ts"),
            (
                F.date_trunc("day", F.col("ts"))
                + F.make_interval(months=F.lit(1))
                - F.make_interval(days=F.lit(3))
            ).alias("billing_ts"),
            F.timestamp_diff(
                "DAY",
                F.to_timestamp(F.lit("2024-01-01 00:00:00")),
                F.col("ts"),
            ).alias("age_days"),
        )
        .groupBy("event_type")
        .agg(
            F.min("sla_ts").cast("string").alias("min_sla_ts"),
            F.max("billing_ts").cast("string").alias("max_billing_ts"),
            F.max("age_days").cast("bigint").alias("max_age_days"),
        )
        .orderBy("event_type")
    )


@query(
    "q_b148_dynamic_session_gap",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'click'
                  THEN INTERVAL '30 minutes'
                  ELSE INTERVAL '10 minutes' END AS gap
      FROM events
    ),
    m AS (
      SELECT user_id, ts, gap,
             MAX(ts + gap) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS horizon
      FROM e
    ),
    s AS (
      SELECT user_id, ts, gap,
             SUM(CASE WHEN horizon IS NULL OR ts >= horizon
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, gap
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM m
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts + gap) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def q_b148_dynamic_session_gap(spark, sf_dir):
    """B148: session windows with a PER-EVENT dynamic gap —
    `session_window(ts, gap_expr)` where the timeout depends on the
    event itself (clicks hold a session open 30 minutes, everything
    else 10). B47/B98 use the fixed-gap form; the dynamic form is
    what real engagement models need (a purchase keeps the session
    alive longer than a passive view) and is a genuinely different
    merge rule: each event contributes its own interval
    [ts, ts + gap(event)) and overlapping intervals fuse, so the
    session's END is max(ts + gap) over members — not last_ts + G.

    The oracle reproduces the interval-merge relationally: running
    MAX(ts + gap) over prior events is the session horizon, an event
    at or past the horizon starts a new session (end-exclusive, the
    session_window contract), and gaps-and-islands does the rest —
    which independently pins Spark's documented semantics rather
    than trusting them.

    Scale: one shuffle on user_id (session assembly is per-key local
    work, same as B47); the gap expression is a per-row projection.
    In streaming the identical expression drives state eviction —
    dynamic gaps change watermark retention per event class."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.when(
            F.col("event_type") == "click", F.lit("30 minutes")
        )
        .otherwise(F.lit("10 minutes"))
        .alias("gap"),
    )
    return (
        e.groupBy(
            "user_id", F.session_window("ts", F.col("gap")).alias("w")
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "q_b149_calendar_gap_fill",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
      FROM orders GROUP BY prio, d
    ),
    bounds AS (
      SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
             CAST(MAX(o_orderdate) AS DATE) AS hi FROM orders
    ),
    spine AS (
      SELECT p.prio, b.lo + CAST(r.i AS INT) AS d
      FROM (SELECT DISTINCT o_orderpriority AS prio FROM orders) p,
           bounds b,
           UNNEST(range(0, date_diff('day', b.lo, b.hi) + 1)) AS r(i)
    ),
    joined AS (
      SELECT s.prio, s.d,
             COALESCE(dl.n_orders, 0) AS n_orders,
             dl.rev
      FROM spine s LEFT JOIN daily dl
        ON dl.prio = s.prio AND dl.d = s.d
    )
    SELECT prio, strftime(d, '%Y-%m-%d') AS day, n_orders,
           ROUND(CAST(last_value(rev IGNORE NULLS)
                        OVER (PARTITION BY prio ORDER BY d
                              ROWS UNBOUNDED PRECEDING)
                      AS DOUBLE), 4) AS carried_rev
    FROM joined
    ORDER BY prio, day
    """,
)
def q_b149_calendar_gap_fill(spark, sf_dir):
    """B149: calendar DENSIFICATION + carry-forward gap fill — the
    sparse-to-dense time-series transform every daily dashboard and
    feature pipeline needs: a per-key date spine (`sequence` between
    the table's date bounds, exploded) left-joined to the actual
    daily rollup, zero-filled counts, and the last known revenue
    CARRIED FORWARD across empty days via `last(col,
    ignorenulls=True)` over an unbounded-preceding window. B83's
    spine DETECTS gaps; this materializes the dense series a
    downstream consumer can difference/window without re-deriving
    the calendar.

    Shape: the spine is |keys| x |days| rows built from a 1-row
    bounds aggregate (broadcast) — it never touches the fact table;
    one equi-join (prio, date) against the daily rollup; one per-key
    ordered window for the fill. At 100 TB the spine stays tiny
    (days x keys), the rollup is the only corpus-sized agg, and the
    fill window is keyed — no global step. DECIMAL(38,6) revenue
    accumulation, one edge round; counts zero-fill exactly."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev"),
    )
    bounds = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    spine = (
        o.select(F.col("o_orderpriority").alias("prio"))
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "prio",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
            ).alias("d"),
        )
    )
    joined = spine.join(daily, ["prio", "d"], "left").select(
        "prio",
        "d",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        "rev",
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("prio")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the day is emitted as a STRING: bare DATE cells cannot
    # hash-match through the driver's pandas path (DuckDB fetchdf
    # widens DATE to Timestamp, isoformat gains T00:00:00)
    return joined.select(
        "prio",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_orders",
        F.round(
            F.last("rev", ignorenulls=True).over(w).cast("double"), 4
        ).alias("carried_rev"),
    ).orderBy("prio", "day")
