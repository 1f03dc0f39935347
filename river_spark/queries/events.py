"""Event-stream analytics: the batch analogs of the streaming surface
(tumbling windows, sessionization, ordered dedup, tail/seek), plus the
join types Spark lacks as built-ins (range join, as-of join).

events.ts is TIMESTAMP on both engines (tables.events_tbl normalizes the
legacy INT64-nanos layout too) — predicates use native timestamp/interval
arithmetic so the same instants are compared on both sides.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from river_spark.operators.asof import asof_join
from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl, r2


@q(
    "ev_tumbling_window",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("events", "window_agg"),
    bench=True,
)
def ev_tumbling_window(spark, sf_dir):
    # Real Spark window() — the streaming-capable tumbling window; its
    # epoch-aligned 1h buckets coincide with date_trunc('hour').
    ev = events_tbl(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), r2(F.sum("value")).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@q(
    "ev_sessionize",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, event_id,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(event_id) AS first_event, max(event_id) AS last_event
    FROM numbered GROUP BY user_id, session_id
    """,
    tags=("events", "session"),
    bench=True,
)
def ev_sessionize(spark, sf_dir):
    """Gaps-and-islands sessionization (30 min inactivity gap) — the batch
    equivalent of session_window; single shuffle on user_id."""
    ev = events_tbl(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )


@q(
    "ev_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           round(value - lag(value) OVER w, 4) AS value_delta,
           lead(event_type) OVER w             AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("events", "window"),
)
def ev_lag_lead(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events_tbl(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("value_delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@q(
    "ev_dedup_ordered",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id
    FROM (SELECT user_id, event_type, event_id,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS rn
          FROM events) t
    WHERE rn = 1
    """,
    tags=("events", "dedup"),
)
def ev_dedup_ordered(spark, sf_dir):
    """Deterministic dropDuplicates: keep the earliest row per key.
    (Plain dropDuplicates keeps an arbitrary row — useless for parity.)"""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events_tbl(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event_id"))
    )


@q(
    "ev_tail",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 1
    """,
    tags=("events", "tail"),
)
def ev_tail(spark, sf_dir):
    """Tail/skip-to-latest (A6, cpp/src/reader.cpp:336-488) as a batch
    query: ORDER BY DESC LIMIT 1 → TakeOrderedAndProject."""
    return (
        events_tbl(spark, sf_dir)
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(1)
        .select("event_id", "user_id", "event_type")
    )


@q(
    "ev_seek",
    oracle="""
    SELECT count(*) AS n, min(event_id) AS first_id
    FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
    """,
    tags=("events", "seek"),
)
def ev_seek(spark, sf_dir):
    """Seek (A7, cpp/src/reader.cpp:507-583) as an offset predicate —
    pushed down to the parquet scan (string literal folds to the column's
    timestamp type, so the filter reaches PushedFilters)."""
    return (
        events_tbl(spark, sf_dir)
        .filter(F.col("ts") > "2024-01-15 00:00:00")
        .agg(F.count("*").alias("n"), F.min("event_id").alias("first_id"))
    )


@q(
    "ev_range_join",
    oracle="""
    SELECT count(*) AS n_pairs, CAST(count(DISTINCT a.event_id) AS BIGINT) AS n_views
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'view' AND b.event_type = 'purchase'
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    """,
    tags=("events", "range_join"),
)
def ev_range_join(spark, sf_dir):
    """Range join: purchase within 1h after a view by the same user.
    Equi-join on user_id carries the shuffle; the ts band is a post-filter,
    so this stays a hash join (no nested-loop blowup) at scale."""
    ev = events_tbl(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("ts").alias("view_ts"), F.col("event_id").alias("view_id")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("buy_ts")
    )
    pairs = views.join(
        buys,
        (views.u == buys.u2)
        & (buys.buy_ts > views.view_ts)
        & (buys.buy_ts <= views.view_ts + F.expr("INTERVAL 1 HOUR")),
    )
    return pairs.agg(
        F.count("*").alias("n_pairs"), F.countDistinct("view_id").alias("n_views")
    )


@q(
    "ev_asof_join",
    oracle="""
    SELECT p.event_id, c.event_id AS click_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("events", "asof_join"),
    bench=True,
)
def ev_asof_join(spark, sf_dir):
    """As-of join via the union+last_value operator (operators/asof.py):
    one shuffle on (user_id), no per-row subqueries."""
    ev = events_tbl(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"), F.col("user_id").alias("c_user_id"), F.col("ts").alias("c_ts")
    )
    joined = asof_join(
        purchases,
        clicks,
        left_on="user_id",
        right_on="c_user_id",
        left_ts="ts",
        right_ts="c_ts",
        right_cols=["click_event_id"],
    )
    return joined.select("event_id", "click_event_id")


@q(
    "ev_sliding_window",
    oracle="""
    WITH slid AS (
        SELECT date_trunc('hour', ts)
                 + (CAST(floor(extract(minute FROM ts) / 15) AS INT) - i) * INTERVAL 15 MINUTE
                 AS window_start,
               value
        FROM events, UNNEST(generate_series(0, 3)) AS g(i))
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM slid GROUP BY 1
    """,
    tags=("events", "window_agg", "sliding"),
)
def ev_sliding_window(spark, sf_dir):
    """Overlapping 1h windows sliding every 15 min — each event lands in 4
    windows (Spark's window(ts, '1 hour', '15 minutes') generator; the
    oracle expands the same membership arithmetic)."""
    ev = events_tbl(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"), r2(F.sum("value")).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "total_value",
        )
    )


@q(
    "ev_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS ts_view
        FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (
        SELECT e.user_id, min(e.ts) AS ts_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.ts_view
        GROUP BY e.user_id),
    p AS (
        SELECT e.user_id, min(e.ts) AS ts_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.ts_click
        GROUP BY e.user_id)
    SELECT v.user_id,
           strftime(v.ts_view, '%Y-%m-%d %H:%M:%S.%f') AS first_view,
           strftime(c.ts_click, '%Y-%m-%d %H:%M:%S.%f') AS first_click_after,
           strftime(p.ts_purchase, '%Y-%m-%d %H:%M:%S.%f') AS first_purchase_after,
           CASE WHEN p.user_id IS NOT NULL THEN 3
                WHEN c.user_id IS NOT NULL THEN 2
                ELSE 1 END AS funnel_depth
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON c.user_id = p.user_id
    """,
    tags=("events", "funnel"),
)
def ev_funnel(spark, sf_dir):
    """Ordered conversion funnel (view -> click -> purchase): per user,
    the first view, the first click strictly AFTER that view, and the
    first purchase strictly after that click — the sequential-pattern
    query every product-analytics engine ships (and the reference leaves
    to its consumers). Each stage is a per-user min over a filtered
    slice joined back to the previous stage's anchor: three partial-agg
    hash aggregations on the same user_id key, so AQE coalesces them
    into co-partitioned joins with no extra exchange. No window over
    raw events, no per-user arrays — state per stage is one row."""
    ev = events_tbl(spark, sf_dir).select("user_id", "event_type", "ts")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("ts_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("ts_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_purchase"))
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.date_format("ts_view", fmt).alias("first_view"),
            F.date_format("ts_click", fmt).alias("first_click_after"),
            F.date_format("ts_purchase", fmt).alias("first_purchase_after"),
            F.when(F.col("ts_purchase").isNotNull(), 3)
            .when(F.col("ts_click").isNotNull(), 2)
            .otherwise(1)
            .cast("int")
            .alias("funnel_depth"),
        )
    )


@q(
    "ev_cohort_retention",
    oracle="""
    WITH first AS (
        SELECT user_id, min(date_trunc('day', ts)) AS cohort
        FROM events GROUP BY user_id),
    act AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events)
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
           datediff('day', f.cohort, a.d) AS day_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM act a JOIN first f ON a.user_id = f.user_id
    GROUP BY f.cohort, day_offset
    """,
    tags=("events", "cohort"),
)
def ev_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each later active day as an offset from their cohort — the
    product-analytics staple behind every retention curve. Two per-user
    aggregations (first-seen min, distinct active days) meet in a
    co-partitioned user_id join; the output matrix is tiny (days x
    offsets), so the final count-distinct shuffle is bounded by the
    calendar, not the event volume."""
    ev = events_tbl(spark, sf_dir).select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("cohort"))
    act = ev.distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort",
            # long: DuckDB's datediff is BIGINT, Spark's is INT — match widths
            F.datediff(F.col("d"), F.col("cohort")).cast("long").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
            "n_users",
        )
    )


@q(
    "ev_gap_detect",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events)
    SELECT user_id,
           strftime(prev_ts, '%Y-%m-%d %H:%M:%S.%f') AS gap_start,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS gap_end,
           epoch_us(ts) - epoch_us(prev_ts) AS gap_us
    FROM seq
    WHERE prev_ts IS NOT NULL AND epoch_us(ts) - epoch_us(prev_ts) > 3600000000
    """,
    tags=("events", "gaps"),
)
def ev_gap_detect(spark, sf_dir):
    """Per-user silence gaps over one hour — the analytics twin of the
    transport's stale-stream detection (A17 auto-EOFs a quiet stream;
    this measures the quiet). One window over (user_id, ts) — the lag
    is computed inside the same sort the sessionizer family uses, no
    self-join. Ties on ts break by event_id so both engines pick the
    same predecessor; the gap is exact epoch-microsecond arithmetic
    (second-granular date_diff counts BOUNDARY CROSSINGS in DuckDB but
    truncated elapsed time in Spark — off by one around fractional
    seconds)."""
    ev = events_tbl(spark, sf_dir).select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    gaps = ev.withColumn("prev_ts", F.lag("ts").over(w))
    # NTZ-safe exact micros: timestampdiff at MICROSECOND granularity is
    # elapsed-time truncation-free (unix_micros rejects TIMESTAMP_NTZ)
    gap_us = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    return (
        gaps.where(F.col("prev_ts").isNotNull() & (gap_us > 3_600_000_000))
        .select(
            "user_id",
            F.date_format("prev_ts", fmt).alias("gap_start"),
            F.date_format("ts", fmt).alias("gap_end"),
            gap_us.alias("gap_us"),
        )
    )


@q(
    "ev_session_window_native",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts,
               -- event_id tie-break: with ORDER BY ts alone a duplicate
               -- timestamp could order a new_sess=0 row before its
               -- session's opener in the running sum and split what
               -- session_window always co-sessions
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, sid
    """,
    tags=("events", "session", "native"),
)
def ev_session_window_native(spark, sf_dir):
    """Spark's NATIVE session_window in batch mode, pinned against the
    hand-rolled gaps-and-islands formulation (the ev_sessionize oracle
    family): both must carve identical 30-minute-gap sessions. This
    pins the semantic equivalence that lets the streaming surface use
    session_window while batch parity checks use window functions —
    if Spark's merge semantics ever drift from the lag-based islands,
    this gate catches it."""
    ev = events_tbl(spark, sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            "n_events",
        )
    )


@q(
    "ev_markov_transitions",
    oracle="""
    WITH nxt AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events),
    cnt AS (
        SELECT from_type, to_type, count(*) AS n
        FROM nxt WHERE to_type IS NOT NULL
        GROUP BY 1, 2),
    tot AS (SELECT from_type, sum(n) AS row_n FROM cnt GROUP BY 1)
    SELECT cnt.from_type, cnt.to_type, cnt.n,
           cnt.n * 1.0 / tot.row_n AS p
    FROM cnt JOIN tot USING (from_type)
    """,
    tags=("events", "sequence"),
)
def ev_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix of the event stream: P(next
    type | type), transitions formed inside each user's ordered
    partition (one lead over one window — users never mix), then one
    hash aggregation; row totals come from a window over the
    |types|²-row count table, so the fact table is scanned and windowed
    exactly once. The |types|² output is scale-free — it never grows
    with event volume."""
    ev = events_tbl(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    cnt = nxt.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    # row totals as a window over the |types|^2-row count table — NOT a
    # re-aggregation joined back, which would recompute the lead window
    # over the fact table a second time (verified: the join form planned
    # two WindowExecs with no exchange reuse)
    row_n = F.sum("n").over(Window.partitionBy("from_type"))
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n") * 1.0 / row_n).alias("p"),
    )


@q(
    "ev_interval_merge",
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id,
               CAST(epoch_us(ts) AS BIGINT) AS s,
               CAST(epoch_us(ts) AS BIGINT)
                 + (1 + event_id % 7) * 60 * 1000000 AS e
        FROM events),
    flagged AS (
        SELECT user_id, event_id, s, e,
               CASE WHEN s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         OR max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                    THEN 1 ELSE 0 END AS new_island
        FROM iv),
    numbered AS (
        SELECT user_id, event_id, s, e,
               CAST(sum(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS island_id
        FROM flagged)
    SELECT user_id, island_id, CAST(count(*) AS BIGINT) AS n_events,
           min(event_id) AS first_event,
           CAST(max(e) - min(s) AS BIGINT) AS span_us
    FROM numbered GROUP BY user_id, island_id
    """,
    tags=("events", "intervals"),
)
def ev_interval_merge(spark, sf_dir):
    """Overlapping-interval coalescing (gaps-and-islands over
    variable-LENGTH intervals): each event spawns an interval
    [ts, ts + (1 + event_id % 7) minutes]; intervals on one user that
    overlap a RUNNING MAX of prior interval ends merge into one island.
    Distinct from ev_sessionize, which flags gaps between POINTS — here
    a long interval can bridge events whose start-to-start gap alone
    would split them, which is why the flag compares against max(end)
    over the preceding frame, not lag(end). Everything is epoch-µs long
    arithmetic (no timestamp-type arithmetic to drift cross-engine);
    one shuffle on user_id serves both windows and the final group."""
    ev = events_tbl(spark, sf_dir)
    # ts may be TIMESTAMP_NTZ (unix_micros requires TIMESTAMP); the cast
    # interprets the naive value in the session tz, which session.py pins
    # to UTC — exactly DuckDB's epoch_us semantics on the same naive value
    s = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.select(
        "user_id",
        "event_id",
        s.alias("s"),
        (s + (F.lit(1) + F.col("event_id") % 7) * 60 * 1_000_000).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    prior_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_island",
        F.when(prior_max_e.isNull() | (F.col("s") > prior_max_e), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "island_id",
        F.sum("new_island")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return numbered.groupBy("user_id", "island_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("event_id").alias("first_event"),
        (F.max("e") - F.min("s")).cast("long").alias("span_us"),
    )
