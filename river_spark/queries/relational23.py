"""Relational wave 23 (round 9): revenue-cohort curves, position-based
attribution, and duplicate-cluster survivorship.

Bit-exactness rules (tests/test_oracle.py): all outputs are exact
integers (cents, per-mille credits, counts) or deterministic strings
(sorted id lists, ISO week labels); cumulative sums run over
deterministically-ordered integer columns.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl, tbl


@q(
    "agg_cohort_ltv_curve",
    oracle="""
    WITH firstday AS (
        SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE)) AS cohort_day
        FROM events GROUP BY user_id),
    rev AS (
        SELECT f.user_id,
               strftime(date_trunc('week', f.cohort_day), '%Y-%m-%d') AS cohort_week,
               CAST(date_diff('day', f.cohort_day,
                              CAST(date_trunc('day', e.ts) AS DATE)) // 7 AS BIGINT)
                 AS age_week,
               CAST(round(e.value * 100) AS BIGINT) AS cents
        FROM events e JOIN firstday f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase'),
    wk AS (
        SELECT cohort_week, age_week,
               CAST(sum(cents) AS BIGINT) AS week_cents,
               count(DISTINCT user_id) AS n_buyers
        FROM rev GROUP BY 1, 2)
    SELECT cohort_week, age_week, week_cents, n_buyers,
           CAST(sum(week_cents) OVER (
               PARTITION BY cohort_week ORDER BY age_week) AS BIGINT)
             AS cum_cents
    FROM wk
    """,
    tags=("agg", "cohort", "ltv"),
)
def agg_cohort_ltv_curve(spark, sf_dir):
    """Cumulative revenue curve per signup cohort: users grouped by the
    week they first appeared, purchase revenue accumulated by weeks-
    since-signup — the LTV curve that decides payback windows, and the
    revenue-side complement of ev_cohort_retention. Cohort weeks label
    as strings (Monday-start in both engines); revenue is cents-integer
    and the cumulative sum runs over integers in deterministic
    age order.

    100 TB posture: first-touch agg by user, one broadcast-or-shuffle
    join back to purchases, a (cohort, age) rollup, and a window
    partitioned by cohort."""
    ev = events_tbl(spark, sf_dir)
    firstday = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts").cast("date")).alias("cohort_day")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    rev = p.join(firstday, "user_id").select(
        "user_id",
        F.date_format(F.date_trunc("week", "cohort_day"), "yyyy-MM-dd").alias(
            "cohort_week"
        ),
        F.expr(
            "datediff(cast(date_trunc('day', ts) as date), cohort_day) div 7"
        ).cast("bigint").alias("age_week"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    wk = rev.groupBy("cohort_week", "age_week").agg(
        F.sum("cents").alias("week_cents"),
        F.countDistinct("user_id").alias("n_buyers"),
    )
    return wk.select(
        "cohort_week",
        "age_week",
        "week_cents",
        "n_buyers",
        F.sum("week_cents")
        .over(Window.partitionBy("cohort_week").orderBy("age_week"))
        .alias("cum_cents"),
    )


_ATTR_WINDOW_DAYS = 7


@q(
    "ev_attribution_position_based",
    oracle=f"""
    WITH pc AS (
        SELECT p.event_id AS conv_id, c.event_id AS click_id,
               row_number() OVER (
                   PARTITION BY p.event_id ORDER BY c.ts, c.event_id) AS rk,
               count(*) OVER (PARTITION BY p.event_id) AS n
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND c.ts <= p.ts
         AND c.ts >= p.ts - INTERVAL {_ATTR_WINDOW_DAYS} DAY),
    credits AS (
        SELECT conv_id,
               CASE WHEN rk = 1 THEN 'first'
                    WHEN rk = n THEN 'last'
                    ELSE 'middle' END AS position,
               CASE WHEN n = 1 THEN 1000
                    WHEN n = 2 THEN 500
                    WHEN rk = 1 OR rk = n THEN 400
                    ELSE 200 // (n - 2) END AS credit_pm
        FROM pc)
    SELECT position,
           count(*) AS n_touches,
           CAST(sum(credit_pm) AS BIGINT) AS credit_pm_total,
           count(DISTINCT conv_id) AS n_conversions
    FROM credits GROUP BY position
    """,
    tags=("events", "attribution", "marketing"),
)
def ev_attribution_position_based(spark, sf_dir):
    """Position-based (U-shaped 40/20/40) attribution: each purchase
    credits its preceding 7-day click path 400 per-mille to the first
    touch, 400 to the last, and the remaining 200 split across middles
    (integer per-mille division; a lone click takes 1000, a 2-click
    path splits 500/500) — the standard multi-touch model next to the
    existing last-touch query. All credits are exact integers.

    100 TB posture: the path join keys on user_id with a time-range
    bound (state bounded by the 7-day window); the per-conversion rank
    window partitions by conversion id."""
    ev = events_tbl(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("p_uid"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_uid"),
        F.col("ts").alias("c_ts"),
    )
    pc = p.join(
        c,
        (F.col("p_uid") == F.col("c_uid"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"interval {_ATTR_WINDOW_DAYS} days")),
    )
    w = Window.partitionBy("conv_id")
    pc = pc.select(
        "conv_id",
        "click_id",
        F.row_number().over(w.orderBy("c_ts", "click_id")).alias("rk"),
        F.count("*").over(w).alias("n"),
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1000))
        .when(F.col("n") == 2, F.lit(500))
        .when((F.col("rk") == 1) | (F.col("rk") == F.col("n")), F.lit(400))
        .otherwise(F.expr("200 div (n - 2)"))
    )
    position = (
        F.when(F.col("rk") == 1, F.lit("first"))
        .when(F.col("rk") == F.col("n"), F.lit("last"))
        .otherwise(F.lit("middle"))
    )
    return pc.select(
        position.alias("position"), credit.alias("credit_pm"), "conv_id"
    ).groupBy("position").agg(
        F.count("*").alias("n_touches"),
        F.sum("credit_pm").cast("bigint").alias("credit_pm_total"),
        F.countDistinct("conv_id").alias("n_conversions"),
    )


@q(
    "pipeline_dedup_survivorship",
    oracle="""
    WITH cl AS (
        SELECT md5(array_to_string(
                 list_sort(list_distinct(
                   regexp_split_to_array(lower(trim(text)), '\\s+'))), ' ')) AS h,
               doc_id, n_chars
        FROM documents),
    ranked AS (
        SELECT h, doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY h ORDER BY n_chars DESC, doc_id) AS rn
        FROM cl)
    SELECT max(CASE WHEN rn = 1 THEN doc_id END) AS survivor_id,
           CAST(count(*) AS BIGINT) AS cluster_size,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS member_ids
    FROM ranked GROUP BY h HAVING count(*) > 1
    """,
    tags=("pipeline", "dedup", "survivorship"),
)
def pipeline_dedup_survivorship(spark, sf_dir):
    """Duplicate-cluster survivorship: documents cluster by their
    distinct-token-SET fingerprint (the bag-of-words near-dup class —
    same vocabulary regardless of order/repetition), and each cluster
    picks the canonical survivor by the master-data rule (longest
    text, then lowest id) and lists the merged members — the record a
    dedup pipeline KEEPS, not just the count it drops, which is what
    downstream lineage needs. Member lists emit as deterministically-
    sorted comma-joined strings.

    100 TB posture: one hash agg on the 128-bit digest; text itself
    never shuffles past the first partial."""
    cl = tbl(spark, sf_dir, "documents").select(
        F.md5(
            F.array_join(
                F.array_sort(
                    F.array_distinct(F.split(F.lower(F.trim("text")), r"\s+"))
                ),
                " ",
            )
        ).alias("h"),
        "doc_id",
        "n_chars",
    )
    ranked = cl.select(
        "h",
        "doc_id",
        F.row_number()
        .over(Window.partitionBy("h").orderBy(F.desc("n_chars"), "doc_id"))
        .alias("rn"),
    )
    g = ranked.groupBy("h").agg(
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("survivor_id"),
        F.count("*").alias("cluster_size"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("member_ids"),
    )
    return g.filter(F.col("cluster_size") > 1).drop("h")
