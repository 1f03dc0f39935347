"""Relational wave 26 (round 9): engagement stickiness, length
percentiles, and weekday seasonality shares.

Bit-exactness rules (tests/test_oracle.py): exact integer counts;
single-division ratios emitted raw; percentiles via the pinned
percentile_disc == quantile_disc idiom (stored values, no
interpolation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl, tbl


@q(
    "ev_wau_stickiness",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events),
    dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
    cover AS (
        SELECT DISTINCT user_id,
               CAST(unnest(generate_series(day, day + INTERVAL 6 DAY,
                                           INTERVAL 1 DAY)) AS DATE) AS wday
        FROM ud),
    wau AS (SELECT wday, count(*) AS wau FROM cover GROUP BY wday)
    SELECT strftime(dau.day, '%Y-%m-%d') AS day,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
    FROM dau JOIN wau ON dau.day = wau.wday
    """,
    tags=("events", "engagement", "stickiness"),
)
def ev_wau_stickiness(spark, sf_dir):
    """DAU/WAU stickiness per day: daily actives over trailing-7-day
    actives — the engagement ratio product teams track (1.0 = every
    weekly user shows up daily). Each activity day EXPLODES to the 7
    window days it covers (a bounded fan-out — never a range/NL join),
    WAU is then a distinct count per covered day; counts are exact
    integers and stickiness is one IEEE division, raw. The final inner
    join on actual activity days drops phantom trailing window days.

    100 TB posture: distinct-projection, x7 explode, two hash aggs on
    the day key — strictly linear, no nested-loop join anywhere."""
    ev = events_tbl(spark, sf_dir)
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    cover = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add("day", 6), F.expr("interval 1 day"))
        ).alias("wday"),
    ).distinct()
    wau = cover.groupBy("wday").agg(F.count("*").alias("wau"))
    return (
        dau.join(wau, dau.day == wau.wday)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


@q(
    "text_length_percentiles_by_lang",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS p25,
           CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50,
           CAST(quantile_disc(n_chars, 0.75) AS BIGINT) AS p75,
           CAST(quantile_disc(n_chars, 0.95) AS BIGINT) AS p95
    FROM documents GROUP BY lang
    """,
    tags=("text", "profile", "percentiles"),
)
def text_length_percentiles_by_lang(spark, sf_dir):
    """Document-length percentiles per language — the truncation-budget
    planner's table (p95 length vs the context window decides how much
    of each language survives packing). percentile_disc returns actual
    stored integers in both engines, so there is nothing to drift.

    100 TB posture: one hash agg per lang over a single integer
    column; column pruning keeps the scan to (lang, n_chars)."""

    def pd_(p):
        return F.expr(
            f"percentile_disc({p}) WITHIN GROUP (ORDER BY n_chars)"
        ).cast("bigint")

    return tbl(spark, sf_dir, "documents").groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        pd_(0.25).alias("p25"),
        pd_(0.5).alias("p50"),
        pd_(0.75).alias("p75"),
        pd_(0.95).alias("p95"),
    )


@q(
    "agg_weekday_seasonality",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(isodow(ts) AS BIGINT) AS iso_dow,
               count(*) AS n
        FROM events GROUP BY 1, 2),
    t AS (SELECT event_type, sum(n) AS tot FROM d GROUP BY event_type)
    SELECT d.event_type, d.iso_dow,
           CAST(d.n AS BIGINT) AS n,
           CAST(d.n AS DOUBLE) / t.tot AS share
    FROM d JOIN t ON d.event_type = t.event_type
    """,
    tags=("agg", "calendar", "seasonality"),
)
def agg_weekday_seasonality(spark, sf_dir):
    """Weekday seasonality profile: each event type's share of volume
    by ISO weekday — the 7-point seasonal fingerprint a forecast
    baseline divides out (and an anomaly detector compares against).
    Counts are exact; each share is one IEEE division, raw.

    100 TB posture: one fact hash agg to 35 cells; the per-type totals
    join back on the aggregated table, not the fact."""
    ev = events_tbl(spark, sf_dir)
    d = ev.groupBy(
        "event_type", (F.weekday("ts") + 1).cast("bigint").alias("iso_dow")
    ).agg(F.count("*").alias("n"))
    t = d.groupBy("event_type").agg(F.sum("n").alias("tot"))
    return d.join(t, "event_type").select(
        "event_type",
        "iso_dow",
        "n",
        (F.col("n").cast("double") / F.col("tot")).alias("share"),
    )
