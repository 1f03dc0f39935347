"""Relational wave 24 (round 9): growth accounting, traffic-regularity
(bot) heuristics, and dataset-version diffs.

Bit-exactness rules (tests/test_oracle.py): counts and integer-ratio
expressions only; the regularity flag compares a bit-identical double
against a literal, so the comparison itself is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl, tbl


@q(
    "agg_new_vs_returning",
    oracle="""
    WITH firstweek AS (
        SELECT user_id,
               min(strftime(date_trunc('week', ts), '%Y-%m-%d')) AS first_week
        FROM events GROUP BY user_id),
    act AS (
        SELECT DISTINCT e.user_id,
               strftime(date_trunc('week', e.ts), '%Y-%m-%d') AS week,
               f.first_week
        FROM events e JOIN firstweek f ON e.user_id = f.user_id)
    SELECT week,
           count(*) AS n_active,
           CAST(count(*) FILTER (week = first_week) AS BIGINT) AS n_new,
           CAST(count(*) FILTER (week > first_week) AS BIGINT) AS n_returning
    FROM act GROUP BY week
    """,
    tags=("agg", "growth", "cohort"),
)
def agg_new_vs_returning(spark, sf_dir):
    """Weekly growth accounting: active users split into new (first
    week of activity) vs returning — the first chart in any growth
    review, and the aggregate the cohort queries decompose. Weeks
    label as Monday-start strings (the engine-agreeing truncation);
    everything is exact integer counts of distinct users.

    100 TB posture: first-touch agg by user, broadcast-or-shuffle join
    back, one distinct-projection, one week rollup."""
    ev = events_tbl(spark, sf_dir)
    week = F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd")
    firstweek = ev.groupBy("user_id").agg(F.min(week).alias("first_week"))
    act = (
        ev.select("user_id", week.alias("week"))
        .distinct()
        .join(firstweek, "user_id")
    )
    return act.groupBy("week").agg(
        F.count("*").alias("n_active"),
        F.count(F.when(F.col("week") == F.col("first_week"), 1)).alias("n_new"),
        F.count(F.when(F.col("week") > F.col("first_week"), 1)).alias("n_returning"),
    )


_REGULARITY_MIN_EVENTS = 10


@q(
    "ev_user_regularity",
    oracle=f"""
    WITH g AS (
        SELECT user_id,
               (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) // 1000000
                 AS gap_s
        FROM events),
    s AS (
        SELECT user_id, count(*) AS n, sum(gap_s) AS sx,
               sum(gap_s * gap_s) AS sxx
        FROM g WHERE gap_s IS NOT NULL
        GROUP BY user_id HAVING count(*) >= {_REGULARITY_MIN_EVENTS}),
    f AS (
        SELECT user_id, n,
               CAST(n * sxx - sx * sx AS DOUBLE)
                 / (CAST(n AS DOUBLE) * nullif(sx, 0)) AS fano_s
        FROM s)
    SELECT user_id, CAST(n AS BIGINT) AS n_gaps, fano_s,
           CAST(fano_s < 60.0 AS BIGINT) AS too_regular
    FROM f
    """,
    tags=("events", "bot_detection", "regularity"),
)
def ev_user_regularity(spark, sf_dir):
    """Per-user arrival regularity: the Fano factor of inter-event gaps
    flags traffic that is too CLOCKED to be human (a scraper on a
    timer has near-zero gap variance; organic activity is
    over-dispersed) — the heuristic a training-data pipeline runs
    before user-generated text enters a corpus. Gap sums are exact
    integer seconds (floor-divided from microseconds; the us square
    would overflow LONG under ANSI); the Fano expression is one shared tree, and
    the flag compares that bit-identical double to a literal.

    100 TB posture: lag window and both aggs partition by user_id —
    one shuffle; the HAVING floor keeps noise users out of the
    result."""
    ev = events_tbl(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = us - F.lag(us).over(w)
    # second-grain gaps: the microsecond square overflows LONG under
    # ANSI for week-long gaps (2.6e12^2 >> 2^63) while DuckDB widens
    g = ev.select("user_id", gap_us.alias("_g")).select(
        "user_id", F.expr("_g div 1000000").alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    s = g.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("gap_s").alias("sx"),
        F.sum(F.col("gap_s") * F.col("gap_s")).alias("sxx"),
    ).filter(F.col("n") >= _REGULARITY_MIN_EVENTS)
    fano = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double") / (
        F.col("n").cast("double") * F.nullif(F.col("sx"), F.lit(0))
    )
    f = s.select("user_id", "n", fano.alias("fano_s"))
    return f.select(
        "user_id",
        F.col("n").alias("n_gaps"),
        "fano_s",
        (F.col("fano_s") < 60.0).cast("bigint").alias("too_regular"),
    )


@q(
    "pipeline_dataset_delta",
    oracle="""
    WITH v1 AS (
        SELECT DISTINCT lower(unnest(regexp_split_to_array(trim(text), '\\s+'))) AS tok
        FROM documents WHERE doc_id % 2 = 0),
    v2 AS (
        SELECT DISTINCT lower(unnest(regexp_split_to_array(trim(text), '\\s+'))) AS tok
        FROM documents WHERE doc_id % 2 = 1),
    sizes AS (
        SELECT (SELECT count(*) FROM documents WHERE doc_id % 2 = 0) AS docs_v1,
               (SELECT count(*) FROM documents WHERE doc_id % 2 = 1) AS docs_v2,
               (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents
                 WHERE doc_id % 2 = 0) AS chars_v1,
               (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents
                 WHERE doc_id % 2 = 1) AS chars_v2)
    SELECT docs_v1, docs_v2, chars_v1, chars_v2,
           (SELECT count(*) FROM v1) AS vocab_v1,
           (SELECT count(*) FROM v2) AS vocab_v2,
           (SELECT count(*) FROM v2
             WHERE tok NOT IN (SELECT tok FROM v1)) AS vocab_added,
           (SELECT count(*) FROM v1
             WHERE tok NOT IN (SELECT tok FROM v2)) AS vocab_removed
    FROM sizes
    """,
    tags=("pipeline", "versioning", "diff"),
)
def pipeline_dataset_delta(spark, sf_dir):
    """Dataset-version diff: size and vocabulary deltas between two
    corpus snapshots (modeled here as the even/odd doc_id halves) —
    docs/chars per version plus vocabulary added and removed, the
    summary a dataset-versioning system prints for every release. All
    exact integers via distinct-token anti-joins.

    100 TB posture: each vocabulary is one distinct-projection; the
    added/removed counts are anti-joins on the token key (vocabulary-
    bounded, map-side combinable partials)."""
    docs = tbl(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") % 2).alias("v"),
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok0"),
    ).select("v", F.lower("tok0").alias("tok")).distinct()
    v1 = toks.filter(F.col("v") == 0).select("tok")
    v2 = toks.filter(F.col("v") == 1).select("tok")
    sizes = docs.agg(
        F.count(F.when(F.col("doc_id") % 2 == 0, 1)).alias("docs_v1"),
        F.count(F.when(F.col("doc_id") % 2 == 1, 1)).alias("docs_v2"),
        F.sum(F.when(F.col("doc_id") % 2 == 0, F.col("n_chars"))).alias("chars_v1"),
        F.sum(F.when(F.col("doc_id") % 2 == 1, F.col("n_chars"))).alias("chars_v2"),
    )
    counts = (
        v1.agg(F.count("*").alias("vocab_v1"))
        .crossJoin(v2.agg(F.count("*").alias("vocab_v2")))
        .crossJoin(v2.join(v1, "tok", "left_anti").agg(F.count("*").alias("vocab_added")))
        .crossJoin(v1.join(v2, "tok", "left_anti").agg(F.count("*").alias("vocab_removed")))
    )
    return sizes.crossJoin(counts).select(
        "docs_v1", "docs_v2", "chars_v1", "chars_v2",
        "vocab_v1", "vocab_v2", "vocab_added", "vocab_removed",
    )
