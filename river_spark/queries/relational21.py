"""Relational wave 21 (round 9): distribution-shape moments, activity
heatmaps, vocabulary health, and arrival-latency percentiles.

Bit-exactness rules (tests/test_oracle.py): moments build on integer
cent sums with one shared final tree (raw doubles); heatmap/hapax are
exact integers; gap percentiles use percentile_disc == quantile_disc
(an actual stored integer, no interpolation).

Calendar gotcha pinned here: Spark's dayofweek is 1-7 Sunday-first
while DuckDB's dayofweek is 0-6 Sunday-first — both engines use the
ISO day (Spark weekday()+1 == DuckDB isodow()) instead.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl


@q(
    "agg_moments_cents",
    oracle="""
    WITH c AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
    s AS (
        SELECT event_type,
               count(*) AS n,
               sum(cents) AS s1,
               sum(cents * cents) AS s2,
               sum(cents * cents * cents) AS s3
        FROM c GROUP BY event_type),
    t AS (
        SELECT event_type, n, s1, s2,
               (CAST(n AS DOUBLE) * n * s3 - 3.0 * n * s1 * s2
                  + 2.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                 / (CAST(n AS DOUBLE) * n * n) AS m3,
               CAST(n * s2 - s1 * s1 AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS vv
        FROM s)
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(s1 AS DOUBLE) / n AS mean_cents,
           vv AS var_cents,
           round(m3 / nullif(vv * sqrt(vv), 0.0), 6) AS skew
    FROM t
    """,
    tags=("agg", "stats", "moments"),
)
def agg_moments_cents(spark, sf_dir):
    """First three central moments of the value distribution per event
    type, from raw integer power sums — the distribution-shape
    fingerprint (mean/variance/third moment; skewness is m3/var^1.5,
    derivable downstream) that drift monitors track between snapshots.
    The power sums are exact integers (s3 ~ 6e17 per type at bench SF,
    within LONG); the s1-cube term casts to double BEFORE multiplying
    because the integer cube (~1e26) overflows LONG under ANSI while
    DuckDB silently widens to HUGEINT — the shared double tree keeps
    both engines bit-identical.

    100 TB posture: a single map-side-combinable hash agg; at real
    scale s2/s3 need DECIMAL(38) accumulators, the standard switch."""
    c = events_tbl(spark, sf_dir).select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    s = c.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
        F.sum(F.col("cents") * F.col("cents") * F.col("cents")).alias("s3"),
    )
    n = F.col("n")
    nd = n.cast("double")
    # s1 casts to double BEFORE cubing (the integer cube overflows LONG
    # under ANSI while DuckDB widens to HUGEINT). The raw third moment
    # is NOT emitted: DuckDB's C++ build contracts the multiply-add
    # chain into FMA (1-ulp numerator drift vs the JVM, ~1e-4 absolute
    # at cents^3 magnitude, too large for round-6) — so the output is
    # the O(1) SKEWNESS, where the same relative drift is ~1e-16
    # absolute and round-6 absorbs it. nullif guards the zero-variance
    # boundary (Spark ANSI would throw where DuckDB yields NULL).
    m3 = (
        nd * n * F.col("s3")
        - 3.0 * n * F.col("s1") * F.col("s2")
        + 2.0
        * F.col("s1").cast("double")
        * F.col("s1").cast("double")
        * F.col("s1").cast("double")
    ) / (nd * n * n)
    vv = (n * F.col("s2") - F.col("s1") * F.col("s1")).cast("double") / (nd * n)
    t = s.select("event_type", "n", "s1", m3.alias("m3"), vv.alias("vv"))
    return t.select(
        "event_type",
        n.alias("n"),
        (F.col("s1").cast("double") / n).alias("mean_cents"),
        F.col("vv").alias("var_cents"),
        F.round(
            F.col("m3") / F.nullif(F.col("vv") * F.sqrt("vv"), F.lit(0.0)), 6
        ).alias("skew"),
    )


@q(
    "ev_hour_dow_heatmap",
    oracle="""
    SELECT CAST(isodow(ts) AS BIGINT) AS iso_dow,
           CAST(hour(ts) AS BIGINT) AS hour,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY 1, 2
    """,
    tags=("events", "calendar", "heatmap"),
)
def ev_hour_dow_heatmap(spark, sf_dir):
    """Hour x ISO-weekday activity heatmap — the ops-dashboard matrix
    that shows load shape and catches scheduler anomalies (a hot cell
    at 03:00 Sunday is a cron, not a user). ISO day-of-week is the one
    calendar index both engines agree on (Spark weekday()+1 ==
    DuckDB isodow(); their dayofweek functions differ by base).
    Exact integers throughout.

    100 TB posture: one hash agg to a 168-cell table; calendar
    extraction is row-local."""
    ev = events_tbl(spark, sf_dir)
    return ev.groupBy(
        (F.weekday("ts") + 1).cast("bigint").alias("iso_dow"),
        F.hour("ts").cast("bigint").alias("hour"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
    )


@q(
    "text_hapax_ratio",
    oracle="""
    WITH tf AS (
        SELECT source, lower(unnest(regexp_split_to_array(trim(text), '\\s+'))) AS tok
        FROM documents),
    f AS (
        SELECT source, tok, count(*) AS c FROM tf GROUP BY source, tok)
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(count(*) FILTER (c = 1) AS BIGINT) AS hapax,
           CAST(count(*) FILTER (c = 1) AS DOUBLE) / count(*) AS hapax_ratio
    FROM f GROUP BY source
    """,
    tags=("text", "vocabulary", "health"),
)
def text_hapax_ratio(spark, sf_dir):
    """Hapax legomena ratio per source: the fraction of the source's
    vocabulary that occurs exactly once — the vocabulary-health dial
    (natural text sits near ~0.4-0.6 by Zipf; far below means
    templated/boilerplate text, far above means OCR noise or
    tokenization breakage). Exact integer counts; the ratio is one
    IEEE division, emitted raw.

    100 TB posture: one token-grain hash agg (map-side combinable),
    one source-grain rollup."""
    from river_spark.queries.tables import tbl

    tf = tbl(spark, sf_dir, "documents").select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok0")
    ).select("source", F.lower("tok0").alias("tok"))
    f = tf.groupBy("source", "tok").agg(F.count("*").alias("c"))
    hapax = F.count(F.when(F.col("c") == 1, 1))
    return f.groupBy("source").agg(
        F.count("*").alias("vocab"),
        hapax.alias("hapax"),
        (hapax.cast("double") / F.count("*")).alias("hapax_ratio"),
    )


@q(
    "ev_gap_percentiles",
    oracle="""
    WITH g AS (
        SELECT event_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
        FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(quantile_disc(gap_us, 0.5) AS BIGINT) AS p50_us,
           CAST(quantile_disc(gap_us, 0.9) AS BIGINT) AS p90_us,
           CAST(quantile_disc(gap_us, 0.99) AS BIGINT) AS p99_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
    tags=("events", "latency", "percentiles"),
)
def ev_gap_percentiles(spark, sf_dir):
    """Inter-arrival latency percentiles (p50/p90/p99) per event type —
    the SLO numbers behind ev_gap_histogram's shape. Gaps are exact
    integer microseconds; percentile_disc (Spark) == quantile_disc
    (DuckDB) returns an actual stored value, so there is no
    interpolation to drift (the repo's pinned quantile idiom).

    100 TB posture: event_type is a ~5-value key, so the gap lag runs
    bucket-stitched (operators/stitched_lag.py, types x days
    parallelism, row-identical to the plain window); the percentile agg
    is one pass over integer gaps."""
    from river_spark.operators.stitched_lag import stitched_lag

    ev = events_tbl(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    g = (
        stitched_lag(
            ev.select("event_type", "ts", "event_id", us.alias("us")),
            key_cols=["event_type"],
            order_cols=["ts", "event_id"],
            value_col="us",
            bucket=F.date_trunc("day", F.col("ts")),
            out_col="prev_us",
        )
        .select("event_type", (F.col("us") - F.col("prev_us")).alias("gap_us"))
        .filter(F.col("gap_us").isNotNull())
    )
    def pd_(p):
        return F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY gap_us)").cast(
            "bigint"
        )
    return g.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        pd_(0.5).alias("p50_us"),
        pd_(0.9).alias("p90_us"),
        pd_(0.99).alias("p99_us"),
    )
