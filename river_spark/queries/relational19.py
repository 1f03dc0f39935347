"""Relational wave 19 (round 9): time-series diagnostics over the
events stream — autocorrelation, drawdown, and banded value histograms.

Bit-exactness rules (tests/test_oracle.py): all statistics are built
from exact integer sums (counts, cents) with the final expression the
SAME operation tree in both engines — sqrt and division are correctly
rounded IEEE ops, so identical integer inputs give bit-identical
doubles with no rounding in the gate (agg_corr_exact discipline).
Running sums over deterministically-ordered window frames are
sequential folds with identical addition order in both engines, so
cumulative doubles are bit-identical too (win_running_sum precedent).

Reference parity: none — relational extensions over the reference's
sample-stream data model (cpp/src/reader.h exposes raw scans only).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl


@q(
    "ev_autocorr_lag",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day, count(*) AS x
        FROM events GROUP BY 1, 2),
    pairs AS (
        SELECT event_type, x,
               lag(x) OVER (PARTITION BY event_type ORDER BY day) AS xp
        FROM daily),
    s AS (
        SELECT event_type,
               count(*) AS n,
               sum(x) AS sx, sum(xp) AS sy,
               sum(x * x) AS sxx, sum(xp * xp) AS syy,
               sum(x * xp) AS sxy
        FROM pairs WHERE xp IS NOT NULL GROUP BY event_type)
    SELECT event_type,
           CAST(n AS BIGINT) AS n_pairs,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                      * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0.0)
             AS autocorr_r1
    FROM s
    """,
    tags=("events", "timeseries", "autocorr"),
)
def ev_autocorr_lag(spark, sf_dir):
    """Lag-1 autocorrelation of daily event counts per type — the
    periodicity/burst fingerprint of an arrival process (r1 near 0 for
    a Poisson-like feed; a retry loop or batch scheduler pushes it
    up). Pearson r over (x_t, x_{t-1}) built entirely from integer
    count sums; the one final expression (two sqrts, one division) is
    evaluated identically by both engines — raw doubles, no rounding.

    100 TB posture: one hash agg fact -> (type, day), a lag window
    partitioned by type over the tiny daily table, one more agg."""
    ev = events_tbl(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    pairs = daily.select(
        "event_type", "x", F.lag("x").over(w).alias("xp")
    ).filter(F.col("xp").isNotNull())
    s = pairs.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("xp").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("xp") * F.col("xp")).alias("syy"),
        F.sum(F.col("x") * F.col("xp")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    # nullif guard: a constant daily series (or n=1) zeroes the variance
    # terms; under ANSI Spark a raw /0 THROWS while DuckDB yields NULL —
    # NULL (undefined autocorrelation) is the correct answer in both.
    return s.select(
        "event_type",
        F.col("n").alias("n_pairs"),
        (num / F.nullif(den, F.lit(0.0))).alias("autocorr_r1"),
    )


@q(
    "ev_max_drawdown",
    oracle="""
    WITH c AS (
        SELECT user_id, ts, event_id,
               sum(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS cum
        FROM events),
    r AS (
        SELECT user_id, cum,
               max(cum) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS runmax
        FROM c)
    SELECT user_id,
           max(runmax - cum) AS max_drawdown,
           CAST(count(*) AS BIGINT) AS n_events
    FROM r GROUP BY user_id
    """,
    tags=("events", "timeseries", "drawdown"),
)
def ev_max_drawdown(spark, sf_dir):
    """Maximum drawdown of each user's cumulative value curve (peak
    minus subsequent trough) — the canonical risk metric, and the
    standard running-max-over-running-sum window composition. The
    cumulative sum folds in deterministic (ts, event_id) order, so both
    engines add the same doubles in the same order: cum, runmax, and
    the drawdown max are all bit-identical raw doubles.

    100 TB posture: both windows and the final agg partition by
    user_id — one shuffle, per-user state only."""
    ev = events_tbl(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("value").over(w).alias("cum"),
    ).select(
        "user_id",
        "cum",
        F.max("cum").over(w).alias("runmax"),
    )
    return c.groupBy("user_id").agg(
        F.max(F.col("runmax") - F.col("cum")).alias("max_drawdown"),
        F.count("*").alias("n_events"),
    )


_BAND_CENTS = 5000  # $50 value bands
_BAND_CAP = 9


@q(
    "agg_value_bands",
    oracle=f"""
    SELECT event_type,
           CAST(least(CAST(round(value * 100) AS BIGINT) // {_BAND_CENTS},
                      {_BAND_CAP}) AS BIGINT) AS band,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY 1, 2
    """,
    tags=("agg", "histogram", "banding"),
)
def agg_value_bands(spark, sf_dir):
    """$50-banded value histogram per event type (top band open-ended)
    — the fixed-band revenue distribution a dashboard slices without a
    quantile pass. Values go cents-integer first (the repo's
    integer-first discipline), banding is integer division: exact in
    both engines.

    100 TB posture: a single map-side-combinable hash agg; banding is
    row-local arithmetic, so this is the cheapest possible shape."""
    ev = events_tbl(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("bigint")
    band = F.least(
        F.expr(f"cast(round(value * 100) as bigint) div {_BAND_CENTS}"),
        F.lit(_BAND_CAP),
    ).cast("bigint")
    return ev.groupBy("event_type", band.alias("band")).agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("cents"),
    )
