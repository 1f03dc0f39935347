"""Relational wave 33 (round 11): robust trend detection — the
monitoring readouts a metrics platform runs on every daily series,
completing the nonparametric family (Mann-Whitney, Spearman, Wilson,
Welch, CUPED, SRM):

- ``agg_mann_kendall_trend``: the Mann-Kendall trend test per event
  type over the daily value series. S = sum of sign(c_j - c_i) over all
  day pairs i<j is an exact integer; the tie-corrected variance is kept
  as an exact integer TIMES 18 (``var_s_x18``) so nothing leaves the
  integer domain until the final z; z applies the standard continuity
  correction and guards the zero-variance boundary (constant series)
  with the shared nullif pattern.
- ``agg_theil_sen_slope``: the robust slope companion — the LOWER
  median of all pairwise slopes (c_j - c_i)/(day_j - day_i). Every
  slope is one IEEE division of exact integers (bit-identical across
  engines), and the median is an explicit order-statistic selection
  (row_number against (n+1) div 2), not an interpolating percentile —
  so the output is one of the actual slope values, reproducible
  bit-for-bit.

Both operate on the (event_type, day) ROLLUP — at most ~30 rows per
type here, #days at production — so the O(n^2) pair enumeration is
bounded by calendar length, never by event volume: the one full scan
is a map-side-combinable hash agg, and everything quadratic happens on
rollup-sized data.

Reference parity: the reference engine (pbotros/river) has no
relational layer (its surface is the stream transport,
/root/reference/cpp/src/writer.cpp); these extend the analytics
surface the brief requires.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl

_DAILY_SQL = """
        SELECT event_type,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                   AS BIGINT) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
"""


def _daily(spark, sf_dir):
    """(event_type, day index, exact cents total) rollup shared by both
    trend statistics — one scan, one fine-keyed hash agg."""
    return (
        events_tbl(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            .cast("bigint")
            .alias("d"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("c"))
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test (exact S, tie-corrected variance, continuity z)
# ---------------------------------------------------------------------------
@q(
    "agg_mann_kendall_trend",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    n AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY 1),
    s AS (
        SELECT a.event_type,
               CAST(sum(CASE WHEN b.c > a.c THEN 1
                             WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.d > a.d
        GROUP BY 1),
    ties AS (
        SELECT event_type,
               CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
                   AS tie_term
        FROM (SELECT event_type, c, CAST(count(*) AS BIGINT) AS t
              FROM daily GROUP BY event_type, c)
        GROUP BY event_type),
    v AS (
        SELECT n.event_type, n.n, s.s,
               n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term AS var_s_x18
        FROM n JOIN s ON s.event_type = n.event_type
        JOIN ties ON ties.event_type = n.event_type)
    SELECT event_type, n, s, var_s_x18,
           CASE WHEN var_s_x18 > 0 AND s <> 0
                THEN round((CAST(s AS DOUBLE)
                            - CASE WHEN s > 0 THEN 1.0 ELSE -1.0 END)
                           / sqrt(CAST(var_s_x18 AS DOUBLE) / 18.0), 6)
                WHEN var_s_x18 > 0 THEN 0.0
           END AS z_stat
    FROM v
    """,
    tags=("agg", "stats", "trend", "exact"),
)
def agg_mann_kendall_trend(spark, sf_dir):
    """Mann-Kendall trend test per event type on the daily cents series:
    S counts concordant-minus-discordant day pairs (exact BIGINT from a
    rollup self-join bounded by #days^2, never event volume), the
    tie-corrected variance ships as the exact integer 18*Var(S), and
    the z statistic applies the standard continuity correction
    ((S -/+ 1)/sqrt(Var)). Constant series (Var = 0) yield NULL through
    the shared guard; S = 0 yields z = 0 exactly. The monitoring
    question this answers — "is this metric drifting?" — without
    assuming normality or linearity.

    100 TB posture: one scan -> (type, day) hash agg; the quadratic
    pair join runs on #days rows per type (calendar-bounded); at ten
    years of days the 3.6e3^2 pairs per type are still trivial."""
    daily = _daily(spark, sf_dir)
    n = daily.groupBy("event_type").agg(F.count("*").alias("n"))
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.d") > F.col("a.d")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.c") > F.col("a.c"), 1)
                .when(F.col("b.c") < F.col("a.c"), -1)
                .otherwise(0)
            ).alias("s")
        )
    )
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count("*").alias("t"))
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    v = (
        n.join(s, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            "n",
            "s",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tie_term")
            ).alias("var_s_x18"),
        )
    )
    z = F.when(
        (F.col("var_s_x18") > 0) & (F.col("s") != 0),
        F.round(
            (
                F.col("s").cast("double")
                - F.when(F.col("s") > 0, F.lit(1.0)).otherwise(F.lit(-1.0))
            )
            / F.sqrt(F.col("var_s_x18").cast("double") / 18.0),
            6,
        ),
    ).when(F.col("var_s_x18") > 0, F.lit(0.0))
    return v.select("event_type", "n", "s", "var_s_x18", z.alias("z_stat"))


# ---------------------------------------------------------------------------
# Theil-Sen slope (lower median of pairwise slopes, explicit selection)
# ---------------------------------------------------------------------------
@q(
    "agg_theil_sen_slope",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    slopes AS (
        SELECT a.event_type,
               CAST(b.c - a.c AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.d > a.d),
    ranked AS (
        SELECT event_type, slope,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY slope) AS rn,
               count(*) OVER (PARTITION BY event_type) AS m
        FROM slopes)
    SELECT event_type, CAST(m AS BIGINT) AS n_pairs,
           slope AS sen_slope_cents_per_day
    FROM ranked WHERE rn = (m + 1) // 2
    """,
    tags=("agg", "stats", "trend", "robust"),
)
def agg_theil_sen_slope(spark, sf_dir):
    """Theil-Sen robust slope per event type: the LOWER median of all
    pairwise daily slopes — up to 29% of the days can be corrupted
    (outages, backfills) before the estimate moves, which is why
    monitoring pipelines prefer it to OLS on raw daily series. Each
    slope is a single IEEE division of exact integer (cents, day)
    deltas — bit-identical across engines — and the median is an
    explicit order statistic (row_number = (m+1) div 2), not an
    interpolating percentile, so the answer is one of the true slopes.

    100 TB posture: identical to agg_mann_kendall_trend — the O(n^2)
    stage runs on the calendar-bounded rollup; the ranking window
    partitions per type over #days^2/2 rollup rows, never raw events."""
    daily = _daily(spark, sf_dir)
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.d") > F.col("a.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.c") - F.col("a.c")).cast("double")
            / (F.col("b.d") - F.col("a.d")).cast("double")
        ).alias("slope"),
    )
    w = Window.partitionBy("event_type").orderBy("slope")
    wc = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("m"),
    )
    return ranked.where(
        F.col("rn") == F.expr("(m + 1) div 2")
    ).select(
        "event_type",
        F.col("m").cast("bigint").alias("n_pairs"),
        F.col("slope").alias("sen_slope_cents_per_day"),
    )
