"""Relational wave 37 (round 11): extreme-value tail fitting.

``agg_gumbel_block_maxima``: method-of-moments Gumbel fit to the daily
block maxima of each event type's value stream — the extreme-value-
theory answer to "what will next month's worst day look like?" that a
p99-of-history readout can't give (it never extrapolates beyond the
observed range). Block maxima are exact integer cents (max is
order-free); their first two moments are exact integer sums; the
closed-form estimates beta = s*sqrt(6)/pi and mu = xbar - gamma*beta
(gamma = Euler-Mascheroni) plus the 30-day return level
mu - beta*ln(-ln(1 - 1/30)) (pinned literal) are one shared double tree, round-6.

Reference parity: the reference engine (pbotros/river) has no
relational layer (its surface is the stream transport,
/root/reference/cpp/src/writer.cpp); this extends the analytics
surface the brief requires.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl

# shared literals, written identically in both engines
_GAMMA = "0.5772156649015329"
_SQRT6_PI = "0.7796968012336793"  # sqrt(6)/pi
# ln(-ln(1 - 1/30)), the 30-block return-level multiplier, PINNED as a
# literal: Spark parses the inline arithmetic as ANSI DECIMAL (1.0 -
# 1.0/30.0 -> 0.966667 at 6 digits) where DuckDB uses DOUBLE, so the
# expression form diverges at the 5th decimal — a pinned double literal
# is the only cross-engine-stable spelling (same as _GAMMA).
_RL = "-3.3842944934992527"


@q(
    "agg_gumbel_block_maxima",
    oracle=f"""
    WITH daily_max AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS mx
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2),
    s AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_blocks,
               CAST(sum(mx) AS BIGINT) AS s1,
               CAST(sum(mx * mx) AS BIGINT) AS s2,
               CAST(max(mx) AS BIGINT) AS observed_max
        FROM daily_max GROUP BY event_type)
    SELECT event_type, n_blocks, observed_max,
           CASE WHEN n_blocks > 1
                     AND n_blocks * s2 - s1 * s1 > 0
                THEN round(sqrt(CAST(n_blocks * s2 - s1 * s1 AS DOUBLE)
                                / (CAST(n_blocks AS DOUBLE)
                                   * (CAST(n_blocks AS DOUBLE) - 1)))
                           * {_SQRT6_PI} / 100.0, 6)
           END AS beta_usd,
           CASE WHEN n_blocks > 1
                     AND n_blocks * s2 - s1 * s1 > 0
                THEN round((CAST(s1 AS DOUBLE) / n_blocks
                            - {_GAMMA}
                              * sqrt(CAST(n_blocks * s2 - s1 * s1 AS DOUBLE)
                                     / (CAST(n_blocks AS DOUBLE)
                                        * (CAST(n_blocks AS DOUBLE) - 1)))
                              * {_SQRT6_PI}) / 100.0, 6)
           END AS mu_usd,
           CASE WHEN n_blocks > 1
                     AND n_blocks * s2 - s1 * s1 > 0
                THEN round((CAST(s1 AS DOUBLE) / n_blocks
                            - {_GAMMA}
                              * sqrt(CAST(n_blocks * s2 - s1 * s1 AS DOUBLE)
                                     / (CAST(n_blocks AS DOUBLE)
                                        * (CAST(n_blocks AS DOUBLE) - 1)))
                              * {_SQRT6_PI}
                            - sqrt(CAST(n_blocks * s2 - s1 * s1 AS DOUBLE)
                                   / (CAST(n_blocks AS DOUBLE)
                                      * (CAST(n_blocks AS DOUBLE) - 1)))
                              * {_SQRT6_PI} * {_RL}) / 100.0, 6)
           END AS ret30_usd
    FROM s
    """,
    tags=("agg", "stats", "extremes", "tail"),
)
def agg_gumbel_block_maxima(spark, sf_dir):
    """Gumbel (EV-I) tail fit per event type from daily block maxima,
    by the method of moments: beta-hat = s * sqrt(6)/pi, mu-hat =
    xbar - gamma * beta-hat, and the 30-block return level mu -
    beta*ln(-ln(1 - 1/30)) — "the worst day you should expect about
    once a month", which extrapolates where an empirical p99 cannot.
    Block maxima and their power sums are exact integers; the three
    estimates are one shared double tree with pinned literals for
    gamma and sqrt(6)/pi (round-6 absorbs the sqrt/FMA chain).
    Degenerate series (one block, or zero sample variance) yield NULL
    through the shared guard.

    100 TB posture: max is order-free and map-side-combinable, so the
    whole query is two hash aggs — (type, day) then type; the moment
    sums widen to DECIMAL(38) at true scale, the standard switch."""
    daily_max = (
        events_tbl(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.max(F.round(F.col("value") * 100).cast("bigint")).alias("mx"))
    )
    s = daily_max.groupBy("event_type").agg(
        F.count("*").alias("n_blocks"),
        F.sum("mx").alias("s1"),
        F.sum(F.col("mx") * F.col("mx")).alias("s2"),
        F.max("mx").alias("observed_max"),
    )
    n = F.col("n_blocks")
    nd = n.cast("double")
    ss = (n * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
    ok = (n > 1) & ((n * F.col("s2") - F.col("s1") * F.col("s1")) > 0)
    sd = F.sqrt(ss / (nd * (nd - 1)))
    beta = sd * F.lit(float(_SQRT6_PI))
    mu = F.col("s1").cast("double") / n - F.lit(float(_GAMMA)) * beta
    rl = mu - beta * F.lit(float(_RL))
    return s.select(
        "event_type",
        "n_blocks",
        "observed_max",
        F.when(ok, F.round(beta / 100.0, 6)).alias("beta_usd"),
        F.when(ok, F.round(mu / 100.0, 6)).alias("mu_usd"),
        F.when(ok, F.round(rl / 100.0, 6)).alias("ret30_usd"),
    )
