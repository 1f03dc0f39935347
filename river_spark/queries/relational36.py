"""Relational wave 36 (round 11): the PAIRED nonparametric test.

``ab_wilcoxon_signed_rank`` closes the two-sample family: Mann-Whitney
U (wave 30) compares two independent groups; the signed-rank test is
its paired sibling — "did each user's own spend shift between the
first and second half of the month?" — the right tool when the same
unit is measured twice and the differences are skewed.

Computed WITHOUT ranking raw rows, the same value-rollup discipline as
ab_mann_whitney_u / agg_spearman_rho: nonzero per-user differences
roll up to (|d| -> t, n_pos); doubled average midranks are exact
integers (rank run c+1..c+t has doubled midrank 2c + t + 1); the
cumulative-below counter runs through stitched_prefix_sum so no task
ever sorts the whole difference distribution. W+ (doubled), the tie
cubes, and 48*Var(W+) = 2n(n+1)(2n+1) - sum(t^3 - t) all stay BIGINT;
the z statistic is the only double (round-6, sqrt chain).

Reference parity: the reference engine (pbotros/river) has no
relational layer (its surface is the stream transport,
/root/reference/cpp/src/writer.cpp); this extends the analytics
surface the brief requires.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl

_CUTOFF = "2024-01-16 00:00:00"


@q(
    "ab_wilcoxon_signed_rank",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(coalesce(sum(CASE WHEN ts < TIMESTAMP '{_CUTOFF}'
                   THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END), 0)
                   AS BIGINT) AS x,
               CAST(coalesce(sum(CASE WHEN ts >= TIMESTAMP '{_CUTOFF}'
                   THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END), 0)
                   AS BIGINT) AS y
        FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        GROUP BY user_id),
    d AS (
        SELECT abs(y - x) AS a,
               CASE WHEN y > x THEN 1 ELSE 0 END AS pos
        FROM per_user WHERE y <> x),
    v AS (
        SELECT a, CAST(count(*) AS BIGINT) AS t,
               CAST(sum(pos) AS BIGINT) AS npos
        FROM d GROUP BY a),
    c AS (
        SELECT t, npos,
               CAST(coalesce(sum(t) OVER (ORDER BY a
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cumbelow
        FROM v),
    s AS (
        SELECT CAST(coalesce(sum(t), 0) AS BIGINT) AS n,
               CAST(coalesce(sum(npos * (2 * cumbelow + t + 1)), 0)
                   AS BIGINT) AS w_plus_x2,
               CAST(coalesce(sum(t * t * t - t), 0) AS BIGINT) AS tie_cubes
        FROM c)
    SELECT n, w_plus_x2, tie_cubes,
           2 * n * (n + 1) * (2 * n + 1) - tie_cubes AS var_x48,
           CASE WHEN n > 0
                THEN round(((2.0 * CAST(w_plus_x2 AS DOUBLE)
                             - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1))
                            / 4.0)
                           / sqrt((2.0 * CAST(n AS DOUBLE)
                                   * (CAST(n AS DOUBLE) + 1)
                                   * (2.0 * CAST(n AS DOUBLE) + 1)
                                   - CAST(tie_cubes AS DOUBLE)) / 48.0), 6)
           END AS z_stat
    FROM s
    """,
    tags=("analytics", "abtest", "stats", "exact"),
)
def ab_wilcoxon_signed_rank(spark, sf_dir):
    """Wilcoxon signed-rank on each user's (pre, post) spend pair around
    the mid-month cutoff: W+ sums the average midranks of |post - pre|
    over the users who moved UP. Zero differences drop (the standard
    treatment); ties share exact doubled midranks; Var(W+) carries the
    tie correction as the exact integer 48*Var. n >= 1 guarantees
    var_x48 > 0 (all-tied |d| still leaves 3n(n+1)^2), so only the
    empty case (no mover at all) guards to NULL.

    100 TB posture: per-user pairs are one hash agg; the rank machinery
    runs on the (|d| -> counts) rollup with the cumulative counter
    bucket-stitched (|d| div 1e5), so no task ever holds the whole
    difference distribution; every statistic is a map-side-combinable
    integer sum. DECIMAL(38) widens the n^3 term at true user counts."""
    from river_spark.operators.stitched_lag import stitched_prefix_sum

    cutoff = F.lit(_CUTOFF).cast("timestamp")
    cents = F.round(F.col("value") * 100).cast("bigint")
    per_user = (
        events_tbl(spark, sf_dir)
        .where(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("ts") < cutoff, cents).otherwise(F.lit(0))),
                F.lit(0),
            ).alias("x"),
            F.coalesce(
                F.sum(F.when(F.col("ts") >= cutoff, cents).otherwise(F.lit(0))),
                F.lit(0),
            ).alias("y"),
        )
    )
    d = per_user.where(F.col("y") != F.col("x")).select(
        F.abs(F.col("y") - F.col("x")).alias("a"),
        F.when(F.col("y") > F.col("x"), 1).otherwise(0).alias("pos"),
    )
    v = d.groupBy("a").agg(
        F.count("*").alias("t"), F.sum("pos").cast("bigint").alias("npos")
    )
    c = stitched_prefix_sum(
        v,
        key_cols=[],
        order_cols=["a"],
        value_col="t",
        bucket=F.expr("a div 100000"),
        out_col="cum_incl",
    ).withColumn("cumbelow", F.col("cum_incl") - F.col("t"))
    s = c.agg(
        F.coalesce(F.sum("t"), F.lit(0)).alias("n"),
        F.coalesce(
            F.sum(F.col("npos") * (2 * F.col("cumbelow") + F.col("t") + 1)),
            F.lit(0),
        ).alias("w_plus_x2"),
        F.coalesce(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")), F.lit(0)
        ).alias("tie_cubes"),
    )
    nd = F.col("n").cast("double")
    z = F.when(
        F.col("n") > 0,
        F.round(
            (
                (2.0 * F.col("w_plus_x2").cast("double") - nd * (nd + 1))
                / 4.0
            )
            / F.sqrt(
                (
                    2.0 * nd * (nd + 1) * (2.0 * nd + 1)
                    - F.col("tie_cubes").cast("double")
                )
                / 48.0
            ),
            6,
        ),
    )
    return s.select(
        "n",
        "w_plus_x2",
        "tie_cubes",
        (
            2 * F.col("n") * (F.col("n") + 1) * (2 * F.col("n") + 1)
            - F.col("tie_cubes")
        ).alias("var_x48"),
        z.alias("z_stat"),
    )
