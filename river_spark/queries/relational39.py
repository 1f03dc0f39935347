"""Relational wave 39 (round 13): K-S distribution test, nearest as-of
join.

``agg_ks_two_sample`` — the two-sample Kolmogorov-Smirnov test: does
the ``value`` distribution differ between two event types? The rank
tests already on the surface (Mann-Whitney, Kruskal-Wallis) detect
LOCATION shifts; K-S is the omnibus test that detects ANY distribution
difference (shape, spread, tails), which is the one an experimentation
or data-drift monitor actually wants first.

Exactness: the statistic is computed as an INTEGER — the supremum of
|n2*C1(v) - n1*C2(v)| over the distinct-value jump points, where
C_i(v) is group i's inclusive CDF count (the sup of the right-
continuous ECDF difference is attained at a jump point, so scanning
distinct values is exact, not an approximation). Doubles appear only
in the final closed forms D = d_num/(n1*n2) and the scaled statistic
lambda = D*sqrt(n1*n2/(n1+n2)), written as the identical operation
tree in both engines over identical integers (IEEE division and
correctly-rounded sqrt are bit-stable cross-engine; the Kolmogorov
p-value's exp() series is NOT, so the query stops at lambda and leaves
the table lookup to the caller). At true 100 TB counts the n2*C1
products widen past BIGINT — same shape, DECIMAL(38,0) lanes (the
wave-30/38 note applies verbatim).

100 TB posture: no raw row is ever ranked. The value->per-group-count
rollup is one map-side-combinable aggregation; both CDF counters run
through ONE ``stitched_prefix_sum`` (keys x buckets parallelism — the
exact use case its docstring names); the scalar (n1, n2) rides a
broadcast 1-row cross join; the sup is one final max.

Reference parity: the reference engine (pbotros/river) has no
relational layer (its surface is the stream transport,
/root/reference/cpp/src/writer.cpp); this extends the analytics
surface the brief requires.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.operators.stitched_lag import stitched_prefix_sum
from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl


@q(
    "agg_ks_two_sample",
    oracle="""
    WITH base AS (
        SELECT event_type, value FROM events
        WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
    vg AS (
        SELECT value,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(sum(CASE WHEN event_type = 'view'  THEN 1 ELSE 0 END) AS BIGINT) AS c2
        FROM base GROUP BY value),
    cum AS (
        SELECT CAST(sum(c1) OVER (ORDER BY value) AS BIGINT) AS cdf1,
               CAST(sum(c2) OVER (ORDER BY value) AS BIGINT) AS cdf2
        FROM vg),
    n AS (
        SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
        FROM vg)
    SELECT n1, n2,
           CAST(max(abs(n2 * cdf1 - n1 * cdf2)) AS BIGINT) AS d_num,
           CAST(max(abs(n2 * cdf1 - n1 * cdf2)) AS DOUBLE)
               / CAST(n1 * n2 AS DOUBLE) AS d_stat,
           (CAST(max(abs(n2 * cdf1 - n1 * cdf2)) AS DOUBLE)
               / CAST(n1 * n2 AS DOUBLE))
               * sqrt(CAST(n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
               AS ks_lambda
    FROM cum, n
    GROUP BY n1, n2
    """,
    tags=("agg", "stats", "nonparametric"),
)
def agg_ks_two_sample(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov over click-vs-view values. See the
    module docstring for the exactness contract; the oracle recomputes
    the identical integer supremum with a plain window so the engines
    cross-check algorithm-independently (single window vs stitched
    keys-x-buckets prefix sum)."""
    base = (
        events_tbl(spark, sf_dir)
        .filter(F.col("event_type").isin("click", "view") & F.col("value").isNotNull())
        .select("event_type", "value")
    )
    vg = base.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    cum = stitched_prefix_sum(
        vg,
        key_cols=[],
        order_cols=["value"],
        value_col=["c1", "c2"],
        bucket=F.floor(F.col("value")).cast("long"),
        out_col=["cdf1", "cdf2"],
    )
    n = vg.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    diff = F.abs(F.col("n2") * F.col("cdf1") - F.col("n1") * F.col("cdf2"))
    d_num = F.max(diff).cast("long")
    d_stat = d_num.cast("double") / (F.col("n1") * F.col("n2")).cast("double")
    return (
        cum.crossJoin(F.broadcast(n))  # 1-row scalar
        .groupBy("n1", "n2")
        .agg(
            d_num.alias("d_num"),
            d_stat.alias("d_stat"),
            (
                d_stat
                * F.sqrt(
                    (F.col("n1") * F.col("n2")).cast("double")
                    / (F.col("n1") + F.col("n2")).cast("double")
                )
            ).alias("ks_lambda"),
        )
    )


# ---------------------------------------------------------------------------
# Nearest as-of join: closest purchase in either direction
# ---------------------------------------------------------------------------
@q(
    "ev_asof_nearest",
    oracle="""
    WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    b AS (
        SELECT c.event_id, c.ts AS cts, max(p.ts) AS pts
        FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.ts <= c.ts
        GROUP BY c.event_id, c.ts),
    f AS (
        SELECT c.event_id, c.ts AS cts, min(p.ts) AS pts
        FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.ts >= c.ts
        GROUP BY c.event_id, c.ts)
    SELECT b.event_id,
           CAST(CASE
             WHEN b.pts IS NULL AND f.pts IS NULL THEN NULL
             WHEN b.pts IS NULL
                 THEN date_diff('microsecond', b.cts, f.pts)
             WHEN f.pts IS NULL
                 THEN date_diff('microsecond', b.cts, b.pts)
             WHEN date_diff('microsecond', b.pts, b.cts)
                  <= date_diff('microsecond', b.cts, f.pts)
                 THEN date_diff('microsecond', b.cts, b.pts)
             ELSE date_diff('microsecond', b.cts, f.pts)
           END AS BIGINT) AS nearest_purchase_delta_us
    FROM b JOIN f USING (event_id)
    """,
    tags=("events", "asof_join", "nearest"),
)
def ev_asof_nearest(spark, sf_dir):
    """NEAREST as-of join — the SIGNED time from each click to the SAME
    user's closest purchase in EITHER direction (negative = purchase
    before the click, ties to the backward match, NULL if the user
    never purchases). Completes operators/asof.py's direction family
    under the oracle gate: backward (ev_asof_join), forward
    (ev_asof_forward), nearest (here). The matched payload is the
    purchase TIMESTAMP, so equal-ts ties are pick-invariant.

    100 TB posture: nearest is NOT two as-of joins — both fills share
    ONE shuffle of |clicks|+|purchases| on user_id and one
    per-partition sort (backward = last over the preceding frame,
    forward = first over the following frame of the SAME window
    ordering), then a row-local comparison picks the closer side. The
    oracle's pair of inequality joins is the fixture-scale spec, not
    the plan."""
    from river_spark.operators.asof import asof_join

    ev = events_tbl(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts")
    )
    joined = asof_join(
        clicks,
        purchases,
        left_on="user_id",
        right_on="p_user_id",
        left_ts="ts",
        right_ts="p_ts",
        right_cols=["p_ts"],
        direction="nearest",
    )
    return joined.select(
        "event_id",
        F.expr("timestampdiff(MICROSECOND, ts, p_ts)")
        .cast("bigint")
        .alias("nearest_purchase_delta_us"),
    )

