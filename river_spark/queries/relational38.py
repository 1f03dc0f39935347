"""Relational wave 38 (round 12): k-sample and ordered-categorical
exact-statistics completions.

The two-sample rank test (ab_mann_whitney_u, wave 30) generalizes in
two directions an experimentation platform needs:

- ``agg_kruskal_wallis``: the k-sample rank test (Kruskal-Wallis H)
  across event types, with exact average-rank tie handling and the
  standard tie correction. Like Mann-Whitney, it never ranks a raw
  row: doubled midranks (2r = 2*cum_below + t + 1, always an integer)
  come from a (value -> per-group counts) rollup whose CDF counter
  runs through ``stitched_prefix_sum`` — parallelism is value-buckets.
- ``ab_cochran_armitage``: the trend test for ordered exposure levels
  against a binary outcome — the dose-response readout (does
  conversion rise monotonically across engagement tiers?). The z^2
  statistic is a closed form over the exact integer (tier, outcome)
  contingency counts; no continuous approximation enters until the
  final expression.

Bit-exactness: every intermediate is a BIGINT; doubles appear only in
the FINAL closed-form expression, written as the identical operation
tree in Spark and DuckDB over identical integer inputs (wave-30 note
applies verbatim; at true 100 TB counts the products widen to
DECIMAL(38,0) — same shape, wider lanes).

Reference parity: the reference engine (pbotros/river) has no
relational layer (its surface is the stream transport,
/root/reference/cpp/src/writer.cpp); these extend the analytics
surface the brief requires.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl


# ---------------------------------------------------------------------------
# Kruskal-Wallis H across event types, exact ties, no raw-row ranking
# ---------------------------------------------------------------------------
@q(
    "agg_kruskal_wallis",
    oracle="""
    WITH base AS (
        SELECT event_type AS g, value FROM events WHERE value IS NOT NULL),
    vg AS (
        SELECT g, value, CAST(count(*) AS BIGINT) AS ngv
        FROM base GROUP BY g, value),
    vt AS (
        SELECT value, CAST(sum(ngv) AS BIGINT) AS t FROM vg GROUP BY value),
    c AS (
        SELECT value, t,
               CAST(coalesce(sum(t) OVER (ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_below
        FROM vt),
    r AS (
        SELECT vg.g, CAST(sum(vg.ngv) AS BIGINT) AS n_g,
               CAST(sum(vg.ngv * (2 * c.cum_below + c.t + 1)) AS BIGINT) AS r2_g
        FROM vg JOIN c USING (value) GROUP BY vg.g),
    ties AS (
        SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie_cubes FROM vt),
    s AS (
        -- the ONLY cross-group float sum: folded left-to-right in g
        -- order (list_reduce over an ordered list) so the summation
        -- order — hence every IEEE rounding — is pinned across engines
        SELECT CAST(count(*) AS BIGINT) AS k_groups,
               CAST(sum(n_g) AS BIGINT) AS n_total,
               list_reduce(
                   list(CAST(r2_g AS DOUBLE) * CAST(r2_g AS DOUBLE)
                        / (4 * CAST(n_g AS DOUBLE)) ORDER BY g),
                   (a, b) -> a + b) AS rank_sq
        FROM r)
    SELECT k_groups, n_total, tie_cubes,
           CASE WHEN n_total > 1 THEN
               12 / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1))
               * rank_sq - 3 * (CAST(n_total AS DOUBLE) + 1)
           END AS h_stat,
           CASE WHEN n_total > 1
                     AND 1 - CAST(tie_cubes AS DOUBLE)
                         / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
                            * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)) > 0
                THEN (12 / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1))
                      * rank_sq - 3 * (CAST(n_total AS DOUBLE) + 1))
                     / (1 - CAST(tie_cubes AS DOUBLE)
                        / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
                           * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)))
           END AS h_tie_corrected
    FROM s, ties
    """,
    tags=("analytics", "stats", "exact", "rank"),
)
def agg_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis H across event types with EXACT average-rank tie
    handling — the k-sample generalization of ab_mann_whitney_u: does
    the value distribution differ across event types, without assuming
    normality?

    Doubled midranks keep everything integer: the rank of distinct
    value v is cum_below + (t+1)/2, so 2r = 2*cum_below + t + 1 is a
    BIGINT and the doubled per-group rank sum 2R_g = sum(n_gv * 2r)
    is exact; R_g^2/n_g = (2R_g)^2 / (4 n_g) enters the H closed form
    as the only double. The standard tie correction divides by
    1 - sum(t^3 - t)/(N^3 - N), again from a BIGINT.

    100 TB posture: raw events reduce to a (value -> per-group counts)
    hash rollup (bounded value domain); the CDF counter over the
    value-total rollup runs through stitched_prefix_sum (bucket =
    floor(value)) so no single task ever sees the whole distribution;
    the group dimension (event types) is small by construction."""
    from river_spark.operators.stitched_lag import stitched_prefix_sum

    vg = (
        events_tbl(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .groupBy(F.col("event_type").alias("g"), "value")
        .agg(F.count("*").alias("ngv"))
    )
    vt = vg.groupBy("value").agg(F.sum("ngv").alias("t"))
    c = stitched_prefix_sum(
        vt,
        key_cols=[],
        order_cols=["value"],
        value_col="t",
        bucket=F.floor("value"),
        out_col="cum_incl",
    ).withColumn("cum_below", F.col("cum_incl") - F.col("t"))
    r = (
        vg.join(c.select("value", "t", "cum_below"), "value")
        .groupBy("g")
        .agg(
            F.sum("ngv").alias("n_g"),
            F.sum(F.col("ngv") * (2 * F.col("cum_below") + F.col("t") + 1)).alias("r2_g"),
        )
    )
    ties = vt.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie_cubes")
    )
    # the ONLY cross-group float sum: fold in sorted g order so the
    # summation order — hence every IEEE rounding — is pinned across
    # engines (a plain float SUM is order-nondeterministic)
    term = (
        F.col("r2_g").cast("double") * F.col("r2_g").cast("double")
        / (4 * F.col("n_g").cast("double"))
    )
    s = r.select("g", "n_g", term.alias("term")).agg(
        F.count("*").alias("k_groups"),
        F.sum("n_g").alias("n_total"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(g, term))), "
            "cast(0 as double), (acc, x) -> acc + x.term)"
        ).alias("rank_sq"),
    )
    # 1-row x 1-row scalar cross join (Catalyst broadcasts it)
    s = s.crossJoin(ties)
    n_d = F.col("n_total").cast("double")
    h = 12 / (n_d * (n_d + 1)) * F.col("rank_sq") - 3 * (n_d + 1)
    corr = 1 - F.col("tie_cubes").cast("double") / (n_d * n_d * n_d - n_d)
    return s.select(
        "k_groups",
        "n_total",
        "tie_cubes",
        F.when(F.col("n_total") > 1, h).alias("h_stat"),
        F.when((F.col("n_total") > 1) & (corr > 0), h / corr).alias("h_tie_corrected"),
    )


# ---------------------------------------------------------------------------
# Cochran-Armitage trend test: ordered tiers vs binary outcome
# ---------------------------------------------------------------------------
@q(
    "ab_cochran_armitage",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS BIGINT) AS converted
        FROM events GROUP BY user_id),
    tiers AS (
        SELECT CASE WHEN n_events <= 5 THEN 0
                    WHEN n_events <= 10 THEN 1
                    WHEN n_events <= 20 THEN 2
                    ELSE 3 END AS tier,
               converted
        FROM per_user),
    ct AS (
        SELECT tier,
               CAST(count(*) AS BIGINT) AS n_t,
               CAST(sum(converted) AS BIGINT) AS conv_t
        FROM tiers GROUP BY tier),
    s AS (
        SELECT CAST(sum(n_t) AS BIGINT) AS n,
               CAST(sum(conv_t) AS BIGINT) AS r,
               CAST(sum(tier * n_t) AS BIGINT) AS sw,
               CAST(sum(tier * tier * n_t) AS BIGINT) AS sw2,
               CAST(sum(tier * conv_t) AS BIGINT) AS swr
        FROM ct)
    SELECT n, r, sw, sw2, swr,
           -- T = sum(w_i (r_i - n_i R/N)); var = (R/N)(1-R/N)(sw2 - sw^2/N)
           CASE WHEN n > 0 AND r > 0 AND r < n
                     AND (CAST(sw2 AS DOUBLE) - CAST(sw AS DOUBLE)
                          * CAST(sw AS DOUBLE) / CAST(n AS DOUBLE)) > 0
                THEN (CAST(swr AS DOUBLE) - CAST(sw AS DOUBLE)
                      * CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
                     / sqrt(CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
                            * (1 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
                            * (CAST(sw2 AS DOUBLE) - CAST(sw AS DOUBLE)
                               * CAST(sw AS DOUBLE) / CAST(n AS DOUBLE)))
           END AS z_trend
    FROM s
    """,
    tags=("analytics", "abtest", "stats", "exact"),
)
def ab_cochran_armitage(spark, sf_dir):
    """Cochran-Armitage trend test: is conversion MONOTONICALLY related
    to engagement tier (events per user bucketed 0..3), not merely
    different somewhere (chi-square's question)? The canonical
    dose-response audit for funnels and rollout rings.

    The statistic needs only five exact BIGINTs from the (tier ->
    users, conversions) contingency rollup: N, R, sum(w n), sum(w^2 n),
    sum(w r) with integer scores w = tier. The z closed form (score
    test with variance (R/N)(1-R/N)(Sw2 - Sw^2/N)) is the only double,
    guarded NULL at the degenerate boundaries (no users, all/none
    converted, single tier).

    100 TB posture: one hash rollup to per-user rows (the groupBy
    every funnel metric already pays), one 4-row contingency rollup,
    one 1-row reduce; nothing else moves."""
    per_user = (
        events_tbl(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max((F.col("event_type") == "purchase").cast("long")).alias("converted"),
        )
    )
    tier = (
        F.when(F.col("n_events") <= 5, 0)
        .when(F.col("n_events") <= 10, 1)
        .when(F.col("n_events") <= 20, 2)
        .otherwise(3)
    )
    ct = per_user.groupBy(tier.alias("tier")).agg(
        F.count("*").alias("n_t"), F.sum("converted").alias("conv_t")
    )
    s = ct.agg(
        F.sum("n_t").alias("n"),
        F.sum("conv_t").alias("r"),
        F.sum(F.col("tier") * F.col("n_t")).alias("sw"),
        F.sum(F.col("tier") * F.col("tier") * F.col("n_t")).alias("sw2"),
        F.sum(F.col("tier") * F.col("conv_t")).alias("swr"),
    )
    n_d, r_d = F.col("n").cast("double"), F.col("r").cast("double")
    sw_d, sw2_d, swr_d = (
        F.col("sw").cast("double"),
        F.col("sw2").cast("double"),
        F.col("swr").cast("double"),
    )
    var_w = sw2_d - sw_d * sw_d / n_d
    defined = (F.col("n") > 0) & (F.col("r") > 0) & (F.col("r") < F.col("n"))
    return s.select(
        "n",
        "r",
        "sw",
        "sw2",
        "swr",
        F.when(
            defined & (var_w > 0),
            (swr_d - sw_d * r_d / n_d) / F.sqrt(r_d / n_d * (1 - r_d / n_d) * var_w),
        ).alias("z_trend"),
    )


# ---------------------------------------------------------------------------
# Friedman test: within-block (daily) ranks across event types
# ---------------------------------------------------------------------------
@q(
    "agg_friedman_test",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, event_type AS g,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    k AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS k_t FROM daily),
    complete_days AS (
        SELECT d FROM daily GROUP BY d
        HAVING count(*) = (SELECT k_t FROM k)),
    ranked AS (
        SELECT daily.d, g,
               2 * rank() OVER (PARTITION BY daily.d ORDER BY cents)
               + CAST(count(*) OVER (PARTITION BY daily.d, cents) AS BIGINT)
               - 1 AS dr
        FROM daily JOIN complete_days ON daily.d = complete_days.d),
    pergroup AS (
        SELECT g, CAST(sum(dr) AS BIGINT) AS s_j FROM ranked GROUP BY g),
    tot AS (
        SELECT (SELECT k_t FROM k) AS k_t,
               CAST(count(DISTINCT d) AS BIGINT) AS n_b,
               CAST(sum(dr * dr) AS BIGINT) AS a2
        FROM ranked),
    num AS (
        SELECT CAST(sum((s_j - (SELECT n_b * (k_t + 1) FROM tot))
                        * (s_j - (SELECT n_b * (k_t + 1) FROM tot)))
                   AS BIGINT) AS ss_num
        FROM pergroup)
    SELECT k_t AS k_treatments, n_b AS n_blocks, ss_num,
           a2 - n_b * k_t * (k_t + 1) * (k_t + 1) AS tie_denom,
           -- ONE raw IEEE division of exact integers (NULL when every
           -- block is fully tied and the denominator is 0)
           CASE WHEN a2 - n_b * k_t * (k_t + 1) * (k_t + 1) > 0
                THEN (k_t - 1) * CAST(ss_num AS DOUBLE)
                     / CAST(a2 - n_b * k_t * (k_t + 1) * (k_t + 1) AS DOUBLE)
           END AS q_stat
    FROM tot, num
    """,
    tags=("analytics", "stats", "exact", "rank"),
)
def agg_friedman_test(spark, sf_dir):
    """Friedman test — the within-block rank ANOVA: do event types
    differ in daily revenue once each DAY serves as its own control
    block? (The repeated-measures sibling of agg_kruskal_wallis, robust
    to day-level shocks that hit every type at once.)

    Exactness: the block metric is the BIGINT cents rollup (never an
    order-sensitive float sum); within-day doubled midranks
    2r = 2*rank + t - 1 are integers; and the tie-corrected statistic
    reduces to Q = (k-1) * sum_j (S_j - n(k+1))^2 / (A2 - n k (k+1)^2)
    with BOTH sides BIGINT — one raw IEEE division total, so the two
    engines agree bit-for-bit with no rounding anywhere.

    100 TB posture: raw events reduce to the (day, type) calendar-
    bounded rollup (<= 31 x k rows per month of data) before any
    window runs — the Mann-Kendall precedent; incomplete blocks (days
    missing a type) are excluded per the textbook definition."""
    daily = (
        events_tbl(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .groupBy(
            F.col("ts").cast("date").alias("d"),
            F.col("event_type").alias("g"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    )
    k_t = daily.select(F.countDistinct("g").alias("k_t"))
    complete = (
        daily.groupBy("d")
        .agg(F.count("*").alias("n_types"))
        .join(F.broadcast(k_t), F.col("n_types") == F.col("k_t"))
        .select("d")
    )
    from pyspark.sql import Window

    wday = Window.partitionBy("d").orderBy("cents")
    wtie = Window.partitionBy("d", "cents")
    ranked = (
        daily.join(complete, "d")
        .withColumn("dr", 2 * F.rank().over(wday) + F.count("*").over(wtie) - 1)
    )
    pergroup = ranked.groupBy("g").agg(F.sum("dr").alias("s_j"))
    tot = ranked.agg(
        F.countDistinct("d").alias("n_b"),
        F.sum(F.col("dr") * F.col("dr")).alias("a2"),
    ).crossJoin(F.broadcast(k_t))
    num = (
        pergroup.crossJoin(F.broadcast(tot.select("n_b", "k_t")))
        .select(
            (
                (F.col("s_j") - F.col("n_b") * (F.col("k_t") + 1))
                * (F.col("s_j") - F.col("n_b") * (F.col("k_t") + 1))
            ).alias("sq")
        )
        .agg(F.sum("sq").alias("ss_num"))
    )
    out = tot.crossJoin(num)
    denom = F.col("a2") - F.col("n_b") * F.col("k_t") * (F.col("k_t") + 1) * (F.col("k_t") + 1)
    return out.select(
        F.col("k_t").alias("k_treatments"),
        F.col("n_b").alias("n_blocks"),
        "ss_num",
        denom.alias("tie_denom"),
        F.when(
            denom > 0,
            (F.col("k_t") - 1) * F.col("ss_num").cast("double") / denom.cast("double"),
        ).alias("q_stat"),
    )
