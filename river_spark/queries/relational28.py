"""Relational wave 28 (round 10): arrival-process statistics — Goh-
Barabasi burstiness, inter-event gap entropy, day-over-day deltas, and
power-user concentration.

Bit-exactness rules (tests/test_oracle.py): gaps are exact integer
SECONDS (microsecond diff, integer-divided — the cookbook second-grain
rule), so the sum/sum-of-squares accumulators are exact BIGINTs (gap <=
~1e6 s, s2 <= n * 1e12 — no overflow); the one n*s2 product that COULD
overflow under ANSI casts to double first (cookbook rule). ln-bearing
sums and the sqrt-bearing burstiness ratio take round-6; zero-able
denominators take nullif in BOTH engines.

Reference parity: none — event-stream analytics over the reference's
ingested-parquet data model.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl

_GAP_SECONDS = (
    "timestampdiff(MICROSECOND, lag(ts) OVER "
    "(PARTITION BY event_type ORDER BY ts, event_id), ts) div 1000000"
)

_GAP_SECONDS_DUCK = (
    "date_diff('microsecond', lag(ts) OVER "
    "(PARTITION BY event_type ORDER BY ts, event_id), ts) // 1000000"
)


def _gaps(spark, sf_dir):
    """Integer-second inter-event gaps per type (microsecond diff,
    integer-divided — the cookbook second-grain rule), deterministic
    (ts, event_id) order; each type's gapless first event drops out.

    The lag runs through operators/stitched_lag.py with a daily bucket:
    event_type is a ~5-value key, so a plain per-key window would put
    each type's entire 100 TB history in ONE task — the stitched form
    parallelizes across types x days and is property-tested row-
    identical to the plain window, so the plain-SQL oracles hold."""
    from river_spark.operators.stitched_lag import stitched_lag

    ev = events_tbl(spark, sf_dir).select("event_type", "ts", "event_id")
    return (
        stitched_lag(
            ev,
            key_cols=["event_type"],
            order_cols=["ts", "event_id"],
            value_col="ts",
            bucket=F.date_trunc("day", F.col("ts")),
            out_col="prev_ts",
        )
        .select(
            "event_type",
            F.expr("timestampdiff(MICROSECOND, prev_ts, ts) div 1000000").alias(
                "gap"
            ),
        )
        .filter(F.col("gap").isNotNull())
    )


@q(
    "ev_burstiness",
    oracle=f"""
    WITH g AS (
        SELECT event_type, {_GAP_SECONDS_DUCK} AS gap FROM events),
    st AS (
        SELECT event_type, count(*) AS n, sum(gap) AS s1, sum(gap * gap) AS s2
        FROM g WHERE gap IS NOT NULL GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
           round((sqrt(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / n
                  - CAST(s1 AS DOUBLE) / n)
                 / nullif(sqrt(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / n
                          + CAST(s1 AS DOUBLE) / n, 0.0), 6) AS burstiness
    FROM st
    """,
    tags=("events", "timeseries", "burstiness"),
)
def ev_burstiness(spark, sf_dir):
    """Goh-Barabasi burstiness B = (sigma - mu)/(sigma + mu) of the
    inter-event gap distribution per type: B -> -1 for clockwork
    arrivals, 0 for Poisson, +1 for extreme bursts — the
    arrival-process summary that complements ev_fano_factor (count
    dispersion) with GAP dispersion. Gaps are exact integer seconds;
    n/s1/s2 are exact BIGINTs; the single final expression casts to
    double before the n*s2 product (ANSI overflow rule) and takes
    round-6. sigma+mu = 0 only when every gap is zero — nullif-guarded
    in both engines.

    100 TB posture: the gap lag runs bucket-stitched (types x days
    parallelism — see _gaps / operators/stitched_lag.py) and the moment
    accumulators are one partial-aggregatable hash agg on ~5 keys."""
    g = _gaps(spark, sf_dir)
    st = g.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("gap").alias("s1"),
        F.sum(F.col("gap") * F.col("gap")).alias("s2"),
    )
    n_d = F.col("n").cast("double")
    s1_d = F.col("s1").cast("double")
    s2_d = F.col("s2").cast("double")
    sigma = F.sqrt(n_d * s2_d - s1_d * s1_d) / F.col("n")
    mu = s1_d / F.col("n")
    return st.select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        F.round((sigma - mu) / F.nullif(sigma + mu, F.lit(0.0)), 6).alias(
            "burstiness"
        ),
    )


@q(
    "ev_gap_entropy",
    oracle=f"""
    WITH g AS (
        SELECT event_type, {_GAP_SECONDS_DUCK} AS gap FROM events),
    b AS (SELECT event_type, length(printf('%b', gap + 1)) - 1 AS bucket
          FROM g WHERE gap IS NOT NULL),
    c AS (SELECT event_type, bucket, count(*) AS n FROM b GROUP BY 1, 2),
    t AS (SELECT event_type, sum(n) AS tot FROM c GROUP BY 1)
    SELECT c.event_type, CAST(count(*) AS BIGINT) AS n_buckets,
           round(-sum((CAST(n AS DOUBLE) / tot)
                      * ln(CAST(n AS DOUBLE) / tot)), 6) + 0.0
             AS gap_entropy_nats
    FROM c JOIN t ON c.event_type = t.event_type
    GROUP BY c.event_type
    """,
    tags=("events", "timeseries", "entropy"),
)
def ev_gap_entropy(spark, sf_dir):
    """Shannon entropy of the log2-bucketed inter-event gap distribution
    per type: a producer with one rhythm concentrates in a band or two
    (low entropy); mixed human/batch traffic spreads across bands. The
    bucket is floor(log2(gap+1)) via the binary-string-length trick
    (libm-free); bucket counts are exact integers and the entropy sum
    takes round-6 (the entropy-family precedent) plus the `+ 0.0`
    negative-zero normalization — a single-bucket type yields
    -sum(1*ln 1) = -0.0, which round() keeps as -0.0 in DuckDB but
    +0.0 in Spark (the cookbook round(-0.0) rule).

    100 TB posture: the gap lag runs bucket-stitched (types x days
    parallelism — see _gaps), then two tiny hash aggs over
    (type, ~40 buckets)."""
    g = _gaps(spark, sf_dir)
    b = g.select(
        "event_type",
        (F.length(F.bin(F.col("gap") + 1)) - 1).alias("bucket"),
    )
    c = b.groupBy("event_type", "bucket").agg(F.count("*").alias("n"))
    t = c.groupBy("event_type").agg(F.sum("n").alias("tot"))
    p = F.col("n").cast("double") / F.col("tot")
    return (
        c.join(t, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            (F.round(-F.sum(p * F.log(p)), 6) + 0.0).alias("gap_entropy_nats"),
        )
    )


@q(
    "ev_dod_delta",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) AS n
        FROM events GROUP BY 1, 2),
    l AS (
        SELECT event_type, day, n,
               lag(n) OVER (PARTITION BY event_type ORDER BY day) AS prev_n
        FROM d)
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(n AS BIGINT) AS n,
           CAST(n - prev_n AS BIGINT) AS delta,
           CAST(n - prev_n AS DOUBLE) / prev_n AS pct_change
    FROM l WHERE prev_n IS NOT NULL
    """,
    tags=("events", "timeseries", "delta"),
)
def ev_dod_delta(spark, sf_dir):
    """Day-over-day event-count deltas per type (vs the previous
    OBSERVED day — gaps collapse, the standard dashboard lag): exact
    integer counts and deltas, one IEEE division for the percent change
    (prev_n >= 1 by construction, no zero guard needed), day emitted as
    a string (the cookbook timestamp rule).

    100 TB posture: fact -> (type, day) hash agg; the lag window runs
    on the tiny daily table."""
    ev = events_tbl(spark, sf_dir)
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    l = d.withColumn("prev_n", F.lag("n").over(w)).filter(
        F.col("prev_n").isNotNull()
    )
    return l.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n"),
        (F.col("n") - F.col("prev_n")).cast("long").alias("delta"),
        ((F.col("n") - F.col("prev_n")).cast("double") / F.col("prev_n")).alias(
            "pct_change"
        ),
    )


@q(
    "ev_power_user_share",
    oracle="""
    WITH uc AS (
        SELECT event_type, user_id, count(*) AS cnt
        FROM events GROUP BY 1, 2),
    t AS (SELECT event_type, sum(cnt) AS tot, count(*) AS n_users
          FROM uc GROUP BY 1),
    r AS (
        SELECT event_type, cnt,
               sum(cnt) OVER (PARTITION BY event_type
                              ORDER BY cnt DESC, user_id) AS cum,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cnt DESC, user_id) AS rk
        FROM uc)
    SELECT r.event_type, CAST(t.n_users AS BIGINT) AS n_users,
           CAST(min(rk) AS BIGINT) AS users_for_80pct,
           CAST(min(rk) AS DOUBLE) / t.n_users AS share_of_users
    FROM r JOIN t ON r.event_type = t.event_type
    WHERE 5 * cum >= 4 * t.tot
    GROUP BY r.event_type, t.n_users
    """,
    tags=("events", "concentration", "pareto"),
)
def ev_power_user_share(spark, sf_dir):
    """Pareto concentration of activity: the smallest user count whose
    events cover >= 80% of each type's volume ("is this an 80/20
    product?"). The cumulative sum runs over the deterministic
    (cnt DESC, user_id) order — bit-exact per the cookbook's
    ordered-window rule — and the 80% threshold is the INTEGER
    inequality 5*cum >= 4*tot, so no double enters until the final
    single division.

    100 TB posture (round 11): (type, user) hash agg, then the
    cumulative sum runs through stitched_prefix_sum over the per-user
    rollup — even the rollup is users-per-type grain, which at real
    scale is hundreds of millions of rows landing in ONE task under a
    plain per-type window. The bucket is struct(-cnt, user_id div 4096)
    — lexicographically monotone in the (cnt DESC, user_id) order, and
    the user-range leg splits the giant cnt=1 tie mass across tasks.
    The rank never materializes: cum is strictly increasing (cnt >= 1),
    so the crossing rank = 1 + count(rows with 5*cum < 4*tot), a plain
    aggregation."""
    from river_spark.operators.stitched_lag import stitched_prefix_sum

    ev = events_tbl(spark, sf_dir)
    uc = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count("*").alias("cnt"))
        .withColumn("neg_cnt", -F.col("cnt"))
    )
    t = uc.groupBy("event_type").agg(
        F.sum("cnt").alias("tot"), F.count("*").alias("n_users")
    )
    r = stitched_prefix_sum(
        uc,
        key_cols=["event_type"],
        order_cols=["neg_cnt", "user_id"],
        value_col="cnt",
        bucket=F.struct(
            F.col("neg_cnt"), F.expr("user_id div 4096").alias("ub")
        ),
        out_col="cum",
    )
    below = (
        r.join(t.select("event_type", "tot"), "event_type")
        .filter(5 * F.col("cum") < 4 * F.col("tot"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_below"))
    )
    return (
        t.join(below, "event_type", "left")
        .select(
            "event_type",
            F.col("n_users").cast("long").alias("n_users"),
            (F.coalesce(F.col("n_below"), F.lit(0)) + 1)
            .cast("long")
            .alias("users_for_80pct"),
            (
                (F.coalesce(F.col("n_below"), F.lit(0)) + 1).cast("double")
                / F.col("n_users")
            ).alias("share_of_users"),
        )
    )
