"""Relational wave 18 (round 9): distribution-drift statistics and
sequence analytics that close the "is my data still the same data"
gap a production pipeline monitors between ingest and training.

- ``agg_ks_shard``: two-sample Kolmogorov-Smirnov D per user shard —
  the standard nonparametric drift test between two event populations.
- ``agg_chi2_cells``: chi-square contingency cells (observed/expected/
  contribution) for event_type x user parity — independence audit.
- ``agg_entropy_mix``: Shannon entropy of the event-type mix per shard
  — collapse of mix entropy is the classic upstream-bug signal.
- ``agg_hhi_concentration``: Herfindahl-Hirschman concentration of
  supplier revenue per nation — vendor-concentration risk rollup.
- ``ev_updown_streaks``: longest strictly-increasing value run per
  user (gaps-and-islands) — momentum/anomaly sequence feature.
- ``ev_gap_histogram``: minute-bucketed inter-event gap histogram per
  event type — arrival-process fingerprint.

Bit-exactness rules (tests/test_oracle.py): counts and bucket ids are
exact integers; ratio outputs are the SAME operation tree in both
engines over identical integers (bit-identical IEEE, agg_corr_exact
discipline); ln/variance-bearing outputs round to 6 decimals (the
repo's ln/log discipline) because their sums are summation-order
dependent.

Reference parity: the reference exposes raw sample scans only
(cpp/src/reader.h); these are relational extensions in its data model.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl, tbl

_N_SHARDS = 8


@q(
    "agg_ks_shard",
    oracle=f"""
    WITH ev AS (
        SELECT user_id % {_N_SHARDS} AS shard, value, event_type
        FROM events WHERE event_type IN ('purchase', 'view')),
    g AS (
        SELECT shard, value,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c1,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2
        FROM ev GROUP BY shard, value),
    c AS (
        SELECT shard,
               sum(c1) OVER (PARTITION BY shard ORDER BY value) AS cum1,
               sum(c2) OVER (PARTITION BY shard ORDER BY value) AS cum2,
               sum(c1) OVER (PARTITION BY shard) AS tot1,
               sum(c2) OVER (PARTITION BY shard) AS tot2
        FROM g)
    SELECT shard,
           max(abs(CAST(cum1 AS DOUBLE) / tot1 - CAST(cum2 AS DOUBLE) / tot2)) AS ks_d,
           CAST(max(tot1) AS BIGINT) AS n_purchase,
           CAST(max(tot2) AS BIGINT) AS n_view
    FROM c WHERE tot1 > 0 AND tot2 > 0
    GROUP BY shard
    """,
    tags=("agg", "stats", "drift"),
)
def agg_ks_shard(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov statistic per user shard: the max
    vertical distance between the empirical CDFs of purchase vs view
    values — the drift test a pipeline runs between a reference and a
    candidate slice. Each D is a max over |c1/n1 - c2/n2| where every
    operand is an exact integer and both engines evaluate the same two
    divisions and subtraction per distinct value, so the raw doubles
    are bit-identical with no rounding in the gate.

    100 TB posture (round 11): one hash agg by (shard, value); the CDF
    cumulative counts then run through stitched_prefix_sum with a
    floor(value) bucket — the fixed _N_SHARDS key alone capped the old
    per-shard window at _N_SHARDS tasks over a rollup whose size grows
    with distinct values — and the per-shard totals are a tiny groupBy
    joined back (AQE broadcasts the _N_SHARDS-row side) instead of an
    unordered whole-partition window."""
    from river_spark.operators.stitched_lag import stitched_prefix_sum

    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("event_type").isin("purchase", "view"))
        .select((F.col("user_id") % _N_SHARDS).alias("shard"), "value", "event_type")
    )
    g = ev.groupBy("shard", "value").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("c2"),
    )
    vbucket = F.expr("cast(floor(value) as long)")
    cums = stitched_prefix_sum(
        g,
        key_cols=["shard"],
        order_cols=["value"],
        value_col=["c1", "c2"],
        bucket=vbucket,
        out_col=["cum1", "cum2"],
    )
    tot = g.groupBy("shard").agg(
        F.sum("c1").alias("tot1"), F.sum("c2").alias("tot2")
    )
    c = cums.join(tot, "shard").select("shard", "cum1", "cum2", "tot1", "tot2")
    # KS is undefined when either population is empty in a shard; drop
    # such shards BEFORE dividing (under ANSI Spark a /0 would throw
    # where DuckDB yields NULL)
    c = c.filter((F.col("tot1") > 0) & (F.col("tot2") > 0))
    return c.groupBy("shard").agg(
        F.max(
            F.abs(F.col("cum1").cast("double") / F.col("tot1")
                  - F.col("cum2").cast("double") / F.col("tot2"))
        ).alias("ks_d"),
        F.max("tot1").alias("n_purchase"),
        F.max("tot2").alias("n_view"),
    )


@q(
    "agg_chi2_cells",
    oracle="""
    WITH ev AS (
        SELECT event_type, user_id % 2 AS parity FROM events),
    o AS (
        SELECT event_type, parity, count(*) AS observed FROM ev GROUP BY 1, 2),
    t AS (
        SELECT event_type, parity, observed,
               sum(observed) OVER (PARTITION BY event_type) AS row_tot,
               sum(observed) OVER (PARTITION BY parity) AS col_tot,
               sum(observed) OVER () AS n
        FROM o)
    SELECT event_type, parity, observed,
           CAST(row_tot * col_tot AS DOUBLE) / n AS expected,
           (observed - CAST(row_tot * col_tot AS DOUBLE) / n)
             * (observed - CAST(row_tot * col_tot AS DOUBLE) / n)
             / (CAST(row_tot * col_tot AS DOUBLE) / n) AS contrib
    FROM t
    """,
    tags=("agg", "stats", "independence"),
)
def agg_chi2_cells(spark, sf_dir):
    """Chi-square contingency CELLS for event_type x user parity:
    observed count, expected count under independence, and the cell's
    chi-square contribution. Emitting per-cell rows instead of the
    summed statistic keeps the output bit-exact without rounding (the
    sum over cells is summation-order dependent; each cell is one
    integer-fed expression tree evaluated identically by both engines)
    — and the cells are what an analyst inspects anyway.

    100 TB posture: one hash agg to the 10-cell table; the windows run
    over 10 rows. The OVER () total is fine here because its input is
    the aggregated cell table, not the fact table."""
    ev = tbl(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 2).alias("parity")
    )
    o = ev.groupBy("event_type", "parity").agg(F.count("*").alias("observed"))
    t = o.select(
        "event_type",
        "parity",
        "observed",
        F.sum("observed").over(Window.partitionBy("event_type")).alias("row_tot"),
        F.sum("observed").over(Window.partitionBy("parity")).alias("col_tot"),
        F.sum("observed").over(Window.partitionBy()).alias("n"),
    )
    expected = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col("n")
    return t.select(
        "event_type",
        "parity",
        "observed",
        expected.alias("expected"),
        ((F.col("observed") - expected) * (F.col("observed") - expected) / expected).alias(
            "contrib"
        ),
    )


@q(
    "agg_entropy_mix",
    oracle=f"""
    WITH c AS (
        SELECT user_id % {_N_SHARDS} AS shard, event_type, count(*) AS cnt
        FROM events GROUP BY 1, 2),
    p AS (
        SELECT shard, cnt,
               CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY shard) AS p
        FROM c)
    SELECT shard,
           round(sum(-p * ln(p)), 6) AS entropy_nats,
           CAST(sum(cnt) AS BIGINT) AS n_events
    FROM p GROUP BY shard
    """,
    tags=("agg", "stats", "entropy"),
)
def agg_entropy_mix(spark, sf_dir):
    """Shannon entropy (nats) of the event-type mix per user shard —
    the mix-collapse monitor: a stuck producer drives a shard's
    entropy toward 0 long before volume alarms fire. p is an exact
    integer ratio; the 5-term -p*ln(p) sum takes the repo's ln
    discipline (round 6) because ln is libm-dependent and the sum is
    order-dependent.

    100 TB posture: one hash agg to shard x type (40 rows), window and
    final agg over those 40."""
    c = tbl(spark, sf_dir, "events").groupBy(
        (F.col("user_id") % _N_SHARDS).alias("shard"), "event_type"
    ).agg(F.count("*").alias("cnt"))
    p = c.select(
        "shard",
        "cnt",
        (F.col("cnt").cast("double") / F.sum("cnt").over(Window.partitionBy("shard"))).alias("p"),
    )
    return p.groupBy("shard").agg(
        F.round(F.sum(-F.col("p") * F.log("p")), 6).alias("entropy_nats"),
        F.sum("cnt").alias("n_events"),
    )


@q(
    "agg_hhi_concentration",
    oracle="""
    WITH rev AS (
        SELECT s.s_nationkey AS nk, l.l_suppkey,
               sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cents
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2),
    sh AS (
        SELECT nk, cents,
               CAST(cents AS DOUBLE) / sum(cents) OVER (PARTITION BY nk) AS share
        FROM rev)
    SELECT n.n_name AS nation,
           round(sum(share * share), 6) AS hhi,
           CAST(count(*) AS BIGINT) AS n_suppliers
    FROM sh JOIN nation n ON sh.nk = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("agg", "stats", "concentration"),
)
def agg_hhi_concentration(spark, sf_dir):
    """Herfindahl-Hirschman index of supplier revenue concentration per
    nation: sum of squared revenue shares — the vendor-concentration
    risk number (1/HHI is the "effective supplier count"). Revenue is
    cents-integer first (the repo's integer-first discipline), shares
    are exact integer ratios, and the squared-share sum rounds to 6
    (order-dependent across ~hundreds of suppliers).

    100 TB posture: fact aggregates by (nation, supplier) BEFORE any
    window; the SF-scaling supplier dim is unhinted (AQE decides) while
    the fixed 25-row nation dim broadcasts; the share window runs on
    the supplier-grain rollup, not the fact."""
    li = tbl(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    sup = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nk"), "l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("cents")
        )
    )
    sh = rev.select(
        "nk",
        (F.col("cents").cast("double") / F.sum("cents").over(Window.partitionBy("nk"))).alias(
            "share"
        ),
    )
    return (
        sh.join(F.broadcast(nat), sh.nk == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("share") * F.col("share")), 6).alias("hhi"),
            F.count("*").alias("n_suppliers"),
        )
    )


@q(
    "ev_updown_streaks",
    oracle="""
    WITH s AS (
        SELECT user_id, value, ts, event_id,
               CASE WHEN value > lag(value) OVER w THEN 0 ELSE 1 END AS brk
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    isl AS (
        SELECT user_id,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS island
        FROM s),
    runs AS (
        SELECT user_id, island, count(*) AS run_len
        FROM isl GROUP BY user_id, island)
    SELECT user_id,
           CAST(max(run_len) AS BIGINT) AS longest_up_run,
           CAST(count(*) AS BIGINT) AS n_runs
    FROM runs GROUP BY user_id
    """,
    tags=("events", "window", "gaps_islands"),
)
def ev_updown_streaks(spark, sf_dir):
    """Longest strictly-increasing value streak per user — the
    gaps-and-islands idiom (break flag -> running island id -> run
    lengths) that powers momentum features and monotone-anomaly
    detection. All outputs are exact integers; (ts, event_id) ordering
    makes the islands deterministic under timestamp ties.

    100 TB posture: both windows and both aggs partition by user_id —
    one shuffle total, no global ordering anywhere."""
    ev = events_tbl(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("value") > F.lag("value").over(w), 0).otherwise(1).alias("brk"),
    )
    isl = s.select("user_id", F.sum("brk").over(w).alias("island"))
    runs = isl.groupBy("user_id", "island").agg(F.count("*").alias("run_len"))
    return runs.groupBy("user_id").agg(
        F.max("run_len").alias("longest_up_run"),
        F.count("*").alias("n_runs"),
    )


_GAP_BUCKET_US = 60_000_000  # 1 minute
_GAP_BUCKET_CAP = 30


@q(
    "ev_gap_histogram",
    oracle=f"""
    WITH g AS (
        SELECT event_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
        FROM events)
    SELECT event_type,
           CAST(least(gap_us // {_GAP_BUCKET_US}, {_GAP_BUCKET_CAP}) AS BIGINT)
             AS gap_minutes,
           count(*) AS n
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY 1, 2
    """,
    tags=("events", "window", "histogram"),
)
def ev_gap_histogram(spark, sf_dir):
    """Minute-bucketed histogram of inter-arrival gaps per event type
    (capped at 30 min) — the arrival-process fingerprint used to spot
    producer stalls and retry storms. Gaps are integer microseconds
    (epoch_us subtraction, the cookbook's tie-free grain), buckets are
    integer floor-division: exact in both engines.

    100 TB posture: event_type is a ~5-value key, so a plain per-type
    lag window would put each type's entire history in ONE task; the
    lag runs through operators/stitched_lag.py with a daily bucket
    (types x days parallelism, property-tested row-identical to the
    plain window, so the plain-SQL oracle holds)."""
    from river_spark.operators.stitched_lag import stitched_lag

    ev = events_tbl(spark, sf_dir)
    # ts may be TIMESTAMP_NTZ (unix_micros rejects it); the cast to
    # timestamp pins the epoch interpretation either way
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
        .select(
            "event_type", (F.col("us") - F.col("prev_us")).alias("gap_us")
        )
        .filter(F.col("gap_us").isNotNull())
    )
    # integer division (div), not floor(double-div): the quotient must be
    # exact at every magnitude, like the oracle's //
    bucket = F.least(
        F.expr(f"gap_us div {_GAP_BUCKET_US}"), F.lit(_GAP_BUCKET_CAP)
    ).cast("bigint")
    return g.groupBy("event_type", bucket.alias("gap_minutes")).agg(
        F.count("*").alias("n")
    )
