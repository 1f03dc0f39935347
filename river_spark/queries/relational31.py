"""Relational wave 31 (round 11): single-pass resampling statistics,
sketch-based set cardinality, and table reconciliation — the remaining
"statistics at 100 TB" primitives the registry lacked:

- ``agg_bootstrap_ci``: Poisson bootstrap of the mean. Classical
  bootstrap resampling (sample n rows WITH replacement, B times) is
  unrunnable at 100 TB — it needs n known up front and a shuffle per
  resample. The Poisson bootstrap replaces the multinomial resample
  weights with independent Poisson(1) draws per (row, replicate), which
  makes the whole thing ONE streaming aggregation: each row contributes
  a deterministic hash-derived weight to each of B=32 replicate sums.
  The weight comes from an integer inverse-CDF table (32-bit hash vs
  precomputed Poisson(1) cumulative thresholds), so both engines draw
  bit-identical weights with zero floating-point in the sampling path.
- ``agg_kmv_overlap``: KMV ("k minimum values" / bottom-k theta) sketch
  per audience segment, with union/intersection estimates per segment
  pair — the mergeable-sketch answer to ``ev_audience_overlap``'s exact
  join. D-hat = (K-1)*M/theta where theta is the K-th smallest of M=2^60
  hash values; union sketches compose by merging the bottom-k sets, and
  intersection is inclusion-exclusion. Exact legs are kept alongside as
  validation columns (the fixture is small enough); production drops
  them — that is the point of the sketch.
- ``agg_delta_method_ratio``: ratio-metric standard error via the delta
  method with user-level clustering — the experimentation-platform
  staple for "revenue per event" style metrics where the randomization
  unit (user) differs from the analysis unit (event). Exact integer
  sufficient statistics (sum s_i, sum n_i, sum s_i^2, sum s_i*n_i,
  sum n_i^2) feed one closed-form linearization.
- ``dq_table_checksum``: order-independent bucketed reconciliation
  checksum over lineitem — 256 (bucket, count, sum-of-row-hashes mod p)
  rows that diff two replicas of a 100 TB table in one scan each with
  no sort and a 256-key shuffle. Every column is rendered through an
  engine-stable canonical form (integers, cents, fixed date format).
- ``ev_twap``: time-weighted average value per (event_type, day) —
  VWAP's sibling where the weight is the exact microsecond dwell time
  until the next event (day end for the last), not the traded volume.

Bit-exactness follows the repo convention: integer sufficient
statistics everywhere, doubles only in the final identical operation
tree; the one multiply-add chain at FMA-contraction risk
(delta-method variance) is rounded to 6 decimals.

Reference parity: the reference engine (pbotros/river) has no
relational/statistics layer (its surface is the stream transport,
/root/reference/cpp/src/writer.cpp); these extend the analytics
surface the brief requires.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl, spread_scan, tbl

# Poisson(1) inverse-CDF thresholds over the 32-bit hash space:
# floor(CDF_k * 2^32) for k = 0..7 (k=8 catches the ~1e-5 tail). The
# SAME integer literals appear in the Spark expression and the DuckDB
# oracle, so the sampling path has no floating point at all.
_POIS_T = (
    1580030168,
    3160060337,
    3950075421,
    4213413783,
    4279248373,
    4292415291,
    4294609777,
    4294923276,
)

_B = 32  # bootstrap replicates

_U32 = (
    "cast(conv(substring(md5(concat('boot~', cast(b as string), '~', "
    "cast(o_orderkey as string))), 1, 8), 16, 10) as bigint)"
)


def _pois_case_sql(var: str) -> str:
    parts = [
        f"WHEN {var} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    ]
    return "CASE " + " ".join(parts) + f" ELSE {len(_POIS_T)} END"


# ---------------------------------------------------------------------------
# Poisson bootstrap: B replicate means in one streaming aggregation
# ---------------------------------------------------------------------------
@q(
    "agg_bootstrap_ci",
    oracle=f"""
    WITH c AS (
        SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
    e AS (
        SELECT o_orderkey, cents, b
        FROM c, (SELECT unnest(generate_series(0, {_B - 1})) AS b)),
    h AS (
        SELECT b, cents,
               ('0x' || substr(md5('boot~' || CAST(b AS VARCHAR) || '~'
                   || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT AS u32
        FROM e),
    w AS (
        SELECT b, cents, CAST({_pois_case_sql('u32')} AS BIGINT) AS w
        FROM h)
    SELECT CAST(b AS BIGINT) AS b,
           CAST(sum(w) AS BIGINT) AS n_eff,
           CAST(sum(w * cents) AS BIGINT) AS s_cents,
           CAST(sum(w * cents) AS BIGINT)
               / (100.0 * nullif(CAST(sum(w) AS BIGINT), 0)) AS boot_mean_usd
    FROM w GROUP BY b
    """,
    tags=("agg", "stats", "bootstrap", "sampling"),
)
def agg_bootstrap_ci(spark, sf_dir):
    """Poisson bootstrap of mean(o_totalprice): 32 replicate means from
    ONE pass over orders. Replicate b's weight for a row is
    Poisson(1)-distributed, drawn deterministically by comparing a
    32-bit md5 of (b, o_orderkey) against precomputed integer CDF
    thresholds — the standard trick that turns bootstrap resampling
    into a streaming, mergeable aggregation (no per-resample shuffle,
    no need to know n). The spread of the 32 ``boot_mean_usd`` values
    IS the sampling distribution of the mean; a CI is its quantiles.

    100 TB posture: the explode is a row-local 32x flatMap feeding a
    map-side-combinable hash agg on 32 keys — each task emits at most
    32 partial rows, so the shuffle is O(tasks*B) regardless of table
    size. Weights are integers; sums are exact BIGINT (cents*w ~ 1e7;
    DECIMAL(38) at true row counts, the standard switch); the only
    double is the final division, the identical op tree both engines."""
    c = tbl(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    e = c.select(
        "o_orderkey",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b"),
    ).withColumn("u32", F.expr(_U32))
    # nested WHEN chain over the integer thresholds, innermost-first so
    # the checks run k = 0..7 in order (same shape as the oracle CASE)
    w = F.lit(len(_POIS_T))
    for k, t in reversed(list(enumerate(_POIS_T))):
        w = F.when(F.col("u32") < t, F.lit(k)).otherwise(w)
    agg = (
        e.select(
            F.col("b").cast("bigint").alias("b"),
            w.cast("bigint").alias("w"),
            "cents",
        )
        .groupBy("b")
        .agg(
            F.sum("w").alias("n_eff"),
            F.sum(F.col("w") * F.col("cents")).alias("s_cents"),
        )
    )
    return agg.select(
        "b",
        "n_eff",
        "s_cents",
        (
            F.col("s_cents")
            / (100.0 * F.nullif(F.col("n_eff"), F.lit(0)))
        ).alias("boot_mean_usd"),
    )


# ---------------------------------------------------------------------------
# KMV (bottom-k) sketch: distinct + union/intersection per segment pair
# ---------------------------------------------------------------------------
_K = 64
_M_DOUBLE = "(63.0 * 1152921504606846976)"  # (K-1) * 2^60, exact in double
_KMV_H_SQL = (
    "('0x' || substr(md5('kmv~' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT"
)
_KMV_H_SPARK = (
    "cast(conv(substring(md5(concat('kmv~', cast(user_id as string))), "
    "1, 15), 16, 10) as bigint)"
)


@q(
    "agg_kmv_overlap",
    oracle=f"""
    WITH d AS (
        SELECT DISTINCT event_type, {_KMV_H_SQL} AS h
        FROM events WHERE user_id IS NOT NULL),
    sk AS (
        SELECT event_type, h
        FROM (SELECT event_type, h,
                     row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
              FROM d)
        WHERE rn <= {_K}),
    per AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS k_n,
               CAST(max(h) AS BIGINT) AS theta
        FROM sk GROUP BY event_type),
    est AS (
        SELECT event_type, k_n,
               CASE WHEN k_n < {_K} THEN CAST(k_n AS DOUBLE)
                    ELSE {_M_DOUBLE} / CAST(theta AS DOUBLE) END AS est
        FROM per),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               a.est AS est_a, b.est AS est_b
        FROM est a JOIN est b ON a.event_type < b.event_type),
    ucand AS (
        SELECT DISTINCT p.type_a, p.type_b, s.h
        FROM pairs p JOIN sk s
          ON s.event_type = p.type_a OR s.event_type = p.type_b),
    usk AS (
        SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS k_u,
               CAST(max(h) AS BIGINT) AS theta_u
        FROM (SELECT type_a, type_b, h,
                     row_number() OVER (PARTITION BY type_a, type_b
                                        ORDER BY h) AS rn
              FROM ucand)
        WHERE rn <= {_K}
        GROUP BY type_a, type_b),
    du AS (
        SELECT DISTINCT event_type, user_id
        FROM events WHERE user_id IS NOT NULL),
    exact AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS exact_n
        FROM du GROUP BY event_type),
    exact_i AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS exact_inter
        FROM du a JOIN du b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2)
    SELECT p.type_a, p.type_b, u.k_u,
           p.est_a, p.est_b,
           CASE WHEN u.k_u < {_K} THEN CAST(u.k_u AS DOUBLE)
                ELSE {_M_DOUBLE} / CAST(u.theta_u AS DOUBLE) END AS est_union,
           p.est_a + p.est_b
             - CASE WHEN u.k_u < {_K} THEN CAST(u.k_u AS DOUBLE)
                    ELSE {_M_DOUBLE} / CAST(u.theta_u AS DOUBLE)
               END AS est_inter,
           ea.exact_n AS exact_a, eb.exact_n AS exact_b,
           coalesce(ei.exact_inter, 0) AS exact_inter
    FROM pairs p
    JOIN usk u ON u.type_a = p.type_a AND u.type_b = p.type_b
    JOIN exact ea ON ea.event_type = p.type_a
    JOIN exact eb ON eb.event_type = p.type_b
    LEFT JOIN exact_i ei ON ei.type_a = p.type_a AND ei.type_b = p.type_b
    """,
    tags=("agg", "sketch", "distinct", "audience"),
)
def agg_kmv_overlap(spark, sf_dir):
    """KMV (bottom-k / theta) sketch audience overlap: per event_type,
    keep the K=64 smallest 60-bit hashes of user_id; D-hat =
    (K-1)*2^60/theta estimates the distinct count, merged sketches
    estimate unions, and inclusion-exclusion gives the intersection —
    the mergeable alternative to ev_audience_overlap's exact self-join.
    Exact legs ride along as validation columns; production drops them
    (the sketch exists so the exact join never runs at 100 TB).

    100 TB posture: the bottom-k is computed in two phases — row_number
    within (event_type, pmod(h,16)) salted sub-buckets first (each a
    fine-keyed window), then the global k-min over the <= 16*K
    survivors per type (bounded rows). The k-min of per-bucket k-mins
    is exactly the global k-min, so the result is identical to the
    oracle's single-phase window while never sorting a full segment's
    distinct set in one task. Everything downstream of ``sk`` operates
    on <= K*|types| rows."""
    K = _K
    ev = (
        events_tbl(spark, sf_dir)
        .where(F.col("user_id").isNotNull())
        .select("event_type", F.expr(_KMV_H_SPARK).alias("h"))
    )
    d = ev.distinct()
    w1 = Window.partitionBy("event_type", F.pmod(F.col("h"), F.lit(16))).orderBy("h")
    c1 = (
        d.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= K)
        .drop("rn")
    )
    w2 = Window.partitionBy("event_type").orderBy("h")
    sk = (
        c1.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= K)
        .drop("rn")
    )
    m = F.lit(63.0) * F.lit(1152921504606846976)
    per = sk.groupBy("event_type").agg(
        F.count("*").alias("k_n"), F.max("h").alias("theta")
    )
    est = per.select(
        "event_type",
        "k_n",
        F.when(F.col("k_n") < K, F.col("k_n").cast("double"))
        .otherwise(m / F.col("theta").cast("double"))
        .alias("est"),
    )
    pairs = (
        est.alias("a")
        .join(est.alias("b"), F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.col("a.est").alias("est_a"),
            F.col("b.est").alias("est_b"),
        )
    )
    ucand = (
        pairs.select("type_a", "type_b")
        .join(
            sk,
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .select("type_a", "type_b", "h")
        .distinct()
    )
    wu = Window.partitionBy("type_a", "type_b").orderBy("h")
    usk = (
        ucand.withColumn("rn", F.row_number().over(wu))
        .where(F.col("rn") <= K)
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("k_u"), F.max("h").alias("theta_u"))
    )
    est_union = (
        F.when(F.col("k_u") < K, F.col("k_u").cast("double"))
        .otherwise(m / F.col("theta_u").cast("double"))
    )
    du = (
        events_tbl(spark, sf_dir)
        .where(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
    )
    exact = du.groupBy("event_type").agg(F.count("*").alias("exact_n"))
    exact_i = (
        du.alias("a")
        .join(
            du.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("exact_inter"))
    )
    return (
        pairs.join(usk, ["type_a", "type_b"])
        .join(exact.withColumnRenamed("event_type", "type_a"), "type_a")
        .withColumnRenamed("exact_n", "exact_a")
        .join(
            exact.withColumnRenamed("event_type", "type_b").withColumnRenamed(
                "exact_n", "exact_b"
            ),
            "type_b",
        )
        .join(exact_i, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "k_u",
            "est_a",
            "est_b",
            est_union.alias("est_union"),
            (F.col("est_a") + F.col("est_b") - est_union).alias("est_inter"),
            "exact_a",
            "exact_b",
            F.coalesce(F.col("exact_inter"), F.lit(0)).alias("exact_inter"),
        )
    )


# ---------------------------------------------------------------------------
# Delta-method SE for a user-clustered ratio metric
# ---------------------------------------------------------------------------
_ARM_SQL = (
    "CASE WHEN (('0x' || substr(md5('exp7~' || CAST(user_id AS VARCHAR)), "
    "1, 8))::BIGINT % 2) = 0 THEN 'A' ELSE 'B' END"
)
_ARM_SPARK = (
    "CASE WHEN pmod(cast(conv(substring(md5(concat('exp7~', "
    "cast(user_id as string))), 1, 8), 16, 10) as bigint), 2) = 0 "
    "THEN 'A' ELSE 'B' END"
)


@q(
    "agg_delta_method_ratio",
    oracle=f"""
    WITH per_user AS (
        SELECT {_ARM_SQL} AS arm,
               user_id,
               CAST(count(*) AS BIGINT) AS n_i,
               CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                   THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END), 0)
                   AS BIGINT) AS s_i
        FROM events WHERE user_id IS NOT NULL
        GROUP BY 1, 2),
    s AS (
        SELECT arm,
               CAST(count(*) AS BIGINT) AS users,
               CAST(sum(n_i) AS BIGINT) AS n_total,
               CAST(sum(s_i) AS BIGINT) AS s_total,
               CAST(sum(s_i * s_i) AS BIGINT) AS ss,
               CAST(sum(s_i * n_i) AS BIGINT) AS sn,
               CAST(sum(n_i * n_i) AS BIGINT) AS nn
        FROM per_user GROUP BY arm)
    SELECT arm, users, n_total, s_total,
           CAST(s_total AS DOUBLE)
               / (100.0 * nullif(CAST(n_total AS DOUBLE), 0.0)) AS ratio_usd,
           round(sqrt(CAST(ss AS DOUBLE)
                      - 2.0 * (CAST(s_total AS DOUBLE) / CAST(n_total AS DOUBLE))
                            * CAST(sn AS DOUBLE)
                      + (CAST(s_total AS DOUBLE) / CAST(n_total AS DOUBLE))
                        * (CAST(s_total AS DOUBLE) / CAST(n_total AS DOUBLE))
                        * CAST(nn AS DOUBLE))
                 / (100.0 * CAST(n_total AS DOUBLE)), 6) AS se_usd
    FROM s
    """,
    tags=("agg", "abtest", "stats", "ratio"),
)
def agg_delta_method_ratio(spark, sf_dir):
    """Revenue-per-event ratio metric with a DELTA-METHOD standard error
    clustered at the user level — the correct uncertainty for ratio
    metrics when users (not events) were randomized into arms (same
    md5 'exp7~' assignment as ab_welch_ttest / ab_mann_whitney_u).
    SE^2 = sum_i (s_i - r*n_i)^2 / N^2, computed from five exact
    integer sufficient statistics per arm (sum s, sum n, sum s^2,
    sum s*n, sum n^2) — the linearization/sandwich form expanded so no
    per-user residual is ever materialized twice.

    100 TB posture: one hash agg on (arm, user) then one on arm — both
    map-side combinable; integer stats widen to DECIMAL(38) at true
    scale. The multiply-add variance chain is at FMA-contraction risk
    (DuckDB contracts, JVM doesn't — agg_moments_cents note), so
    ``se_usd`` is rounded to 6 decimals; ``ratio_usd`` is a pure
    two-integer division and ships raw."""
    per_user = (
        events_tbl(spark, sf_dir)
        .where(F.col("user_id").isNotNull())
        .groupBy(F.expr(_ARM_SPARK).alias("arm"), "user_id")
        .agg(
            F.count("*").alias("n_i"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.round(F.col("value") * 100).cast("bigint"),
                    ).otherwise(F.lit(0))
                ),
                F.lit(0),
            ).alias("s_i"),
        )
    )
    s = per_user.groupBy("arm").agg(
        F.count("*").alias("users"),
        F.sum("n_i").alias("n_total"),
        F.sum("s_i").alias("s_total"),
        F.sum(F.col("s_i") * F.col("s_i")).alias("ss"),
        F.sum(F.col("s_i") * F.col("n_i")).alias("sn"),
        F.sum(F.col("n_i") * F.col("n_i")).alias("nn"),
    )
    nd = F.col("n_total").cast("double")
    r = F.col("s_total").cast("double") / nd
    var_sum = (
        F.col("ss").cast("double")
        - 2.0 * r * F.col("sn").cast("double")
        + r * r * F.col("nn").cast("double")
    )
    return s.select(
        "arm",
        "users",
        "n_total",
        "s_total",
        (
            F.col("s_total").cast("double")
            / (100.0 * F.nullif(nd, F.lit(0.0)))
        ).alias("ratio_usd"),
        F.round(F.sqrt(var_sum) / (100.0 * nd), 6).alias("se_usd"),
    )


# ---------------------------------------------------------------------------
# Order-independent bucketed table checksum (replica reconciliation)
# ---------------------------------------------------------------------------
_CANON_COLS_SQL = (
    "coalesce(CAST(l_orderkey AS VARCHAR), 'N'), "
    "coalesce(CAST(l_partkey AS VARCHAR), 'N'), "
    "coalesce(CAST(l_suppkey AS VARCHAR), 'N'), "
    "coalesce(CAST(l_linenumber AS VARCHAR), 'N'), "
    "coalesce(CAST(CAST(round(l_quantity * 100) AS BIGINT) AS VARCHAR), 'N'), "
    "coalesce(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR), 'N'), "
    "coalesce(CAST(CAST(round(l_discount * 10000) AS BIGINT) AS VARCHAR), 'N'), "
    "coalesce(CAST(CAST(round(l_tax * 10000) AS BIGINT) AS VARCHAR), 'N'), "
    "coalesce(l_returnflag, 'N'), coalesce(l_linestatus, 'N'), "
    "coalesce(strftime(l_shipdate, '%Y-%m-%d'), 'N')"
)
_CANON_COLS_SPARK = (
    "coalesce(cast(l_orderkey as string), 'N'), "
    "coalesce(cast(l_partkey as string), 'N'), "
    "coalesce(cast(l_suppkey as string), 'N'), "
    "coalesce(cast(l_linenumber as string), 'N'), "
    "coalesce(cast(cast(round(l_quantity * 100) as bigint) as string), 'N'), "
    "coalesce(cast(cast(round(l_extendedprice * 100) as bigint) as string), 'N'), "
    "coalesce(cast(cast(round(l_discount * 10000) as bigint) as string), 'N'), "
    "coalesce(cast(cast(round(l_tax * 10000) as bigint) as string), 'N'), "
    "coalesce(l_returnflag, 'N'), coalesce(l_linestatus, 'N'), "
    "coalesce(date_format(l_shipdate, 'yyyy-MM-dd'), 'N')"
)


@q(
    "dq_table_checksum",
    oracle=f"""
    WITH h AS (
        SELECT ('0x' || substr(md5(concat_ws('|', {_CANON_COLS_SQL})),
                1, 15))::BIGINT AS hrow
        FROM lineitem)
    SELECT CAST(hrow % 256 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(hrow % 1000000007) AS BIGINT) AS checksum
    FROM h GROUP BY 1
    """,
    tags=("dq", "checksum", "reconciliation"),
)
def dq_table_checksum(spark, sf_dir):
    """Order-independent reconciliation checksum of lineitem: every row
    renders to an engine-stable canonical string (integer keys, cents/
    basis-point encodings for the doubles, fixed yyyy-MM-dd date, 'N'
    null sentinel), hashes to 60 bits, and lands in one of 256 buckets
    carrying (count, sum of hash mod p). Two replicas of a table agree
    iff all 256 rows agree; a corrupt/missing row pinpoints its bucket.
    This is how you diff a 100 TB table across clusters WITHOUT sorting
    or shuffling the data — one scan each side, 256-row exchange.

    100 TB posture: the checksum is a commutative integer aggregate —
    fully map-side combinable, shuffle is 256 partial rows per task.
    sum(h mod p) stays under int64 to ~9e9 rows per bucket (~2.4e12
    rows total); DECIMAL(38) beyond, the standard switch."""
    # spread_scan (r15): the 11-column canonical render + md5 per row is
    # the query's entire cost and fuses into the scan stage — one row
    # group at bench SFs = one task (measured 2.5 s single-core). A plan
    # no-op at real scale, where one-scan-no-shuffle is the whole point.
    h = spread_scan(tbl(spark, sf_dir, "lineitem"), "l_orderkey").select(
        F.expr(
            "cast(conv(substring(md5(concat_ws('|', "
            + _CANON_COLS_SPARK
            + ")), 1, 15), 16, 10) as bigint)"
        ).alias("hrow")
    )
    return (
        h.groupBy(F.pmod(F.col("hrow"), F.lit(256)).cast("bigint").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.pmod(F.col("hrow"), F.lit(1000000007))).alias("checksum"),
        )
    )


# ---------------------------------------------------------------------------
# Time-weighted average (TWAP): exact microsecond dwell weights
# ---------------------------------------------------------------------------
@q(
    "ev_twap",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               CAST(round(value * 100) AS BIGINT) AS cents,
               epoch_us(ts) AS us,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY event_type, CAST(ts AS DATE)
                   ORDER BY ts, event_id) AS next_us,
               epoch_us(CAST(CAST(ts AS DATE) + INTERVAL 1 DAY
                   AS TIMESTAMP)) AS day_end_us
        FROM events WHERE value IS NOT NULL),
    wt AS (
        SELECT event_type, day, cents,
               coalesce(next_us, day_end_us) - us AS dt_us
        FROM seq)
    SELECT event_type, day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(dt_us) AS BIGINT) AS dwell_us,
           CAST(sum(cents * dt_us) AS BIGINT)
               / (100.0 * nullif(CAST(sum(dt_us) AS BIGINT), 0)) AS twap_usd
    FROM wt GROUP BY event_type, day
    """,
    tags=("events", "window", "market"),
)
def ev_twap(spark, sf_dir):
    """Time-weighted average value per (event_type, day): each event's
    value is weighted by its exact microsecond dwell time until the
    next same-type event that day (day end for the last) — VWAP's
    sibling for state-like metrics (a price/level that HOLDS between
    observations), where row-count averaging over-weights bursts.
    Weights are exact integer microseconds (no second-granular
    boundary-crossing divergence); ties on ts order by event_id so
    both engines pick the same successor.

    100 TB posture: the lead window partitions on (event_type, day) —
    a fine-grained key (types x days), never a whole type's history in
    one task; the rollup is a map-side-combinable hash agg. Per-group
    sums are bounded by cents_max * 86400e6 ~ 9e15 < 2^63 because a
    day's dwell microseconds total at most one day."""
    ev = (
        events_tbl(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            "event_id",
            "ts",
            F.to_date("ts").alias("d"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    w = Window.partitionBy("event_type", "d").orderBy("ts", "event_id")
    seq = ev.withColumn("next_ts", F.lead("ts").over(w))
    # exact elapsed micros; NTZ-safe (unix_micros rejects TIMESTAMP_NTZ)
    dt_us = F.when(
        F.col("next_ts").isNotNull(),
        F.expr("timestampdiff(MICROSECOND, ts, next_ts)"),
    ).otherwise(
        F.expr(
            "timestampdiff(MICROSECOND, ts, "
            "cast(date_add(d, 1) as timestamp))"
        )
    )
    wt = seq.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "cents",
        dt_us.alias("dt_us"),
    )
    return wt.groupBy("event_type", "day").agg(
        F.count("*").alias("n"),
        F.sum("dt_us").alias("dwell_us"),
        (
            F.sum(F.col("cents") * F.col("dt_us"))
            / (100.0 * F.nullif(F.sum("dt_us"), F.lit(0)))
        ).alias("twap_usd"),
    )
