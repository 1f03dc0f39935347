"""Relational wave 12 (round 8, session 4): closed-form multivariate
regression, decayed lifetime value without float accumulation, and
rolling distinct counts.

- ``agg_ols_multi``: two-feature OLS (price ~ quantity + discount) per
  return flag, solved in closed form from exact integer sufficient
  statistics — distributed regression with no float accumulator and no
  MLlib dependency.
- ``ev_ltv_halflife``: exponentially decayed lifetime value where the
  decay weights are dyadic (powers of 1/2 at integer ages), so the
  whole decayed sum is EXACT integer arithmetic (a shifted-integer
  accumulator) and floats appear only in the final rescale.
- ``ev_rolling_distinct``: trailing-7-day distinct active users per
  day — the sliding-window COUNT DISTINCT that resists naive window
  functions (distinct is not frame-decomposable), done the
  scale-canonical way: distinct day grid x bounded offset explode.

Bit-exactness rules follow tests/test_oracle.py: integer outputs or
identical IEEE expression trees over exact integer inputs.

Reference parity: the reference engine (pbotros/river) has no
relational layer (its surface is the stream transport,
/root/reference/cpp/src/writer.cpp); these extend the analytics surface
the brief requires.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import event_ts, tbl

_LTV_ANCHOR = "1998-01-01"
_LTV_PERIOD_DAYS = 30
_LTV_MAX_AGE = 24  # periods; older events decay to the 2^-24 floor
_ROLL_DAYS = 7


# ---------------------------------------------------------------------------
# Closed-form two-feature OLS from integer sufficient statistics
# ---------------------------------------------------------------------------
@q(
    "agg_ols_multi",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
               CAST(sum(CAST(round(l_discount * 10000) AS BIGINT)) AS BIGINT) AS s2,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sy,
               CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s11,
               CAST(sum(CAST(round(l_discount * 10000) AS BIGINT)
                        * CAST(round(l_discount * 10000) AS BIGINT)) AS BIGINT) AS s22,
               CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(round(l_discount * 10000) AS BIGINT)) AS BIGINT) AS s12,
               CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS s1y,
               CAST(sum(CAST(round(l_discount * 10000) AS BIGINT)
                        * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS s2y
        FROM lineitem GROUP BY l_returnflag),
    m AS (
        SELECT l_returnflag, n,
               CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS m11,
               CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS m22,
               CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS m12,
               CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS v1,
               CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS v2,
               CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
               CAST(sy AS DOUBLE) AS syd
        FROM s)
    SELECT l_returnflag, n,
           (m22 * v1 - m12 * v2) / (m11 * m22 - m12 * m12) AS beta_qty,
           (m11 * v2 - m12 * v1) / (m11 * m22 - m12 * m12) AS beta_disc_bp,
           (syd - (m22 * v1 - m12 * v2) / (m11 * m22 - m12 * m12) * s1d
                - (m11 * v2 - m12 * v1) / (m11 * m22 - m12 * m12) * s2d)
           / CAST(n AS DOUBLE) AS intercept_cents
    FROM m
    """,
    tags=("agg", "regression", "exact"),
)
def agg_ols_multi(spark, sf_dir):
    """Two-feature ordinary least squares — price_cents regressed on
    (quantity, discount basis points) per return flag — solved in
    closed form via the 2x2 normal equations over exact integer
    sufficient statistics (n, Σx₁, Σx₂, Σy, Σx₁², Σx₂², Σx₁x₂, Σx₁y,
    Σx₂y). This is how you do regression on 100 TB without MLlib and
    without gradient passes: ONE map-side-combinable aggregation
    produces nine order-independent integer partials per group, and
    the coefficient solve is pure per-row expression math on the
    9-column result. Float enters only in the centered-moment
    cross-products (which exceed int64 by construction) — the same
    IEEE expression tree in both engines, hence bit-identical with no
    rounding in the gate.

    Generalizes: k features need k(k+3)/2 + 1 partials and a
    broadcastable k x k solve — still one scan, one shuffle."""
    qty = F.col("l_quantity").cast("bigint")
    disc = F.round(F.col("l_discount") * 10000).cast("bigint")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    s = (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(qty).alias("s1"),
            F.sum(disc).alias("s2"),
            F.sum(cents).alias("sy"),
            F.sum(qty * qty).alias("s11"),
            F.sum(disc * disc).alias("s22"),
            F.sum(qty * disc).alias("s12"),
            F.sum(qty * cents).alias("s1y"),
            F.sum(disc * cents).alias("s2y"),
        )
    )
    nd = F.col("n").cast("double")
    d = {c: F.col(c).cast("double") for c in ["s1", "s2", "sy", "s11", "s22", "s12", "s1y", "s2y"]}
    m11 = nd * d["s11"] - d["s1"] * d["s1"]
    m22 = nd * d["s22"] - d["s2"] * d["s2"]
    m12 = nd * d["s12"] - d["s1"] * d["s2"]
    v1 = nd * d["s1y"] - d["s1"] * d["sy"]
    v2 = nd * d["s2y"] - d["s2"] * d["sy"]
    det = m11 * m22 - m12 * m12
    beta1 = (m22 * v1 - m12 * v2) / det
    beta2 = (m11 * v2 - m12 * v1) / det
    return s.select(
        "l_returnflag",
        "n",
        beta1.alias("beta_qty"),
        beta2.alias("beta_disc_bp"),
        ((d["sy"] - beta1 * d["s1"] - beta2 * d["s2"]) / nd).alias("intercept_cents"),
    )


# ---------------------------------------------------------------------------
# Decayed LTV with an exact integer accumulator
# ---------------------------------------------------------------------------
@q(
    "ev_ltv_halflife",
    oracle=f"""
    WITH p AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS cents,
               least(greatest(date_diff('day', CAST(ts AS DATE),
                                        DATE '{_LTV_ANCHOR}'), 0)
                     // {_LTV_PERIOD_DAYS}, {_LTV_MAX_AGE}) AS age
        FROM events WHERE event_type = 'purchase'),
    s AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_purchases,
               CAST(sum(cents * (CAST(1 AS BIGINT) << ({_LTV_MAX_AGE} - age)))
                    AS BIGINT) AS ltv_units
        FROM p GROUP BY user_id)
    SELECT user_id, n_purchases, ltv_units,
           CAST(ltv_units AS DOUBLE) / {float(2 ** _LTV_MAX_AGE)} AS ltv_cents_decayed
    FROM s
    """,
    tags=("events", "ltv", "decay"),
)
def ev_ltv_halflife(spark, sf_dir):
    """Exponentially decayed lifetime value per user — each purchase
    weighted by 2^(-age) with age in 30-day periods before a fixed
    anchor date, capped at 24 periods. The trick that makes
    this EXACT in a distributed engine: because every decay weight is
    a dyadic rational (a power of 1/2 at an integer age), the decayed
    sum is computed as an INTEGER — cents shifted left by
    (MAX_AGE - age) bits, summed in int64 (order-independent, no float
    accumulation drift anywhere), rescaled by 2^-MAX_AGE only at the
    very end (an exact exponent shift on the final value). A float
    exp(-λt) accumulator, by contrast, is summation-order dependent
    and libm-dependent — unreproducible across engines AND across
    partition layouts of the same engine.

    Max term: 1e7 cents << 24 ≈ 1.7e14; int64 holds ~54k such terms
    per user before overflow — at larger corpora widen to
    DECIMAL(38,0), same shape. The fixed anchor (not max(ts)) keeps a
    user's LTV stable as new data arrives — same append-stability
    argument as the md5 split."""
    ev = tbl(spark, sf_dir, "events")
    ts = event_ts(ev)
    age = F.expr(
        f"least(greatest(datediff(DATE'{_LTV_ANCHOR}', CAST(__ts AS DATE)), 0)"
        f" div {_LTV_PERIOD_DAYS}, {_LTV_MAX_AGE})"
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    ev = ev.withColumn("__ts", ts)
    s = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", cents.alias("cents"), age.alias("age"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(
                F.expr(
                    f"cents * shiftleft(CAST(1 AS BIGINT), {_LTV_MAX_AGE} - age)"
                )
            ).alias("ltv_units"),
        )
    )
    return s.select(
        "user_id",
        "n_purchases",
        "ltv_units",
        (F.col("ltv_units").cast("double") / F.lit(float(2 ** _LTV_MAX_AGE))).alias(
            "ltv_cents_decayed"
        ),
    )


# ---------------------------------------------------------------------------
# Trailing-window distinct users
# ---------------------------------------------------------------------------
@q(
    "ev_rolling_distinct",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    days AS (SELECT DISTINCT d FROM du),
    win AS (
        SELECT days.d AS target_d, du.user_id
        FROM days JOIN du
          ON du.d <= days.d AND du.d > days.d - {_ROLL_DAYS})
    SELECT strftime(target_d, '%Y-%m-%d') AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS active_users_7d
    FROM win GROUP BY target_d
    """,
    tags=("events", "window", "distinct"),
)
def ev_rolling_distinct(spark, sf_dir):
    """Trailing-7-day distinct active users per day — the classic
    rolling COUNT DISTINCT that a frame window CANNOT compute
    (distinct is not decomposable over sliding frames, and Spark
    rejects count(distinct) over a window). The scale-canonical shape:
    collapse events to the distinct (day, user) grid FIRST (the one
    big aggregation — everything after runs on |days| x |daily
    actives|), then replicate each grid row to the <= 7 target days it
    can serve via a bounded explode (a 7-row sequence, map-side), and
    count distinct per target day.

    100 TB posture: the replication factor is the window length — a
    known constant, not data-dependent — so the post-explode volume is
    7x the DISTINCT grid (already orders of magnitude under the raw
    event stream). The final distinct agg is two-phase
    (partial distinct on (day, user), merge counts). An approximate
    variant swaps stage 3 for per-day HLL sketch unions
    (agg_hll_sketch has the machinery) when exactness is negotiable."""
    ev = tbl(spark, sf_dir, "events")
    du = ev.select(
        event_ts(ev).cast("date").alias("d"), "user_id"
    ).distinct()
    targets = du.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), _ROLL_DAYS - 1))
        ).alias("target_d"),
        "user_id",
    )
    days = du.select("d").distinct()
    return (
        targets.join(days, targets.target_d == days.d)
        .groupBy(F.date_format("target_d", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
    )
