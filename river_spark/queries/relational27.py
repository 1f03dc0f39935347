"""Relational wave 27 (round 10): robust/inequality statistics, log-band
histograms, data-quality column profiles, and calendar-arithmetic scalar
coverage.

Bit-exactness rules (tests/test_oracle.py): integer-first cents math
everywhere; ln-bearing sums take round-6 (the agg_entropy_mix / DSIR
precedent); floor(log2(x)) via the binary-string-length trick (libm-free
— cookbook rule); percentile thresholds via the pinned
percentile_disc == quantile_disc stored-value idiom; LONG products that
could overflow under ANSI cast to double BEFORE the multiply.

Reference parity: none — warehouse-side analytics over the reference's
ingested-parquet data model.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import tbl


@q(
    "agg_theil_index",
    oracle="""
    WITH sp AS (
        SELECT c_nationkey AS nk, o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM orders JOIN customer ON c_custkey = o_custkey
        GROUP BY 1, 2),
    st AS (SELECT nk, count(*) AS n, sum(cents) AS tot FROM sp GROUP BY nk)
    SELECT st.nk AS nationkey, CAST(st.n AS BIGINT) AS n_customers,
           round(sum((CAST(sp.cents AS DOUBLE) / st.tot)
                     * ln(CAST(sp.cents AS DOUBLE) * st.n / st.tot)), 6)
             AS theil
    FROM sp JOIN st ON sp.nk = st.nk
    WHERE sp.cents > 0
    GROUP BY st.nk, st.n
    """,
    tags=("agg", "stats", "inequality"),
)
def agg_theil_index(spark, sf_dir):
    """Theil T index of customer-spend inequality per nation — the
    decomposable inequality measure that complements agg_gini_spend /
    agg_lorenz_deciles (Theil is additively decomposable across
    subgroups; Gini is not). Spend is cents-integer first; each term is
    (x/tot)*ln(x*n/tot) over exact integer ratios, and the ln-bearing
    sum takes round-6 (the entropy-family precedent). cents > 0 guards
    the ln domain identically in both engines.

    100 TB posture: fact aggregates to (nation, customer) grain first;
    the per-nation totals table is nation-cardinality (25) and joins
    back without a hint (AQE broadcasts it)."""
    sp = (
        tbl(spark, sf_dir, "orders")
        .join(
            tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy(F.col("c_nationkey").alias("nk"), "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
        )
    )
    st = sp.groupBy("nk").agg(F.count("*").alias("n"), F.sum("cents").alias("tot"))
    x = F.col("cents").cast("double")
    return (
        sp.join(st, "nk")
        .filter(F.col("cents") > 0)
        .groupBy(F.col("nk").alias("nationkey"), "n")
        .agg(
            F.round(
                F.sum((x / F.col("tot")) * F.log(x * F.col("n") / F.col("tot"))), 6
            ).alias("theil")
        )
        .select("nationkey", F.col("n").cast("long").alias("n_customers"), "theil")
    )


@q(
    "agg_trimmed_mean",
    oracle="""
    WITH b AS (
        SELECT c_nationkey AS nk,
               CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        FROM customer),
    qt AS (SELECT nk, quantile_disc(cents, 0.1) AS lo,
                  quantile_disc(cents, 0.9) AS hi
           FROM b GROUP BY nk),
    k AS (SELECT b.nk, cents FROM b JOIN qt ON b.nk = qt.nk
          WHERE cents >= lo AND cents <= hi)
    SELECT nk AS nationkey, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(cents) AS DOUBLE) / (100 * count(*)) AS trimmed_mean
    FROM k GROUP BY nk
    """,
    tags=("agg", "stats", "robust"),
)
def agg_trimmed_mean(spark, sf_dir):
    """10%-trimmed mean of customer balances per nation — the robust
    companion to agg_winsorized_mean (trimming DROPS the tails;
    winsorizing clamps them). The p10/p90 cut points are
    percentile_disc STORED values over integer cents (the pinned
    cross-engine quantile idiom — no interpolation), membership is an
    exact integer comparison, and the mean is one division of an
    integer sum.

    100 TB posture: one hash agg to cents grain, per-key disc-quantile
    thresholds (25 rows), threshold join back without a hint."""
    b = tbl(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )
    qt = b.groupBy("nk").agg(
        F.expr("percentile_disc(0.1) WITHIN GROUP (ORDER BY cents)").alias("lo"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY cents)").alias("hi"),
    )
    return (
        b.join(qt, "nk")
        .filter((F.col("cents") >= F.col("lo")) & (F.col("cents") <= F.col("hi")))
        .groupBy(F.col("nk").alias("nationkey"))
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            (F.sum("cents").cast("double") / (100 * F.count("*"))).alias(
                "trimmed_mean"
            ),
        )
    )


@q(
    "agg_log2_value_histogram",
    oracle="""
    WITH c AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_totalprice > 0)
    SELECT length(printf('%b', cents)) - 1 AS log2_band,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS band_cents
    FROM c GROUP BY 1
    """,
    tags=("agg", "histogram", "log"),
)
def agg_log2_value_histogram(spark, sf_dir):
    """Power-of-two value histogram of order totals: band k holds orders
    with cents in [2^k, 2^(k+1)) — the log-scale histogram a cost
    dashboard uses where agg_value_histogram's LINEAR bands flatten the
    tail. floor(log2(x)) comes from the binary-string-length trick
    (length(bin(x))-1 == length(printf('%b',x))-1), never libm — the
    cookbook rule, since libm log2 can straddle an integer boundary
    differently per engine. Counts and sums are exact integers.

    100 TB posture: one projection + one hash agg on ~40 band keys —
    perfectly map-side combinable."""
    c = (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
    )
    return c.groupBy(
        (F.length(F.bin("cents")) - 1).cast("long").alias("log2_band")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("band_cents"),
    )


@q(
    "dq_null_profile",
    oracle="""
    SELECT 'customer.c_name' AS column_name,
           (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_rows,
           (SELECT CAST(count(*) - count(c_name) AS BIGINT) FROM customer) AS n_null,
           (SELECT CAST(coalesce(sum(CASE WHEN trim(c_name) = '' THEN 1 ELSE 0 END), 0)
                    AS BIGINT) FROM customer WHERE c_name IS NOT NULL) AS n_blank,
           (SELECT CAST(count(DISTINCT c_name) AS BIGINT) FROM customer) AS n_distinct
    UNION ALL
    SELECT 'customer.c_mktsegment',
           (SELECT count(*) FROM customer),
           (SELECT count(*) - count(c_mktsegment) FROM customer),
           (SELECT CAST(coalesce(sum(CASE WHEN trim(c_mktsegment) = '' THEN 1 ELSE 0 END), 0) AS BIGINT)
              FROM customer WHERE c_mktsegment IS NOT NULL),
           (SELECT count(DISTINCT c_mktsegment) FROM customer)
    UNION ALL
    SELECT 'orders.o_orderstatus',
           (SELECT count(*) FROM orders),
           (SELECT count(*) - count(o_orderstatus) FROM orders),
           (SELECT CAST(coalesce(sum(CASE WHEN trim(o_orderstatus) = '' THEN 1 ELSE 0 END), 0) AS BIGINT)
              FROM orders WHERE o_orderstatus IS NOT NULL),
           (SELECT count(DISTINCT o_orderstatus) FROM orders)
    UNION ALL
    SELECT 'orders.o_orderpriority',
           (SELECT count(*) FROM orders),
           (SELECT count(*) - count(o_orderpriority) FROM orders),
           (SELECT CAST(coalesce(sum(CASE WHEN trim(o_orderpriority) = '' THEN 1 ELSE 0 END), 0) AS BIGINT)
              FROM orders WHERE o_orderpriority IS NOT NULL),
           (SELECT count(DISTINCT o_orderpriority) FROM orders)
    """,
    tags=("dq", "profile", "audit"),
)
def dq_null_profile(spark, sf_dir):
    """Column completeness profile — rows / nulls / blank-after-trim /
    distinct for every string column a load audit watches. Each TABLE
    contributes ONE fused aggregate scan (all of its columns' counters
    in a single pass, exploded to per-column rows afterward — the
    dq_expectations fusion idiom); nothing here is more than exact
    integer counting.

    100 TB posture: one partial-aggregatable scan per table, output
    rows = column count."""

    def profile(df, table, cols):
        aggs = []
        for c in cols:
            aggs += [
                F.count("*").cast("long").alias(f"{c}__rows"),
                (F.count("*") - F.count(c)).cast("long").alias(f"{c}__null"),
                F.sum(
                    F.when(F.col(c).isNotNull() & (F.trim(c) == ""), 1).otherwise(0)
                ).cast("long").alias(f"{c}__blank"),
                F.countDistinct(c).cast("long").alias(f"{c}__dist"),
            ]
        one = df.agg(*aggs)
        structs = [
            F.struct(
                F.lit(f"{table}.{c}").alias("column_name"),
                F.col(f"{c}__rows").alias("n_rows"),
                F.col(f"{c}__null").alias("n_null"),
                F.col(f"{c}__blank").alias("n_blank"),
                F.col(f"{c}__dist").alias("n_distinct"),
            )
            for c in cols
        ]
        return one.select(F.explode(F.array(*structs)).alias("r")).select("r.*")

    cust = profile(
        tbl(spark, sf_dir, "customer"), "customer", ["c_name", "c_mktsegment"]
    )
    orders = profile(
        tbl(spark, sf_dir, "orders"), "orders", ["o_orderstatus", "o_orderpriority"]
    )
    return cust.unionByName(orders)


@q(
    "dq_unreferenced_dims",
    oracle="""
    WITH u AS (
        SELECT c_nationkey AS nk, count(*) AS n_unreferenced
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY 1),
    t AS (SELECT c_nationkey AS nk, count(*) AS n_customers
          FROM customer GROUP BY 1)
    SELECT t.nk AS nationkey, CAST(t.n_customers AS BIGINT) AS n_customers,
           CAST(coalesce(u.n_unreferenced, 0) AS BIGINT) AS n_unreferenced,
           CAST(coalesce(u.n_unreferenced, 0) AS DOUBLE) / t.n_customers
             AS unreferenced_share
    FROM t LEFT JOIN u ON t.nk = u.nk
    """,
    tags=("dq", "audit", "anti_join"),
)
def dq_unreferenced_dims(spark, sf_dir):
    """Reverse referential audit: dimension rows no fact ever references
    (customers with zero orders), per nation — the mirror of
    dq_referential_integrity's orphan check, and the nonzero one on
    healthy data (orphans should be 0; unreferenced dims are normal and
    their SHARE drifting is the signal). Anti-join count + one exact
    division.

    100 TB posture: anti-join on the key column only (pushdown-pruned),
    no broadcast hint — customer and orders both scale with SF, AQE
    picks the strategy."""
    cust = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = tbl(spark, sf_dir, "orders").select("o_custkey")
    u = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_unreferenced"))
    )
    t = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count("*").alias("n_customers")
    )
    return t.join(u, "nk", "left").select(
        F.col("nk").alias("nationkey"),
        F.col("n_customers").cast("long").alias("n_customers"),
        F.coalesce("n_unreferenced", F.lit(0)).cast("long").alias("n_unreferenced"),
        (
            F.coalesce("n_unreferenced", F.lit(0)).cast("double")
            / F.col("n_customers")
        ).alias("unreferenced_share"),
    )


@q(
    "scalar_interval_arith",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3mo,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter_start,
           date_diff('day', o_orderdate, TIMESTAMP '1998-01-01') AS days_to_98,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           strftime(o_orderdate
                    + INTERVAL ((8 - isodow(o_orderdate)) % 7
                                + CASE WHEN isodow(o_orderdate) = 1
                                       THEN 7 ELSE 0 END) DAY,
                    '%Y-%m-%d') AS next_monday
    FROM orders WHERE o_orderkey % 37 = 0
    """,
    tags=("scalar", "date", "interval"),
)
def scalar_interval_arith(spark, sf_dir):
    """Calendar-interval arithmetic parity: add_months (with the
    shared end-of-month clamp: Jan 31 + 1mo = Feb 28 in BOTH engines),
    last_day, quarter truncation, day diffs, epoch seconds, and
    next-weekday (Spark next_day is STRICTLY-after; DuckDB mirrors it
    with isodow modular arithmetic). Every output is a formatted string
    or exact integer — the cookbook timestamp rule.

    100 TB posture: pure per-row projection behind a pushed-down
    modulus filter; whole-stage codegen, zero shuffles."""
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 37 == 0)
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus_3mo"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_trunc("quarter", "o_orderdate"), "yyyy-MM-dd").alias(
            "quarter_start"
        ),
        F.datediff(F.lit("1998-01-01").cast("timestamp_ntz"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_98"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format(F.next_day("o_orderdate", "Monday"), "yyyy-MM-dd").alias(
            "next_monday"
        ),
    )
