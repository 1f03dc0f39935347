"""Relational wave 6 (round 8): ANSI error-safe arithmetic (TRY_*),
FILTER-clause aggregates, and time-series gap filling with linear
interpolation — three capability gaps a reference user coming from a
full SQL engine would expect, each with a bit-level DuckDB oracle.

Cross-engine determinism notes follow the proven house rules: integer
ratios are emitted as raw doubles (IEEE division of identical ints is
bit-identical; rounding an exact decimal midpoint is not — see
tests/test_oracle.py header), nullable integer outputs are cast to
DOUBLE on both sides (Spark's and DuckDB's pandas bridges disagree on
nullable-int dtypes), and timestamps cross the gate as strings.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import event_ts, tbl


@q(
    "scalar_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity = 25 THEN NULL
                ELSE l_extendedprice / (l_quantity - 25) END AS safe_ratio,
           CASE WHEN CAST(floor(l_extendedprice) AS BIGINT) * 100000
                     BETWEEN -2147483648 AND 2147483647
                THEN CAST(CAST(floor(l_extendedprice) AS BIGINT) * 100000 AS DOUBLE)
                ELSE NULL END AS ovf_mul,
           CASE WHEN 2147483000 + CAST(floor(l_extendedprice) AS BIGINT) <= 2147483647
                THEN CAST(2147483000 + CAST(floor(l_extendedprice) AS BIGINT) AS DOUBLE)
                ELSE NULL END AS ovf_add,
           TRY_CAST(concat(CAST(l_quantity AS VARCHAR),
                           CASE WHEN l_linenumber = 3 THEN 'x' ELSE '' END)
                    AS DOUBLE) AS parsed_qty
    FROM lineitem
    """,
    tags=("scalar", "ansi", "try"),
)
def scalar_try_arith(spark, sf_dir):
    """ANSI error-safe arithmetic: try_divide / try_multiply / try_add
    return NULL instead of raising on division-by-zero and int32
    overflow (Spark's TRY evaluation mode — the lenient third option
    next to legacy-silent-wrong and ansi-throw), and try_to_number
    NULLs unparseable strings. The oracle replays each guard as an
    explicit CASE over BIGINT arithmetic (DuckDB has no TRY arithmetic,
    only TRY_CAST).

    All in-row expression work (whole-stage codegen, no shuffle at
    all); the nullable-int results are cast to DOUBLE because Spark's
    Arrow bridge and DuckDB's pandas bridge disagree on nullable-int
    dtypes. floor() is applied before every double→int cast — Spark
    truncates, DuckDB rounds, floor makes them agree.

    try_to_number returns DECIMAL; cast to DOUBLE for the same reason.
    """
    li = tbl(spark, sf_dir, "lineitem")
    fe = F.floor("l_extendedprice").cast("int")
    corrupt = F.when(F.col("l_linenumber") == 3, F.lit("x")).otherwise(F.lit(""))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25).alias(
            "safe_ratio"
        ),
        F.try_multiply(fe, F.lit(100000)).cast("double").alias("ovf_mul"),
        F.try_add(F.lit(2147483000), fe).cast("double").alias("ovf_add"),
        F.try_to_number(
            F.concat(F.col("l_quantity").cast("string"), corrupt), F.lit("99.9")
        )
        .cast("double")
        .alias("parsed_qty"),
    )


@q(
    "agg_filter_clause",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_all,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
           round(sum(l_extendedprice)
                 FILTER (WHERE l_shipdate >= TIMESTAMP '1995-01-01'), 2) AS sum_recent,
           round(avg(l_quantity) FILTER (WHERE l_linestatus = 'F'), 4) AS avg_qty_f,
           count(DISTINCT l_suppkey) FILTER (WHERE l_tax = 0) AS n_supp_notax
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "ansi", "filter"),
)
def agg_filter_clause(spark, sf_dir):
    """ANSI FILTER-clause aggregates: per-aggregate predicates inside
    one GROUP BY pass — the standard's alternative to the
    sum(CASE WHEN ...) idiom, including the harder distinct-aggregate
    form count(DISTINCT x) FILTER (WHERE p). One scan, one partial-agg
    shuffle on l_returnflag (3 groups); Catalyst rewrites the filters
    into the aggregate expressions, so the plan is identical to the
    hand-written conditional form — this query pins that the SQL
    surface exists and agrees with DuckDB's implementation of the same
    clause."""
    tbl(spark, sf_dir, "lineitem").createOrReplaceTempView("fc_lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n_all,
               count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
               round(sum(l_extendedprice)
                     FILTER (WHERE l_shipdate >= TIMESTAMP '1995-01-01'), 2) AS sum_recent,
               round(avg(l_quantity) FILTER (WHERE l_linestatus = 'F'), 4) AS avg_qty_f,
               count(DISTINCT l_suppkey) FILTER (WHERE l_tax = 0) AS n_supp_notax
        FROM fc_lineitem_v
        GROUP BY l_returnflag
        """
    )


@q(
    "ev_gap_fill_interp",
    oracle="""
    WITH knots AS (
        SELECT user_id, ts AS t, avg(value) AS val
        FROM events GROUP BY user_id, ts),
    bounds AS (
        SELECT user_id, date_trunc('hour', min(t)) AS g0, max(t) AS t1
        FROM knots GROUP BY user_id),
    grid AS (
        SELECT user_id, UNNEST(generate_series(g0, t1, INTERVAL 1 HOUR)) AS g
        FROM bounds),
    u AS (
        SELECT user_id, t, val, 1 AS is_knot FROM knots
        UNION ALL
        SELECT user_id, g, NULL, 0 FROM grid),
    w AS (
        SELECT user_id, t, val, is_knot,
               last_value(val IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY t, is_knot DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(CASE WHEN is_knot = 1 THEN t END IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY t, is_knot DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
               first_value(val IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY t, is_knot DESC
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN is_knot = 1 THEN t END IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY t, is_knot DESC
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        FROM u)
    SELECT user_id, strftime(t, '%Y-%m-%d %H:00') AS grid_ts,
           round(CASE
               WHEN pv IS NULL THEN nv
               WHEN nv IS NULL THEN pv
               WHEN nt = pt THEN pv
               ELSE pv + (nv - pv)
                    * (CAST(date_diff('microsecond', pt, t) AS DOUBLE)
                       / CAST(date_diff('microsecond', pt, nt) AS DOUBLE))
           END, 6) AS interp_value
    FROM w WHERE is_knot = 0
    """,
    tags=("events", "timeseries", "interpolation"),
)
def ev_gap_fill_interp(spark, sf_dir):
    """Time-series gap fill with LINEAR interpolation: each user's
    irregular event samples are resampled onto an hourly grid; grid
    points between two samples get the time-weighted blend, points
    before the first / after the last sample back/forward-fill
    (complements ev_locf_fill, which is step-wise only). The classic
    union trick: knots and grid rows share one per-user ordered window
    (knots sort before grid points at equal timestamps, so an on-grid
    sample interpolates to exactly itself); last_value/first_value
    IGNORE NULLS find the bracketing samples without a join.

    Interpolation math is cross-engine exact: the time fraction is a
    ratio of identical BIGINT microsecond differences, blended in
    doubles in the same order both sides, rounded only at output.

    100 TB posture: one shuffle — everything (knot dedup, grid
    generation via per-user sequence(), both window passes) partitions
    by user_id; the grid is generated distributed (explode of a
    per-key sequence, never a driver-side loop), and for a
    multi-year corpus the window would additionally partition by
    calendar chunk with one knot of overlap — the grid is bounded at
    720 points/user for this 30-day dataset."""
    ev = tbl(spark, sf_dir, "events")
    knots = (
        ev.select("user_id", event_ts(ev).alias("t"), "value")
        .groupBy("user_id", "t")
        .agg(F.avg("value").alias("val"))
    )
    bounds = knots.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("t")).alias("g0"), F.max("t").alias("t1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(g0, t1, interval 1 hour)")).alias("g"),
    )
    u = knots.select("user_id", "t", "val", F.lit(1).alias("is_knot")).unionByName(
        grid.select(
            "user_id",
            F.col("g").alias("t"),
            F.lit(None).cast("double").alias("val"),
            F.lit(0).alias("is_knot"),
        )
    )
    order = [F.col("t"), F.col("is_knot").desc()]
    wp = Window.partitionBy("user_id").orderBy(*order)
    back = wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = wp.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    knot_t = F.when(F.col("is_knot") == 1, F.col("t"))
    w = u.select(
        "user_id",
        "t",
        "is_knot",
        F.last("val", ignorenulls=True).over(back).alias("pv"),
        F.last(knot_t, ignorenulls=True).over(back).alias("pt"),
        F.first("val", ignorenulls=True).over(fwd).alias("nv"),
        F.first(knot_t, ignorenulls=True).over(fwd).alias("nt"),
    )
    frac = F.expr("timestampdiff(MICROSECOND, pt, t)").cast("double") / F.expr(
        "timestampdiff(MICROSECOND, pt, nt)"
    ).cast("double")
    interp = (
        F.when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .when(F.col("nt") == F.col("pt"), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return w.filter(F.col("is_knot") == 0).select(
        "user_id",
        F.date_format("t", "yyyy-MM-dd HH:00").alias("grid_ts"),
        F.round(interp, 6).alias("interp_value"),
    )


@q(
    "scalar_xml",
    oracle="""
    SELECT o_orderstatus AS status, count(*) AS n,
           CAST(sum(o_custkey) AS BIGINT) AS sum_cust,
           count(DISTINCT o_orderpriority) AS n_prio,
           CAST(sum(o_orderkey) AS BIGINT) AS sum_key
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("scalar", "xml"),
)
def scalar_xml(spark, sf_dir):
    """XML scalar surface as an equivalence gate: each order is encoded
    into an XML fragment (status as an attribute, keys and priority as
    child elements), then parsed BACK with Spark's XPath family —
    xpath_string over an attribute axis, xpath_long over element text,
    xpath()[0] over a text() node — and the recovered columns must
    aggregate exactly like the raw table. Any unescape/axis/type bug in
    the round trip moves a bit-checked integer. (The oracle reads the
    raw columns; XML construction is the thing under test, so it only
    exists on the Spark side.)

    100 TB posture: encode and parse are both in-row string expressions
    inside whole-stage codegen — no UDF, no shuffle beyond the final
    4-group aggregate (plus, at bench SFs, one narrow spread exchange:
    orders is a single row group locally, so the xpath projection — 4
    interpreted XPath evaluations per row, the overwhelming per-row cost
    — ran as ONE task with 31 cores idle, 9.2 s at sf0.1. Repartitioning
    the 4 input columns by o_orderkey with an explicit partition count
    (opting out of AQE's bytes-based coalescing, which is blind to
    per-row eval cost) parallelizes the parse; at scale the scan splits
    naturally and the exchange stays a narrow-column no-op next to it)."""
    o = tbl(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey", "o_custkey", "o_orderpriority"
    )
    o = o.repartition(spark.sparkContext.defaultParallelism, "o_orderkey")
    xml = F.concat(
        F.lit('<o k="'),
        F.col("o_orderstatus"),
        F.lit('"><id>'),
        F.col("o_orderkey").cast("string"),
        F.lit("</id><c>"),
        F.col("o_custkey").cast("string"),
        F.lit("</c><p>"),
        F.col("o_orderpriority"),
        F.lit("</p></o>"),
    )
    parsed = o.select(xml.alias("xml")).select(
        F.expr("xpath_string(xml, 'o/@k')").alias("status"),
        F.expr("xpath_long(xml, 'o/id')").alias("okey"),
        F.expr("xpath_long(xml, 'o/c')").alias("ckey"),
        F.expr("xpath(xml, 'o/p/text()')[0]").alias("prio"),
    )
    return parsed.groupBy("status").agg(
        F.count("*").alias("n"),
        F.sum("ckey").alias("sum_cust"),
        F.count_distinct(F.col("prio")).alias("n_prio"),
        F.sum("okey").alias("sum_key"),
    )
