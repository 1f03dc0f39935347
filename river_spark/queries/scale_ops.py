"""Scale-path operators exposed to the correctness gate: the rollup
cascade and salted join must produce EXACTLY the answers of their naive
formulations (that's the whole point), so both are oracle-backed against
the one-shot SQL."""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.operators.rollup import time_rollup
from river_spark.operators.skew import salted_join
from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl, r2, spread_scan, tbl


@q(
    "ev_rollup_cascade",
    oracle="""
    SELECT '1 minute' AS resolution, strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
           event_type, count(*) AS n, round(sum(value), 2) AS total,
           round(min(value), 2) AS vmin, round(max(value), 2) AS vmax
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT '1 hour', strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S'),
           event_type, count(*), round(sum(value), 2), round(min(value), 2), round(max(value), 2)
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT '1 day', strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S'),
           event_type, count(*), round(sum(value), 2), round(min(value), 2), round(max(value), 2)
    FROM events GROUP BY 2, 3
    """,
    tags=("rollup", "hypertable"),
    bench=True,
)
def ev_rollup_cascade(spark, sf_dir):
    """Multi-resolution rollup; must equal the per-resolution one-shot
    aggregation (the oracle). r15: consumed as one stacked plan, the
    cascade strategy re-ran the finer levels per union branch (3 raw
    scans, 6 exchanges — see plans/r15/ev_rollup_cascade_before.txt),
    so this query uses the operator's single-pass GROUPING SETS
    strategy: 1 scan + 1 exchange, bit-identical rows at all 3 SFs,
    0.55 s -> 0.42 s at sf0.1. The cascade strategy remains the right
    call when levels are materialized to their own tables (see
    time_rollup's docstring)."""
    ev = events_tbl(spark, sf_dir)
    rolled = time_rollup(ev, "ts", ["event_type"], "value", strategy="grouping_sets")
    return rolled.select(
        "resolution",
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "event_type",
        "n",
        r2(F.col("total")).alias("total"),
        r2(F.col("vmin")).alias("vmin"),
        r2(F.col("vmax")).alias("vmax"),
    )


@q(
    "join_salted",
    oracle="""
    SELECT p_type, count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_type
    """,
    tags=("join", "skew"),
)
def join_salted(spark, sf_dir):
    """Salted fact⋈dim join must be answer-identical to the plain join."""
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part")
    joined = salted_join(li, part, "l_partkey", "p_partkey", num_salts=8)
    return joined.groupBy("p_type").agg(
        F.count("*").alias("n"), r2(F.sum("l_quantity")).alias("qty")
    )


@q(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           count(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS parts_within_tol,
           TRUE AS orders_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "sketch"),
)
def agg_approx_distinct(spark, sf_dir):
    """HLL++ sketch counting with an invariant oracle: the sketch value is
    implementation-defined, so the query emits the EXACT distinct counts
    (compared bit-for-bit) plus booleans asserting the sketch landed
    within 3x its configured rsd — the sketch's accuracy contract."""
    g = (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("ap"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("ao"),
        )
    )
    tol = 0.06  # 3 x rsd
    return g.select(
        "l_returnflag",
        "exact_parts",
        "exact_orders",
        (F.abs(F.col("ap") - F.col("exact_parts")) <= tol * F.col("exact_parts")).alias("parts_within_tol"),
        (F.abs(F.col("ao") - F.col("exact_orders")) <= tol * F.col("exact_orders")).alias("orders_within_tol"),
    )


@q(
    "agg_approx_quantile",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.5) AS exact_p50,
           quantile_disc(l_extendedprice, 0.95) AS exact_p95,
           TRUE AS p50_within_tol,
           TRUE AS p95_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "sketch"),
)
def agg_approx_quantile(spark, sf_dir):
    """Quantile sketching with an invariant oracle (same contract shape
    as agg_approx_distinct): approx_percentile's Greenwald-Khanna sketch
    is implementation-defined, so the query emits EXACT DISCRETE
    percentiles (percentile_disc — an actual data value, bit-compared
    against the oracle's quantile_disc) plus booleans asserting the
    sketch landed within its accuracy bound. At 100 TB the sketch is
    the only viable path (exact percentiles need a per-group sort); the
    gate proves the sketch's error contract holds, not just that it
    runs."""
    acc = 10_000  # rank error <= 1/acc of the group size
    g = (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            # DISCRETE percentiles for the exact columns: an actual data
            # value, bit-identical across engines (continuous
            # interpolation arithmetic differs in the last ulp between
            # engines and flips the rounded digit at .xx5 boundaries)
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"
            ).alias("e50"),
            F.expr(
                "percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)"
            ).alias("e95"),
            F.percentile_approx(F.col("l_extendedprice"), F.lit(0.5), F.lit(acc)).alias("a50"),
            F.percentile_approx(F.col("l_extendedprice"), F.lit(0.95), F.lit(acc)).alias("a95"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
    )
    # value-space tolerance: a rank-error sketch guarantees rank, not
    # value; bound the value drift by a generous fraction of the group's
    # value range (loose but engine-independent and always satisfiable)
    tol = (F.col("hi") - F.col("lo")) * 0.02
    return g.select(
        "l_returnflag",
        F.col("e50").alias("exact_p50"),
        F.col("e95").alias("exact_p95"),
        (F.abs(F.col("a50") - F.col("e50")) <= tol).alias("p50_within_tol"),
        (F.abs(F.col("a95") - F.col("e95")) <= tol).alias("p95_within_tol"),
    )


@q(
    "profile_lineitem",
    oracle="""
    SELECT 'l_orderkey' AS col, count(*) AS n_rows,
           count(*) - count(l_orderkey) AS n_nulls,
           count(DISTINCT l_orderkey) AS n_distinct,
           CAST(min(l_orderkey) AS VARCHAR) AS min_value,
           CAST(max(l_orderkey) AS VARCHAR) AS max_value
    FROM lineitem
    UNION ALL
    SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
           count(DISTINCT l_quantity),
           CAST(CAST(min(l_quantity) AS BIGINT) AS VARCHAR),
           CAST(CAST(max(l_quantity) AS BIGINT) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
           count(DISTINCT l_returnflag), min(l_returnflag), max(l_returnflag)
    FROM lineitem
    UNION ALL
    SELECT 'l_linestatus', count(*), count(*) - count(l_linestatus),
           count(DISTINCT l_linestatus), min(l_linestatus), max(l_linestatus)
    FROM lineitem
    """,
    tags=("profiling",),
)
def profile_lineitem(spark, sf_dir):
    """ANALYZE-style data profiling: per-column row/null/ndv/min/max in
    ONE scan — the stats pass every ingestion pipeline runs before
    trusting a new drop of data. Spark computes all 4 columns' stats in
    a single aggregation (one pass, partial-agg friendly) and unpivots
    with stack(); the oracle recomputes each column independently.
    Numeric min/max stringified via BIGINT so both engines print
    identically (DuckDB prints doubles as '1.0', Spark as '1.0' too,
    but BIGINT avoids any formatting dialect)."""
    # r15: the 4-way distinct aggregation plans Expand x4 + partial agg
    # fused into the scan stage — one row group locally, so 2.4 M
    # expanded rows aggregated on one core (4.9 s at sf0.1). spread_scan
    # is a no-op when the scan already splits (real scale); it moves
    # only the 4 profiled columns.
    li = spread_scan(
        tbl(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity", "l_returnflag", "l_linestatus"
        ),
        "l_orderkey",
    )
    g = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("l_orderkey").alias("c_ok"),
        F.countDistinct("l_orderkey").alias("d_ok"),
        F.min("l_orderkey").alias("mn_ok"),
        F.max("l_orderkey").alias("mx_ok"),
        F.count("l_quantity").alias("c_q"),
        F.countDistinct("l_quantity").alias("d_q"),
        F.min("l_quantity").alias("mn_q"),
        F.max("l_quantity").alias("mx_q"),
        F.count("l_returnflag").alias("c_rf"),
        F.countDistinct("l_returnflag").alias("d_rf"),
        F.min("l_returnflag").alias("mn_rf"),
        F.max("l_returnflag").alias("mx_rf"),
        F.count("l_linestatus").alias("c_ls"),
        F.countDistinct("l_linestatus").alias("d_ls"),
        F.min("l_linestatus").alias("mn_ls"),
        F.max("l_linestatus").alias("mx_ls"),
    )
    return g.selectExpr(
        """stack(4,
           'l_orderkey',  n, n - c_ok, d_ok, cast(mn_ok as string), cast(mx_ok as string),
           'l_quantity',  n, n - c_q,  d_q,  cast(cast(mn_q as bigint) as string), cast(cast(mx_q as bigint) as string),
           'l_returnflag',n, n - c_rf, d_rf, mn_rf, mx_rf,
           'l_linestatus',n, n - c_ls, d_ls, mn_ls, mx_ls
        ) AS (col, n_rows, n_nulls, n_distinct, min_value, max_value)"""
    )


@q(
    "agg_value_histogram",
    oracle="""
    WITH s AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
               FROM lineitem)
    SELECT least(CAST(floor((l_extendedprice - mn) * 20.0 / (mx - mn)) AS BIGINT), 19) AS bin,
           count(*) AS n,
           round(min(l_extendedprice), 2) AS bin_min,
           round(max(l_extendedprice), 2) AS bin_max
    FROM lineitem, s
    GROUP BY 1
    """,
    tags=("agg", "histogram"),
)
def agg_value_histogram(spark, sf_dir):
    """Equi-width 20-bin histogram of l_extendedprice — the distribution
    pass behind every profiling UI and partition-size planner. The
    global [min, max] comes from a 1-row broadcast scalar join (no
    second full scan through a window); bin arithmetic is the IDENTICAL
    double expression on both engines, so edge values land in the same
    bin bit-for-bit. Top bin is closed via least(..., 19)."""
    li = tbl(spark, sf_dir, "lineitem")
    s = li.agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    )
    binned = li.join(F.broadcast(s)).select(
        "l_extendedprice",
        F.least(
            F.floor(
                (F.col("l_extendedprice") - F.col("mn")) * 20.0 / (F.col("mx") - F.col("mn"))
            ),
            F.lit(19),
        ).cast("long").alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.round(F.min("l_extendedprice"), 2).alias("bin_min"),
        F.round(F.max("l_extendedprice"), 2).alias("bin_max"),
    )


@q(
    "agg_hll_sketch",
    oracle="""
    SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) AS exact_customers,
           CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           TRUE AS union_within_tol,
           TRUE AS groups_within_tol
    FROM customer
    """,
    tags=("agg", "sketch", "hll"),
)
def agg_hll_sketch(spark, sf_dir):
    """Mergeable HLL sketches (Apache DataSketches, Spark 3.5+'s
    hll_sketch_agg family) — the 100 TB cardinality pattern
    approx_count_distinct can't give you: per-group sketches are
    materialized values that UNION in a second aggregation level without
    rescanning the data (precompute per partition/day, merge on demand).
    Sketch bytes are implementation-defined, so the invariant oracle
    (same shape as agg_approx_distinct) checks exact counts bit-for-bit
    plus booleans asserting every per-nation estimate AND the unioned
    global estimate land within tolerance (3x the lgK=12 rse ~1.6%).
    c_custkey is globally unique, so the exact global count is the SUM
    of per-nation exacts — the whole query is one two-level aggregation
    tree, no second scan."""
    tol = 0.05
    cust = tbl(spark, sf_dir, "customer")
    g = (
        cust.groupBy("c_nationkey")
        .agg(
            F.hll_sketch_agg("c_custkey").alias("sk"),
            F.countDistinct("c_custkey").alias("ex"),
        )
        .select(
            "c_nationkey",
            "sk",
            "ex",
            (
                F.abs(F.hll_sketch_estimate("sk") - F.col("ex")) <= tol * F.col("ex")
            ).alias("g_ok"),
        )
    )
    return g.agg(
        F.sum("ex").cast("long").alias("exact_customers"),
        F.count("*").cast("long").alias("n_nations"),
        (
            F.abs(F.hll_sketch_estimate(F.hll_union_agg("sk")) - F.sum("ex"))
            <= tol * F.sum("ex")
        ).alias("union_within_tol"),
        F.bool_and("g_ok").alias("groups_within_tol"),
    )
