"""Relational operator suite (SURVEY.md §2 Part B).

The reference implements none of these natively — its consumers run them
over ingested Parquet (the reference's own perf notebook does pandas
groupby/max/merge, ``performance/performance.py:124-148``). Here each
capability is declared Spark-first via the DataFrame API, with a DuckDB
oracle SQL string for the driver's correctness gate.

Cross-engine alignment rules used throughout (see tests/test_oracle.py):
- every computed column is aliased identically on both sides;
- double aggregates are ROUNDed on both sides so value-hashes are stable
  across summation orders;
- DuckDB's HUGEINT sums / BIGINT window funcs vs Spark's LONG/INT are
  reconciled with explicit casts;
- ORDER BY ... LIMIT always carries a unique tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from river_spark.queries.tables import r2, tbl

QUERIES: list = []


def q(name, oracle=None, tags=(), bench=False):
    def deco(fn):
        QUERIES.append((name, fn, oracle, tuple(tags), bench))
        return fn

    return deco


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------
@q(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                     AS sum_qty,
           round(sum(l_extendedprice), 2)                                AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)             AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                     AS avg_qty,
           round(avg(l_extendedprice), 4)                                AS avg_price,
           round(avg(l_discount), 4)                                     AS avg_disc,
           count(*)                                                      AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter"),
    bench=True,
)
def q1_pricing_summary(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r2(F.sum("l_quantity")).alias("sum_qty"),
            r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            r2(F.sum(_rev())).alias("sum_disc_price"),
            r2(F.sum(_rev() * (1 + F.col("l_tax")))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@q(
    "agg_global",
    oracle="""
    SELECT count(*)                                   AS n,
           CAST(count(DISTINCT l_partkey) AS BIGINT)  AS n_parts,
           round(sum(l_quantity), 2)                  AS total_qty,
           round(min(l_extendedprice), 2)             AS min_price,
           round(max(l_extendedprice), 2)             AS max_price,
           round(avg(l_discount), 6)                  AS avg_disc
    FROM lineitem
    """,
    tags=("agg",),
)
def agg_global(spark, sf_dir):
    return tbl(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n"),
        F.countDistinct("l_partkey").alias("n_parts"),
        r2(F.sum("l_quantity")).alias("total_qty"),
        r2(F.min("l_extendedprice")).alias("min_price"),
        r2(F.max("l_extendedprice")).alias("max_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )


@q(
    "agg_rollup",
    oracle="""
    SELECT coalesce(r_name, 'ALL') AS region_name,
           coalesce(n_name, 'ALL') AS nation_name,
           count(*)                AS n_cust,
           round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("agg", "rollup", "join"),
)
def agg_rollup(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer")
    nat = tbl(spark, sf_dir, "nation")
    reg = tbl(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nat), cust.c_nationkey == nat.n_nationkey
    ).join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_cust"), r2(F.sum("c_acctbal")).alias("total_acctbal"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_cust",
            "total_acctbal",
        )
    )


@q(
    "agg_cube",
    oracle="""
    SELECT coalesce(l_returnflag, '*') AS returnflag,
           coalesce(l_linestatus, '*') AS linestatus,
           count(*)                    AS n,
           round(sum(l_quantity), 2)   AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def agg_cube(spark, sf_dir):
    return (
        tbl(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), r2(F.sum("l_quantity")).alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("*")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("*")).alias("linestatus"),
            "n",
            "qty",
        )
    )


@q(
    "agg_grouping_sets",
    oracle="""
    SELECT coalesce(o_orderstatus, '*')   AS status,
           coalesce(o_orderpriority, '*') AS priority,
           count(*)                       AS n,
           round(sum(o_totalprice), 2)    AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("agg", "grouping_sets"),
)
def agg_grouping_sets(spark, sf_dir):
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, '*')   AS status,
               coalesce(o_orderpriority, '*') AS priority,
               count(*)                       AS n,
               round(sum(o_totalprice), 2)    AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@q(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 2)      AS sd_price,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(avg(l_tax), 6)                        AS avg_tax
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_stats(spark, sf_dir):
    return (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            r2(F.stddev_samp("l_extendedprice")).alias("sd_price"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.avg("l_tax"), 6).alias("avg_tax"),
        )
    )


@q(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           round(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 4) AS p50,
           round(CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE), 4) AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def agg_percentile(spark, sf_dir):
    return (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        )
    )


@q(
    "distinct_proj",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    tags=("distinct",),
)
def distinct_proj(spark, sf_dir):
    return tbl(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


# --------------------------------------------------------------------------
# Filters + joins
# --------------------------------------------------------------------------
@q(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    tags=("filter", "agg"),
    bench=True,
)
def q6_forecast_revenue(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            r2(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@q(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
    bench=True,
)
def q3_shipping_priority(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = tbl(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(r2(F.sum(_rev())).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@q(
    "q5_nation_volume",
    oracle="""
    SELECT r_name, n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    tags=("join", "agg"),
    bench=True,
)
def q5_nation_volume(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    sup = tbl(spark, sf_dir, "supplier")
    nat = tbl(spark, sf_dir, "nation")
    reg = tbl(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            sup,
            (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(r2(F.sum(_rev())).alias("revenue"))
    )


@q(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    tags=("join", "semi", "agg"),
)
def q4_order_priority(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    li = tbl(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@q(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           n_name, round(c_acctbal, 2) AS acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
    bench=True,
)
def q10_returned_items(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = tbl(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(r2(F.sum(_rev())).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name", r2(F.col("c_acctbal")).alias("acctbal"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@q(
    "q12_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
    tags=("join", "agg", "case"),
)
def q12_priority_shipping(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_count"),
        )
    )


@q(
    "q14_promo_effect",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    tags=("join", "agg", "case"),
)
def q14_promo_effect(spark, sf_dir):
    part = tbl(spark, sf_dir, "part")
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        F.round(
            100.0 * F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(0.0)) / F.sum(_rev()),
            4,
        ).alias("promo_revenue_pct")
    )


@q(
    "q17_small_quantity",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_type = 'SMALL'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = part.p_partkey)
    """,
    tags=("join", "subquery", "agg"),
)
def q17_small_quantity(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    # decorrelated: per-part average as a broadcastable aggregate
    avg_qty = li.groupBy("l_partkey").agg((0.2 * F.avg("l_quantity")).alias("qty_limit"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty.withColumnRenamed("l_partkey", "ap_key"), F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@q(
    "q18_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o_totalprice, 2)            AS totalprice,
           round(sum(l_quantity), 2)         AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    HAVING sum(l_quantity) > 150
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("join", "agg", "having", "topk"),
)
def q18_large_orders(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 150)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            r2(F.col("o_totalprice")).alias("totalprice"),
            r2(F.col("_sq")).alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(20)
    )


@q(
    "q19_disjunctive_join",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_type = 'SMALL'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 21)
       OR (p_type = 'MEDIUM' AND p_size BETWEEN 5  AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_type = 'LARGE'  AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 20 AND 50)
    """,
    tags=("join", "filter"),
)
def q19_disjunctive_join(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part")
    cond = (
        ((F.col("p_type") == "SMALL") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_type") == "MEDIUM") & F.col("p_size").between(5, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_type") == "LARGE") & F.col("p_size").between(10, 40) & F.col("l_quantity").between(20, 50))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(r2(F.sum(_rev())).alias("revenue"))
    )


@q(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
          GROUP BY c_custkey) t
    GROUP BY c_count
    """,
    tags=("join", "outer", "agg"),
)
def q13_customer_distribution(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@q(
    "join_semi",
    oracle="""
    SELECT count(*) AS n_customers FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
    """,
    tags=("join", "semi"),
)
def join_semi(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer")
    big = tbl(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .agg(F.count("*").alias("n_customers"))
    )


@q(
    "join_anti",
    oracle="""
    SELECT count(*) AS n FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
    tags=("join", "anti"),
)
def join_anti(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer")
    fin = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(fin, cust.c_custkey == fin.o_custkey, "left_anti").agg(
        F.count("*").alias("n")
    )


@q(
    "join_full_outer",
    oracle="""
    SELECT coalesce(cn.nk, sn.nk) AS nationkey,
           coalesce(c_cnt, 0)     AS n_customers,
           coalesce(s_cnt, 0)     AS n_suppliers
    FROM      (SELECT c_nationkey AS nk, count(*) AS c_cnt FROM customer GROUP BY 1) cn
    FULL JOIN (SELECT s_nationkey AS nk, count(*) AS s_cnt FROM supplier GROUP BY 1) sn
      ON cn.nk = sn.nk
    """,
    tags=("join", "outer"),
)
def join_full_outer(spark, sf_dir):
    cn = (
        tbl(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(F.count("*").alias("c_cnt"))
    )
    sn = (
        tbl(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count("*").alias("s_cnt"))
    )
    return cn.join(sn, cn.nk_c == sn.nk_s, "full_outer").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("c_cnt", F.lit(0)).alias("n_customers"),
        F.coalesce("s_cnt", F.lit(0)).alias("n_suppliers"),
    )


@q(
    "join_cross_small",
    oracle="""
    SELECT r1.r_name AS region_a, r2.r_name AS region_b
    FROM region r1 CROSS JOIN region r2 WHERE r1.r_regionkey < r2.r_regionkey
    """,
    tags=("join", "cross"),
)
def join_cross_small(spark, sf_dir):
    reg = tbl(spark, sf_dir, "region")
    a = reg.select(F.col("r_regionkey").alias("k_a"), F.col("r_name").alias("region_a"))
    b = reg.select(F.col("r_regionkey").alias("k_b"), F.col("r_name").alias("region_b"))
    return a.crossJoin(b).filter(F.col("k_a") < F.col("k_b")).select("region_a", "region_b")


# --------------------------------------------------------------------------
# Sorts / limits / set ops
# --------------------------------------------------------------------------
@q(
    "topk_global",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    tags=("sort", "topk"),
)
def topk_global(spark, sf_dir):
    # sort+limit → TakeOrderedAndProject (the Spark analog of tail/top-1,
    # reference cpp/src/reader.cpp:336-488 generalized to k)
    return (
        tbl(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
        .select("o_orderkey", r2(F.col("o_totalprice")).alias("totalprice"))
    )


@q(
    "set_ops",
    oracle="""
    SELECT 'union' AS op, count(*) AS n FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION SELECT c_custkey FROM customer WHERE c_acctbal > 5000) t
    UNION ALL
    SELECT 'intersect' AS op, count(*) AS n FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000) t
    UNION ALL
    SELECT 'except' AS op, count(*) AS n FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal > 5000) t
    """,
    tags=("setop",),
)
def set_ops(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    mk = lambda op, df: df.agg(F.count("*").alias("n")).select(F.lit(op).alias("op"), "n")
    return (
        mk("union", a.union(b).distinct())
        .unionAll(mk("intersect", a.intersect(b)))
        .unionAll(mk("except", a.subtract(b)))  # set EXCEPT; exceptAll().distinct() keeps left-side dupes the oracle's EXCEPT removes
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------
@q(
    "win_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) t
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
    bench=True,
)
def win_topk_per_group(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        tbl(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", r2(F.col("o_totalprice")).alias("totalprice"), "rn")
    )


@q(
    "win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spend
    FROM orders
    """,
    tags=("window",),
)
def win_running_sum(spark, sf_dir):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return tbl(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        r2(F.sum("o_totalprice").over(w)).alias("running_spend"),
    )


@q(
    "win_rank_ntile",
    oracle="""
    SELECT c_nationkey, c_custkey,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window",),
)
def win_rank_ntile(spark, sf_dir):
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return tbl(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_custkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@q(
    "win_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)
             AS moving_avg
    FROM orders
    """,
    tags=("window",),
)
def win_moving_avg(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-3, 0)
    return tbl(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.round(F.avg("o_totalprice").over(w), 4).alias("moving_avg")
    )


# --------------------------------------------------------------------------
# Scalar function coverage
# --------------------------------------------------------------------------
@q(
    "scalar_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                          AS uname,
           substr(c_name, 1, 8)                   AS prefix,
           CAST(length(c_name) AS BIGINT)         AS name_len,
           concat(c_mktsegment, '-', c_name)      AS tagged,
           replace(c_name, 'Customer', 'Cust')    AS repl,
           (c_name LIKE '%1%')                    AS has_one
    FROM customer
    """,
    tags=("scalar", "string"),
)
def scalar_string(spark, sf_dir):
    return tbl(spark, sf_dir, "customer").select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("tagged"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("repl"),
        F.col("c_name").like("%1%").alias("has_one"),
    )


@q(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate)    AS BIGINT) AS yr,
           CAST(month(o_orderdate)   AS BIGINT) AS mon,
           CAST(day(o_orderdate)     AS BIGINT) AS dom,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')    AS plus30,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2000-01-01') AS BIGINT) AS days_to_y2k
    FROM orders
    """,
    tags=("scalar", "date"),
)
def scalar_date(spark, sf_dir):
    d = F.col("o_orderdate")
    return tbl(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mon"),
        F.dayofmonth(d).cast("long").alias("dom"),
        F.quarter(d).cast("long").alias("qtr"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(d + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("plus30"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).cast("long").alias("days_to_y2k"),
    )


@q(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 4)        AS abs_disc,
           round(sqrt(l_quantity), 6)              AS sqrt_qty,
           CAST(floor(l_extendedprice) AS BIGINT)  AS floor_price,
           round(power(l_quantity, 2), 2)          AS qty_sq,
           l_orderkey % 7                          AS key_mod,
           round(ln(l_extendedprice), 6)           AS ln_price,
           CAST(sign(l_discount - 0.05) AS INT)    AS disc_sign
    FROM lineitem
    """,
    tags=("scalar", "math"),
)
def scalar_math(spark, sf_dir):
    return tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("abs_disc"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.floor("l_extendedprice").cast("long").alias("floor_price"),
        F.round(F.pow("l_quantity", 2), 2).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


@q(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 150000 THEN 'big'
                WHEN o_totalprice > 50000  THEN 'mid'
                ELSE 'small' END                        AS bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2,
           round(greatest(o_totalprice, 100000.0), 2)   AS at_least_100k,
           round(least(o_totalprice, 100000.0), 2)      AS at_most_100k
    FROM orders
    """,
    tags=("scalar", "conditional"),
)
def scalar_conditional(spark, sf_dir):
    p = F.col("o_totalprice")
    return tbl(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(p > 150000, "big").when(p > 50000, "mid").otherwise("small").alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias("status2"),
        r2(F.greatest(p, F.lit(100000.0))).alias("at_least_100k"),
        r2(F.least(p, F.lit(100000.0))).alias("at_most_100k"),
    )


@q(
    "scalar_json",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
    tags=("scalar", "json"),
)
def scalar_json(spark, sf_dir):
    return tbl(spark, sf_dir, "events").select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k")
    )
