"""Second relational wave: deeper TPC-H-style shapes (adapted to the
driver's schema — there is no partsupp table, so cost-based queries use
lineitem-derived unit prices), plus array/pivot/regex/set-arithmetic
coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.queries.relational import _rev, q
from river_spark.queries.tables import r2, tbl


@q(
    "q2_min_unit_price_supplier",
    oracle="""
    WITH unit AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               min(l_extendedprice / l_quantity) AS up
        FROM lineitem GROUP BY 1, 2),
    best AS (SELECT pk, min(up) AS mu FROM unit GROUP BY pk)
    SELECT unit.pk AS p_partkey, min(sk) AS best_suppkey,
           CAST(floor(best.mu * 10000) AS BIGINT) AS min_unit_price_e4
    FROM unit JOIN best ON unit.pk = best.pk AND unit.up = best.mu
    GROUP BY unit.pk, best.mu
    """,
    tags=("join", "subquery", "argmin"),
)
def q2_min_unit_price_supplier(spark, sf_dir):
    """Q2 shape without partsupp: per part, the supplier achieving the
    minimum observed unit price (min-join = argmin without a window)."""
    li = tbl(spark, sf_dir, "lineitem")
    unit = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("up"))
    best = unit.groupBy("pk").agg(F.min("up").alias("mu"))
    return (
        unit.join(best.withColumnRenamed("pk", "bk"), (F.col("pk") == F.col("bk")) & (F.col("up") == F.col("mu")))
        .groupBy(F.col("pk").alias("p_partkey"), "mu")
        .agg(F.min("sk").alias("best_suppkey"))
        .select(
            "p_partkey",
            "best_suppkey",
            # integer-scaled to dodge cross-engine round() boundary cases
            F.floor(F.col("mu") * 10000).cast("long").alias("min_unit_price_e4"),
        )
    )


@q(
    "q7_nation_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS BIGINT) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE n1.n_nationkey < 5 AND n2.n_nationkey < 5
            AND n1.n_nationkey <> n2.n_nationkey) t
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg"),
)
def q7_nation_volume_shipping(spark, sf_dir):
    sup = tbl(spark, sf_dir, "supplier")
    li = tbl(spark, sf_dir, "lineitem")
    orders = tbl(spark, sf_dir, "orders")
    cust = tbl(spark, sf_dir, "customer")
    nat = tbl(spark, sf_dir, "nation")
    n1 = nat.filter(F.col("n_nationkey") < 5).select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.filter(F.col("n_nationkey") < 5).select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # supplier/customer scale with SF: no forced broadcast — AQE
        # picks broadcast at laptop scale, SMJ/shuffled-hash at 100x.
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(F.col("nk1") != F.col("nk2"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(r2(F.sum(_rev())).alias("revenue"))
    )


@q(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nk = 7 THEN volume ELSE 0 END) / sum(volume), 6) AS mkt_share
    FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 s_nationkey AS nk, l_extendedprice * (1 - l_discount) AS volume
          FROM lineitem
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN supplier ON s_suppkey = l_suppkey) t
    GROUP BY o_year
    """,
    tags=("join", "agg", "case"),
)
def q8_market_share(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    orders = tbl(spark, sf_dir, "orders")
    sup = tbl(spark, sf_dir, "supplier")
    vol = (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .join(sup, sup.s_suppkey == li.l_suppkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.col("s_nationkey").alias("nk"),
            _rev().alias("volume"),
        )
    )
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("nk") == 7, F.col("volume")).otherwise(0.0)) / F.sum("volume"), 6
        ).alias("mkt_share")
    )


@q(
    "q9_product_profit",
    oracle="""
    SELECT n_name, o_year, round(sum(amount) / 1000, 1) AS profit_k
    FROM (SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity AS amount
          FROM lineitem
          JOIN part     ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN nation   ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%a%') t
    GROUP BY n_name, o_year
    """,
    tags=("join", "agg"),
)
def q9_product_profit(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    sup = tbl(spark, sf_dir, "supplier")
    orders = tbl(spark, sf_dir, "orders")
    nat = tbl(spark, sf_dir, "nation")
    amount = _rev() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(part, part.p_partkey == li.l_partkey)
        .join(sup, sup.s_suppkey == li.l_suppkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nat), nat.n_nationkey == sup.s_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(amount) / 1000, 1).alias("profit_k"))
    )


@q(
    "q11_supplier_balance_share",
    oracle="""
    SELECT s_nationkey, round(sum(s_acctbal), 2) AS bal
    FROM supplier GROUP BY s_nationkey
    HAVING sum(s_acctbal) > (SELECT 0.05 * sum(s_acctbal) FROM supplier)
    """,
    tags=("agg", "having", "subquery"),
)
def q11_supplier_balance_share(spark, sf_dir):
    sup = tbl(spark, sf_dir, "supplier")
    threshold = sup.agg((0.05 * F.sum("s_acctbal")).alias("thr"))
    return (
        sup.groupBy("s_nationkey")
        .agg(F.sum("s_acctbal").alias("_bal"))
        .join(F.broadcast(threshold))
        .filter(F.col("_bal") > F.col("thr"))
        .select("s_nationkey", r2(F.col("_bal")).alias("bal"))
    )


@q(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
                 GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, round(total, 2) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total = (SELECT max(total) FROM rev)
    """,
    tags=("join", "subquery", "argmax"),
)
def q15_top_supplier(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("total"))
    mx = rev.agg(F.max("total").alias("mx"))
    sup = tbl(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total") == F.col("mx"))
        .join(sup, sup.s_suppkey == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", r2(F.col("total")).alias("total_revenue"))
    )


@q(
    "q16_supplier_count",
    oracle="""
    SELECT p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_type, p_size
    """,
    tags=("join", "anti", "agg"),
)
def q16_supplier_count(spark, sf_dir):
    part = tbl(spark, sf_dir, "part")
    li = tbl(spark, sf_dir, "lineitem")
    bad = tbl(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, part.p_partkey == li.l_partkey)
        .groupBy("p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@q(
    "q22_idle_customers",
    oracle="""
    SELECT c_mktsegment, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    GROUP BY c_mktsegment
    """,
    tags=("anti", "subquery", "agg"),
)
def q22_idle_customers(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders.filter(F.col("o_orderstatus") == "P"), cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"), r2(F.sum("c_acctbal")).alias("totacctbal"))
    )


@q(
    "fn_array_agg",
    oracle="""
    SELECT o_orderstatus,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
           CAST(len(list(DISTINCT o_orderpriority)) AS BIGINT) AS n_priorities
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("array", "agg"),
)
def fn_array_agg(spark, sf_dir):
    return (
        tbl(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.sort_array(F.collect_set("o_orderpriority")).alias("ps"))
        .select(
            "o_orderstatus",
            F.array_join("ps", ",").alias("priorities"),
            F.size("ps").cast("long").alias("n_priorities"),
        )
    )


@q(
    "pivot_status_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("pivot",),
)
def pivot_status_priority(spark, sf_dir):
    return (
        tbl(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("F"),
            F.coalesce("O", F.lit(0)).alias("O"),
            F.coalesce("P", F.lit(0)).alias("P"),
        )
    )


@q(
    "set_ops_all",
    oracle="""
    SELECT 'except_all' AS op, count(*) AS n FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') t
    UNION ALL
    SELECT 'intersect_all' AS op, count(*) AS n FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') t
    """,
    tags=("setop",),
)
def set_ops_all(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    mk = lambda op, df: df.agg(F.count("*").alias("n")).select(F.lit(op).alias("op"), "n")
    return mk("except_all", a.exceptAll(b)).unionAll(mk("intersect_all", a.intersectAll(b)))


@q(
    "scalar_regex",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1)          AS digits,
           regexp_matches(c_name, '[0-9]{3}')             AS has_3_digits,
           regexp_replace(c_name, '[0-9]', '#', 'g')      AS masked
    FROM customer
    """,
    tags=("scalar", "regex"),
)
def scalar_regex(spark, sf_dir):
    return tbl(spark, sf_dir, "customer").select(
        "c_custkey",
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.col("c_name").rlike("[0-9]{3}").alias("has_3_digits"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("masked"),
    )
