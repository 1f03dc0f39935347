"""Fourth relational wave: the two hardest TPC-H shapes — q20 (nested IN
+ correlated scalar HAVING) and q21 (double EXISTS/NOT EXISTS
correlation) — adapted to the driver's schema (no partsupp /
l_commitdate / l_receiptdate; see TESTDATA.md).

The DuckDB oracles keep the textbook correlated-subquery form; the Spark
plans are hand-decorrelated into aggregate+join form (the same rewrite
Catalyst's subquery decorrelation performs), so the physical plan is
shuffle-minimal: every correlation becomes a groupBy on the correlation
key followed by a same-key join, which AQE coalesces instead of
re-evaluating a subquery per outer row.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import tbl


@q(
    "q20_promotion_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1996-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity) > 0.5 * (
            SELECT sum(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = lineitem.l_partkey
              AND l2.l_suppkey = lineitem.l_suppkey))
    """,
    tags=("subquery", "correlated", "semi"),
)
def q20_promotion_suppliers(spark, sf_dir):
    """Q20 shape without partsupp: suppliers for whom some 'small%'-part's
    1995 shipments exceed half of that (supplier, part)'s all-time
    shipments. The correlated scalar subquery decorrelates into a single
    conditional aggregation over (l_suppkey, l_partkey) — one shuffle
    where the naive plan re-scans lineitem per group."""
    li = tbl(spark, sf_dir, "lineitem")
    parts = (
        tbl(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    )
    in_95 = (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz")) & (
        F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz")
    )
    qualifying = (
        li.join(parts, li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_95, F.col("l_quantity")).otherwise(0.0)).alias("qty95"),
            F.sum("l_quantity").alias("qty_all"),
        )
        .filter((F.col("qty95") > 0) & (F.col("qty95") > 0.5 * F.col("qty_all")))
        .select("l_suppkey")
        .distinct()
    )
    sup = tbl(spark, sf_dir, "supplier")
    # qualifying is lineitem-derived (SF-scaling): no forced broadcast.
    return sup.join(
        qualifying, sup.s_suppkey == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


@q(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    """,
    tags=("subquery", "exists", "correlated", "agg"),
)
def q21_waiting_suppliers(spark, sf_dir):
    """Q21 shape with l_shipdate standing in for receipt/commit dates:
    per finished multi-supplier order, the supplier(s) whose line shipped
    last (no other supplier shipped later). The EXISTS pair decorrelates
    into per-(order, supplier) max-shipdate aggregates plus order-level
    window stats (top-2 supplier maxima with tie counts), so the whole
    query is two shuffles on l_orderkey instead of two correlated
    re-scans of lineitem."""
    li = tbl(spark, sf_dir, "lineitem")
    f_orders = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    l1 = li.join(f_orders, li.l_orderkey == F.col("o_orderkey"), "left_semi").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )

    # per-(order, supplier) latest ship date
    sm = l1.groupBy("l_orderkey", "l_suppkey").agg(F.max("l_shipdate").alias("s_max"))
    # order-level stats: #suppliers, global max, #suppliers at max, 2nd max
    w = Window.partitionBy("l_orderkey")
    stats = (
        sm.withColumn("nsupp", F.count("*").over(w))
        .withColumn("max1", F.max("s_max").over(w))
        .withColumn(
            "n_at_max",
            F.sum(F.when(F.col("s_max") == F.col("max1"), 1).otherwise(0)).over(w),
        )
        .withColumn(
            "max2",
            F.max(F.when(F.col("s_max") < F.col("max1"), F.col("s_max"))).over(w),
        )
        .filter(F.col("nsupp") > 1)
        # latest ship date among the OTHER suppliers of this order
        .withColumn(
            "other_max",
            F.when(
                (F.col("s_max") < F.col("max1")) | (F.col("n_at_max") > 1), F.col("max1")
            ).otherwise(F.col("max2")),
        )
        .select("l_orderkey", "l_suppkey", "other_max")
    )

    waiting = l1.join(stats, ["l_orderkey", "l_suppkey"]).filter(
        F.col("l_shipdate") >= F.col("other_max")
    )
    sup = tbl(spark, sf_dir, "supplier")
    return (
        waiting.join(sup, waiting.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
