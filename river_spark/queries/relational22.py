"""Relational wave 22 (round 9): data-quality audits — referential
integrity, key uniqueness, and dense calendar grids.

Bit-exactness rules (tests/test_oracle.py): everything here is exact
integer counts; the calendar grid is generated from the same
(min_day, max_day) bounds in both engines.

Reference parity: none — warehouse-side quality gates over the
reference's ingested-parquet data model.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl, tbl


@q(
    "dq_referential_integrity",
    oracle="""
    SELECT 'orders->customer' AS relationship,
           (SELECT count(*) FROM orders) AS n_rows,
           (SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS n_orphans
    UNION ALL
    SELECT 'lineitem->orders',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM part p
                               WHERE p.p_partkey = l.l_partkey))
    UNION ALL
    SELECT 'lineitem->supplier',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM supplier s
                               WHERE s.s_suppkey = l.l_suppkey))
    """,
    tags=("dq", "integrity", "audit"),
)
def dq_referential_integrity(spark, sf_dir):
    """Referential-integrity audit: orphan counts for every fact->dim
    foreign key — the first gate a warehouse load runs (an orphan count
    that moves off zero means a partial load or an out-of-order
    ingest). Each check is an anti-join count: exact integers.

    100 TB posture: every dim here (orders/customer/part/supplier)
    scales linearly with the fact, so NO broadcast hint — AQE picks
    broadcast at laptop scale and SMJ/shuffled-hash at 100x, where a
    forced multi-billion-key broadcast would OOM the executors. The
    fact is scanned once per relationship with only the key column
    read (pushdown-pruned)."""
    li = tbl(spark, sf_dir, "lineitem")
    rels = [
        (
            "orders->customer",
            tbl(spark, sf_dir, "orders").select("o_custkey"),
            tbl(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k")),
            "o_custkey",
        ),
        (
            "lineitem->orders",
            li.select("l_orderkey"),
            tbl(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k")),
            "l_orderkey",
        ),
        (
            "lineitem->part",
            li.select("l_partkey"),
            tbl(spark, sf_dir, "part").select(F.col("p_partkey").alias("k")),
            "l_partkey",
        ),
        (
            "lineitem->supplier",
            li.select("l_suppkey"),
            tbl(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k")),
            "l_suppkey",
        ),
    ]
    out = None
    for name, fact, dim, key in rels:
        orphans = fact.join(
            dim, fact[key] == dim.k, "left_anti"
        ).agg(F.count("*").alias("n_orphans"))
        rows = fact.agg(F.count("*").alias("n_rows"))
        row = (
            rows.crossJoin(orphans)
            .select(
                F.lit(name).alias("relationship"),
                "n_rows",
                "n_orphans",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


@q(
    "dq_key_uniqueness",
    oracle="""
    SELECT 'orders.o_orderkey' AS key_name,
           (SELECT count(*) FROM orders) AS n_rows,
           (SELECT count(DISTINCT o_orderkey) FROM orders) AS n_distinct,
           (SELECT count(*) FROM (
               SELECT o_orderkey FROM orders
               GROUP BY o_orderkey HAVING count(*) > 1) d) AS n_dup_keys
    UNION ALL
    SELECT 'customer.c_custkey',
           (SELECT count(*) FROM customer),
           (SELECT count(DISTINCT c_custkey) FROM customer),
           (SELECT count(*) FROM (
               SELECT c_custkey FROM customer
               GROUP BY c_custkey HAVING count(*) > 1) d)
    UNION ALL
    SELECT 'events.event_id',
           (SELECT count(*) FROM events),
           (SELECT count(DISTINCT event_id) FROM events),
           (SELECT count(*) FROM (
               SELECT event_id FROM events
               GROUP BY event_id HAVING count(*) > 1) d)
    UNION ALL
    SELECT 'documents.doc_id',
           (SELECT count(*) FROM documents),
           (SELECT count(DISTINCT doc_id) FROM documents),
           (SELECT count(*) FROM (
               SELECT doc_id FROM documents
               GROUP BY doc_id HAVING count(*) > 1) d)
    """,
    tags=("dq", "uniqueness", "audit"),
)
def dq_key_uniqueness(spark, sf_dir):
    """Primary-key uniqueness audit across the warehouse's key tables:
    row count, distinct-key count, and the number of duplicated key
    values — the second standard load gate (a replayed batch shows up
    here before it corrupts any join). Exact integers.

    100 TB posture: each table is one hash agg on its key (map-side
    combinable); the four audits are independent scans unioned at the
    driver-plan level."""

    def audit(name, df, key):
        g = df.groupBy(key).agg(F.count("*").alias("c"))
        return g.agg(
            F.lit(name).alias("key_name"),
            F.sum("c").alias("n_rows"),
            F.count("*").alias("n_distinct"),
            F.count(F.when(F.col("c") > 1, 1)).alias("n_dup_keys"),
        )

    out = audit("orders.o_orderkey", tbl(spark, sf_dir, "orders"), "o_orderkey")
    for name, t, k in [
        ("customer.c_custkey", "customer", "c_custkey"),
        ("events.event_id", "events", "event_id"),
        ("documents.doc_id", "documents", "doc_id"),
    ]:
        out = out.unionByName(audit(name, tbl(spark, sf_dir, t), k))
    return out


@q(
    "ev_dense_daily_grid",
    oracle="""
    WITH bounds AS (
        SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS lo,
               CAST(max(date_trunc('day', ts)) AS DATE) AS hi
        FROM events),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day,
               t.event_type
        FROM bounds,
             (SELECT DISTINCT event_type FROM events) t),
    actual AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) AS n
        FROM events GROUP BY 1, 2)
    SELECT g.event_type, strftime(g.day, '%Y-%m-%d') AS day,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n
    FROM grid g LEFT JOIN actual a
      ON g.event_type = a.event_type AND g.day = a.day
    """,
    tags=("events", "calendar", "densify"),
)
def ev_dense_daily_grid(spark, sf_dir):
    """Dense (day x event_type) activity grid with explicit zeros — the
    densification every time-series consumer needs (a missing day must
    be a 0 row, not an absent row, or downstream moving averages and
    anomaly z-scores silently skip the outage they should flag). The
    grid generates from the data's own [min_day, max_day] bounds in
    both engines; days emit as strings (the repo's timestamp-dtype
    idiom). Exact integers.

    100 TB posture: the grid is days x types (tiny) built from a 1-row
    bounds agg and broadcast against the daily rollup; the fact table
    aggregates once."""
    ev = events_tbl(spark, sf_dir)
    bounds = ev.agg(
        F.min(F.date_trunc("day", "ts").cast("date")).alias("lo"),
        F.max(F.date_trunc("day", "ts").cast("date")).alias("hi"),
    )
    types = ev.select("event_type").distinct()
    grid = (
        bounds.select(
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
        )
        .crossJoin(F.broadcast(types))
    )
    actual = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    return (
        grid.join(actual, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )
