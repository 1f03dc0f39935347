"""Relational wave 9 (round 8, session 3): marketing-analytics and
Spark-4.0-surface operators.

- ``scalar_collation``: collation-aware grouping (Spark 4.0 COLLATE,
  UTF8_LCASE) proven equivalent to an independent lower()-keyed oracle.
- ``ev_attribution_last_touch``: last-touch marketing attribution —
  every purchase credits the user's most recent preceding click/view,
  via one IGNORE NULLS window (no self-join).
- ``pipeline_rfm_segments``: recency/frequency/monetary quintile
  segmentation, the classic CRM rollup, with deterministic tiebreaks.

Bit-exactness rules follow tests/test_oracle.py: attribution emits only
picked values (no float arithmetic); RFM is integer (dates as epoch
days, money as cents, ntile ranks); collation counts are integers.

Reference parity: the reference engine (pbotros/river) has no
relational layer (its surface is the stream transport,
/root/reference/cpp/src/writer.cpp); these extend the analytics surface
the brief requires.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl, tbl


# ---------------------------------------------------------------------------
# Collation-aware grouping (Spark 4.0)
# ---------------------------------------------------------------------------
@q(
    "scalar_collation",
    oracle="""
    WITH mixed AS (
        SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand)
                    ELSE lower(p_brand) END AS brand_mixed
        FROM part)
    SELECT lower(min(brand_mixed)) AS brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT brand_mixed) AS BIGINT) AS n_case_variants
    FROM mixed GROUP BY lower(brand_mixed)
    """,
    tags=("scalar", "collation", "spark4"),
)
def scalar_collation(spark, sf_dir):
    """Collation-aware grouping — Spark 4.0's COLLATE surface: brand
    names are deliberately case-scrambled (upper for even part keys,
    lower for odd), then grouped under UTF8_LCASE collation, which makes
    'PROMO#1' and 'promo#1' ONE group at comparison level without
    rewriting the data. The oracle groups by lower() independently —
    equality of group counts and per-group case-variant counts proves
    the collated grouping produced exactly the case-insensitive
    partition. The emitted key is lower(min(raw)) (binary min, then
    lower), deterministic regardless of which variant a collated group
    happens to surface first.

    100 TB posture: collation is evaluated inside codegen (a collation
    id on the string type, not a row-level UDF), so the group-by remains
    an ordinary map-side-combinable hash aggregation; contrast with the
    pre-4.0 workaround of materializing lower(col) copies of every
    string column."""
    mixed = tbl(spark, sf_dir, "part").select(
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_brand"))
        .otherwise(F.lower("p_brand"))
        .alias("brand_mixed")
    )
    return (
        mixed.groupBy(F.expr("collate(brand_mixed, 'UTF8_LCASE')").alias("bm"))
        .agg(
            F.lower(F.min(F.col("brand_mixed").cast("string"))).alias("brand"),
            F.count("*").alias("n_parts"),
            F.countDistinct(F.col("brand_mixed").cast("string")).alias(
                "n_case_variants"
            ),
        )
        .drop("bm")
    )


# ---------------------------------------------------------------------------
# Last-touch attribution
# ---------------------------------------------------------------------------
@q(
    "ev_attribution_last_touch",
    oracle="""
    WITH seq AS (
        SELECT event_id, user_id, ts, event_type, value,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN event_id END IGNORE NULLS) OVER w
                   AS touch_event_id,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN event_type END IGNORE NULLS) OVER w
                   AS touch_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT event_id AS purchase_id, user_id, value AS revenue,
           touch_event_id, touch_type
    FROM seq WHERE event_type = 'purchase'
    """,
    tags=("events", "attribution", "window"),
)
def ev_attribution_last_touch(spark, sf_dir):
    """Last-touch marketing attribution: every purchase credits the
    user's most recent PRECEDING click or view (the industry-default
    credit model). One per-user ordered window with two IGNORE NULLS
    last_value picks — no purchase x touchpoint self-join, no arrays;
    purchases with no prior touch attribute to NULL (organic). All
    outputs are picked values (ids, types, the stored revenue double),
    so the gate is bit-exact with zero float arithmetic.

    100 TB posture: the window partitions by user — state per task is
    one user's history, and the same single-exchange shape serves every
    credit model (first-touch = first_value, linear = a count over the
    same frame). The streaming twin is river_stream_locf's carried
    state: attribution IS last-observation-carried-forward over
    touchpoints."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(
        F.col("event_type").isin("click", "view"), F.col("event_id")
    )
    touch_ty = F.when(
        F.col("event_type").isin("click", "view"), F.col("event_type")
    )
    seq = events_tbl(spark, sf_dir).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.last(touch, ignorenulls=True).over(w).alias("touch_event_id"),
        F.last(touch_ty, ignorenulls=True).over(w).alias("touch_type"),
    )
    return seq.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("value").alias("revenue"),
        "touch_event_id",
        "touch_type",
    )


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------
@q(
    "pipeline_rfm_segments",
    oracle="""
    WITH rfm AS (
        SELECT o_custkey,
               CAST(date_diff('day', DATE '1970-01-01', max(o_orderdate))
                    AS BIGINT) AS recency_day,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS monetary_cents
        FROM orders GROUP BY o_custkey),
    scored AS (
        SELECT *,
               ntile(5) OVER (ORDER BY recency_day, o_custkey) AS r,
               ntile(5) OVER (ORDER BY frequency, o_custkey) AS f,
               ntile(5) OVER (ORDER BY monetary_cents, o_custkey) AS m
        FROM rfm)
    SELECT o_custkey, recency_day, frequency, monetary_cents,
           CAST(r * 100 + f * 10 + m AS BIGINT) AS rfm_code
    FROM scored
    """,
    tags=("pipeline", "rfm", "segmentation"),
)
def pipeline_rfm_segments(spark, sf_dir):
    """RFM customer segmentation — the classic CRM rollup: per-customer
    Recency (latest order date as epoch days), Frequency (order count),
    Monetary (lifetime cents), each scored into quintiles, combined as
    a 3-digit segment code (555 = best). Quintiles are ntile(5) with
    the customer key as tiebreak, so every rank — and therefore every
    code — is deterministic and integer-exact across engines.

    100 TB posture: the per-customer aggregation is the only data-sized
    stage (one hash agg over orders); the three ntile windows run over
    the CUSTOMER table (the small dimension — |customers| rows, not
    |orders|). ntile's global ordering is a single-partition sort of
    that dimension; at extreme customer counts the production variant
    swaps ntile for approx-quantile cutoff joins (the agg_approx_
    quantile pattern), trading exact rank boundaries for a broadcast."""
    rfm = (
        tbl(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("o_orderdate"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("recency_day"),
            F.count("*").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "monetary_cents"
            ),
        )
    )
    scored = rfm.select(
        "*",
        F.ntile(5).over(Window.orderBy("recency_day", "o_custkey")).alias("r"),
        F.ntile(5).over(Window.orderBy("frequency", "o_custkey")).alias("f"),
        F.ntile(5).over(Window.orderBy("monetary_cents", "o_custkey")).alias("m"),
    )
    return scored.select(
        "o_custkey",
        "recency_day",
        "frequency",
        "monetary_cents",
        (F.col("r") * 100 + F.col("f") * 10 + F.col("m"))
        .cast("long")
        .alias("rfm_code"),
    )
