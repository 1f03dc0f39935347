"""Third relational wave: NULL semantics (explicit ordering — Spark and
DuckDB default opposite NULL sort placement), map functions, and JSON
struct extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import r2, tbl


@q(
    "null_semantics",
    oracle="""
    SELECT c_custkey,
           o_orderkey IS NULL                       AS no_order,
           coalesce(o_totalprice, -1.0)             AS price_or_default,
           (o_orderstatus IS NOT DISTINCT FROM 'O') AS is_open_nullsafe
    FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
      ON c_custkey = o_custkey
    """,
    tags=("null", "outer"),
)
def null_semantics(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer")
    big = tbl(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    j = cust.join(big, cust.c_custkey == big.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.col("o_orderkey").isNull().alias("no_order"),
        F.coalesce("o_totalprice", F.lit(-1.0)).alias("price_or_default"),
        F.col("o_orderstatus").eqNullSafe(F.lit("O")).alias("is_open_nullsafe"),
    )


@q(
    "null_ordering",
    oracle="""
    SELECT c_custkey, price FROM (
        SELECT c_custkey, o.o_totalprice AS price
        FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
          ON c_custkey = o_custkey)
    ORDER BY price DESC NULLS LAST, c_custkey
    LIMIT 50
    """,
    tags=("null", "sort"),
)
def null_ordering(spark, sf_dir):
    """Explicit NULLS LAST on both engines — their defaults disagree
    (Spark: nulls first on asc; DuckDB: nulls last), so implicit ordering
    is a portability trap this query pins down."""
    cust = tbl(spark, sf_dir, "customer")
    big = tbl(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    j = cust.join(big, cust.c_custkey == big.o_custkey, "left").select(
        "c_custkey", F.col("o_totalprice").alias("price")
    )
    return j.orderBy(F.col("price").desc_nulls_last(), "c_custkey").limit(50)


@q(
    "fn_map",
    oracle="""
    SELECT o_orderkey,
           CAST(map(['status', 'priority'], [o_orderstatus, o_orderpriority])['status'][1] AS VARCHAR)
             AS status_from_map,
           CAST(len(map_keys(map(['status', 'priority'], [o_orderstatus, o_orderpriority]))) AS BIGINT)
             AS n_keys
    FROM orders
    """,
    tags=("map", "scalar"),
)
def fn_map(spark, sf_dir):
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"), F.lit("priority"), F.col("o_orderpriority")
    )
    return tbl(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_from_map"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
    )


@q(
    "fn_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT)          AS k,
           json_extract_string('{"outer": {"inner": 7}}', '$.outer.inner') AS nested
    FROM events
    """,
    tags=("json", "scalar"),
)
def fn_json_struct(spark, sf_dir):
    from pyspark.sql import types as T

    parsed = F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))
    return tbl(spark, sf_dir, "events").select(
        "event_id",
        parsed.getField("k").alias("k"),
        F.get_json_object(F.lit('{"outer": {"inner": 7}}'), "$.outer.inner").alias("nested"),
    )


@q(
    "win_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           count(*) OVER (PARTITION BY o_custkey ORDER BY epoch_days
                          RANGE BETWEEN 30 PRECEDING AND 30 FOLLOWING) AS orders_within_30d,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY epoch_days
                          RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS spend_30d
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(datediff('day', TIMESTAMP '1990-01-01', o_orderdate) AS BIGINT) AS epoch_days
          FROM orders) t
    """,
    tags=("window", "range_frame"),
)
def win_range_frame(spark, sf_dir):
    """Value-based window frames (RANGE BETWEEN) — a different physical
    frame evaluator than ROWS BETWEEN; ±30-day neighborhood per customer."""
    from pyspark.sql import Window

    o = tbl(spark, sf_dir, "orders").withColumn(
        "epoch_days",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date")).cast("long"),
    )
    w_both = Window.partitionBy("o_custkey").orderBy("epoch_days").rangeBetween(-30, 30)
    w_back = Window.partitionBy("o_custkey").orderBy("epoch_days").rangeBetween(-30, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(w_both).alias("orders_within_30d"),
        r2(F.sum("o_totalprice").over(w_back)).alias("spend_30d"),
    )


@q(
    "win_value_functions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS last_order,
           nth_value(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "value_fn"),
)
def win_value_functions(spark, sf_dir):
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return tbl(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@q(
    "win_distribution_functions",
    oracle="""
    SELECT c_custkey,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window", "distribution"),
)
def win_distribution_functions(spark, sf_dir):
    """The two distribution window functions the rank family doesn't
    cover: percent_rank ((rank-1)/(n-1)) and cume_dist (rank/n) over
    account balance within each nation — deterministic under the
    c_custkey tie-break. Emitted RAW, not rounded: both engines compute
    the identical integer-ratio division (verified bit-level), while
    round(., 6) would DIVERGE on exact midpoints — with 640-row
    partitions cume hits values like 0.5203125, which Spark rounds
    half-up (0.520313) and DuckDB half-even (0.520312)."""
    from pyspark.sql import Window

    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return tbl(spark, sf_dir, "customer").select(
        "c_custkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@q(
    "scalar_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255       AS low_byte,
           o_orderkey | 4096      AS with_flag,
           xor(o_orderkey, 21845) AS toggled,
           o_orderkey << 3        AS shifted_up,
           o_orderkey >> 2        AS shifted_down
    FROM orders WHERE o_orderkey % 97 = 0
    """,
    tags=("scalar", "bitwise"),
)
def scalar_bitwise(spark, sf_dir):
    """Bitwise scalar coverage (&, |, xor, shifts) — the ops behind flag
    packing, bucket routing, and the engine's own band hashing, pinned
    cross-engine on integer keys. (DuckDB spells exclusive-or ``xor()``
    because ``^`` is exponentiation there.)"""
    o = tbl(spark, sf_dir, "orders").where(F.col("o_orderkey") % 97 == 0)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("toggled"),
        F.shiftleft(k, 3).alias("shifted_up"),
        F.shiftright(k, 2).alias("shifted_down"),
    )


@q(
    "scalar_levenshtein",
    oracle="""
    SELECT doc_id,
           levenshtein(substring(text, 1, 24), substring(text, 25, 24)) AS self_dist,
           levenshtein(lower(substring(text, 1, 16)), 'the fast key order') AS probe_dist
    FROM documents
    """,
    tags=("scalar", "fuzzy"),
)
def scalar_levenshtein(spark, sf_dir):
    """Edit-distance coverage — the fuzzy-matching primitive behind
    entity resolution and typo-tolerant dedup. Both engines implement
    classic Levenshtein (unit insert/delete/substitute), pinned here on
    adjacent text windows and a fixed probe string."""
    d = tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.levenshtein(
            F.substring("text", 1, 24), F.substring("text", 25, 24)
        ).cast("long").alias("self_dist"),
        F.levenshtein(
            F.lower(F.substring("text", 1, 16)), F.lit("the fast key order")
        ).cast("long").alias("probe_dist"),
    )
