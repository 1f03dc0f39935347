"""Fifth relational wave: bool/bit aggregates, IGNORE NULLS gap-fill
(last-observation-carried-forward), explicit higher-order array
functions, and per-user event-sequence (trigram) mining.

LOCF is the time-series face of the reference's ordered-stream contract
(a monotone sample stream with dropouts — `cpp/src/reader.h:326-336`
enforces the ordering this fill relies on); sequence mining is the
classic event-analytics op over the same ordered stream. The rest close
the remaining SQL-surface gaps: the SQL-standard bool_and/bool_or and
bitwise aggregate family, and the lambda higher-order functions
(transform/filter/exists/aggregate) as first-class scalar coverage
rather than implementation detail of the vector operators.

Same cross-engine determinism rules as the rest of the registry.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl, tbl


@q(
    "agg_bool_bit",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_discount <= 0.1)                       AS all_low_disc,
           bool_or(l_tax > 0.07)                             AS any_high_tax,
           CAST(bit_and(CAST(l_orderkey % 256 AS BIGINT)) AS BIGINT) AS key_bit_and,
           CAST(bit_or(CAST(l_orderkey % 256 AS BIGINT)) AS BIGINT)  AS key_bit_or,
           CAST(bit_xor(CAST(l_orderkey % 256 AS BIGINT)) AS BIGINT) AS key_bit_xor,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "bool", "bitwise"),
)
def agg_bool_bit(spark, sf_dir):
    """SQL-standard boolean aggregates (EVERY/ANY) and the bitwise
    aggregate family — all distributive single-pass aggregates with
    map-side partials; bit_xor is the classic distributed checksum."""
    li = tbl(spark, sf_dir, "lineitem")
    key8 = (F.col("l_orderkey") % 256).cast("long")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_discount") <= 0.1).alias("all_low_disc"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        F.bit_and(key8).alias("key_bit_and"),
        F.bit_or(key8).alias("key_bit_or"),
        F.bit_xor(key8).alias("key_bit_xor"),
        F.count("*").alias("n"),
    )


@q(
    "ev_locf_fill",
    oracle="""
    WITH g AS (
        SELECT event_id, user_id, ts,
               CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
        FROM events)
    SELECT event_id, user_id, v AS raw_value,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM g
    """,
    tags=("events", "window", "gapfill"),
)
def ev_locf_fill(spark, sf_dir):
    """Last-observation-carried-forward gap fill: sensor dropouts
    (planted deterministically on every 7th event) take the most recent
    non-null reading in event order — `last(..., ignorenulls=True)` over
    a running frame, one window per user partition, values passed
    through bit-identically (no arithmetic). Leading nulls stay null in
    both engines."""
    g = events_tbl(spark, sf_dir).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return g.select(
        "event_id",
        "user_id",
        F.col("v").alias("raw_value"),
        F.last("v", ignorenulls=True).over(w).alias("filled_value"),
    )


@q(
    "fn_higher_order",
    oracle="""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings)
    SELECT vec_id,
           CAST(len(list_filter(e, x -> x > 0)) AS INT)                  AS n_pos,
           round(list_sum(list_transform(e, x -> x * x)), 6)             AS sum_sq,
           round(list_max(list_transform(e, x -> abs(x))), 6)            AS max_abs,
           round(list_sum(list_transform(e, x -> least(abs(x), 0.5))), 6) AS l1_clip,
           len(list_filter(e, x -> abs(x) > 2)) > 0                      AS has_outlier,
           len(list_filter(e, x -> abs(x) <= 4)) = len(e)                AS all_bounded
    FROM e
    """,
    tags=("scalar", "array", "lambda"),
)
def fn_higher_order(spark, sf_dir):
    """The lambda higher-order function family as first-class coverage:
    transform / filter / exists / forall / aggregate, all JVM-side over
    the embedding arrays (the oracle derives each via DuckDB list
    lambdas). Pure projection — zero shuffles; float32 entries are
    widened to double FIRST so both engines fold the same doubles in the
    same list order."""
    e = F.expr("transform(embedding, x -> cast(x as double))")
    emb = tbl(spark, sf_dir, "embeddings").select("vec_id", e.alias("e"))
    sum_ = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    return emb.select(
        "vec_id",
        F.size(F.filter("e", lambda x: x > 0)).alias("n_pos"),
        F.round(sum_(F.transform("e", lambda x: x * x)), 6).alias("sum_sq"),
        F.round(F.array_max(F.transform("e", F.abs)), 6).alias("max_abs"),
        F.round(sum_(F.transform("e", lambda x: F.least(F.abs(x), F.lit(0.5)))), 6).alias(
            "l1_clip"
        ),
        F.exists("e", lambda x: F.abs(x) > 2).alias("has_outlier"),
        F.forall("e", lambda x: F.abs(x) <= 4).alias("all_bounded"),
    )


_TRIGRAM_TOPK = 10


@q(
    "ev_event_trigrams",
    oracle=f"""
    WITH t AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS t1,
               lead(event_type, 2) OVER w AS t2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    tri AS (
        SELECT event_type || '>' || t1 || '>' || t2 AS trigram
        FROM t WHERE t2 IS NOT NULL),
    cnt AS (SELECT trigram, count(*) AS n FROM tri GROUP BY 1)
    SELECT trigram, n, rnk FROM (
        SELECT trigram, n,
               row_number() OVER (ORDER BY n DESC, trigram) AS rnk
        FROM cnt) WHERE rnk <= {_TRIGRAM_TOPK}
    """,
    tags=("events", "sequence"),
)
def ev_event_trigrams(spark, sf_dir):
    """Per-user event-sequence mining: the 10 most common 3-event
    chains. Trigrams form inside each user's ordered partition (two
    leads over ONE window — no self-joins), counts are one hash
    aggregation over the trigram strings, and the global top-k is
    orderBy+limit (TakeOrderedAndProject) with the rank window running
    over <= k rows."""
    ev = events_tbl(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    ).filter(F.col("t2").isNotNull())
    cnt = t.select(
        F.concat_ws(">", "event_type", "t1", "t2").alias("trigram")
    ).groupBy("trigram").agg(F.count("*").alias("n"))
    top = cnt.orderBy(F.col("n").desc(), F.col("trigram")).limit(_TRIGRAM_TOPK)
    w2 = Window.orderBy(F.col("n").desc(), F.col("trigram"))
    return top.select(
        "trigram", "n", F.row_number().over(w2).cast("long").alias("rnk")
    )


@q(
    "agg_listagg",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           count(*) AS n
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=("agg", "listagg"),
)
def agg_listagg(spark, sf_dir):
    """SQL:2016 LISTAGG ... WITHIN GROUP — the ordered string aggregate
    (DuckDB spells it string_agg ORDER BY). The WITHIN GROUP ordering is
    what makes the result deterministic and therefore oracle-checkable;
    an unordered collect would be engine-arbitrary."""
    tbl(spark, sf_dir, "nation").createOrReplaceTempView("nation_la")
    tbl(spark, sf_dir, "region").createOrReplaceTempView("region_la")
    return spark.sql(
        "SELECT r_name, listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations, "
        "count(*) AS n "
        "FROM nation_la JOIN region_la ON n_regionkey = r_regionkey "
        "GROUP BY r_name"
    )


@q(
    "fn_unpivot",
    oracle="""
    WITH agg AS (
        SELECT l_returnflag,
               round(sum(l_quantity), 2)      AS sum_qty,
               round(sum(l_discount), 2)      AS sum_disc,
               round(sum(l_tax), 2)           AS sum_tax
        FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, metric, amount
    FROM agg UNPIVOT (amount FOR metric IN (sum_qty, sum_disc, sum_tax))
    """,
    tags=("relational", "unpivot"),
)
def fn_unpivot(spark, sf_dir):
    """UNPIVOT (melt) — the inverse of pivot_status_priority: wide
    per-group aggregates rotated into (group, metric, amount) rows.
    The unpivot runs AFTER the aggregation, so it rotates |groups| x 3
    rows, never the fact table. NULL metrics are filtered explicitly:
    Spark's unpivot RETAINS null values while DuckDB's UNPIVOT excludes
    them by default — invisible on this data (every group aggregates
    non-null doubles) but a real cross-engine semantic difference."""
    agg = (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_discount"), 2).alias("sum_disc"),
            F.round(F.sum("l_tax"), 2).alias("sum_tax"),
        )
    )
    return agg.unpivot(
        "l_returnflag", ["sum_qty", "sum_disc", "sum_tax"], "metric", "amount"
    ).filter(F.col("amount").isNotNull())


@q(
    "scalar_decimal",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS exact_price_sum,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS exact_disc_sum,
           CAST(min(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
           CAST(max(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("scalar", "decimal"),
)
def scalar_decimal(spark, sf_dir):
    """Exact DECIMAL money arithmetic — the engine face double-based
    aggregation can't give: sums accumulate in fixed-point with NO
    float rounding drift, so both engines produce the identical exact
    value regardless of partial-aggregation order (the whole point of
    decimal: the double path would need round() to parity at all).
    Cast back to double only at the very end for a uniform gate dtype."""
    li = tbl(spark, sf_dir, "lineitem")
    dp = F.col("l_extendedprice").cast("decimal(18,2)")
    dd = (1 - F.col("l_discount")).cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(dp).cast("double").alias("exact_price_sum"),
        F.sum(dp * dd).cast("double").alias("exact_disc_sum"),
        F.min(dp).cast("double").alias("min_price"),
        F.max(dp).cast("double").alias("max_price"),
    )


@q(
    "agg_argminmax",
    oracle="""
    SELECT o_orderstatus,
           arg_min(o_orderpriority, o_orderkey) AS first_priority,
           arg_max(o_orderpriority, o_orderkey) AS last_priority,
           CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
           count(*)                             AS n
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "argminmax"),
)
def agg_argminmax(spark, sf_dir):
    """arg-min/arg-max aggregates (min_by/max_by — DuckDB spells them
    arg_min/arg_max) plus conditional counting. Deterministic because
    the ordering key (o_orderkey) is unique — with ties both engines
    would pick arbitrarily; unique-key argmin is the only
    oracle-checkable form, and the production-safe one."""
    o = tbl(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.min_by("o_orderpriority", "o_orderkey").alias("first_priority"),
        F.max_by("o_orderpriority", "o_orderkey").alias("last_priority"),
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        F.count("*").alias("n"),
    )


@q(
    "agg_grouping_id",
    oracle="""
    SELECT coalesce(l_returnflag, '(all)') AS rf,
           coalesce(l_linestatus, '(all)') AS ls,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup", "grouping"),
)
def agg_grouping_id(spark, sf_dir):
    """grouping()/grouping_id() over a rollup — the functions that make
    super-aggregate rows distinguishable from genuine NULL groups (both
    engines bit-pack the grouping list MSB-first). Coalesced labels plus
    the explicit flags give the gate full visibility into which rows are
    subtotals."""
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.grouping("l_returnflag").cast("long").alias("g_rf"),
            F.grouping("l_linestatus").cast("long").alias("g_ls"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("ls"),
            "gid",
            "g_rf",
            "g_ls",
            "n",
        )
    )


@q(
    "pipeline_cdc_merge",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 4 <> 0),
    changes AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 4 = 0 THEN 'I'
                    WHEN o_orderkey % 8 = 1 THEN 'U'
                    ELSE 'D' END AS op,
               round(o_totalprice + 10.0, 2) AS new_price
        FROM orders
        WHERE o_orderkey % 4 = 0 OR o_orderkey % 8 = 1 OR o_orderkey % 8 = 2)
    SELECT COALESCE(b.o_orderkey, c.o_orderkey) AS o_orderkey,
           round(CASE WHEN c.op IN ('U', 'I') THEN c.new_price
                      ELSE b.o_totalprice END, 2) AS price,
           CASE WHEN c.op IS NULL THEN 'kept'
                WHEN c.op = 'U' THEN 'updated'
                ELSE 'inserted' END AS row_source
    FROM base b FULL OUTER JOIN changes c USING (o_orderkey)
    WHERE c.op IS NULL OR c.op <> 'D'
    """,
    tags=("pipeline", "cdc", "merge"),
)
def pipeline_cdc_merge(spark, sf_dir):
    """MERGE/upsert (CDC apply) without a table format: a deterministic
    changes feed (inserts = the held-out quarter of orders, updates =
    keys ≡1 mod 8 with +10 price, deletes = keys ≡2 mod 8) applied onto
    the base snapshot via ONE full-outer join — insert rows surface from
    the change side, updates override the base value, deletes drop, and
    untouched base rows pass through. The classic batch-upsert shape
    Delta/Iceberg MERGE compiles down to; expressed directly so it runs
    on plain parquet.

    100 TB posture: one shuffle per side on the merge key (AQE handles
    skewed keys); at scale the base side would be bucketed on the key
    (storage.write_bucketed) making the merge exchange-free on that
    side. No collect, no driver loop — the whole apply is one plan."""
    orders = tbl(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 4 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    changes = (
        orders.filter(
            (F.col("o_orderkey") % 4 == 0)
            | (F.col("o_orderkey") % 8 == 1)
            | (F.col("o_orderkey") % 8 == 2)
        )
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 4 == 0, F.lit("I"))
            .when(F.col("o_orderkey") % 8 == 1, F.lit("U"))
            .otherwise(F.lit("D"))
            .alias("op"),
            F.round(F.col("o_totalprice") + 10.0, 2).alias("new_price"),
        )
    )
    merged = base.join(changes, "o_orderkey", "full_outer")
    return (
        merged.filter(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            "o_orderkey",
            F.round(
                F.when(F.col("op").isin("U", "I"), F.col("new_price")).otherwise(
                    F.col("o_totalprice")
                ),
                2,
            ).alias("price"),
            F.when(F.col("op").isNull(), F.lit("kept"))
            .when(F.col("op") == "U", F.lit("updated"))
            .otherwise(F.lit("inserted"))
            .alias("row_source"),
        )
    )


@q(
    "rec_cte_ancestry",
    oracle="""
    WITH RECURSIVE anc AS (
        SELECT s_suppkey, s_suppkey AS cur, 0 AS depth FROM supplier
        UNION ALL
        SELECT s_suppkey, cur // 2, depth + 1 FROM anc WHERE cur > 1
    )
    SELECT s_suppkey, CAST(max(depth) AS BIGINT) AS depth_to_root,
           CAST(count(*) AS BIGINT) AS chain_len
    FROM anc GROUP BY s_suppkey
    """,
    tags=("relational", "recursive"),
)
def rec_cte_ancestry(spark, sf_dir):
    """Recursive CTE (Spark 4.0's WITH RECURSIVE): every supplier walks
    its implicit binary-tree ancestry (parent = key DIV 2) to the root
    and reports depth + chain length — the org-chart/BOM traversal shape
    SQL engines express recursively. Runs as Catalyst's iterative
    union-loop (driver coordinates one distributed step per level, ~log2
    N levels here); contrast operators/components.py, which hand-rolls
    the same fixpoint pattern with localCheckpoint lineage truncation
    for the graph case where per-iteration dedup matters."""
    tbl(spark, sf_dir, "supplier").createOrReplaceTempView("rec_supplier_v")
    return spark.sql(
        """
        WITH RECURSIVE anc AS (
            SELECT s_suppkey, s_suppkey AS cur, 0 AS depth FROM rec_supplier_v
            UNION ALL
            SELECT s_suppkey, cur DIV 2, depth + 1 FROM anc WHERE cur > 1
        )
        SELECT s_suppkey, CAST(max(depth) AS BIGINT) AS depth_to_root,
               CAST(count(*) AS BIGINT) AS chain_len
        FROM anc GROUP BY s_suppkey
        """
    )


@q(
    "scalar_variant",
    oracle="""
    SELECT o_orderkey, o_totalprice AS v_price, o_orderstatus AS v_status,
           CAST(o_orderkey % 5 AS BIGINT) AS v_bucket
    FROM orders
    """,
    tags=("scalar", "variant", "json"),
)
def scalar_variant(spark, sf_dir):
    """VARIANT round trip (Spark 4.0's semi-structured type): each order
    is serialized to JSON, parsed into a VARIANT value (binary
    semi-structured encoding — the fast path for schemaless columns),
    and the fields extracted back with typed variant_get paths,
    including a nested object. The oracle reads the SAME values straight
    from the base columns, so the whole encode→parse→extract loop must
    be lossless."""
    o = tbl(spark, sf_dir, "orders")
    j = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").alias("p"),
            F.struct(
                F.col("o_orderstatus").alias("s"),
                (F.col("o_orderkey") % 5).alias("b"),
            ).alias("nest"),
        )
    )
    v = F.parse_json(j)
    return o.select(
        "o_orderkey",
        F.variant_get(v, "$.p", "double").alias("v_price"),
        F.variant_get(v, "$.nest.s", "string").alias("v_status"),
        F.variant_get(v, "$.nest.b", "bigint").alias("v_bucket"),
    )


@q(
    "join_lateral_topk",
    oracle="""
    SELECT n.n_name, c.c_custkey, c.c_acctbal
    FROM nation n, LATERAL (
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
    """,
    tags=("join", "lateral"),
)
def join_lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery join (per-nation top-2 customers by
    balance): the SQL-standard way to express per-group top-k as a join.
    Catalyst decorrelates the lateral limit into a window under the
    hood, so the physical plan is the same rank-filter shape as
    win_topk_per_group — the point here is the SURFACE: a user porting
    lateral SQL runs it unchanged. Ties broken by c_custkey both
    engines."""
    tbl(spark, sf_dir, "nation").createOrReplaceTempView("lat_nation_v")
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer_v")
    return spark.sql(
        """
        SELECT n.n_name, c.c_custkey, c.c_acctbal
        FROM lat_nation_v n, LATERAL (
            SELECT c_custkey, c_acctbal FROM lat_customer_v
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
        """
    )


@q(
    "dq_expectations",
    oracle="""
    SELECT 'orders_pk_unique' AS rule,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations,
           CAST(count(*) AS BIGINT) AS checked
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_not_null',
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_customer_fk',
           CAST(count(*) AS BIGINT), (SELECT CAST(count(*) AS BIGINT) FROM orders)
    FROM orders o WHERE NOT EXISTS (
        SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_quantity_positive',
           CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    """,
    tags=("quality", "dq"),
)
def dq_expectations(spark, sf_dir):
    """Deequ-style data-quality expectations in one submitted job: primary
    -key uniqueness, not-null, referential integrity (orders→customer,
    LEFT ANTI join count), and value-range invariants — each reported as (rule, violations, checked). The
    per-table rules fuse into single scans (one aggregate pass per
    table); the FK check is the only join — customer scales with SF, so
    no broadcast hint (AQE broadcasts at laptop scale, shuffles at
    100x). This is the acceptance gate a pipeline runs before
    trusting a new data drop — at 100 TB the same plan holds because
    every rule is a partial-aggregatable count."""
    orders = tbl(spark, sf_dir, "orders")
    cust = tbl(spark, sf_dir, "customer").select("c_custkey")
    li = tbl(spark, sf_dir, "lineitem")
    n_orders = orders.count()

    o_rules = orders.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).cast("long").alias("pk"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).cast("long").alias("nn"),
        F.count("*").cast("long").alias("n"),
    ).select(
        F.explode(
            F.array(
                F.struct(F.lit("orders_pk_unique").alias("rule"), F.col("pk").alias("violations"), F.col("n").alias("checked")),
                F.struct(F.lit("orders_custkey_not_null").alias("rule"), F.col("nn").alias("violations"), F.col("n").alias("checked")),
            )
        ).alias("r")
    ).select("r.rule", "r.violations", "r.checked")

    fk = orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti").agg(
        F.lit("orders_customer_fk").alias("rule"),
        F.count("*").cast("long").alias("violations"),
        F.lit(n_orders).cast("long").alias("checked"),
    )

    li_rules = li.agg(
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(0)
        ).cast("long").alias("rng"),
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).cast("long").alias("ord"),
        F.count("*").cast("long").alias("n"),
    ).select(
        F.explode(
            F.array(
                F.struct(F.lit("lineitem_discount_range").alias("rule"), F.col("rng").alias("violations"), F.col("n").alias("checked")),
                F.struct(F.lit("lineitem_quantity_positive").alias("rule"), F.col("ord").alias("violations"), F.col("n").alias("checked")),
            )
        ).alias("r")
    ).select("r.rule", "r.violations", "r.checked")

    return o_rules.unionByName(fk).unionByName(li_rules)
