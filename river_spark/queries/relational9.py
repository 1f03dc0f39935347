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


# ---------------------------------------------------------------------------
# Welch's t-test (A/B experiment readout)
# ---------------------------------------------------------------------------
@q(
    "ab_welch_ttest",
    oracle="""
    WITH assigned AS (
        SELECT CASE WHEN (('0x' || substr(md5('exp7~' || CAST(user_id AS
                   VARCHAR)), 1, 8))::BIGINT % 2) = 0 THEN 'A' ELSE 'B'
               END AS arm,
               value
        FROM events WHERE event_type = 'purchase'),
    stats AS (
        SELECT arm, CAST(count(*) AS BIGINT) AS n,
               round(avg(value), 6) AS mean,
               round(var_samp(value), 6) AS var
        FROM assigned GROUP BY arm),
    wide AS (
        SELECT max(CASE WHEN arm = 'A' THEN n END) AS n_a,
               max(CASE WHEN arm = 'A' THEN mean END) AS mean_a,
               max(CASE WHEN arm = 'A' THEN var END) AS var_a,
               max(CASE WHEN arm = 'B' THEN n END) AS n_b,
               max(CASE WHEN arm = 'B' THEN mean END) AS mean_b,
               max(CASE WHEN arm = 'B' THEN var END) AS var_b
        FROM stats)
    SELECT n_a, mean_a, var_a, n_b, mean_b, var_b,
           round((mean_a - mean_b) /
                 sqrt(var_a / n_a + var_b / n_b), 6) AS t_stat,
           round(pow(var_a / n_a + var_b / n_b, 2) /
                 (pow(var_a / n_a, 2) / (n_a - 1)
                  + pow(var_b / n_b, 2) / (n_b - 1)), 4) AS welch_df
    FROM wide
    """,
    tags=("analytics", "abtest", "stats"),
)
def ab_welch_ttest(spark, sf_dir):
    """The A/B experiment readout: users are assigned to arms by an
    md5 hash of (salt, user_id) — the stateless, leakage-safe assignment
    every experimentation platform uses (and the same idiom as
    pipeline_train_split) — and purchase values are compared with
    Welch's unequal-variance t-test: per-arm n/mean/var from ONE hash
    aggregation, then the t statistic and Welch-Satterthwaite degrees
    of freedom computed on the 2-row result. Means/vars are rounded
    BEFORE the t computation so both engines feed identical doubles
    into the identical closed form — the gate then checks t and df
    bit-level.

    100 TB posture: the entire test is one partial-aggregatable scan
    (count/sum/sumsq per arm) reduced to 2 rows — the canonical
    sufficient-statistics pattern: no event ever crosses the network
    except inside map-side partial aggregates. A thousand parallel
    experiments would group by (experiment_id, arm) in the same
    single scan."""
    arm = F.when(
        F.expr(
            "pmod(cast(conv(substring(md5(concat('exp7~', cast(user_id as string))), "
            "1, 8), 16, 10) as bigint), 2)"
        )
        == 0,
        F.lit("A"),
    ).otherwise(F.lit("B"))
    assigned = (
        events_tbl(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(arm.alias("arm"), "value")
    )
    stats = assigned.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 6).alias("mean"),
        F.round(F.var_samp("value"), 6).alias("var"),
    )
    wide = stats.agg(
        *[
            F.max(F.when(F.col("arm") == a, F.col(c))).alias(f"{c}_{a.lower()}")
            for a in ("A", "B")
            for c in ("n", "mean", "var")
        ]
    )
    se2 = F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    return wide.select(
        "n_a",
        "mean_a",
        "var_a",
        "n_b",
        "mean_b",
        "var_b",
        F.round((F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("var_a") / F.col("n_a"), 2) / (F.col("n_a") - 1)
                + F.pow(F.col("var_b") / F.col("n_b"), 2) / (F.col("n_b") - 1)
            ),
            4,
        ).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# CUSUM offline change-point detection
# ---------------------------------------------------------------------------
@q(
    "ev_cusum_changepoint",
    oracle="""
    WITH mu AS (
        SELECT event_type, round(avg(value), 6) AS mean_r
        FROM events GROUP BY event_type),
    cusum AS (
        SELECT e.event_type, e.ts, e.event_id,
               round(sum(e.value - mu.mean_r) OVER (
                   PARTITION BY e.event_type
                   ORDER BY e.ts, e.event_id), 4) AS s
        FROM events e JOIN mu USING (event_type)),
    ranked AS (
        SELECT event_type, ts, event_id, s, abs(s) AS mag,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY abs(s) DESC, ts, event_id) AS rn
        FROM cusum)
    SELECT event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS change_ts,
           event_id AS change_event_id, s AS cusum_value, mag AS magnitude
    FROM ranked WHERE rn = 1
    """,
    tags=("events", "changepoint", "window"),
)
def ev_cusum_changepoint(spark, sf_dir):
    """Offline CUSUM change-point detection per event type: the
    cumulative sum of deviations from the (rounded) series mean peaks in
    magnitude exactly where the level shifts — the classic two-pass
    formulation (Page's test, batch form). Pass 1 is a per-type mean
    (rounded to 6 so both engines subtract the identical constant);
    pass 2 is one ordered per-type window cumsum, rounded to 4 before
    the argmax rank so cross-engine window-accumulation order (running
    vs segment-tree) cannot flip the winner; ties break on (ts,
    event_id).

    100 TB posture: event_type is a ~5-value key, so BOTH per-type
    passes run coarse-key-safe: the cumsum goes through
    operators/stitched_lag.stitched_prefix_sum (types x days
    parallelism — per-bucket cumsum + lagged running carry, the round-4
    output rounding absorbing the regrouped-addition last bits exactly
    as it absorbs the engines' own running-vs-segment-tree orders), and
    the argmax is a map-side-combinable max_by aggregation rather than
    a full-history rank window. The per-type mean broadcast is a
    fixed-cardinality build (one row per event type). No self-join, no
    collect; the output is one row per series."""
    from river_spark.operators.stitched_lag import stitched_prefix_sum

    ev = events_tbl(spark, sf_dir)
    mu = ev.groupBy("event_type").agg(F.round(F.avg("value"), 6).alias("mean_r"))
    dev = ev.join(F.broadcast(mu), "event_type").select(
        "event_type",
        "ts",
        "event_id",
        (F.col("value") - F.col("mean_r")).alias("dev"),
    )
    cusum = stitched_prefix_sum(
        dev,
        key_cols=["event_type"],
        order_cols=["ts", "event_id"],
        value_col="dev",
        bucket=F.date_trunc("day", F.col("ts")),
        out_col="s_raw",
    ).select("event_type", "ts", "event_id", F.round("s_raw", 4).alias("s"))
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    # argmax |s| with (ts, event_id) ASC tie-break as ONE aggregation:
    # max_by over the ordering tuple (mag, -ts, -event_id)
    win = (
        cusum.withColumn("mag", F.abs("s"))
        .groupBy("event_type")
        .agg(
            F.max_by(
                F.struct("ts", "event_id", "s", "mag"),
                F.struct(
                    F.col("mag"),
                    (-us).alias("nts"),
                    (-F.col("event_id")).alias("nid"),
                ),
            ).alias("w")
        )
    )
    return win.select(
        "event_type",
        F.date_format("w.ts", "yyyy-MM-dd HH:mm:ss").alias("change_ts"),
        F.col("w.event_id").alias("change_event_id"),
        F.col("w.s").alias("cusum_value"),
        F.col("w.mag").alias("magnitude"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization + dedup (crawl pipeline)
# ---------------------------------------------------------------------------
def _url_raw_sql(dialect: str) -> str:
    """Deterministic raw-URL synthesis from doc_id/source: five docs
    share one canonical page, each dressed in different crawl noise —
    scheme/host case, an explicit default port, a trailing slash,
    utm_* tracking params, and shuffled query-param order."""
    if dialect == "spark":
        host = "concat('www.site', cast((doc_id div 5) % 23 as string), '.example.com')"
        return f"""concat(
            CASE WHEN doc_id % 3 = 0 THEN 'HTTP' ELSE 'http' END, '://',
            CASE WHEN doc_id % 3 = 1 THEN upper({host}) ELSE {host} END,
            CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END,
            '/page/', cast(doc_id div 5 as string),
            CASE WHEN doc_id % 5 = 1 THEN '/' ELSE '' END,
            CASE WHEN doc_id % 5 = 2 THEN '?utm_source=feed&v=1'
                 WHEN doc_id % 5 = 3 THEN '?v=1&utm_campaign=x'
                 WHEN doc_id % 5 = 4 THEN '?v=1'
                 ELSE '' END)"""
    host = "('www.site' || CAST((doc_id // 5) % 23 AS VARCHAR) || '.example.com')"
    return f"""(
        CASE WHEN doc_id % 3 = 0 THEN 'HTTP' ELSE 'http' END || '://' ||
        CASE WHEN doc_id % 3 = 1 THEN upper({host}) ELSE {host} END ||
        CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END ||
        '/page/' || CAST(doc_id // 5 AS VARCHAR) ||
        CASE WHEN doc_id % 5 = 1 THEN '/' ELSE '' END ||
        CASE WHEN doc_id % 5 = 2 THEN '?utm_source=feed&v=1'
             WHEN doc_id % 5 = 3 THEN '?v=1&utm_campaign=x'
             WHEN doc_id % 5 = 4 THEN '?v=1'
             ELSE '' END)"""


@q(
    "pipeline_url_canonical_dedup",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id, {_url_raw_sql('duckdb')} AS url FROM documents),
    parts AS (
        SELECT doc_id, url,
               lower(regexp_extract(url, '^[hH][tT][tT][pP]://([^/:?]+)', 1))
                   AS host,
               regexp_replace(regexp_extract(url, '^[a-zA-Z]+://[^/]+([^?]*)', 1),
                              '/$', '') AS path,
               coalesce(regexp_extract(url, '\\?(.*)$', 1), '') AS q
        FROM raw),
    canon AS (
        SELECT doc_id, url,
               'http://' || host || path ||
               CASE WHEN kept = '' THEN '' ELSE '?' || kept END AS canonical
        FROM (
            SELECT *, coalesce(array_to_string(list_sort(list_filter(
                       str_split(q, '&'),
                       x -> NOT starts_with(x, 'utm_') AND x <> '')), '&'), '')
                   AS kept
            FROM parts))
    SELECT canonical,
           CAST(count(*) AS BIGINT) AS n_variants,
           CAST(count(DISTINCT url) AS BIGINT) AS n_distinct_raw,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id
    FROM canon GROUP BY canonical
    """,
    tags=("pipeline", "url", "crawl"),
    bench=True,
)
def pipeline_url_canonical_dedup(spark, sf_dir):
    """Crawl-frontier URL canonicalization — the dedup stage BEFORE
    content dedup in every web-scale pipeline: five raw variants per
    page (scheme/host case, explicit :80, trailing slash, utm_*
    tracking params, shuffled param order) must collapse to ONE
    canonical URL. The pipeline is pure string algebra — lowercase
    host, strip default port, strip trailing slash, drop utm_* params,
    SORT surviving params — each step an in-row regexp/HOF expression,
    and the oracle replays every step bit-for-bit (the same Java-regex/
    RE2 agreement idiom as text_pii_redact). Group-by-canonical then
    yields variant counts and the min-doc_id representative (the
    keep-lowest rule every dedup stage here uses).

    100 TB posture: canonicalization is embarrassingly parallel in-row
    compute (no UDF — regexp + higher-order functions stay in codegen);
    the only shuffle is the final hash agg on the canonical key. At
    frontier scale the same key feeds a bloom/exact seen-set join
    (decontam_bloom_prefilter's shape) instead of a full group-by."""
    raw = tbl(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_url_raw_sql("spark")).alias("url")
    )
    parts = raw.select(
        "doc_id",
        "url",
        F.lower(F.regexp_extract("url", "^[hH][tT][tT][pP]://([^/:?]+)", 1)).alias(
            "host"
        ),
        F.regexp_replace(
            F.regexp_extract("url", "^[a-zA-Z]+://[^/]+([^?]*)", 1), "/$", ""
        ).alias("path"),
        F.regexp_extract("url", r"\?(.*)$", 1).alias("q"),
    )
    canon = parts.withColumn(
        "kept",
        F.array_join(
            F.array_sort(
                F.expr(
                    "filter(split(q, '&'), x -> NOT startswith(x, 'utm_') AND x <> '')"
                )
            ),
            "&",
        ),
    ).select(
        "doc_id",
        "url",
        F.concat(
            F.lit("http://"),
            F.col("host"),
            F.col("path"),
            F.when(F.col("kept") == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), F.col("kept"))
            ),
        ).alias("canonical"),
    )
    return canon.groupBy("canonical").agg(
        F.count("*").alias("n_variants"),
        F.countDistinct("url").alias("n_distinct_raw"),
        F.min("doc_id").alias("keep_doc_id"),
    )


# ---------------------------------------------------------------------------
# SQL-defined UDFs (Spark 4.0 CREATE FUNCTION ... RETURN)
# ---------------------------------------------------------------------------
@q(
    "scalar_sql_udf",
    oracle="""
    SELECT CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'medium'
                ELSE 'large' END AS qty_band,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS disc_cents,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY 1
    """,
    tags=("scalar", "sqludf", "spark4"),
)
def scalar_sql_udf(spark, sf_dir):
    """SQL-defined UDFs — Spark 4.0's `CREATE FUNCTION ... RETURNS ...
    RETURN <expr>` (SQL-language functions, SPARK-46058): business logic
    (`qty_band`, `disc_cents`) is declared ONCE as named catalog
    functions and reused across queries, and Catalyst INLINES the bodies
    at plan time — the physical plan is identical to hand-written
    expressions (asserted: no BatchEvalPython, plain hash aggregate),
    unlike Python UDFs which serialize rows out of the JVM. The oracle
    runs the inlined form, proving the function indirection changes
    nothing bit-level: per-band discounted cents are exact integer sums
    (double multiply is identical IEEE arithmetic per row in both
    engines, rounded to cents before summing).

    100 TB posture: SQL UDFs are the governance answer to shared
    metric definitions at scale — one vetted definition, zero runtime
    cost (inlined into codegen), no Python worker fleet. This is the
    semantic layer pattern dbt/LookML compile to."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION qty_band(q DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN q < 10 THEN 'small' "
        "WHEN q < 30 THEN 'medium' ELSE 'large' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_cents(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN cast(round(p * (1 - d) * 100) as bigint)"
    )
    li = tbl(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_sql_udf_lineitem")
    return spark.sql(
        """
        SELECT qty_band(l_quantity) AS qty_band,
               sum(disc_cents(l_extendedprice, l_discount)) AS disc_cents,
               count(*) AS n
        FROM _sql_udf_lineitem
        GROUP BY 1
        """
    )


# ---------------------------------------------------------------------------
# Benford's-law digit audit
# ---------------------------------------------------------------------------
@q(
    "agg_benford_digits",
    oracle="""
    WITH cents AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
        WHERE o_totalprice > 0),
    digits AS (
        SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS d,
               count(*) AS obs,
               sum(count(*)) OVER () AS n
        FROM cents GROUP BY 1)
    SELECT d, CAST(obs AS BIGINT) AS observed,
           round(n * log10(1.0 + 1.0 / d), 4) AS expected,
           round(pow(obs - n * log10(1.0 + 1.0 / d), 2)
                 / (n * log10(1.0 + 1.0 / d)), 6) AS chi2_term
    FROM digits
    """,
    tags=("analytics", "benford", "audit"),
)
def agg_benford_digits(spark, sf_dir):
    """Benford's-law leading-digit audit over order totals — the
    classic forensic-accounting screen (fabricated numbers flunk the
    log distribution). The leading digit is taken from the INTEGER cents
    string (never from float log10 of the value, whose boundary cases
    like 100.0 -> 1.9999... flip digits between engines), so the digit
    histogram is bit-exact; expected counts and per-digit chi-square
    terms are closed-form functions of the integer counts, rounded
    in-query.

    100 TB posture: one hash aggregation to a 9-row histogram (the
    window for n runs over 9 rows); the audit cost is one scan no
    matter the ledger size — the same sufficient-statistics shape as
    ab_welch_ttest."""
    cents = (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
    )
    digits = (
        cents.select(F.substring(F.col("c").cast("string"), 1, 1).cast("long").alias("d"))
        .groupBy("d")
        .agg(F.count("*").alias("obs"))
        .withColumn("n", F.sum("obs").over(Window.partitionBy()))
    )
    exp = F.col("n") * F.log10(1.0 + 1.0 / F.col("d"))
    return digits.select(
        "d",
        F.col("obs").alias("observed"),
        F.round(exp, 4).alias("expected"),
        F.round(F.pow(F.col("obs") - exp, 2) / exp, 6).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# SQL pipe syntax (Spark 4.0)
# ---------------------------------------------------------------------------
@q(
    "scalar_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("scalar", "pipesql", "spark4"),
)
def scalar_pipe_syntax(spark, sf_dir):
    """SQL pipe syntax — Spark 4.0's `|>` operator chains (SPARK-49555,
    the GoogleSQL pipe-query model): the same pricing rollup written as
    a linear FROM -> WHERE -> AGGREGATE flow instead of inside-out
    SELECT nesting. The parser desugars pipes to the identical logical
    plan, so the oracle is the standard-SQL form and the gate proves
    the two surfaces are one engine — exact integer measures, zero
    plan difference.

    100 TB posture: purely syntactic — same Catalyst plan, same single
    agg shuffle as q1. Matters operationally because pipe queries
    compose top-down like DataFrame chains, which is how 100-stage ETL
    SQL stays reviewable."""
    li = tbl(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_pipe_lineitem")
    return spark.sql(
        """
        FROM _pipe_lineitem
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |> EXTEND cast(round(l_quantity) as bigint) AS qty
        |> AGGREGATE sum(qty) AS sum_qty, count(*) AS n
           GROUP BY l_returnflag, l_linestatus
        """
    )


# ---------------------------------------------------------------------------
# Seasonal decomposition (classical additive)
# ---------------------------------------------------------------------------
@q(
    "ev_seasonal_decompose",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1),
    trended AS (
        SELECT h, y,
               round(avg(CAST(y AS DOUBLE)) OVER (
                   ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING), 6)
                   AS trend
        FROM hourly),
    seasonal AS (
        SELECT *, round(avg(y - trend) OVER (
                   PARTITION BY extract(hour FROM h)), 6) AS seas
        FROM trended)
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket_hour, y,
           trend, seas AS seasonal,
           round(y - trend - seas, 6) AS remainder
    FROM seasonal
    """,
    tags=("events", "timeseries", "decompose"),
)
def ev_seasonal_decompose(spark, sf_dir):
    """Classical additive seasonal decomposition of the hourly event
    volume (the moving-average method behind statsmodels'
    seasonal_decompose): trend = centered 25-hour moving average,
    seasonal = mean detrended residual per hour-of-day, remainder =
    what neither explains. Trend and seasonal are rounded to 6 before
    the remainder subtraction, so the remainder is an exact function of
    gate-identical inputs on both engines.

    100 TB posture: the only data-sized stage is the per-hour count
    (one hash agg); every window then runs over the SERIES — bounded
    by the calendar (24 x days rows), not by event volume — the same
    series-not-stream discipline as ev_cohort_retention and
    agg_weighted_median's histogram. The single-partition ordered
    window is over that bounded series; production shards by
    (series_id) across thousands of metrics, giving each task one
    series."""
    hourly = (
        events_tbl(spark, sf_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("y"))
    )
    w_trend = Window.orderBy("h").rowsBetween(-12, 12)
    trended = hourly.select(
        "h",
        "y",
        F.round(F.avg(F.col("y").cast("double")).over(w_trend), 6).alias("trend"),
    )
    seasonal = trended.withColumn(
        "seas",
        F.round(
            F.avg(F.col("y") - F.col("trend")).over(
                Window.partitionBy(F.hour("h"))
            ),
            6,
        ),
    )
    return seasonal.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("bucket_hour"),
        "y",
        "trend",
        F.col("seas").alias("seasonal"),
        F.round(F.col("y") - F.col("trend") - F.col("seas"), 6).alias("remainder"),
    )


# ---------------------------------------------------------------------------
# Gini coefficient of customer spend
# ---------------------------------------------------------------------------
@q(
    "agg_gini_spend",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY o_custkey),
    ranked AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents, o_custkey) AS i,
               count(*) OVER () AS n,
               sum(cents) OVER () AS total
        FROM spend)
    SELECT CAST(min(n) AS BIGINT) AS n_customers,
           CAST(min(total) AS BIGINT) AS total_cents,
           CAST(CAST(2 * sum(i * cents) - (min(n) + 1) * min(total) AS BIGINT)
                AS DOUBLE)
               / CAST(CAST(min(n) * min(total) AS BIGINT) AS DOUBLE) AS gini
    FROM ranked
    """,
    tags=("analytics", "gini", "inequality"),
)
def agg_gini_spend(spark, sf_dir):
    """Gini coefficient of customer lifetime spend — the standard
    concentration measure (revenue inequality, whale detection) via the
    rank formula G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over
    spend sorted ascending with a custkey tiebreak. Numerator and
    denominator are computed ENTIRELY in integers (cents, ranks) and
    divided once — found the hard way: mixing the big integer sums into
    double arithmetic early diverged by one ulp at sf0.1 because
    DuckDB's HUGEINT->double conversion and the JVM's long->double
    round differently on >2^53 intermediates; a single cast of the
    identical BIGINT on both sides is bit-identical, so the gate needs
    no rounding at all.

    100 TB posture: the data-sized stage is the per-customer hash agg;
    the rank window runs over the customer DIMENSION (the
    pipeline_rfm_segments discipline), and at extreme customer counts
    the same statistic is computable from an approx-quantile Lorenz
    grid instead of exact ranks."""
    spend = (
        tbl(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    ranked = spend.select(
        "cents",
        F.row_number().over(Window.orderBy("cents", "o_custkey")).alias("i"),
        F.count("*").over(Window.partitionBy()).alias("n"),
        F.sum("cents").over(Window.partitionBy()).alias("total"),
    )
    return ranked.agg(
        F.min("n").cast("long").alias("n_customers"),
        F.min("total").cast("long").alias("total_cents"),
        (
            (
                2 * F.sum(F.col("i").cast("long") * F.col("cents"))
                - (F.min("n") + 1) * F.min("total")
            ).cast("double")
            / (F.min("n") * F.min("total")).cast("double")
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# PMI token co-occurrence
# ---------------------------------------------------------------------------
_PMI_MIN_DF = 50  # frequent-token floor before pair expansion


@q(
    "text_pmi_cooccurrence",
    oracle=f"""
    WITH dt AS (
        SELECT DISTINCT doc_id,
               lower(unnest(regexp_split_to_array(trim(text), '\\s+'))) AS tok
        FROM documents),
    freq AS (
        SELECT tok, count(*) AS df FROM dt GROUP BY tok
        HAVING count(*) >= {_PMI_MIN_DF}),
    fdt AS (SELECT dt.doc_id, dt.tok FROM dt JOIN freq USING (tok)),
    n AS (SELECT count(DISTINCT doc_id) AS docs FROM dt),
    pairs AS (
        SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_ab
        FROM fdt a JOIN fdt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY 1, 2),
    scored AS (
        SELECT p.tok_a, p.tok_b,
               CAST(p.n_ab AS BIGINT) AS n_ab,
               CAST(fa.df AS BIGINT) AS n_a,
               CAST(fb.df AS BIGINT) AS n_b,
               round(ln(p.n_ab * 1.0 * (SELECT docs FROM n)
                        / (fa.df * 1.0 * fb.df)), 6) AS pmi
        FROM pairs p
        JOIN freq fa ON fa.tok = p.tok_a
        JOIN freq fb ON fb.tok = p.tok_b)
    SELECT * FROM scored ORDER BY pmi DESC, tok_a, tok_b LIMIT 30
    """,
    tags=("text", "pmi", "cooccurrence"),
)
def text_pmi_cooccurrence(spark, sf_dir):
    """Pointwise mutual information over token co-occurrence — the
    collocation / phrase-mining statistic (which word pairs appear
    together more than chance): PMI = ln(P(a,b) / P(a)P(b)) from
    distinct (doc, token) incidence. The a-priori discipline from
    mb_copurchase_pairs caps the quadratic stage: only tokens with
    df >= {_PMI_MIN_DF} enter pair expansion, so per-doc fan-out is
    bounded by the FREQUENT vocabulary, not document length. Counts are
    integers; the single ln of an integer ratio is rounded to 6 (libm
    vs JVM last-bit differences sit ~1e-16).

    100 TB posture: the pair self-join co-partitions on doc_id (one
    shuffle each side), the frequent-vocab table broadcasts, and the
    top-30 is TakeOrderedAndProject over the vocabulary-bounded pair
    table."""
    dt = (
        tbl(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("t0"))
        .select("doc_id", F.lower("t0").alias("tok"))
        .distinct()
    )
    freq = dt.groupBy("tok").agg(F.count("*").alias("df")).filter(
        F.col("df") >= _PMI_MIN_DF
    )
    fdt = dt.join(F.broadcast(freq.select("tok")), "tok")
    n_docs = dt.select("doc_id").distinct().count()
    a = fdt.select(F.col("doc_id"), F.col("tok").alias("tok_a"))
    b = fdt.select(F.col("doc_id"), F.col("tok").alias("tok_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("n_ab"))
    )
    fa = freq.select(F.col("tok").alias("tok_a"), F.col("df").alias("n_a"))
    fb = freq.select(F.col("tok").alias("tok_b"), F.col("df").alias("n_b"))
    scored = (
        pairs.join(F.broadcast(fa), "tok_a")
        .join(F.broadcast(fb), "tok_b")
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                F.log(F.col("n_ab") * float(n_docs) / (F.col("n_a") * 1.0 * F.col("n_b"))),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "tok_a", "tok_b").limit(30)
