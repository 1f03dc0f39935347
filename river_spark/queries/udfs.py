"""UDF/UDAF/UDTF queries — each runs Python-boundary code on the Spark
side and must byte-match a pure-SQL DuckDB oracle, proving the Arrow
exchange is semantics-preserving."""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.functions import normalize_text_udf, tokenize_udtf, weighted_avg_udaf
from river_spark.queries.relational import q
from river_spark.queries.tables import tbl


@q(
    "udf_normalize_text",
    oracle="""
    SELECT doc_id, trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
    FROM documents
    """,
    tags=("udf", "pandas_udf"),
)
def udf_normalize_text(spark, sf_dir):
    return tbl(spark, sf_dir, "documents").select(
        "doc_id", normalize_text_udf()("text").alias("norm")
    )


@q(
    "udaf_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS w_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("udf", "grouped_agg"),
)
def udaf_weighted_avg(spark, sf_dir):
    return (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(weighted_avg_udaf()("l_extendedprice", "l_quantity"), 4).alias("w_avg_price"))
    )


@q(
    "udtf_tokenize",
    oracle="""
    SELECT doc_id, i - 1 AS pos, t[i] AS token
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
          FROM documents WHERE doc_id < 20) s,
         UNNEST(generate_series(1, len(t))) AS g(i)
    """,
    tags=("udf", "udtf"),
)
def udtf_tokenize(spark, sf_dir):
    spark.udtf.register("rs_tokenize", tokenize_udtf())
    tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 20).createOrReplaceTempView("docs_tok")
    return spark.sql(
        # BIGINT pos: the oracle's generate_series arithmetic is BIGINT
        "SELECT doc_id, CAST(t.pos AS BIGINT) AS pos, t.token "
        "FROM docs_tok, LATERAL rs_tokenize(trim(text)) t"
    )


@q(
    "udf_cogroup_clickstream",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    c AS (
        SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click'),
    j AS (
        SELECT p.event_id, p.user_id, c.ts AS cts, c.event_id AS cid, c.value AS cv
        FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts < p.ts),
    agg AS (
        SELECT event_id, user_id, count(cid) AS n_prior_clicks
        FROM j GROUP BY 1, 2),
    lastc AS (
        SELECT event_id, cv FROM (
            SELECT event_id, cv,
                   row_number() OVER (PARTITION BY event_id
                                      ORDER BY cts DESC, cid DESC) AS rn
            FROM j WHERE cid IS NOT NULL) WHERE rn = 1)
    SELECT agg.event_id, agg.user_id, agg.n_prior_clicks,
           lastc.cv AS last_click_value
    FROM agg LEFT JOIN lastc USING (event_id)
    """,
    tags=("udf", "cogroup"),
)
def udf_cogroup_clickstream(spark, sf_dir):
    """Cogrouped applyInPandas (the fourth and last Python-boundary
    flavor alongside scalar pandas_udf / grouped-agg / UDTF): purchases
    and clicks cogrouped per user, merged vectorized in Arrow batches.
    The oracle recomputes the merge relationally (inequality join +
    count + argmax-by-window) — the Python boundary must byte-match it.
    Both sides shuffle ONCE on user_id; at 100 TB the pandas merge sees
    one user's events at a time, never the corpus."""
    from river_spark.functions import clickstream_cogroup_fn
    from river_spark.queries.tables import events_tbl, spread_scan

    # spread_scan both cogroup sides (r15): the cogroup exchange moves only
    # a few MB at bench SFs, so AQE's bytes-based coalescing packs ~15k
    # per-user groups onto 1-2 tasks — and FlatMapCoGroupsInPandas pays its
    # per-GROUP Python invocation cost serially there (measured 5.9 s with
    # 31 cores idle). Hash-repartitioning each side by user_id with an
    # explicit count satisfies the cogroup's required clustering, so it
    # REPLACES the ENSURE_REQUIREMENTS exchange (same shuffle count) while
    # opting out of AQE coalescing; at real scale the scans already read as
    # >= defaultParallelism partitions and spread_scan is a plan no-op.
    ev = events_tbl(spark, sf_dir)
    p = spread_scan(
        ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts"),
        "user_id",
    )
    # fresh=True: the clicks side must NOT share the purchases side's scan
    # attribute IDs. FlatMapCoGroupsInPandas with duplicate IDs across its
    # two children breaks Catalyst column pruning under count()-pruned
    # actions: the right side's pandas frame arrives missing every column
    # whose ID also binds on the left (only user_id+value survive here) and
    # the merge crashes with KeyError 'ts'. Collect-style actions (the
    # oracle harness) don't prune, which is why this only bites count()
    # consumers. A fresh read plan gives the side its own IDs; one extra
    # footer read at build time, same data, same scan pushdown.
    c = spread_scan(
        events_tbl(spark, sf_dir, fresh=True)
        .filter(F.col("event_type") == "click")
        .select("user_id", "ts", "event_id", "value"),
        "user_id",
    )
    return (
        p.groupBy("user_id")
        .cogroup(c.groupBy("user_id"))
        .applyInPandas(
            clickstream_cogroup_fn(),
            "event_id long, user_id long, n_prior_clicks long, last_click_value double",
        )
    )


@q(
    "udf_arrow_stats",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(length(text) AS BIGINT)               AS n_chars,
           CAST(length(text) - length(replace(text, 'a', '')) AS BIGINT) AS n_a
    FROM documents
    """,
    tags=("udf", "arrow"),
)
def udf_arrow_stats(spark, sf_dir):
    """mapInArrow — the fifth Python-boundary flavor (zero-copy Arrow
    RecordBatches, below even mapInPandas): per-doc byte/char/substring
    statistics from pyarrow compute kernels, byte-matched against pure
    SQL. Partition-preserving map, no shuffle, no pandas conversion."""
    from pyspark.sql import types as T

    from river_spark.functions import payload_stats_arrow_fn

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("n_a", T.LongType()),
        ]
    )
    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(payload_stats_arrow_fn(), out_schema)
