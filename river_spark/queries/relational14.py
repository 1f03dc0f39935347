"""Relational wave 14 (round 8, session 4): funnel latency
distributions and the dataset-card rollup.

- ``ev_funnel_latency``: per-step conversion latency distribution
  (p50/p90/max seconds) for the view->click->purchase funnel — the
  "how long does each step take" companion to ev_funnel's "who
  converted".
- ``pipeline_dataset_card``: the per-(source, language) dataset-card
  table — doc counts, char mass, exact length quantiles, and corpus
  share — the summary block of a dataset datasheet.

Bit-exactness rules follow tests/test_oracle.py: latencies are exact
integer microsecond differences divided down to whole seconds;
quantiles are percentile_disc (an actual stored value, never an
interpolation); shares are single divisions of exact integers.

Reference parity: the reference engine (pbotros/river) has no
relational layer (its surface is the stream transport,
/root/reference/cpp/src/writer.cpp); these extend the analytics surface
the brief requires.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import event_ts, tbl


# ---------------------------------------------------------------------------
# Funnel step latency distribution
# ---------------------------------------------------------------------------
@q(
    "ev_funnel_latency",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t FROM events
        WHERE event_type = 'view' GROUP BY user_id),
    c AS (
        SELECT e.user_id, min(e.ts) AS t FROM events e
        JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t GROUP BY e.user_id),
    p AS (
        SELECT e.user_id, min(e.ts) AS t FROM events e
        JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY e.user_id),
    lat AS (
        SELECT 'view_to_click' AS step,
               date_diff('microsecond', v.t, c.t) // 1000000 AS lat_s
        FROM v JOIN c ON v.user_id = c.user_id
        UNION ALL
        SELECT 'click_to_purchase' AS step,
               date_diff('microsecond', c.t, p.t) // 1000000 AS lat_s
        FROM c JOIN p ON c.user_id = p.user_id)
    SELECT step,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(quantile_disc(lat_s, 0.5) AS BIGINT) AS p50_s,
           CAST(quantile_disc(lat_s, 0.9) AS BIGINT) AS p90_s,
           CAST(max(lat_s) AS BIGINT) AS max_s
    FROM lat GROUP BY step
    """,
    tags=("events", "funnel", "latency"),
)
def ev_funnel_latency(spark, sf_dir):
    """Latency distribution of each funnel step — p50/p90/max seconds
    from first view to first subsequent click, and from that click to
    first subsequent purchase. ev_funnel answers WHO converted; this
    answers HOW LONG each step took, the number a growth team actually
    watches. Latencies are exact integer microsecond differences
    floored to whole seconds (timestampdiff/date_diff semantics agree
    at microsecond grain — second-grain boundary counting would not),
    and the quantiles are percentile_disc: an actual stored latency,
    bit-comparable across engines, never an interpolated float.

    100 TB posture: the three per-user min-reductions share the user
    partitioning (one shuffle each, map-side combinable); the latency
    table is |converting users| rows; the final agg is a 2-group
    reduce. percentile_disc over a group needs that group sorted — at
    extreme cardinality you'd swap in the value-histogram shape
    agg_weighted_median uses; latencies-per-step is far below that
    bar."""
    ev = tbl(spark, sf_dir, "events")
    ts = event_ts(ev)
    base = ev.select("user_id", "event_type", ts.alias("t"))
    v = base.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("t").alias("t_v")
    )
    c = (
        base.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("t") > F.col("t_v"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_c"), F.min("t_v").alias("t_v"))
    )
    p = (
        base.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "t_c"), "user_id")
        .filter(F.col("t") > F.col("t_c"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_p"))
    )
    lat_vc = c.select(
        F.lit("view_to_click").alias("step"),
        F.expr("timestampdiff(MICROSECOND, t_v, t_c) div 1000000").alias("lat_s"),
    )
    lat_cp = (
        c.select("user_id", "t_c")
        .join(p, "user_id")
        .select(
            F.lit("click_to_purchase").alias("step"),
            F.expr("timestampdiff(MICROSECOND, t_c, t_p) div 1000000").alias("lat_s"),
        )
    )
    return (
        lat_vc.unionByName(lat_cp)
        .groupBy("step")
        .agg(
            F.count("*").alias("n_users"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lat_s)")
            .cast("bigint")
            .alias("p50_s"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY lat_s)")
            .cast("bigint")
            .alias("p90_s"),
            F.max("lat_s").alias("max_s"),
        )
    )


# ---------------------------------------------------------------------------
# Dataset card
# ---------------------------------------------------------------------------
@q(
    "pipeline_dataset_card",
    oracle="""
    WITH g AS (
        SELECT source, lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50_chars,
               CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90_chars
        FROM documents GROUP BY source, lang)
    SELECT source, lang, n_docs, total_chars, p50_chars, p90_chars,
           total_chars * 1.0 / sum(total_chars) OVER () AS char_share
    FROM g
    """,
    tags=("pipeline", "datacard", "profiling"),
)
def pipeline_dataset_card(spark, sf_dir):
    """The dataset-card summary block (the quantitative half of a
    datasheet-for-datasets): one row per (source, language) with doc
    count, character mass, exact length quantiles, and the cell's
    share of total corpus characters. profile_lineitem profiles
    COLUMNS; this profiles the CORPUS COMPOSITION — the table a
    training run's data statement quotes.

    100 TB posture: one hash agg over the corpus builds the grid
    (percentile_disc is per-(source, lang) group — swap in the
    value-histogram shape if a single cell's membership outgrows a
    task); the share window runs over the tens-of-rows grid. Shares
    are single divisions of exact integer sums — bit-identical,
    ungated by rounding."""
    g = (
        tbl(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)")
            .cast("bigint")
            .alias("p50_chars"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars)")
            .cast("bigint")
            .alias("p90_chars"),
        )
    )
    return g.select(
        "source",
        "lang",
        "n_docs",
        "total_chars",
        "p50_chars",
        "p90_chars",
        (F.col("total_chars") * 1.0 / F.sum("total_chars").over(Window.partitionBy()))
        .alias("char_share"),
    )
