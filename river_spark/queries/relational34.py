"""Relational wave 34 (round 11): coverage estimation and weighted link
prediction — two more daily-production shapes:

- ``agg_capture_recapture``: the Chapman (bias-corrected Lincoln-
  Petersen) estimator of corpus size per source from two overlapping
  hash-sampled "crawl snapshots" — the standard answer to "how much of
  the web/source are we actually covering?" when the full population
  is unobservable. N-hat = (n1+1)(n2+1)/(m+1) - 1 from three exact
  integer counts; the fixture keeps the true N alongside as a
  validation column (production doesn't have it — that's the point).
- ``graph_adamic_adar``: the weighted sibling of
  ``graph_common_neighbors`` — common neighbors weighted by
  1/ln(degree), so a hub shared by everyone contributes almost
  nothing while a rare shared neighbor dominates. Per-center weights
  are quantized to INTEGER MICRO-UNITS before the pair aggregation
  (round(1e6/ln(d))), so the per-pair sum is an exact BIGINT — the
  score sum is order-independent across engines AND the top-k ranking
  never compares floats (score_x1e6 desc, a, b).

Reference parity: the reference engine (pbotros/river) has no
relational layer (its surface is the stream transport,
/root/reference/cpp/src/writer.cpp); these extend the analytics
surface the brief requires.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import tbl
from river_spark.queries.relational15 import _LP_MIN_SUP, _LP_TOPK

_CAP_A_SQL = "(('0x' || substr(md5('capA~' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10) < 4"
_CAP_B_SQL = "(('0x' || substr(md5('capB~' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10) < 5"
_CAP_A_SPARK = (
    "pmod(cast(conv(substring(md5(concat('capA~', cast(doc_id as string))), "
    "1, 8), 16, 10) as bigint), 10) < 4"
)
_CAP_B_SPARK = (
    "pmod(cast(conv(substring(md5(concat('capB~', cast(doc_id as string))), "
    "1, 8), 16, 10) as bigint), 10) < 5"
)


# ---------------------------------------------------------------------------
# Chapman capture-recapture corpus-size estimate
# ---------------------------------------------------------------------------
@q(
    "agg_capture_recapture",
    oracle=f"""
    WITH marked AS (
        SELECT source,
               CASE WHEN {_CAP_A_SQL} THEN 1 ELSE 0 END AS in_a,
               CASE WHEN {_CAP_B_SQL} THEN 1 ELSE 0 END AS in_b
        FROM documents)
    SELECT source,
           CAST(sum(in_a) AS BIGINT) AS n1,
           CAST(sum(in_b) AS BIGINT) AS n2,
           CAST(sum(in_a * in_b) AS BIGINT) AS m,
           CAST(count(*) AS BIGINT) AS true_n,
           (CAST(sum(in_a) AS BIGINT) + 1)
             * (CAST(sum(in_b) AS BIGINT) + 1) * 1.0
             / (CAST(sum(in_a * in_b) AS BIGINT) + 1) - 1.0 AS chapman_est
    FROM marked GROUP BY source
    """,
    tags=("agg", "stats", "sampling", "coverage"),
)
def agg_capture_recapture(spark, sf_dir):
    """Chapman capture-recapture per source: two independent
    deterministic hash samples of the corpus (40% and 50% md5 slices)
    play the two "capture" snapshots; the overlap m estimates the
    unseen mass, N-hat = (n1+1)(n2+1)/(m+1) - 1. The (m+1) correction
    makes the estimator unbiased-ish AND removes the zero-overlap
    division entirely — no guard needed, by construction. true_n rides
    along as the validation column the production use case (crawl
    coverage, dedup-corpus size across shards that can't be counted
    exactly) never has.

    100 TB posture: one scan, one hash agg on source — the two
    "snapshots" are predicate flags, never materialized samples; the
    estimate is a single raw IEEE expression over three exact BIGINTs."""
    marked = tbl(spark, sf_dir, "documents").select(
        "source",
        F.when(F.expr(_CAP_A_SPARK), 1).otherwise(0).alias("in_a"),
        F.when(F.expr(_CAP_B_SPARK), 1).otherwise(0).alias("in_b"),
    )
    c = marked.groupBy("source").agg(
        F.sum("in_a").cast("bigint").alias("n1"),
        F.sum("in_b").cast("bigint").alias("n2"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("m"),
        F.count("*").alias("true_n"),
    )
    return c.select(
        "source",
        "n1",
        "n2",
        "m",
        "true_n",
        (
            (F.col("n1") + 1) * (F.col("n2") + 1) * F.lit(1.0) / (F.col("m") + 1)
            - F.lit(1.0)
        ).alias("chapman_est"),
    )


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction (integer micro-unit weights)
# ---------------------------------------------------------------------------
@q(
    "graph_adamic_adar",
    oracle=f"""
    WITH ob AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
        SELECT a.p AS pa, b.p AS pb
        FROM ob a JOIN ob b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p HAVING count(*) >= {_LP_MIN_SUP}
    ), und AS (
        SELECT pa AS u, pb AS v FROM e
        UNION ALL SELECT pb AS u, pa AS v FROM e
    ), deg AS (
        SELECT u, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u
    ), wedge AS (
        SELECT x.v AS a, y.v AS b,
               CAST(count(*) AS BIGINT) AS common,
               CAST(sum(CAST(round(1000000.0 / ln(deg.d)) AS BIGINT))
                   AS BIGINT) AS score_x1e6
        FROM und x
        JOIN und y ON x.u = y.u AND x.v < y.v
        JOIN deg ON deg.u = x.u
        GROUP BY x.v, y.v
    ), nonadj AS (
        SELECT w.a, w.b, w.common, w.score_x1e6 FROM wedge w
        WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = w.a AND e.pb = w.b)
    )
    SELECT a, b, common, score_x1e6,
           CAST(score_x1e6 AS DOUBLE) / 1000000.0 AS aa_score
    FROM nonadj
    ORDER BY score_x1e6 DESC, a, b LIMIT {_LP_TOPK}
    """,
    tags=("graph", "link_prediction"),
)
def graph_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction over the part co-purchase graph:
    common neighbors weighted by 1/ln(degree) — the hub-discounting
    refinement of graph_common_neighbors (a center everyone shares is
    weak evidence; a rare shared center is strong). Per-center weights
    quantize to integer micro-units BEFORE the pair aggregation, so
    the per-pair score is an exact BIGINT sum: order-independent
    across engines, and the top-k ranks on (score_x1e6 desc, a, b)
    without ever comparing floats. A wedge center always has degree
    >= 2 (it needs two neighbors to form a wedge), so ln(d) >= ln 2 —
    the division needs no guard by construction.

    100 TB posture: same wedge equi-join as the rest of the graph
    family (degree-histogram pre-flight bounds the fan-out); the
    degree join rides the wedge's center key, the anti-join removes
    existing edges, and top-k is TakeOrderedAndProject."""
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ob = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = ob.alias("a"), ob.alias("b")
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= _LP_MIN_SUP)
        .select("pa", "pb")
    )
    und = e.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionByName(
        e.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    w_micro = F.round(F.lit(1000000.0) / F.log(F.col("d").cast("double"))).cast(
        "bigint"
    )
    x, y, dd = und.alias("x"), und.alias("y"), deg.alias("deg")
    wedge = (
        x.join(y, (F.col("x.u") == F.col("y.u")) & (F.col("x.v") < F.col("y.v")))
        .join(dd, F.col("deg.u") == F.col("x.u"))
        .groupBy(F.col("x.v").alias("a"), F.col("y.v").alias("b"))
        .agg(
            F.count("*").alias("common"),
            F.sum(w_micro).alias("score_x1e6"),
        )
    )
    nonadj = wedge.join(e, (wedge.a == e.pa) & (wedge.b == e.pb), "left_anti")
    return (
        nonadj.select(
            "a",
            "b",
            "common",
            "score_x1e6",
            (F.col("score_x1e6").cast("double") / 1000000.0).alias("aa_score"),
        )
        .orderBy(F.col("score_x1e6").desc(), "a", "b")
        .limit(_LP_TOPK)
    )
