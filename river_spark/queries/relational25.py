"""Relational wave 25 (round 9): categorical effect size and quota
sampling.

Bit-exactness rules (tests/test_oracle.py): Cramer's V is O(1) so its
ln-free but order-dependent chi-square sum takes round-6; the quota
sampler ranks on the md5-hex of the id (the cookbook's deterministic
hash-order idiom) and all outputs are exact integers.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import tbl


@q(
    "agg_cramers_v",
    oracle="""
    WITH ev AS (
        SELECT event_type, user_id % 4 AS quadrant
        FROM (SELECT event_type, user_id FROM events) e),
    o AS (
        SELECT event_type, quadrant, count(*) AS observed FROM ev GROUP BY 1, 2),
    t AS (
        SELECT event_type, quadrant, observed,
               sum(observed) OVER (PARTITION BY event_type) AS row_tot,
               sum(observed) OVER (PARTITION BY quadrant) AS col_tot,
               sum(observed) OVER () AS n
        FROM o),
    chi AS (
        SELECT max(n) AS n,
               count(DISTINCT event_type) AS r,
               count(DISTINCT quadrant) AS c,
               sum((observed - CAST(row_tot * col_tot AS DOUBLE) / n)
                   * (observed - CAST(row_tot * col_tot AS DOUBLE) / n)
                   / (CAST(row_tot * col_tot AS DOUBLE) / n)) AS chi2
        FROM t)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(r AS BIGINT) AS n_rows_dim,
           CAST(c AS BIGINT) AS n_cols_dim,
           round(sqrt(chi2 / (n * least(r - 1, c - 1))), 6) AS cramers_v
    FROM chi
    """,
    tags=("agg", "stats", "effect_size"),
)
def agg_cramers_v(spark, sf_dir):
    """Cramer's V — the normalized effect size for the event_type x
    user-quadrant contingency (agg_chi2_cells emits the cells; this
    emits the single number a dashboard thresholds: 0 = independent,
    1 = fully determined). The chi-square sum over 20 cells is
    summation-order dependent, but V is O(1), so round-6 absorbs the
    ~1e-16 relative drift (the same argument as skewness).

    100 TB posture: one fact hash agg to 20 cells; everything after is
    arithmetic over those 20 rows."""
    ev = tbl(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 4).alias("quadrant")
    )
    o = ev.groupBy("event_type", "quadrant").agg(F.count("*").alias("observed"))
    t = o.select(
        "event_type",
        "quadrant",
        "observed",
        F.sum("observed").over(Window.partitionBy("event_type")).alias("row_tot"),
        F.sum("observed").over(Window.partitionBy("quadrant")).alias("col_tot"),
        F.sum("observed").over(Window.partitionBy()).alias("n"),
    )
    e = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col("n")
    chi = t.agg(
        F.max("n").alias("n"),
        F.countDistinct("event_type").alias("r"),
        F.countDistinct("quadrant").alias("c"),
        F.sum((F.col("observed") - e) * (F.col("observed") - e) / e).alias("chi2"),
    )
    return chi.select(
        F.col("n").alias("n"),
        F.col("r").alias("n_rows_dim"),
        F.col("c").alias("n_cols_dim"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


_QUOTA_PER_LANG = 15


@q(
    "pipeline_quota_sampler",
    oracle=f"""
    WITH r AS (
        SELECT lang, n_chars,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(count(*) FILTER (rn <= {_QUOTA_PER_LANG}) AS BIGINT) AS n_selected,
           CAST(coalesce(sum(n_chars) FILTER (rn <= {_QUOTA_PER_LANG}), 0) AS BIGINT)
             AS selected_chars
    FROM r GROUP BY lang
    """,
    tags=("pipeline", "sampling", "quota"),
)
def pipeline_quota_sampler(spark, sf_dir):
    """Per-language quota sampling: a fixed per-lang document quota
    filled by deterministic hash order (md5 of the id — the cookbook's
    cross-engine uniform order), the exact mechanics of capping an
    over-represented language in a training mix while staying fully
    reproducible across runs and engines. Exact integer counts.

    100 TB posture: one window partitioned by lang (the quota unit),
    one rollup sharing the key — a single shuffle; the hash order
    means no secondary sort column needs to exist in the data."""
    r = tbl(spark, sf_dir, "documents").select(
        "lang",
        "n_chars",
        F.row_number()
        .over(
            Window.partitionBy("lang").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        )
        .alias("rn"),
    )
    sel = F.col("rn") <= _QUOTA_PER_LANG
    return r.groupBy("lang").agg(
        F.count("*").alias("n_candidates"),
        F.count(F.when(sel, 1)).alias("n_selected"),
        F.coalesce(F.sum(F.when(sel, F.col("n_chars"))), F.lit(0)).alias(
            "selected_chars"
        ),
    )
