"""Relational wave 32 (round 11): variance-reduced experimentation and
incremental-crawl deduplication — two shapes production systems run
daily that the registry lacked:

- ``ab_cuped_adjusted``: CUPED (Controlled-experiment Using Pre-Existing
  Data) — the industry-standard variance-reduction for A/B readouts.
  The pre-period covariate X (each user's total spend before the
  cutoff) explains part of the post-period metric Y's variance;
  regressing it out (theta = cov(X,Y)/var(X), pooled across arms, as
  CUPED prescribes) shrinks the effective noise by the squared
  correlation without biasing the treatment contrast (theta is common
  to both arms, so the adjustment cancels in the A-B difference up to
  arm imbalance in X). Everything reduces to exact integer sufficient
  statistics (Sx, Sy, Sxx, Sxy, Syy per arm and pooled) in one
  per-user pass — no residual is ever materialized.
- ``pipeline_incremental_dedup``: near-duplicate pairs touching TODAY'S
  crawl slice only — yesterday's corpus is never re-paired against
  itself. Candidate generation is the new operator
  ``operators/dedup.lsh_incremental_candidate_pairs`` (new-doc band
  rows equi-join the corpus band table), then the same
  signature-estimate prefilter and exact inverted-index verify as
  ``dedup_minhash_lsh``. The oracle is the exhaustive exact-Jaccard
  pair list restricted to pairs with a batch endpoint, so the
  incremental path's recall is bit-level checked against the full
  recompute.

Reference parity: the reference engine (pbotros/river) has no
relational layer (its surface is the stream transport,
/root/reference/cpp/src/writer.cpp); these extend the analytics
surface the brief requires.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl, tbl

_CUTOFF = "2024-01-16 00:00:00"

_ARM_SQL = (
    "CASE WHEN (('0x' || substr(md5('exp7~' || CAST(user_id AS VARCHAR)), "
    "1, 8))::BIGINT % 2) = 0 THEN 'A' ELSE 'B' END"
)
_ARM_SPARK = (
    "CASE WHEN pmod(cast(conv(substring(md5(concat('exp7~', "
    "cast(user_id as string))), 1, 8), 16, 10) as bigint), 2) = 0 "
    "THEN 'A' ELSE 'B' END"
)


# ---------------------------------------------------------------------------
# CUPED variance-reduced A/B readout
# ---------------------------------------------------------------------------
@q(
    "ab_cuped_adjusted",
    oracle=f"""
    WITH per_user AS (
        SELECT {_ARM_SQL} AS arm,
               user_id,
               CAST(coalesce(sum(CASE WHEN ts < TIMESTAMP '{_CUTOFF}'
                   THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END), 0)
                   AS BIGINT) AS x,
               CAST(coalesce(sum(CASE WHEN ts >= TIMESTAMP '{_CUTOFF}'
                   AND event_type = 'purchase'
                   THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END), 0)
                   AS BIGINT) AS y
        FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2),
    pooled AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM per_user),
    arm AS (
        SELECT arm,
               CAST(count(*) AS BIGINT) AS users,
               CAST(sum(x) AS BIGINT) AS sx_a,
               CAST(sum(y) AS BIGINT) AS sy_a
        FROM per_user GROUP BY arm),
    t AS (
        SELECT p.n, p.sx, p.sy,
               CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
                 / nullif(CAST(p.n * p.sxx - p.sx * p.sx AS DOUBLE), 0.0)
                 AS theta,
               CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
                 * CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
                 / nullif(CAST(p.n * p.sxx - p.sx * p.sx AS DOUBLE)
                          * CAST(p.n * p.syy - p.sy * p.sy AS DOUBLE), 0.0)
                 AS rho2
        FROM pooled p)
    SELECT a.arm, a.users,
           CAST(a.sy_a AS DOUBLE) / (100.0 * a.users) AS mean_y_usd,
           t.theta,
           round((CAST(a.sy_a AS DOUBLE) / a.users
                  - t.theta * (CAST(a.sx_a AS DOUBLE) / a.users
                               - CAST(t.sx AS DOUBLE) / t.n)) / 100.0, 6)
               AS mean_y_cuped_usd,
           round(1.0 - t.rho2, 6) AS var_ratio
    FROM arm a, t
    """,
    tags=("analytics", "abtest", "stats", "cuped"),
)
def ab_cuped_adjusted(spark, sf_dir):
    """CUPED-adjusted revenue readout per arm (same md5 'exp7~'
    assignment as ab_welch_ttest): X = each user's total pre-cutoff
    spend, Y = post-cutoff purchase revenue; theta = pooled
    cov(X,Y)/var(X); the adjusted mean is mean(Y) - theta*(mean_arm(X)
    - mean_all(X)). ``var_ratio`` = 1 - rho^2 is the variance the
    experiment now needs to power against — the whole point of CUPED.

    Bit-exactness: theta's numerator/denominator are exact BIGINTs
    (n*Sxy - Sx*Sy fits int64 at fixture scale; DECIMAL(38) at true
    counts), so theta is one raw IEEE division; the adjusted mean and
    rho2 are multiply-add chains at FMA-contraction risk, so they ship
    round-6 (agg_moments_cents note).

    100 TB posture: one hash agg on (arm, user), one on arm, one 1-row
    pooled aggregate joined broadcast-style — no residual pass, no
    window, nothing keyed coarser than user_id."""
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    per_user = (
        events_tbl(spark, sf_dir)
        .where(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .groupBy(F.expr(_ARM_SPARK).alias("arm"), "user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("ts") < cutoff,
                        F.round(F.col("value") * 100).cast("bigint"),
                    ).otherwise(F.lit(0))
                ),
                F.lit(0),
            ).alias("x"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("ts") >= cutoff)
                        & (F.col("event_type") == "purchase"),
                        F.round(F.col("value") * 100).cast("bigint"),
                    ).otherwise(F.lit(0))
                ),
                F.lit(0),
            ).alias("y"),
        )
    )
    pooled = per_user.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov_n = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    var_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    var_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    t = pooled.select(
        "n",
        "sx",
        "sy",
        (cov_n / F.nullif(var_x, F.lit(0.0))).alias("theta"),
        (cov_n * cov_n / F.nullif(var_x * var_y, F.lit(0.0))).alias("rho2"),
    )
    arm = per_user.groupBy("arm").agg(
        F.count("*").alias("users"),
        F.sum("x").alias("sx_a"),
        F.sum("y").alias("sy_a"),
    )
    return arm.crossJoin(t).select(
        "arm",
        "users",
        (F.col("sy_a").cast("double") / (100.0 * F.col("users"))).alias("mean_y_usd"),
        "theta",
        F.round(
            (
                F.col("sy_a").cast("double") / F.col("users")
                - F.col("theta")
                * (
                    F.col("sx_a").cast("double") / F.col("users")
                    - F.col("sx").cast("double") / F.col("n")
                )
            )
            / 100.0,
            6,
        ).alias("mean_y_cuped_usd"),
        F.round(F.lit(1.0) - F.col("rho2"), 6).alias("var_ratio"),
    )


# ---------------------------------------------------------------------------
# Incremental-crawl near-duplicate detection
# ---------------------------------------------------------------------------
@q(
    "pipeline_incremental_dedup",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS g(i)),
    cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    pair AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           inter * 1.0 / (ca.c + cb.c - inter) AS jaccard
    FROM pair
    JOIN cnt ca ON ca.doc_id = doc_a
    JOIN cnt cb ON cb.doc_id = doc_b
    WHERE inter * 1.0 / (ca.c + cb.c - inter) >= 0.9
      AND (doc_a % 7 = 3 OR doc_b % 7 = 3)
    """,
    tags=("dedup", "minhash", "incremental", "pipeline"),
)
def pipeline_incremental_dedup(spark, sf_dir):
    """Dedup TODAY'S crawl against the whole corpus without re-pairing
    the corpus against itself: the batch slice (doc_id % 7 = 3 stands
    in for the day's arrivals) probes the corpus band table through
    lsh_incremental_candidate_pairs, survivors pass the
    signature-estimate prefilter, and the exact inverted-index verify
    emits every >= 0.9 pair with a batch endpoint. The oracle is the
    full exhaustive recompute restricted to batch-touching pairs, so
    the incremental path's recall is checked against ground truth (the
    banding + estimate miss probabilities are the documented
    dedup_minhash_lsh numbers, ~4e-8 at J >= 0.9).

    100 TB posture: per-day cost is O(corpus band rows + arrivals x
    bucket width) — the full self-join never runs after day one; the
    corpus band table is the natural thing to persist between runs.
    Corpus-corpus pairs that the doc-restricted verify rediscovers are
    dropped by the final batch-endpoint filter."""
    from river_spark.operators.dedup import (
        estimate_filtered_candidates,
        lsh_incremental_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        shingles,
    )

    docs = tbl(spark, sf_dir, "documents")
    sh = shingles(docs, "doc_id", "text", 3, hashed=True, distinct=False)
    sigs = minhash_signatures(sh, 64)
    cand = lsh_incremental_candidate_pairs(
        sigs, F.pmod(F.col("doc_id"), F.lit(7)) == 3, bands=16, sig_len=64
    )
    surv = estimate_filtered_candidates(sigs, cand, margin_est=0.65)
    cand_ids = surv.select(
        F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
    ).distinct()
    cand_docs = docs.join(cand_ids, "doc_id", "left_semi")
    pairs = ngram_jaccard_pairs(cand_docs, "doc_id", "text", 3, threshold=0.9)
    return pairs.where(
        (F.pmod(F.col("doc_a"), F.lit(7)) == 3)
        | (F.pmod(F.col("doc_b"), F.lit(7)) == 3)
    )


# ---------------------------------------------------------------------------
# Sample-ratio-mismatch (SRM) audit
# ---------------------------------------------------------------------------
@q(
    "ab_srm_check",
    oracle=f"""
    WITH assigned AS (
        SELECT DISTINCT event_type, user_id, {_ARM_SQL} AS arm
        FROM events WHERE user_id IS NOT NULL),
    c AS (
        SELECT event_type,
               CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        FROM assigned GROUP BY event_type)
    SELECT event_type, n_a, n_b,
           CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
               / nullif(CAST(n_a + n_b AS DOUBLE), 0.0) AS chi2_stat,
           CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
               / nullif(CAST(n_a + n_b AS DOUBLE), 0.0) > 3.841 AS srm_flag
    FROM c
    """,
    tags=("analytics", "abtest", "dq", "srm"),
)
def ab_srm_check(spark, sf_dir):
    """Sample-ratio mismatch: the FIRST thing a trustworthy experiment
    readout checks — does the observed arm split match the designed
    50/50 within chance? Per entry-point (event_type), distinct users
    per arm feed the one-degree-of-freedom chi-square, which for a
    50/50 design collapses to (n_a-n_b)^2/(n_a+n_b) — an exact-integer
    numerator over an exact-integer denominator, so the statistic is
    ONE raw IEEE division (bit-identical both engines, no rounding).
    srm_flag trips at the conventional p<0.05 cut (chi2_1 > 3.841);
    a flagged experiment's effect estimates are discarded, not
    reinterpreted.

    100 TB posture: one distinct rollup on (type, user) then a 5-row
    aggregate — both map-side combinable, nothing keyed coarser than
    the user."""
    assigned = (
        events_tbl(spark, sf_dir)
        .where(F.col("user_id").isNotNull())
        .select("event_type", "user_id", F.expr(_ARM_SPARK).alias("arm"))
        .distinct()
    )
    c = assigned.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).cast("bigint").alias("n_b"),
    )
    chi2 = (
        ((F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))).cast("double")
        / F.nullif((F.col("n_a") + F.col("n_b")).cast("double"), F.lit(0.0))
    )
    return c.select(
        "event_type",
        "n_a",
        "n_b",
        chi2.alias("chi2_stat"),
        (chi2 > 3.841).alias("srm_flag"),
    )
