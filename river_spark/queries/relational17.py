"""Relational wave 17 (round 8, session 4): tolerance-bounded as-of
joins and n-gram novelty curves.

- ``ev_asof_tolerance``: as-of join with a maximum-staleness bound —
  the telemetry semantic ("join the latest sensor reading unless it is
  older than T") that plain as-of silently gets wrong.
- ``text_ngram_novelty``: per-document fraction of trigrams first
  introduced by that document (against all lower-id documents) — the
  novelty/memorization curve used to audit how much NEW content a
  corpus slice actually adds.

Bit-exactness rules follow tests/test_oracle.py: integer gap
microseconds and shingle counts; ratios are single exact-integer
divisions.

Reference parity: the as-of family maps to the reference reader's
time-ordered seek semantics (/root/reference/cpp/src/reader.cpp
seek-to-key); the relational re-expression extends it.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.operators.asof import asof_join
from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl, tbl

_ASOF_TOL_US = 3_600_000_000  # 1 hour


# ---------------------------------------------------------------------------
# Tolerance-bounded as-of join
# ---------------------------------------------------------------------------
@q(
    "ev_asof_tolerance",
    oracle=f"""
    WITH j AS (
        SELECT p.event_id, p.ts AS p_ts, c.event_id AS c_id, c.ts AS c_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts)
    SELECT event_id,
           CASE WHEN c_ts IS NOT NULL
                 AND date_diff('microsecond', c_ts, p_ts) <= {_ASOF_TOL_US}
                THEN c_id END AS click_within_1h,
           CASE WHEN c_ts IS NOT NULL
                 AND date_diff('microsecond', c_ts, p_ts) <= {_ASOF_TOL_US}
                THEN CAST(date_diff('microsecond', c_ts, p_ts) // 1000000 AS BIGINT)
           END AS gap_s
    FROM j
    """,
    tags=("events", "asof_join", "tolerance"),
)
def ev_asof_tolerance(spark, sf_dir):
    """As-of join with a 1-hour staleness tolerance: each purchase
    attaches the user's most recent preceding click ONLY if that click
    is at most an hour old — matches beyond the bound become NULL, the
    same rows as no-match. This is the semantic every telemetry join
    actually needs (pandas merge_asof's ``tolerance=``): an unbounded
    as-of silently attaches readings from hours ago and nobody
    notices. Built as the plain union+window as-of (operators/asof.py,
    one shuffle) with the matched timestamp carried in the payload
    struct and the bound applied as a post-expression — tolerance is
    expression surgery on the operator's output, not a new operator.
    Gaps are exact integer microseconds floored to whole seconds.

    100 TB posture: identical to ev_asof_join — ONE shuffle of
    |L|+|R| rows on the key, per-partition sort, whole-stage codegen;
    the tolerance predicate is map-side."""
    ev = events_tbl(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    )
    joined = asof_join(
        purchases,
        clicks,
        left_on="user_id",
        right_on="c_user_id",
        left_ts="ts",
        right_ts="c_ts",
        right_cols=["c_id", "c_ts"],
    )
    gap_us = F.expr("timestampdiff(MICROSECOND, c_ts, ts)")
    # integer div, not /1e6-then-cast: a double quotient can round UP to
    # the next integer at adversarial microsecond values where integer
    # floor (the oracle's //) would not
    gap_s = F.expr("timestampdiff(MICROSECOND, c_ts, ts) div 1000000").cast("bigint")
    within = F.col("c_ts").isNotNull() & (gap_us <= F.lit(_ASOF_TOL_US))
    return joined.select(
        "event_id",
        F.when(within, F.col("c_id")).alias("click_within_1h"),
        F.when(within, gap_s).alias("gap_s"),
    )


# ---------------------------------------------------------------------------
# N-gram novelty curve
# ---------------------------------------------------------------------------
@q(
    "text_ngram_novelty",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS g(i)),
    firsts AS (
        SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s)
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
           sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) * 1.0 / count(*)
               AS novelty_rate
    FROM sh JOIN firsts f ON sh.s = f.s
    GROUP BY sh.doc_id
    """,
    tags=("text", "novelty", "dedup"),
)
def text_ngram_novelty(spark, sf_dir):
    """N-gram novelty curve: for each document, the fraction of its
    distinct trigrams FIRST INTRODUCED by that document relative to
    ingestion order (doc_id) — the audit that tells you whether the
    tail of a corpus still adds new content or just recombines what
    the head already covered (the marginal-value question behind
    dataset scaling decisions). A doc's shingle is novel iff the
    global minimum doc_id owning that shingle is the doc itself.

    100 TB posture: the inverted-index shape again — distinct
    (doc, shingle) grid, a min() agg on the shingle key (map-side
    combinable), join-back on the SAME key so the exchange is reused,
    per-doc fold. Shingles travel as strings here so the oracle
    replays byte-for-byte; at production scale they travel as xxhash64
    fingerprints (dedup_repeated_spans' discipline) with identical
    plan shape."""
    from river_spark.operators.dedup import shingles

    docs = tbl(spark, sf_dir, "documents")
    sh = shingles(docs, "doc_id", "text", 3, hashed=False, distinct=True)
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), F.lit(1)).otherwise(F.lit(0))
    return (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(novel).alias("n_novel"),
            (F.sum(novel) * 1.0 / F.count("*")).alias("novelty_rate"),
        )
    )


# ---------------------------------------------------------------------------
# LSH bucket-occupancy audit
# ---------------------------------------------------------------------------
_LBS_PLANES = 10
_LBS_DIM = 64


def _lbs_oracle() -> str:
    from river_spark.operators.similarity import lcg_plane_weights

    weight_rows = ",\n        ".join(
        f"({p}, [{', '.join(str(x) for x in row)}]::DOUBLE[])"
        for p, row in enumerate(lcg_plane_weights(_LBS_PLANES, _LBS_DIM))
    )
    return f"""
    WITH w(plane, pw) AS (VALUES
        {weight_rows}),
    corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sig AS (
        SELECT c.vec_id,
               CAST(sum(CASE WHEN list_dot_product(c.v, w.pw) > 0
                             THEN 1 << w.plane ELSE 0 END) AS BIGINT) AS bucket
        FROM corpus c, w GROUP BY c.vec_id),
    occ AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM sig GROUP BY bucket)
    SELECT CAST(length(printf('%b', n)) AS INT) AS occ_bucket,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(n) AS BIGINT) AS n_vecs,
           CAST(max(n) AS BIGINT) AS max_occupancy
    FROM occ GROUP BY 1
    """


@q(
    "emb_lsh_bucket_stats",
    oracle=_lbs_oracle(),
    tags=("vector", "ann", "skew"),
)
def emb_lsh_bucket_stats(spark, sf_dir):
    """LSH bucket-occupancy histogram — the ANN index's pre-flight skew
    audit, the vector-side twin of graph_degree_histogram: before
    serving queries off an LSH index you need to know whether the
    corpus piles into a few mega-buckets (a hot bucket turns every
    probe that touches it into a scan; the fix is more planes or
    bucket-splitting — this table is the evidence for that decision).
    Signatures use the same pinned-LCG hyperplanes as the gated ANN
    queries, so the DuckDB oracle replays bucketing exactly; occupancy
    is histogrammed by integer bit-length (the floor(log2)+1 idiom —
    libm-free).

    100 TB posture: one map-side signature expression (10 dot products
    inside codegen), one hash agg to bucket occupancy (|buckets| <=
    2^10 rows), one tiny agg over that — no joins, no vector
    shuffles."""
    from river_spark.operators.similarity import lcg_plane_weights, lsh_signature

    emb = tbl(spark, sf_dir, "embeddings")
    weights = lcg_plane_weights(_LBS_PLANES, _LBS_DIM)
    occ = (
        emb.select(lsh_signature("embedding", _LBS_PLANES, weights).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )
    return occ.groupBy(
        F.length(F.expr("bin(n)")).cast("int").alias("occ_bucket")
    ).agg(
        F.count("*").alias("n_buckets"),
        F.sum("n").alias("n_vecs"),
        F.max("n").alias("max_occupancy"),
    )


# ---------------------------------------------------------------------------
# Null-safe equality join
# ---------------------------------------------------------------------------
@q(
    "join_null_safe",
    oracle="""
    WITH c AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 17 = 0 THEN NULL ELSE c_nationkey END AS nk
        FROM customer),
    s AS (
        SELECT s_suppkey,
               CASE WHEN s_suppkey % 13 = 0 THEN NULL ELSE s_nationkey END AS nk
        FROM supplier)
    SELECT coalesce(CAST(c.nk AS VARCHAR), 'NULL') AS nation_key,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           CAST(count(DISTINCT s.s_suppkey) AS BIGINT) AS n_suppliers
    FROM c JOIN s ON c.nk IS NOT DISTINCT FROM s.nk
    GROUP BY c.nk
    """,
    tags=("join", "null_semantics"),
)
def join_null_safe(spark, sf_dir):
    """Null-safe equality JOIN (Spark ``<=>`` / SQL IS NOT DISTINCT
    FROM): NULL keys MATCH each other instead of silently dropping —
    the semantic you need when NULL is a legitimate category ("region
    unknown") rather than absence. Keys are deliberately NULLed on a
    deterministic modulus on both sides, and the NULL bucket's pair
    count proves the null-safe path executed (a plain equi-join would
    emit zero NULL pairs).

    100 TB posture: Spark plans ``<=>`` as an ordinary hash join on a
    null-coalesced key (no nested-loop fallback — the plan gate's
    no-BroadcastNestedLoopJoin sweep pins this), so cost is identical
    to the plain equi-join. The one real hazard is SKEW: every
    NULL-keyed row on both sides lands in ONE hash bucket, so a
    high-NULL-rate join needs the salting treatment of
    join_salted_skew applied to the coalesced key."""
    c = tbl(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 17 == 0, F.lit(None))
        .otherwise(F.col("c_nationkey"))
        .alias("c_nk"),
    )
    s = tbl(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.when(F.col("s_suppkey") % 13 == 0, F.lit(None))
        .otherwise(F.col("s_nationkey"))
        .alias("s_nk"),
    )
    j = c.join(s, c.c_nk.eqNullSafe(s.s_nk))
    return j.groupBy(
        F.coalesce(F.col("c_nk").cast("string"), F.lit("NULL")).alias("nation_key")
    ).agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("c_custkey").alias("n_customers"),
        F.countDistinct("s_suppkey").alias("n_suppliers"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve
# ---------------------------------------------------------------------------
@q(
    "ev_survival_curve",
    oracle="""
    WITH lt AS (
        SELECT user_id,
               date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
                   AS lifetime_d
        FROM events GROUP BY user_id),
    d AS (
        SELECT lifetime_d, CAST(count(*) AS BIGINT) AS n_churned
        FROM lt GROUP BY lifetime_d),
    km AS (
        SELECT lifetime_d, n_churned,
               CAST(sum(n_churned) OVER (ORDER BY lifetime_d DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS n_at_risk
        FROM d),
    s AS (
        SELECT lifetime_d, n_churned, n_at_risk,
               sum(CASE WHEN n_churned < n_at_risk
                        THEN ln(1.0 - CAST(n_churned AS DOUBLE)
                                    / CAST(n_at_risk AS DOUBLE))
                        ELSE 0.0 END)
                   OVER w AS log_s,
               max(CASE WHEN n_churned = n_at_risk THEN 1 ELSE 0 END)
                   OVER w AS hit_zero
        FROM km
        WINDOW w AS (ORDER BY lifetime_d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT lifetime_d, n_churned, n_at_risk,
           CASE WHEN hit_zero = 1 THEN 0.0 ELSE round(exp(log_s), 6) END
               AS survival
    FROM s
    """,
    tags=("events", "survival", "stats"),
)
def ev_survival_curve(spark, sf_dir):
    """Kaplan-Meier survival curve of user activity lifetimes (days
    between a user's first and last event): at each observed lifetime
    t, n_at_risk = users whose lifetime is >= t (a reverse-ordered
    running sum over the lifetime histogram — never a second scan),
    n_churned = users ending exactly at t, and S(t) = Π (1 − dᵢ/nᵢ) —
    the estimator behind every retention-curve dashboard. The
    cumulative PRODUCT is computed as exp of a running sum of logs
    over a deterministically ordered window (both engines fold the
    identical double sequence in the identical order) and rounded to
    6 — the DSIR precedent for ln-based scores; all inputs to it are
    exact integers.

    100 TB posture: one per-user min/max agg (map-side combinable, the
    only data-sized shuffle), then every window runs over the lifetime
    HISTOGRAM (tens of rows). The final-day cohort is censored-free by
    construction (lifetime is fully observed in the window); adding
    right-censoring is one extra CASE on the last observation date."""
    from river_spark.queries.tables import event_ts

    ev = tbl(spark, sf_dir, "events")
    ts = event_ts(ev)
    lt = (
        ev.select("user_id", ts.cast("date").alias("d"))
        .groupBy("user_id")
        .agg(F.datediff(F.max("d"), F.min("d")).cast("bigint").alias("lifetime_d"))
    )
    d = lt.groupBy("lifetime_d").agg(F.count("*").alias("n_churned"))
    w_rev = (
        Window.orderBy(F.col("lifetime_d").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    km = d.withColumn("n_at_risk", F.sum("n_churned").over(w_rev))
    w_fwd = (
        Window.orderBy("lifetime_d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ln(0) at a full-churn bucket diverges across engines (Spark log ->
    # NULL, DuckDB ln -> -inf): guard the term and flag zero-survival
    # explicitly instead.
    term = F.when(
        F.col("n_churned") < F.col("n_at_risk"),
        F.log(
            1.0 - F.col("n_churned").cast("double") / F.col("n_at_risk").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    hit_zero = F.max(
        F.when(F.col("n_churned") == F.col("n_at_risk"), F.lit(1)).otherwise(F.lit(0))
    ).over(w_fwd)
    return km.select(
        "lifetime_d",
        "n_churned",
        "n_at_risk",
        F.when(hit_zero == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum(term).over(w_fwd)), 6))
        .alias("survival"),
    )


# ---------------------------------------------------------------------------
# Winsorized mean
# ---------------------------------------------------------------------------
@q(
    "agg_winsorized_mean",
    oracle="""
    WITH c AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem),
    cuts AS (
        SELECT l_returnflag,
               CAST(quantile_disc(cents, 0.05) AS BIGINT) AS lo,
               CAST(quantile_disc(cents, 0.95) AS BIGINT) AS hi
        FROM c GROUP BY l_returnflag)
    SELECT c.l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(cuts.lo) AS BIGINT) AS lo_cents,
           CAST(max(cuts.hi) AS BIGINT) AS hi_cents,
           sum(least(greatest(c.cents, cuts.lo), cuts.hi)) * 1.0 / count(*)
               AS winsorized_mean_cents,
           sum(c.cents) * 1.0 / count(*) AS raw_mean_cents
    FROM c JOIN cuts ON c.l_returnflag = cuts.l_returnflag
    GROUP BY c.l_returnflag
    """,
    tags=("agg", "robust", "stats"),
)
def agg_winsorized_mean(spark, sf_dir):
    """Winsorized mean (5%/95%) of price per return flag — the robust
    location estimate a metrics pipeline uses when a handful of
    fat-finger rows would otherwise move the average: values are
    CLAMPED to the group's p05/p95 (not dropped — winsorizing keeps n
    constant, unlike trimming), and both the robust and raw means are
    emitted so the gap itself is the outlier-impact metric. Exact
    integer pipeline: cents, percentile_disc cutoffs (actual stored
    values), integer clamps, integer sums, ONE division at the end.

    100 TB posture: two passes by construction (cutoffs cannot be
    known before the data is seen): pass 1 is a per-group
    percentile agg; its |groups|-row result broadcasts back onto pass
    2's clamp+sum agg, both passes sharing the group key partitioning.
    At extreme group cardinality pass 1 swaps percentile_disc for the
    value-histogram shape (agg_weighted_median's machinery)."""
    c = tbl(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    cuts = c.groupBy("l_returnflag").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY cents)")
        .cast("bigint")
        .alias("lo"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)")
        .cast("bigint")
        .alias("hi"),
    )
    j = c.join(F.broadcast(cuts), "l_returnflag")
    clamped = F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    return j.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.max("lo").alias("lo_cents"),
        F.max("hi").alias("hi_cents"),
        (F.sum(clamped) * 1.0 / F.count("*")).alias("winsorized_mean_cents"),
        (F.sum("cents") * 1.0 / F.count("*")).alias("raw_mean_cents"),
    )


# ---------------------------------------------------------------------------
# Train/val token-distribution drift
# ---------------------------------------------------------------------------
_DRIFT_VOCAB_K = 256


@q(
    "dq_split_drift",
    oracle=f"""
    WITH toks AS (
        SELECT CASE WHEN CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 4)) AS INT)
                         % 100 < 90
                    THEN 'train' ELSE 'val' END AS split,
               unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
        FROM documents),
    vocab AS (
        SELECT w FROM (SELECT w, count(*) AS c FROM toks GROUP BY w)
        ORDER BY c DESC, w LIMIT {_DRIFT_VOCAB_K}),
    cnt AS (
        SELECT v.w,
               CAST(sum(CASE WHEN t.split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
               CAST(sum(CASE WHEN t.split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val
        FROM vocab v JOIN toks t ON t.w = v.w GROUP BY v.w),
    tot AS (
        SELECT w, n_train, n_val,
               sum(n_train) OVER () AS tt, sum(n_val) OVER () AS tv
        FROM cnt)
    SELECT w AS token, n_train, n_val,
           round((CAST(n_train + 1 AS DOUBLE) / CAST(tt + {_DRIFT_VOCAB_K} AS DOUBLE))
                 * ln((CAST(n_train + 1 AS DOUBLE) / CAST(tt + {_DRIFT_VOCAB_K} AS DOUBLE))
                      / (CAST(n_val + 1 AS DOUBLE) / CAST(tv + {_DRIFT_VOCAB_K} AS DOUBLE))), 6)
               AS kl_contrib
    FROM tot
    """,
    tags=("dq", "drift", "distribution"),
)
def dq_split_drift(spark, sf_dir):
    """Train/val token-distribution drift: per-token contribution to
    KL(train ‖ val) over the corpus's top-256 vocabulary, with Laplace
    +1 smoothing — the distribution-shift check a pipeline runs on its
    own split before trusting validation loss (a drifted split makes
    val loss unrepresentative; summing the column gives the headline
    KL). The split is the SAME md5 90/10 assignment as
    pipeline_train_split, so this gate also cross-checks that the
    split itself is distribution-neutral (KL ≈ 0 within sampling
    noise). Counts are exact integers; the smoothed-ratio ln term is
    rounded to 6 (DSIR precedent — drift ~10 orders below).

    100 TB posture: vocab via TakeOrderedAndProject (never a full
    sort), broadcast onto the token stream (tokens never shuffled by
    word for counting — the join is the filter), one |vocab|-row agg,
    totals as windows over those 256 rows."""
    docs = tbl(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 100
    )
    toks = docs.select(
        F.when(bucket < 90, "train").otherwise("val").alias("split"),
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    )
    vocab = (
        toks.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(_DRIFT_VOCAB_K)
        .select("w")
    )
    cnt = (
        toks.join(F.broadcast(vocab), "w")
        .groupBy("w")
        .agg(
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("n_train"),
            F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("n_val"),
        )
    )
    w_all = Window.partitionBy()
    tt = F.sum("n_train").over(w_all)
    tv = F.sum("n_val").over(w_all)
    p = (F.col("n_train") + 1).cast("double") / (tt + _DRIFT_VOCAB_K).cast("double")
    qd = (F.col("n_val") + 1).cast("double") / (tv + _DRIFT_VOCAB_K).cast("double")
    return cnt.select(
        F.col("w").alias("token"),
        "n_train",
        "n_val",
        F.round(p * F.log(p / qd), 6).alias("kl_contrib"),
    )


# ---------------------------------------------------------------------------
# Wilson confidence interval for conversion rates
# ---------------------------------------------------------------------------
_WILSON_Z = 1.959963984540054  # 95% two-sided


@q(
    "agg_conversion_wilson",
    oracle=f"""
    WITH base AS (
        SELECT c.c_mktsegment AS segment,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_converted
        FROM customer c
        LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
          ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment),
    w AS (
        SELECT segment, n_customers, n_converted,
               CAST(n_converted AS DOUBLE) / CAST(n_customers AS DOUBLE) AS p,
               CAST(n_customers AS DOUBLE) AS n
        FROM base)
    SELECT segment, n_customers, n_converted,
           p AS conversion_rate,
           round(greatest(
             (p + {_WILSON_Z} * {_WILSON_Z} / (2 * n)
                - {_WILSON_Z} * sqrt((p * (1 - p) + {_WILSON_Z} * {_WILSON_Z} / (4 * n)) / n))
               / (1 + {_WILSON_Z} * {_WILSON_Z} / n), 0.0), 6) + 0.0 AS wilson_lo,
           round(least(
             (p + {_WILSON_Z} * {_WILSON_Z} / (2 * n)
                + {_WILSON_Z} * sqrt((p * (1 - p) + {_WILSON_Z} * {_WILSON_Z} / (4 * n)) / n))
               / (1 + {_WILSON_Z} * {_WILSON_Z} / n), 1.0), 6) AS wilson_hi
    FROM w
    """,
    tags=("agg", "stats", "interval"),
)
def agg_conversion_wilson(spark, sf_dir):
    """Wilson score interval (95%) around per-segment conversion rates
    (customers with at least one order / customers) — the binomial CI
    a product dashboard should use instead of the normal
    approximation, which collapses at small n and p near 0/1 (Wilson
    stays inside [0,1] and never degenerates). Inputs are exact
    integer counts (the DISTINCT purchaser set semi-joins before
    counting so multi-order customers count once); the interval is one
    closed-form expression over those integers with the SAME operation
    tree in both engines. The raw expression is NOT bit-stable at the
    p=1 boundary (z*sqrt(z^2/4n^2) may or may not round to exactly
    z^2/2n, so one engine emits 1.0 and the other 1-1ulp — the round-8
    verdict's red gate), so both bounds are clamped into [0,1]
    (mathematically a no-op for Wilson) and rounded to 6 decimals in
    BOTH engines, the repo's ln/log discipline.

    100 TB posture: one distinct-projection of the fact's key, one
    broadcast-or-shuffle left join on the customer dimension, one
    segment agg; the CI math is per-row expressions on a 5-row
    result."""
    cust = tbl(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    buyers = tbl(spark, sf_dir, "orders").select("o_custkey").distinct()
    base = (
        cust.join(buyers, cust.c_custkey == buyers.o_custkey, "left")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(
                F.when(F.col("o_custkey").isNotNull(), 1).otherwise(0)
            ).alias("n_converted"),
        )
    )
    p = F.col("n_converted").cast("double") / F.col("n_customers").cast("double")
    n = F.col("n_customers").cast("double")
    z = F.lit(_WILSON_Z)
    half = z * F.sqrt((p * (1 - p) + z * z / (4 * n)) / n)
    center = p + z * z / (2 * n)
    denom = 1 + z * z / n
    return base.select(
        "segment",
        "n_customers",
        "n_converted",
        p.alias("conversion_rate"),
        # + 0.0 normalizes a possible -0.0 at the p=0 boundary: the
        # greatest() tie between -0.0 and 0.0 picks an arbitrary sign and
        # round(-0.0, 6) differs between engines (+0.0 Spark, -0.0 DuckDB)
        (F.round(F.greatest((center - half) / denom, F.lit(0.0)), 6) + 0.0).alias(
            "wilson_lo"
        ),
        F.round(F.least((center + half) / denom, F.lit(1.0)), 6).alias("wilson_hi"),
    )
