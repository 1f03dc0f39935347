"""Relational wave 30 (round 11): exact nonparametric statistics
and classifier-calibration audits.

The parametric A/B readout (``ab_welch_ttest``) and exact-moment
correlation (``agg_corr_exact``) get their rank-based siblings — the
tests an experimentation/eval platform actually reaches for when the
metric is skewed (revenue) or the relationship is monotone-but-curved:

- ``ab_mann_whitney_u``: Mann-Whitney U (Wilcoxon rank-sum) between
  md5-assigned experiment arms, with exact tie handling. Computed
  WITHOUT ranking raw rows: U depends only on the per-distinct-value
  counts of each arm and the running count below each value, so the
  scan reduces to a (value -> n_a, n_b) rollup and the CDF counter
  runs through ``stitched_prefix_sum`` — parallelism is value-buckets,
  never one task per arm. Doubling U (``u_a_x2``) keeps every output a
  BIGINT even when ties contribute half-steps.
- ``agg_spearman_rho``: Spearman rank correlation per group with
  average-rank tie handling, as Pearson over EXACT integer doubled
  ranks (2*avg-rank is always an integer): value-level rollups give
  each distinct value its doubled midrank, the joint (x, y) rollup
  joins the two rank tables, and the final rho is the same
  sufficient-statistics closed form as agg_corr_exact. No raw row is
  ever ranked by a window.
- ``agg_cohens_kappa``: inter-rater agreement between the marker
  lang-ID heuristic (text.py's guess rule) and the stored labels —
  observed and chance agreement from the confusion matrix's exact
  integer marginals; the text_lang_id_eval confusion matrix condensed
  into the one calibrated scalar evaluators quote.

Bit-exactness: every intermediate is a BIGINT; doubles appear only in
the FINAL closed-form expression, written as the identical operation
tree in Spark and DuckDB over identical integer inputs (IEEE +,*,/ and
sqrt are correctly rounded, hence bit-identical). At true 100 TB row
counts the int64 rank products widen to DECIMAL(38,0) — same shape,
wider lanes (the agg_corr_exact note applies verbatim).

Reference parity: the reference engine (pbotros/river) has no
relational layer (its surface is the stream transport,
/root/reference/cpp/src/writer.cpp); these extend the analytics
surface the brief requires.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl, tbl
from river_spark.queries.text import (  # noqa: F401 (rules shared with text_lang_id_eval / text_quality_score)
    _LANG_MARKERS,
    _SW_SQL,
    _marker_count_spark,
    _marker_count_sql,
)

_ARM = (
    "pmod(cast(conv(substring(md5(concat('exp7~', cast(user_id as string))), "
    "1, 8), 16, 10) as bigint), 2)"
)


# ---------------------------------------------------------------------------
# Mann-Whitney U with exact ties, over a value rollup (never raw ranks)
# ---------------------------------------------------------------------------
@q(
    "ab_mann_whitney_u",
    oracle="""
    WITH assigned AS (
        SELECT CASE WHEN (('0x' || substr(md5('exp7~' || CAST(user_id AS
                   VARCHAR)), 1, 8))::BIGINT % 2) = 0 THEN 'A' ELSE 'B'
               END AS arm,
               value
        FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
    v AS (
        SELECT value,
               CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
               CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS nb
        FROM assigned GROUP BY value),
    c AS (
        SELECT na, nb,
               CAST(coalesce(sum(nb) OVER (ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cumb_below
        FROM v),
    s AS (
        SELECT CAST(sum(na) AS BIGINT) AS n_a,
               CAST(sum(nb) AS BIGINT) AS n_b,
               CAST(sum(na * (2 * cumb_below + nb)) AS BIGINT) AS u_a_x2,
               CAST(sum((na + nb) * (na + nb) * (na + nb) - (na + nb))
                   AS BIGINT) AS tie_cubes
        FROM c)
    SELECT n_a, n_b, u_a_x2,
           2 * n_a * n_b - u_a_x2 AS u_b_x2,
           tie_cubes,
           -- one-arm / all-tied boundaries zero the variance: Spark ANSI
           -- throws on double/0 where DuckDB yields NULL, so both engines
           -- share the explicit guard (NULL z when the test is undefined)
           CASE WHEN n_a > 0 AND n_b > 0 AND (n_a + n_b) > 1
                     AND CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12
                         * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1)
                            - CAST(tie_cubes AS DOUBLE)
                              / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                                 * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1))) > 0
                THEN ((CAST(u_a_x2 AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) / 2)
                     / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12
                            * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1)
                               - CAST(tie_cubes AS DOUBLE)
                                 / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                                    * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1))))
           END AS z_stat
    FROM s
    """,
    tags=("analytics", "abtest", "stats", "exact"),
)
def ab_mann_whitney_u(spark, sf_dir):
    """Mann-Whitney U between experiment arms (same md5 assignment as
    ab_welch_ttest) with EXACT tie handling — the nonparametric readout
    for skewed metrics where the t-test's mean is the wrong summary.

    U never needs per-row ranks: with per-distinct-value arm counts
    (na, nb) and the running count of B strictly below each value,
    2*U_A = sum(na * (2*cumB_below + nb)) — ties contribute the half
    step exactly, and doubling keeps it a BIGINT. The z statistic uses
    the standard tie-corrected variance, with sum(t^3 - t) over tie
    groups again a pure BIGINT.

    100 TB posture: raw events reduce to one (value -> na, nb) hash
    rollup (value domain is bounded — 2-decimal amounts — so the
    rollup is domain-sized, not data-sized); the CDF counter over that
    rollup runs through operators/stitched_lag.stitched_prefix_sum
    (bucket = floor(value)), so no single task ever sees the whole
    distribution. The plain-window oracle is row-identical by the
    operator's property test."""
    from river_spark.operators.stitched_lag import stitched_prefix_sum

    arm_a = (F.expr(_ARM) == 0).cast("int").cast("long")
    v = (
        events_tbl(spark, sf_dir)
        .filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .select(F.col("value"), arm_a.alias("is_a"))
        .groupBy("value")
        .agg(
            F.sum("is_a").alias("na"),
            (F.count("*") - F.sum("is_a")).alias("nb"),
        )
    )
    c = stitched_prefix_sum(
        v,
        key_cols=[],
        order_cols=["value"],
        value_col="nb",
        bucket=F.floor("value"),
        out_col="cumb_incl",
    ).withColumn("cumb_below", F.col("cumb_incl") - F.col("nb"))
    s = c.agg(
        F.sum("na").alias("n_a"),
        F.sum("nb").alias("n_b"),
        F.sum(F.col("na") * (2 * F.col("cumb_below") + F.col("nb"))).alias("u_a_x2"),
        F.sum(
            (F.col("na") + F.col("nb")) * (F.col("na") + F.col("nb"))
            * (F.col("na") + F.col("nb"))
            - (F.col("na") + F.col("nb"))
        ).alias("tie_cubes"),
    )
    na_d, nb_d = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    mean_diff = (F.col("u_a_x2").cast("double") - na_d * nb_d) / 2
    var = (
        na_d * nb_d / 12
        * ((na_d + nb_d + 1)
           - F.col("tie_cubes").cast("double") / ((na_d + nb_d) * (na_d + nb_d - 1)))
    )
    # one-arm / all-tied boundaries zero the variance: Spark ANSI throws
    # on double/0 where DuckDB yields NULL; CASE WHEN is lazily evaluated
    # in both engines, so the division never runs on the boundary
    defined = (F.col("n_a") > 0) & (F.col("n_b") > 0) & ((F.col("n_a") + F.col("n_b")) > 1) & (var > 0)
    return s.select(
        "n_a",
        "n_b",
        "u_a_x2",
        (2 * F.col("n_a") * F.col("n_b") - F.col("u_a_x2")).alias("u_b_x2"),
        "tie_cubes",
        F.when(defined, mean_diff / F.sqrt(var)).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Spearman rho from exact doubled midranks
# ---------------------------------------------------------------------------
@q(
    "agg_spearman_rho",
    oracle="""
    WITH base AS (
        SELECT l_returnflag AS g,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem),
    rx AS (
        SELECT g, x,
               2 * CAST(coalesce(sum(nx) OVER (PARTITION BY g ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) + nx + 1 AS rx2
        FROM (SELECT g, x, CAST(count(*) AS BIGINT) AS nx
              FROM base GROUP BY g, x)),
    ry AS (
        SELECT g, y,
               2 * CAST(coalesce(sum(ny) OVER (PARTITION BY g ORDER BY y
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) + ny + 1 AS ry2
        FROM (SELECT g, y, CAST(count(*) AS BIGINT) AS ny
              FROM base GROUP BY g, y)),
    joint AS (
        SELECT g, x, y, CAST(count(*) AS BIGINT) AS nxy
        FROM base GROUP BY g, x, y),
    s AS (
        SELECT j.g,
               CAST(sum(nxy) AS BIGINT) AS n,
               CAST(sum(nxy * rx2) AS BIGINT) AS sx,
               CAST(sum(nxy * ry2) AS BIGINT) AS sy,
               CAST(sum(nxy * rx2 * rx2) AS BIGINT) AS sxx,
               CAST(sum(nxy * ry2 * ry2) AS BIGINT) AS syy,
               CAST(sum(nxy * rx2 * ry2) AS BIGINT) AS sxy
        FROM joint j
        JOIN rx ON rx.g = j.g AND rx.x = j.x
        JOIN ry ON ry.g = j.g AND ry.y = j.y
        GROUP BY j.g)
    SELECT g AS l_returnflag, n,
           -- constant x or y in a group zeroes a rank variance: shared
           -- NULL guard (Spark ANSI would throw on the double /0)
           CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                 AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
                THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           END AS spearman_rho
    FROM s
    """,
    tags=("agg", "stats", "exact"),
)
def agg_spearman_rho(spark, sf_dir):
    """Spearman rank correlation of (quantity, price-in-cents) per
    return flag with average-rank ties, computed WITHOUT ranking a
    single raw row: each distinct value's doubled midrank
    (2*avg-rank = 2*count_below + count_equal + 1, always a BIGINT)
    comes from a value-level rollup, the joint (x, y) rollup joins the
    two rank tables, and rho is Pearson's closed form over the exact
    integer sufficient statistics — identical operation tree in both
    engines, hence bit-identical doubles with no rounding.

    100 TB posture: three hash rollups (x, y, joint) — all partial-
    aggregatable — plus cumulative counters over DOMAIN-sized rollups
    (quantity has 50 values; cents is bounded by the price range, so
    the y rollup is domain-sized, not data-sized), with the y counter
    running through stitched_prefix_sum (bucket = y div 100000) so no
    task sees a whole group's distribution. The int64 rank products
    hold to ~10^16 per group; beyond that they widen to DECIMAL(38,0)
    like agg_corr_exact's partials."""
    from river_spark.operators.stitched_lag import stitched_prefix_sum

    base = tbl(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    wx = (
        Window.partitionBy("g")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rx = (
        base.groupBy("g", "x")
        .agg(F.count("*").alias("nx"))
        .withColumn(
            "rx2",
            2 * F.coalesce(F.sum("nx").over(wx), F.lit(0)) + F.col("nx") + 1,
        )
        .select("g", "x", "rx2")
    )
    ry = (
        stitched_prefix_sum(
            base.groupBy("g", "y").agg(F.count("*").alias("ny")),
            key_cols=["g"],
            order_cols=["y"],
            value_col="ny",
            bucket=F.expr("y div 100000"),
            out_col="cum_incl",
        )
        .withColumn("ry2", 2 * (F.col("cum_incl") - F.col("ny")) + F.col("ny") + 1)
        .select("g", "y", "ry2")
    )
    joint = base.groupBy("g", "x", "y").agg(F.count("*").alias("nxy"))
    s = (
        joint.join(rx, ["g", "x"])
        .join(ry, ["g", "y"])
        .groupBy("g")
        .agg(
            F.sum("nxy").alias("n"),
            F.sum(F.col("nxy") * F.col("rx2")).alias("sx"),
            F.sum(F.col("nxy") * F.col("ry2")).alias("sy"),
            F.sum(F.col("nxy") * F.col("rx2") * F.col("rx2")).alias("sxx"),
            F.sum(F.col("nxy") * F.col("ry2") * F.col("ry2")).alias("syy"),
            F.sum(F.col("nxy") * F.col("rx2") * F.col("ry2")).alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    # constant x or y zeroes a rank variance: shared NULL guard (Spark
    # ANSI would throw on the double /0; CASE WHEN is lazy in both engines)
    return s.select(
        F.col("g").alias("l_returnflag"),
        "n",
        F.when(
            (nd * sxx - sx * sx > 0) & (nd * syy - sy * sy > 0),
            (nd * sxy - sx * sy)
            / (F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)),
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Cohen's kappa of the lang-ID heuristic vs stored labels
# ---------------------------------------------------------------------------
@q(
    "agg_cohens_kappa",
    oracle=f"""
    WITH s AS (
        SELECT lang,
               {_marker_count_sql(_LANG_MARKERS["en"])} AS c_en,
               {_marker_count_sql(_LANG_MARKERS["es"])} AS c_es,
               {_marker_count_sql(_LANG_MARKERS["de"])} AS c_de,
               {_marker_count_sql(_LANG_MARKERS["fr"])} AS c_fr
        FROM documents),
    g AS (
        SELECT lang,
               CASE WHEN c_en = 0 AND c_es = 0 AND c_de = 0 AND c_fr = 0 THEN 'und'
                    WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
                    WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
                    WHEN c_de >= c_fr THEN 'de'
                    ELSE 'fr' END AS lang_guess
        FROM s),
    conf AS (
        SELECT lang, lang_guess, CAST(count(*) AS BIGINT) AS n
        FROM g GROUP BY lang, lang_guess),
    legs AS (
        SELECT lang AS label, n AS n_row, CAST(0 AS BIGINT) AS n_col,
               CASE WHEN lang = lang_guess THEN n ELSE 0 END AS agree
        FROM conf
        UNION ALL
        SELECT lang_guess AS label, CAST(0 AS BIGINT), n, CAST(0 AS BIGINT)
        FROM conf),
    lab AS (
        SELECT label, CAST(sum(n_row) AS BIGINT) AS row_n,
               CAST(sum(n_col) AS BIGINT) AS col_n,
               CAST(sum(agree) AS BIGINT) AS agree_n
        FROM legs GROUP BY label),
    tot AS (
        SELECT CAST(sum(row_n) AS BIGINT) AS n_docs,
               CAST(sum(agree_n) AS BIGINT) AS n_agree,
               CAST(sum(row_n * col_n) AS BIGINT) AS chance_num
        FROM lab)
    SELECT n_docs, n_agree, chance_num,
           -- a single-cell matrix (every doc one label, guessed as that
           -- label) makes chance = N^2: kappa undefined, NULL both engines
           CASE WHEN CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)
                     - CAST(chance_num AS DOUBLE) > 0
                THEN (CAST(n_docs AS DOUBLE) * CAST(n_agree AS DOUBLE)
                      - CAST(chance_num AS DOUBLE))
                     / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)
                        - CAST(chance_num AS DOUBLE))
           END AS kappa
    FROM tot
    """,
    tags=("agg", "stats", "evaluation", "exact"),
)
def agg_cohens_kappa(spark, sf_dir):
    """Cohen's kappa between the marker lang-ID heuristic and the
    stored labels — text_lang_id_eval's confusion matrix condensed into
    the chance-corrected agreement scalar: kappa = (po - pe)/(1 - pe)
    = (N*agree - sum_l row_l*col_l) / (N^2 - sum_l row_l*col_l), every
    term an exact BIGINT from the matrix marginals. Labels one side
    never produces (e.g. 'und' has no true-label row, 'zh' no guess
    column) contribute row*col = 0 naturally: the two marginal legs
    are UNIONED into one label rollup — no join anywhere in the plan —
    and a missing side sums to zero. The final division is the same
    operation tree in both engines.

    100 TB posture: identical scan shape to text_lang_id_eval — one
    zero-shuffle guess expression, one |langs|^2 hash agg; everything
    after the confusion matrix is constant-sized, join-free, single
    pipeline."""
    d = tbl(spark, sf_dir, "documents").select(
        "lang",
        _marker_count_spark(_LANG_MARKERS["en"]).alias("c_en"),
        _marker_count_spark(_LANG_MARKERS["es"]).alias("c_es"),
        _marker_count_spark(_LANG_MARKERS["de"]).alias("c_de"),
        _marker_count_spark(_LANG_MARKERS["fr"]).alias("c_fr"),
    )
    guess = (
        F.when(
            (F.col("c_en") == 0)
            & (F.col("c_es") == 0)
            & (F.col("c_de") == 0)
            & (F.col("c_fr") == 0),
            "und",
        )
        .when(
            (F.col("c_en") >= F.col("c_es"))
            & (F.col("c_en") >= F.col("c_de"))
            & (F.col("c_en") >= F.col("c_fr")),
            "en",
        )
        .when((F.col("c_es") >= F.col("c_de")) & (F.col("c_es") >= F.col("c_fr")), "es")
        .when(F.col("c_de") >= F.col("c_fr"), "de")
        .otherwise("fr")
    )
    conf = (
        d.select("lang", guess.alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(F.count("*").alias("n"))
    )
    leg_row = conf.select(
        F.col("lang").alias("label"),
        F.col("n").alias("n_row"),
        F.lit(0).cast("long").alias("n_col"),
        F.when(F.col("lang") == F.col("lang_guess"), F.col("n"))
        .otherwise(0)
        .alias("agree"),
    )
    leg_col = conf.select(
        F.col("lang_guess").alias("label"),
        F.lit(0).cast("long").alias("n_row"),
        F.col("n").alias("n_col"),
        F.lit(0).cast("long").alias("agree"),
    )
    lab = (
        leg_row.unionByName(leg_col)
        .groupBy("label")
        .agg(
            F.sum("n_row").alias("row_n"),
            F.sum("n_col").alias("col_n"),
            F.sum("agree").alias("agree_n"),
        )
    )
    s = lab.agg(
        F.sum("row_n").alias("n_docs"),
        F.sum("agree_n").alias("n_agree"),
        F.sum(F.col("row_n") * F.col("col_n")).alias("chance_num"),
    )
    nd = F.col("n_docs").cast("double")
    # single-cell matrix boundary: chance = N^2 -> undefined kappa, NULL
    # in both engines (Spark ANSI would throw on the raw double /0)
    return s.select(
        "n_docs",
        "n_agree",
        "chance_num",
        F.when(
            nd * nd - F.col("chance_num").cast("double") > 0,
            (nd * F.col("n_agree").cast("double") - F.col("chance_num").cast("double"))
            / (nd * nd - F.col("chance_num").cast("double")),
        ).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Classifier calibration (reliability diagram) in exact integers
# ---------------------------------------------------------------------------
@q(
    "pipeline_score_calibration",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS toks,
               CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                    x -> x IN ({_SW_SQL}))) AS BIGINT) AS sw,
               CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
                   AS BIGINT) AS dtoks
        FROM documents),
    scored AS (
        SELECT doc_id,
               (sw * 1000000) // toks AS q_micro,
               least((sw * 10) // toks, 9) AS bin,
               CASE WHEN 2 * dtoks > toks THEN 1 ELSE 0 END AS label
        FROM t WHERE toks > 0)
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(label) AS BIGINT) AS n_pos,
           CAST(sum(q_micro) AS BIGINT) AS sum_q_micro,
           CAST(abs(sum(q_micro) - 1000000 * sum(label)) AS BIGINT)
               AS calib_gap_micro,
           CAST(sum(q_micro) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000)
               AS mean_pred,
           CAST(sum(label) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS frac_pos
    FROM scored GROUP BY bin
    """,
    tags=("pipeline", "quality", "evaluation", "exact"),
)
def pipeline_score_calibration(spark, sf_dir):
    """Reliability diagram of a quality-classifier proxy — the
    calibration audit every score-filtered training pipeline needs
    before trusting a threshold: does a doc scored 0.3 actually pass
    the independent label 30% of the time?

    Score = stopword ratio (text_quality_score's central feature),
    quantized to integer MICRO-UNITS per doc ((sw*1e6) div toks) so the
    per-bin sums stay exact BIGINTs — a float score would make every
    bin mean order-dependent. Label = lexical-diversity proxy
    (2*distinct_tokens > tokens), an integer comparison. Decile bin =
    (sw*10) div toks, clamped. The per-bin calibration gap
    |sum_q - 1e6*n_pos| is a pure BIGINT; mean_pred / frac_pos are
    single divisions of exact integers (identical trees both engines).

    100 TB posture: one zero-shuffle scan computes score, bin, and
    label per doc; ONE hash aggregation over <= 10 bins — partial
    aggregation does nearly all the work map-side; nothing after the
    agg exceeds 10 rows."""
    t = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("toks"),
        F.size(
            F.expr(f"filter(split(trim(text), '\\\\s+'), x -> x IN ({_SW_SQL}))")
        )
        .cast("bigint")
        .alias("sw"),
        F.size(F.array_distinct(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("bigint")
        .alias("dtoks"),
    )
    scored = t.filter(F.col("toks") > 0).select(
        F.expr("sw * 1000000 div toks").alias("q_micro"),
        F.least(F.expr("sw * 10 div toks"), F.lit(9)).cast("bigint").alias("bin"),
        F.when(2 * F.col("dtoks") > F.col("toks"), 1).otherwise(0).alias("label"),
    )
    g = scored.groupBy("bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("label").alias("n_pos"),
        F.sum("q_micro").alias("sum_q_micro"),
    )
    return g.select(
        "bin",
        "n_docs",
        "n_pos",
        "sum_q_micro",
        F.abs(F.col("sum_q_micro") - 1000000 * F.col("n_pos")).alias(
            "calib_gap_micro"
        ),
        (
            F.col("sum_q_micro").cast("double")
            / (F.col("n_docs").cast("double") * 1000000)
        ).alias("mean_pred"),
        (F.col("n_pos").cast("double") / F.col("n_docs").cast("double")).alias(
            "frac_pos"
        ),
    )


# ---------------------------------------------------------------------------
# Budgeted quality threshold (the knee of the score-filter curve)
# ---------------------------------------------------------------------------
@q(
    "pipeline_quality_knee",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS toks,
               CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                    x -> x IN ({_SW_SQL}))) AS BIGINT) AS sw
        FROM documents),
    scored AS (
        SELECT doc_id, source, toks,
               (sw * 1000000) // toks AS q_micro
        FROM t WHERE toks > 0),
    c AS (
        SELECT doc_id, source, toks, q_micro,
               CAST(sum(toks) OVER (PARTITION BY source
                   ORDER BY q_micro DESC, doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_toks,
               CAST(count(*) OVER (PARTITION BY source
                   ORDER BY q_micro DESC, doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_kept,
               CAST(sum(toks) OVER (PARTITION BY source) AS BIGINT) AS total_toks
        FROM scored),
    x AS (
        SELECT source, q_micro, n_kept, cum_toks, total_toks,
               row_number() OVER (PARTITION BY source
                   ORDER BY q_micro DESC, doc_id) AS rn
        FROM c WHERE 2 * cum_toks >= total_toks)
    SELECT source,
           q_micro AS threshold_q_micro,
           n_kept AS n_docs_kept,
           cum_toks AS tokens_kept,
           total_toks AS total_tokens,
           CAST(cum_toks AS DOUBLE) / CAST(total_toks AS DOUBLE)
               AS kept_token_share
    FROM x WHERE rn = 1
    """,
    tags=("pipeline", "quality", "curation", "exact"),
)
def pipeline_quality_knee(spark, sf_dir):
    """Per-source threshold selection for a score-filtered pipeline:
    within each source, keep the highest-scoring docs (stopword-ratio
    score in exact micro-units — the same rule
    pipeline_score_calibration audits) until the kept token mass first
    reaches HALF that source's corpus, and report the knee — threshold
    score, docs kept, tokens kept. Per-domain thresholds are the
    realistic shape: one global cut over heterogeneous sources
    over-prunes the cleanest domain. Every intermediate is a BIGINT;
    the only double is the final share division.

    100 TB posture: the cumulative token counter and the kept-doc
    counter share ONE stitched_prefix_sum pass keyed by source (bucket
    = score band, so no task scans a whole source in score order); the
    per-source totals are a tiny groupBy equi-joined back (AQE
    broadcasts the |sources|-row side); the crossing row per source is
    one min_by-style struct aggregation, not a sort."""
    from river_spark.operators.stitched_lag import stitched_prefix_sum

    t = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("toks"),
        F.size(
            F.expr(f"filter(split(trim(text), '\\\\s+'), x -> x IN ({_SW_SQL}))")
        )
        .cast("bigint")
        .alias("sw"),
    )
    scored = t.filter(F.col("toks") > 0).select(
        "doc_id",
        "source",
        "toks",
        F.expr("sw * 1000000 div toks").alias("q_micro"),
        (-F.expr("sw * 1000000 div toks")).alias("neg_q"),
        F.lit(1).cast("bigint").alias("one"),
    )
    c = stitched_prefix_sum(
        scored,
        key_cols=["source"],
        order_cols=["neg_q", "doc_id"],
        value_col=["toks", "one"],
        bucket=F.expr("neg_q div 100000"),
        out_col=["cum_toks", "n_kept"],
    )
    totals = scored.groupBy("source").agg(F.sum("toks").alias("total_toks"))
    crossing = c.join(totals, "source").filter(
        2 * F.col("cum_toks") >= F.col("total_toks")
    )
    knee = crossing.groupBy("source").agg(
        F.min(
            F.struct("neg_q", "doc_id", "q_micro", "n_kept", "cum_toks", "total_toks")
        ).alias("s")
    )
    return knee.select(
        "source",
        F.col("s.q_micro").alias("threshold_q_micro"),
        F.col("s.n_kept").alias("n_docs_kept"),
        F.col("s.cum_toks").alias("tokens_kept"),
        F.col("s.total_toks").alias("total_tokens"),
        (
            F.col("s.cum_toks").cast("double") / F.col("s.total_toks").cast("double")
        ).alias("kept_token_share"),
    )


# ---------------------------------------------------------------------------
# ROC-AUC of the quality score, exactly (ties included)
# ---------------------------------------------------------------------------
@q(
    "agg_auc_roc",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS toks,
               CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                    x -> x IN ({_SW_SQL}))) AS BIGINT) AS sw,
               CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
                   AS BIGINT) AS dtoks
        FROM t0),
    scored AS (
        SELECT (sw * 1000000) // toks AS q_micro,
               CASE WHEN 2 * dtoks > toks THEN 1 ELSE 0 END AS label
        FROM t WHERE toks > 0),
    v AS (
        SELECT q_micro,
               CAST(sum(label) AS BIGINT) AS np_,
               CAST(sum(1 - label) AS BIGINT) AS nn
        FROM scored GROUP BY q_micro),
    c AS (
        SELECT np_, nn,
               CAST(coalesce(sum(nn) OVER (ORDER BY q_micro
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cumn_below
        FROM v),
    s AS (
        SELECT CAST(sum(np_) AS BIGINT) AS n_pos,
               CAST(sum(nn) AS BIGINT) AS n_neg,
               CAST(sum(np_ * (2 * cumn_below + nn)) AS BIGINT) AS u_x2
        FROM c)
    SELECT n_pos, n_neg, u_x2,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN CAST(u_x2 AS DOUBLE)
                     / (2 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
           END AS auc
    FROM s
    """.replace("FROM t0", "FROM documents"),
    tags=("agg", "stats", "evaluation", "exact"),
)
def agg_auc_roc(spark, sf_dir):
    """Exact ROC-AUC of the stopword-ratio quality score against the
    lexical-diversity label (the pair pipeline_score_calibration
    audits): AUC = P(score_pos > score_neg) + P(tie)/2 = U/(n_pos*n_neg)
    — the Mann-Whitney identity, so the computation is
    ab_mann_whitney_u's machinery pointed at (label, score): a
    (score -> class counts) rollup, a running below-count through
    stitched_prefix_sum, and 2*U as a BIGINT. The single final division
    is the only double; the one-class boundary is guarded NULL in both
    engines. This is the threshold-free companion of the calibration
    audit: calibration says whether the score MEANS what it claims,
    AUC says whether it RANKS at all.

    100 TB posture: identical to ab_mann_whitney_u — one domain-sized
    hash rollup, bucketed CDF counter, constant-size tail."""
    from river_spark.operators.stitched_lag import stitched_prefix_sum

    t = tbl(spark, sf_dir, "documents").select(
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("toks"),
        F.size(
            F.expr(f"filter(split(trim(text), '\\\\s+'), x -> x IN ({_SW_SQL}))")
        )
        .cast("bigint")
        .alias("sw"),
        F.size(F.array_distinct(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("bigint")
        .alias("dtoks"),
    )
    scored = t.filter(F.col("toks") > 0).select(
        F.expr("sw * 1000000 div toks").alias("q_micro"),
        F.when(2 * F.col("dtoks") > F.col("toks"), F.lit(1).cast("bigint"))
        .otherwise(F.lit(0).cast("bigint"))
        .alias("label"),
    )
    v = scored.groupBy("q_micro").agg(
        F.sum("label").alias("np_"),
        F.sum(1 - F.col("label")).alias("nn"),
    )
    c = stitched_prefix_sum(
        v,
        key_cols=[],
        order_cols=["q_micro"],
        value_col="nn",
        bucket=F.expr("q_micro div 100000"),
        out_col="cumn_incl",
    ).withColumn("cumn_below", F.col("cumn_incl") - F.col("nn"))
    s = c.agg(
        F.sum("np_").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.sum(F.col("np_") * (2 * F.col("cumn_below") + F.col("nn"))).alias("u_x2"),
    )
    return s.select(
        "n_pos",
        "n_neg",
        "u_x2",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.col("u_x2").cast("double")
            / (2 * F.col("n_pos").cast("double") * F.col("n_neg").cast("double")),
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# Audience overlap between event types (exact Jaccard over user sets)
# ---------------------------------------------------------------------------
@q(
    "ev_audience_overlap",
    oracle="""
    WITH ut AS (
        SELECT DISTINCT event_type, user_id FROM events),
    sz AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
        FROM ut GROUP BY event_type),
    inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2)
    SELECT type_a, type_b, n_both,
           sa.n_users AS n_a, sb.n_users AS n_b,
           CAST(n_both AS DOUBLE)
             / (sa.n_users + sb.n_users - n_both) AS jaccard
    FROM inter
    JOIN sz sa ON sa.event_type = type_a
    JOIN sz sb ON sb.event_type = type_b
    """,
    tags=("events", "audience", "jaccard", "exact"),
)
def ev_audience_overlap(spark, sf_dir):
    """Audience overlap matrix: exact Jaccard between the user sets of
    every event-type pair — the audience-planning readout (which
    behaviors share users) and the exact baseline agg_bitmap_audience's
    bitmap algebra approximates. Intersections count DISTINCT users per
    (type, user) once, so the self-join fan-out per user is bounded by
    |types|^2, never by that user's event count; sizes and
    intersections are BIGINTs, the Jaccard is one division of exact
    integers per pair.

    100 TB posture: events reduce to ONE distinct (type, user) rollup
    (map-side partial); the intersection self-join co-partitions on
    user_id with <= |types| rows per key; every post-rollup relation is
    |types|- or |types|^2-sized."""
    ut = tbl(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    sz = ut.groupBy("event_type").agg(F.count("*").alias("n_users"))
    a = ut.select(F.col("event_type").alias("type_a"), "user_id")
    b = ut.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, ["user_id"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    return (
        inter.join(sz.select(F.col("event_type").alias("type_a"),
                             F.col("n_users").alias("n_a")), "type_a")
        .join(sz.select(F.col("event_type").alias("type_b"),
                        F.col("n_users").alias("n_b")), "type_b")
        .select(
            "type_a", "type_b", "n_both", "n_a", "n_b",
            (
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both"))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the co-purchase graph
# ---------------------------------------------------------------------------
@q(
    "graph_assortativity",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS (
        SELECT a.p AS pa, b.p AS pb
        FROM ob a JOIN ob b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= 2),
    und AS (
        SELECT pa AS u, pb AS v FROM e
        UNION ALL SELECT pb AS u, pa AS v FROM e),
    deg AS (SELECT u AS nid, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY 1),
    ed AS (
        SELECT du.d AS x, dv.d AS y
        FROM und
        JOIN deg du ON du.nid = und.u
        JOIN deg dv ON dv.nid = und.v),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM ed)
    SELECT n AS n_directed_edges, sx AS sum_deg, sxx AS sum_deg_sq, sxy,
           CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           END AS assortativity
    FROM s
    """,
    tags=("graph", "stats", "exact"),
)
def graph_assortativity(spark, sf_dir):
    """Degree assortativity of the co-purchase graph (same >= 2-support
    edge set as graph_triangle_count): Pearson correlation of endpoint
    degrees over every DIRECTED edge — positive means hubs link hubs
    (social-network-like), negative means hub-and-spoke. Exact integer
    sufficient statistics over the edge list (the agg_corr_exact
    closed form; both directions of each edge are included, which IS
    Newman's definition and also makes sx = sy by construction); the
    constant-degree boundary (every node equal degree) is guarded NULL
    in both engines.

    100 TB posture: degrees are one |V|-sized rollup joined twice onto
    the edge list on its natural keys; the sufficient statistics are
    one map-side-combinable aggregation. No orientation trick needed —
    unlike triangles, assortativity never expands wedges, so the plan
    is linear in |E|."""
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ob = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    a, b = ob.alias("a"), ob.alias("b")
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= 2)
        .select("pa", "pb")
    )
    und = e.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionByName(
        e.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = und.groupBy(F.col("u").alias("nid")).agg(F.count("*").alias("d"))
    ed = (
        und.join(deg.select(F.col("nid").alias("u"), F.col("d").alias("x")), "u")
        .join(deg.select(F.col("nid").alias("v"), F.col("d").alias("y")), "v")
        .select("x", "y")
    )
    s = ed.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    return s.select(
        F.col("n").alias("n_directed_edges"),
        F.col("sx").alias("sum_deg"),
        F.col("sxx").alias("sum_deg_sq"),
        "sxy",
        F.when(
            nd * sxx - sx * sx > 0,
            (nd * sxy - sx * sy)
            / (F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)),
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# Forward as-of join: time to next conversion
# ---------------------------------------------------------------------------
@q(
    "ev_asof_forward",
    oracle="""
    WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    nxt AS (
        SELECT c.event_id, c.ts AS cts, min(p.ts) AS pts
        FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.ts >= c.ts
        GROUP BY c.event_id, c.ts)
    SELECT event_id,
           CAST(date_diff('microsecond', cts, pts) AS BIGINT)
               AS next_purchase_delta_us
    FROM nxt
    """,
    tags=("events", "asof_join", "forward"),
)
def ev_asof_forward(spark, sf_dir):
    """FORWARD as-of join — time from each click to the SAME user's
    next purchase (NULL if none): the time-to-conversion readout, and
    the registry's first exercise of operators/asof.py's
    direction='forward' path under the oracle gate (backward was
    ev_asof_join; forward had only property tests). The matched payload
    is the purchase TIMESTAMP, so equal-ts purchase ties are
    pick-invariant — the delta is identical whichever row a
    tie-breaking implementation selects.

    100 TB posture: same union+ordered-window shape as the backward
    operator — ONE shuffle of |clicks|+|purchases| on user_id, a
    per-partition sort, whole-stage codegen; the oracle's
    min-over-inequality join is the fixture-scale spec, not the plan."""
    from river_spark.operators.asof import asof_join

    ev = events_tbl(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts")
    )
    joined = asof_join(
        clicks,
        purchases,
        left_on="user_id",
        right_on="p_user_id",
        left_ts="ts",
        right_ts="p_ts",
        right_cols=["p_ts"],
        direction="forward",
    )
    return joined.select(
        "event_id",
        F.expr("timestampdiff(MICROSECOND, ts, p_ts)")
        .cast("bigint")
        .alias("next_purchase_delta_us"),
    )
