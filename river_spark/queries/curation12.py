"""Curation wave 12 (round 11): dedup-parameter tuning audits.

The dedup operators carry two load-bearing knobs — the inverted-index
document-frequency cap (stop-shingle guard) and the Jaccard operating
threshold. Both were chosen by inspection; these queries are the
audits that choose them from DATA, the same way a production pipeline
would before a 100 TB run:

- ``dedup_shingle_df_profile``: power-of-two histogram of shingle
  document frequencies — the curve that shows where the df_cap can sit
  (everything above the knee is a stop-shingle whose pair fan-out is
  quadratic and whose dedup signal is zero).
- ``dedup_threshold_sweep``: candidate-pair counts per Jaccard band
  over the SAME candidate set the exact detector enumerates — the
  threshold-tuning curve (how many pairs each operating point would
  accept). The band is computed by INTEGER division ((inter*20) div
  union), so banding is exact in both engines.

Bit-exactness: counts and bands are BIGINTs end to end; the log2 band
uses the binary-string-length trick (length(bin(x))-1), never libm.

Reference parity: the reference engine (pbotros/river) has no
relational layer (its surface is the stream transport,
/root/reference/cpp/src/writer.cpp); these extend the analytics
surface the brief requires.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import tbl

_SWEEP_DF_CAP = 100_000  # mirrors dedup_ngram_jaccard's default


@q(
    "dedup_shingle_df_profile",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS g(i)),
    df AS (
        SELECT s, CAST(count(*) AS BIGINT) AS d FROM sh GROUP BY s)
    SELECT length(printf('%b', d)) - 1 AS log2_df_band,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(d) AS BIGINT) AS n_doc_slots,
           CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_pair_emissions
    FROM df GROUP BY 1
    """,
    tags=("dedup", "tuning", "histogram"),
)
def dedup_shingle_df_profile(spark, sf_dir):
    """Document-frequency profile of the 3-token shingle universe,
    log2-banded: band k holds shingles appearing in [2^k, 2^(k+1))
    docs. ``n_pair_emissions`` = sum over the band of d*(d-1)/2 is the
    EXACT pair fan-out the inverted index would pay for those shingles
    — the curve that justifies the df_cap: the top bands contribute
    almost all candidate pairs and almost no dedup signal (a shingle in
    10^6 docs is boilerplate, not duplication). floor(log2(d)) uses the
    binary-string-length trick (agg_log2_value_histogram's cookbook
    rule), never libm.

    100 TB posture: shingle stream -> one distinct -> one (shingle)
    hash agg -> one ~30-key band agg; all partial-aggregatable, no
    joins, and the profile runs BEFORE any pair enumeration, so it is
    safe to compute on a corpus whose stop-shingles would explode the
    index itself."""
    from river_spark.operators.dedup import shingles

    sh = shingles(
        tbl(spark, sf_dir, "documents"), "doc_id", "text", n=3,
        hashed=True, distinct=True,
    )
    df = sh.groupBy("shingle").agg(F.count("*").alias("d"))
    return df.groupBy(
        (F.length(F.bin("d")) - 1).cast("long").alias("log2_df_band")
    ).agg(
        F.count("*").alias("n_shingles"),
        F.sum("d").alias("n_doc_slots"),
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_pair_emissions"),
    )


@q(
    "dedup_threshold_sweep",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS g(i)),
    cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c FROM sh GROUP BY doc_id),
    pair AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    banded AS (
        SELECT (inter * 20) // (ca.c + cb.c - inter) AS band
        FROM pair
        JOIN cnt ca ON ca.doc_id = doc_a
        JOIN cnt cb ON cb.doc_id = doc_b)
    SELECT CAST(band AS BIGINT) AS jaccard_band,
           CAST(band AS DOUBLE) / 20 AS band_lo,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM banded GROUP BY band
    """,
    tags=("dedup", "tuning", "jaccard"),
)
def dedup_threshold_sweep(spark, sf_dir):
    """Candidate-pair counts per Jaccard band over the exact candidate
    set dedup_ngram_jaccard enumerates — the threshold-tuning curve: an
    operating point at 0.05 accepts the sum of bands >= 1, at 0.5 the
    sum of bands >= 10. The band is pure INTEGER division
    ((inter*20) div union) so banding never straddles a float boundary
    differently per engine; band_lo is the band's lower edge as a
    single exact division for readability.

    100 TB posture: identical plan skeleton to dedup_ngram_jaccard
    (df-capped inverted index, in-index pair expansion, window-phased
    skew guard via operators/dedup._shingle_pair_counts) with the
    threshold filter REPLACED by a ~21-key hash agg — the sweep costs
    one aggregation more than a single dedup run and prices every
    operating point at once."""
    from river_spark.operators.dedup import _shingle_pair_counts

    pairs = _shingle_pair_counts(
        tbl(spark, sf_dir, "documents"), "doc_id", "text",
        n=3, df_cap=_SWEEP_DF_CAP,
    )
    banded = pairs.select(
        F.expr("inter * 20 div (ca + cb - inter)").alias("band")
    )
    g = banded.groupBy(F.col("band").cast("long").alias("jaccard_band")).agg(
        F.count("*").alias("n_pairs")
    )
    return g.select(
        "jaccard_band",
        (F.col("jaccard_band").cast("double") / 20).alias("band_lo"),
        "n_pairs",
    )


# ---------------------------------------------------------------------------
# Exact IQR outlier audit through the distributed-selection operator
# ---------------------------------------------------------------------------
@q(
    "dq_length_iqr_outliers",
    oracle="""
    WITH r AS (
        SELECT source, n_chars,
               row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rk,
               count(*) OVER (PARTITION BY source) AS n
        FROM documents),
    qs AS (
        SELECT source,
               CAST(max(n) AS BIGINT) AS n_docs,
               CAST(max(CASE WHEN rk = (n + 3) // 4 THEN n_chars END) AS BIGINT) AS q1,
               CAST(max(CASE WHEN rk = (n + 1) // 2 THEN n_chars END) AS BIGINT) AS median,
               CAST(max(CASE WHEN rk = (3 * n + 1) // 4 THEN n_chars END) AS BIGINT) AS q3
        FROM r GROUP BY source)
    SELECT d.source, qs.n_docs, qs.q1, qs.median, qs.q3,
           CAST(sum(CASE WHEN 2 * d.n_chars < 2 * qs.q1 - 3 * (qs.q3 - qs.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
           CAST(sum(CASE WHEN 2 * d.n_chars > 2 * qs.q3 + 3 * (qs.q3 - qs.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
    FROM documents d JOIN qs ON qs.source = d.source
    GROUP BY d.source, qs.n_docs, qs.q1, qs.median, qs.q3
    """,
    tags=("dq", "quality", "selection", "exact"),
)
def dq_length_iqr_outliers(spark, sf_dir):
    """Exact per-source IQR length audit — quartiles as EXACT order
    statistics (ranks (n+3) div 4, (n+1) div 2, (3n+1) div 4 — fixed
    lower-rank conventions, no interpolation) computed through
    operators/selection.grouped_order_statistics, the distributed-selection
    operator's second oracle-gated consumer after ev_mad_outliers. The
    Tukey fences are kept in integers (2*v vs 2*q1 - 3*IQR) so the
    1.5x multiplier never touches a double; outlier counts are
    BIGINTs.

    100 TB posture: ALL THREE quartiles share one stats pass, one
    value-range bucketing, and one per-(key, bucket) rollup
    (grouped_order_statistics; only ~n/1024 rows of each straddling
    bucket are ever rank-windowed), so the quartile trio costs the same
    two data passes as a single median; the stats join back as a
    |sources|-row relation AQE broadcasts unhinted; the final count is
    one partial-aggregatable scan. The oracle's per-source row_number
    window is the fixture-scale spec, not the plan."""
    from river_spark.operators.selection import grouped_order_statistics

    docs = tbl(spark, sf_dir, "documents").select("source", "n_chars")
    qs = grouped_order_statistics(
        docs,
        ["source"],
        "n_chars",
        ks=[
            ("q1", F.expr("(_ks_n + 3) div 4")),
            ("median", F.expr("(_ks_n + 1) div 2")),
            ("q3", F.expr("(3 * _ks_n + 1) div 4")),
        ],
    )
    n = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    stats = n.join(qs, "source")
    joined = docs.join(stats, "source")
    iqr3 = 3 * (F.col("q3") - F.col("q1"))
    return joined.groupBy("source", "n_docs", "q1", "median", "q3").agg(
        F.sum(
            F.when(2 * F.col("n_chars") < 2 * F.col("q1") - iqr3, 1).otherwise(0)
        ).alias("n_low_outliers"),
        F.sum(
            F.when(2 * F.col("n_chars") > 2 * F.col("q3") + iqr3, 1).otherwise(0)
        ).alias("n_high_outliers"),
    )
