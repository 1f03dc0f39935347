"""Curation wave 11 (round 10): corpus redundancy and layout audits —
exact-dup rate per source, hash-bucket balance, Simpson lexical
diversity, and the distinct-bigram compression proxy.

Bit-exactness rules (tests/test_oracle.py): exact integer counts with
at most ONE final IEEE division per output column; the bucket hash is
the pinned md5 idiom (Spark conv(substring(md5..)) == DuckDB
CAST('0x'||substr(md5..))); vocab statistics use BIGRAMS (the cookbook
synthetic-data note: the unigram vocab is ~60 words and saturates).

Reference parity: none — training-data curation over the reference's
ingested-parquet data model.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import tbl


@q(
    "pipeline_dedup_rate_by_source",
    oracle="""
    WITH d AS (
        SELECT source, count(*) AS n_docs,
               count(DISTINCT md5(text)) AS n_unique
        FROM documents GROUP BY source)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_unique AS BIGINT) AS n_unique,
           CAST(n_docs - n_unique AS DOUBLE) / n_docs AS dup_rate
    FROM d
    """,
    tags=("pipeline", "dedup", "audit"),
)
def pipeline_dedup_rate_by_source(spark, sf_dir):
    """Exact-duplicate rate per source — the first number a curation run
    reports per provider (a crawler whose dup_rate jumps is re-fetching
    or being mirrored). Identity is md5(text) so the distinct-count
    shuffle moves 32-byte digests, never document bodies; counts are
    exact and the rate is one division.

    100 TB posture: hash-groupBy on (source) with a distinct-digest
    count — partial-aggregatable, no text shuffle (dedup_exact's
    design, summarized per source)."""
    d = tbl(spark, sf_dir, "documents").groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
    )
    return d.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_unique").cast("long").alias("n_unique"),
        ((F.col("n_docs") - F.col("n_unique")).cast("double") / F.col("n_docs")).alias(
            "dup_rate"
        ),
    )


@q(
    "pipeline_bucket_balance",
    oracle="""
    WITH b AS (
        SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
                 % 32 AS bucket
        FROM documents),
    c AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket)
    SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(min(n) AS BIGINT) AS min_rows,
           CAST(max(n) AS BIGINT) AS max_rows,
           CAST(sum(n) AS BIGINT) AS total_rows,
           CAST(max(n) * count(*) AS DOUBLE) / sum(n) AS skew
    FROM c
    """,
    tags=("pipeline", "layout", "audit"),
)
def pipeline_bucket_balance(spark, sf_dir):
    """Bucket-balance audit for the 32-way hash layout a bucketed write
    would use (storage.py's lever): rows per md5 bucket, plus skew =
    max_bucket * n_buckets / total (1.0 = perfectly even; the number
    that predicts the straggler task at write time). The md5-prefix
    bucket is the pinned cross-engine hash idiom; everything is exact
    integers except the one final division.

    100 TB posture: one hash agg on 32 keys, then a scalar rollup —
    the audit is O(buckets) regardless of corpus size."""
    b = tbl(spark, sf_dir, "documents").select(
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long")
            % 32
        ).alias("bucket")
    )
    c = b.groupBy("bucket").agg(F.count("*").alias("n"))
    return c.agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.min("n").cast("long").alias("min_rows"),
        F.max("n").cast("long").alias("max_rows"),
        F.sum("n").cast("long").alias("total_rows"),
        ((F.max("n") * F.count("*")).cast("double") / F.sum("n")).alias("skew"),
    )


@q(
    "text_simpson_diversity",
    oracle="""
    WITH tok AS (
        SELECT source, lower(t) AS tok
        FROM documents, UNNEST(string_split_regex(trim(text), '\\s+')) AS x(t)),
    c AS (SELECT source, tok, count(*) AS n FROM tok GROUP BY 1, 2),
    s AS (SELECT source, sum(n) AS tot, sum(n * (n - 1)) AS pairs,
                 count(*) AS vocab
          FROM c GROUP BY 1)
    SELECT source, CAST(vocab AS BIGINT) AS vocab,
           CAST(tot AS BIGINT) AS n_tokens,
           CAST(pairs AS DOUBLE) / nullif(tot * (tot - 1), 0) AS simpson
    FROM s
    """,
    tags=("text", "diversity", "stats"),
)
def text_simpson_diversity(spark, sf_dir):
    """Simpson concentration index per source: the probability two
    tokens drawn without replacement are the SAME type — the
    exact-integer diversity measure (sum n(n-1) / N(N-1)) that
    complements the entropy family with zero transcendental functions:
    every accumulator is an exact BIGINT and the index is one division —
    nullif-guarded in both engines for the N = 1 boundary (a
    single-token source divides by zero, which ANSI Spark would THROW
    and DuckDB would NULL; the shared guard makes both NULL).

    100 TB posture: token-grain hash agg (map-side combinable), then a
    vocab-grain rollup per source."""
    toks = (
        tbl(spark, sf_dir, "documents")
        .select("source", F.explode(F.split(F.trim("text"), r"\s+")).alias("t"))
        .select("source", F.lower("t").alias("tok"))
    )
    c = toks.groupBy("source", "tok").agg(F.count("*").alias("n"))
    s = c.groupBy("source").agg(
        F.sum("n").alias("tot"),
        F.sum(F.col("n") * (F.col("n") - 1)).alias("pairs"),
        F.count("*").alias("vocab"),
    )
    return s.select(
        "source",
        F.col("vocab").cast("long").alias("vocab"),
        F.col("tot").cast("long").alias("n_tokens"),
        (
            F.col("pairs").cast("double")
            / F.nullif(F.col("tot") * (F.col("tot") - 1), F.lit(0))
        ).alias("simpson"),
    )


@q(
    "text_compression_proxy",
    oracle="""
    WITH t AS (
        SELECT doc_id, source,
               string_split_regex(trim(text), '\\s+') AS toks
        FROM documents),
    bg AS (
        SELECT source, lower(toks[i + 1]) || ' ' || lower(toks[i + 2]) AS bg
        FROM t, UNNEST(generate_series(0, len(toks) - 2)) AS x(i)
        WHERE len(toks) >= 2)
    SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(count(DISTINCT bg) AS BIGINT) AS n_distinct,
           CAST(count(DISTINCT bg) AS DOUBLE) / count(*) AS distinct_ratio
    FROM bg GROUP BY source
    """,
    tags=("text", "redundancy", "stats"),
)
def text_compression_proxy(spark, sf_dir):
    """Distinct-bigram ratio per source — the cheap compressibility /
    redundancy proxy (a source whose ratio collapses is template spam;
    near-1.0 is fresh text). BIGRAMS, not unigrams, per the cookbook's
    synthetic-vocab note. Exact integer counts, one division.

    100 TB posture: bigram explode -> per-source exact distinct; at
    extreme scale the distinct swaps for an HLL sketch
    (agg_hll_sketch's operator) — the exact form IS the oracle-checked
    contract here."""
    t = tbl(spark, sf_dir, "documents").select(
        "source", F.split(F.trim("text"), r"\s+").alias("toks")
    )
    bg = (
        t.filter(F.size("toks") >= 2)
        .select(
            "source",
            F.explode(F.sequence(F.lit(0), F.size("toks") - 2)).alias("i"),
            "toks",
        )
        .select(
            "source",
            F.concat(
                F.lower(F.element_at("toks", F.col("i") + 1)),
                F.lit(" "),
                F.lower(F.element_at("toks", F.col("i") + 2)),
            ).alias("bg"),
        )
    )
    return bg.groupBy("source").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.countDistinct("bg").cast("long").alias("n_distinct"),
        (F.countDistinct("bg").cast("double") / F.count("*")).alias("distinct_ratio"),
    )
