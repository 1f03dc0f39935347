"""Text-analysis + dedup operators over the ``documents`` table — the
training-data-pipeline surface (language ID, quality scoring, token
counting, fingerprinting, exact + n-gram-Jaccard dedup). All built from
JVM-side ``pyspark.sql.functions`` (no Python UDFs in these paths);
MinHash/SimHash live in operators/dedup.py with rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import tbl

_STOPWORDS = ("the", "a", "an", "of", "and", "or", "to", "in", "is", "for")
_SW_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


def _tokens(col="text"):
    return F.split(F.trim(F.col(col)), r"\s+")


@q(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT)                                  AS n_chars_text,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                t -> t IN ({_SW_SQL}))) AS BIGINT)        AS n_stopwords
    FROM documents
    """,
    tags=("text",),
)
def text_token_stats(spark, sf_dir):
    toks = _tokens()
    return tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_text"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.expr(f"filter(split(trim(text), '\\\\s+'), t -> t IN ({_SW_SQL}))"))
        .cast("long")
        .alias("n_stopwords"),
    )


@q(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CAST(length(text) AS DOUBLE) AS n,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS toks,
               CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                    x -> x IN ({_SW_SQL}))) AS DOUBLE) AS sw,
               CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) AS punct
        FROM documents)
    SELECT doc_id,
           punct / n                        AS punct_ratio,
           sw / toks                        AS stopword_ratio,
           (n - toks + 1) / toks            AS avg_word_len,
           CASE WHEN toks >= 20 AND sw / toks BETWEEN 0.05 AND 0.6 AND punct / n < 0.1
                THEN 1 ELSE 0 END           AS quality_pass
    FROM t
    """,
    tags=("text", "quality"),
)
def text_quality_score(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").cast("double").alias("n"),
        F.size(_tokens()).cast("double").alias("toks"),
        F.size(F.expr(f"filter(split(trim(text), '\\\\s+'), x -> x IN ({_SW_SQL}))"))
        .cast("double")
        .alias("sw"),
        F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")).cast("double").alias("punct"),
    )
    return d.select(
        "doc_id",
        (F.col("punct") / F.col("n")).alias("punct_ratio"),
        (F.col("sw") / F.col("toks")).alias("stopword_ratio"),
        ((F.col("n") - F.col("toks") + 1) / F.col("toks")).alias("avg_word_len"),
        F.when(
            (F.col("toks") >= 20)
            & (F.col("sw") / F.col("toks")).between(0.05, 0.6)
            & (F.col("punct") / F.col("n") < 0.1),
            1,
        )
        .otherwise(0)
        .alias("quality_pass"),
    )


_LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "und"),
    "fr": ("le", "les", "des"),
}


def _marker_count_sql(words):
    inner = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x IN ({inner})))"


def _marker_count_spark(words):
    inner = ", ".join(f"'{w}'" for w in words)
    return F.size(F.expr(f"filter(split(trim(lower(text)), '\\\\s+'), x -> x IN ({inner}))"))


@q(
    "text_lang_id",
    oracle=f"""
    WITH s AS (
        SELECT doc_id,
               {_marker_count_sql(_LANG_MARKERS["en"])} AS c_en,
               {_marker_count_sql(_LANG_MARKERS["es"])} AS c_es,
               {_marker_count_sql(_LANG_MARKERS["de"])} AS c_de,
               {_marker_count_sql(_LANG_MARKERS["fr"])} AS c_fr
        FROM documents)
    SELECT doc_id,
           CASE WHEN c_en = 0 AND c_es = 0 AND c_de = 0 AND c_fr = 0 THEN 'und'
                WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
                WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
                WHEN c_de >= c_fr THEN 'de'
                ELSE 'fr' END AS lang_guess
    FROM s
    """,
    tags=("text", "langid"),
)
def text_lang_id(spark, sf_dir):
    """Marker-stopword language ID — deterministic argmax with fixed
    priority en>es>de>fr on ties."""
    d = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        _marker_count_spark(_LANG_MARKERS["en"]).alias("c_en"),
        _marker_count_spark(_LANG_MARKERS["es"]).alias("c_es"),
        _marker_count_spark(_LANG_MARKERS["de"]).alias("c_de"),
        _marker_count_spark(_LANG_MARKERS["fr"]).alias("c_fr"),
    )
    return d.select(
        "doc_id",
        F.when(
            (F.col("c_en") == 0) & (F.col("c_es") == 0) & (F.col("c_de") == 0) & (F.col("c_fr") == 0),
            "und",
        )
        .when(
            (F.col("c_en") >= F.col("c_es")) & (F.col("c_en") >= F.col("c_de")) & (F.col("c_en") >= F.col("c_fr")),
            "en",
        )
        .when((F.col("c_es") >= F.col("c_de")) & (F.col("c_es") >= F.col("c_fr")), "es")
        .when(F.col("c_de") >= F.col("c_fr"), "de")
        .otherwise("fr")
        .alias("lang_guess"),
    )


@q(
    "text_fingerprint",
    oracle="""
    SELECT doc_id, md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark, sf_dir):
    return tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.lower(F.regexp_replace("text", r"\s+", " "))).alias("fp"),
    )


@q(
    "dedup_exact",
    oracle="""
    SELECT md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp,
           min(doc_id) AS keep_doc_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
    tags=("dedup",),
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on a normalized fingerprint, keep the
    lowest doc_id. At 100 TB this is one shuffle on the 128-bit hash."""
    return (
        tbl(spark, sf_dir, "documents")
        .select("doc_id", F.md5(F.lower(F.regexp_replace("text", r"\s+", " "))).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


# BPE-style pre-tokenizer (GPT-2 lineage, lookahead-free so both Java
# regex and DuckDB's RE2 agree): contraction suffixes, space-prefixed
# letter runs, digit runs, punctuation runs, whitespace runs.
_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"
_BPE_SQL = _BPE_PAT.replace("'", "''")
_ALPHA_PAT = r"^ ?[a-zA-Z]+$"
_DIGIT_PAT = r"^ ?[0-9]+$"


@q(
    "text_bpe_tokens",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, regexp_extract_all(text, '{_BPE_SQL}') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_bpe_tokens,
           CAST(len(list_filter(toks, x -> regexp_matches(x, '{_ALPHA_PAT}'))) AS BIGINT) AS n_alpha_tokens,
           CAST(len(list_filter(toks, x -> regexp_matches(x, '{_DIGIT_PAT}'))) AS BIGINT) AS n_digit_tokens
    FROM t
    """,
    tags=("text", "tokenize"),
)
def text_bpe_tokens(spark, sf_dir):
    """BPE-ish token counting: a GPT-2-style pre-tokenizer regex (without
    the lookahead, so RE2/Java semantics coincide) splits text into
    contraction/letter/digit/punct/whitespace runs. One regexp pass per
    doc, all JVM-side — the per-doc token count a data pipeline budgets
    context windows with."""
    d = tbl(spark, sf_dir, "documents").select(
        "doc_id", F.regexp_extract_all(F.col("text"), F.lit(_BPE_PAT), 0).alias("toks")
    )
    return d.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_bpe_tokens"),
        F.size(F.expr(f"filter(toks, x -> x rlike '{_ALPHA_PAT}')")).cast("long").alias("n_alpha_tokens"),
        F.size(F.expr(f"filter(toks, x -> x rlike '{_DIGIT_PAT}')")).cast("long").alias("n_digit_tokens"),
    )


# Polynomial rolling hash over 5-char windows of the normalized text:
# h(i) = Σ_j ord(s[i+j])·257^j mod (2³¹−1). Same integer arithmetic in
# Spark and DuckDB, so the oracle matches bit-for-bit. Normalization
# strips to [a-z0-9 ] first so ord()/ascii() agree (pure ASCII).
_B = [257**j for j in range(5)]
_M = 2147483647


@q(
    "text_rolling_fingerprint",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS s
        FROM documents),
    h AS (
        SELECT doc_id,
               CASE WHEN length(s) >= 5 THEN
                 list_transform(generate_series(1, length(s) - 4),
                   i -> ({" + ".join(f"ord(s[i+{j}]) * {_B[j]}" for j in range(5))}) % {_M})
               ELSE [] END AS hs
        FROM t)
    SELECT doc_id,
           CAST(len(hs) AS BIGINT) AS n_windows,
           CAST(len(list_distinct(hs)) AS BIGINT) AS n_distinct,
           CASE WHEN len(hs) > 0 THEN list_aggregate(hs, 'min') ELSE NULL END AS min_hash
    FROM h
    """,
    tags=("text", "fingerprint"),
)
def text_rolling_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprint (the winnowing primitive): every
    5-gram of the normalized text gets a polynomial hash; the per-doc
    minimum is the fingerprint, window/distinct counts describe content
    size. All higher-order-function arithmetic, no Python in the path."""
    poly = " + ".join(f"ascii(substring(s, i + {j}, 1)) * {_B[j]}L" for j in range(5))
    d = tbl(spark, sf_dir, "documents").select(
        "doc_id", F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "").alias("s")
    )
    h = d.select(
        "doc_id",
        F.expr(
            f"CASE WHEN length(s) >= 5 THEN transform(sequence(1, length(s) - 4), i -> ({poly}) % {_M}L) "
            "ELSE cast(array() as array<bigint>) END"
        ).alias("hs"),
    )
    return h.select(
        "doc_id",
        F.size("hs").cast("long").alias("n_windows"),
        F.size(F.array_distinct("hs")).cast("long").alias("n_distinct"),
        F.when(F.size("hs") > 0, F.array_min("hs")).alias("min_hash"),
    )


@q(
    "dedup_ngram_jaccard",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM documents),
    sh AS (
        -- mirror operators/dedup.shingles(): lowercase, and short docs
        -- (< n tokens) produce one truncated shingle (slice clamps)
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
    WHERE inter * 1.0 / (ca.c + cb.c - inter) >= 0.05
    """,
    tags=("dedup", "jaccard"),
    bench=True,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-token-shingle Jaccard near-dup pairs (threshold 0.05).
    Shingle inverted index with a document-frequency cap (stop-shingle
    guard) and in-index pair expansion — see
    operators/dedup.ngram_jaccard_pairs for the scale analysis. The
    df_cap default (100k) is far above any testdata shingle's document
    frequency, so the oracle remains exact here."""
    from river_spark.operators.dedup import ngram_jaccard_pairs

    docs = tbl(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.05)


@q(
    "text_lang_id_eval",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, lang,
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
        FROM s)
    SELECT lang, lang_guess,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN lang = lang_guess THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct
    FROM g GROUP BY lang, lang_guess
    """,
    tags=("text", "langid", "evaluation"),
)
def text_lang_id_eval(spark, sf_dir):
    """Confusion matrix of the marker-stopword language-ID heuristic
    against the stored ground-truth labels — the evaluation gate for a
    heuristic classifier, the text-side sibling of emb_ann_recall's
    recall gate: a change to the marker lists or the tie priority
    moves INTEGER cells of this matrix instead of silently flipping a
    pass/fail elsewhere. The corpus deliberately contains a language
    (zh) the heuristic has no markers for, so the matrix exposes the
    honest failure mode (zh mass lands in 'und' or bleeds into marker
    collisions) rather than reporting vacuous 100% accuracy.

    100 TB posture: the guess is the same zero-shuffle map expression
    as text_lang_id; the matrix is one hash agg over
    (label, guess) — at most |langs|² rows."""
    d = tbl(spark, sf_dir, "documents").select(
        "doc_id",
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
    return (
        d.select("lang", guess.alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(F.col("lang") == F.col("lang_guess"), 1).otherwise(0)
            ).alias("n_correct"),
        )
    )
