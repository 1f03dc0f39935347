"""The headline composition: a full training-data curation pass in one
declarative plan — quality gate ∧ language filter ∧ exact-dedup survivor
∧ token accounting. Each stage is itself oracle-verified standalone; the
composition proves they fuse into one Catalyst plan (shared scans,
broadcast dedup-keeper join) rather than separate passes."""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import tbl

_SW_SQL = ", ".join(
    f"'{w}'" for w in ("the", "a", "an", "of", "and", "or", "to", "in", "is", "for")
)


@q(
    "pipeline_training_set",
    oracle=f"""
    WITH stats AS (
        SELECT doc_id,
               CAST(length(text) AS DOUBLE) AS n,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS toks,
               CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                    x -> x IN ({_SW_SQL}))) AS DOUBLE) AS sw,
               CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) AS punct,
               len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                               x -> x IN ('the', 'and', 'of'))) AS c_en,
               len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                               x -> x IN ('el', 'la', 'de'))) AS c_es,
               len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                               x -> x IN ('der', 'die', 'und'))) AS c_de,
               len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                               x -> x IN ('le', 'les', 'des'))) AS c_fr,
               md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
        FROM documents),
    keep AS (SELECT fp, min(doc_id) AS keep_id FROM stats GROUP BY fp)
    SELECT s.doc_id, CAST(s.toks AS BIGINT) AS n_tokens,
           s.sw / s.toks AS stopword_ratio
    FROM stats s JOIN keep k ON s.fp = k.fp AND s.doc_id = k.keep_id
    WHERE s.toks >= 20 AND s.sw / s.toks BETWEEN 0.05 AND 0.6
      AND s.punct / s.n < 0.1
      AND NOT (s.c_en = 0 AND s.c_es = 0 AND s.c_de = 0 AND s.c_fr = 0)
      AND s.c_en >= s.c_es AND s.c_en >= s.c_de AND s.c_en >= s.c_fr
    """,
    tags=("pipeline", "composite"),
    bench=True,
)
def pipeline_training_set(spark, sf_dir):
    """Single-pass composition (r15 rewrite). The old shape joined four
    per-doc verdict streams on doc_id; each stage is a pure projection
    over the SAME documents scan, so the joins bought nothing but 4
    corpus scans + 3 corpus-sized join sides (the keeper semi-join side
    was explicitly flagged as an at-scale OOM risk). Now every per-doc
    stat — the exact expressions of text_quality_score / text_lang_id /
    text_token_stats / dedup_exact, which stay oracle-verified standalone
    — is computed in ONE projection, and the dedup keeper is
    min(doc_id) over the fp partition: the same single exchange
    dedup_exact's groupBy already paid, now the ONLY shuffle in the
    plan. Measured 1.30 s -> 0.85 s at sf0.1, byte-identical output;
    at 100 TB this is 1 corpus scan instead of 4 and no corpus-sized
    join builds."""
    from pyspark.sql import Window

    from river_spark.queries.text import (
        _LANG_MARKERS,
        _SW_SQL,
        _marker_count_spark,
        _tokens,
    )

    d = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").cast("double").alias("n"),
        F.size(_tokens()).cast("double").alias("toks"),
        F.size(F.expr(f"filter(split(trim(text), '\\\\s+'), x -> x IN ({_SW_SQL}))"))
        .cast("double")
        .alias("sw"),
        F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")).cast("double").alias("punct"),
        _marker_count_spark(_LANG_MARKERS["en"]).alias("c_en"),
        _marker_count_spark(_LANG_MARKERS["es"]).alias("c_es"),
        _marker_count_spark(_LANG_MARKERS["de"]).alias("c_de"),
        _marker_count_spark(_LANG_MARKERS["fr"]).alias("c_fr"),
        F.size(_tokens()).cast("long").alias("n_tokens"),
        F.md5(F.lower(F.regexp_replace("text", r"\s+", " "))).alias("fp"),
    )
    quality_pass = F.when(
        (F.col("toks") >= 20)
        & (F.col("sw") / F.col("toks")).between(0.05, 0.6)
        & (F.col("punct") / F.col("n") < 0.1),
        1,
    ).otherwise(0)
    lang_guess = (
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
    keep = F.min("doc_id").over(Window.partitionBy("fp"))
    return (
        d.withColumn("_keep", keep)
        .filter(
            (quality_pass == 1)
            & (lang_guess == "en")
            & (F.col("_keep") == F.col("doc_id"))
        )
        .select("doc_id", "n_tokens", (F.col("sw") / F.col("toks")).alias("stopword_ratio"))
    )


@q(
    "pipeline_train_split",
    oracle="""
    WITH b AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 4)) AS INT) % 100 AS bucket,
               len(regexp_split_to_array(trim(text), '\\s+')) AS toks
        FROM documents)
    SELECT CASE WHEN bucket < 90 THEN 'train' ELSE 'val' END AS split,
           count(*) AS n_docs,
           sum(toks) * 1.0 / count(*) AS avg_tokens,
           min(doc_id) AS min_doc,
           max(doc_id) AS max_doc
    FROM b GROUP BY 1
    """,
    tags=("pipeline", "split"),
)
def pipeline_train_split(spark, sf_dir):
    """Deterministic hash-bucketed train/val split — the standard
    leakage-safe pipeline split: assignment depends only on the document
    id (md5 prefix -> bucket 0..99, 90/10), so it is stable across runs,
    engines, and data order — no sampling state to coordinate at 100 TB,
    and a document can never drift between splits as the corpus grows.
    md5/conv are evaluated identically by Spark and DuckDB, so the
    oracle checks the actual assignment, not just the proportions."""
    docs = tbl(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 100
    )
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        docs.select(
            F.when(bucket < 90, "train").otherwise("val").alias("split"),
            toks.alias("toks"),
            "doc_id",
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum("toks") * 1.0 / F.count("*")).alias("avg_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@q(
    "pipeline_curation_v2",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
    w AS (
        SELECT doc_id, t[i] AS w
        FROM toks, UNNEST(generate_series(1, len(t))) AS g(i)),
    wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
    d AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_tokens
        FROM wc GROUP BY doc_id),
    bg AS (
        SELECT doc_id, t[i] || ' ' || t[i+1] AS b
        FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)),
    bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
    tb AS (SELECT doc_id, max(c) AS top_bigram_count FROM bc GROUP BY doc_id),
    rep AS (
        SELECT d.doc_id, d.n_tokens
        FROM d LEFT JOIN tb ON d.doc_id = tb.doc_id
        WHERE d.dup_tokens * 1.0 / d.n_tokens <= 0.9
          AND (CASE WHEN d.n_tokens < 2 THEN 0.0
               ELSE coalesce(tb.top_bigram_count, 0) * 1.0 / (d.n_tokens - 1)
               END) <= 0.08),
    cap AS (
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY doc_id) AS rnk
            FROM documents) WHERE rnk <= 10),
    ltoks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        FROM documents),
    sp AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+14], ' ') AS s
        FROM ltoks, UNNEST(generate_series(1, greatest(len(t) - 14, 1))) AS g(i)),
    dfq AS (SELECT s, count(*) AS df FROM sp GROUP BY 1),
    spans AS (
        SELECT doc_id,
               sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*)
                   AS shared_frac
        FROM sp JOIN dfq USING (s)
        GROUP BY doc_id
        HAVING sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*) <= 0.5),
    cont AS (
        SELECT DISTINCT doc_id FROM sp
        WHERE doc_id % 97 <> 0
          AND s IN (SELECT s FROM sp WHERE doc_id % 97 = 0))
    SELECT rep.doc_id, cap.source, rep.n_tokens, spans.shared_frac
    FROM rep
    JOIN cap USING (doc_id)
    JOIN spans USING (doc_id)
    WHERE rep.doc_id % 97 <> 0
      AND rep.doc_id NOT IN (SELECT doc_id FROM cont)
    """,
    tags=("pipeline", "composite"),
    bench=True,
)
def pipeline_curation_v2(spark, sf_dir):
    """The round-5/6 curation stages fused into ONE declarative plan:
    Gopher-style repetition gate ∧ per-domain cap ∧ repeated-span
    duplication gate ∧ exact-substring benchmark decontamination (the
    eval slice itself is excluded from the output, and every training
    doc sharing a verbatim 15-token span with it is anti-joined away —
    the span grain, unlike 3-shingles, cannot be tripped by chance
    phrase collisions as the eval set grows, so the gate stays
    meaningful at every scale factor). Each stage is oracle-verified
    standalone; the composition joins all four verdict streams
    co-partitioned on doc_id (AQE picks broadcast for the small
    survivor sets), and the decontamination stage rides the SAME
    15-span stream as the duplication gate rather than shingling
    again."""
    from river_spark.operators.dedup import shingles
    from river_spark.queries.curation2 import text_repetition_filter
    from river_spark.queries.curation3 import (
        pipeline_domain_cap,
        span_shared_stats,
    )

    rep = (
        text_repetition_filter(spark, sf_dir)
        .filter(F.col("keep"))
        .select("doc_id", "n_tokens")
    )
    cap = (
        pipeline_domain_cap(spark, sf_dir)
        .filter(F.col("kept"))
        .select("doc_id", "source")
    )
    sh15 = shingles(tbl(spark, sf_dir, "documents"), "doc_id", "text", 15, hashed=True)
    # r15 fusion: the decontamination verdict rides the span-df window.
    # The old shape re-derived the corpus span stream twice more (an
    # eval-shingle distinct + a shingle-keyed contamination join) for a
    # signal the span-df pass already has in hand: span_shared_stats
    # partitions the SAME stream by shingle, so "does any eval doc share
    # this span" is one extra window aggregate over a partition that is
    # already materialized, and the per-doc verdict is one extra column
    # on the per-doc rollup. One corpus-scale span stream + one shingle
    # exchange instead of three, and the anti-join becomes a filter on a
    # column the spans join already carries. (The %97 eval slice is
    # corpus-PROPORTIONAL — round-11 measurement: 198 shingle rows at
    # sf0.01 -> 1,911 at sf0.1 — which is exactly why not re-deriving
    # and re-shuffling it matters at 100 TB.) Output identical: a
    # non-eval doc passes iff none of its spans occurs in the eval
    # slice, the anti-join's membership test verbatim.
    spans = (
        span_shared_stats(sh15, eval_flag=F.col("doc_id") % 97 == 0)
        .select("doc_id", "shared_frac", "eval_shared")
        .filter(F.col("shared_frac") <= 0.5)
    )
    return (
        rep.filter(F.col("doc_id") % 97 != 0)
        .join(cap, "doc_id")
        .join(spans, "doc_id")
        .filter(F.col("eval_shared") == 0)
        .select("doc_id", "source", "n_tokens", "shared_frac")
    )
