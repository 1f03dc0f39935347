"""Training-corpus curation operators beyond the dedup/similarity families:
benchmark decontamination, sequence packing, TF-IDF term weighting,
stratified sampling, and unigram language-model scoring.

These are the remaining steps of a large-scale LLM data pipeline (after
quality filtering + dedup, before tokenization/serving) that the reference
leaves entirely to its consumers — its own analytics surface stops at
pandas groupby/merge over ingested Parquet
(``/root/reference/performance/performance.py:124-148``). Everything here
is JVM-side DataFrame code (explode / hash-aggregate / window / broadcast
join); no Python touches the hot path.

Cross-engine determinism rules (same as the rest of the registry):
identical aliases both sides, doubles rounded on both sides, md5-prefix
hashing for sampling decisions (bit-identical in Spark and DuckDB), and
integer division spelled ``div`` / ``//`` so pack assignment is exact.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import tbl


def _shingles3(df, id_col="doc_id", text_col="text"):
    """Distinct 3-token shingles per document, built with one JVM
    higher-order-function pass (no explode of raw tokens first)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # Guard short docs: sequence(1, 0) yields the DESCENDING [1, 0], not
    # an empty array, so an unguarded transform would index out of bounds
    # (ANSI error) on 1-2-token documents. Mirrors the oracle's
    # generate_series(1, len-2), which IS empty for len < 3.
    sh = F.expr(
        "CASE WHEN size(t) >= 3 THEN transform(sequence(1, size(t) - 2), "
        "i -> concat_ws(' ', t[i-1], t[i], t[i+1])) "
        "ELSE cast(array() as array<string>) END"
    )
    return (
        df.select(F.col(id_col), toks.alias("t"))
        .select(id_col, F.explode(F.array_distinct(sh)).alias("s"))
    )


@q(
    "decontam_ngram_overlap",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)),
    ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % 97 = 0),
    tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0)
    SELECT tr.doc_id,
           count(DISTINCT tr.s)       AS n_hit_shingles,
           count(DISTINCT ev.eval_id) AS n_eval_docs
    FROM tr JOIN ev ON tr.s = ev.s
    GROUP BY tr.doc_id
    HAVING count(DISTINCT tr.s) >= 2
    """,
    tags=("pipeline", "decontam"),
)
def decontam_ngram_overlap(spark, sf_dir):
    """Benchmark decontamination: flag training documents sharing >= 2
    distinct 3-token shingles with any held-out eval document (the eval
    set is the deterministic ``doc_id % 97 = 0`` slice, standing in for a
    benchmark suite).

    100 TB posture: the eval/benchmark side is tiny (thousands of docs)
    and is explicitly ``broadcast`` — the corpus-side shingle stream joins
    map-side with NO shuffle of the corpus; the only exchange is the final
    per-doc aggregation of matched shingles, whose size scales with the
    number of *contaminated* shingle hits, not the corpus."""
    sh = _shingles3(tbl(spark, sf_dir, "documents"))
    # (eval_id, s) is already unique: _shingles3 emits per-doc-distinct
    # shingles, so no extra distinct pass on the broadcast side.
    ev = F.broadcast(
        sh.filter(F.col("doc_id") % 97 == 0).select(F.col("doc_id").alias("eval_id"), "s")
    )
    tr = sh.filter(F.col("doc_id") % 97 != 0)
    return (
        tr.join(ev, "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_hit_shingles"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
        .filter(F.col("n_hit_shingles") >= 2)
    )


@q(
    "pipeline_seq_pack",
    oracle="""
    WITH t AS (
        SELECT doc_id, doc_id % 8 AS shard,
               len(regexp_split_to_array(trim(text), '\\s+')) AS toks
        FROM documents),
    w AS (
        SELECT shard, doc_id, toks,
               sum(toks) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - toks AS strt
        FROM t)
    SELECT shard, CAST(strt // 512 AS BIGINT) AS pack_id,
           count(*)                      AS n_docs,
           CAST(sum(toks) AS BIGINT)     AS pack_tokens,
           min(doc_id)                   AS first_doc,
           max(doc_id)                   AS last_doc
    FROM w GROUP BY shard, pack_id
    """,
    tags=("pipeline", "packing"),
)
def pipeline_seq_pack(spark, sf_dir):
    """Sequence packing: assign documents to fixed token-budget training
    packs (512 tokens here). Deterministic offline variant: documents are
    sharded (``doc_id % 8``), ordered by id within the shard, and a pack
    boundary falls every 512 cumulative tokens — assignment is a pure
    function of (id, token count), identical across engines and runs.

    100 TB posture (round 11): the 8-way shard key is fixed, so a plain
    per-shard window is 8 tasks no matter the corpus — the running sum
    now goes through operators/stitched_lag.stitched_prefix_sum with a
    doc-range bucket (shards x ranges parallelism, row-identical to the
    plain window so the oracle holds), and the pack aggregation still
    rides the shard/bucket hash partitioning."""
    from river_spark.operators.stitched_lag import stitched_prefix_sum

    d = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("toks"),
    )
    packed = stitched_prefix_sum(
        d,
        key_cols=["shard"],
        order_cols=["doc_id"],
        value_col="toks",
        bucket=F.expr("doc_id div 4096"),
        out_col="cum",
    ).select(
        "shard",
        "doc_id",
        "toks",
        (F.col("cum") - F.col("toks")).alias("strt"),
    )
    return (
        packed.select("shard", F.expr("strt div 512").alias("pack_id"), "doc_id", "toks")
        .groupBy("shard", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("toks").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@q(
    "text_tfidf_top_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
        FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    s AS (
        SELECT doc_id, term, tf, df,
               round(tf * ln(n.n * 1.0 / df), 6) AS tfidf
        FROM tf JOIN df USING (term), n),
    rk AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, term) AS rnk
        FROM s)
    SELECT doc_id, term, tf, df, tfidf, rnk FROM rk WHERE rnk <= 3
    """,
    tags=("text", "tfidf"),
)
def text_tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document. Term frequencies come from one
    explode+hash-aggregate; document frequencies are re-aggregated FROM
    the tf table (no second pass over the text); the vocabulary-sized df
    table and the single-row corpus count are both broadcast, so the only
    shuffles are the tf aggregation and the per-doc top-k window.

    Ranking orders by the ROUNDED tfidf (both engines) with the term as
    tiebreak, so ulp-level ln() differences between runtimes cannot flip
    ranks."""
    docs = tbl(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    # 1-row broadcast scalar join (same shape as q15/q22's scalar
    # thresholds) — nested-loop against a single broadcast row is O(n).
    n = docs.agg(F.count("*").alias("n"))
    s = (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * F.log(F.col("n") * 1.0 / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        s.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf", "rnk")
    )


# Per-language keep rates (percent) for stratified sampling: downsample
# the over-represented language, keep low-resource ones intact.
_STRATA_RATES = {"en": 50, "de": 80, "es": 80, "fr": 80, "zh": 100}
_RATE_SQL = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _STRATA_RATES.items()
) + " ELSE 100 END"


@q(
    "pipeline_stratified_sample",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(doc_id::VARCHAR), 5, 4)) AS INT) % 100 AS bucket,
               {_RATE_SQL} AS rate
        FROM documents)
    SELECT lang,
           count(*)                                    AS n_docs,
           count(*) FILTER (bucket < rate)             AS n_kept,
           count(*) FILTER (bucket < rate) * 1.0 / count(*) AS kept_ratio,
           CAST(COALESCE(sum(doc_id) FILTER (bucket < rate), 0) AS BIGINT) AS kept_id_sum
    FROM b GROUP BY lang
    """,
    tags=("pipeline", "sampling"),
)
def pipeline_stratified_sample(spark, sf_dir):
    """Stratified corpus sampling: per-language keep rates applied via
    md5-prefix hash buckets (a different prefix window than the train/val
    split, so the two decisions are independent). Like the split, the
    keep/drop decision is a pure function of doc_id — stable across
    engines, runs, and corpus growth, with no sampler state to coordinate
    across 1000 executors. The oracle checks the actual kept-id checksum,
    not just proportions."""
    rate = F.expr(_RATE_SQL)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 5, 4), 16, 10)
        .cast("int") % 100
    )
    kept = F.when(bucket < rate, 1).otherwise(0)
    return (
        tbl(spark, sf_dir, "documents")
        .select("doc_id", "lang", kept.alias("keep"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("keep").alias("n_kept"),
            (F.sum("keep") * 1.0 / F.count("*")).alias("kept_ratio"),
            F.coalesce(F.sum(F.when(F.col("keep") == 1, F.col("doc_id"))), F.lit(0)).alias(
                "kept_id_sum"
            ),
        )
    )


@q(
    "text_unigram_logprob",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
        FROM documents),
    cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY 1),
    tot AS (SELECT count(*) AS t FROM tok)
    SELECT doc_id,
           count(*)                          AS n_tokens,
           round(avg(ln(c * 1.0 / t)), 6)    AS avg_logprob
    FROM tok JOIN cnt USING (term), tot
    GROUP BY doc_id
    """,
    tags=("text", "lm"),
)
def text_unigram_logprob(spark, sf_dir):
    """Unigram language-model scoring: every document's mean token
    log-probability under the corpus's own unigram distribution — the
    cheap perplexity proxy pipelines use to drop gibberish before paying
    for a real LM pass. The vocabulary count table is broadcast (vocab ≪
    corpus); shuffles are the vocab aggregation and the per-doc mean."""
    tok = tbl(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    cnt = tok.groupBy("term").agg(F.count("*").alias("c"))
    # 1-row broadcast scalar join for the corpus token total.
    tot = tok.agg(F.count("*").alias("t"))
    return (
        tok.join(F.broadcast(cnt), "term")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("c") * 1.0 / F.col("t"))), 6).alias("avg_logprob"),
        )
    )
