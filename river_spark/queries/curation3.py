"""Third curation wave: BM25 relevance ranking, cross-corpus MinHash
decontamination, per-domain document caps, statistical aggregates
(median / deterministic mode / linear regression), URL parsing, and
per-type z-score anomaly flagging.

BM25 and cross-corpus decontamination close the last two search/curation
gaps a pre-training pipeline hits in practice: ranking a corpus against
ad-hoc query terms (the retrieval face of the TF-IDF family in
``curation.py``) and scrubbing the training set of documents that
near-duplicate an EVALUATION benchmark — the asymmetric cousin of
in-corpus dedup, whose scale posture is different (the benchmark side is
tiny, so every join against it broadcasts). The reference's analytics
surface is pandas-level (``/root/reference/performance/performance.py``);
everything here is JVM-side DataFrame code under the same cross-engine
determinism rules as the rest of the registry: identical aliases both
sides, ``round(x, k)`` applied to a single identical arithmetic
expression — EXCEPT pure integer ratios, which are emitted raw (IEEE
division of identical ints is bit-identical across engines, while
round() diverges on exact decimal midpoints; see tests/test_oracle.py) —
and ranking ties broken on an id column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from river_spark.operators.dedup import (
    _band_hash_expr,
    minhash_signatures,
    shingles,
)
from river_spark.queries.relational import q
from river_spark.queries.tables import tbl

# ---------------------------------------------------------------------------
# BM25 ranking
# ---------------------------------------------------------------------------
_BM25_TERMS = ("spark", "hash", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20

_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@q(
    "text_bm25_rank",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents),
    dl AS (SELECT doc_id, len(t) AS dl FROM toks),
    stats AS (SELECT count(*) AS n, avg(len(t)) AS avgdl FROM toks),
    tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
    tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM tok WHERE term IN ({_TERMS_SQL})
        GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    s AS (
        SELECT tf.doc_id,
               round(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({_BM25_K1} + 1)
                     / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                        + {_BM25_B} * dl.dl / stats.avgdl)), 6) AS s
        FROM tf
        JOIN df USING (term)
        JOIN dl USING (doc_id), stats),
    total AS (
        SELECT doc_id, round(sum(s), 6) AS score, count(*) AS n_terms
        FROM s GROUP BY doc_id),
    rk AS (
        SELECT doc_id, score, n_terms,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
        FROM total)
    SELECT doc_id, score, n_terms, rnk FROM rk WHERE rnk <= {_BM25_TOPK}
    """,
    tags=("text", "ranking"),
)
def text_bm25_rank(spark, sf_dir):
    """Top-20 documents by BM25 (k1=1.2, b=0.75) against a fixed query
    term set — the retrieval-side twin of ``text_tfidf_top_terms``.

    Shape at scale: one tokenize pass feeds BOTH the per-doc length and
    the term frequencies (tf is a hash aggregation over the exploded
    stream pre-filtered to the query terms, so the aggregated state is
    |terms| x |docs-containing|, not the vocabulary); df re-aggregates
    FROM tf; df and the 1-row corpus stats broadcast; the final top-k is
    a TakeOrderedAndProject, never a global sort. Ranking orders by the
    ROUNDED score with doc_id tiebreak so ulp-level ln() differences
    cannot flip ranks."""
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    )
    dl = docs.select("doc_id", F.size("t").alias("dl"))
    stats = docs.agg(
        F.count("*").alias("n"), F.avg(F.size("t")).alias("avgdl")
    )
    tok = docs.select("doc_id", F.explode("t").alias("term"))
    tf = (
        tok.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    # operation GROUPING mirrors the oracle's left-to-right SQL parse —
    # ((idf * tf) * (k1+1)) / denom — so both engines evaluate the
    # identical float expression tree and round(., 6) can never flip
    idf = F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    score = F.round(idf * F.col("tf") * (_BM25_K1 + 1) / denom, 6)
    s = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .select("doc_id", score.alias("s"))
    )
    total = s.groupBy("doc_id").agg(
        F.round(F.sum("s"), 6).alias("score"), F.count("*").alias("n_terms")
    )
    # orderBy+limit plans as TakeOrderedAndProject (per-partition top-k,
    # merged on the driver); the rank window then runs over <= TOPK rows,
    # never a global sort of the corpus
    top = total.orderBy(F.col("score").desc(), F.col("doc_id")).limit(_BM25_TOPK)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.select(
        "doc_id", "score", "n_terms", F.row_number().over(w).cast("long").alias("rnk")
    )


# ---------------------------------------------------------------------------
# Cross-corpus decontamination (near-dup vs a benchmark set)
# ---------------------------------------------------------------------------
def cross_corpus_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    bench_id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.9,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Corpus documents whose n-shingle Jaccard against ANY benchmark
    document reaches ``threshold``, with their best match:
    [doc_id, bench_id, jaccard], one row per contaminated corpus doc
    (best = highest Jaccard, benchmark id as tiebreak).

    The asymmetric-scale shape: the benchmark is tiny relative to the
    corpus (eval sets are thousands of docs; the corpus is billions), so
    every benchmark-side table — band buckets, shingle set, lengths —
    is explicitly broadcast and the corpus is NEVER shuffled by bucket
    or shingle. Candidates come from a broadcast equi-join of corpus
    band buckets against benchmark band buckets (same 16-band/64-hash
    geometry as ``dedup_minhash_lsh``: a pair at threshold 0.9 is missed
    with probability (1-0.9^4)^16 ~ 4e-8); the exact verify joins the
    candidate corpus docs' shingles against the broadcast benchmark
    shingle table — all-vs-all over the restricted sets, a SUPERSET of
    the candidate pairs, so the exact >= threshold filter makes the
    output exhaustive over candidate docs.

    Pre-distinct candidate volume is bounded by |corpus-bucket-width| x
    |bench-bucket-width| per (band, bucket); the bench side caps every
    bucket at |bench|, so no max_bucket guard is needed while the
    benchmark is broadcastable. ``broadcast_bench=False`` is the
    cross-SNAPSHOT shape — deduping one crawl against a previous
    corpus-sized one: identical plan, but the bucket equi-join and the
    shingle verify become shuffle joins co-partitioned on (band, bucket)
    and shingle, and the LSH candidate restriction (not the broadcast)
    is what keeps the pair space sub-quadratic — exactly why this
    operator exists alongside the exact broadcast-set decontamination in
    ``decontam_ngram_overlap``."""
    bc = F.broadcast if broadcast_bench else (lambda df: df)
    band_expr = F.expr(_band_hash_expr(bands, num_hashes))

    def banded(df, src_id, out_id):
        # shingles() canonicalizes the id column to "doc_id"; re-alias to
        # the side-specific name so the bucket join can't self-collide
        sh = shingles(df, src_id, text_col, n, hashed=True, distinct=False)
        sigs = minhash_signatures(sh, num_hashes)
        return sigs.select(
            F.col("doc_id").alias(out_id),
            F.posexplode(band_expr).alias("band", "bucket"),
        )

    c_banded = banded(corpus, id_col, "doc_id")
    b_banded = banded(bench, bench_id_col, "bench_id")
    # Persist the two corpus-derived intermediates that have multiple
    # consumers (r15 plan audit: without these the FULL corpus shingle +
    # 64-min-hash + bucket-join pipeline re-executed once per consumer —
    # cand_docs is read by both verify branches and c_sh by c_cnt AND
    # inter, so the corpus was scanned/sig'd 3x per run). cand_docs is
    # ids-only (8 B/candidate) and c_sh is the CANDIDATE docs' shingles —
    # both orders of magnitude below corpus size at any scale, the
    # "decide on small rows" materialization of the decision/placement
    # split. Measured at local[8] (the contended-core regime where
    # recompute can't hide on idle cores): 2.62-2.84 s -> 2.28-2.43 s at
    # sf0.1. The bench-side tables stay unpersisted: they are
    # benchmark-sized and their persist barrier measured net-negative.
    # no .distinct() on the candidate ids (r15): the left-semi join
    # below dedupes doc ids itself, so the dedup exchange was a pure
    # extra stage (measured 2.49 -> 2.15 s at sf0.1, identical output).
    # Multi-band matches repeat a doc id <= bands times in the cached
    # set — bounded, ids-only.
    cand_docs = (
        c_banded.join(bc(b_banded), ["band", "bucket"])
        .select("doc_id")
        .persist()
    )
    # exact verify over candidate corpus docs x full benchmark
    c_sh = shingles(
        corpus.join(
            cand_docs.withColumnRenamed("doc_id", id_col), [id_col], "left_semi"
        ),
        id_col,
        text_col,
        n,
        hashed=True,
    ).persist()
    b_sh = shingles(bench, bench_id_col, text_col, n, hashed=True).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    c_cnt = c_sh.groupBy("doc_id").agg(F.count("*").alias("ca"))
    b_cnt = b_sh.groupBy("bench_id").agg(F.count("*").alias("cb"))
    inter = (
        c_sh.join(bc(b_sh), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") * 1.0 / (F.col("ca") + F.col("cb") - F.col("inter"))
    scored = (
        inter.join(c_cnt, "doc_id")
        .join(bc(b_cnt), "bench_id")
        .filter(jac >= threshold)
        .select("doc_id", "bench_id", jac.alias("jaccard"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("jaccard").desc(), F.col("bench_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "bench_id", "jaccard")
    )


@q(
    "decontam_minhash_bench",
    oracle="""
    WITH bench AS (
        SELECT doc_id AS bench_id, text FROM documents WHERE doc_id % 50 = 0),
    corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0
        UNION ALL
        SELECT doc_id + 10000000, text || ' planted'
        FROM documents WHERE doc_id % 50 = 0),
    ctoks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        FROM corpus),
    csh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
        FROM ctoks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS g(i)),
    btoks AS (
        SELECT bench_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        FROM bench),
    bsh AS (
        SELECT DISTINCT bench_id, array_to_string(t[i:i+2], ' ') AS s
        FROM btoks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS g(i)),
    ccnt AS (SELECT doc_id, count(*) AS ca FROM csh GROUP BY 1),
    bcnt AS (SELECT bench_id, count(*) AS cb FROM bsh GROUP BY 1),
    inter AS (
        SELECT c.doc_id, b.bench_id, count(*) AS i
        FROM csh c JOIN bsh b ON c.s = b.s
        GROUP BY 1, 2),
    j AS (
        SELECT doc_id, bench_id,
               i * 1.0 / (ccnt.ca + bcnt.cb - i) AS jaccard
        FROM inter
        JOIN ccnt USING (doc_id)
        JOIN bcnt USING (bench_id)
        WHERE i * 1.0 / (ccnt.ca + bcnt.cb - i) >= 0.9)
    SELECT doc_id, bench_id, jaccard FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY jaccard DESC, bench_id) AS rn
        FROM j) WHERE rn = 1
    """,
    tags=("dedup", "decontam"),
    bench=True,
)
def decontam_minhash_bench(spark, sf_dir):
    """Benchmark decontamination through the full cross-corpus MinHash
    pipeline, verified by an exhaustive exact-Jaccard oracle. Every 50th
    document plays the held-out benchmark; the corpus is everything else
    PLUS a planted near-dup of each benchmark doc (one token appended,
    so Jaccard = S/(S+1) — above 0.9 exactly when the doc has >= 9
    distinct shingles, which the oracle recomputes independently). The
    planted twins guarantee the gate checks real matches; organic
    cross-matches (if any) are covered identically by both engines."""
    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    planted = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" planted")).alias("text"),
    )
    corpus = docs.filter(F.col("doc_id") % 50 != 0).unionByName(planted)
    return cross_corpus_contamination(
        corpus, bench, "doc_id", "bench_id", "text", threshold=0.9
    )


# ---------------------------------------------------------------------------
# Per-domain document cap
# ---------------------------------------------------------------------------
_DOMAIN_CAP = 10


@q(
    "pipeline_domain_cap",
    oracle=f"""
    SELECT doc_id, source, rnk, rnk <= {_DOMAIN_CAP} AS kept FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY doc_id) AS rnk
        FROM documents)
    """,
    tags=("pipeline", "sampling"),
)
def pipeline_domain_cap(spark, sf_dir):
    """Per-domain document cap — the standard guard against one crawl
    domain dominating the training mixture: keep each source's first 10
    documents in crawl (doc_id) order. One window over the source
    partition; output size equals input (the verdict travels with every
    row), so downstream stages filter on `kept` without a join.
    Crawl-order ranking keeps the cap independent of document length, so
    it composes orthogonally with the length-sensitive quality gates
    (pipeline_curation_v2)."""
    from river_spark.operators.stitched_lag import stitched_row_number

    # round 11: source is a ~20-value key, so the plain per-source rank
    # window serialized each domain's full crawl in one task; the rank
    # now runs stitched (sources x doc-range buckets, row-identical)
    docs = tbl(spark, sf_dir, "documents")
    return (
        stitched_row_number(
            docs.select("doc_id", "source"),
            key_cols=["source"],
            order_cols=["doc_id"],
            bucket=F.expr("doc_id div 4096"),
            out_col="rnk",
        )
        .select("doc_id", "source", "rnk")
        .withColumn("kept", F.col("rnk") <= _DOMAIN_CAP)
    )


# ---------------------------------------------------------------------------
# Statistical aggregates: median + deterministic mode, linear regression
# ---------------------------------------------------------------------------
@q(
    "agg_median_mode",
    oracle="""
    WITH med AS (
        SELECT l_returnflag,
               round(CAST(median(l_quantity) AS DOUBLE), 4) AS median_qty,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag),
    cnt AS (
        SELECT l_returnflag, l_linestatus, count(*) AS c
        FROM lineitem GROUP BY 1, 2),
    md AS (
        SELECT l_returnflag, l_linestatus AS mode_status, c AS mode_count
        FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                           ORDER BY c DESC, l_linestatus) AS rn
              FROM cnt) WHERE rn = 1)
    SELECT med.l_returnflag, median_qty, mode_status,
           CAST(mode_count AS BIGINT) AS mode_count, n
    FROM med JOIN md USING (l_returnflag)
    """,
    tags=("agg", "stats"),
)
def agg_median_mode(spark, sf_dir):
    """Exact interpolated median plus a DETERMINISTIC mode per group.
    The builtin mode() is tie-arbitrary in both engines, so the mode here
    is the argmax of the (group, value) count with the value itself as
    tiebreak — two hash aggregations and a window over the tiny count
    table, the distributed shape that stays correct under ties. median()
    is the builtin (exact, interpolated) in both engines."""
    li = tbl(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 4).alias("median_qty"),
        F.count("*").alias("n"),
    )
    cnt = li.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("c"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("c").desc(), F.col("l_linestatus")
    )
    md = (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_linestatus").alias("mode_status"),
            F.col("c").alias("mode_count"),
        )
    )
    return med.join(md, "l_returnflag").select(
        "l_returnflag", "median_qty", "mode_status", "mode_count", "n"
    )


@q(
    "agg_regression",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           round(covar_samp(l_quantity, l_extendedprice), 2)     AS cov_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_regression(spark, sf_dir):
    """Per-group OLS regression of extended price on quantity via the
    SQL-standard regr_* aggregate family (y-then-x argument order in both
    engines) plus sample covariance. All single-pass distributive
    aggregates — partial aggregation applies, no second scan."""
    li = tbl(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).alias("n"),
        F.round(F.covar_samp(x, y), 2).alias("cov_qty_price"),
    )


# ---------------------------------------------------------------------------
# URL parsing
# ---------------------------------------------------------------------------
@q(
    "scalar_url",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' || lang || '/'
                 || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&id='
                 || CAST(doc_id AS VARCHAR) || '#frag' AS url
        FROM documents)
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1)            AS proto,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)     AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1)              AS query,
           regexp_extract(url, '[?&]id=([^&#]*)', 1)         AS id_param,
           regexp_extract(url, '#(.*)$', 1)                  AS fragment
    FROM u
    """,
    tags=("scalar", "url"),
)
def scalar_url(spark, sf_dir):
    """URL component extraction with the builtin parse_url (JVM-side,
    codegen'd); the oracle decomposes the same synthesized URLs with
    regexes, so every component is independently derived. Pure
    projection — zero shuffles."""
    docs = tbl(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&id="),
        F.col("doc_id").cast("string"),
        F.lit("#frag"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("id")).alias("id_param"),
        F.parse_url(F.col("url"), F.lit("REF")).alias("fragment"),
    )


# ---------------------------------------------------------------------------
# Per-type z-score anomaly profile
# ---------------------------------------------------------------------------
@q(
    "ev_anomaly_zscore",
    oracle="""
    WITH s AS (
        SELECT event_type,
               count(*) AS n,
               avg(value) AS mu,
               stddev_samp(value) AS sd
        FROM events GROUP BY event_type)
    SELECT s.event_type,
           n,
           round(mu, 6) AS mean_value,
           round(sd, 6) AS sd_value,
           count(*) FILTER (abs((e.value - mu) / sd) > 2) AS n_outliers,
           round(max(abs((e.value - mu) / sd)), 4) AS max_abs_z
    FROM events e JOIN s USING (event_type)
    GROUP BY s.event_type, n, mu, sd
    """,
    tags=("events", "anomaly"),
)
def ev_anomaly_zscore(spark, sf_dir):
    """Per-event-type z-score anomaly profile: distribution stats in one
    aggregation, then a broadcast join of the (|event-types|-row) stats
    back onto the stream to count |z| > 2 outliers — the standard
    two-pass standardization that never shuffles the fact table twice
    (the second pass re-aggregates by the same key, and the tiny stats
    side broadcasts). Outlier COUNTS rather than outlier rows keep the
    gate deterministic: a boundary-straddling ulp would need |z| within
    1e-12 of 2 to flip a count."""
    ev = tbl(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sd"),
    )
    z = F.abs((F.col("value") - F.col("mu")) / F.col("sd"))
    return (
        ev.join(F.broadcast(s), "event_type")
        .groupBy("event_type", "n", "mu", "sd")
        .agg(
            F.sum(F.when(z > 2, 1).otherwise(0)).alias("n_outliers"),
            F.round(F.max(z), 4).alias("max_abs_z"),
        )
        .select(
            "event_type",
            "n",
            F.round(F.col("mu"), 6).alias("mean_value"),
            F.round(F.col("sd"), 6).alias("sd_value"),
            "n_outliers",
            "max_abs_z",
        )
    )


# ---------------------------------------------------------------------------
# Cross-document repeated-span detection (exact-substring dedup metric)
# ---------------------------------------------------------------------------
_SPAN_N = 15


def span_shared_stats(sh, eval_flag=None):
    """Per-doc repeated-span rollup over a hashed span stream
    [doc_id, shingle]: span document-frequency is a window count over the
    span partition (same windowed-guard idiom as ngram_jaccard_pairs —
    the spillable WindowExec buffer, never a collect_list array), and
    the per-doc rollup re-aggregates the SAME windowed stream by doc_id.
    Two exchanges total, both over flat long rows. Shared by
    dedup_repeated_spans and pipeline_curation_v2 so the span-df idiom
    cannot drift between the standalone gate and the composite.

    ``eval_flag`` (optional Column over the input rows — e.g. a doc-id
    slice predicate marking a held-out eval set): the SAME span-partition
    window additionally computes whether ANY doc in the span's group is
    flagged, and the per-doc rollup carries ``eval_shared`` = 1 iff any
    of the doc's spans appears in a flagged doc. That is the exact-span
    decontamination verdict fused into the df pass: the span stream is
    computed and shuffled ONCE for both signals, instead of a separate
    eval-shingle distinct + shingle-keyed join re-deriving the corpus
    span stream twice more (r15 rewrite, pipeline_curation_v2)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("shingle")
    shw = sh.withColumn("_df", F.count(F.lit(1)).over(w))
    extra = []
    if eval_flag is not None:
        shw = shw.withColumn(
            "_ev", F.max(eval_flag.cast("int")).over(w)
        )
        extra.append(F.max("_ev").alias("eval_shared"))
    shared = F.sum(F.when(F.col("_df") >= 2, 1).otherwise(0))
    return shw.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        shared.alias("n_shared"),
        (shared * 1.0 / F.count("*")).alias("shared_frac"),
        *extra,
    )


@q(
    "dedup_repeated_spans",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        FROM documents),
    sp AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+{_SPAN_N - 1}], ' ') AS s
        FROM toks,
             UNNEST(generate_series(1, greatest(len(t) - {_SPAN_N - 1}, 1))) AS g(i)),
    d AS (SELECT s, count(*) AS df FROM sp GROUP BY 1)
    SELECT doc_id,
           count(*) AS n_spans,
           CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*)
               AS shared_frac
    FROM sp JOIN d USING (s)
    GROUP BY doc_id
    """,
    tags=("dedup", "substring"),
)
def dedup_repeated_spans(spark, sf_dir):
    """Exact-substring duplication metric (the Lee et al. 2022 'deduplicating
    training data' primitive): for every document, the fraction of its
    15-token spans that appear verbatim in ANY other document — the signal
    used to cut boilerplate/licensing blocks that MinHash's whole-document
    granularity misses. Spans travel as xxhash64 fingerprints; plan shape
    in span_shared_stats."""
    docs = tbl(spark, sf_dir, "documents")
    return span_shared_stats(shingles(docs, "doc_id", "text", _SPAN_N, hashed=True))


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit
# ---------------------------------------------------------------------------
@q(
    "text_zipf_slope",
    oracle="""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
        FROM documents),
    freq AS (SELECT term, count(*) AS f FROM tok GROUP BY 1),
    ranked AS (
        SELECT f, row_number() OVER (ORDER BY f DESC, term) AS r
        FROM freq)
    SELECT round(regr_slope(ln(f), ln(r)), 4)     AS zipf_slope,
           round(regr_intercept(ln(f), ln(r)), 4) AS zipf_intercept,
           round(regr_r2(ln(f), ln(r)), 6)        AS fit_r2,
           count(*)                               AS n_vocab
    FROM ranked
    """,
    tags=("text", "stats"),
)
def text_zipf_slope(spark, sf_dir):
    """Zipf rank-frequency fit: OLS slope of ln(frequency) on ln(rank)
    over the corpus vocabulary — the one-number corpus-health statistic
    (natural text sits near -1; synthetic/spammy corpora drift off).
    The rank window is a global sort of the VOCABULARY (frequency desc,
    term tiebreak) — vocabulary is millions of rows when the corpus is
    billions, so the one single-partition window is deliberate and
    bounded; everything corpus-sized stays in the preceding hash
    aggregation."""
    tok = tbl(spark, sf_dir, "documents").select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term")
    )
    freq = tok.groupBy("term").agg(F.count("*").alias("f"))
    w = Window.orderBy(F.col("f").desc(), F.col("term"))
    ranked = freq.select("f", F.row_number().over(w).alias("r"))
    lf, lr = F.log("f"), F.log("r")
    return ranked.agg(
        F.round(F.regr_slope(lf, lr), 4).alias("zipf_slope"),
        F.round(F.regr_intercept(lf, lr), 4).alias("zipf_intercept"),
        F.round(F.regr_r2(lf, lr), 6).alias("fit_r2"),
        F.count("*").alias("n_vocab"),
    )


# ---------------------------------------------------------------------------
# Bigram language-model scoring (add-one smoothed)
# ---------------------------------------------------------------------------
@q(
    "text_bigram_logprob",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents),
    bg AS (
        SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
    v AS (SELECT count(DISTINCT term) AS v
          FROM (SELECT unnest(t) AS term FROM toks) u)
    SELECT bg.doc_id,
           count(*) AS n_bigrams,
           round(avg(ln((c2.c2 + 1) * 1.0 / (c1.c1 + v.v))), 6) AS avg_logprob
    FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v
    GROUP BY bg.doc_id
    """,
    tags=("text", "lm"),
)
def text_bigram_logprob(spark, sf_dir):
    """Add-one-smoothed bigram language-model scoring — the next rung
    above ``text_unigram_logprob`` on the cheap-perplexity ladder:
    each document's mean ln P(w2|w1) under the corpus's own bigram
    distribution, Laplace-smoothed over the vocabulary. One bigram
    explode feeds the per-doc stream AND both count tables (c2
    re-aggregated from the stream, c1 re-aggregated from c2's input
    grain); the bigram-count and prefix-count tables broadcast
    (vocabulary-sized, not corpus-sized), as does the 1-row vocabulary
    cardinality. ln of an integer ratio is computed identically by both
    engines; the per-doc mean rounds at 6."""
    toks = tbl(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    )
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1), "
                "i -> struct(t[i-1] AS w1, t[i] AS w2)) "
                "ELSE cast(array() as array<struct<w1:string,w2:string>>) END"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    v = toks.select(F.explode("t").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    lp = F.log((F.col("c2") + 1) * 1.0 / (F.col("c1") + F.col("v")))
    return (
        bg.join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(lp), 6).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# The reference's own latency-analysis query
# ---------------------------------------------------------------------------
@q(
    "river_latency_analysis",
    oracle="""
    WITH w AS (
        SELECT event_id AS sample_index,
               epoch_us(ts) AS sample_written_at
        FROM events),
    r AS (
        SELECT event_id AS sample_index,
               epoch_us(ts) + (event_id % 7) * 1000 AS sample_received_at
        FROM events
        UNION ALL
        SELECT event_id,
               epoch_us(ts) + (event_id % 11) * 1000
        FROM events),
    agg AS (
        SELECT sample_index, max(sample_received_at) AS sample_received_at
        FROM r GROUP BY sample_index)
    SELECT w.sample_index, w.sample_written_at, agg.sample_received_at,
           agg.sample_received_at - w.sample_written_at AS latency_us
    FROM w JOIN agg USING (sample_index)
    """,
    tags=("river", "latency"),
)
def river_latency_analysis(spark, sf_dir):
    """The ONE analytics query the reference itself runs
    (/root/reference/performance/performance.py:124-148): union the
    per-reader frames, take the latest received time per sample_index,
    merge with the writer frame on sample_index, and project the
    latency. Re-expressed Spark-first: unionByName → hash aggregate →
    co-partitioned join → projection; the two synthetic reader frames
    use deterministic integer-microsecond skews so the gate checks the
    exact relational shape (concat / groupby-max / merge / assign) on
    reproducible data rather than wall-clock noise."""
    ev = tbl(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    w = ev.select(
        F.col("event_id").alias("sample_index"),
        us.alias("sample_written_at"),
    )
    readers = [
        ev.select(
            F.col("event_id").alias("sample_index"),
            (us + (F.col("event_id") % skew) * 1000).alias("sample_received_at"),
        )
        for skew in (7, 11)
    ]
    r = readers[0].unionByName(readers[1])
    agg = r.groupBy("sample_index").agg(
        F.max("sample_received_at").alias("sample_received_at")
    )
    return w.join(agg, "sample_index").select(
        "sample_index",
        "sample_written_at",
        "sample_received_at",
        (F.col("sample_received_at") - F.col("sample_written_at")).alias("latency_us"),
    )


# ---------------------------------------------------------------------------
# Quality-weighted (importance) sampling
# ---------------------------------------------------------------------------
@q(
    "pipeline_quality_sample",
    oracle="""
    WITH s AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(doc_id::VARCHAR), 9, 4)) AS INT) % 10000
                   AS bucket,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents),
    p AS (
        SELECT doc_id, bucket, n_tokens,
               CAST(least(n_tokens * 25, 10000) AS BIGINT) AS keep_bp
        FROM s)
    SELECT doc_id, n_tokens, keep_bp, bucket < keep_bp AS kept
    FROM p
    """,
    tags=("pipeline", "sampling"),
)
def pipeline_quality_sample(spark, sf_dir):
    """Importance sampling by a quality proxy: each document's keep
    probability scales with its token count (capped at 1.0 — 400+
    tokens always kept, shorter docs kept proportionally), decided by a
    deterministic md5 bucket against the per-doc threshold. The same
    leakage-safe property as the train/val split: assignment depends
    only on doc_id and the doc's own features, so it is reproducible
    across runs, engines, and data order, and needs no sampling state
    at 100 TB. Pure projection — zero shuffles."""
    docs = tbl(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 9, 4), 16, 10)
        .cast("int") % 10000
    )
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    keep_bp = F.least(n_tokens * 25, F.lit(10000)).cast("long")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        keep_bp.alias("keep_bp"),
        (bucket < keep_bp).alias("kept"),
    )
