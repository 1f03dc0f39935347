"""Second curation wave: repetition filtering, PII redaction, sliding-
window chunking, and domain-mixture weighting.

These fill the remaining pre-training-pipeline gaps after
``curation.py``'s decontamination/packing/sampling family: the
Gopher-style repetition heuristics that drop boilerplate/spam before
dedup pays for it, the PII scrub every released corpus needs, the
RAG/long-context chunker, and the per-source mixture weights that decide
how often each domain is sampled during training. The reference's
analytics surface stops at pandas groupby/merge over ingested Parquet
(``/root/reference/performance/performance.py:124-148``); everything
here is JVM-side DataFrame code — explode / hash-aggregate / window /
higher-order functions — with no Python in the hot path.

Cross-engine determinism rules (same as the rest of the registry):
identical aliases both sides, doubles produced by a single arithmetic
expression then ``round(x, 6)`` on both sides — except pure integer
ratios, emitted RAW because IEEE int-ratio division is bit-identical
across engines while round() diverges on exact decimal midpoints —
``md5`` for content digests (bit-identical hex in Spark and DuckDB),
and integer division spelled ``div`` / ``//`` so chunk counts are exact.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from river_spark.operators.components import connected_components
from river_spark.queries.relational import q
from river_spark.queries.tables import tbl


@q(
    "text_repetition_filter",
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
    tb AS (SELECT doc_id, max(c) AS top_bigram_count FROM bc GROUP BY doc_id)
    SELECT d.doc_id, d.n_tokens,
           d.dup_tokens * 1.0 / d.n_tokens AS dup_token_frac,
           CAST(coalesce(tb.top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
           CASE WHEN d.n_tokens < 2 THEN 0.0
                ELSE coalesce(tb.top_bigram_count, 0) * 1.0 / (d.n_tokens - 1)
           END AS top_bigram_frac,
           (d.dup_tokens * 1.0 / d.n_tokens <= 0.9
            AND (CASE WHEN d.n_tokens < 2 THEN 0.0
                 ELSE coalesce(tb.top_bigram_count, 0) * 1.0 / (d.n_tokens - 1)
                 END) <= 0.08) AS keep
    FROM d LEFT JOIN tb ON d.doc_id = tb.doc_id
    """,
    tags=("pipeline", "quality"),
)
def text_repetition_filter(spark, sf_dir):
    """Gopher-style repetition heuristics (Rae et al. 2021 §A1.1): the
    fraction of token occurrences whose token repeats within the doc, and
    the coverage of the single most frequent word bigram — the two
    cheapest signals for dropping keyword-stuffed spam and boilerplate.

    Shape at scale: one tokenize pass feeds BOTH signals (unigram counts
    and bigram counts are separate hash aggregations over the same
    exploded stream — partial-agg friendly, no doc-wide arrays built),
    then a per-doc join of two doc-keyed aggregates that AQE plans as a
    co-partitioned shuffle join. No window over the corpus, no Python.
    """
    toks = tbl(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    )
    words = toks.select("doc_id", F.explode("t").alias("w"))
    wc = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    per_doc = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_tokens"),
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1), "
                "i -> concat(t[i-1], ' ', t[i])) "
                "ELSE cast(array() as array<string>) END"
            )
        ).alias("b"),
    )
    bc = bigrams.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    tb = bc.groupBy("doc_id").agg(F.max("c").alias("top_bigram_count"))
    frac = F.col("dup_tokens") * 1.0 / F.col("n_tokens")
    # LEFT join + guards: a 1-token doc has no bigram row but a curation
    # FILTER must still emit a verdict for it (top_bigram_frac := 0.0,
    # never a divide-by-zero on n_tokens - 1)
    tbc = F.coalesce(F.col("top_bigram_count"), F.lit(0)).cast("long")
    bfrac = F.when(F.col("n_tokens") < 2, F.lit(0.0)).otherwise(
        tbc * 1.0 / (F.col("n_tokens") - 1)
    )
    return per_doc.join(tb, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        frac.alias("dup_token_frac"),
        tbc.alias("top_bigram_count"),
        bfrac.alias("top_bigram_frac"),
        # both signals gate, as documented: heavy in-doc repetition OR a
        # single dominating bigram drops the doc
        ((frac <= 0.9) & (bfrac <= 0.08)).alias("keep"),
    )


def _cluster_output(comp, flag_alias: str):
    """Shared epilogue of the two clustering gates: component id, size
    (window count over one row per doc), and the min-member flag."""
    w = Window.partitionBy("component")
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("component_id"),
        F.count("*").over(w).cast("long").alias("comp_size"),
        (F.col("id") == F.col("component")).alias(flag_alias),
    )


# Shared planted-PII recipe: a deterministic slice of docs gets an email
# and an IPv4 appended so the redaction path is genuinely exercised (the
# synthetic corpus contains no organic PII). Spark and the oracle build
# the IDENTICAL string, so digests must agree bit for bit.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@q(
    "text_pii_redact",
    oracle="""
    WITH planted AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN
                   text || ' reach user' || CAST(doc_id % 1000 AS VARCHAR)
                        || '@mail' || CAST(doc_id % 10 AS VARCHAR)
                        || '.com from 10.' || CAST(doc_id % 256 AS VARCHAR)
                        || '.0.' || CAST(doc_id % 100 AS VARCHAR) || ' now'
               ELSE text END AS t2
        FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t2, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ips,
           md5(regexp_replace(
                 regexp_replace(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g')) AS redacted_md5
    FROM planted
    """,
    tags=("pipeline", "pii"),
)
def text_pii_redact(spark, sf_dir):
    """PII scrub: replace emails then IPv4s with typed placeholders and
    count what was removed. The corpus is synthetic, so a deterministic
    ``doc_id % 7`` slice first gets real-looking PII appended — the
    oracle builds the identical string, making the md5 of the redacted
    text a bit-level proof that both engines' regex engines (Java regex
    vs RE2) agree on these patterns.

    Scale shape: pure per-row JVM expressions (concat / regexp_replace /
    regexp_count / md5) — embarrassingly parallel, no shuffle at all.
    """
    planted = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" reach user"),
                (F.col("doc_id") % 1000).cast("string"),
                F.lit("@mail"),
                (F.col("doc_id") % 10).cast("string"),
                F.lit(".com from 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".0."),
                (F.col("doc_id") % 100).cast("string"),
                F.lit(" now"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("t2"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("t2"), _EMAIL_RE, "<EMAIL>"), _IP_RE, "<IP>"
    )
    return planted.select(
        "doc_id",
        F.regexp_count(F.col("t2"), F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("t2"), F.lit(_IP_RE)).cast("long").alias("n_ips"),
        F.md5(redacted.cast("binary")).alias("redacted_md5"),
    )


@q(
    "text_chunk_sliding",
    oracle="""
    WITH base AS (
        SELECT doc_id, text, length(text) AS L,
               CASE WHEN length(text) <= 200 THEN 1
                    ELSE ((length(text) - 200 + 149) // 150) + 1 END AS n_chunks
        FROM documents),
    chunks AS (
        SELECT doc_id, i AS chunk_id,
               substring(text, (i - 1) * 150 + 1, 200) AS chunk
        FROM base, UNNEST(generate_series(1, n_chunks)) AS g(i))
    SELECT doc_id, chunk_id,
           CAST(length(chunk) AS BIGINT) AS chunk_len,
           md5(chunk) AS chunk_md5
    FROM chunks
    """,
    tags=("pipeline", "chunking"),
)
def text_chunk_sliding(spark, sf_dir):
    """Sliding-window chunker (RAG / long-context prep): 200-char chunks
    with 50-char overlap (stride 150), 1-based chunk ids, the short final
    chunk kept. Chunk count is pure integer arithmetic so both engines
    agree exactly; chunk content is verified by md5.

    Scale shape: ``sequence`` + ``explode`` + ``substring`` — one narrow
    JVM pass, output rows ~L/150 per doc, no shuffle. At 100 TB this
    is the map-side prelude to a tokenizer, exactly where it belongs.
    """
    base = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.expr(
            "CASE WHEN length(text) <= 200 THEN 1 "
            "ELSE ((length(text) - 200 + 149) div 150) + 1 END"
        ).alias("n_chunks"),
    )
    chunks = base.select(
        "doc_id",
        F.explode(F.expr("sequence(1, n_chunks)")).alias("chunk_id"),
        "text",
    ).select(
        "doc_id",
        "chunk_id",
        F.expr("substring(text, (chunk_id - 1) * 150 + 1, 200)").alias("chunk"),
    )
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.length("chunk").cast("long").alias("chunk_len"),
        F.md5(F.col("chunk").cast("binary")).alias("chunk_md5"),
    )


@q(
    "dedup_components",
    oracle="""
    WITH RECURSIVE fp AS (
        SELECT doc_id, md5(trim(text)) AS f FROM documents),
    gm AS (SELECT f, min(doc_id) AS m FROM fp GROUP BY f),
    star AS (
        SELECT fp.doc_id AS src, gm.m AS dst
        FROM fp JOIN gm ON fp.f = gm.f WHERE fp.doc_id <> gm.m),
    chain AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id - 1
        WHERE a.doc_id % 20 <> 0),
    skip AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id - 140
        WHERE a.doc_id % 100 = 7),
    e0 AS (
        SELECT src, dst FROM star
        UNION SELECT src, dst FROM chain
        UNION SELECT src, dst FROM skip),
    edges AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
    reach(id, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
    comp AS (SELECT id AS doc_id, min(label) AS component_id FROM reach GROUP BY id)
    SELECT doc_id, component_id,
           CAST(count(*) OVER (PARTITION BY component_id) AS BIGINT) AS comp_size,
           (doc_id = component_id) AS is_canonical
    FROM comp
    """,
    tags=("pipeline", "dedup", "graph"),
)
def dedup_components(spark, sf_dir):
    """Near-dup cluster assignment: transitive closure over a pair graph,
    component id = min reachable doc_id, one canonical doc per cluster —
    the step that turns LSH pair output into retention decisions (a~b,
    b~c must keep exactly one of {a,b,c} even though a~c was never a
    pair). Runs :func:`connected_components` (min-label propagation with
    path compression, O(log diameter) rounds; see operators/components.py
    for the 100 TB posture).

    Edge set (deterministic, both engines build it identically): exact-
    duplicate stars (every doc -> its fingerprint group's min id; empty
    on this corpus but the production edge family), within-block chains
    (doc_id -> doc_id - 1 unless doc_id % 20 == 0: diameter-19 paths
    that single-hop closure would get wrong), and cross-block skip links
    (doc_id % 100 == 7 -> doc_id - 140: merges distant chains, so the
    closure is genuinely multi-hop). The oracle is an independent
    algorithm entirely — DuckDB's recursive-CTE transitive closure —
    so agreement checks the fixpoint itself, not a reimplementation.
    """
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.trim(F.col("text")).cast("binary")).alias("f")
    )
    gm = docs.groupBy("f").agg(F.min("doc_id").alias("m"))
    star = (
        docs.join(gm, "f")
        .where(F.col("doc_id") != F.col("m"))
        .select(F.col("doc_id").alias("src"), F.col("m").alias("dst"))
    )
    ids = docs.select("doc_id")
    b = ids.select(F.col("doc_id").alias("b_id"))
    chain = (
        ids.where(F.col("doc_id") % 20 != 0)
        .join(b, F.col("b_id") == F.col("doc_id") - 1)
        .select(F.col("doc_id").alias("src"), F.col("b_id").alias("dst"))
    )
    skip = (
        ids.where(F.col("doc_id") % 100 == 7)
        .join(b, F.col("b_id") == F.col("doc_id") - 140)
        .select(F.col("doc_id").alias("src"), F.col("b_id").alias("dst"))
    )
    edges = star.union(chain).union(skip)
    comp = connected_components(ids, edges, id_col="doc_id")
    return _cluster_output(comp, "is_canonical")


@q(
    "pipeline_domain_mix",
    oracle="""
    WITH per_src AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source)
    SELECT source, n_docs, n_tokens,
           round(sqrt(n_tokens) / sum(sqrt(n_tokens)) OVER (), 6) AS mix_weight
    FROM per_src
    """,
    tags=("pipeline", "mixing"),
)
def pipeline_domain_mix(spark, sf_dir):
    """Domain-mixture weighting: per-source token mass -> temperature-
    scaled (alpha = 0.5, i.e. sqrt) sampling weights, the standard
    up-weight-the-tail recipe for deciding how often each domain is
    drawn during training (cf. multilingual sampling in XLM-R).

    Scale shape: token counting is a map-side ``size(split(...))`` (no
    explode — the array is counted, never shuffled), the per-source
    aggregate is partial-agg friendly, and the normalizing window runs
    over ONE row per source (tens of rows), so the single-partition
    exchange is trivial by construction.
    """
    per_src = (
        tbl(spark, sf_dir, "documents")
        .select("source", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("nt"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
        )
    )
    total = F.sum(F.sqrt(F.col("n_tokens"))).over(Window.partitionBy())
    return per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.sqrt(F.col("n_tokens")) / total, 6).alias("mix_weight"),
    )


@q(
    "pipeline_dedup_retention",
    oracle="""
    WITH RECURSIVE toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS g(i)),
    cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    pair AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    dup AS (
        SELECT doc_a, doc_b FROM pair
        JOIN cnt ca ON ca.doc_id = doc_a
        JOIN cnt cb ON cb.doc_id = doc_b
        WHERE inter * 1.0 / (ca.c + cb.c - inter) >= 0.9),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM dup
              UNION SELECT doc_b AS src, doc_a AS dst FROM dup),
    reach(id, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
    comp AS (SELECT id AS doc_id, min(label) AS component_id FROM reach GROUP BY id)
    SELECT doc_id, component_id,
           CAST(count(*) OVER (PARTITION BY component_id) AS BIGINT) AS comp_size,
           (doc_id = component_id) AS kept
    FROM comp
    """,
    tags=("pipeline", "dedup", "graph"),
)
def pipeline_dedup_retention(spark, sf_dir):
    """The COMPLETE production dedup pipeline in one plan: MinHash-LSH
    candidates -> exact-Jaccard verify (>= 0.9, the dedup_minhash_lsh
    two-stage shape) -> connected components over the verified pairs ->
    keep exactly the min-id doc of every duplicate cluster. This is the
    composition users actually run; each stage is individually gated
    elsewhere (dedup_minhash_lsh, dedup_components) and the whole chain
    is verified here against an end-to-end SQL oracle: exhaustive
    O(n^2) Jaccard pairs closed by DuckDB's recursive CTE — both dedup
    stages AND the closure recomputed by an independent engine.

    Honest caveat on the gate (not the operator): LSH recall is
    probabilistic. A pair at exactly the 0.9 threshold shares no band
    w.p. (1 - 0.9^4)^16 ~= 4e-8, and Spark's candidate stage hashes
    shingles (xxhash64) while the oracle compares shingle STRINGS — with
    fixed seeds any miss/collision is deterministic per corpus, so a
    regenerated testdata set could in principle disagree here while both
    engines are internally correct. The exact-verify stage makes false
    POSITIVES impossible; only a vanishing near-threshold false negative
    could differ."""
    from river_spark.operators.dedup import ngram_jaccard_pairs
    from river_spark.operators.dedup import (
        estimate_filtered_candidates,
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    docs = tbl(spark, sf_dir, "documents")
    sh = shingles(docs, "doc_id", "text", 3, hashed=True, distinct=False)
    sigs = minhash_signatures(sh, 64)
    cand = lsh_candidate_pairs(sigs, bands=16, sig_len=64)
    # estimate prefilter: family-pair guard, miss 2.4e-8 (see
    # estimate_filtered_candidates) — same order as the banding miss
    # documented above
    cand = estimate_filtered_candidates(sigs, cand, margin_est=0.65)
    cand_ids = cand.select(
        F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
    ).distinct()
    cand_docs = docs.join(cand_ids, "doc_id", "left_semi")
    dup = ngram_jaccard_pairs(cand_docs, "doc_id", "text", 3, threshold=0.9)
    ids = docs.select("doc_id")
    comp = connected_components(
        ids,
        dup.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        id_col="doc_id",
    )
    return _cluster_output(comp, "kept")
