"""Curation wave 8 (round 8, session 3): tokenizer-training and
spectral primitives for the LLM-data pipeline.

- ``text_bpe_pair_counts``: one BPE tokenizer-training round — adjacent
  symbol-pair frequencies over the word histogram (count once per
  distinct word, weight by word frequency), top-20 merge candidates.
- ``emb_power_iteration``: one power-iteration step toward the dominant
  eigenvector of the embedding Gram matrix, computed dimension-parallel
  without ever materializing a matrix.

Bit-exactness rules follow tests/test_oracle.py: BPE is pure integer
counting; the power step's per-dimension sums are order-sensitive double
aggregations, rounded in-query to 6 decimals (tolerance 5e-7 against a
worst-case cross-engine summation-order drift of ~1e-11 at this scale).

Reference parity: the reference engine (pbotros/river) has no text or
vector layer; these extend the training-data-pipeline surface the brief
requires (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import tbl

_BPE_TOPK = 20
# documents' whitespace tokens max out at 8 chars (checked at sf0.001/
# 0.01/0.1); 64 is the oracle's lateral-free range cap with 8x headroom.
_BPE_MAX_WORD = 64


@q(
    "text_bpe_pair_counts",
    oracle=f"""
    WITH words AS (
        SELECT lower(unnest(regexp_split_to_array(trim(text), '\\s+'))) AS w
        FROM documents),
    wf AS (
        SELECT w, count(*) AS c FROM words WHERE length(w) >= 2 GROUP BY w),
    pairs AS (
        SELECT substr(w, i, 2) AS pair, sum(c) AS cnt
        FROM wf, (SELECT unnest(range(1, {_BPE_MAX_WORD})) AS i) t
        WHERE i < length(w)
        GROUP BY 1)
    SELECT pair, CAST(cnt AS BIGINT) AS cnt
    FROM pairs ORDER BY cnt DESC, pair LIMIT {_BPE_TOPK}
    """,
    tags=("text", "bpe", "tokenizer"),
)
def text_bpe_pair_counts(spark, sf_dir):
    """One round of BPE tokenizer training — the pair-frequency count
    that selects the next merge rule (Sennrich et al. 2016, the
    algorithm behind GPT/Llama tokenizers): words collapse to a
    frequency histogram FIRST (the classic BPE trick — a word repeated
    10^6 times is scanned once and weighted, not re-scanned), then each
    distinct word emits its adjacent character pairs via an in-row
    sequence explode, and pair counts aggregate weighted by word
    frequency. Top-20 candidates with a deterministic (count, pair)
    tiebreak; rank 1 IS the merge a trainer would apply, and iterating
    this query with the merged symbol table is distributed BPE training.

    100 TB posture: the word histogram is the scale firewall — corpus
    volume only changes the counts, not the histogram's cardinality
    (vocabulary-bounded), so the pair explode runs over |vocab| rows
    regardless of corpus size. Both aggregations are map-side-
    combinable hash aggs; the top-k is TakeOrderedAndProject over the
    (tiny) pair vocabulary."""
    words = tbl(spark, sf_dir, "documents").select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("w0")
    ).select(F.lower("w0").alias("w"))
    wf = words.filter(F.length("w") >= 2).groupBy("w").agg(F.count("*").alias("c"))
    # Cap positions at _BPE_MAX_WORD-1 to mirror the oracle's
    # lateral-free range(1, _BPE_MAX_WORD): a 65+-char whitespace token
    # would otherwise emit pairs here that the oracle never sees.
    pairs = wf.select(
        "w",
        "c",
        F.explode(
            F.sequence(
                F.lit(1), F.least(F.length("w") - 1, F.lit(_BPE_MAX_WORD - 1))
            )
        ).alias("i"),
    ).select(F.expr("substring(w, i, 2)").alias("pair"), "c")
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(_BPE_TOPK)
    )


@q(
    "emb_power_iteration",
    oracle="""
    WITH ex AS (
        SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings, (SELECT unnest(range(1, 65)) AS i) t),
    dotted AS (
        SELECT dim, x, sum(x) OVER (PARTITION BY vec_id) AS dot FROM ex)
    SELECT dim, round(sum(x * dot), 6) AS s, CAST(count(*) AS BIGINT) AS n
    FROM dotted GROUP BY dim
    """,
    tags=("vectors", "spectral", "scale"),
)
def emb_power_iteration(spark, sf_dir):
    """One power-iteration step toward the dominant eigenvector of the
    embedding Gram matrix X^T X — the building block of PCA / spectral
    embedding quality checks — without materializing any matrix:
    s = X^T (X v0) with v0 = the all-ones probe, i.e. per-row dot
    products (a full-partition window sum over each row's 64 exploded
    components) followed by one dimension-parallel hash aggregation
    s_d = sum_rows x_d * dot. Iterating (with s renormalized as the next
    v) IS distributed power iteration; one step with a fixed v0 keeps
    the gate deterministic. Rounded to 6 decimals — tolerance 5e-7 vs
    ~1e-11 worst-case cross-engine summation-order drift.

    100 TB posture: both stages are shuffle-light — the dot product
    never leaves the row's partition (window keyed by vec_id =
    the explode's parent row), and the reduction moves exactly 64
    partial sums per mapper (dimension-keyed hash agg with map-side
    combine). The matrix X^T X (64x64 here, d^2 in general) is never
    formed; memory is O(d) per task. Same dimension-parallel idiom as
    emb_centroid_norms and emb_kmeans_update."""
    ex = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    dotted = ex.select(
        "dim", "x", F.sum("x").over(Window.partitionBy("vec_id")).alias("dot")
    )
    return dotted.groupBy("dim").agg(
        F.round(F.sum(F.col("x") * F.col("dot")), 6).alias("s"),
        F.count("*").alias("n"),
    )
