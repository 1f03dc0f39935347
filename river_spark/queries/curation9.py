"""Curation wave 9 (round 9): training-mix assembly primitives — the
arithmetic between "corpus is clean" and "corpus is a training run":
budgeted selection, mix rebalancing, balanced sharding, embedding-space
feature screening, and vocabulary-growth auditing.

Bit-exactness rules (tests/test_oracle.py): token counts, shard ids and
selections are exact integers; single-division ratios emit raw doubles
(identical operation trees); variance/mean sums round to 6 decimals
(summation-order dependent).

Reference parity: none — these extend the reference's data model with
the LLM-pipeline operations SURVEY section 2 lists as first-class
additions.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import tbl

_TOKEN_BUDGET = 600
_N_BALANCE_SHARDS = 4
_VOCAB_CHECKPOINTS = (50, 100, 250, 500)


def _tok_array(col="text"):
    return F.split(F.trim(col), r"\s+")


@q(
    "pipeline_token_budget_pack",
    oracle=f"""
    WITH d AS (
        SELECT source, doc_id,
               len(regexp_split_to_array(trim(text), '\\s+')) AS toks,
               (1000 * len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))))
                 // len(regexp_split_to_array(trim(text), '\\s+')) AS div_pm
        FROM documents),
    c AS (
        SELECT source, toks,
               sum(toks) OVER (
                   PARTITION BY source ORDER BY div_pm DESC, doc_id) AS cum
        FROM d)
    SELECT source,
           CAST(count(*) FILTER (cum <= {_TOKEN_BUDGET}) AS BIGINT) AS n_selected,
           CAST(coalesce(sum(toks) FILTER (cum <= {_TOKEN_BUDGET}), 0) AS BIGINT)
             AS tokens_selected
    FROM c GROUP BY source
    """,
    tags=("pipeline", "curation", "budget"),
)
def pipeline_token_budget_pack(spark, sf_dir):
    """Greedy per-source selection under a token budget: rank each
    source's documents by lexical diversity (per-mille distinct-token
    ratio, the repo's quality proxy for this corpus), admit documents
    while the running token total stays within budget — the exact
    mechanics of assembling a fixed-size training mix from ranked
    candidates. All outputs are exact integers (integer-division
    diversity, integer cumulative sums).

    100 TB posture (round 11): source is a ~20-value key, so a plain
    per-source ordered window serializes each source's entire corpus in
    one task — the running total now goes through
    operators/stitched_lag.stitched_prefix_sum with the tie-splitting
    struct(-div_pm, doc-range) bucket (lexicographically monotone in
    the (div_pm DESC, doc_id) order; the doc-range leg splits equal-
    diversity tie mass across tasks). Row-identical to the plain
    window, so the oracle holds."""
    from river_spark.operators.stitched_lag import stitched_prefix_sum

    d = tbl(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(_tok_array()).alias("toks"),
        F.expr(
            "(1000 * size(array_distinct(split(trim(text), '\\\\s+'))))"
            " div size(split(trim(text), '\\\\s+'))"
        ).alias("div_pm"),
    ).withColumn("neg_div", -F.col("div_pm"))
    c = stitched_prefix_sum(
        d,
        key_cols=["source"],
        order_cols=["neg_div", "doc_id"],
        value_col="toks",
        bucket=F.struct(
            F.col("neg_div"), F.expr("doc_id div 4096").alias("dr")
        ),
        out_col="cum",
    ).select("source", "toks", "cum")
    sel = F.col("cum") <= _TOKEN_BUDGET
    return c.groupBy("source").agg(
        F.count(F.when(sel, 1)).alias("n_selected"),
        F.coalesce(F.sum(F.when(sel, F.col("toks"))), F.lit(0)).alias("tokens_selected"),
    )


@q(
    "pipeline_mix_rebalance",
    oracle="""
    WITH s AS (
        SELECT source,
               sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS toks
        FROM documents GROUP BY source),
    t AS (SELECT sum(toks) AS total, count(*) AS n_src FROM s)
    SELECT source,
           CAST(toks AS BIGINT) AS src_tokens,
           (CAST(total AS DOUBLE) / n_src) / toks AS weight
    FROM s, t
    """,
    tags=("pipeline", "curation", "mixing"),
)
def pipeline_mix_rebalance(spark, sf_dir):
    """Per-source sampling weights that rebalance the corpus to a
    uniform token mix: weight = (total/n_sources)/source_tokens, so
    weight > 1 sources get upsampled — the data-mixing step every
    multi-source training recipe runs. The weight is two IEEE divisions
    over exact integers, the same tree in both engines: bit-identical
    raw doubles, no rounding in the gate.

    100 TB posture: one map-side-combinable agg to 20 rows; the totals
    row broadcast-crossJoins back (1-row side, within the plan-lint
    bound)."""
    s = tbl(spark, sf_dir, "documents").groupBy("source").agg(
        F.sum(F.size(_tok_array())).alias("toks")
    )
    t = s.agg(
        F.sum("toks").alias("total"), F.count("*").alias("n_src")
    )
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        F.col("toks").alias("src_tokens"),
        ((F.col("total").cast("double") / F.col("n_src")) / F.col("toks")).alias("weight"),
    )


@q(
    "pipeline_shard_balance",
    oracle=f"""
    WITH r AS (
        SELECT source, n_chars,
               row_number() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents)
    SELECT source,
           CAST((rn - 1) % {_N_BALANCE_SHARDS} AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars
    FROM r GROUP BY 1, 2
    """,
    tags=("pipeline", "curation", "sharding"),
)
def pipeline_shard_balance(spark, sf_dir):
    """Size-balanced shard assignment: rank each source's documents by
    length and deal them round-robin into K shards — the classic
    longest-first balancing that keeps per-shard token totals within
    one document of each other (vs. hash sharding's sqrt(n) spread).
    Output is the per-(source, shard) audit a packing job checks before
    writing. Exact integers throughout.

    100 TB posture (round 11): source is a ~20-value key, so the plain
    per-source rank window serialized each source in one task; the
    longest-first rank now runs stitched with the tie-splitting
    struct(-n_chars, doc-range) bucket (row-identical, oracle
    unchanged). Shard assignment stays rank arithmetic."""
    from river_spark.operators.stitched_lag import stitched_row_number

    r = stitched_row_number(
        tbl(spark, sf_dir, "documents")
        .select("source", "n_chars", "doc_id")
        .withColumn("neg_chars", -F.col("n_chars")),
        key_cols=["source"],
        order_cols=["neg_chars", "doc_id"],
        bucket=F.struct(
            F.col("neg_chars"), F.expr("doc_id div 4096").alias("dr")
        ),
        out_col="rn",
    ).select("source", "n_chars", "rn")
    return r.groupBy(
        "source", ((F.col("rn") - 1) % _N_BALANCE_SHARDS).cast("bigint").alias("shard")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("chars"),
    )


@q(
    "emb_dim_variance",
    oracle="""
    WITH ex AS (
        SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings, (SELECT unnest(range(1, 65)) AS i) t)
    SELECT dim,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(x) / count(*), 6) AS mean,
           round(sum(x * x) / count(*)
                 - (sum(x) / count(*)) * (sum(x) / count(*)), 6) AS var_pop
    FROM ex GROUP BY dim
    """,
    tags=("embeddings", "stats", "feature_screen"),
)
def emb_dim_variance(spark, sf_dir):
    """Per-dimension mean and population variance of the embedding
    matrix — the feature screen that finds dead dimensions (var ~ 0
    after a bad projection) and scale outliers before indexing. All 64
    dims are emitted (no top-k: selecting on a float rank would make
    the row SET order-sensitive); sums of doubles take round-6 (the
    repo's order-dependent-sum discipline).

    100 TB posture: posexplode then one map-side-combinable hash agg to
    64 rows; at real scale the same shape runs as a single pass with
    partial aggregation per partition."""
    ex = tbl(spark, sf_dir, "embeddings").select(
        F.posexplode("embedding").alias("dim", "xf")
    ).select(
        F.col("dim").cast("long").alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    sum_x = F.sum("x")
    n = F.count("*")
    return ex.groupBy("dim").agg(
        n.alias("n"),
        F.round(sum_x / n, 6).alias("mean"),
        F.round(
            F.sum(F.col("x") * F.col("x")) / n - (sum_x / n) * (sum_x / n), 6
        ).alias("var_pop"),
    )


@q(
    "text_vocab_growth",
    oracle=f"""
    WITH toks AS (
        SELECT lower(unnest(regexp_split_to_array(trim(text), '\\s+'))) AS tok,
               doc_id
        FROM documents),
    first_seen AS (
        SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY tok),
    cp AS (SELECT unnest([{", ".join(str(c) for c in _VOCAB_CHECKPOINTS)}])
               AS checkpoint)
    SELECT checkpoint,
           CAST(count(*) FILTER (first_doc <= checkpoint) AS BIGINT) AS vocab
    FROM first_seen, cp GROUP BY checkpoint
    """,
    tags=("text", "vocabulary", "heaps_law"),
)
def text_vocab_growth(spark, sf_dir):
    """Vocabulary-growth (Heaps' law) curve: distinct-token count after
    the first N documents, for a fixed checkpoint ladder — the
    diminishing-returns audit that tells you whether more of the same
    source still adds new vocabulary. Computed via each token's
    first-seen doc_id (one agg), so the curve needs no per-prefix
    rescan. Exact integers.

    100 TB posture: explode + one hash agg by token (map-side
    combinable); the 4-row checkpoint table broadcast-crossJoins
    against the token-grain rollup, within the plan-lint bound."""
    toks = tbl(spark, sf_dir, "documents").select(
        F.explode(_tok_array()).alias("tok0"), "doc_id"
    ).select(F.lower("tok0").alias("tok"), "doc_id")
    first_seen = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    cp = spark.createDataFrame(
        [(c,) for c in _VOCAB_CHECKPOINTS], "checkpoint int"
    )
    return (
        first_seen.crossJoin(F.broadcast(cp))
        .groupBy("checkpoint")
        .agg(F.count(F.when(F.col("first_doc") <= F.col("checkpoint"), 1)).alias("vocab"))
    )
