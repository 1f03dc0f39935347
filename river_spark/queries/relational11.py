"""Relational wave 11 (round 8, session 4): exact distributed
statistics, graph skew profiling, skew-join machinery, and training
recipe/vocabulary plumbing.

- ``agg_corr_exact``: Pearson correlation and OLS slope from EXACT
  integer sufficient statistics — the order-independent way to do
  distributed correlation (float-accumulator corr is summation-order
  dependent; integer partials are not).
- ``graph_degree_histogram``: log2-bucketed degree histogram of the
  co-purchase graph — the skew profile that decides graph partitioning.
- ``join_salted_skew``: deterministic key-salting around a shuffle
  join — the standard hot-key defense when the small side is too big to
  broadcast; the oracle is the plain unsalted join.
- ``pipeline_epoch_recipe``: domain-repeat (epoch) allocation under a
  token budget with temperature-smoothed weights and a 4-epoch cap —
  the "data recipe" table a training run consumes.
- ``text_vocab_coverage``: per-document OOV rate against a corpus-
  derived top-K vocabulary — tokenizer-coverage QA.

Bit-exactness rules follow tests/test_oracle.py: integer outputs where
possible; double expressions are written with the SAME operation tree
in Spark and DuckDB over exact integer inputs, so IEEE evaluation is
bit-identical (sqrt/division/multiplication are correctly rounded).

Reference parity: the reference engine (pbotros/river) has no
relational layer (its surface is the stream transport,
/root/reference/cpp/src/writer.cpp); these extend the analytics surface
the brief requires.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import tbl

_SALT_FANOUT = 8
_EPOCH_BUDGET_TOKENS = 1_000_000
_EPOCH_CAP_X100 = 400  # at most 4 epochs per domain
_VOCAB_K = 512
_DEG_MIN_SUP = 2  # same support floor as the rest of the graph family


# ---------------------------------------------------------------------------
# Exact integer-statistic correlation
# ---------------------------------------------------------------------------
@q(
    "agg_corr_exact",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sy,
               CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS syy,
               CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sxy
        FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_qty_price,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope_cents_per_qty
    FROM s
    """,
    tags=("agg", "stats", "exact"),
)
def agg_corr_exact(spark, sf_dir):
    """Pearson correlation + OLS slope of (quantity, price-in-cents)
    per return flag, computed from exact integer sufficient statistics
    (n, Σx, Σy, Σx², Σy², Σxy as bigints) with floating point entering
    only AFTER aggregation. This is the scale-correct distributed
    correlation: the integer partials are associative and
    order-independent (a float-accumulator corr() drifts with
    partition order and count), and the final double expression is the
    same operation tree in both engines over identical inputs, hence
    bit-identical IEEE results with NO rounding in the gate.

    The products are taken per-row in int64 (max term qty*cents ≈ 5e8,
    summing ~6e9 rows before overflow risk); at true 100 TB row counts
    the partials widen to DECIMAL(38,0) — same shape, wider lanes.
    Cross-products of SUMS (n·Σxy …) are computed in doubles
    deliberately: they exceed int64, and double rounding there is
    deterministic and identical across engines."""
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    qty = F.col("l_quantity").cast("bigint")
    s = (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(qty).alias("sx"),
            F.sum(cents).alias("sy"),
            F.sum(qty * qty).alias("sxx"),
            F.sum(cents * cents).alias("syy"),
            F.sum(qty * cents).alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    cov_n = nd * sxy - sx * sy
    return s.select(
        "l_returnflag",
        "n",
        (cov_n / (F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy))).alias(
            "corr_qty_price"
        ),
        (cov_n / (nd * sxx - sx * sx)).alias("slope_cents_per_qty"),
    )


# ---------------------------------------------------------------------------
# Degree histogram (graph skew profile)
# ---------------------------------------------------------------------------
@q(
    "graph_degree_histogram",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
        SELECT a.p AS pa, b.p AS pb
        FROM ob a JOIN ob b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p HAVING count(*) >= 2
    ), und AS (
        SELECT pa AS u FROM e UNION ALL SELECT pb AS u FROM e
    ), deg AS (
        SELECT u, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u
    )
    SELECT CAST(length(printf('%b', d)) AS INT) AS deg_bucket,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(d) AS BIGINT) AS sum_degree,
           min(u) AS min_node, max(u) AS max_node
    FROM deg GROUP BY 1
    """,
    tags=("graph", "histogram", "skew"),
)
def graph_degree_histogram(spark, sf_dir):
    """Log2-bucketed degree histogram of the part co-purchase graph —
    the skew profile that tells you BEFORE running pagerank/triangles
    whether a hot vertex will dominate a shuffle partition (the input
    to salting / high-degree-vertex-splitting decisions). Bucket is
    the binary bit-length of the degree (floor(log2 d)+1) — computed
    by string length of the binary representation, an INTEGER path in
    both engines, because floor(log2(x)) through libm floats is not
    guaranteed exact at power-of-two boundaries.

    100 TB posture: degree is one hash agg over the edge list; the
    histogram is a second agg over |V| rows; nothing quadratic and
    nothing driver-side. The expensive subtree (support-filtered
    co-purchase edges) is the graph family's shared shape — AQE reuses
    the exchange when several graph queries run in one session."""
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ob = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = ob.alias("a"), ob.alias("b")
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= _DEG_MIN_SUP)
        .select("pa", "pb")
    )
    und = e.select(F.col("pa").alias("u")).unionByName(e.select(F.col("pb").alias("u")))
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    return (
        deg.groupBy(F.length(F.expr("bin(d)")).cast("int").alias("deg_bucket"))
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum("d").alias("sum_degree"),
            F.min("u").alias("min_node"),
            F.max("u").alias("max_node"),
        )
    )


# ---------------------------------------------------------------------------
# Salted shuffle join
# ---------------------------------------------------------------------------
@q(
    "join_salted_skew",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("join", "skew", "salt"),
)
def join_salted_skew(spark, sf_dir):
    """Deterministic key-salting around a shuffle join — the manual
    hot-key defense for when the dimension side is too large to
    broadcast AND one join key carries a disproportionate share of the
    fact rows (AQE's skew-join split handles sort-merge stragglers at
    map granularity; salting is the stronger medicine that fixes the
    hash distribution itself). The fact side gets salt = event_id mod
    F (deterministic — reproducible plans, no rand()); the dimension
    side is exploded F ways so every (key, salt) pair finds its match;
    the join key becomes (key, salt), spreading a hot key over F
    reducers. shuffle_hash hint keeps the demo honest: a broadcast
    join would make salting a no-op.

    The oracle is the PLAIN unsalted join — proving the salt is pure
    plan surgery with zero semantic effect. Post-join aggregation is
    two-phase exactly like agg_salted_twophase: partials on (segment,
    salt shards) fold into the final per-segment row.

    Companion to ``join_salted`` (scale_ops.py), which gates the
    packaged ``operators/skew.salted_join`` on the lineitem⋈part pair;
    this entry builds the salt inline on a different substrate
    (events⋈customer) and pins the shuffle_hash hint so a broadcast
    can't silently make the technique a no-op."""
    ev = tbl(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.col("event_id"), F.lit(_SALT_FANOUT)).cast("int")
    )
    cust = (
        tbl(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT_FANOUT - 1)))
        )
        .withColumn("salt", F.col("salt").cast("int"))
    )
    joined = ev.hint("shuffle_hash").join(
        cust,
        (ev.user_id == cust.c_custkey) & (ev.salt == cust.salt),
    )
    return (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Epoch allocation under a token budget
# ---------------------------------------------------------------------------
@q(
    "pipeline_epoch_recipe",
    oracle="""
    WITH per_src AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
    w AS (
        SELECT source, n_docs, n_tokens,
               sqrt(CAST(n_tokens AS DOUBLE))
               / sum(sqrt(CAST(n_tokens AS DOUBLE))) OVER () AS wt
        FROM per_src)
    SELECT source, n_docs, n_tokens,
           CAST(least(floor(1000000 * wt / CAST(n_tokens AS DOUBLE) * 100), 400)
                AS BIGINT) AS epochs_x100,
           CAST(n_tokens * CAST(least(floor(1000000 * wt / CAST(n_tokens AS DOUBLE) * 100), 400)
                               AS BIGINT) // 100 AS BIGINT) AS sampled_tokens
    FROM w
    """,
    tags=("pipeline", "mixing", "training"),
)
def pipeline_epoch_recipe(spark, sf_dir):
    """Epoch allocation (the "data recipe"): given a total token
    budget, each domain's temperature-smoothed weight (alpha = 0.5,
    same smoothing as pipeline_domain_mix) decides how many epochs of
    that domain the run consumes — floored to hundredths and capped at
    4 epochs (the repetition ceiling after which data reuse measurably
    degrades models; cf. the data-constrained scaling literature).
    Output is the per-domain recipe row: raw tokens, epochs_x100 as an
    INTEGER fixed-point, and the sampled token count as exact integer
    arithmetic on that fixed-point — so the gate compares integers,
    not float formatting.

    100 TB posture: one token-counting agg (map-side size(split),
    tokens never exploded), a window over one row per domain, and
    pure expression math after that — the whole recipe is metadata-
    sized from the first shuffle on."""
    per_src = (
        tbl(spark, sf_dir, "documents")
        .select("source", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("nt"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("nt").alias("n_tokens"))
    )
    ntd = F.col("n_tokens").cast("double")
    wt = F.sqrt(ntd) / F.sum(F.sqrt(ntd)).over(Window.partitionBy())
    epochs = F.least(
        F.floor(F.lit(_EPOCH_BUDGET_TOKENS) * wt / ntd * 100),
        F.lit(_EPOCH_CAP_X100).cast("bigint"),
    ).cast("bigint")
    return (
        per_src.withColumn("epochs_x100", epochs)
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "epochs_x100",
            F.expr("n_tokens * epochs_x100 div 100")
            .cast("bigint")
            .alias("sampled_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage / OOV rate
# ---------------------------------------------------------------------------
@q(
    "text_vocab_coverage",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
        FROM documents),
    vocab AS (
        SELECT w FROM (SELECT w, count(*) AS c FROM toks GROUP BY w)
        ORDER BY c DESC, w LIMIT 512),
    flags AS (
        SELECT t.doc_id, CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
        FROM toks t LEFT JOIN vocab v ON t.w = v.w)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(oov) AS BIGINT) AS n_oov,
           sum(oov) * 1.0 / count(*) AS oov_rate
    FROM flags GROUP BY doc_id
    """,
    tags=("text", "vocab", "tokenizer"),
)
def text_vocab_coverage(spark, sf_dir):
    """Per-document out-of-vocabulary rate against a corpus-derived
    top-K vocabulary — the tokenizer-coverage QA a pipeline runs
    before committing to a vocab: documents whose OOV rate spikes are
    the ones a tokenizer will shred into bytes. Vocabulary = top 512
    words by corpus frequency with a deterministic (count desc, word)
    tiebreak at the cut line.

    100 TB posture: the vocab build is a word-histogram agg followed
    by TakeOrderedAndProject (top-K never sorts the full histogram);
    the K-row vocab is broadcast, so the token stream is NEVER
    shuffled by word for the coverage pass — tokens explode map-side,
    probe the broadcast hash, and fold straight into the per-doc agg,
    whose key (doc_id) matches the corpus partitioning. oov_rate is
    one exact-integer division."""
    toks = (
        tbl(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
        )
    )
    vocab = (
        toks.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(_VOCAB_K)
        .select("w")
    )
    flags = toks.join(
        F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "w", "left"
    ).select(
        "doc_id",
        F.when(F.col("in_vocab").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("oov"),
    )
    return flags.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("oov").alias("n_oov"),
        (F.sum("oov") * 1.0 / F.count("*")).alias("oov_rate"),
    )
