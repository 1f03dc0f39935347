"""Curation wave 7 (round 8, session 2): entity resolution, bitmap
audience intersection, and asymmetric containment dedup — three more
production pipeline staples, each with a bit-level DuckDB oracle.

- ``er_fuzzy_match``: blocked fuzzy record linkage (block on a
  deterministic key, Levenshtein within the block, per-record best
  match) — the classic ER candidate-generation shape.
- ``agg_bitmap_audience``: user-set intersections between event types
  via 63-bit-packed bitmap words + popcount, exact-verified in-query
  against the distinct-join answer.
- ``text_ngram_containment``: asymmetric near-dup detection
  (|A∩B| / min|A|,|B|) that catches doc-inside-doc cases symmetric
  Jaccard under-scores; reuses the dedup module's shingle machinery.

Reference parity: the reference engine (pbotros/river) has no curation
layer; these extend the LLM-pipeline surface the brief requires.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import tbl

# ---------------------------------------------------------------------------
# Blocked fuzzy entity resolution
# ---------------------------------------------------------------------------
_ER_MAXLEV = 1


@q(
    "er_fuzzy_match",
    oracle=f"""
    WITH p AS (
        SELECT p_partkey, p_name, split_part(p_name, ' ', 2) AS blk
        FROM part),
    cand AS (
        SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
               b.p_name AS b_name,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev
        FROM p a JOIN p b
          ON a.blk = b.blk AND a.p_partkey <> b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= {_ER_MAXLEV}),
    ranked AS (
        SELECT a_key, b_key, b_name, lev,
               count(*) OVER (PARTITION BY a_key) AS n_matches,
               row_number() OVER (
                   PARTITION BY a_key ORDER BY lev, b_key) AS rn
        FROM cand)
    SELECT a_key, CAST(n_matches AS BIGINT) AS n_matches,
           b_key AS best_key, lev AS best_lev, b_name AS best_name
    FROM ranked WHERE rn = 1
    """,
    tags=("er", "fuzzy", "dedup"),
)
def er_fuzzy_match(spark, sf_dir):
    """Blocked fuzzy record linkage over part names: block on the noun
    (second token) so candidate pairs form only within a block, score
    candidates by Levenshtein distance <= 1, and emit one row per
    matched record — its fuzzy-duplicate count and its best match
    (deterministic tie-break on (distance, key)). Emitting per-record
    aggregates, not raw pairs, is the production ER shape: the pair
    stream is quadratic-in-block, the record stream is linear.

    100 TB posture: ER at scale is entirely about the BLOCK key — the
    join is an equi-join on it (one shuffle each side), the quadratic
    edit-distance work is confined within blocks, and a skewed block is
    capped by compounding the key (noun+size, noun+brand) exactly like
    the df-cap in dedup_ngram_jaccard. Levenshtein runs JVM-side
    (whole-stage codegen), never in Python.

    Reference parity: extends the dedup family (SURVEY §2 Part B /
    training-data extensions); the reference has no string-matching
    surface."""
    p = tbl(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.split(F.col("p_name"), " ").getItem(1).alias("blk"),
    )
    # Pair-stage parallelism (r15): part is one row group at bench SFs,
    # so the probe side of the block join — where EVERY banded-DP pair
    # evaluation runs — was a single task with the other 31 cores idle.
    # Spreading the probe rows by key before the join costs one exchange
    # of (key, name, blk) — a few bytes/row against the quadratic pair
    # work it parallelizes; at scale the scan splits naturally and the
    # exchange stays rounding error next to the block shuffle. Explicit
    # partition count opts out of AQE's bytes-based coalescing (which is
    # blind to per-row join cost and would merge it back to one task).
    n_par = spark.sparkContext.defaultParallelism
    a = p.repartition(n_par, "p_partkey").alias("a")
    b = p.alias("b")
    # Per-pair cost control (r15): the block join emits ~|block|² pairs
    # (4.3 M at sf0.1) and the old shape ran a FULL O(|a|·|b|) Levenshtein
    # DP on every one. Two changes, same survivors, ~9x cheaper pair stage:
    # (1) a length prefilter — |len(a)-len(b)| <= maxlev is implied by
    #     lev <= maxlev, costs two ints per pair, and short-circuits the
    #     DP away for most pairs (codegen evaluates conjuncts in order);
    # (2) the THRESHOLDED levenshtein(l, r, k) builtin, which walks only
    #     the 2k+1 diagonal band and bails out early, returning -1 when
    #     the distance exceeds k — so `>= 0` is exactly `lev <= maxlev`,
    #     and the returned value IS the true distance for every survivor.
    lev_t = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), _ER_MAXLEV)
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_partkey") != F.col("b.p_partkey")),
        )
        .filter(
            (
                F.abs(F.length(F.col("a.p_name")) - F.length(F.col("b.p_name")))
                <= _ER_MAXLEV
            )
            & (lev_t >= 0)
        )
        .select(
            F.col("a.p_partkey").alias("a_key"),
            F.col("b.p_partkey").alias("b_key"),
            F.col("b.p_name").alias("b_name"),
            lev_t.cast("long").alias("lev"),
        )
    )
    wc = Window.partitionBy("a_key")
    wr = Window.partitionBy("a_key").orderBy("lev", "b_key")
    ranked = cand.select(
        "a_key",
        "b_key",
        "b_name",
        "lev",
        F.count("*").over(wc).cast("long").alias("n_matches"),
        F.row_number().over(wr).alias("rn"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "a_key",
        "n_matches",
        F.col("b_key").alias("best_key"),
        F.col("lev").alias("best_lev"),
        F.col("b_name").alias("best_name"),
    )


# ---------------------------------------------------------------------------
# Bitmap audience intersection
# ---------------------------------------------------------------------------
_BM_WORD = 63  # bits per int64 word; bit 63 unused (sign/overflow safety)


@q(
    "agg_bitmap_audience",
    oracle=f"""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    words AS (
        SELECT event_type, user_id // {_BM_WORD} AS widx,
               bit_or(1::BIGINT << (user_id % {_BM_WORD})) AS wrd
        FROM du GROUP BY 1, 2),
    type_cnt AS (SELECT event_type, count(*) AS cnt FROM du GROUP BY 1),
    bm AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(sum(bit_count(a.wrd & b.wrd)) AS BIGINT) AS users_both
        FROM words a JOIN words b
          ON a.widx = b.widx AND a.event_type < b.event_type
        GROUP BY 1, 2),
    exact AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS exact_both
        FROM du a JOIN du b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2)
    SELECT bm.type_a, bm.type_b, bm.users_both,
           CAST(ca.cnt AS BIGINT) AS users_a,
           CAST(cb.cnt AS BIGINT) AS users_b,
           bm.users_both * 1.0 / (ca.cnt + cb.cnt - bm.users_both)
               AS jaccard,
           CAST(CASE WHEN bm.users_both = coalesce(e.exact_both, 0)
                THEN 1 ELSE 0 END AS BIGINT) AS verified
    FROM bm
    JOIN type_cnt ca ON ca.event_type = bm.type_a
    JOIN type_cnt cb ON cb.event_type = bm.type_b
    LEFT JOIN exact e ON e.type_a = bm.type_a AND e.type_b = bm.type_b
    """,
    tags=("agg", "bitmap", "scale"),
)
def agg_bitmap_audience(spark, sf_dir):
    """Audience-overlap via bitmap index: pack each event type's
    distinct user set into 63-bit int64 words (word = user_id div 63,
    bit = user_id mod 63), intersect type pairs as
    sum(popcount(word_a & word_b)), and derive exact Jaccard overlap —
    then verify the bitmap answer in-query against the distinct-join
    count, so a packing bug flips the `verified` flag through the
    driver's hash gate. Bit 63 stays unused: 1<<63 overflows the
    oracle engine's signed shift, and 63 bits keeps every word
    arithmetic identical across engines (same rule as curation6's
    Bloom bitmap).

    100 TB posture: this is why warehouses keep bitmap/roaring indexes
    for audience queries — the pairwise intersection joins WORDS
    (|users| / 63 rows per type), not users, so a 10^9-user audience
    pair costs a ~16M-row equi-join instead of a 10^9-row shuffle,
    and the AND+popcount is embarrassingly parallel. The words table
    is the persistable artifact; the exact-join arm exists as the
    oracle-visible proof and would be dropped in production."""
    du = (
        tbl(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    words = du.groupBy(
        "event_type", F.expr(f"user_id DIV {_BM_WORD}").alias("widx")
    ).agg(
        F.bit_or(
            F.expr(f"shiftleft(cast(1 as bigint), cast(user_id % {_BM_WORD} as int))")
        ).alias("wrd")
    )
    type_cnt = du.groupBy("event_type").agg(F.count("*").alias("cnt"))
    a, b = words.alias("a"), words.alias("b")
    bm = (
        a.join(
            b,
            (F.col("a.widx") == F.col("b.widx"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.sum(F.bit_count(F.col("a.wrd").bitwiseAND(F.col("b.wrd"))))
            .cast("long")
            .alias("users_both")
        )
    )
    ea, eb = du.alias("ea"), du.alias("eb")
    exact = (
        ea.join(
            eb,
            (F.col("ea.user_id") == F.col("eb.user_id"))
            & (F.col("ea.event_type") < F.col("eb.event_type")),
        )
        .groupBy(
            F.col("ea.event_type").alias("type_a"),
            F.col("eb.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("exact_both"))
    )
    ca = type_cnt.select(
        F.col("event_type").alias("type_a"), F.col("cnt").alias("users_a")
    )
    cb = type_cnt.select(
        F.col("event_type").alias("type_b"), F.col("cnt").alias("users_b")
    )
    return (
        bm.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .join(F.broadcast(exact), ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "users_both",
            F.col("users_a").cast("long").alias("users_a"),
            F.col("users_b").cast("long").alias("users_b"),
            (
                F.col("users_both")
                * 1.0
                / (F.col("users_a") + F.col("users_b") - F.col("users_both"))
            ).alias("jaccard"),
            (F.col("users_both") == F.coalesce("exact_both", F.lit(0)))
            .cast("long")
            .alias("verified"),
        )
    )


# ---------------------------------------------------------------------------
# Asymmetric n-gram containment
# ---------------------------------------------------------------------------
_CONT_THRESHOLD = 0.9
_CONT_DF_CAP = 100_000


@q(
    "text_ngram_containment",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+1], ' ') AS s
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 1, 1))) AS g(i)),
    cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    pair AS (
        SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT CASE WHEN ca.c < cb.c OR (ca.c = cb.c AND da < db)
                THEN da ELSE db END AS doc_small,
           CASE WHEN ca.c < cb.c OR (ca.c = cb.c AND da < db)
                THEN db ELSE da END AS doc_big,
           CAST(least(ca.c, cb.c) AS BIGINT) AS small_size,
           CAST(inter AS BIGINT) AS inter,
           inter * 1.0 / least(ca.c, cb.c) AS containment
    FROM pair
    JOIN cnt ca ON ca.doc_id = da
    JOIN cnt cb ON cb.doc_id = db
    WHERE inter * 1.0 / least(ca.c, cb.c) >= {_CONT_THRESHOLD}
    """,
    tags=("dedup", "containment", "text"),
)
def text_ngram_containment(spark, sf_dir):
    """Asymmetric containment dedup: C(A,B) = |A∩B| / min(|A|,|B|) over
    2-token shingle sets, emitting (doc_small, doc_big) pairs with
    C >= 0.9 — the doc-inside-doc cases (quotes, boilerplate wrappers,
    prefix truncations) that symmetric Jaccard under-scores, because a
    short doc fully contained in a long one has J = |A|/|B| ~ 0 but
    C = 1. The smaller-set doc is canonically first (ties by id), so
    output orientation is deterministic in both engines.

    Same three-exchange shape as operators/dedup.ngram_jaccard_pairs
    (per-doc collect_set sharing the dedup exchange, window df-cap
    stop-shingle guard, in-index pair expansion carrying both
    denominators) — only the scoring ratio and pair orientation differ;
    see that function's docstring for the 100 TB shuffle analysis. The
    df_cap default stays far above any testdata shingle's document
    frequency, so the oracle remains exhaustively exact here."""
    from river_spark.operators.dedup import shingles

    docs = tbl(spark, sf_dir, "documents")
    sh = shingles(docs, "doc_id", "text", n=2, hashed=True, distinct=False)
    per_doc = sh.groupBy("doc_id").agg(F.collect_set("shingle").alias("ss"))
    base = per_doc.select(
        "doc_id", F.size("ss").alias("c"), F.explode("ss").alias("shingle")
    )
    # r15: the shingle window, the in-index pair expansion AND the pair
    # partial-aggregation all fuse into the stage below this exchange —
    # by far the query's heaviest (2-token shingles repeat heavily, so
    # pair volume is large). AQE coalesced that exchange to 2 partitions
    # by its small shuffled BYTES, blind to the quadratic per-row pair
    # work (29.9 s at sf0.1 on 2 of 32 cores). An explicit repartition
    # on the same key REPLACES the window's required exchange (hash
    # partitioning on shingle satisfies the window's distribution, so
    # exchange count is unchanged) and opts out of the coalesce.
    base = base.repartition(
        spark.sparkContext.defaultParallelism, "shingle"
    )
    shw = base.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    )
    index = (
        shw.filter((F.col("_df") > 1) & (F.col("_df") <= _CONT_DF_CAP))
        .groupBy("shingle")
        .agg(F.collect_list(F.struct("doc_id", "c")).alias("docs"))
    )
    pair_expr = F.explode(
        F.expr(
            "flatten(transform(docs, (x, i) -> "
            "transform(slice(docs, i + 2, size(docs)), y -> "
            "struct(least(x.doc_id, y.doc_id) as doc_a, "
            "greatest(x.doc_id, y.doc_id) as doc_b, "
            "if(x.doc_id < y.doc_id, x.c, y.c) as ca0, "
            "if(x.doc_id < y.doc_id, y.c, x.c) as cb0))))"
        )
    ).alias("p")
    pair = (
        index.select(pair_expr)
        .groupBy("p.doc_a", "p.doc_b")
        .agg(
            F.count("*").alias("inter"),
            F.max("p.ca0").alias("ca"),
            F.max("p.cb0").alias("cb"),
        )
    )
    cont = F.col("inter") * 1.0 / F.least("ca", "cb")
    small_first = (F.col("ca") < F.col("cb")) | (
        (F.col("ca") == F.col("cb")) & (F.col("doc_a") < F.col("doc_b"))
    )
    return pair.filter(cont >= _CONT_THRESHOLD).select(
        F.when(small_first, F.col("doc_a")).otherwise(F.col("doc_b")).alias("doc_small"),
        F.when(small_first, F.col("doc_b")).otherwise(F.col("doc_a")).alias("doc_big"),
        F.least("ca", "cb").cast("long").alias("small_size"),
        F.col("inter").cast("long").alias("inter"),
        cont.alias("containment"),
    )
