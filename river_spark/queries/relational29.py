"""Relational wave 29 (round 11): dyadic-exact EWMA smoothing,
temperature-scaled training-mix weights, deterministic blocklist
filtering, and PQ asymmetric-distance (ADC) top-k search.

Bit-exactness rules (tests/test_oracle.py): money goes integer-first
(cents = CAST(round(v*100) AS BIGINT)); the EWMA's dyadic alpha=1/2
weights are exact shifted-integer accumulators (the ev_ltv_halflife
precedent — weight 2^(15-age) over a 16-day frame keeps every product
far under 2^63), with ONE final division; PQ distances accumulate in
integer micro-units (round(d2*1e6) per table cell, summed exactly)
before the single unscaling division; sqrt is IEEE-correctly-rounded so
temperature weights only need round-6 where a cross-source SUM of
doubles enters.

Reference parity: none — training-pipeline analytics over the
reference's ingested-parquet data model.

100 TB posture notes live on each query docstring; the common theme is
that every join here is either equi-keyed on a generated (key, day)
grid, a fixed-K codebook broadcast, or inline hash math with no join at
all.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl, tbl

_EWMA_DAYS = 16  # dyadic frame: weight 2^(15-age), age in [0, 15]


@q(
    "ev_ewma_daily",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               sum(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2),
    pairs AS (
        SELECT d.event_type, d.day,
               p.cents * (1::BIGINT << (15 - date_diff('day', p.day, d.day)))
                 AS wcents,
               (1::BIGINT << (15 - date_diff('day', p.day, d.day))) AS w
        FROM daily d JOIN daily p
          ON d.event_type = p.event_type
         AND date_diff('day', p.day, d.day) BETWEEN 0 AND {_EWMA_DAYS - 1})
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(sum(wcents) AS DOUBLE) / CAST(sum(w) * 100 AS DOUBLE) AS ewma
    FROM pairs GROUP BY event_type, day
    """,
    tags=("events", "smoothing", "window"),
)
def ev_ewma_daily(spark, sf_dir):
    """Exponentially-weighted (alpha = 1/2 per day) moving average of
    daily value per event type over a 16-day frame — the smoothed rate
    line under every ops dashboard. Dyadic decay is EXACT: per-day
    cents are BIGINTs, each weighted term is cents << (15 - age), both
    accumulators sum as integers, and the only division is the final
    unscale (cookbook dyadic-decay rule; 16-day frame keeps the shifted
    products under 2^63 with ~5 orders of magnitude to spare).

    100 TB posture: the fact table collapses to a (type, day) rollup in
    one map-side-combinable agg; the frame is then an EQUI-join — each
    rollup row explodes to its 16 target days and joins on
    (type, target_day) — so the plan shuffles the tiny rollup on its
    natural key instead of range-joining or window-sorting anything.
    No broadcast hints; no per-type serialization."""
    ev = events_tbl(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("cents")
    )
    # each past day contributes to ages 0..15 ahead of itself
    contrib = daily.select(
        "event_type",
        F.col("day").alias("src_day"),
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_EWMA_DAYS - 1))).alias("age"),
    ).select(
        "event_type",
        F.expr("date_add(src_day, age)").alias("day"),
        F.expr("cents * shiftleft(1L, 15 - age)").alias("wcents"),
        F.expr("shiftleft(1L, 15 - age)").alias("w"),
    )
    # keep only target days that exist (join against the rollup's keys)
    return (
        contrib.join(daily.select("event_type", "day"), ["event_type", "day"])
        .groupBy("event_type", "day")
        .agg(F.sum("wcents").alias("swc"), F.sum("w").alias("sw"))
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            (
                F.col("swc").cast("double") / (F.col("sw") * 100).cast("double")
            ).alias("ewma"),
        )
    )


@q(
    "pipeline_temperature_mix",
    oracle="""
    WITH toks AS (
        SELECT source,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                 AS n
        FROM documents),
    s AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens
          FROM toks GROUP BY source),
    t AS (SELECT sum(n_tokens) AS total, sum(sqrt(CAST(n_tokens AS DOUBLE)))
                   AS z
          FROM s)
    SELECT source, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / t.total, 6) AS p_raw,
           round(sqrt(CAST(n_tokens AS DOUBLE)) / t.z, 6) AS p_temp,
           round((sqrt(CAST(n_tokens AS DOUBLE)) / t.z)
                 / (CAST(n_tokens AS DOUBLE) / t.total), 6) AS boost
    FROM s CROSS JOIN t
    """,
    tags=("pipeline", "mixing", "curation"),
)
def pipeline_temperature_mix(spark, sf_dir):
    """Temperature-scaled source sampling (the multilingual-LLM mixing
    rule p_s ∝ p_raw^alpha): with alpha = 1/2 the reweighting is
    sqrt(n_s) — IEEE sqrt is correctly rounded, so only the cross-source
    normalizer (a sum of a handful of doubles) needs the round-6 guard.
    ``boost`` is the up/down-sampling factor each source gets vs its
    natural share — the number a sampler actually consumes.

    100 TB posture: one map-side-combinable token-count agg to a
    sources-sized rollup; everything after runs on O(sources) rows. The
    1-row total joins as a fixed-cardinality cross join (Catalyst
    broadcasts scalar subqueries on its own)."""
    toks = tbl(spark, sf_dir, "documents").select(
        "source",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n"),
    )
    s = toks.groupBy("source").agg(F.sum("n").alias("n_tokens"))
    t = s.agg(
        F.sum("n_tokens").alias("total"),
        F.sum(F.sqrt(F.col("n_tokens").cast("double"))).alias("z"),
    )
    p_raw = F.col("n_tokens").cast("double") / F.col("total")
    p_temp = F.sqrt(F.col("n_tokens").cast("double")) / F.col("z")
    return s.crossJoin(t).select(
        "source",
        "n_tokens",
        F.round(p_raw, 6).alias("p_raw"),
        F.round(p_temp, 6).alias("p_temp"),
        F.round(p_temp / p_raw, 6).alias("boost"),
    )


_BLOCK_BUCKETS = 65536
_BLOCK_FRAC = 6553  # ~10% of token space
_BLOCK_RATE = 0.12


@q(
    "pipeline_blocklist_filter",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source,
               unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
        FROM documents),
    hits AS (
        SELECT doc_id, source, count(*) AS n_tokens,
               sum(CASE WHEN CAST(('0x' || substr(md5(t), 1, 4)) AS INT)
                        % {_BLOCK_BUCKETS} < {_BLOCK_FRAC}
                        THEN 1 ELSE 0 END) AS n_hits
        FROM tok GROUP BY 1, 2)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_hits > {_BLOCK_RATE} * n_tokens
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
           CAST(sum(n_hits) AS BIGINT) AS total_hits,
           round(CAST(sum(CASE WHEN n_hits > {_BLOCK_RATE} * n_tokens
                              THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             AS block_rate
    FROM hits GROUP BY source
    """,
    tags=("pipeline", "text", "curation"),
)
def pipeline_blocklist_filter(spark, sf_dir):
    """Blocklist-rate filtering (the safety/boilerplate gate every text
    pipeline runs): a document is blocked when more than 12% of its
    token occurrences hit the lexicon. The lexicon is a deterministic
    md5-bucket rule over the token (cookbook md5 trick) so both engines
    derive identical membership; in production the rule slot is a real
    term set.

    100 TB posture: membership is INLINE hash math — no lexicon join,
    no broadcast (a naive implementation broadcasts a corpus-derived
    vocab slice, the exact hazard the growth gate exists for). One
    explode + per-doc agg + per-source agg, all map-side combinable."""
    tok = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t"),
    )
    is_hit = (
        F.expr(
            f"pmod(cast(conv(substring(md5(t), 1, 4), 16, 10) as int), "
            f"{_BLOCK_BUCKETS})"
        )
        < _BLOCK_FRAC
    )
    hits = tok.groupBy("doc_id", "source").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(is_hit, 1).otherwise(0)).alias("n_hits"),
    )
    blocked = F.when(
        F.col("n_hits") > _BLOCK_RATE * F.col("n_tokens"), 1
    ).otherwise(0)
    return hits.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(blocked).cast("long").alias("n_blocked"),
        F.sum("n_hits").cast("long").alias("total_hits"),
        F.round(
            F.sum(blocked).cast("double") / F.count("*"), 6
        ).alias("block_rate"),
    )


_PQ_M, _PQ_S, _PQ_K = 4, 16, 4  # subspaces, dims each, codebook size
_PQ_QUERY_ID = 0  # deterministic query vector
_PQ_TOPK = 10


@q(
    "emb_pq_adc_search",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id AS k, embedding::DOUBLE[] AS v
          FROM embeddings WHERE vec_id < {_PQ_K}),
    qv AS (SELECT v FROM e WHERE vec_id = {_PQ_QUERY_ID}),
    m AS (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m),
    -- corpus PQ codes: nearest codebook entry per subspace
    d AS (
        SELECT e.vec_id, m.m, c.k,
               round(list_sum(list_transform(
                   list_zip(e.v[m.m*{_PQ_S}+1:m.m*{_PQ_S}+{_PQ_S}],
                            c.v[m.m*{_PQ_S}+1:m.m*{_PQ_S}+{_PQ_S}]),
                   p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) AS dist2
        FROM e CROSS JOIN m CROSS JOIN c),
    code AS (
        SELECT vec_id, m, k AS code FROM (
            SELECT vec_id, m, k,
                   row_number() OVER (PARTITION BY vec_id, m
                                      ORDER BY dist2, k) AS rn
            FROM d) WHERE rn = 1),
    -- ADC lookup table: query subvector vs every codebook entry,
    -- in exact integer micro-units
    adc AS (
        SELECT m.m, c.k,
               CAST(round(list_sum(list_transform(
                   list_zip(qv.v[m.m*{_PQ_S}+1:m.m*{_PQ_S}+{_PQ_S}],
                            c.v[m.m*{_PQ_S}+1:m.m*{_PQ_S}+{_PQ_S}]),
                   p -> (p[1] - p[2]) * (p[1] - p[2]))) * 1e6)
                 AS BIGINT) AS d2_um
        FROM qv CROSS JOIN m CROSS JOIN c),
    scored AS (
        SELECT code.vec_id, sum(adc.d2_um) AS adc_um
        FROM code JOIN adc ON code.m = adc.m AND code.code = adc.k
        GROUP BY code.vec_id)
    SELECT vec_id, CAST(adc_um AS DOUBLE) / 1e6 AS adc_dist2
    FROM scored
    WHERE vec_id != {_PQ_QUERY_ID}
    ORDER BY adc_um, vec_id
    LIMIT {_PQ_TOPK}
    """,
    tags=("vector", "pq", "ann"),
)
def emb_pq_adc_search(spark, sf_dir):
    """PQ asymmetric-distance top-k (the FAISS search half that
    emb_pq_codes encodes for): the query vector never quantizes — an
    M x K lookup table of exact query-subvector-to-centroid distances
    is built once, and each corpus vector's approximate distance is the
    sum of M table lookups on its codes. Table cells land as integer
    micro-units so the per-vector sum of 4 cells is exact; ranking and
    the one unscaling division happen on exact BIGINTs (ties break on
    vec_id).

    100 TB posture: codes are 4 small ints per vector (the 64x
    compression), the ADC table is M x K = 16 rows — a genuinely fixed
    broadcast (codebook size, not corpus size); scoring is one
    broadcast-hash join + hash agg, and the global top-10 is
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    emb = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    subs = F.expr(
        f"transform(sequence(0, {_PQ_M - 1}), m -> slice(v, m * {_PQ_S} + 1, {_PQ_S}))"
    )
    sub_e = emb.select("vec_id", F.posexplode(subs).alias("m", "sv"))
    sub_c = emb.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("k"), F.posexplode(subs).alias("m", "cv")
    )
    d2 = F.aggregate(
        F.zip_with("sv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # corpus codes: tie-deterministic argmin as min(struct(dist2, k))
    code = (
        sub_e.join(F.broadcast(sub_c), "m")
        .select("vec_id", "m", "k", F.round(d2, 6).alias("dist2"))
        .groupBy("vec_id", "m")
        .agg(F.min(F.struct("dist2", "k")).getField("k").alias("code"))
    )
    # ADC table: query subvectors vs codebook, exact micro-units
    sub_q = emb.filter(F.col("vec_id") == _PQ_QUERY_ID).select(
        F.posexplode(subs).alias("m", "sv")
    )
    adc = sub_q.join(F.broadcast(sub_c), "m").select(
        "m", "k", F.expr(
            "cast(round(aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), "
            "0.0D, (acc, x) -> acc + x) * 1e6) as bigint)"
        ).alias("d2_um"),
    )
    scored = (
        code.join(F.broadcast(adc), (code.m == adc.m) & (code.code == adc.k))
        .groupBy("vec_id")
        .agg(F.sum("d2_um").alias("adc_um"))
        .filter(F.col("vec_id") != _PQ_QUERY_ID)
    )
    return (
        scored.orderBy("adc_um", "vec_id")
        .limit(_PQ_TOPK)
        .select("vec_id", (F.col("adc_um").cast("double") / 1e6).alias("adc_dist2"))
    )


@q(
    "dedup_shingle_containment",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS g(i)),
    cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    pair AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT CASE WHEN ca.c <= cb.c THEN doc_a ELSE doc_b END AS doc_small,
           CASE WHEN ca.c <= cb.c THEN doc_b ELSE doc_a END AS doc_big,
           least(ca.c, cb.c) AS n_shingles_small,
           inter AS n_shared,
           inter * 1.0 / least(ca.c, cb.c) AS containment,
           inter * 1.0 / (ca.c + cb.c - inter) AS jaccard
    FROM pair
    JOIN cnt ca ON ca.doc_id = doc_a
    JOIN cnt cb ON cb.doc_id = doc_b
    WHERE inter * 1.0 / least(ca.c, cb.c) >= 0.25
    """,
    tags=("dedup", "containment"),
)
def dedup_shingle_containment(spark, sf_dir):
    """Sub-document duplication: Broder containment of the SMALLER doc's
    3-shingle set inside each candidate pair (threshold 0.25) — the
    asymmetric metric that catches a snippet quoted verbatim inside a
    much larger page, where symmetric Jaccard stays below every dedup
    threshold (jaccard rides along as the contrast column). Candidate
    generation, df-cap skew guard, and exactness conditions are
    operators/dedup.ngram_containment_pairs — the same inverted-index
    core as dedup_ngram_jaccard, one extra projection."""
    from river_spark.operators.dedup import ngram_containment_pairs

    docs = tbl(spark, sf_dir, "documents")
    return ngram_containment_pairs(docs, "doc_id", "text", n=3, threshold=0.25)


@q(
    "ev_markov_entropy_rate",
    oracle="""
    WITH nxt AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events),
    cnt AS (
        SELECT from_type, to_type, count(*) AS n
        FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2),
    rowtot AS (
        SELECT from_type, CAST(sum(n) AS BIGINT) AS row_n
        FROM cnt GROUP BY 1),
    rowstat AS (
        SELECT c.from_type, r.row_n AS n_out,
               round(-sum((c.n * 1.0 / r.row_n) * ln(c.n * 1.0 / r.row_n)), 6)
                 + 0.0 AS h_row
        FROM cnt c JOIN rowtot r USING (from_type)
        GROUP BY c.from_type, r.row_n),
    tot AS (SELECT CAST(sum(n_out) AS BIGINT) AS t FROM rowstat)
    SELECT from_type, n_out,
           n_out * 1.0 / tot.t AS pi,
           h_row,
           round(h_row * (n_out * 1.0 / tot.t), 6) + 0.0 AS contribution
    FROM rowstat CROSS JOIN tot
    """,
    tags=("events", "sequence", "entropy"),
)
def ev_markov_entropy_rate(spark, sf_dir):
    """Entropy rate of the first-order event-type Markov chain
    (H = sum_i pi_i * H(row_i)) — the sequence-predictability number
    behind session-model capacity planning: a near-zero rate means the
    next event is almost determined, a rate near ln(K) means the chain
    is noise. Transition counts are the ev_markov_transitions machinery
    (one lead window per user, one hash agg); pi is the empirical
    from-state share (exact integer ratio, emitted raw); the ln-bearing
    row entropy and the pi-weighted contribution take the cookbook
    round-6 + negative-zero normalization (a deterministic row has
    H = -1*ln(1) = -0.0).

    100 TB posture: everything after the |types|^2-row count table is
    O(K^2); the count table itself shares ev_markov_transitions' plan
    shape (fact scanned and windowed exactly once)."""
    ev = events_tbl(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    cnt = nxt.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    row_n = F.sum("n").over(Window.partitionBy("from_type"))
    p = F.col("n") * 1.0 / F.col("row_n")
    rowstat = (
        cnt.withColumn("row_n", row_n)
        .groupBy("from_type")
        .agg(
            F.sum("n").cast("long").alias("n_out"),
            (F.round(-F.sum(p * F.log(p)), 6) + 0.0).alias("h_row"),
        )
    )
    tot = rowstat.agg(F.sum("n_out").cast("long").alias("t"))
    pi = F.col("n_out") * 1.0 / F.col("t")
    return rowstat.crossJoin(tot).select(
        "from_type",
        "n_out",
        pi.alias("pi"),
        "h_row",
        (F.round(F.col("h_row") * pi, 6) + 0.0).alias("contribution"),
    )


_PACK_BUDGET = 512


@q(
    "pipeline_pack_efficiency",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, doc_id % 8 AS shard,
               len(regexp_split_to_array(trim(text), '\\s+')) AS toks
        FROM documents),
    w AS (
        SELECT shard, doc_id, toks,
               sum(toks) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - toks AS strt
        FROM t),
    packs AS (
        SELECT shard, CAST(strt // {_PACK_BUDGET} AS BIGINT) AS pack_id,
               CAST(sum(toks) AS BIGINT) AS pack_tokens,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM w GROUP BY shard, pack_id)
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_packs,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(pack_tokens) AS BIGINT) AS total_tokens,
           CAST(max(pack_tokens) AS BIGINT) AS max_pack_tokens,
           CAST(quantile_disc(pack_tokens, 0.5) AS BIGINT) AS p50_pack_tokens,
           sum(pack_tokens) * 1.0 / (count(*) * {_PACK_BUDGET}) AS utilization
    FROM packs GROUP BY shard
    """,
    tags=("pipeline", "packing", "audit"),
)
def pipeline_pack_efficiency(spark, sf_dir):
    """Pack-utilization audit over pipeline_seq_pack's layout: per
    shard, how full the 512-token training packs actually are —
    the padding-waste number that decides whether the packer needs a
    smarter bin-fill. Exact integer pack sums, percentile_disc stored
    values, and ONE final utilization division (BIGINT/BIGINT — bit
    identical).

    100 TB posture: the cumulative offset runs through
    stitched_prefix_sum (shards x doc-range buckets — the fixed 8-way
    shard key alone would serialize each shard's corpus in one task,
    like pipeline_seq_pack pre-round-11); the audit adds one tiny
    per-shard rollup."""
    from river_spark.operators.stitched_lag import stitched_prefix_sum

    d = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("toks"),
    )
    packs = (
        stitched_prefix_sum(
            d,
            key_cols=["shard"],
            order_cols=["doc_id"],
            value_col="toks",
            bucket=F.expr("doc_id div 4096"),
            out_col="cum",
        )
        .withColumn("strt", F.col("cum") - F.col("toks"))
        .groupBy(
            "shard",
            F.expr(f"strt div {_PACK_BUDGET}").cast("long").alias("pack_id"),
        )
        .agg(
            F.sum("toks").cast("long").alias("pack_tokens"),
            F.count("*").cast("long").alias("n_docs"),
        )
    )
    return packs.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_packs"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("pack_tokens").cast("long").alias("total_tokens"),
        F.max("pack_tokens").cast("long").alias("max_pack_tokens"),
        F.expr(
            "cast(percentile_disc(0.5) WITHIN GROUP (ORDER BY pack_tokens) as bigint)"
        ).alias("p50_pack_tokens"),
        (
            F.sum("pack_tokens") * 1.0 / (F.count("*") * _PACK_BUDGET)
        ).alias("utilization"),
    )


_PPS_TARGET = 64  # target samples per source


@q(
    "pipeline_pps_sample",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                 AS w
        FROM documents),
    c AS (
        SELECT doc_id, source, w,
               sum(w) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cumw
        FROM d),
    t AS (
        SELECT source, greatest(sum(w) // {_PPS_TARGET}, 1) AS stride
        FROM d GROUP BY source)
    SELECT c.doc_id, c.source, c.w,
           CAST(c.cumw AS BIGINT) AS cumw,
           CAST(c.cumw // t.stride AS BIGINT) AS pick_no
    FROM c JOIN t USING (source)
    WHERE c.cumw // t.stride > (c.cumw - c.w) // t.stride
    """,
    tags=("pipeline", "sampling", "curation"),
)
def pipeline_pps_sample(spark, sf_dir):
    """Probability-proportional-to-size systematic sampling (the
    deterministic PPS design): walk each source's cumulative token
    weight in doc_id order and pick every document whose weight span
    crosses a stride boundary (stride = source total // 64) — selection
    probability is proportional to length, the math is ALL integers
    (cumulative BIGINT sums, integer stride division, a boundary-cross
    inequality), so the sample is bit-reproducible with no
    transcendental ranking key (the Efraimidis-Spirakis pow/ln key
    would put libm in the SELECTION path).

    100 TB posture: the cumulative weight runs through
    stitched_prefix_sum (sources x doc-range buckets — a plain
    per-source window serializes each source's full history); the
    stride table is one row per source."""
    from river_spark.operators.stitched_lag import stitched_prefix_sum

    d = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("w"),
    )
    c = stitched_prefix_sum(
        d,
        key_cols=["source"],
        order_cols=["doc_id"],
        value_col="w",
        bucket=F.expr("doc_id div 4096"),
        out_col="cumw",
    )
    t = d.groupBy("source").agg(
        F.greatest(
            F.expr(f"sum(w) div {_PPS_TARGET}"), F.lit(1).cast("long")
        ).alias("stride")
    )
    picked = (
        c.join(t, "source")
        .filter(
            F.expr("cumw div stride") > F.expr("(cumw - w) div stride")
        )
    )
    return picked.select(
        "doc_id",
        "source",
        "w",
        F.col("cumw").cast("long").alias("cumw"),
        F.expr("cumw div stride").cast("long").alias("pick_no"),
    )
