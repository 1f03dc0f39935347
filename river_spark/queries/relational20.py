"""Relational wave 20 (round 9): divergence, dispersion, inequality,
and tokenizer-cost rollups.

Bit-exactness rules (tests/test_oracle.py): Fano/fertility/Lorenz are
exact-integer sums with one shared final expression tree (raw doubles);
JSD carries ln terms and takes the repo's round-6 discipline; Lorenz
cumulative shares divide integer cumulative sums ONCE (no running
double sums).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import events_tbl, tbl


@q(
    "text_js_divergence",
    oracle="""
    WITH toks AS (
        SELECT source, lower(unnest(regexp_split_to_array(trim(text), '\\s+'))) AS tok
        FROM documents),
    corpus AS (
        SELECT tok, count(*) AS cc FROM toks GROUP BY tok),
    ctot AS (SELECT sum(cc) AS ct FROM corpus),
    per_src AS (
        SELECT source, tok, count(*) AS sc FROM toks GROUP BY source, tok),
    stot AS (SELECT source, sum(sc) AS st FROM per_src GROUP BY source),
    joined AS (
        SELECT s.source,
               coalesce(p.sc, 0) AS sc, s.st, c.cc, t.ct
        FROM stot s
        CROSS JOIN corpus c
        CROSS JOIN ctot t
        LEFT JOIN per_src p ON p.source = s.source AND p.tok = c.tok),
    terms AS (
        SELECT source,
               CAST(sc AS DOUBLE) / st AS p,
               CAST(cc AS DOUBLE) / ct AS q
        FROM joined)
    SELECT source,
           round(sum(
             0.5 * (CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2)) ELSE 0 END
                    + q * ln(q / ((p + q) / 2)))), 6) AS jsd_nats
    FROM terms GROUP BY source
    """,
    tags=("text", "drift", "divergence"),
)
def text_js_divergence(spark, sf_dir):
    """Jensen-Shannon divergence between each source's unigram
    distribution and the whole-corpus distribution — the standard
    symmetric, bounded drift measure for text mixes (0 = identical,
    ln 2 = disjoint). The corpus vocabulary LEFT-joins each source so
    tokens a source lacks still contribute their q*ln(q/m) mass; p/q
    are exact integer ratios and the ln-bearing sum takes round-6.

    100 TB posture: two token-grain hash aggs (map-side combinable);
    the vocabulary x source expansion is vocabulary-bounded, never
    document-bounded. The vocabulary (unbounded at scale) stays
    DISTRIBUTED on the stream side; only the ~|sources|-row totals
    tables broadcast — the build side is bounded by the source count,
    never by the corpus."""
    toks = tbl(spark, sf_dir, "documents").select(
        "source",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok0"),
    ).select("source", F.lower("tok0").alias("tok"))
    corpus = toks.groupBy("tok").agg(F.count("*").alias("cc"))
    ctot = corpus.agg(F.sum("cc").alias("ct"))
    per_src = toks.groupBy("source", "tok").agg(F.count("*").alias("sc"))
    stot = per_src.groupBy("source").agg(F.sum("sc").alias("st"))
    joined = (
        corpus.crossJoin(F.broadcast(stot))
        .crossJoin(F.broadcast(ctot))
        .join(per_src, ["source", "tok"], "left")
        .select(
            "source",
            (F.coalesce("sc", F.lit(0)).cast("double") / F.col("st")).alias("p"),
            (F.col("cc").cast("double") / F.col("ct")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    term = 0.5 * (
        F.when(F.col("p") > 0, F.col("p") * F.log(F.col("p") / m)).otherwise(0.0)
        + F.col("q") * F.log(F.col("q") / m)
    )
    return joined.groupBy("source").agg(F.round(F.sum(term), 6).alias("jsd_nats"))


@q(
    "ev_fano_factor",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day, count(*) AS x
        FROM events GROUP BY 1, 2),
    s AS (
        SELECT event_type, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx
        FROM daily GROUP BY event_type)
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           CAST(sx AS BIGINT) AS n_events,
           CAST(n * sxx - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * sx)
             AS fano
    FROM s
    """,
    tags=("events", "timeseries", "dispersion"),
)
def ev_fano_factor(spark, sf_dir):
    """Fano factor (variance-to-mean ratio) of daily event counts per
    type — the dispersion test that separates Poisson-like arrivals
    (F ~ 1) from bursty (F > 1) or clocked (F < 1) producers; the
    natural companion to ev_autocorr_lag. Pure integer sums with one
    shared final expression: raw doubles, bit-identical. sx >= n >= 1
    by construction, so the denominator cannot be zero.

    100 TB posture: fact -> (type, day) hash agg, then an agg over the
    tiny daily table."""
    daily = events_tbl(spark, sf_dir).groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("x"))
    s = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return s.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("sx").alias("n_events"),
        (
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
            / (F.col("n").cast("double") * F.col("sx"))
        ).alias("fano"),
    )


@q(
    "agg_lorenz_deciles",
    oracle="""
    WITH spend AS (
        SELECT c.c_nationkey AS nk, o.o_custkey,
               sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2),
    dec AS (
        SELECT nk, cents,
               ntile(10) OVER (PARTITION BY nk ORDER BY cents, o_custkey) AS decile
        FROM spend),
    g AS (
        SELECT nk, decile,
               CAST(sum(cents) AS BIGINT) AS dec_cents,
               count(*) AS n_customers
        FROM dec GROUP BY nk, decile),
    c AS (
        SELECT nk, decile, dec_cents, n_customers,
               sum(dec_cents) OVER (PARTITION BY nk ORDER BY decile) AS cum_cents,
               sum(dec_cents) OVER (PARTITION BY nk) AS tot_cents
        FROM g)
    SELECT n.n_name AS nation, decile, dec_cents, n_customers,
           CAST(cum_cents AS DOUBLE) / tot_cents AS cum_share
    FROM c JOIN nation n ON c.nk = n.n_nationkey
    """,
    tags=("agg", "inequality", "lorenz"),
)
def agg_lorenz_deciles(spark, sf_dir):
    """Lorenz curve points: cumulative spend share of each customer
    decile within a nation — the inequality curve behind Gini, emitted
    as the 10 auditable points a dashboard plots. Spend goes
    cents-integer first; deciles are ntile over a deterministic
    (cents, custkey) order; the cumulative share divides integer
    cumulative sums ONCE (never accumulating doubles).

    100 TB posture: fact aggregates to customer grain before the
    window; the ntile and cumulative windows partition by nation; the
    nation dim broadcasts."""
    orders = tbl(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    spend = (
        # customer scales with SF: no forced broadcast (AQE decides).
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"), "o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
    )
    dec = spend.select(
        "nk",
        "cents",
        F.ntile(10)
        .over(Window.partitionBy("nk").orderBy("cents", "o_custkey"))
        .cast("bigint")
        .alias("decile"),
    )
    g = dec.groupBy("nk", "decile").agg(
        F.sum("cents").alias("dec_cents"),
        F.count("*").alias("n_customers"),
    )
    c = g.select(
        "nk",
        "decile",
        "dec_cents",
        "n_customers",
        F.sum("dec_cents").over(Window.partitionBy("nk").orderBy("decile")).alias("cum_cents"),
        F.sum("dec_cents").over(Window.partitionBy("nk")).alias("tot_cents"),
    )
    return c.join(F.broadcast(nat), c.nk == nat.n_nationkey).select(
        F.col("n_name").alias("nation"),
        "decile",
        "dec_cents",
        "n_customers",
        (F.col("cum_cents").cast("double") / F.col("tot_cents")).alias("cum_share"),
    )


@q(
    "pipeline_tokenizer_fertility",
    oracle="""
    WITH d AS (
        SELECT lang, n_chars,
               len(regexp_split_to_array(trim(text), '\\s+')) AS toks
        FROM documents)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS tokens,
           CAST(sum(n_chars) AS BIGINT) AS chars,
           CAST(sum(n_chars) AS DOUBLE) / sum(toks) AS chars_per_token,
           CAST(sum(toks) AS DOUBLE) / count(*) AS tokens_per_doc
    FROM d GROUP BY lang
    """,
    tags=("pipeline", "tokenizer", "cost"),
)
def pipeline_tokenizer_fertility(spark, sf_dir):
    """Tokenizer-cost profile per language: characters per token and
    tokens per document — the fertility numbers that decide how a
    multilingual mix translates into compute (a high chars-per-token
    language is cheap per character, expensive per token budget).
    Integer sums; each ratio is one IEEE division, emitted raw.

    100 TB posture: a single map-side-combinable hash agg by lang."""
    d = tbl(spark, sf_dir, "documents").select(
        "lang",
        "n_chars",
        F.size(F.split(F.trim("text"), r"\s+")).alias("toks"),
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("toks").alias("tokens"),
        F.sum("n_chars").alias("chars"),
        (F.sum("n_chars").cast("double") / F.sum("toks")).alias("chars_per_token"),
        (F.sum("toks").cast("double") / F.count("*")).alias("tokens_per_doc"),
    )
