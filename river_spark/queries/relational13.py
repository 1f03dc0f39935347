"""Relational wave 13 (round 8, session 4): sweep-line concurrency,
shard manifests, information-theoretic association, and sentence-level
dedup.

- ``ev_peak_concurrency``: max concurrent 5-minute activity windows per
  day via the classic sweep line (+1/-1 boundary events, running sum,
  running max) — the interval-stabbing aggregate.
- ``pipeline_shard_manifest``: WebDataset-style shard manifest — docs
  packed into ~50 KB shards per source by a running-size cursor, with
  per-shard doc counts and byte totals.
- ``agg_mutual_info``: mutual information between event type and
  time-of-day quadrant from exact integer contingency counts.
- ``text_sentence_dedup``: per-document fraction of sentences shared
  verbatim with other documents — the sentence-granularity boilerplate
  signal between whole-doc MinHash and 15-token span fingerprints.

Bit-exactness rules follow tests/test_oracle.py: integer outputs or
identical IEEE expression trees; ln-based quantities are rounded to 6
decimals (the DSIR precedent in curation4.py — cross-engine libm drift
is ~1e-16 relative, 10 orders below the rounding).

Reference parity: the reference engine (pbotros/river) has no
relational layer (its surface is the stream transport,
/root/reference/cpp/src/writer.cpp); these extend the analytics surface
the brief requires.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import event_ts, tbl

_CONC_WINDOW_S = 300
_SHARD_CAP_CHARS = 50_000
_SENT_MIN_CHARS = 20


# ---------------------------------------------------------------------------
# Sweep-line peak concurrency
# ---------------------------------------------------------------------------
@q(
    "ev_peak_concurrency",
    oracle=f"""
    WITH iv AS (
        SELECT CAST(ts AS DATE) AS day, ts AS t0,
               ts + INTERVAL {_CONC_WINDOW_S} SECOND AS t1
        FROM events),
    b AS (
        SELECT day, t0 AS t, 1 AS delta FROM iv
        UNION ALL
        SELECT day, t1 AS t, -1 AS delta FROM iv),
    r AS (
        SELECT day,
               sum(delta) OVER (PARTITION BY day ORDER BY t, delta
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS conc
        FROM b)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(max(conc) AS BIGINT) AS peak_concurrency,
           CAST(count(*) / 2 AS BIGINT) AS n_events
    FROM r GROUP BY day
    """,
    tags=("events", "sweepline", "intervals"),
)
def ev_peak_concurrency(spark, sf_dir):
    """Peak concurrency per day — each event opens a 5-minute activity
    window, and the metric is the maximum number of simultaneously
    open windows (attributed to the window's start day). The classic
    sweep line, expressed relationally: every interval becomes a +1
    boundary at its start and a -1 at its end, a per-day ordered
    running sum reconstructs the concurrency curve, and max() reads
    the peak. The (t, delta) tie order processes closings before
    openings at the same instant — half-open [t0, t1) intervals — and
    makes the running sum deterministic: permuting rows with equal
    (t, delta) leaves every group-boundary prefix unchanged, so the
    max is engine-independent.

    100 TB posture: ONE shuffle partitions boundaries by day; the sort
    inside the window is per-day (range-partitioned, parallel across
    days); the peak agg shares the day partitioning. The sweep never
    materializes pairwise overlap — O(n log n) against the O(n²)
    interval self-join it replaces."""
    ev = tbl(spark, sf_dir, "events")
    ts = event_ts(ev)
    iv = ev.select(
        ts.cast("date").alias("day"),
        ts.alias("t0"),
        (ts + F.expr(f"INTERVAL {_CONC_WINDOW_S} SECOND")).alias("t1"),
    )
    b = iv.select("day", F.col("t0").alias("t"), F.lit(1).alias("delta")).unionByName(
        iv.select("day", F.col("t1").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("day")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = b.select("day", F.sum("delta").over(w).alias("conc"))
    return r.groupBy(F.date_format("day", "yyyy-MM-dd").alias("day")).agg(
        F.max("conc").alias("peak_concurrency"),
        (F.count("*") / 2).cast("bigint").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Shard manifest
# ---------------------------------------------------------------------------
@q(
    "pipeline_shard_manifest",
    oracle=f"""
    WITH c AS (
        SELECT source, doc_id, n_chars,
               sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - n_chars AS start_off
        FROM documents)
    SELECT source,
           CAST(start_off // {_SHARD_CAP_CHARS} AS BIGINT) AS shard_idx,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS shard_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM c GROUP BY source, 2
    """,
    tags=("pipeline", "shard", "manifest"),
)
def pipeline_shard_manifest(spark, sf_dir):
    """Training-shard manifest (the WebDataset / tar-shard pattern):
    within each source, documents are laid out in doc_id order and cut
    into ~50 KB shards by a running-size cursor — a document belongs
    to the shard where its payload STARTS (integer division of the
    exclusive running sum), so shard boundaries are deterministic and
    append-stable within a source prefix. The manifest row per shard
    (doc count, byte total, id range) is what the data loader
    actually mounts.

    100 TB posture: one shuffle partitions by source; the running sum
    is a per-source window (sources sort independently, in parallel);
    the manifest agg reuses the same partitioning. A single pathological
    source still serializes its own window — at that point you shard
    the source key itself (date sub-keys), the same remedy every
    per-key window has."""
    c = tbl(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = c.withColumn("start_off", F.sum("n_chars").over(w) - F.col("n_chars"))
    return (
        c.groupBy(
            "source",
            F.expr(f"start_off div {_SHARD_CAP_CHARS}").cast("bigint").alias("shard_idx"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("shard_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Mutual information from integer contingency counts
# ---------------------------------------------------------------------------
@q(
    "agg_mutual_info",
    oracle="""
    WITH cell AS (
        SELECT event_type, hour(ts) // 6 AS quad,
               CAST(count(*) AS BIGINT) AS nxy
        FROM events GROUP BY 1, 2),
    tot AS (
        SELECT event_type, quad, nxy,
               sum(nxy) OVER (PARTITION BY event_type) AS nx,
               sum(nxy) OVER (PARTITION BY quad) AS ny,
               sum(nxy) OVER () AS n
        FROM cell)
    SELECT event_type,
           CAST(max(nx) AS BIGINT) AS n_type,
           round(sum((CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE))
                     * ln(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)
                          / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))), 6)
               AS mi_contrib_nats
    FROM tot GROUP BY event_type
    """,
    tags=("agg", "information", "stats"),
)
def agg_mutual_info(spark, sf_dir):
    """Mutual information between event type and time-of-day quadrant,
    decomposed per type (summing the column gives total MI — the
    feature-association score a pipeline uses to find leaky or
    redundant categorical features). Everything up to the last step is
    exact integers: the contingency cells and all three marginals are
    bigint counts; the per-cell p·ln(p/(px·py)) terms are doubles over
    those exact integers, summed over at most 4 cells per output row
    and rounded to 6 decimals — the DSIR precedent (curation4.py) for
    ln-based scores, with cross-engine drift ~10 orders below the
    rounding.

    100 TB posture: one hash agg builds the |types| x 4 contingency
    table; every window after that runs on the cell table
    (tens of rows). No second scan of the fact table for marginals —
    they're windows over the cells."""
    ev = tbl(spark, sf_dir, "events")
    cell = (
        ev.groupBy(
            "event_type",
            (F.hour(event_ts(ev)) / 6).cast("int").alias("quad"),
        )
        .agg(F.count("*").alias("nxy"))
    )
    tot = cell.select(
        "event_type",
        "quad",
        "nxy",
        F.sum("nxy").over(Window.partitionBy("event_type")).alias("nx"),
        F.sum("nxy").over(Window.partitionBy("quad")).alias("ny"),
        F.sum("nxy").over(Window.partitionBy()).alias("n"),
    )
    nxy, nx, ny, n = (F.col(c).cast("double") for c in ["nxy", "nx", "ny", "n"])
    term = (nxy / n) * F.log(nxy * n / (nx * ny))
    return tot.groupBy("event_type").agg(
        F.max("nx").cast("bigint").alias("n_type"),
        F.round(F.sum(term), 6).alias("mi_contrib_nats"),
    )


# ---------------------------------------------------------------------------
# Sentence-level cross-document dedup
# ---------------------------------------------------------------------------
@q(
    "text_sentence_dedup",
    oracle=f"""
    WITH s AS (
        SELECT DISTINCT doc_id,
               trim(unnest(regexp_split_to_array(lower(text), '\\.\\s+'))) AS sent
        FROM documents),
    sf AS (SELECT * FROM s WHERE length(sent) >= {_SENT_MIN_CHARS}),
    df AS (
        SELECT sent, count(*) AS n_docs_with FROM sf GROUP BY sent)
    SELECT sf.doc_id,
           CAST(count(*) AS BIGINT) AS n_sentences,
           CAST(sum(CASE WHEN df.n_docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared,
           sum(CASE WHEN df.n_docs_with >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*)
               AS shared_rate
    FROM sf JOIN df ON sf.sent = df.sent
    GROUP BY sf.doc_id
    """,
    tags=("text", "dedup", "sentence"),
)
def text_sentence_dedup(spark, sf_dir):
    """Per-document fraction of sentences appearing verbatim in OTHER
    documents — the sentence-granularity boilerplate detector (the
    SlimPajama-style signal) sitting between whole-document MinHash
    and dedup_repeated_spans' fixed 15-token windows: sentences are
    natural units, so legal footers and navigation chrome surface even
    when the host documents differ everywhere else. Sentences are
    lowercased period-split spans of >= 20 chars, distinct per doc
    (a doc repeating its own sentence counts once).

    100 TB posture: the inverted-index shape — distinct (doc, sent)
    grid, document-frequency agg on the sentence key, join back on the
    SAME key (the exchange is reused, not repeated), per-doc fold. At
    production scale sentences travel as xxhash64 fingerprints instead
    of strings (dedup_repeated_spans already does exactly that); the
    text form here keeps the oracle replayable."""
    s = (
        tbl(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), r"\.\s+")).alias("sent"),
        )
        .select("doc_id", F.trim(F.col("sent")).alias("sent"))
        .filter(F.length("sent") >= _SENT_MIN_CHARS)
        .distinct()
    )
    df = s.groupBy("sent").agg(F.count("*").alias("n_docs_with"))
    shared = F.when(F.col("n_docs_with") >= 2, F.lit(1)).otherwise(F.lit(0))
    return (
        s.join(df, "sent")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sentences"),
            F.sum(shared).alias("n_shared"),
            (F.sum(shared) * 1.0 / F.count("*")).alias("shared_rate"),
        )
    )
