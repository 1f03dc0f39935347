"""Streaming MERGEABLE-SKETCH distinct counting through the live gate:
a KMV (bottom-k) sketch maintained per segment by a custom stateful
operator (``applyInPandasWithState``) over a REAL river stream, drained
and compared bit-exactly against the batch bottom-k oracle.

Why this query exists: every other streaming entry aggregates values the
engine can fold natively (counts, sums, windows, sessions). Distinct
counting is the one that CANNOT be folded without custom state — the
sketch state (k smallest hashes) is bounded at k longs per key no matter
how long the stream runs, and because the merge rule is commutative and
associative the final streamed state equals the batch sketch EXACTLY,
independent of micro-batch boundaries. The harness deliberately splits
the stream into several micro-batches so the state-merge path (not just
single-batch initialization) is on the wire.

Reference parity: the reference exposes imperative stream readers
(cpp/src/reader.h) with no aggregation layer; this is the Spark-first
streaming-statistics re-expression (SURVEY.md section 2 Part B,
Streaming + UDF rows).
"""

from __future__ import annotations

import os
import time as _time

import numpy as np
from pyspark.sql import Window, functions as F

from river_spark.queries.relational import q
from river_spark.queries.river_ops import (
    _scratch_dir,
    _CACHE,
    _events_array,
    _memory_table_name,
)
from river_spark.streaming.ops import kmv_distinct, stop_quiet
from river_spark.transport import StreamLog, StreamWriter

_K = 64
_SEGMENTS = 4
_M_DOUBLE = "(63.0 * 1152921504606846976)"  # (K-1) * 2^60, exact in double
_H_SPARK = (
    "cast(conv(substring(md5(concat('kmv~', cast(user_id as string))), "
    "1, 15), 16, 10) as bigint)"
)
_H_SQL = (
    "('0x' || substr(md5('kmv~' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT"
)


def _kmv_table(spark, sf_dir: str) -> tuple[str, dict]:
    """Write events through the river wire, run the streaming KMV
    operator keyed on segment = user_id mod 4, drain until every
    segment's row counter reaches its staged total, return (sink table,
    {segment: n_rows}). The trigger cap forces >= 5 micro-batches so
    the bottom-k state MERGE (not just first-batch init) is exercised."""
    from river_spark.sources import register

    key = ("stream_kmv_distinct", sf_dir)
    if key in _CACHE:
        return _CACHE[key]
    register(spark)
    work = _scratch_dir(prefix="river_spark_kmv_")
    store = os.path.join(work, "store")
    log = StreamLog(store)
    schema, arr = _events_array(sf_dir, ("event_id", "ts", "user_id"))
    w = StreamWriter(log).initialize("events_kmv", schema)
    w.write(arr)
    w.stop()

    seg = np.mod(arr["user_id"], _SEGMENTS)
    want = {int(s): int((seg == s).sum()) for s in np.unique(seg)}

    stream = (
        spark.readStream.format("river")
        .option("path", store)
        .option("stream", "events_kmv")
        .option("maxSamplesPerTrigger", str(max(1, len(arr) // 5)))
        .load()
        .select(
            F.pmod(F.col("user_id"), F.lit(_SEGMENTS)).cast("bigint").alias("segment"),
            F.expr(_H_SPARK).alias("h"),
        )
    )
    sk = kmv_distinct(stream, key_col="segment", hash_col="h", k=_K)

    table = _memory_table_name("river_kmv_", sf_dir)
    qy = (
        sk.writeStream.format("memory")
        .queryName(table)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    deadline = _time.monotonic() + 300
    try:
        while True:
            done = spark.sql(
                f"SELECT segment, max(n_seen) AS n FROM {table} GROUP BY segment"
            ).collect()
            got = {int(r["segment"]): int(r["n"]) for r in done}
            if got == want:
                break
            if _time.monotonic() > deadline:
                raise TimeoutError(
                    f"{table}: KMV drain surfaced {got} of {want} rows in 300s"
                )
            _time.sleep(0.25)
    finally:
        stop_quiet(qy)
    _CACHE[key] = (table, want)
    return _CACHE[key]


@q(
    "river_stream_kmv_distinct",
    oracle=f"""
    WITH d AS (
        SELECT DISTINCT user_id % {_SEGMENTS} AS segment, {_H_SQL} AS h
        FROM events),
    cnt AS (
        SELECT user_id % {_SEGMENTS} AS segment,
               CAST(count(*) AS BIGINT) AS n_seen
        FROM events GROUP BY 1),
    sk AS (
        SELECT segment, h
        FROM (SELECT segment, h,
                     row_number() OVER (PARTITION BY segment ORDER BY h) AS rn
              FROM d)
        WHERE rn <= {_K}),
    per AS (
        SELECT segment, CAST(count(*) AS BIGINT) AS k_n,
               CAST(max(h) AS BIGINT) AS theta
        FROM sk GROUP BY segment)
    SELECT CAST(p.segment AS BIGINT) AS segment, c.n_seen, p.k_n, p.theta,
           CASE WHEN p.k_n < {_K} THEN CAST(p.k_n AS DOUBLE)
                ELSE {_M_DOUBLE} / CAST(p.theta AS DOUBLE) END AS est_distinct
    FROM per p JOIN cnt c ON c.segment = p.segment
    """,
    tags=("river", "streaming", "sketch", "distinct"),
)
def river_stream_kmv_distinct(spark, sf_dir):
    """Per-segment streaming distinct-user sketch: events flow
    write->wire->river-source micro-batches into a bottom-K=64 KMV
    state store (k longs per key, bounded forever), and the drained
    final state must equal the BATCH bottom-k over the same rows
    bit-for-bit — the mergeable-sketch guarantee, exercised across
    >= 5 real micro-batch merges. est = (K-1)*2^60/theta when the
    sketch is full, the exact distinct count when it is not (tiny
    segments at sf0.001 take that branch; larger SFs estimate).

    100 TB posture: this operator shape IS the scale path — per-key
    state bounded at K longs, merge commutative/associative (so
    partial sketches combine across executors or days), no distinct
    shuffle of raw members anywhere."""
    table, _ = _kmv_table(spark, sf_dir)
    final = Window.partitionBy("segment").orderBy(F.desc("n_seen"))
    est = (
        F.when(F.col("k_n") < _K, F.col("k_n").cast("double"))
        .otherwise(
            (F.lit(63.0) * F.lit(1152921504606846976))
            / F.col("theta").cast("double")
        )
    )
    return (
        spark.table(table)
        .withColumn("rn", F.row_number().over(final))
        .where(F.col("rn") == 1)
        .select("segment", "n_seen", "k_n", "theta", est.alias("est_distinct"))
    )


def _ss_table(spark, sf_dir: str) -> tuple[str, dict]:
    """Write events through the river wire, run the streaming
    Space-Saving operator keyed on segment = user_id mod 4 with
    event_type items, drain until every segment's row counter reaches
    its staged total. >= 5 forced micro-batches exercise the table
    UPDATE path (not just first-batch build)."""
    from river_spark.sources import register
    from river_spark.streaming.ops import space_saving_topk

    key = ("stream_ss_topk", sf_dir)
    if key in _CACHE:
        return _CACHE[key]
    register(spark)
    work = _scratch_dir(prefix="river_spark_ss_")
    store = os.path.join(work, "store")
    log = StreamLog(store)
    schema, arr = _events_array(sf_dir, ("event_id", "user_id"))
    w = StreamWriter(log).initialize("events_ss", schema)
    w.write(arr)
    w.stop()

    seg = np.mod(arr["user_id"], _SEGMENTS)
    want = {int(s): int((seg == s).sum()) for s in np.unique(seg)}

    # event_type is derived deterministically from event_id (the same
    # modular rule the testdata generator used is NOT assumed — the
    # type is re-derived from user_id so stream and oracle agree by
    # construction on the wire payload actually staged)
    stream = (
        spark.readStream.format("river")
        .option("path", store)
        .option("stream", "events_ss")
        .option("maxSamplesPerTrigger", str(max(1, len(arr) // 5)))
        .load()
        .select(
            F.pmod(F.col("user_id"), F.lit(_SEGMENTS)).cast("bigint").alias("segment"),
            F.concat(F.lit("t"), F.pmod(F.col("event_id"), F.lit(5)).cast("string")).alias("item"),
        )
    )
    sk = space_saving_topk(stream, key_col="segment", item_col="item", capacity=8)

    # "river_sstk_": river_stream_stateful already owns the "river_ss_"
    # prefix (same-session memory-sink names are global — a collision
    # resolves the OTHER query's view, caught by the full-suite run)
    table = _memory_table_name("river_sstk_", sf_dir)
    qy = (
        sk.writeStream.format("memory")
        .queryName(table)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    deadline = _time.monotonic() + 300
    try:
        while True:
            done = spark.sql(
                f"SELECT segment, max(n_seen) AS n FROM {table} GROUP BY segment"
            ).collect()
            got = {int(r["segment"]): int(r["n"]) for r in done}
            if got == want:
                break
            if _time.monotonic() > deadline:
                raise TimeoutError(
                    f"{table}: space-saving drain surfaced {got} of {want} in 300s"
                )
            _time.sleep(0.25)
    finally:
        stop_quiet(qy)
    _CACHE[key] = (table, want)
    return _CACHE[key]


@q(
    "river_stream_topk_heavy_hitters",
    oracle=f"""
    SELECT CAST(user_id % {_SEGMENTS} AS BIGINT) AS segment,
           't' || CAST(event_id % 5 AS VARCHAR) AS item,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(0 AS BIGINT) AS err
    FROM events
    GROUP BY 1, 2
    """,
    tags=("river", "streaming", "sketch", "stateful"),
)
def river_stream_topk_heavy_hitters(spark, sf_dir):
    """Streaming heavy hitters via the Space-Saving sketch
    (streaming/ops.space_saving_topk): per-segment item tables bounded
    at capacity triples forever, updated across >= 5 forced
    micro-batches over a REAL river stream. The fixture keeps each
    segment's distinct items (5 derived types) within capacity (8), so
    the sketch runs in its EXACT regime — every error is 0 and the
    drained final table must equal the batch GROUP BY count
    bit-for-bit. The eviction regime (capacity exceeded: bounded
    overestimates, guaranteed heavy-hitter retention) is pinned by the
    property tests in tests/test_streaming_ops.py — 100 TB posture:
    this is the per-executor mergeable table you'd run ahead of a
    global rollup when the item domain is unbounded."""
    table, want = _ss_table(spark, sf_dir)
    finals = " OR ".join(
        f"(segment = {s} AND n_seen = {n})" for s, n in sorted(want.items())
    )
    return spark.sql(
        f"""
        SELECT segment, item, cnt, err
        FROM {table}
        WHERE {finals}
        """
    )


# --------------------------------------------------------------------------
# Space-Saving EVICTION regime (round-13 verdict directive #3)
# --------------------------------------------------------------------------

_SS_EV_CAP = 8
# Planted skew: half the events concentrate on 3 hot items (each ~n/6 of
# a segment's traffic, strictly above the n/capacity=n/8 heavy-hitter
# threshold), the other half spread over 97 cold items — so every
# segment holds 75-100 distinct items against a capacity-8 table and
# EVERY arrival past the 8th distinct item forces an eviction, while the
# 3 hot items must survive them all (Metwally et al. 2005, theorem 2).
_SS_EV_ITEM_SPARK = (
    "CASE WHEN event_id % 2 = 0 THEN concat('h', CAST((event_id div 2) % 3 AS STRING)) "
    "ELSE concat('c', CAST((event_id div 2) % 97 AS STRING)) END"
)
_SS_EV_ITEM_SQL = (
    "CASE WHEN event_id % 2 = 0 THEN 'h' || CAST((event_id // 2) % 3 AS VARCHAR) "
    "ELSE 'c' || CAST((event_id // 2) % 97 AS VARCHAR) END"
)


def _ss_evict_table(spark, sf_dir: str) -> tuple[str, dict]:
    """Stage events through the river wire and run space_saving_topk in
    its EVICTION regime (distincts per segment far above capacity).
    Same drain harness as _ss_table; only the item rule and the scratch
    namespaces differ."""
    from river_spark.sources import register
    from river_spark.streaming.ops import space_saving_topk

    key = ("stream_ss_evicted", sf_dir)
    if key in _CACHE:
        return _CACHE[key]
    register(spark)
    work = _scratch_dir(prefix="river_spark_ssev_")
    store = os.path.join(work, "store")
    log = StreamLog(store)
    schema, arr = _events_array(sf_dir, ("event_id", "user_id"))
    w = StreamWriter(log).initialize("events_ssev", schema)
    w.write(arr)
    w.stop()

    seg = np.mod(arr["user_id"], _SEGMENTS)
    want = {int(s): int((seg == s).sum()) for s in np.unique(seg)}

    stream = (
        spark.readStream.format("river")
        .option("path", store)
        .option("stream", "events_ssev")
        .option("maxSamplesPerTrigger", str(max(1, len(arr) // 5)))
        .load()
        .select(
            F.pmod(F.col("user_id"), F.lit(_SEGMENTS)).cast("bigint").alias("segment"),
            F.expr(_SS_EV_ITEM_SPARK).alias("item"),
        )
    )
    sk = space_saving_topk(
        stream, key_col="segment", item_col="item", capacity=_SS_EV_CAP
    )

    table = _memory_table_name("river_ssev_", sf_dir)
    qy = (
        sk.writeStream.format("memory")
        .queryName(table)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    deadline = _time.monotonic() + 300
    try:
        while True:
            done = spark.sql(
                f"SELECT segment, max(n_seen) AS n FROM {table} GROUP BY segment"
            ).collect()
            got = {int(r["segment"]): int(r["n"]) for r in done}
            if got == want:
                break
            if _time.monotonic() > deadline:
                raise TimeoutError(
                    f"{table}: space-saving eviction drain surfaced {got} of {want} in 300s"
                )
            _time.sleep(0.25)
    finally:
        stop_quiet(qy)
    _CACHE[key] = (table, want)
    return _CACHE[key]


@q(
    "river_stream_topk_evicted",
    oracle=f"""
    WITH t AS (
        SELECT CAST(user_id % {_SEGMENTS} AS BIGINT) AS segment,
               {_SS_EV_ITEM_SQL} AS item
        FROM events
    ),
    c AS (SELECT segment, item, count(*) AS true_cnt FROM t GROUP BY 1, 2),
    s AS (SELECT segment,
                 CAST(count(*) AS BIGINT) AS n_seen,
                 CAST(count(DISTINCT item) AS BIGINT) AS distinct_true
          FROM t GROUP BY 1)
    SELECT s.segment,
           s.n_seen,
           s.distinct_true,
           (SELECT CAST(count(*) AS BIGINT) FROM c
             WHERE c.segment = s.segment
               AND c.true_cnt * {_SS_EV_CAP} > s.n_seen)    AS heavy_items,
           CAST(LEAST({_SS_EV_CAP}, s.distinct_true) AS BIGINT) AS tracked,
           CAST(0 AS BIGINT) AS underest_violations,
           CAST(0 AS BIGINT) AS lower_violations,
           CAST(0 AS BIGINT) AS missing_heavy,
           CAST(0 AS BIGINT) AS mass_gap
    FROM s
    ORDER BY s.segment
    """,
    tags=("river", "streaming", "sketch", "stateful"),
)
def river_stream_topk_evicted(spark, sf_dir):
    """Space-Saving heavy hitters in the EVICTION regime — the half of
    the operator river_stream_topk_heavy_hitters cannot see (its fixture
    stays within capacity, where the sketch is exact). Here every
    segment carries 75-100 distinct items against a capacity-8 table, so
    the stream forces an eviction on nearly every arrival, and the final
    table is NOT exactly the batch GROUP BY — it is only guaranteed to
    satisfy the Space-Saving bounds. The query therefore emits the
    per-segment GUARANTEE AUDIT, every column of which is deterministic
    for ANY valid Space-Saving run regardless of eviction tie-breaking
    or micro-batch boundaries:

      underest_violations  — tracked items with est < true   (always 0:
                             a counter only inherits mass, never loses it)
      lower_violations     — tracked items with est - err > true (always
                             0: err records the inherited mass)
      missing_heavy        — true heavy items (true*capacity > n) absent
                             from the table (always 0: theorem 2)
      mass_gap             — sum(est) - n (always 0: each arrival
                             increments exactly one counter)
      tracked              — table size, pinned at capacity once the
                             segment has seen >= capacity distincts
      n_seen / distinct_true / heavy_items — exact quantities both
                             engines recompute independently; the fixture
                             plants exactly 3 heavy items per segment so
                             the regime is demonstrably non-trivial.

    The truth side is recomputed in Spark from the same parquet the
    stream was staged from; the oracle recomputes it in DuckDB and
    hardcodes the theorem-guaranteed zeros. 100 TB posture: the audit
    join broadcasts only O(segments x capacity) sketch rows against the
    aggregated truth — the raw stream is scanned once on each side.
    Reference parity: cpp/src/reader.h exposes imperative tailing only;
    this is the Spark-first bounded-state analytics layer over it."""
    from river_spark.queries.tables import tbl

    cap = _SS_EV_CAP
    table, want = _ss_evict_table(spark, sf_dir)
    finals = " OR ".join(
        f"(segment = {s} AND n_seen = {n})" for s, n in sorted(want.items())
    )
    sketch = spark.sql(
        f"SELECT segment, item, cnt, err FROM {table} WHERE {finals}"
    )

    truth = (
        tbl(spark, sf_dir, "events")
        .select(
            F.pmod(F.col("user_id"), F.lit(_SEGMENTS)).cast("bigint").alias("segment"),
            F.expr(_SS_EV_ITEM_SPARK).alias("item"),
        )
        .groupBy("segment", "item")
        .agg(F.count("*").alias("true_cnt"))
    )
    segn = truth.groupBy("segment").agg(
        F.sum("true_cnt").alias("n_seen"),
        F.count("*").alias("distinct_true"),
    )
    heavy = truth.join(F.broadcast(segn), "segment").filter(
        F.col("true_cnt") * cap > F.col("n_seen")
    )
    heavy_cnt = heavy.groupBy("segment").agg(F.count("*").alias("heavy_items"))
    audited = (
        sketch.join(truth, ["segment", "item"], "left")
        .groupBy("segment")
        .agg(
            F.count("*").alias("tracked"),
            F.sum(
                F.when(F.col("cnt") < F.col("true_cnt"), 1).otherwise(0)
            ).alias("underest_violations"),
            F.sum(
                F.when(F.col("cnt") - F.col("err") > F.col("true_cnt"), 1).otherwise(0)
            ).alias("lower_violations"),
            F.sum("cnt").alias("mass"),
        )
    )
    missing = (
        heavy.select("segment", "item")
        .join(sketch.select("segment", "item"), ["segment", "item"], "left_anti")
        .groupBy("segment")
        .agg(F.count("*").alias("missing_heavy"))
    )
    return (
        segn.join(F.broadcast(heavy_cnt), "segment", "left")
        .join(F.broadcast(audited), "segment", "left")
        .join(F.broadcast(missing), "segment", "left")
        .select(
            "segment",
            "n_seen",
            "distinct_true",
            F.coalesce("heavy_items", F.lit(0)).cast("bigint").alias("heavy_items"),
            F.least(F.lit(cap).cast("bigint"), F.col("tracked")).alias("tracked"),
            F.col("underest_violations").cast("bigint").alias("underest_violations"),
            F.col("lower_violations").cast("bigint").alias("lower_violations"),
            F.coalesce("missing_heavy", F.lit(0)).cast("bigint").alias("missing_heavy"),
            (F.col("mass") - F.col("n_seen")).cast("bigint").alias("mass_gap"),
        )
        .orderBy("segment")
    )
