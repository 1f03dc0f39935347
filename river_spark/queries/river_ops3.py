"""Streaming SESSION-WINDOW aggregation through the live gate: gap-based
sessions (the one windowing shape river_stream_window's fixed windows
and river_stream_window_chain's sliding windows don't cover) computed by
Structured Streaming's native ``session_window`` state store over a REAL
river stream, with watermark eviction doing the session closing.

Boundary semantics (pinned by a 3-event probe + the full-table
equivalence check in round 10): ``session_window(ts, gap)`` keeps an
event in the current session while ``diff <= gap`` and splits on
STRICTLY greater — so the oracle's gaps-and-islands split predicate is
``date_diff(...) > gap``, not ``>=``. This matters on second-aligned
synthetic timestamps where exact-gap ties occur.

Reference parity: the reference exposes imperative multi-stream readers
(cpp/src/reader.h); sessionization is the declarative Spark-first
re-expression (SURVEY.md section 2 Part B, Streaming).
"""

from __future__ import annotations

import os
import time as _time

import numpy as np
from pyspark.sql import functions as F

from river_spark.streaming.ops import stop_quiet
from river_spark.queries.relational import q
from river_spark.queries.river_ops import (
    _scratch_dir,
    _CACHE,
    _events_array,
    _memory_table_name,
)
from river_spark.transport import StreamLog, StreamWriter

_GAP = "30 minutes"


def _session_table(spark, sf_dir: str) -> tuple[str, int]:
    """Write events (+ two far-future sentinels) through the river wire,
    run the streaming session_window aggregation in append mode, drain
    until every closed session surfaced, return (sink table, n data
    sessions).

    Determinism engineering mirrors river_ops2's join harness: sentinel
    A rides the tail of the data batch and advances the watermark ~4
    months past every data session's end; sentinel B arrives alone in
    micro-batch 2, whose state-cleanup pass EMITS all closed sessions
    (append-mode session windows only emit on eviction). The expected
    session count comes from the batch-mode session_window on the same
    rows — same engine code path, no islands re-derivation on the Spark
    side."""
    from river_spark.sources import register

    key = ("stream_session_window", sf_dir)
    if key in _CACHE:
        return _CACHE[key]
    register(spark)
    work = _scratch_dir(prefix="river_spark_ssw_")
    store = os.path.join(work, "store")
    log = StreamLog(store)
    schema, arr = _events_array(sf_dir, ("event_id", "ts", "user_id", "value"))
    far_a = np.datetime64("2024-06-01T00:00:00").astype("datetime64[ns]").astype(np.int64)
    far_b = np.datetime64("2024-06-01T00:00:01").astype("datetime64[ns]").astype(np.int64)
    sent = np.zeros(2, dtype=schema.dtype())
    sent["event_id"] = [-1, -2]
    sent["ts"] = [far_a, far_b]
    sent["user_id"] = -1
    w = StreamWriter(log).initialize("events_ssw", schema)
    w.write(np.concatenate([arr, sent]))
    w.stop()

    # Exact integer ns->us: long/int in Spark evaluates as DOUBLE, and at
    # 2024 epoch-ns magnitude the mantissa can't hold the value —
    # truncation lands 1us off for ns values that aren't 512ns
    # multiples, which is exactly the second-aligned session-boundary
    # tie this query's gap splits on. `ts div 1000` is integer division;
    # timestamp_micros yields LTZ because the streaming watermark
    # rejects TIMESTAMP_NTZ (session tz is pinned UTC, so the
    # date_format output below matches the NTZ oracle byte-for-byte).
    ets = F.timestamp_micros(F.expr("ts div 1000"))
    sessions = (
        spark.readStream.format("river")
        .option("path", store)
        .option("stream", "events_ssw")
        .option("maxSamplesPerTrigger", str(len(arr) + 1))
        .load()
        .select("user_id", "value", ets.alias("ets"))
        .withWatermark("ets", "1 second")
        .groupBy(F.session_window("ets", _GAP).alias("s"), "user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
        .select(
            "user_id",
            F.date_format("s.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n",
            "sv",
        )
    )

    # expected closed sessions, from the BATCH session_window on the
    # same staged rows (sentinels excluded)
    ets_batch = F.timestamp_micros(F.expr("ts div 1000"))
    batch = spark.createDataFrame(
        [(int(r["user_id"]), int(r["ts"]), float(r["value"])) for r in arr],
        "user_id long, ts long, value double",
    )
    want = (
        batch.select("user_id", "value", ets_batch.alias("ets"))
        .groupBy(F.session_window("ets", _GAP), "user_id")
        .count()
        .count()
    )

    table = _memory_table_name("river_ssw_", sf_dir)
    qy = (
        sessions.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    deadline = _time.monotonic() + 300
    try:
        while True:
            n = spark.sql(
                f"SELECT count(*) FROM {table} WHERE user_id >= 0"
            ).first()[0]
            if n >= want:
                break
            if _time.monotonic() > deadline:
                raise TimeoutError(
                    f"{table}: session drain surfaced {n}/{want} rows in 300s"
                )
            _time.sleep(0.25)
    finally:
        stop_quiet(qy)
    _CACHE[key] = (table, want)
    return _CACHE[key]


@q(
    "river_stream_session_window",
    oracle="""
    WITH o AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('microsecond', lag(ts) OVER w, ts)
                       > 1800000000
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
        SELECT *, sum(brk) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS sid
        FROM o)
    SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
    FROM s GROUP BY user_id, sid
    """,
    tags=("river", "streaming", "session_window"),
)
def river_stream_session_window(spark, sf_dir):
    """Gap-based sessionization as a REAL streaming run: events flow
    write->wire->river-source micro-batches into the native
    session_window state store (append mode), sentinel-driven watermark
    eviction closes and emits every session, and the drained sink must
    reproduce the gaps-and-islands oracle row-for-row (user, session
    start, event count, value sum). Completes the streaming windowing
    matrix: fixed (river_stream_window), sliding/chained
    (river_stream_window_chain), session (here); the batch equivalence
    of session_window to the islands formulation is ev_sessionize-
    adjacent but the STATE-STORE path only this query exercises."""
    table, _ = _session_table(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT user_id, session_start, CAST(n AS BIGINT) AS n,
               round(sv, 4) AS sum_value
        FROM {table} WHERE user_id >= 0
        """
    )
