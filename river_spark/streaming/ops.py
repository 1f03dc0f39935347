"""Streaming analytics operators (SURVEY §2 Part B, "Streaming" row).

These take an unbounded DataFrame (e.g. from the river source or any
Structured Streaming source) carrying an event-time column and return
transformed streams:

- ``windowed_counts``: tumbling-window aggregation with a watermark (late
  data beyond the delay is dropped, state is bounded);
- ``sliding_avg``: overlapping windows;
- ``sessionize``: built-in ``session_window`` (gap-based, watermark-bounded
  state) — the streaming analog of the batch gaps-and-islands query;
- ``dedup_stream``: ``dropDuplicates`` with watermark (bounded dedup state);
- ``running_totals``: custom stateful operator via
  ``applyInPandasWithState`` — per-key running counters with a processing-
  time timeout, the shape the reference's stale-stream janitor (A17) takes
  in a streaming engine.
- ``interval_join``: stream-stream equi-join bounded by an event-time
  interval; both sides are watermarked so join state is dropped once no
  future match is possible (the multi-reader analog of the reference's
  one-writer/N-reader fan-in, generalized to two live streams).

The watermark delay maps to the reference's ``minimum_age_seconds_before_
deletion`` (A16) — both say "data older than X is no longer awaited".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def stop_quiet(query) -> None:
    """Stop a StreamingQuery, tolerating the documented stop-vs-batch race.

    ``query.stop()`` interrupts the micro-batch thread; if a batch is
    mid-flight, ``awaitTermination()`` re-raises a
    ``StreamingQueryException`` (SQLSTATE XXKST) whose cause is the
    ``InterruptedException`` from our own stop — not a query failure.
    Every drain harness that explicitly stops a query should swallow
    exactly that; anything raised BEFORE we asked for the stop still
    propagates from the drain loop itself.
    """
    from pyspark.errors import StreamingQueryException

    try:
        query.stop()
        query.awaitTermination()
    except StreamingQueryException:
        # Post-stop teardown race only: we already decided to stop, and
        # the drain loop above has already validated the output.
        pass


def windowed_counts(
    events: DataFrame,
    ts_col: str = "tstamp",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "10 minutes",
    value_col: str = "value",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(F.count("*").alias("n"), F.sum(value_col).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
            "total_value",
        )
    )


def sliding_avg(
    events: DataFrame,
    ts_col: str = "tstamp",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "10 minutes",
    value_col: str = "value",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.avg(value_col).alias("avg_value"), F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "avg_value", "n")
    )


def sessionize(
    events: DataFrame,
    ts_col: str = "tstamp",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), key_col)
        .agg(F.count("*").alias("n_events"), F.min("event_id").alias("first_event"))
        .select(
            key_col,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "first_event",
        )
    )


def dedup_stream(
    events: DataFrame, ts_col: str = "tstamp", id_cols: tuple = ("event_id",), watermark: str = "10 minutes"
) -> DataFrame:
    """Exactly-once-per-id stream: dedup state is dropped once the watermark
    passes, so memory stays bounded at (ids seen within the delay).

    Keys on the id columns ALONE via dropDuplicatesWithinWatermark — a
    retried event re-stamped with a different timestamp is still the same
    id and must be dropped; including ts_col in the key (the
    dropDuplicates way to get bounded state) would let every re-stamped
    retry through."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(id_cols))


_RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)


def running_totals(events: DataFrame, timeout_ms: int = 300_000) -> DataFrame:
    """Custom stateful operator: per-user running (count, sum) emitted each
    micro-batch; state times out after ``timeout_ms`` idle — the same
    stale-entity semantics as the reference's stale-stream auto-EOF
    (cpp/ingester/src/ingester.cpp:492-539, default 300 000 ms)."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return iter(())
        # GroupState.get/exists are PROPERTIES on PySpark 4 — `state.get()`
        # would call the returned tuple and crash on the first multi-batch
        # run (single-batch availableNow tests never have existing state)
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "15 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: right rows match left rows with the same key
    whose event time falls in ``[left_ts, left_ts + max_delay]``.

    Both inputs must be watermarked for Spark to bound the join state —
    the time-range condition tells the engine exactly when a buffered row
    can never match again and its state is evicted. Column names must be
    disjoint across the two sides (rename before calling); this keeps the
    operator purely declarative so the micro-batch planner can pick the
    physical join strategy per batch."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, how)


_LOCF_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("raw_value", T.DoubleType()),
        T.StructField("filled_value", T.DoubleType()),
    ]
)
_LOCF_STATE = T.StructType([T.StructField("last", T.DoubleType())])


def _locf_update_fn(timeout_ms: int):
    """The LOCF state-update function, module-level so the post-timeout
    reset contract is unit-testable against a fake GroupState (a real
    ProcessingTimeTimeout needs wall-clock idle + a continuous trigger,
    which no hermetic test should wait on)."""
    import math

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return iter(())
        (last,) = state.get if state.exists else (float("nan"),)
        pdf = pd.concat(list(pdfs)).sort_values("event_id")
        seeded = pd.concat(
            [pd.Series([last], dtype="float64"), pdf["v"].astype("float64")],
            ignore_index=True,
        )
        filled = seeded.ffill().iloc[1:].reset_index(drop=True)
        new_last = filled.iloc[-1] if len(filled) else last
        state.update((float(new_last) if not math.isnan(new_last) else float("nan"),))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": [key[0]] * len(pdf),
                "raw_value": pdf["v"].to_numpy(dtype="float64"),
                "filled_value": filled.to_numpy(dtype="float64"),
            }
        )

    return update


def locf_fill_stream(events: DataFrame, timeout_ms: int = 300_000) -> DataFrame:
    """Stateful last-observation-carried-forward over a live stream of
    ``(event_id, user_id, v)`` rows: the streaming twin of the batch
    ``ev_locf_fill`` window. Per-user state is ONE double (the last
    observed reading) — O(keys) state regardless of stream length; each
    micro-batch's rows are filled vectorized (pandas ffill seeded with
    the carried state) in event_id order within the batch (the river
    source delivers batches in ascending sample ranges, so cross-batch
    order is the stream order). Idle keys time out like the reference's
    stale-stream janitor.

    Missing-reading contract: a dropout is SQL NULL (or NaN — the
    transport's typed arrays cannot carry NULL, so NaN is the on-wire
    dropout sentinel and is treated as missing, not as an observation;
    this intentionally differs from SQL ``IGNORE NULLS``, which would
    carry a NaN forward as a real reading). Leading gaps stay null.

    Post-timeout reset: when a key idles past ``timeout_ms`` its carried
    value is REMOVED, so in a continuous deployment the first dropout
    after a long gap is emitted null (as if the user were new) rather
    than filled from a stale pre-gap reading — deliberate divergence
    from the batch oracle, which has no notion of staleness. Under
    availableNow (how the gates run) processing-time timeouts never
    fire, so batch and stream agree there. Exercised in
    tests/test_streaming_ops.py::test_locf_stream_timeout_resets_state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _locf_update_fn(timeout_ms),
        outputStructType=_LOCF_SCHEMA,
        stateStructType=_LOCF_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4.0 stateful API) — protobuf-gated
# ---------------------------------------------------------------------------
def has_tws_runtime() -> bool:
    """True when transformWithStateInPandas can actually RUN here.

    The operator's Python state server speaks protobuf to the JVM
    (pyspark.sql.streaming.proto); pyspark only imports it lazily, so a
    session can BUILD a TWS query and then crash its driver worker with
    ``ImportError: google.protobuf`` at start. Same honesty contract as
    the zfpy gate in transport/compression.py: the capability is fully
    implemented, and environments without the optional dependency skip
    instead of pretending."""
    try:  # pragma: no cover - environment probe
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) via ``transformWithStateInPandas``
    — Spark 4.0's arbitrary-state API (SPARK-49564), the successor of
    ``running_totals``'s applyInPandasWithState. Functionally the same
    gate semantics (update-mode monotone totals, so max-per-key equals
    the batch aggregate); operationally different where it matters at
    100 TB: state lives in RocksDB with changelog checkpointing (state
    larger than executor memory, incremental commits), schema evolution
    is supported, and the same processor could register timers/TTL
    instead of a coarse GroupStateTimeout.

    Requires the RocksDB state store provider::

        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")

    and a protobuf-enabled Python env (see :func:`has_tws_runtime`).
    Exercised by tests/test_streaming_ops.py::test_running_totals_tws,
    which skips — like the zfpy byte-parity suite — where protobuf is
    absent (it is absent in this container; pyspark ships the TWS proto
    bindings but not protobuf itself)."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tot = handle.getValueState("tot", "n BIGINT, s DOUBLE")

        def handleInputRows(self, key, rows, timer_values):
            n, s = tuple(self._tot.get()) if self._tot.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._tot.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [s]}
            )

        def close(self) -> None:
            pass

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    return events.groupBy("user_id").transformWithStateInPandas(
        _Totals(), out_schema, "Update", "None"
    )


# ---------------------------------------------------------------------------
# Streaming KMV (bottom-k) distinct sketch
# ---------------------------------------------------------------------------
def kmv_merge(kept: list, incoming, k: int) -> list:
    """Merge new hash values into a bottom-k sketch: the k smallest
    DISTINCT values of (kept ∪ incoming), ascending. This is the entire
    KMV merge rule — commutative and associative, so the streaming fold
    below is independent of micro-batch boundaries (the property
    test_streaming_ops pins with random splits)."""
    s = set(kept)
    s.update(int(x) for x in incoming)
    return sorted(s)[:k]


_KMV_STATE = T.StructType(
    [
        T.StructField("heap", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def kmv_distinct(
    events: DataFrame,
    key_col: str = "segment",
    hash_col: str = "h",
    k: int = 64,
    timeout_ms: int = 300_000,
) -> DataFrame:
    """Custom stateful operator: per-key streaming distinct-count sketch.
    State is the bottom-k set of hash values seen for the key — bounded
    at k longs per key regardless of stream length — plus a monotone
    row counter so a drain harness can identify the final emission.
    Each micro-batch emits the key's updated (n_seen, k_n, theta) row;
    because :func:`kmv_merge` is order/batching-insensitive, the final
    row equals the batch-mode bottom-k over the same rows exactly —
    the mergeable-sketch property that also makes this the shape you
    would run per-executor and combine at 100 TB. The exactness
    guarantee has one carve-out: the ProcessingTimeTimeout janitor
    drops a key's state after ``timeout_ms`` of quiescence, so a key
    that goes quiet longer than that and then receives more rows
    restarts its sketch from empty — size ``timeout_ms`` beyond the
    longest per-key gap (the in-repo drain harness uses 300s against a
    50ms trigger, far beyond any gap it can produce)."""

    out_schema = T.StructType(
        [
            events.schema[key_col],
            T.StructField("n_seen", T.LongType()),
            T.StructField("k_n", T.LongType()),
            T.StructField("theta", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return iter(())
        kept, n = (list(state.get[0]), state.get[1]) if state.exists else ([], 0)
        for pdf in pdfs:
            n += len(pdf)
            kept = kmv_merge(kept, pdf[hash_col], k)
        state.update((kept, n))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_seen": [n],
                "k_n": [len(kept)],
                "theta": [kept[-1] if kept else None],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_KMV_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def space_saving_update(items: list, counts: list, errors: list,
                        batch, capacity: int):
    """One Space-Saving pass (Metwally et al., 2005) over ``batch``
    item values against the current (items, counts, errors) table.
    Pure-python helper so the property tests can drive it directly.
    Returns the updated three lists (not sorted; bounded at capacity).

    Invariants the tests pin: est - err <= true count <= est for every
    tracked item, and any item with true count > n/capacity is tracked
    (the heavy-hitter guarantee)."""
    pos = {it: i for i, it in enumerate(items)}
    for it in batch:
        i = pos.get(it)
        if i is not None:
            counts[i] += 1
        elif len(items) < capacity:
            pos[it] = len(items)
            items.append(it)
            counts.append(1)
            errors.append(0)
        else:
            j = min(range(len(items)), key=lambda i: (counts[i], items[i]))
            del pos[items[j]]
            pos[it] = j
            errors[j] = counts[j]
            counts[j] += 1
            items[j] = it
    return items, counts, errors


_SS_STATE = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("errors", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def space_saving_topk(
    events: DataFrame,
    key_col: str,
    item_col: str,
    capacity: int = 8,
    timeout_ms: int = 300_000,
) -> DataFrame:
    """Custom stateful operator: per-key streaming heavy hitters via
    the Space-Saving sketch — state bounded at ``capacity`` (item,
    count, error) triples per key no matter how long the stream runs.
    Each micro-batch emits the key's full current table (one row per
    tracked item, plus the monotone ``n_seen`` counter a drain harness
    keys on).

    Exactness contract: while a key's distinct-item count stays within
    ``capacity``, every error is 0 and the table IS the exact batch
    groupBy count (the driver-gated query runs in this regime, so the
    oracle is plain SQL). Past capacity the standard guarantees hold:
    est - err <= true <= est, and any item with true count > n_seen /
    capacity is tracked (pinned by the property tests). Same timeout
    carve-out as kmv_distinct: a key quiet longer than ``timeout_ms``
    restarts from empty state."""
    out_schema = T.StructType(
        [
            events.schema[key_col],
            T.StructField("n_seen", T.LongType()),
            T.StructField("item", T.StringType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("err", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return iter(())
        if state.exists:
            items, counts, errors, n = (
                list(state.get[0]),
                list(state.get[1]),
                list(state.get[2]),
                state.get[3],
            )
        else:
            items, counts, errors, n = [], [], [], 0
        for pdf in pdfs:
            n += len(pdf)
            items, counts, errors = space_saving_update(
                items, counts, errors, pdf[item_col].astype(str), capacity
            )
        state.update((items, counts, errors, n))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(items),
                "n_seen": [n] * len(items),
                "item": items,
                "cnt": counts,
                "err": errors,
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_SS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
