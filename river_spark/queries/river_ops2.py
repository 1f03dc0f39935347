"""Streaming join-shape completions: the RIGHT-outer and FULL-outer
watermark-bounded stream-stream joins, finishing the family started by
``river_stream_outer_join`` (left-outer, river_ops.py). Each runs two
REAL river streams through Structured Streaming and aggregates the
drained sink, so the driver gate checks actual watermark-eviction
null-padding semantics, not a batch re-phrasing.

Reference parity: the reference engine exposes multi-stream readers the
user composes imperatively (cpp/src/reader.h); the Spark-first
re-expression is declarative stream-stream joins, where the engine owns
state eviction. See SURVEY.md section 2 Part B (Streaming).
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
    _SENTINEL_PROMO_NS,
    _events_array,
    _ghost_event,
    _memory_table_name,
)
from river_spark.schema import FieldDefinition, FieldType, StreamSchema
from river_spark.transport import StreamLog, StreamWriter

# Ghost promos: users guaranteed absent from events (max_user + 1..10),
# so the right side always carries rows only watermark eviction can
# release. Mirrored literally in the oracles below.
_N_GHOSTS = 10


def _outer_join_table(spark, sf_dir: str, how: str) -> str:
    """Build the two streams, run the ``how`` stream-stream join, drain
    to a memory sink, and return the sink table name (cached per
    (how, sf_dir)).

    Stream layout mirrors river_stream_outer_join's determinism
    engineering: two far-future sentinel rows per stream (plus the
    float-division sentinel ghost event) and maxSamplesPerTrigger sized
    so the engine slices exactly two micro-batches — batch 1 (all data
    + sentinel A) advances both watermarks ~4 months past the data,
    batch 2 (sentinel B) is the state-cleanup pass that emits every
    null-padded row. The Python DataSource API has no AvailableNow, so
    the drain polls a processingTime trigger until the expected row
    count surfaces."""
    from river_spark.sources import register

    key = (f"stream_{how}_join", sf_dir)
    if key in _CACHE:
        return _CACHE[key]
    register(spark)
    work = _scratch_dir(prefix=f"river_spark_s{how}j_")
    store = os.path.join(work, "store")
    log = StreamLog(store)
    schema, arr = _events_array(sf_dir, ("event_id", "ts", "user_id", "value"))
    far_a = np.datetime64("2024-06-01T00:00:00").astype("datetime64[ns]").astype(np.int64)
    far_b = np.datetime64("2024-06-01T00:00:01").astype("datetime64[ns]").astype(np.int64)
    sent = np.zeros(2, dtype=schema.dtype())
    sent["event_id"] = [-1, -2]
    sent["ts"] = [far_a, far_b]
    sent["user_id"] = -1
    # Float-division sentinel (see _SENTINEL_EVENT_NS in river_ops.py):
    # the FIRST ghost user gets one real event pinned 1us-divergent
    # under the banned double-division idiom; its promo (below) puts the
    # range's lower boundary exactly on the event's true microsecond, so
    # a regression un-matches it and every join shape's oracle goes red.
    ghost = int(arr["user_id"].max()) + 1
    w = StreamWriter(log).initialize(f"events_{how}", schema)
    w.write(np.concatenate([arr, _ghost_event(schema, ghost), sent]))
    w.stop()

    users = np.unique(arr["user_id"])
    even_users = users[users % 2 == 0]
    ghost_users = int(users.max()) + np.arange(1, _N_GHOSTS + 1, dtype=np.int64)
    promo_users = np.concatenate([even_users, ghost_users])
    pschema = StreamSchema(
        [
            FieldDefinition("ts", FieldType.INT64),
            FieldDefinition("user_id", FieldType.INT64),
            FieldDefinition("bonus", FieldType.DOUBLE),
        ]
    )
    promo_ts = (
        np.datetime64("2023-12-31T00:00:00").astype("datetime64[ns]").astype(np.int64)
    )
    parr = np.zeros(len(promo_users) + 2, dtype=pschema.dtype())
    parr["ts"][: len(promo_users)] = promo_ts
    parr["ts"][len(promo_users) :] = [far_a, far_b]
    parr["user_id"][: len(promo_users)] = promo_users
    parr["user_id"][len(promo_users) :] = -2
    parr["bonus"][: len(promo_users)] = promo_users * 0.1 + 1
    # the first ghost's promo carries the sentinel boundary timestamp
    # (ns offset +500: float-EXACT, so only the event side can diverge)
    parr["ts"][len(even_users)] = _SENTINEL_PROMO_NS
    w2 = StreamWriter(log).initialize(f"promos_{how}", pschema)
    w2.write(parr)
    w2.stop()

    # Exact integer ns->us: float division via `/ F.lit(1000)` runs in
    # double, and at 2024 epoch-ns magnitude the 53-bit mantissa
    # truncates values that aren't 512ns multiples 1us off — exactly
    # the outer-join watermark-boundary tie these queries split on (see
    # river_ops3.py for the full derivation). `ts div 1000` stays in
    # long integer arithmetic.
    ets = F.timestamp_micros(F.expr("ts div 1000"))
    ev = (
        spark.readStream.format("river")
        .option("path", store)
        .option("stream", f"events_{how}")
        .option("maxSamplesPerTrigger", str(len(arr) + 2))
        .load()
        .select("user_id", "value", ets.alias("ets"))
        .withWatermark("ets", "1 second")
    )
    pr = (
        spark.readStream.format("river")
        .option("path", store)
        .option("stream", f"promos_{how}")
        .option("maxSamplesPerTrigger", str(len(promo_users) + 1))
        .load()
        .select(F.col("user_id").alias("p_user_id"), "bonus", ets.alias("pts"))
        .withWatermark("pts", "1 second")
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("ets") >= F.col("pts"))
        & (F.col("ets") <= F.col("pts") + F.expr("interval 60 days"))
    )
    n_matched_events = int((arr["user_id"] % 2 == 0).sum())
    if how == "left_semi":
        # semi keeps only left columns; pad the right-side names so the
        # shared drain predicate/table shape still applies
        joined = ev.join(pr, cond, how).select(
            "user_id",
            F.lit(None).cast("long").alias("p_user_id"),
            "value",
            F.lit(None).cast("double").alias("bonus"),
        )
        want = n_matched_events + 1  # + the matched sentinel ghost event
    elif how == "inner":
        joined = ev.join(pr, cond, how).select("user_id", "p_user_id", "value", "bonus")
        want = n_matched_events + 1  # + the matched sentinel ghost event
    elif how in ("right_outer", "full_outer"):
        joined = ev.join(pr, cond, how).select("user_id", "p_user_id", "value", "bonus")
        # totals are sentinel-invariant: the ghost event turns one
        # right_only promo row into one matched row
        want = (
            n_matched_events + _N_GHOSTS
            if how == "right_outer"
            else len(arr) + 1 + _N_GHOSTS - 1
        )
    else:  # pragma: no cover - this helper only serves these shapes
        raise ValueError(how)

    table = _memory_table_name(f"river_s{how}_", sf_dir)
    qy = (
        joined.writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    deadline = _time.monotonic() + 300
    try:
        while True:
            n = spark.sql(
                f"SELECT count(*) FROM {table} "
                f"WHERE coalesce(user_id, p_user_id) >= 0"
            ).first()[0]
            if n >= want:
                break
            if _time.monotonic() > deadline:
                raise TimeoutError(
                    f"{table}: {how} drain surfaced {n}/{want} rows in 300s"
                )
            _time.sleep(0.25)
    finally:
        stop_quiet(qy)
    _CACHE[key] = table
    return table


_SIDE_AGG = """
    SELECT CASE WHEN user_id IS NULL THEN 'right_only'
                WHEN bonus IS NULL THEN 'left_only'
                ELSE 'matched' END AS side,
           count(*) AS n,
           round(sum(coalesce(value, 0)), 4) AS sum_value,
           round(sum(coalesce(bonus, 0)), 4) AS sum_bonus
    FROM {table} WHERE coalesce(user_id, p_user_id) >= 0
    GROUP BY 1
"""

# Promo build mirrored from _outer_join_table: one promo per DISTINCT
# even user (bonus = user_id*0.1 + 1, the same two IEEE ops NumPy ran)
# plus _N_GHOSTS promos for users above the event range. ev_all adds
# the float-division sentinel ghost event (first ghost user, value
# 0.25) that the streamed fixture appends — see _SENTINEL_EVENT_NS in
# river_ops.py — so a regression to double ns->us division un-matches
# it and every oracle in this family goes red.
_PROMO_CTE = f"""
    WITH ev_all AS (
        SELECT user_id, value FROM events
        UNION ALL
        SELECT max(user_id) + 1 AS user_id, 0.25 AS value FROM events),
    uw AS (
        SELECT DISTINCT user_id, user_id * 0.1 + 1 AS bonus
        FROM events WHERE user_id % 2 = 0
        UNION ALL
        SELECT mx + i AS user_id, (mx + i) * 0.1 + 1 AS bonus
        FROM (SELECT max(user_id) AS mx FROM events),
             (SELECT unnest(range(1, {_N_GHOSTS + 1})) AS i) t)
"""


@q(
    "river_stream_right_outer_join",
    oracle=_PROMO_CTE
    + """
    SELECT CASE WHEN e.user_id IS NULL THEN 'right_only'
                WHEN uw.bonus IS NULL THEN 'left_only'
                ELSE 'matched' END AS side,
           count(*) AS n,
           round(sum(coalesce(e.value, 0)), 4) AS sum_value,
           round(sum(coalesce(uw.bonus, 0)), 4) AS sum_bonus
    FROM ev_all e RIGHT JOIN uw ON e.user_id = uw.user_id
    GROUP BY 1
    """,
    tags=("river", "streaming", "join", "outer", "watermark"),
)
def river_stream_right_outer_join(spark, sf_dir):
    """Watermark-bounded RIGHT OUTER stream-stream join: promos for
    users who never produced an event (the ghost block) must surface
    exactly once, null-padded on the event side, and only after the
    watermark proves no matching event can still arrive; unmatched
    events are dropped. The drained sink must aggregate to the batch
    RIGHT JOIN — two result rows (matched / right_only)."""
    table = _outer_join_table(spark, sf_dir, "right_outer")
    return spark.sql(_SIDE_AGG.format(table=table))


@q(
    "river_stream_full_outer_join",
    oracle=_PROMO_CTE
    + """
    SELECT CASE WHEN e.user_id IS NULL THEN 'right_only'
                WHEN uw.bonus IS NULL THEN 'left_only'
                ELSE 'matched' END AS side,
           count(*) AS n,
           round(sum(coalesce(e.value, 0)), 4) AS sum_value,
           round(sum(coalesce(uw.bonus, 0)), 4) AS sum_bonus
    FROM ev_all e FULL JOIN uw ON e.user_id = uw.user_id
    GROUP BY 1
    """,
    tags=("river", "streaming", "join", "outer", "watermark"),
)
def river_stream_full_outer_join(spark, sf_dir):
    """Watermark-bounded FULL OUTER stream-stream join — both
    null-padding directions in one query: odd-user events surface
    left-padded, ghost promos surface right-padded, each exactly once
    on watermark close. The drained sink must aggregate to the batch
    FULL JOIN — three result rows (matched / left_only / right_only)."""
    table = _outer_join_table(spark, sf_dir, "full_outer")
    return spark.sql(_SIDE_AGG.format(table=table))


@q(
    "river_stream_semi_join",
    oracle=_PROMO_CTE
    + """
    SELECT e.user_id % 2 AS parity,
           count(*) AS n,
           round(sum(e.value), 4) AS sum_value
    FROM ev_all e SEMI JOIN uw ON e.user_id = uw.user_id
    GROUP BY 1
    """,
    tags=("river", "streaming", "join", "semi", "watermark"),
)
def river_stream_semi_join(spark, sf_dir):
    """Stream-stream LEFT SEMI join: an event surfaces exactly once as
    soon as any promo for its user arrives (existence check, no
    payload), unmatched events never surface — the streaming filter-by-
    membership shape. Drained rows must aggregate to the batch SEMI
    JOIN: one result row (even parity only)."""
    table = _outer_join_table(spark, sf_dir, "left_semi")
    return spark.sql(
        f"""
        SELECT user_id % 2 AS parity,
               count(*) AS n,
               round(sum(value), 4) AS sum_value
        FROM {table} WHERE user_id >= 0
        GROUP BY user_id % 2
        """
    )


@q(
    "river_stream_inner_join",
    oracle=_PROMO_CTE
    + """
    SELECT e.user_id % 2 AS parity,
           count(*) AS n,
           round(sum(e.value), 4) AS sum_value,
           round(sum(uw.bonus), 4) AS sum_bonus
    FROM ev_all e JOIN uw ON e.user_id = uw.user_id
    GROUP BY 1
    """,
    tags=("river", "streaming", "join", "inner", "watermark"),
)
def river_stream_inner_join(spark, sf_dir):
    """Stream-stream INNER join — the family's baseline shape,
    completing left/right/full/semi (the inner join needs no
    null-padding eviction pass, but rows still only release once both
    sides' watermarks admit the match, and state for closed windows
    must still be dropped). Same fixture engineering as the outer
    shapes, including the float-division sentinel ghost event that must
    join exactly at the range's lower boundary. Drained rows must
    aggregate to the batch INNER JOIN: one result row (even parity
    only, since only even users carry promos)."""
    table = _outer_join_table(spark, sf_dir, "inner")
    return spark.sql(
        f"""
        SELECT user_id % 2 AS parity,
               count(*) AS n,
               round(sum(value), 4) AS sum_value,
               round(sum(bonus), 4) AS sum_bonus
        FROM {table} WHERE user_id >= 0
        GROUP BY user_id % 2
        """
    )
