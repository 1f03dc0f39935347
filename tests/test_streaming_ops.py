"""Streaming-op tests: drive each operator through a real streaming query
(river source → memory sink), verifying results against batch equivalents
and watermark behavior (late rows dropped)."""

import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from river_spark.schema import FieldDefinition, FieldType, StreamSchema
from river_spark.sources import register
from river_spark.streaming.ops import (
    dedup_stream,
    running_totals,
    sessionize,
    windowed_counts,
)
from river_spark.transport import StreamLog, StreamWriter

BASE_MS = 1_700_000_000_000  # fixed epoch base for determinism


@pytest.fixture
def event_stream(tmp_path):
    """A stream of (event_id, ts_ms, user_id, value): 3 users, events every
    5 minutes for 5 hours, plus a duplicate id and an out-of-order late row."""
    log = StreamLog(str(tmp_path / "store"))
    schema = StreamSchema(
        [
            FieldDefinition("event_id", FieldType.INT64),
            FieldDefinition("ts_ms", FieldType.INT64),
            FieldDefinition("user_id", FieldType.INT64),
            FieldDefinition("value", FieldType.DOUBLE),
        ]
    )
    w = StreamWriter(log, batch_size=64).initialize("ev", schema)
    rows = []
    eid = 0
    for step in range(60):  # 5 hours at 5-minute cadence
        for user in range(3):
            rows.append((eid, BASE_MS + step * 300_000, user, 1.0))
            eid += 1
    rows.append((0, BASE_MS, 0, 1.0))  # exact duplicate of event 0
    rows.append((eid, BASE_MS - 3_600_000, 1, 1.0))  # very late row (1h before watermark floor)
    arr = np.zeros(len(rows), dtype=schema.dtype())
    for i, (e, t, u, v) in enumerate(rows):
        arr[i] = (e, t, u, v)
    w.write(arr)
    w.stop()
    return str(tmp_path / "store")


def _stream_df(spark, store):
    register(spark)
    df = (
        spark.readStream.format("river")
        .option("path", store)
        .option("stream", "ev")
        .load()
    )
    return df.withColumn("tstamp", F.timestamp_millis("ts_ms"))


def _run_to_memory(spark, sdf, name, mode="append"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_windowed_counts_complete(spark, event_stream):
    sdf = windowed_counts(
        _stream_df(spark, event_stream), key_col="user_id", window="1 hour", watermark="10 minutes"
    )
    out = _run_to_memory(spark, sdf, "wc", mode="complete")
    rows = out.collect()
    # BASE_MS is 22:13:20, so the 5-hour span covers 6 hour-windows per
    # user (18) + the 1-hour-earlier late window for user 1 = 19
    assert len(rows) == 19, rows
    assert sum(r.n for r in rows) == 182  # 180 + dup + late row
    assert all(r.total_value == float(r.n) for r in rows)


def test_watermark_closes_windows_and_drops_late(spark, tmp_path):
    """Two-phase append-mode run over one checkpoint: phase 2's data
    advances the watermark, which (a) emits phase 1's closed windows and
    (b) drops a row arriving far behind the watermark."""
    log = StreamLog(str(tmp_path / "wm_store"))
    schema = StreamSchema(
        [
            FieldDefinition("event_id", FieldType.INT64),
            FieldDefinition("ts_ms", FieldType.INT64),
            FieldDefinition("user_id", FieldType.INT64),
            FieldDefinition("value", FieldType.DOUBLE),
        ]
    )
    w = StreamWriter(log, batch_size=64).initialize("wm", schema)

    def write(rows):
        arr = np.zeros(len(rows), dtype=schema.dtype())
        for i, r in enumerate(rows):
            arr[i] = r
        w.write(arr)

    # phase 1: two events in hour 0
    write([(0, BASE_MS, 0, 1.0), (1, BASE_MS + 60_000, 0, 1.0)])
    register(spark)

    out_dir = str(tmp_path / "wm_out")

    def run(_name):
        df = (
            spark.readStream.format("river")
            .option("path", str(tmp_path / "wm_store"))
            .option("stream", "wm")
            .load()
            .withColumn("tstamp", F.timestamp_millis("ts_ms"))
        )
        sdf = windowed_counts(df, key_col="user_id", window="1 hour", watermark="10 minutes")
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "wm_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out_dir)

    assert run("wm1").count() == 0  # watermark not yet past hour 0

    # phase 2: an event 3 hours later — raises the watermark at batch END,
    # so nothing is emitted yet
    write([(2, BASE_MS + 3 * 3_600_000, 0, 1.0)])
    assert run("wm2").count() == 0

    # phase 3: a fresh event; this batch's watermark (from phase 2's data)
    # closes and emits the hour-0 window
    write([(3, BASE_MS + 4 * 3_600_000, 0, 1.0)])
    out = run("wm3").collect()
    assert len(out) == 1, out
    assert out[0].n == 2 and out[0].total_value == 2.0

    # phase 4: a far-late straggler inside the already-closed hour-0 window
    # → dropped (its state is gone); no duplicate/updated window row may
    # ever appear in the append-mode output
    write([(4, BASE_MS + 120_000, 0, 99.0), (5, BASE_MS + 5 * 3_600_000, 0, 1.0)])
    run("wm4")
    write([(6, BASE_MS + 6 * 3_600_000, 0, 1.0)])  # one more to flush
    final = run("wm5").collect()
    hour0 = [r for r in final if r.window_start.hour == 22]
    assert len(hour0) == 1 and hour0[0].n == 2 and hour0[0].total_value == 2.0
    assert not any(r.total_value >= 99.0 for r in final)  # straggler never surfaced


def test_sessionize_stream(spark, event_stream):
    # 5-minute cadence < 30-minute gap → one long session per user
    sdf = sessionize(_stream_df(spark, event_stream))
    out = _run_to_memory(spark, sdf, "sess", mode="append")
    rows = out.collect()
    # sessions are emitted only when closed by the watermark; the still-open
    # tail session stays in state, so we may see 0..1 per user from the
    # late-row split. Just require the op runs and schema is right.
    assert set(out.columns) == {"user_id", "session_start", "session_end", "n_events", "first_event"}


def test_dedup_stream(spark, event_stream):
    sdf = dedup_stream(_stream_df(spark, event_stream), id_cols=("event_id",))
    out = _run_to_memory(spark, sdf, "dd", mode="append")
    # duplicate of event 0 arrives in the same batch → dropped
    assert out.filter(F.col("event_id") == 0).count() == 1


def test_running_totals_stateful(spark, event_stream):
    sdf = running_totals(_stream_df(spark, event_stream))
    out = _run_to_memory(spark, sdf, "rt", mode="update")
    rows = {r.user_id: r for r in out.orderBy("user_id").collect()}
    # user 0: 60 events + 1 dup = 61; user 1: 60 + late = 61; user 2: 60
    assert rows[0].n_events == 61 and rows[1].n_events == 61 and rows[2].n_events == 60
    assert rows[2].total_value == 60.0


def test_running_totals_state_survives_multiple_batches(spark, event_stream):
    """The MULTI-batch path: maxSamplesPerTrigger slices the drain into
    several micro-batches, so batch 2+ reads EXISTING state —
    GroupState.get is a property on PySpark 4, and calling it
    (state.get()) crashed exactly here while single-batch tests passed."""
    register(spark)
    df = (
        spark.readStream.format("river")
        .option("path", event_stream)
        .option("stream", "ev")
        .option("maxSamplesPerTrigger", "50")  # 182 rows -> 4+ micro-batches
        .load()
        .withColumn("tstamp", F.timestamp_millis("ts_ms"))
    )
    out = _run_to_memory(spark, running_totals(df), "rt_mb", mode="update")
    # update mode emits one row per (user, batch); the LAST emission per
    # user carries the full running total
    import pyspark.sql.functions as F2

    last = (
        out.groupBy("user_id").agg(F2.max("n_events").alias("n")).orderBy("user_id").collect()
    )
    assert [r.n for r in last] == [61, 61, 60]


def test_windowed_counts_batch_parity(spark, event_stream):
    """The same windowed aggregation in batch mode must agree with the
    sum over the streaming output (completeness check)."""
    register(spark)
    batch = (
        spark.read.format("river")
        .option("path", event_stream)
        .option("stream", "ev")
        .load()
        .withColumn("tstamp", F.timestamp_millis("ts_ms"))
        .groupBy(F.window("tstamp", "1 hour"), F.lit("all"))
        .agg(F.count("*").alias("n"))
    )
    total_batch = batch.agg(F.sum("n")).collect()[0][0]
    assert total_batch == 182  # 180 + dup + late


def test_interval_join_stream_stream(spark, tmp_path):
    """Stream-stream interval join: clicks attach to the impression of the
    same user at most 15 minutes earlier. Verified against the equivalent
    batch join over the same two streams."""
    from river_spark.streaming.ops import interval_join

    log = StreamLog(str(tmp_path / "jstore"))
    imp_schema = StreamSchema(
        [
            FieldDefinition("imp_id", FieldType.INT64),
            FieldDefinition("imp_ts_ms", FieldType.INT64),
            FieldDefinition("imp_user", FieldType.INT64),
        ]
    )
    clk_schema = StreamSchema(
        [
            FieldDefinition("clk_id", FieldType.INT64),
            FieldDefinition("clk_ts_ms", FieldType.INT64),
            FieldDefinition("clk_user", FieldType.INT64),
        ]
    )
    wi = StreamWriter(log, batch_size=64).initialize("imp", imp_schema)
    wc = StreamWriter(log, batch_size=64).initialize("clk", clk_schema)
    # user 0: click 5 min after impression (match); user 1: click 20 min
    # after (outside window); user 2: click 1 min BEFORE (no match);
    # user 0 again: second impression 1h later, unclicked.
    imps = [(0, BASE_MS, 0), (1, BASE_MS, 1), (2, BASE_MS, 2), (3, BASE_MS + 3_600_000, 0)]
    clks = [(10, BASE_MS + 300_000, 0), (11, BASE_MS + 1_200_000, 1), (12, BASE_MS - 60_000, 2)]
    ai = np.zeros(len(imps), dtype=imp_schema.dtype())
    for i, r in enumerate(imps):
        ai[i] = r
    ac = np.zeros(len(clks), dtype=clk_schema.dtype())
    for i, r in enumerate(clks):
        ac[i] = r
    wi.write(ai), wi.stop()
    wc.write(ac), wc.stop()

    register(spark)

    def sread(name, ts_src, ts_dst):
        return (
            spark.readStream.format("river")
            .option("path", str(tmp_path / "jstore"))
            .option("stream", name)
            .load()
            .withColumn(ts_dst, F.timestamp_millis(ts_src))
        )

    joined = interval_join(
        sread("imp", "imp_ts_ms", "imp_t"),
        sread("clk", "clk_ts_ms", "clk_t"),
        left_key="imp_user",
        right_key="clk_user",
        left_ts="imp_t",
        right_ts="clk_t",
        max_delay="15 minutes",
    ).select("imp_id", "clk_id", "imp_user")
    out = _run_to_memory(spark, joined, "ij", mode="append")
    rows = {(r.imp_id, r.clk_id) for r in out.collect()}
    assert rows == {(0, 10)}, rows

    # batch parity: same join condition over the bounded reads
    def bread(name, ts_src, ts_dst):
        return (
            spark.read.format("river")
            .option("path", str(tmp_path / "jstore"))
            .option("stream", name)
            .load()
            .withColumn(ts_dst, F.timestamp_millis(ts_src))
        )

    b = (
        bread("imp", "imp_ts_ms", "imp_t")
        .join(
            bread("clk", "clk_ts_ms", "clk_t"),
            (F.col("imp_user") == F.col("clk_user"))
            & (F.col("clk_t") >= F.col("imp_t"))
            & (F.col("clk_t") <= F.col("imp_t") + F.expr("INTERVAL 15 minutes")),
        )
        .select("imp_id", "clk_id")
    )
    assert {(r.imp_id, r.clk_id) for r in b.collect()} == rows


def test_locf_stream_multibatch_carry_and_leading_nulls(spark, tmp_path):
    """Stateful LOCF across micro-batch boundaries: a value observed in
    batch 1 must fill a dropout that arrives in a LATER batch, and a key
    whose first readings are all null stays null until its first real
    value. Built with explicit per-user sequences so every expectation
    is hand-checkable."""
    import numpy as np

    from river_spark.schema import FieldDefinition, FieldType, StreamSchema
    from river_spark.sources import register
    from river_spark.streaming.ops import locf_fill_stream
    from river_spark.transport.log import StreamLog
    from river_spark.transport.writer import StreamWriter

    register(spark)
    store = str(tmp_path / "locf_store")
    log = StreamLog(store)
    schema = StreamSchema(
        [
            FieldDefinition("event_id", FieldType.INT64),
            FieldDefinition("user_id", FieldType.INT64),
            FieldDefinition("value", FieldType.DOUBLE),
        ]
    )
    # user 7: value at event 0, dropouts at 2, 4 (batches 1 and 2)
    # user 8: leading dropouts at 1, 3; first value at event 5; dropout at 7
    rows = [
        (0, 7, 10.0),
        (1, 8, np.nan),
        (2, 7, np.nan),
        (3, 8, np.nan),
        (4, 7, np.nan),
        (5, 8, 20.0),
        (6, 7, 11.0),
        (7, 8, np.nan),
    ]
    w = StreamWriter(log, batch_size=4).initialize("locf_ev", schema)
    buf = w.new_buffer(len(rows))
    buf["event_id"] = [r[0] for r in rows]
    buf["user_id"] = [r[1] for r in rows]
    buf["value"] = [r[2] for r in rows]
    w.write(buf)
    w.stop()
    sdf = (
        spark.readStream.format("river")
        .option("path", store)
        .option("stream", "locf_ev")
        .option("maxSamplesPerTrigger", "3")  # 8 rows -> 3 micro-batches
        .load()
        .select(
            "event_id",
            "user_id",
            F.when(F.isnan("value"), F.lit(None).cast("double"))
            .otherwise(F.col("value"))
            .alias("v"),
        )
    )
    out = _run_to_memory(spark, locf_fill_stream(sdf), "locf_mb", mode="update")
    got = {r.event_id: r.filled_value for r in out.collect()}
    assert got == {
        0: 10.0,
        1: None,   # leading dropout: nothing to carry
        2: 10.0,   # filled from batch-1 state
        3: None,   # still nothing for user 8
        4: 10.0,   # carried across ANOTHER batch boundary
        5: 20.0,
        6: 11.0,
        7: 20.0,   # user 8's first real value carried forward
    }


def test_locf_stream_timeout_resets_state():
    """Documents the post-timeout reset contract (see locf_fill_stream
    docstring): once a key's state times out, its carried value is
    REMOVED — a dropout arriving after the idle gap is emitted null
    (fresh-key behavior), NOT filled from the stale pre-gap reading.
    Driven against a fake GroupState because a real ProcessingTimeTimeout
    needs wall-clock idle under a continuous trigger."""
    import math

    import pandas as pd

    from river_spark.streaming.ops import _locf_update_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v, self.exists = v, True

        def remove(self):
            self._v, self.exists = None, False

        def setTimeoutDuration(self, ms):
            pass

    update = _locf_update_fn(1000)
    state = FakeState()
    # batch 1: an observation, then a dropout -> dropout filled with 2.5
    out1 = pd.concat(list(update(
        (7,), iter([pd.DataFrame({"event_id": [1, 2], "v": [2.5, math.nan]})]), state
    )))
    assert list(out1["filled_value"]) == [2.5, 2.5]
    assert state.exists and state.get == (2.5,)
    # idle gap: the timeout fires -> state removed, nothing emitted
    state.hasTimedOut = True
    assert list(update((7,), iter(()), state)) == []
    assert not state.exists
    # batch 2 after the gap: leading dropout is NULL again, not 2.5
    state.hasTimedOut = False
    out2 = pd.concat(list(update(
        (7,), iter([pd.DataFrame({"event_id": [3, 4], "v": [math.nan, 9.0]})]), state
    )))
    assert math.isnan(out2["filled_value"].iloc[0])
    assert out2["filled_value"].iloc[1] == 9.0


def test_running_totals_tws(spark, event_stream):
    """transformWithStateInPandas running totals (Spark 4.0 arbitrary
    state API). Skips where protobuf is absent — pyspark's TWS driver
    worker imports google.protobuf at query START (the build succeeds,
    the first micro-batch crashes), so the gate probes the import, not
    the API surface. Same honesty contract as the zfpy parity skips."""
    from river_spark.streaming.ops import has_tws_runtime, running_totals_tws

    if not has_tws_runtime():
        pytest.skip("google.protobuf absent: TWS state server cannot start")
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        sdf = running_totals_tws(_stream_df(spark, event_stream))
        out = _run_to_memory(spark, sdf, "rt_tws", mode="update")
        last = (
            out.groupBy("user_id")
            .agg(F.max("n_events").alias("n"))
            .orderBy("user_id")
            .collect()
        )
        assert [r.n for r in last] == [61, 61, 60]
    finally:
        if old:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


# ---------------------------------------------------------------------------
# KMV bottom-k merge rule: batching-invariance is what makes the
# streaming sketch equal the batch sketch exactly
# ---------------------------------------------------------------------------
from hypothesis import given, settings as hyp_settings, strategies as st

from river_spark.streaming.ops import kmv_merge


@given(
    vals=st.lists(st.integers(min_value=0, max_value=2**60 - 1), max_size=300),
    cuts=st.lists(st.integers(min_value=0, max_value=300), max_size=5),
    k=st.sampled_from([1, 4, 64]),
)
@hyp_settings(max_examples=200, deadline=None)
def test_kmv_merge_batching_invariant(vals, cuts, k):
    """Folding kmv_merge over ANY split of the input equals one shot over
    the whole input — duplicates, ordering, and micro-batch boundaries
    can't move the sketch. This is the exact property the streaming
    drain (river_stream_kmv_distinct) relies on to match its batch
    oracle bit-for-bit."""
    one_shot = kmv_merge([], vals, k)
    bounds = sorted({min(c, len(vals)) for c in cuts} | {0, len(vals)})
    state = []
    for lo, hi in zip(bounds, bounds[1:]):
        state = kmv_merge(state, vals[lo:hi], k)
    if not any(hi > lo for lo, hi in zip(bounds, bounds[1:])):
        state = kmv_merge(state, [], k)
    assert state == one_shot
    assert state == sorted(set(vals))[:k]
    assert len(state) <= k


# ---------------------------------------------------------------------------
# Space-Saving heavy hitters (streaming/ops.space_saving_topk)
# ---------------------------------------------------------------------------

def test_space_saving_exact_regime():
    """Distinct items <= capacity: the table IS the exact count map
    with zero errors, regardless of batching."""
    from collections import Counter

    from river_spark.streaming.ops import space_saving_update

    stream = (["a"] * 10 + ["b"] * 7 + ["c"] * 3) * 4
    items, counts, errors = [], [], []
    # three different batch splits must all converge to the same table
    for lo, hi in ((0, 30), (30, 55), (55, len(stream))):
        items, counts, errors = space_saving_update(
            items, counts, errors, stream[lo:hi], capacity=8
        )
    got = dict(zip(items, counts))
    assert got == dict(Counter(stream))
    assert errors == [0, 0, 0]


def test_space_saving_eviction_guarantees():
    """Past capacity the Metwally bounds must hold: for every tracked
    item est-err <= true <= est, and every item with true count >
    n/capacity is tracked."""
    import random
    from collections import Counter

    rng = random.Random(13)
    # zipf-ish stream over 40 distinct items, capacity 8
    universe = [f"i{k}" for k in range(40)]
    weights = [1.0 / (k + 1) for k in range(40)]
    stream = rng.choices(universe, weights=weights, k=5000)
    true = Counter(stream)

    from river_spark.streaming.ops import space_saving_update

    items, counts, errors = [], [], []
    # arbitrary batching
    i = 0
    while i < len(stream):
        j = min(len(stream), i + rng.randint(1, 400))
        items, counts, errors = space_saving_update(
            items, counts, errors, stream[i:j], capacity=8
        )
        i = j
    assert len(items) == 8
    n = len(stream)
    for it, est, err in zip(items, counts, errors):
        assert est - err <= true[it] <= est, (it, est, err, true[it])
    tracked = set(items)
    for it, c in true.items():
        if c > n / 8:
            assert it in tracked, (it, c)
    # min tracked count bounds every untracked item's true count
    min_count = min(counts)
    for it, c in true.items():
        if it not in tracked:
            assert c <= min_count


def test_space_saving_spark_stream(spark, tmp_path):
    """The operator on a real micro-batched stream in the exact regime
    equals the batch groupBy, across a forced multi-batch run."""
    import pandas as pd
    from pyspark.sql import functions as F2

    from river_spark.streaming.ops import space_saving_topk, stop_quiet

    rows = []
    for i in range(300):
        rows.append((i % 3, f"t{i % 4}"))
    src = spark.createDataFrame(rows, "k long, item string")
    path = str(tmp_path / "ss_src")
    src.repartition(6).write.parquet(path)
    stream = (
        spark.readStream.schema("k long, item string")
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    out = space_saving_topk(stream, key_col="k", item_col="item", capacity=8)
    qy = (
        out.writeStream.format("memory")
        .queryName("ss_test_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    qy.awaitTermination(120)
    stop_quiet(qy)
    final = (
        spark.sql(
            """
            SELECT k, item, cnt FROM ss_test_sink s
            WHERE n_seen = (SELECT max(n_seen) FROM ss_test_sink WHERE k = s.k)
            """
        )
        .toPandas()
        .sort_values(["k", "item"], ignore_index=True)
    )
    exp = (
        src.groupBy("k", "item").agg(F2.count("*").alias("cnt"))
        .toPandas()
        .sort_values(["k", "item"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(final.astype({"cnt": "int64"}), exp.astype({"cnt": "int64"}))
