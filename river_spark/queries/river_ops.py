"""River-surface parity queries: run the actual transport + ingester over
driver data, then query the ingested Parquet with Spark. These prove the
A-series operators (write/read/ingest/system columns) against the DuckDB
oracle on the ORIGINAL table — the round trip must be lossless.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from river_spark.streaming.ops import stop_quiet
from river_spark.ingest import IngesterSettings, StreamIngester, StreamIngestionSettings
from river_spark.ingest.layout import data_glob
from river_spark.queries.relational import q
from river_spark.schema import FieldDefinition, FieldType, StreamSchema
from river_spark.transport import StreamLog, StreamWriter

# keys are either sf_dir strings (_ingested_events_dir) or
# (variant, sf_dir) tuples (the other cached fixtures)
_CACHE: dict[str | tuple, str] = {}

# Streaming-parity fixtures stage real stream stores under /tmp; the
# round-12 cleanup found 800+ leaked dirs from prior test sessions, so
# every fixture dir now registers for removal at interpreter exit (the
# in-process _CACHE keeps them alive exactly as long as they're useful).
_SCRATCH: list[str] = []


def _scratch_dir(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH.append(d)
    return d


@atexit.register
def _cleanup_scratch() -> None:  # pragma: no cover - exit hook
    for d in _SCRATCH:
        shutil.rmtree(d, ignore_errors=True)

_EVENT_FIELDS = {
    "event_id": FieldType.INT64,
    "ts": FieldType.INT64,
    "user_id": FieldType.INT64,
    "value": FieldType.DOUBLE,
}


# Anti-vacuous float-division sentinel (r12 directive #1): one ghost
# event whose epoch-ns value double-truncates 1us LOW under the banned
# `(ts / F.lit(1000)).cast("long")` idiom, paired with a promo whose
# lower range boundary sits exactly on the event's true microsecond.
# Under the pinned integer `ts div 1000` the boundary equality holds and
# the ghost event JOINS (mirrored literally in the oracles via a
# UNION ALL row); if float division ever regresses, the event converts
# to ...015us < pts ...016us and silently falls out of the join — the
# driver oracle goes red instead of passing vacuously (the real events
# fixture is us-aligned, so its 1us float errors never cross a
# second/window boundary and cannot catch the class on their own):
#   trunc(float64(1705276800000016000) / 1e3) == ...015  (err -1)
#   trunc(float64(1705276800000016500) / 1e3) == ...016  (err  0)
_SENTINEL_EVENT_NS = 1_705_276_800_000_016_000  # 2024-01-15T00:00:00.000016
_SENTINEL_PROMO_NS = 1_705_276_800_000_016_500
_SENTINEL_VALUE = 0.25  # exactly representable; sums stay bit-stable


def _ghost_event(schema, user_id: int) -> np.ndarray:
    """The single sentinel data row appended to a streamed events copy
    (and mirrored as a UNION ALL literal in the paired oracle SQL)."""
    gev = np.zeros(1, dtype=schema.dtype())
    gev["event_id"] = -3
    gev["ts"] = _SENTINEL_EVENT_NS
    gev["user_id"] = user_id
    gev["value"] = _SENTINEL_VALUE
    return gev


# The staging fixture materializes the events table in DRIVER memory to
# feed the transport writer — a parity harness for the sf0.001/sf0.01
# correctness gates, NOT a bulk ingest path (production ingest is the
# DataSource sink + streaming ingester, which never collect). The cap
# turns an accidental large-sf invocation into a clear error instead of
# a driver OOM.
_MAX_STAGING_ROWS = 2_000_000


def _events_array(sf_dir: str, columns: tuple[str, ...]) -> tuple[StreamSchema, np.ndarray]:
    """(StreamSchema, packed struct array) of the requested events columns
    — the one staging recipe shared by every transport round-trip query.
    ts (any physical layout) is packed as INT64 epoch-nanos."""
    schema = StreamSchema([FieldDefinition(c, _EVENT_FIELDS[c]) for c in columns])
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=list(columns))
    if t.num_rows > _MAX_STAGING_ROWS:
        raise ValueError(
            f"_events_array is a driver-side parity fixture capped at "
            f"{_MAX_STAGING_ROWS} rows; {sf_dir} has {t.num_rows}. Use the "
            f"river DataSource sink / StreamIngester for bulk data."
        )
    arr = np.zeros(t.num_rows, dtype=schema.dtype())
    for c in columns:
        col = t.column(c).to_numpy()
        if c == "ts":
            col = col.astype("datetime64[ns]").astype(np.int64)
        arr[c] = col
    return schema, arr


def _ingested_events_dir(sf_dir: str) -> str:
    """Write the events table through the stream transport, ingest it to
    Parquet, return the output dir. Cached per sf_dir within the process."""
    if sf_dir in _CACHE and os.path.isdir(_CACHE[sf_dir]):
        return _CACHE[sf_dir]
    work = _scratch_dir(prefix="river_spark_roundtrip_")
    log = StreamLog(os.path.join(work, "store"))
    schema, arr = _events_array(sf_dir, ("event_id", "ts", "user_id", "value"))
    w = StreamWriter(log).initialize("events_rt", schema)
    w.write(arr)
    w.stop()
    ing = StreamIngester(
        log,
        os.path.join(work, "out"),
        IngesterSettings(streams=[StreamIngestionSettings(minimum_age_seconds_before_deletion=0)]),
    )
    ing.ingest()
    ing.wait_all()
    out = os.path.join(work, "out", "events_rt")
    _CACHE[sf_dir] = out
    shutil.rmtree(os.path.join(work, "store"), ignore_errors=True)
    return out


def _memory_table_name(prefix: str, sf_dir: str) -> str:
    import re as _re

    return prefix + _re.sub(r"\W", "_", sf_dir).strip("_")


def _drain_to_memory(streaming_df, work: str, table: str, output_mode: str | None = None) -> str:
    """Shared drain scaffold of every live streaming gate: availableNow
    into a memory sink named ``table``. On timeout the query is STOPPED
    before raising — leaving it running would hold the query name, so a
    same-session retry would die on 'query with that name is already
    active' instead of surfacing the real timeout."""
    wr = (
        streaming_df.writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
    )
    if output_mode:
        wr = wr.outputMode(output_mode)
    q = wr.trigger(availableNow=True).start()
    if not q.awaitTermination(300):
        q.stop()  # release the name; a partial table must never be cached
        raise TimeoutError(f"{table}: streaming drain exceeded 300s")
    return table


@q(
    "river_ingest_roundtrip",
    oracle="SELECT event_id, user_id, round(value, 4) AS value FROM events",
    tags=("river", "roundtrip"),
)
def river_ingest_roundtrip(spark, sf_dir):
    """A1+A2+A13 end-to-end: every events row must survive
    write→segment→ingest→Parquet bit-exactly."""
    out = _ingested_events_dir(sf_dir)
    df = spark.read.parquet(data_glob(out))
    return df.select("event_id", "user_id", F.round("value", 4).alias("value"))


@q(
    "river_system_columns",
    oracle="""
    SELECT count(*) AS n, CAST(0 AS BIGINT) AS min_idx,
           count(*) - 1 AS max_idx, count(*) AS n_keys, count(*) AS n_ts_ok
    FROM events
    """,
    tags=("river", "invariants"),
)
def river_system_columns(spark, sf_dir):
    """A20 invariants as a query: sample_index contiguous from 0, keys
    globally unique, timestamp_ms equal to each key's ms prefix."""
    out = _ingested_events_dir(sf_dir)
    df = spark.read.parquet(data_glob(out))
    return df.agg(
        F.count("*").alias("n"),
        F.min("sample_index").alias("min_idx"),
        F.max("sample_index").alias("max_idx"),
        F.countDistinct("key").alias("n_keys"),
        F.sum(
            (F.split(F.col("key"), "-").getItem(0).cast("long") == F.col("timestamp_ms")).cast("long")
        ).alias("n_ts_ok"),
    )


@q(
    "river_compressed_roundtrip",
    oracle="SELECT event_id, user_id, round(value, 4) AS value FROM events",
    tags=("river", "compression", "roundtrip"),
)
def river_compressed_roundtrip(spark, sf_dir):
    """A21 through the driver gate: the same events write→ingest→Parquet
    round trip as river_ingest_roundtrip, but with ZLIB_LOSSLESS block
    compression on the wire (byte-transposed zlib, the working stand-in
    for the reference's ZFP_LOSSLESS, compressor_types.h:24-101). The
    reader decompresses transparently from the stream's metadata params
    (cpp/src/reader.cpp:34-79), so the result must still be bit-exact."""
    from river_spark.transport.compression import CompressionMode, Compressor

    key = ("compressed", sf_dir)
    if key not in _CACHE or not os.path.isdir(_CACHE[key]):
        work = _scratch_dir(prefix="river_spark_comprt_")
        log = StreamLog(os.path.join(work, "store"))
        schema, arr = _events_array(sf_dir, ("event_id", "user_id", "value"))
        w = StreamWriter(log, compression=Compressor(CompressionMode.ZLIB_LOSSLESS))
        w.initialize("events_comp", schema)
        w.write(arr)
        w.stop()
        ing = StreamIngester(
            log,
            os.path.join(work, "out"),
            IngesterSettings(streams=[StreamIngestionSettings(minimum_age_seconds_before_deletion=0)]),
        )
        ing.ingest()
        ing.wait_all()
        _CACHE[key] = os.path.join(work, "out", "events_comp")
        shutil.rmtree(os.path.join(work, "store"), ignore_errors=True)
    df = spark.read.parquet(data_glob(_CACHE[key]))
    return df.select("event_id", "user_id", F.round("value", 4).alias("value"))


@q(
    "river_pruned_ingest",
    oracle="SELECT event_id, user_id FROM events",
    tags=("river", "pruning"),
)
def river_pruned_ingest(spark, sf_dir):
    """A18+A19 through the driver gate: two streams are written; routing
    settings ingest ONLY the events stream (stream-name regex,
    ingester.cpp:66-77) and prune its 'value' column at ingest time
    (field blacklist, ingester_settings.h:30-39). The output must hold
    exactly the surviving columns of the routed stream."""
    key = ("pruned", sf_dir)
    if key not in _CACHE or not os.path.isdir(_CACHE[key]):
        work = _scratch_dir(prefix="river_spark_prune_")
        log = StreamLog(os.path.join(work, "store"))
        schema, arr = _events_array(sf_dir, ("event_id", "user_id", "value"))
        for stream in ("events_pruned", "decoy_stream"):
            w = StreamWriter(log).initialize(stream, schema)
            w.write(arr if stream == "events_pruned" else arr[:10])
            w.stop()
        ing = StreamIngester(
            log,
            os.path.join(work, "out"),
            IngesterSettings(
                streams=[
                    StreamIngestionSettings(
                        stream_name_regex="events_.*",  # routes past the decoy
                        columns_blacklist=["value"],
                        minimum_age_seconds_before_deletion=0,
                    )
                ]
            ),
        )
        ing.ingest()
        ing.wait_all()
        out_root = os.path.join(work, "out")
        assert not os.path.isdir(os.path.join(out_root, "decoy_stream")), "routing leaked"
        _CACHE[key] = os.path.join(out_root, "events_pruned")
        shutil.rmtree(os.path.join(work, "store"), ignore_errors=True)
    df = spark.read.parquet(data_glob(_CACHE[key]))
    assert "value" not in df.columns, "column pruning failed"
    return df.select("event_id", "user_id")


@q(
    "river_resume_roundtrip",
    oracle="SELECT event_id, user_id, round(value, 4) AS value FROM events",
    tags=("river", "resume"),
)
def river_resume_roundtrip(spark, sf_dir):
    """A14 through the driver gate: ingest runs once against a HALF-written
    stream (goes IN_PROGRESS at the stall timeout), the writer then
    finishes, and a second ingest resumes from the persisted frontier
    (ingester.cpp:649-711 re-reads its own output to find the last key).
    The union of both passes must be exactly the source table — nothing
    dropped at the seam, nothing ingested twice."""
    from river_spark.ingest.ingester import IngestResult, SingleStreamIngester

    key = ("resume", sf_dir)
    if key not in _CACHE or not os.path.isdir(_CACHE[key]):
        work = _scratch_dir(prefix="river_spark_resume_")
        log = StreamLog(os.path.join(work, "store"))
        schema, arr = _events_array(sf_dir, ("event_id", "user_id", "value"))
        half = len(arr) // 2
        w = StreamWriter(log).initialize("events_res", schema)
        w.write(arr[:half])
        settings = StreamIngestionSettings(minimum_age_seconds_before_deletion=0)
        first = SingleStreamIngester(
            log, os.path.join(work, "out"), "events_res", settings, stalled_timeout_ms=50
        ).ingest()
        assert first is IngestResult.IN_PROGRESS, first
        w.write(arr[half:])
        w.stop()
        second = SingleStreamIngester(
            log, os.path.join(work, "out"), "events_res", settings, stalled_timeout_ms=1000
        ).ingest()
        assert second is IngestResult.COMPLETED, second
        _CACHE[key] = os.path.join(work, "out", "events_res")
        shutil.rmtree(os.path.join(work, "store"), ignore_errors=True)
    files = [
        os.path.join(_CACHE[key], f)
        for f in sorted(os.listdir(_CACHE[key]))
        if f.endswith(".parquet")
    ]
    df = spark.read.parquet(*files)
    return df.select("event_id", "user_id", F.round("value", 4).alias("value"))


@q(
    "river_stale_autoeof",
    oracle="SELECT event_id, user_id, round(value, 4) AS value FROM events",
    tags=("river", "stale_eof"),
)
def river_stale_autoeof(spark, sf_dir):
    """A17 through the driver gate: the writer dies without stop() (no
    EOF on the wire); its batch keys are stamped in the past, so the
    orchestrator's stale scan (ingester.cpp:492-539) appends the EOF
    itself and ingestion runs to completion — the output must still be
    the whole table."""
    key = ("stale", sf_dir)
    if key not in _CACHE or not os.path.isdir(_CACHE[key]):
        work = _scratch_dir(prefix="river_spark_stale_")
        log = StreamLog(os.path.join(work, "store"))
        schema, arr = _events_array(sf_dir, ("event_id", "user_id", "value"))
        import time as _time

        past_ms = int(_time.time() * 1000) - 3_600_000  # keys one hour old
        w = StreamWriter(log, clock=lambda: past_ms)
        w.initialize("events_stale", schema)
        w.write(arr)
        # no w.stop(): the stream is abandoned mid-flight
        ing = StreamIngester(
            log,
            os.path.join(work, "out"),
            IngesterSettings(
                streams=[StreamIngestionSettings(minimum_age_seconds_before_deletion=0)],
                stale_period_ms=60_000,
            ),
        )
        ing.ingest()
        ing.wait_all()
        _CACHE[key] = os.path.join(work, "out", "events_stale")
        shutil.rmtree(os.path.join(work, "store"), ignore_errors=True)
    df = spark.read.parquet(data_glob(_CACHE[key]))
    return df.select("event_id", "user_id", F.round("value", 4).alias("value"))


@q(
    "river_http_read",
    oracle="SELECT event_id, user_id, round(value, 4) AS value FROM events",
    tags=("river", "http"),
)
def river_http_read(spark, sf_dir):
    """A23 through the driver gate: fetch the ingested stream's
    data.parquet over the HTTP read API (GET /api/streams + GET
    /api/streams/{name}/data.parquet, ingester_http_server.cpp:19-147)
    and query the downloaded bytes — must equal the source table."""
    import json as _json
    import urllib.request

    from river_spark.tools.http_server import IngesterHttpServer

    key = ("http", sf_dir)
    if key not in _CACHE or not os.path.isfile(_CACHE[key]):
        out = _ingested_events_dir(sf_dir)  # .../out/events_rt
        with IngesterHttpServer(os.path.dirname(out)) as base:
            listing = _json.loads(urllib.request.urlopen(f"{base}/api/streams").read())
            assert "events_rt" in listing["streams"], listing
            fetched = os.path.join(
                _scratch_dir(prefix="river_spark_http_"), "data.parquet"
            )
            with urllib.request.urlopen(f"{base}/api/streams/events_rt/data.parquet") as r:
                with open(fetched, "wb") as f:
                    shutil.copyfileobj(r, f)
        _CACHE[key] = fetched
    df = spark.read.parquet(_CACHE[key])
    return df.select("event_id", "user_id", F.round("value", 4).alias("value"))


@q(
    "river_catalog_scan",
    oracle="""
    SELECT 'river_cat_a' AS view_name, CAST(100 AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'river_cat_b', CAST(250 AS BIGINT)
    """,
    tags=("river", "catalog"),
)
def river_catalog_scan(spark, sf_dir):
    """A10 through the driver gate: two live streams are surfaced into
    Spark's catalog as temp views (the SCAN MATCH *-metadata analog,
    redis.cpp:325-362); SQL over spark.catalog then counts each view's
    rows — catalog discovery, view registration, and the river source
    must all agree."""
    from river_spark.catalog import register_streams

    key = ("catalog", sf_dir)
    if key not in _CACHE or not os.path.isdir(_CACHE[key]):
        work = _scratch_dir(prefix="river_spark_cat_")
        store = os.path.join(work, "store")
        log = StreamLog(store)
        schema = StreamSchema([FieldDefinition("v", FieldType.DOUBLE)])
        for name, n in (("cat_a", 100), ("cat_b", 250)):
            w = StreamWriter(log).initialize(name, schema)
            arr = np.zeros(n, dtype=schema.dtype())
            arr["v"] = np.arange(n)
            w.write(arr)
            w.stop()
        _CACHE[key] = store
    views = register_streams(spark, _CACHE[key])
    assert sorted(views) == ["river_cat_a", "river_cat_b"], views
    counts = [
        spark.sql(f"SELECT '{v}' AS view_name, count(*) AS n_rows FROM {v}") for v in sorted(views)
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


@q(
    "river_cli_roundtrip",
    oracle="SELECT event_id, user_id, round(value, 4) AS value FROM events",
    tags=("river", "cli"),
)
def river_cli_roundtrip(spark, sf_dir):
    """A24 through the driver gate: events rows are piped as CSV through
    the real `river_spark.tools.cli writer` subprocess (stdin -> stream,
    cpp/src/tools parity), ingested by the `cli ingest` subprocess, and
    the parquet output queried — must equal the source table."""
    import subprocess
    import sys as _sys

    import river_spark

    key = ("cli", sf_dir)
    if key not in _CACHE or not os.path.isdir(_CACHE[key]):
        work = _scratch_dir(prefix="river_spark_cli_")
        store, out = os.path.join(work, "store"), os.path.join(work, "out")
        _, arr = _events_array(sf_dir, ("event_id", "user_id", "value"))
        # float() before repr: numpy >= 2.0 reprs scalars as
        # 'np.float64(0.5)', which would corrupt the CSV wire format.
        csv = "\n".join(
            f"{int(r['event_id'])},{int(r['user_id'])},{float(r['value'])!r}" for r in arr
        )
        env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(river_spark.__file__))}
        subprocess.run(
            [_sys.executable, "-m", "river_spark.tools.cli", "writer",
             "--path", store, "--stream", "events_cli",
             "--schema", "event_id:INT64,user_id:INT64,value:DOUBLE"],
            input=csv.encode(), env=env, check=True, capture_output=True,
        )
        subprocess.run(
            [_sys.executable, "-m", "river_spark.tools.cli", "ingest",
             "--path", store, "--out", out],
            env=env, check=True, capture_output=True,
        )
        _CACHE[key] = os.path.join(out, "events_cli")
        shutil.rmtree(store, ignore_errors=True)
    df = spark.read.parquet(data_glob(_CACHE[key]))
    return df.select("event_id", "user_id", F.round("value", 4).alias("value"))


@q(
    "river_redis_roundtrip",
    oracle="SELECT event_id, user_id, round(value, 4) AS value FROM events",
    tags=("river", "redis", "roundtrip"),
)
def river_redis_roundtrip(spark, sf_dir):
    """A1+A2+A13 over the REDIS-WIRE backend: the events table travels as
    per-sample XADD val/i entries through a RESP server (the reference's
    fallback wire format, cpp/src/writer.cpp:296-354, metadata hash
    cpp/src/redis.cpp:136-165), is ingested to Parquet from the Redis
    stream, and must still equal the source bit-exactly. Runs against the
    in-process RESP-subset server (no redis-server binary here); set
    RIVER_SPARK_REDIS_URL host:port to run the same path against a real
    server."""
    from river_spark.transport import RedisBackend

    key = ("redis", sf_dir)
    if key not in _CACHE or not os.path.isdir(_CACHE[key]):
        work = _scratch_dir(prefix="river_spark_redisrt_")
        url = os.environ.get("RIVER_SPARK_REDIS_URL")
        if url:
            from river_spark.transport.log import parse_redis_hostport

            server, addr = None, parse_redis_hostport(url)
        else:
            from river_spark.testing import MiniRedisServer

            server = MiniRedisServer().start()
            addr = server.address
        # Unique stream name per run: against a real (persistent) server a
        # fixed name would collide with the previous run's metadata hash
        # (StreamExistsError); the ingester regex is pinned to exactly this
        # stream so a shared server's unrelated streams are never touched.
        import uuid

        stream = f"events_redis_{uuid.uuid4().hex[:8]}"
        try:
            log = StreamLog(backend=RedisBackend(*addr))
            schema, arr = _events_array(sf_dir, ("event_id", "user_id", "value"))
            w = StreamWriter(log).initialize(stream, schema)
            w.write(arr)
            w.stop()
            ing = StreamIngester(
                log,
                os.path.join(work, "out"),
                IngesterSettings(
                    streams=[
                        StreamIngestionSettings(
                            stream_name_regex=stream,
                            minimum_age_seconds_before_deletion=0,
                        )
                    ]
                ),
            )
            ing.ingest()
            ing.wait_all()
        finally:
            if server is not None:
                server.stop()
        _CACHE[key] = os.path.join(work, "out", stream)
    df = spark.read.parquet(data_glob(_CACHE[key]))
    return df.select("event_id", "user_id", F.round("value", 4).alias("value"))


@q(
    "river_stream_query",
    oracle="""
    SELECT user_id % 10 AS user_bucket, count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY user_id % 10
    """,
    tags=("river", "streaming"),
)
def river_stream_query(spark, sf_dir):
    """A real Structured Streaming run through the driver gate (not a
    batch analog): the events table is written through the transport,
    then drained by a streaming query over the river source
    (availableNow, micro-batches capped by maxSamplesPerTrigger ≈ the
    reference reader's max_fetch_size, cpp/src/reader.h:62) into a
    memory sink; the drained rows must aggregate to exactly the source
    table. Proves offsets, micro-batch slicing, EOF-drain termination,
    and exactly-once delivery end to end."""
    from river_spark.sources import register

    key = ("stream_query", sf_dir)
    if key not in _CACHE:
        register(spark)
        work = _scratch_dir(prefix="river_spark_sq_")
        store = os.path.join(work, "store")
        log = StreamLog(store)
        schema, arr = _events_array(sf_dir, ("event_id", "user_id", "value"))
        w = StreamWriter(log).initialize("events_sq", schema)
        w.write(arr)
        w.stop()
        stream = (
            spark.readStream.format("river")
            .option("path", store)
            .option("stream", "events_sq")
            .option("maxSamplesPerTrigger", "4096")
            .load()
        )
        _CACHE[key] = _drain_to_memory(stream, work, _memory_table_name("river_sq_", sf_dir))
    return spark.sql(
        f"""
        SELECT user_id % 10 AS user_bucket, count(*) AS n,
               round(sum(value), 4) AS sum_value
        FROM {_CACHE[key]} GROUP BY user_id % 10
        """
    )


@q(
    "river_stream_join",
    oracle="""
    WITH uw AS (SELECT DISTINCT user_id, (user_id % 7) * 0.5 AS weight FROM events)
    SELECT e.user_id % 10 AS user_bucket,
           count(*) AS n,
           round(sum(e.value * uw.weight), 4) AS sum_weighted
    FROM events e JOIN uw USING (user_id)
    GROUP BY e.user_id % 10
    """,
    tags=("river", "streaming", "join"),
)
def river_stream_join(spark, sf_dir):
    """A REAL stream-stream join through the driver gate: two live river
    streams — the events fact stream and a per-user weight dimension
    stream — are drained by ONE Structured Streaming query that joins
    them on user_id (inner equi-join, append mode) into a memory sink;
    the joined rows must aggregate to the batch join over the source
    table. An equi-join keeps no watermark in the plan, so the result is
    independent of micro-batch slicing (no late-data eviction); state is
    bounded by availableNow's finite drain. Proves per-source offset
    tracking, two-source checkpointing, and exactly-once delivery of
    both streams end to end."""
    from river_spark.sources import register

    key = ("stream_join", sf_dir)
    if key not in _CACHE:
        register(spark)
        work = _scratch_dir(prefix="river_spark_sj_")
        store = os.path.join(work, "store")
        log = StreamLog(store)
        schema, arr = _events_array(sf_dir, ("event_id", "user_id", "value"))
        w = StreamWriter(log).initialize("events_sj", schema)
        w.write(arr)
        w.stop()
        users = np.unique(arr["user_id"])  # sorted + distinct
        wschema = StreamSchema(
            [FieldDefinition("user_id", FieldType.INT64), FieldDefinition("weight", FieldType.DOUBLE)]
        )
        warr = np.zeros(len(users), dtype=wschema.dtype())
        warr["user_id"] = users
        warr["weight"] = (users % 7) * 0.5
        w2 = StreamWriter(log).initialize("weights_sj", wschema)
        w2.write(warr)
        w2.stop()
        ev = (
            spark.readStream.format("river")
            .option("path", store)
            .option("stream", "events_sj")
            .option("maxSamplesPerTrigger", "4096")
            .load()
            .select("user_id", "value")
        )
        uw = (
            spark.readStream.format("river")
            .option("path", store)
            .option("stream", "weights_sj")
            .load()
            .select(F.col("user_id").alias("w_user_id"), "weight")
        )
        joined = ev.join(uw, ev.user_id == uw.w_user_id, "inner").select(
            "user_id", "value", "weight"
        )
        _CACHE[key] = _drain_to_memory(joined, work, _memory_table_name("river_sj_", sf_dir))
    return spark.sql(
        f"""
        SELECT user_id % 10 AS user_bucket, count(*) AS n,
               round(sum(value * weight), 4) AS sum_weighted
        FROM {_CACHE[key]} GROUP BY user_id % 10
        """
    )


@q(
    "river_stream_static_join",
    oracle="""
    SELECT n.n_name, count(*) AS n, round(sum(e.value), 4) AS sum_value
    FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("river", "streaming", "join", "static"),
)
def river_stream_static_join(spark, sf_dir):
    """A REAL stream-STATIC join through the driver gate: the live river
    events stream is enriched against the static nation parquet
    dimension inside the streaming query (broadcast hash join in every
    micro-batch — the canonical streaming-enrichment shape: the static
    side is planned once and needs no state, no watermark, and survives
    any micro-batch slicing). Complements river_stream_join (stream ×
    stream): together they cover both join sources Structured Streaming
    distinguishes. The drained, enriched rows must aggregate to the
    batch join over the source tables."""
    from river_spark.sources import register

    key = ("stream_static_join", sf_dir)
    if key not in _CACHE:
        register(spark)
        work = _scratch_dir(prefix="river_spark_ssj_")
        store = os.path.join(work, "store")
        log = StreamLog(store)
        schema, arr = _events_array(sf_dir, ("event_id", "user_id", "value"))
        w = StreamWriter(log).initialize("events_ssj", schema)
        w.write(arr)
        w.stop()
        ev = (
            spark.readStream.format("river")
            .option("path", store)
            .option("stream", "events_ssj")
            .option("maxSamplesPerTrigger", "4096")
            .load()
            .select((F.col("user_id") % 25).alias("nk"), "value")
        )
        nat = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
            F.col("n_nationkey").alias("nk"), "n_name"
        )
        joined = ev.join(F.broadcast(nat), "nk").select("n_name", "value")
        _CACHE[key] = _drain_to_memory(
            joined, work, _memory_table_name("river_ssj_", sf_dir)
        )
    return spark.sql(
        f"""
        SELECT n_name, count(*) AS n, round(sum(value), 4) AS sum_value
        FROM {_CACHE[key]} GROUP BY n_name
        """
    )


@q(
    "river_stream_outer_join",
    oracle="""
    WITH ev_all AS (
        SELECT user_id, value FROM events
        UNION ALL
        -- the float-division sentinel ghost event (even user above the
        -- real range; see _SENTINEL_EVENT_NS in river_ops.py)
        SELECT max(user_id) + 1 + (max(user_id) + 1) % 2 AS user_id,
               0.25 AS value
        FROM events),
    uw AS (
        SELECT DISTINCT user_id, user_id * 0.1 + 1 AS bonus
        FROM ev_all WHERE user_id % 2 = 0)
    SELECT e.user_id % 2 AS parity,
           count(*) AS n,
           count(uw.bonus) AS n_matched,
           round(sum(e.value), 4) AS sum_value,
           round(sum(coalesce(uw.bonus, 0)), 4) AS sum_bonus
    FROM ev_all e LEFT JOIN uw USING (user_id)
    GROUP BY e.user_id % 2
    """,
    tags=("river", "streaming", "join", "outer", "watermark"),
)
def river_stream_outer_join(spark, sf_dir):
    """The watermark-bounded LEFT OUTER stream-stream join — the one
    Structured Streaming join shape whose hard semantic is
    null-padding EMISSION ON WATERMARK CLOSE: an unmatched left row is
    only released once the global watermark proves no future right row
    can still match it, so the result depends on watermark mechanics,
    not just join logic. Events stream left-outer-joins a per-even-user
    promo stream on user_id plus the mandatory event-time range
    (ets BETWEEN promo_ts AND promo_ts + 60 days); odd-user events must
    surface exactly once, null-padded.

    Determinism engineering: each stream carries two far-future
    sentinel rows (keys -1/-2, never joinable) and sets
    maxSamplesPerTrigger = n_data + 1, so availableNow slices exactly
    two micro-batches per source — batch 1 = all data + sentinel A
    (advances both watermarks ~4 months past the data when it
    completes), batch 2 = sentinel B (the state-cleanup pass that
    evicts every closed left row and emits the null-padded results).
    The sentinels themselves stay above the final watermark, are never
    emitted, and are excluded by the user_id >= 0 filter regardless.
    The drained rows must aggregate to the batch LEFT JOIN.

    A third data row — the float-division sentinel ghost event (module
    comment at _SENTINEL_EVENT_NS) — rides batch 1 and must join its
    promo exactly at the range's lower boundary; it is mirrored as a
    UNION ALL literal in the oracle, so any regression to double
    division on the ns->us conversion shows up as a driver red."""
    from river_spark.sources import register

    key = ("stream_outer_join", sf_dir)
    if key not in _CACHE:
        register(spark)
        work = _scratch_dir(prefix="river_spark_soj_")
        store = os.path.join(work, "store")
        log = StreamLog(store)
        schema, arr = _events_array(sf_dir, ("event_id", "ts", "user_id", "value"))
        far_a = np.datetime64("2024-06-01T00:00:00").astype("datetime64[ns]").astype(np.int64)
        far_b = np.datetime64("2024-06-01T00:00:01").astype("datetime64[ns]").astype(np.int64)
        sent = np.zeros(2, dtype=schema.dtype())
        sent["event_id"] = [-1, -2]
        sent["ts"] = [far_a, far_b]
        sent["user_id"] = -1
        # even ghost user: the float-division sentinel event must derive
        # a promo row (even parity) while staying absent from parquet
        ghost = int(arr["user_id"].max()) + 1
        ghost += ghost % 2
        w = StreamWriter(log).initialize("events_soj", schema)
        w.write(np.concatenate([arr, _ghost_event(schema, ghost), sent]))
        w.stop()

        users = np.unique(arr["user_id"])
        users = users[users % 2 == 0]
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
        parr = np.zeros(len(users) + 3, dtype=pschema.dtype())
        parr["ts"][: len(users)] = promo_ts
        # ghost promo: lower range boundary exactly on the sentinel
        # event's true microsecond (float-exact ns; see module comment)
        parr["ts"][len(users)] = _SENTINEL_PROMO_NS
        parr["ts"][len(users) + 1 :] = [far_a, far_b]
        parr["user_id"][: len(users)] = users
        parr["user_id"][len(users)] = ghost
        parr["user_id"][len(users) + 1 :] = -2
        parr["bonus"][: len(users)] = users * 0.1 + 1
        parr["bonus"][len(users)] = ghost * 0.1 + 1
        w2 = StreamWriter(log).initialize("promos_soj", pschema)
        w2.write(parr)
        w2.stop()

        # Exact integer ns->us: float division via `/ F.lit(1000)` runs in
        # double, and at 2024 epoch-ns magnitude the 53-bit mantissa
        # truncates values that aren't 512ns multiples 1us off — exactly
        # the window/join-boundary tie this query splits on (see
        # river_ops3.py for the full derivation). `ts div 1000` stays in
        # long integer arithmetic.
        ets = F.timestamp_micros(F.expr("ts div 1000"))
        ev = (
            spark.readStream.format("river")
            .option("path", store)
            .option("stream", "events_soj")
            .option("maxSamplesPerTrigger", str(len(arr) + 2))
            .load()
            .select("user_id", "value", ets.alias("ets"))
            .withWatermark("ets", "1 second")
        )
        pr = (
            spark.readStream.format("river")
            .option("path", store)
            .option("stream", "promos_soj")
            .option("maxSamplesPerTrigger", str(len(users) + 2))
            .load()
            .select(
                F.col("user_id").alias("p_user_id"),
                "bonus",
                ets.alias("pts"),
            )
            .withWatermark("pts", "1 second")
        )
        cond = (
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("ets") >= F.col("pts"))
            & (F.col("ets") <= F.col("pts") + F.expr("interval 60 days"))
        )
        joined = ev.join(pr, cond, "left_outer").select("user_id", "value", "bonus")
        # The Python DataSource API has no AvailableNow support (the
        # engine logs a fallback to single-batch execution), and outer
        # null-padding is only emitted by a LATER batch's state-cleanup
        # pass — a single batch would hold the unmatched rows in state
        # forever. So this gate drains with a continuous processingTime
        # trigger and polls the sink until every data row (matched or
        # null-padded) has surfaced: the sentinel batch advances the
        # watermark, and the engine's no-data batches then run the
        # eviction that releases the outer rows.
        table = _memory_table_name("river_soj_", sf_dir)
        qy = (
            joined.writeStream.format("memory")
            .queryName(table)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(processingTime="50 milliseconds")
            .start()
        )
        import time as _time

        want = len(arr) + 1  # + the float-division sentinel ghost event
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
                        f"{table}: outer-join drain surfaced {n}/{want} rows in 300s"
                    )
                _time.sleep(0.25)
        finally:
            stop_quiet(qy)
        _CACHE[key] = table
    return spark.sql(
        f"""
        SELECT user_id % 2 AS parity, count(*) AS n, count(bonus) AS n_matched,
               round(sum(value), 4) AS sum_value,
               round(sum(coalesce(bonus, 0)), 4) AS sum_bonus
        FROM {_CACHE[key]} WHERE user_id >= 0
        GROUP BY user_id % 2
        """
    )


@q(
    "river_sink_roundtrip",
    oracle="SELECT doc_id, text FROM documents",
    tags=("river", "sink", "roundtrip"),
)
def river_sink_roundtrip(spark, sf_dir):
    """A2 variable-width through the SPARK SINK: each documents row is
    encoded as a single VARIABLE_WIDTH_BYTES sample ("<doc_id>|<text>"),
    written via ``format("river")`` (executors stage log-format chunks,
    the driver promotes them by rename — cpp/src/writer.h:138-156 sizes
    parity), then read back through the river batch source and decoded.
    The round trip must be lossless."""
    from river_spark.sources import register

    key = ("sink", sf_dir)
    if key not in _CACHE or not os.path.isdir(_CACHE[key]):
        register(spark)
        work = _scratch_dir(prefix="river_spark_sinkrt_")
        store = os.path.join(work, "store")
        (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select(
                F.encode(
                    F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("text")), "UTF-8"
                ).alias("payload")
            )
            .write.format("river")
            .option("path", store)
            .option("stream", "docs_rt")
            .mode("append")
            .save()
        )
        _CACHE[key] = store
    back = (
        spark.read.format("river")
        .option("path", _CACHE[key])
        .option("stream", "docs_rt")
        .load()
        .select(F.decode(F.col("payload"), "UTF-8").alias("s"))
    )
    sep = F.locate("|", F.col("s"))
    return back.select(
        F.substring(F.col("s"), F.lit(1), sep - 1).cast("long").alias("doc_id"),
        F.substring(F.col("s"), sep + 1, F.lit(2_000_000_000)).alias("text"),
    )


@q(
    "river_stream_window",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           count(*) AS n, round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1
    """,
    tags=("river", "streaming", "window_agg"),
)
def river_stream_window(spark, sf_dir):
    """Event-time windowed aggregation over a REAL streaming drain (live
    gate #3, after the plain drain and the stream-stream join): events
    flow write→wire→river source micro-batches; the streaming query
    groups them into 1-hour event-time windows (the stream carries ts as
    int64 epoch-nanos — the transport's native layout — converted to
    timestamp inside the stream) and must reproduce the batch per-hour
    aggregate exactly. Complete output mode so every window is emitted at
    drain end; watermark/late-data semantics are pinned separately by the
    batch-parity tests in tests/test_streaming_ops.py."""
    from river_spark.sources import register

    key = ("stream_window", sf_dir)
    if key not in _CACHE:
        register(spark)
        work = _scratch_dir(prefix="river_spark_sw_")
        store = os.path.join(work, "store")
        log = StreamLog(store)
        schema, arr = _events_array(sf_dir, ("event_id", "ts", "user_id", "value"))
        w = StreamWriter(log).initialize("events_sw", schema)
        w.write(arr)
        w.stop()
        windowed = (
            spark.readStream.format("river")
            .option("path", store)
            .option("stream", "events_sw")
            .option("maxSamplesPerTrigger", "4096")
            .load()
            .withColumn(
                "ets",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000, timestamp_ntz'1970-01-01 00:00:00')"
                ),
            )
            .groupBy(F.window("ets", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
        )
        _CACHE[key] = _drain_to_memory(
            windowed, work, _memory_table_name("river_sw_", sf_dir), output_mode="complete"
        )
    return spark.sql(
        f"""
        SELECT date_format(w.start, 'yyyy-MM-dd HH:mm:ss') AS hour_start,
               n, round(sv, 4) AS sum_value
        FROM {_CACHE[key]}
        """
    )


@q(
    "river_stream_stateful",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS total_value
    FROM events GROUP BY user_id
    """,
    tags=("river", "streaming", "stateful"),
)
def river_stream_stateful(spark, sf_dir):
    """Custom STATEFUL streaming through the driver gate (live gate #4):
    events drain through river-source micro-batches into
    applyInPandasWithState running totals (streaming/ops.running_totals
    — the reference's stale-entity timeout semantics); each micro-batch
    emits every touched user's running (count, sum) in update mode, so
    the memory sink holds one row per (user, update). Event values are
    strictly positive, so the running totals are monotone and the FINAL
    state per user is the max over its updates — which must equal the
    batch per-user aggregate exactly. Multi-batch state continuation is
    the precise path the round-3 GroupState crash hid, now load-bearing
    in the driver gate."""
    from river_spark.sources import register
    from river_spark.streaming.ops import running_totals

    key = ("stream_stateful", sf_dir)
    if key not in _CACHE:
        register(spark)
        work = _scratch_dir(prefix="river_spark_ss_")
        store = os.path.join(work, "store")
        log = StreamLog(store)
        schema, arr = _events_array(sf_dir, ("event_id", "user_id", "value"))
        w = StreamWriter(log).initialize("events_ss", schema)
        w.write(arr)
        w.stop()
        stream = (
            spark.readStream.format("river")
            .option("path", store)
            .option("stream", "events_ss")
            .option("maxSamplesPerTrigger", "4096")
            .load()
        )
        _CACHE[key] = _drain_to_memory(
            running_totals(stream),
            work,
            _memory_table_name("river_ss_", sf_dir),
            output_mode="update",
        )
    return spark.sql(
        f"""
        SELECT user_id, max(n_events) AS n_events,
               round(max(total_value), 4) AS total_value
        FROM {_CACHE[key]} GROUP BY user_id
        """
    )


@q(
    "river_stream_dedup",
    oracle="""
    SELECT event_id, user_id, round(value, 4) AS value FROM events
    """,
    tags=("river", "streaming", "dedup"),
)
def river_stream_dedup(spark, sf_dir):
    """Live streaming DEDUPLICATION gate (live gate #5): the events
    array is written onto the wire TWICE (two appends — the at-least-
    once delivery a crashed producer retry produces), and the streaming
    drain must recover exactly the original table via dropDuplicates on
    the event key. Proves streaming dedup state works across micro-
    batches AND that duplicate payloads arriving in different batches
    collapse to one row — the semantics the reference's monotone-index
    check enforces wire-side (cpp/src/reader.h:326-336), recovered here
    engine-side when a producer can't guarantee it."""
    from river_spark.sources import register

    key = ("stream_dedup", sf_dir)
    if key not in _CACHE:
        register(spark)
        work = _scratch_dir(prefix="river_spark_sd_")
        store = os.path.join(work, "store")
        log = StreamLog(store)
        schema, arr = _events_array(sf_dir, ("event_id", "user_id", "value"))
        w = StreamWriter(log).initialize("events_sd", schema)
        w.write(arr)
        w.write(arr)  # duplicate delivery
        w.stop()
        deduped = (
            spark.readStream.format("river")
            .option("path", store)
            .option("stream", "events_sd")
            .option("maxSamplesPerTrigger", "4096")
            .load()
            .dropDuplicates(["event_id"])
        )
        _CACHE[key] = _drain_to_memory(deduped, work, _memory_table_name("river_sd_", sf_dir))
    return spark.sql(
        f"""
        SELECT event_id, user_id, round(value, 4) AS value FROM {_CACHE[key]}
        """
    )


@q(
    "river_stream_locf",
    oracle="""
    WITH g AS (
        SELECT event_id, user_id,
               CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
        FROM events)
    SELECT event_id, user_id, v AS raw_value,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM g
    """,
    tags=("river", "streaming", "stateful"),
)
def river_stream_locf(spark, sf_dir):
    """Live streaming GAP-FILL gate (live gate #6): events drain through
    river-source micro-batches into the stateful LOCF operator
    (streaming/ops.locf_fill_stream) — sensor dropouts planted on every
    7th event take the most recent non-null reading, carried across
    micro-batch boundaries in ONE double of per-user state. The oracle
    is the batch IGNORE NULLS window over the same planted stream, so
    every filled value must match bit-for-bit (ffill copies doubles, no
    arithmetic). Each event is emitted exactly once (update mode, one
    batch per sample range), so the memory sink IS the filled table."""
    from river_spark.sources import register
    from river_spark.streaming.ops import locf_fill_stream

    key = ("stream_locf", sf_dir)
    if key not in _CACHE:
        register(spark)
        work = _scratch_dir(prefix="river_spark_locf_")
        store = os.path.join(work, "store")
        log = StreamLog(store)
        schema, arr = _events_array(sf_dir, ("event_id", "user_id", "value"))
        w = StreamWriter(log).initialize("events_locf", schema)
        w.write(arr)
        w.stop()
        stream = (
            spark.readStream.format("river")
            .option("path", store)
            .option("stream", "events_locf")
            .option("maxSamplesPerTrigger", "4096")
            .load()
        )
        planted = stream.select(
            "event_id",
            "user_id",
            F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double"))
            .otherwise(F.col("value"))
            .alias("v"),
        )
        _CACHE[key] = _drain_to_memory(
            locf_fill_stream(planted),
            work,
            _memory_table_name("river_locf_", sf_dir),
            output_mode="update",
        )
    return spark.sql(
        f"SELECT event_id, user_id, raw_value, filled_value FROM {_CACHE[key]}"
    )


@q(
    "river_stream_window_chain",
    oracle="""
    WITH b AS (
        SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS b5,
               count(*) AS n5, sum(value) AS sv5
        FROM events GROUP BY 1)
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, b5), '%Y-%m-%d %H:%M:%S')
               AS hour_start,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(n5) AS BIGINT) AS n_events,
           round(sum(sv5), 4) AS sum_value
    FROM b GROUP BY 1
    """,
    tags=("river", "streaming", "window_agg", "chained"),
)
def river_stream_window_chain(spark, sf_dir):
    """CHAINED stateful streaming (Spark 3.4+ multiple-stateful-operator
    support): a 5-minute tumbling count/sum per event-time window feeds
    a SECOND windowed aggregation that rolls the closed 5-minute
    buckets into 1-hour windows via window_time() — the streaming
    rollup-cascade shape (pre-aggregate fine, re-aggregate coarse)
    that makes high-frequency telemetry affordable at scale because
    the second operator's input is already
    |windows|-sized, not |events|-sized. Both operators run in APPEND
    mode under one watermark, so each hour emits exactly once, when
    the watermark proves its last 5-minute bucket closed.

    Determinism engineering mirrors river_stream_outer_join: two
    far-future sentinel rows and maxSamplesPerTrigger = n_data + 1
    slice the drain so batch 1 = all data + sentinel A (advancing the
    watermark months past every real window) and the engine's
    state-cleanup batches then cascade the evictions: agg1 emits the
    closed 5-minute buckets, agg2 absorbs them and emits the closed
    hours. The sentinels' own windows never close (the watermark stops
    1s short) and are belt-and-suspenders filtered by the cutoff
    (data is Jan 2024; sentinels sit at 2024-06). The drained hours must match the batch two-level rollup."""
    from river_spark.sources import register

    key = ("stream_window_chain", sf_dir)
    if key not in _CACHE:
        register(spark)
        work = _scratch_dir(prefix="river_spark_swc_")
        store = os.path.join(work, "store")
        log = StreamLog(store)
        schema, arr = _events_array(sf_dir, ("event_id", "ts", "value"))
        far_a = np.datetime64("2024-06-01T00:00:00").astype("datetime64[ns]").astype(np.int64)
        far_b = np.datetime64("2024-06-01T00:00:01").astype("datetime64[ns]").astype(np.int64)
        sent = np.zeros(2, dtype=schema.dtype())
        sent["event_id"] = [-1, -2]
        sent["ts"] = [far_a, far_b]
        w = StreamWriter(log).initialize("events_swc", schema)
        w.write(np.concatenate([arr, sent]))
        w.stop()
        n_hours = len(np.unique(arr["ts"] // (3600 * 10**9)))

        # Exact integer ns->us: float division via `/ F.lit(1000)` runs in
        # double, and at 2024 epoch-ns magnitude the 53-bit mantissa
        # truncates values that aren't 512ns multiples 1us off — exactly
        # the window/join-boundary tie this query splits on (see
        # river_ops3.py for the full derivation). `ts div 1000` stays in
        # long integer arithmetic.
        ets = F.timestamp_micros(F.expr("ts div 1000"))
        five = (
            spark.readStream.format("river")
            .option("path", store)
            .option("stream", "events_swc")
            .option("maxSamplesPerTrigger", str(len(arr) + 1))
            .load()
            .select(ets.alias("ets"), "value")
            .withWatermark("ets", "1 second")
            .groupBy(F.window("ets", "5 minutes"))
            .agg(F.count("*").alias("n5"), F.sum("value").alias("sv5"))
        )
        hourly = (
            five.groupBy(F.window(F.window_time("window"), "1 hour").alias("w"))
            .agg(
                F.count("*").alias("n_buckets"),
                F.sum("n5").alias("n_events"),
                F.sum("sv5").alias("sv"),
            )
        )
        table = _memory_table_name("river_swc_", sf_dir)
        qy = (
            hourly.writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(processingTime="50 milliseconds")
            .start()
        )
        import time as _time

        deadline = _time.monotonic() + 300
        try:
            while True:
                n = spark.sql(
                    f"SELECT count(*) FROM {table} WHERE w.start < timestamp'2024-03-01'"
                ).first()[0]
                if n >= n_hours:
                    break
                if _time.monotonic() > deadline:
                    raise TimeoutError(
                        f"{table}: window-chain drain surfaced {n}/{n_hours} hours in 300s"
                    )
                _time.sleep(0.25)
        finally:
            stop_quiet(qy)
        _CACHE[key] = table
    return spark.sql(
        f"""
        SELECT date_format(w.start, 'yyyy-MM-dd HH:mm:ss') AS hour_start,
               n_buckets, n_events, round(sv, 4) AS sum_value
        FROM {_CACHE[key]} WHERE w.start < timestamp'2024-03-01'
        """
    )


@q(
    "river_stream_foreach_upsert",
    oracle="""
    SELECT user_id % 16 AS user_bucket,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
           CAST(max(event_id) AS BIGINT) AS last_event
    FROM events GROUP BY user_id % 16
    """,
    tags=("river", "streaming", "sink", "exactly_once"),
)
def river_stream_foreach_upsert(spark, sf_dir):
    """Exactly-once streaming UPSERT sink via foreachBatch — the one
    Structured Streaming sink shape the memory-sink gates don't
    exercise: each micro-batch folds its per-bucket deltas into a
    versioned keyed state table (read state_v{n-1}, merge, write
    state_v{n}, then commit a batch-id marker — writes land BEFORE the
    marker, so a crash between them is re-executed and idempotently
    skipped, never lost or doubled). After the drain, a deliberately
    REPLAYED batch (same batch id, reconstructed from a batch read of
    the same transport stream) must leave the state untouched — the
    at-least-once-delivery / exactly-once-effect contract every
    production foreachBatch sink (JDBC upsert, Delta MERGE) relies on.
    The final state table must equal the plain batch aggregate of the
    source — counts and cent-sums are integers, so cross-batch folding
    is exact regardless of batch slicing.

    100 TB posture: per-batch deltas are pre-aggregated (map-side) to
    the key grid BEFORE touching state, so state I/O is O(|keys|), not
    O(|batch|); versioned-directory state is the parquet stand-in for
    a real MERGE target (Delta/Iceberg), whose commit protocol replaces
    the marker file one-for-one."""
    from river_spark.sources import register

    key = ("stream_feb", sf_dir)
    if key not in _CACHE:
        register(spark)
        work = _scratch_dir(prefix="river_spark_feb_")
        store = os.path.join(work, "store")
        log = StreamLog(store)
        schema, arr = _events_array(sf_dir, ("event_id", "user_id", "value"))
        w = StreamWriter(log).initialize("events_feb", schema)
        w.write(arr)
        w.stop()
        commits = os.path.join(work, "commits")
        os.makedirs(commits)
        state = {"version": -1}

        def _state_dir(v: int) -> str:
            return os.path.join(work, f"state_v{v}")

        def _delta(batch_df):
            return batch_df.groupBy(
                (F.col("user_id") % 16).alias("user_bucket")
            ).agg(
                F.count("*").alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                    "value_cents"
                ),
                F.max("event_id").alias("last_event"),
            )

        def upsert(batch_df, batch_id):
            marker = os.path.join(commits, str(batch_id))
            if os.path.exists(marker):
                return  # replayed delivery: idempotent skip
            delta = _delta(batch_df)
            sess = batch_df.sparkSession
            if state["version"] >= 0:
                cur = sess.read.parquet(_state_dir(state["version"]))
                merged = (
                    cur.unionByName(delta)
                    .groupBy("user_bucket")
                    .agg(
                        F.sum("n_events").alias("n_events"),
                        F.sum("value_cents").alias("value_cents"),
                        F.max("last_event").alias("last_event"),
                    )
                )
            else:
                merged = delta
            merged.coalesce(1).write.mode("errorifexists").parquet(
                _state_dir(state["version"] + 1)
            )
            state["version"] += 1
            with open(marker, "w"):
                pass

        stream = (
            spark.readStream.format("river")
            .option("path", store)
            .option("stream", "events_feb")
            .option("maxSamplesPerTrigger", "4096")
            .load()
        )
        qy = (
            stream.writeStream.foreachBatch(upsert)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        if not qy.awaitTermination(300):
            qy.stop()
            raise TimeoutError("river_stream_foreach_upsert: drain exceeded 300s")
        if state["version"] < 0:
            raise RuntimeError("river_stream_foreach_upsert: no batch committed")
        # Replay proof: re-deliver batch 0 (reconstructed from a batch
        # read of the same stream — at-least-once delivery in miniature)
        # and require the state version NOT to advance.
        v_before = state["version"]
        replay = (
            spark.read.format("river")
            .option("path", store)
            .option("stream", "events_feb")
            .load()
            .limit(4096)
        )
        upsert(replay, 0)
        if state["version"] != v_before:
            raise AssertionError(
                "replayed batch 0 mutated state: exactly-once contract broken"
            )
        _CACHE[key] = _state_dir(state["version"])
    return (
        spark.read.parquet(_CACHE[key])
        .select("user_bucket", "n_events", "value_cents", "last_event")
    )
