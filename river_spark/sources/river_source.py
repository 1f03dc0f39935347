"""``river`` Spark DataSource (Python Data Source API, Spark 4).

Exposes the segmented stream log to Spark three ways:

- **batch read**  — ``spark.read.format("river").option("path", root)
  .option("stream", name).load()``: one InputPartition per batch file, so
  a stream scan parallelizes across executors; rows carry the system
  columns ``sample_index``/``key``/``timestamp_ms`` exactly like the
  reference ingester's output (cpp/ingester/src/ingester.cpp:296-326).
- **streaming read** — ``spark.readStream.format("river")...``: offsets
  are global sample indices (the reference's monotone ``i``,
  cpp/src/reader.h:326-336); ``maxSamplesPerTrigger`` mirrors the
  reader's ``max_fetch_size`` cap (cpp/src/reader.h:62); when the stream
  has EOF'd the offset stops advancing (availableNow drains and stops).
  ``commit()`` optionally trims fully-consumed segments — retention
  semantics of A16 (cpp/ingester/src/ingester.cpp:424-490) keyed off
  committed progress, not wall clock.
- **batch write** — ``df.write.format("river")...save()``: executors
  consume Arrow record batches columnwise and stage batch_size-sample
  chunks already in the log's final payload format; the driver's
  ``commit()`` assigns index ranges + key runs and promotes each staged
  chunk by RENAME in deterministic partition order — the contiguous
  ``sample_index`` invariant is kept while zero data bytes flow through
  the driver (SURVEY.md §7 "what's hard" #1). Single-field
  variable-width (binary) streams are supported via the log's
  data+sizes batch format (cpp/src/writer.h:138-156 parity).

Rows are produced and consumed as Arrow RecordBatches (zero
row-at-a-time Python on either path).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql import types as T

from river_spark.ingest.ingester import _ARROW_TYPES
from river_spark.schema import FieldType, StreamSchema
from river_spark.transport.compression import Compressor
from river_spark.transport.log import MonotonicKeyGen, StreamLog, encode_key
from river_spark.transport.writer import (
    DEFAULT_BATCH_SIZE,
    DEFAULT_ENTRIES_PER_SEGMENT,
    StreamWriter,
)

_SYSTEM_COLUMNS = ("sample_index", "key", "timestamp_ms")


def register(spark) -> None:
    spark.dataSource.register(RiverDataSource)


# ---------------------------------------------------------------------------
# storage locator: every reader/writer/partition carries a small picklable
# dict saying WHERE the log lives; executors open their own connection from
# it (a file root, or a redis host:port — reads are then distributed XRANGE
# windows, one connection per task, no driver funnel).
# ---------------------------------------------------------------------------
def _locator(options: dict) -> dict:
    from river_spark.transport.log import parse_redis_hostport

    options = {k.lower(): v for k, v in options.items()}
    if "redis" in options:
        host, port = parse_redis_hostport(options["redis"])
        loc = {"redis": f"{host}:{port}"}
        # wire-framing knobs travel WITH the locator so every log opened
        # from it — executor stage, driver commit, reader partition —
        # speaks the same entry layout. moduleFraming selects the server
        # module's compressed blob+reference layout
        # (/root/reference/cpp/src/redismodule/river_redismodule.c:63-131)
        # for appends into compressed streams; reads are layout-agnostic.
        for knob in ("moduleframing", "batchframing"):
            if options.get(knob, "false").lower() == "true":
                loc[knob] = True
        return loc
    if "path" in options:
        return {"path": options["path"]}
    raise ValueError("river source needs option 'path' (log root) or 'redis' (host:port)")


def _open_log(locator: dict) -> StreamLog:
    if "redis" in locator:
        from river_spark.transport.log import parse_redis_hostport
        from river_spark.transport.redis_backend import RedisBackend

        backend = RedisBackend(
            *parse_redis_hostport(locator["redis"]),
            batch_framing=bool(locator.get("batchframing")),
            module_framing=bool(locator.get("moduleframing")),
        )
        return StreamLog(backend=backend)
    return StreamLog(locator["path"])


# ---------------------------------------------------------------------------
# shared helpers (run on executors — everything picklable)
# ---------------------------------------------------------------------------
def _arrow_schema_for(schema: StreamSchema) -> pa.schema:
    fields = [
        pa.field("sample_index", pa.int64(), nullable=False),
        pa.field("key", pa.string(), nullable=False),
        pa.field("timestamp_ms", pa.int64(), nullable=False),
    ]
    for f in schema.field_definitions:
        if f.type in _ARROW_TYPES:
            fields.append(pa.field(f.name, _ARROW_TYPES[f.type], nullable=False))
        else:
            fields.append(pa.field(f.name, pa.binary(), nullable=False))
    return pa.schema(fields)


def _batch_file_to_arrow(
    schema: StreamSchema,
    log: StreamLog,
    path: str,
    start_index: int,
    key_ms: int,
    key_seq0: int,
    lo: int = 0,
    hi: int | None = None,
    comp_json: str | None = None,
) -> pa.RecordBatch:
    """Decode one log batch file (optionally a row slice) into Arrow. Keys
    are reconstructed from the batch's (ms, seq0) run — not stored."""
    z = log.read_batch(path)
    if comp_json:
        comp = Compressor.from_params_json(comp_json)
        z = {**z, "data": np.frombuffer(comp.decompress(z["data"].tobytes()), dtype=np.uint8)}
    if hi is None:
        hi = 10**18
    keys = None
    idx = None
    if schema.has_variable_width_field:
        sizes = z["sizes"]
        hi = min(hi, len(sizes))
        offs = np.concatenate([[0], np.cumsum(sizes)])
        buf = z["data"].tobytes()
        vals = pa.array([buf[offs[i] : offs[i + 1]] for i in range(lo, hi)], pa.binary())
        field_arrays = [vals]
    else:
        data = z["data"].view(schema.dtype())
        hi = min(hi, len(data))
        data = data[lo:hi]
        field_arrays = []
        for f in schema.field_definitions:
            if f.type in _ARROW_TYPES:
                field_arrays.append(pa.array(data[f.name], _ARROW_TYPES[f.type]))
            else:
                field_arrays.append(pa.array([bytes(v) for v in data[f.name]], pa.binary()))
    n = hi - lo
    keys = [encode_key(key_ms, key_seq0 + i) for i in range(lo, hi)]
    idx = np.arange(start_index + lo, start_index + hi, dtype=np.int64)
    ts = np.full(n, key_ms, dtype=np.int64)
    arrays = [pa.array(idx), pa.array(keys, pa.string()), pa.array(ts)] + field_arrays
    return pa.RecordBatch.from_arrays(arrays, schema=_arrow_schema_for(schema))


class _BatchFilePartition(InputPartition):
    def __init__(self, locator, path, start_index, key_ms, key_seq0, lo, hi, schema_json, comp_json=None):
        self.locator = locator
        self.path = path
        self.start_index = start_index
        self.key_ms = key_ms
        self.key_seq0 = key_seq0
        self.lo = lo
        self.hi = hi
        self.schema_json = schema_json
        self.comp_json = comp_json


# ---------------------------------------------------------------------------
# batch reader
# ---------------------------------------------------------------------------
class RiverBatchReader(DataSourceReader):
    def __init__(self, options):
        self.locator = _locator(options)
        self.stream = options["stream"]

    def partitions(self):
        log = _open_log(self.locator)
        meta = log.read_metadata(self.stream)
        if meta is None:
            raise ValueError(f"stream {self.stream!r} not found at {self.locator}")
        schema_json = meta["schema"]
        comp_json = meta.get("compression_params_json")
        parts = []
        for seg in log.list_segments(self.stream):
            for start, cnt, ms, seq0, path in log.list_batches(self.stream, seg):
                parts.append(
                    _BatchFilePartition(
                        self.locator, path, start, ms, seq0, 0, cnt, schema_json, comp_json
                    )
                )
        return parts or [None]

    def read(self, partition):
        if partition is None:
            return
        schema = StreamSchema.from_json(partition.schema_json)
        yield _batch_file_to_arrow(
            schema,
            _open_log(partition.locator),
            partition.path,
            partition.start_index,
            partition.key_ms,
            partition.key_seq0,
            partition.lo,
            partition.hi,
            partition.comp_json,
        )


# ---------------------------------------------------------------------------
# streaming reader
# ---------------------------------------------------------------------------
class RiverStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        options = {k.lower(): v for k, v in options.items()}  # Spark lowercases option keys
        self.locator = _locator(options)
        self.stream = options["stream"]
        self.max_per_trigger = int(options.get("maxsamplespertrigger", 10_000))
        self.retention = options.get("retention", "false").lower() == "true"
        # Consumer-group cursor (≈ Redis consumer-group last-delivered-id):
        # commit() persists the committed frontier under this name so a
        # RESTARTED query's first micro-batch is still rate-limited — the
        # Python API's latestOffset() cannot see the checkpointed start.
        self.group = options.get("group", "default")
        self._log = _open_log(self.locator)
        meta = self._log.read_metadata(self.stream)
        if meta is None:
            raise ValueError(f"stream {self.stream!r} not found at {self.locator}")
        self._schema_json = meta["schema"]
        self._comp_json = meta.get("compression_params_json")
        cursor = self._read_group_cursor()
        if cursor is not None:
            self._cursor = cursor

    def _group_cursor_key(self) -> str:
        return f"cursor/{self.stream}/{self.group}"

    def _read_group_cursor(self) -> int | None:
        import json

        raw = self._log.read_aux(self._group_cursor_key())
        if raw is None:
            return None
        try:
            return int(json.loads(raw)["index"])
        except (ValueError, KeyError, TypeError):
            return None

    def initialOffset(self):
        # Only called on a fresh query (no checkpoint): start from zero,
        # overriding any stale group cursor left by a previous query.
        self._cursor = 0
        return {"index": 0}

    def _available(self) -> int:
        """Highest sample index+1 currently in the log. Backends with a
        tail probe (RedisBackend.last_index — an XREVRANGE of a few tail
        entries) answer in O(1) per segment; otherwise fall back to the
        full batch listing. This runs once per micro-batch trigger, so on
        a live wire stream the difference is a constant-size poll vs
        rescanning every entry every second."""
        last = getattr(self._log.backend, "last_index", None)
        total = 0
        for seg in self._log.list_segments(self.stream):
            if last is not None:
                total = max(total, last(self.stream, seg))
            else:
                for start, cnt, _ms, _seq, _path in self._log.list_batches(self.stream, seg):
                    total = max(total, start + cnt)
        return total

    def latestOffset(self):
        # Cap per micro-batch like max_fetch_size (cpp/src/reader.h:62).
        # The cursor comes from (in priority order) the last partitions()
        # call, or the persisted group cursor loaded at construction — so
        # the first batch after a restart is capped too. Only a query with
        # no history at all (no checkpoint AND no group cursor) falls back
        # to the uncapped full backlog.
        #
        # The group cursor is SHARED by every query using this (stream,
        # group) — Redis consumer-group semantics. A cursor committed by a
        # different query can therefore sit behind this query's
        # checkpointed start; self-advancing the cap base below guarantees
        # that skews the first-batch cap at worst, and can never
        # permanently stall the window behind the checkpoint.
        avail = self._available()
        cur = getattr(self, "_cursor", None)
        if cur is None:
            return {"index": avail}
        end = min(avail, max(cur, cur + self.max_per_trigger))
        self._cursor = max(cur, end)
        return {"index": end}

    def partitions(self, start, end):
        lo, hi = start["index"], end["index"]
        # a stale (lower) group cursor never re-delivers below the
        # checkpointed start
        self._cursor = max(lo, hi)
        if hi <= lo:
            # An adopted foreign group cursor can cap latestOffset() below
            # this query's checkpointed start, so Spark plans a batch with
            # hi < lo. Emit an empty batch instead of slicing batch files
            # with a negative window (np.full(hi-lo, ...) would raise).
            return [None]
        parts = []
        for seg in self._log.list_segments(self.stream):
            for bstart, cnt, ms, seq0, path in self._log.list_batches(self.stream, seg):
                if bstart + cnt <= lo or bstart >= hi:
                    continue
                parts.append(
                    _BatchFilePartition(
                        self.locator,
                        path,
                        bstart,
                        ms,
                        seq0,
                        max(0, lo - bstart),
                        min(cnt, hi - bstart),
                        self._schema_json,
                        self._comp_json,
                    )
                )
        return parts or [None]

    def read(self, partition):
        if partition is None:
            return
        schema = StreamSchema.from_json(partition.schema_json)
        yield _batch_file_to_arrow(
            schema,
            _open_log(partition.locator),
            partition.path,
            partition.start_index,
            partition.key_ms,
            partition.key_seq0,
            partition.lo,
            partition.hi,
            partition.comp_json,
        )

    def commit(self, end):
        """Persist the consumer-group cursor, then (optionally) retention
        behind the committed frontier (A16): delete segments whose samples
        are all below the committed index."""
        import json

        committed = end["index"]
        prev = self._read_group_cursor() or 0
        if committed > prev:
            self._log.write_aux(self._group_cursor_key(), json.dumps({"index": committed}))
        if not self.retention:
            return
        segs = self._log.list_segments(self.stream)
        for seg in segs[:-1]:  # never the live segment
            ctrl = self._log.read_control(self.stream, seg)
            if ctrl is None or "eof" in ctrl:
                break
            batches = self._log.list_batches(self.stream, seg)
            last = max((b[0] + b[1] for b in batches), default=0)
            if last <= committed:
                self._log.update_metadata(self.stream, {"first_segment": ctrl["next_segment"]})
                self._log.delete_segment(self.stream, seg)
            else:
                break


# ---------------------------------------------------------------------------
# batch writer
# ---------------------------------------------------------------------------
class _StagedWrite(WriterCommitMessage):
    def __init__(self, partition_id, chunks, num_rows):
        self.partition_id = partition_id
        self.chunks = chunks  # [(absolute staged path, n_rows)], in write order
        self.num_rows = num_rows


def _arrow_to_struct(schema: StreamSchema, batch) -> "np.ndarray":
    """One arrow batch → packed structured array, enforcing the stream's
    contract: NO nulls anywhere (a nulled int column silently round-trips
    through float64/NaN into garbage ints otherwise — the reference's
    fields are non-nullable, ingester.cpp:729-760), and FIXED_WIDTH_BYTES
    values must match the declared size exactly (numpy void assignment
    silently zero-pads short and truncates long values)."""
    a = np.zeros(batch.num_rows, dtype=schema.dtype())
    for f in schema.field_definitions:
        col = batch.column(batch.schema.get_field_index(f.name))
        if col.null_count:
            raise ValueError(
                f"field {f.name!r}: NULLs cannot be written to a river stream "
                "(non-nullable schema contract)"
            )
        if f.type in _ARROW_TYPES:
            a[f.name] = col.to_numpy(zero_copy_only=False)
        else:  # FIXED_WIDTH_BYTES → void field; columnwise bulk assign
            vals = col.to_pylist()
            for v in vals:
                if len(v) != f.size:
                    raise ValueError(
                        f"field {f.name!r}: FIXED_WIDTH_BYTES({f.size}) got a "
                        f"{len(v)}-byte value (padding/truncation is data "
                        "corruption, not a cast)"
                    )
            a[f.name] = vals
    return a


def _struct_chunks(schema: StreamSchema, iterator, batch_size: int):
    """Yield contiguous structured-array chunks of exactly ``batch_size``
    rows (last chunk smaller) from an arrow-batch iterator — peak memory
    is O(batch_size + one arrow batch), not O(partition)."""
    pending: list[np.ndarray] = []
    pending_rows = 0
    for batch in iterator:
        if batch.num_rows == 0:
            continue
        pending.append(_arrow_to_struct(schema, batch))
        pending_rows += pending[-1].shape[0]
        while pending_rows >= batch_size:
            arr = pending[0] if len(pending) == 1 else np.concatenate(pending)
            yield np.ascontiguousarray(arr[:batch_size])
            rest = arr[batch_size:]
            pending = [rest] if rest.shape[0] else []
            pending_rows = rest.shape[0]
    if pending_rows:
        arr = pending[0] if len(pending) == 1 else np.concatenate(pending)
        yield np.ascontiguousarray(arr)


def _variable_chunks(schema: StreamSchema, iterator, batch_size: int):
    """Yield lists of <= batch_size byte values for the sole
    variable-width field, rejecting NULLs; O(batch_size) memory."""
    name = schema.field_names()[0]
    pending: list[bytes] = []
    for batch in iterator:
        col = batch.column(batch.schema.get_field_index(name))
        if col.null_count:
            raise ValueError(
                f"field {name!r}: NULLs cannot be written to a river stream"
            )
        pending.extend(col.to_pylist())
        while len(pending) >= batch_size:
            yield pending[:batch_size]
            pending = pending[batch_size:]
    if pending:
        yield pending


class RiverBatchWriter(DataSourceArrowWriter):
    """Two-phase append: executors stage partition payloads, the driver
    commits them into the log in partition order. Order within a partition
    is preserved; the contiguous sample_index is assigned once, on commit —
    the 'single-partition sink epoch + count carry' answer to SURVEY §7
    hard-problem #1.

    Scale shape: executors consume Arrow record batches columnwise (no
    row-at-a-time Python) and stage chunks of ``batch_size`` samples in
    the log's FINAL on-disk payload format. ``commit`` then assigns each
    staged chunk its index range and key run and promotes it with a
    RENAME — the driver moves only manifest-sized state, never data
    bytes (the reference's single-writer contiguity contract,
    cpp/src/writer.cpp:149-359, without a single-node data funnel)."""

    def __init__(self, options, schema: T.StructType):
        self.locator = _locator(options)
        self.stream = options["stream"]
        self.batch_size = int(options.get("batchsize", DEFAULT_BATCH_SIZE))
        self.entries_per_segment = int(
            options.get("entriespersegment", DEFAULT_ENTRIES_PER_SEGMENT)
        )
        if "path" in self.locator:
            self.staging = os.path.join(
                self.locator["path"], f"_staging_{self.stream}_{uuid.uuid4().hex[:8]}"
            )
        else:
            self.staging = None
            # redis staging: executors append into per-attempt temp STREAMS
            # on the same server (visible to the driver without a shared
            # filesystem); commit() re-appends them in partition order
            self.stg_prefix = f"_stg_{self.stream}_{uuid.uuid4().hex[:8]}"
        meta = _open_log(self.locator).read_metadata(self.stream)
        if meta is not None:
            # appending: the stream's own schema wins (byte layout must match)
            stream_schema = StreamSchema.from_json(meta["schema"])
            # ...and so does its segment geometry: appending with a
            # different rollover period would route batches into
            # already-tombstoned segments and break the chain
            eps_meta = meta.get("entries_per_segment")
            if eps_meta is not None:
                eps_meta = int(eps_meta)
                if "entriespersegment" in options and self.entries_per_segment != eps_meta:
                    raise ValueError(
                        f"entriesPerSegment={self.entries_per_segment} conflicts "
                        f"with stream {self.stream!r}'s recorded geometry {eps_meta}"
                    )
                self.entries_per_segment = eps_meta
            want = stream_schema.field_names()
            got = [f.name for f in schema.fields if f.name not in _SYSTEM_COLUMNS]
            if want != got:
                raise ValueError(f"schema mismatch: stream has fields {want}, DataFrame has {got}")
            # Names are not enough: a DoubleType column appended into an
            # INT32 field would be silently value-cast into the stream's
            # byte layout (3.7 -> 3, NaN -> garbage) — reject type drift
            # the way the reference rejects sizeof mismatches
            # (cpp/src/writer.h:144-150).
            expected = {f.name: f.dataType for f in stream_schema.to_struct_type().fields}
            for f in schema.fields:
                if f.name in _SYSTEM_COLUMNS:
                    continue
                if f.dataType != expected[f.name]:
                    raise ValueError(
                        f"schema mismatch: stream field {f.name!r} is "
                        f"{expected[f.name].simpleString()}, DataFrame has "
                        f"{f.dataType.simpleString()}"
                    )
            self.comp_json = meta.get("compression_params_json")
        else:
            stream_schema = StreamSchema.from_struct_type(schema)
            self.comp_json = None
        self.stream_schema_json = stream_schema.to_json()

    # -- executor side --------------------------------------------------------
    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # Attempt-unique staged filenames: a speculative/zombie attempt of
        # the same partition must never collide with the attempt whose
        # commit message wins, or it could clobber a staged chunk between
        # task success and driver-side promote. taskAttemptId is globally
        # unique per attempt; the winner's paths travel in its message.
        self._attempt = ctx.taskAttemptId()
        schema = StreamSchema.from_json(self.stream_schema_json)
        if self.staging is None:
            return self._stage_redis(pid, schema, iterator)
        os.makedirs(self.staging, exist_ok=True)
        if schema.has_variable_width_field:
            chunks, total = self._stage_variable(pid, schema, iterator)
        else:
            chunks, total = self._stage_fixed(pid, schema, iterator)
        return _StagedWrite(pid, chunks, total)

    def _stage_redis(self, pid, schema, iterator):
        """Stage this partition's samples into a per-attempt temp stream on
        the redis server, in final payload format. Keys are synthetic
        (ms=1, seq=local index — strictly increasing per temp key); the
        real key run is assigned at commit."""
        log = _open_log(self.locator)
        tmp = f"{self.stg_prefix}_{pid:06d}_a{self._attempt}"
        meta = {
            "first_segment": 0,
            "schema": self.stream_schema_json,
            "initialized_at_us": 0,
            "user_metadata": {},
        }
        if self.comp_json:
            meta["compression_params_json"] = self.comp_json
        log.create_stream(tmp, meta)
        comp = Compressor.from_params_json(self.comp_json) if self.comp_json else None
        total = 0
        if schema.has_variable_width_field:
            for part in _variable_chunks(schema, iterator, self.batch_size):
                sizes = np.array([len(v) for v in part], dtype=np.int64)
                log.append_batch(tmp, 0, total, b"".join(part), len(part), 1, total, sizes)
                total += len(part)
        else:
            for chunk in _struct_chunks(schema, iterator, self.batch_size):
                payload = chunk.tobytes()
                if comp is not None:
                    payload = comp.compress(payload)
                log.append_batch(tmp, 0, total, payload, len(chunk), 1, total, None)
                total += len(chunk)
        return _StagedWrite(pid, [(f"redis-staged:{tmp}", total)], total)

    def _stage_file(self, pid: int, j: int, n: int, ext: str, payload: bytes) -> str:
        # The absolute path travels in the commit message: the driver-side
        # writer instance may be a different instantiation with a different
        # staging uuid (Spark creates the python writer per role).
        path = os.path.join(
            self.staging, f"part_{pid:06d}_a{self._attempt}_{j:06d}{ext}"
        )
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return path

    def _stage_fixed(self, pid, schema, iterator):
        comp = Compressor.from_params_json(self.comp_json) if self.comp_json else None
        chunks, total = [], 0
        for j, chunk in enumerate(_struct_chunks(schema, iterator, self.batch_size)):
            payload = chunk.tobytes()
            if comp is not None:
                payload = comp.compress(payload)
            chunks.append((self._stage_file(pid, j, len(chunk), ".bin", payload), len(chunk)))
            total += len(chunk)
        return chunks, total

    def _stage_variable(self, pid, schema, iterator):
        import io

        chunks, total = [], 0
        for j, part in enumerate(_variable_chunks(schema, iterator, self.batch_size)):
            sizes = np.array([len(v) for v in part], dtype=np.int64)
            buf = io.BytesIO()
            # exact log .npz batch format (transport/log.py append_batch)
            np.savez(buf, data=np.frombuffer(b"".join(part), dtype=np.uint8), sizes=sizes)
            chunks.append((self._stage_file(pid, j, len(part), ".npz", buf.getvalue()), len(part)))
            total += len(part)
        return chunks, total

    # -- driver side ----------------------------------------------------------
    def commit(self, messages):
        import shutil

        schema = StreamSchema.from_json(self.stream_schema_json)
        log = _open_log(self.locator)
        meta = log.read_metadata(self.stream)
        if meta is None:
            # record THIS writer's geometry so later appenders route
            # rollovers identically
            StreamWriter(log, entries_per_segment=self.entries_per_segment).initialize(
                self.stream, schema
            )
        elif meta.get("entries_per_segment") is not None:
            self.entries_per_segment = int(meta["entries_per_segment"])
        segs = log.list_segments(self.stream)
        if meta is not None and meta.get("entries_per_segment") is None and len(segs) > 1:
            # legacy/foreign stream that already rolled over without
            # recording geometry: segment 0's tombstone index defines it
            ctrl0 = log.read_control(self.stream, segs[0])
            if ctrl0 is not None and "tombstone" in ctrl0:
                self.entries_per_segment = int(ctrl0["sample_index"]) + 1
        # EOF only ever terminates the last segment
        if segs:
            ctrl = log.read_control(self.stream, segs[-1])
            if ctrl is not None and "eof" in ctrl:
                raise RuntimeError(f"stream {self.stream!r} has EOF'd; append rejected")
        total, last_ms, last_seq = self._recover_position(log, segs)
        keygen = MonotonicKeyGen()
        if last_ms >= 0:
            keygen.seed(last_ms, last_seq)
        staging_dirs = set() if self.staging is None else {self.staging}
        for msg in sorted((m for m in messages if m is not None), key=lambda m: m.partition_id):
            for src, n in msg.chunks:
                if src.startswith("redis-staged:"):
                    total = self._promote_redis(log, keygen, schema, src[len("redis-staged:"):], total)
                else:
                    staging_dirs.add(os.path.dirname(src))
                    total = self._promote(log, keygen, schema, src, n, total)
        # carry the position forward: the next commit of THIS writer
        # (streaming sinks reuse one RiverBatchWriter per query) skips the
        # log recovery entirely — single-writer-per-stream, like the
        # reference (docs/intro.rst one-writer rule)
        self._position = (total, keygen._last_ms, keygen._seq - 1)
        for d in staging_dirs:
            shutil.rmtree(d, ignore_errors=True)
        if self.staging is None:
            # sweep temp streams left by losing/zombie attempts (they share
            # this writer's prefix but were never promoted). Metadata goes
            # FIRST: a zombie attempt's pipelined XADD can recreate the
            # data key after our UNLINK, but a key without its metadata
            # hash is at least rediscoverable garbage only while the
            # zombie lives — with metadata deleted last, a fully-formed
            # stream could reappear and be mistaken for live data.
            for name in log.list_streams():
                if name.startswith(self.stg_prefix):
                    log.delete_metadata(name)
                    log.delete_segment(name, 0)

    def _recover_position(self, log, segs) -> tuple[int, int, int]:
        """(total samples, last key ms, last key seq) — from the carried
        cache when this writer committed before, else an O(1) backend tail
        probe when available, else the full batch listing (cheap on local
        backends; on redis the full listing would XRANGE the entire
        stream every micro-batch commit)."""
        cached = getattr(self, "_position", None)
        if cached is not None:
            return cached
        probe = getattr(log.backend, "last_batch_info", None)
        if probe is not None:
            for seg in reversed(segs):
                info = probe(self.stream, seg)
                if info is not None:
                    return info
            return 0, -1, -1
        total, last_ms, last_seq = 0, -1, -1
        for seg in segs:
            for start, cnt, ms, seq0, _p in log.list_batches(self.stream, seg):
                total = max(total, start + cnt)
                if (ms, seq0 + cnt - 1) > (last_ms, last_seq):
                    last_ms, last_seq = ms, seq0 + cnt - 1
        return total, last_ms, last_seq

    def _promote_redis(self, log, keygen, schema, tmp: str, total: int) -> int:
        """Assign index ranges + key runs to one temp stream's staged
        batches and re-append them to the live stream, then drop the temp
        stream. Whole-batch payloads move verbatim (compressed stays
        compressed); only a batch crossing a segment boundary is split."""
        comp = Compressor.from_params_json(self.comp_json) if self.comp_json else None
        eps = self.entries_per_segment
        # per-sample staged entries coalesce into ONE run per partition in
        # list_batches — split the handle back into batch_size slices so
        # the driver never holds more than one chunk's payload (an
        # unpaginated XRANGE of a multi-GB partition OOMs the driver and
        # stalls the server)
        split = getattr(log.backend, "split_handle", None)
        runs: list[tuple[str, int]] = []
        for _start, n, _ms, _seq0, handle in log.list_batches(tmp, 0):
            subs = [handle] if split is None else split(handle, self.batch_size)
            if len(subs) == 1:
                runs.append((handle, n))
            else:
                for i, h in enumerate(subs):
                    runs.append((h, min(self.batch_size, n - i * self.batch_size)))
        for handle, n in runs:
            z = log.read_batch(handle)
            payload = z["data"].tobytes()
            sizes = z.get("sizes")
            if total > 0 and total % eps == 0:
                log.write_tombstone(self.stream, total // eps - 1, total - 1)
            room = eps - (total % eps)
            if n <= room:
                ms, seq0 = keygen.next_keys(n)
                log.append_batch(self.stream, total // eps, total, payload, n, ms, seq0, sizes)
                total += n
                continue
            raw = comp.decompress(payload) if comp is not None else payload
            offs = np.concatenate([[0], np.cumsum(sizes)]) if sizes is not None else None
            ss = None if schema.has_variable_width_field else schema.sample_size()
            lo = 0
            while lo < n:
                take = min(n - lo, eps - (total % eps))
                if total > 0 and total % eps == 0:
                    log.write_tombstone(self.stream, total // eps - 1, total - 1)
                if sizes is not None:
                    piece, sub = raw[offs[lo] : offs[lo + take]], sizes[lo : lo + take]
                else:
                    piece, sub = raw[lo * ss : (lo + take) * ss], None
                    if comp is not None:
                        piece = comp.compress(piece)
                ms, seq0 = keygen.next_keys(take)
                log.append_batch(self.stream, total // eps, total, piece, take, ms, seq0, sub)
                total += take
                lo += take
        log.delete_segment(tmp, 0)
        log.delete_metadata(tmp)
        return total

    def _promote(self, log, keygen, schema, src, n, total) -> int:
        """Assign [total, total+n) + a key run to one staged chunk and move
        it into the live segment by rename. Handles tombstone rollover; the
        rare chunk that would span a segment boundary is split by rewrite."""
        eps = self.entries_per_segment
        seg = total // eps
        if total > 0 and total % eps == 0:
            log.write_tombstone(self.stream, seg - 1, total - 1)
        room = eps - (total % eps)
        if n <= room:
            ms, seq0 = keygen.next_keys(n)
            seg_dir = log.segment_dir(self.stream, seg)
            os.makedirs(seg_dir, exist_ok=True)
            ext = ".npz" if src.endswith(".npz") else ".bin"
            dst = os.path.join(seg_dir, f"batch_{total:012d}_{n}_{ms}_{seq0}{ext}")
            os.replace(src, dst)
            return total + n
        # split path (crosses a segment boundary): rewrite via append_batch
        comp = Compressor.from_params_json(self.comp_json) if self.comp_json else None
        if src.endswith(".npz"):
            with np.load(src) as z:
                data, sizes = z["data"].tobytes(), z["sizes"]
            offs = np.concatenate([[0], np.cumsum(sizes)])
            lo = 0
            while lo < n:
                take = min(n - lo, eps - (total % eps))
                if total > 0 and total % eps == 0:
                    log.write_tombstone(self.stream, total // eps - 1, total - 1)
                ms, seq0 = keygen.next_keys(take)
                log.append_batch(
                    self.stream, total // eps, total,
                    data[offs[lo] : offs[lo + take]], take, ms, seq0, sizes[lo : lo + take],
                )
                total += take
                lo += take
        else:
            with open(src, "rb") as f:
                payload = f.read()
            raw = comp.decompress(payload) if comp is not None else payload
            ss = schema.sample_size()
            lo = 0
            while lo < n:
                take = min(n - lo, eps - (total % eps))
                if total > 0 and total % eps == 0:
                    log.write_tombstone(self.stream, total // eps - 1, total - 1)
                piece = raw[lo * ss : (lo + take) * ss]
                if comp is not None:
                    piece = comp.compress(piece)
                ms, seq0 = keygen.next_keys(take)
                log.append_batch(self.stream, total // eps, total, piece, take, ms, seq0, None)
                total += take
                lo += take
        os.remove(src)
        return total

    def abort(self, messages):
        # messages may be partial (failed tasks return nothing) — wipe all
        # staging so a failed job leaves zero residue
        import shutil

        if self.staging is None:
            log = _open_log(self.locator)
            # temp streams all share this writer's prefix, so even attempts
            # that never reported a commit message get cleaned up
            for name in log.list_streams():
                if name.startswith(self.stg_prefix):
                    log.delete_segment(name, 0)
                    log.delete_metadata(name)
            return
        dirs = {self.staging}
        for m in messages or []:
            if m is not None:
                dirs.update(
                    os.path.dirname(p) for p, _n in m.chunks
                    if not p.startswith("redis-staged:")
                )
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)


class RiverStreamWriter(DataSourceStreamArrowWriter):
    """Streaming sink: each micro-batch is staged by executors and appended
    by the driver in partition order (same contiguity story as the batch
    writer). Epoch commits are idempotent — a replayed batchId is skipped —
    giving effectively-exactly-once appends on retry."""

    def __init__(self, options, schema: T.StructType):
        self._batch = RiverBatchWriter(options, schema)
        self.stream = self._batch.stream
        # Replay registry scope: batchIds restart at 0 for every NEW query,
        # so a registry keyed by stream alone would silently drop a fresh
        # query's early batches as "replays" of a previous query's. Scope
        # it by the query identity — checkpointLocation when present (the
        # thing replays are actually relative to), or an explicit
        # sink_group option; bare "default" keeps legacy behavior for
        # checkpoint-less writes.
        #
        # Upgrade note: pre-scope registries (key sink_commits/{stream})
        # are deliberately NOT read — falling back to the shared registry
        # would reintroduce the new-query drop for exactly the deployments
        # that have one. The cost is a one-time at-least-once edge: a
        # query restarted across the upgrade with its last batch's commit
        # un-logged re-appends that batch once. Duplication-on-upgrade is
        # recoverable; silent data loss is not.
        #
        # No identity at all (checkpointLocation set via SESSION CONF
        # never reaches sink options): fall back to a per-writer-instance
        # scope, NOT a shared constant — a shared scope would drop a new
        # query's early batches as "replays" of the previous query's.
        # The per-instance scope still dedups intra-run retries (the
        # common replay); cross-RESTART replay detection needs an
        # explicit option("checkpointLocation", ...) or option
        # ("sink_group", ...).
        import hashlib

        grp = options.get("sink_group") or options.get("checkpointlocation")
        self._sink_scope = (
            hashlib.sha1(grp.encode()).hexdigest()[:12] if grp else f"run_{uuid.uuid4().hex[:12]}"
        )

    def write(self, iterator):
        return self._batch.write(iterator)

    def _commits_key(self) -> str:
        return f"sink_commits/{self.stream}/{self._sink_scope}"

    def commit(self, messages, batchId):
        import json

        log = _open_log(self._batch.locator)
        raw = log.read_aux(self._commits_key())
        prev = json.loads(raw) if raw else {}
        # O(1) registry: batchIds are monotonic per scope, so the max
        # committed id is a complete replay record — a per-batch map
        # would grow (and be rewritten) forever on a long-lived query.
        # Legacy per-batch maps read back as max(numeric keys).
        max_committed = prev.get(
            "max", max((int(k) for k in prev if k.lstrip("-").isdigit()), default=-1)
        )
        if batchId <= max_committed:
            self.abort(messages, batchId)  # replay: drop staged files
            return
        self._batch.commit(messages)
        log.write_aux(self._commits_key(), json.dumps({"max": batchId}))

    def abort(self, messages, batchId):
        self._batch.abort(messages)


# ---------------------------------------------------------------------------
# the DataSource
# ---------------------------------------------------------------------------
class RiverDataSource(DataSource):
    """format("river") — options: path (log root) OR redis (host:port),
    stream (stream name), maxSamplesPerTrigger, retention (streaming
    read). With the redis locator, each read task opens its own RESP
    connection and XRANGEs only its batch window — reads scale with the
    executor count, not the driver."""

    @classmethod
    def name(cls):
        return "river"

    def schema(self):
        log = _open_log(_locator(self.options))
        meta = log.read_metadata(self.options["stream"])
        if meta is None:
            raise ValueError(f"stream {self.options['stream']!r} not found")
        return StreamSchema.from_json(meta["schema"]).to_struct_type(include_system_columns=True)

    def reader(self, schema):
        return RiverBatchReader(self.options)

    def streamReader(self, schema):
        return RiverStreamReader(self.options)

    def writer(self, schema, overwrite):
        if overwrite:
            raise ValueError("river sink is append-only")
        return RiverBatchWriter(self.options, schema)

    def streamWriter(self, schema, overwrite):
        if overwrite:
            raise ValueError("river sink is append-only")
        return RiverStreamWriter(self.options, schema)
