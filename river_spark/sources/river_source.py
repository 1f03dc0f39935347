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
  stage their partitions as payload files; the driver's ``commit()``
  appends them to the log in deterministic partition order, preserving
  the single-writer contiguous ``sample_index`` invariant without
  serializing the data path through one task (SURVEY.md §7 "what's hard"
  #1).

Rows are produced as Arrow RecordBatches (zero row-at-a-time Python).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql import types as T

from river_spark.ingest.ingester import _ARROW_TYPES
from river_spark.schema import FieldType, StreamSchema
from river_spark.transport.compression import Compressor
from river_spark.transport.log import StreamLog, encode_key
from river_spark.transport.writer import StreamWriter


def register(spark) -> None:
    spark.dataSource.register(RiverDataSource)


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
    def __init__(self, root, path, start_index, key_ms, key_seq0, lo, hi, schema_json, comp_json=None):
        self.root = root
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
        self.root = options["path"]
        self.stream = options["stream"]

    def partitions(self):
        log = StreamLog(self.root)
        meta = log.read_metadata(self.stream)
        if meta is None:
            raise ValueError(f"stream {self.stream!r} not found under {self.root}")
        schema_json = meta["schema"]
        comp_json = meta.get("compression_params_json")
        parts = []
        for seg in log.list_segments(self.stream):
            for start, cnt, ms, seq0, path in log.list_batches(self.stream, seg):
                parts.append(
                    _BatchFilePartition(
                        self.root, path, start, ms, seq0, 0, cnt, schema_json, comp_json
                    )
                )
        return parts or [None]

    def read(self, partition):
        if partition is None:
            return
        schema = StreamSchema.from_json(partition.schema_json)
        yield _batch_file_to_arrow(
            schema,
            StreamLog(partition.root),
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
        self.root = options["path"]
        self.stream = options["stream"]
        self.max_per_trigger = int(options.get("maxsamplespertrigger", 10_000))
        self.retention = options.get("retention", "false").lower() == "true"
        self._log = StreamLog(self.root)
        meta = self._log.read_metadata(self.stream)
        if meta is None:
            raise ValueError(f"stream {self.stream!r} not found under {self.root}")
        self._schema_json = meta["schema"]
        self._comp_json = meta.get("compression_params_json")

    def initialOffset(self):
        # Only called on a fresh query (no checkpoint): rate-limiting can
        # start from zero. After a restart this is skipped and the first
        # latestOffset is uncapped (the checkpoint holds the real cursor).
        self._cursor = 0
        return {"index": 0}

    def _available(self) -> int:
        """Highest sample index+1 currently in the log."""
        total = 0
        for seg in self._log.list_segments(self.stream):
            for start, cnt, _ms, _seq, _path in self._log.list_batches(self.stream, seg):
                total = max(total, start + cnt)
        return total

    def latestOffset(self):
        # Cap per micro-batch like max_fetch_size (cpp/src/reader.h:62).
        # The Python API's latestOffset takes no start offset, so the first
        # batch of a (re)started query is uncapped — the cursor becomes known
        # once partitions() runs, and later batches are rate-limited.
        avail = self._available()
        cur = getattr(self, "_cursor", None)
        if cur is None:
            return {"index": avail}
        return {"index": min(avail, max(cur, cur + self.max_per_trigger))}

    def partitions(self, start, end):
        lo, hi = start["index"], end["index"]
        self._cursor = hi
        parts = []
        for seg in self._log.list_segments(self.stream):
            for bstart, cnt, ms, seq0, path in self._log.list_batches(self.stream, seg):
                if bstart + cnt <= lo or bstart >= hi:
                    continue
                parts.append(
                    _BatchFilePartition(
                        self.root,
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
            StreamLog(partition.root),
            partition.path,
            partition.start_index,
            partition.key_ms,
            partition.key_seq0,
            partition.lo,
            partition.hi,
            partition.comp_json,
        )

    def commit(self, end):
        """Retention behind the committed frontier (A16): delete segments
        whose samples are all below the committed index."""
        if not self.retention:
            return
        committed = end["index"]
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
    def __init__(self, partition_id, staged_path, num_rows):
        self.partition_id = partition_id
        self.staged_path = staged_path
        self.num_rows = num_rows


class RiverBatchWriter(DataSourceWriter):
    """Two-phase append: executors stage partition payloads, the driver
    commits them into the log in partition order. Order within a partition
    is preserved; the contiguous sample_index is assigned once, on commit —
    the 'single-partition sink epoch + count carry' answer to SURVEY §7
    hard-problem #1."""

    def __init__(self, options, schema: T.StructType):
        self.root = options["path"]
        self.stream = options["stream"]
        self.staging = os.path.join(self.root, f"_staging_{self.stream}_{uuid.uuid4().hex[:8]}")
        stream_schema = StreamSchema.from_struct_type(schema)
        if stream_schema.has_variable_width_field:
            raise ValueError(
                "river sink supports fixed-width schemas; variable-width streams "
                "need the per-sample sizes API (transport.StreamWriter)"
            )
        self.stream_schema_json = stream_schema.to_json()
        self.spark_schema = schema

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        schema = StreamSchema.from_json(self.stream_schema_json)
        dtype = schema.dtype()
        rows = list(iterator)
        os.makedirs(self.staging, exist_ok=True)
        path = os.path.join(self.staging, f"part_{pid:06d}.npy")
        arr = np.zeros(len(rows), dtype=dtype)
        names = schema.field_names()
        for i, row in enumerate(rows):
            for name in names:
                arr[name][i] = row[name]
        np.save(path, arr)
        return _StagedWrite(pid, path, len(rows))

    def commit(self, messages):
        schema = StreamSchema.from_json(self.stream_schema_json)
        log = StreamLog(self.root)
        if log.read_metadata(self.stream) is None:
            StreamWriter(log).initialize(self.stream, schema)
        w = StreamWriter(log)
        # resume writer position from the log
        w.stream_name = self.stream
        w.schema = schema
        total = 0
        for seg in log.list_segments(self.stream):
            ctrl = log.read_control(self.stream, seg)
            if ctrl is not None and "eof" in ctrl:
                raise RuntimeError(f"stream {self.stream!r} has EOF'd; append rejected")
            for start, cnt, _ms, _seq, _p in log.list_batches(self.stream, seg):
                total = max(total, start + cnt)
        w.total_samples_written = total
        for msg in sorted(messages, key=lambda m: m.partition_id):
            if msg is None:
                continue  # empty micro-batch partitions
            arr = np.load(msg.staged_path)
            if len(arr):
                w.write(arr)
            os.remove(msg.staged_path)
        if os.path.isdir(self.staging) and not os.listdir(self.staging):
            os.rmdir(self.staging)

    def abort(self, messages):
        # messages may be partial (failed tasks return nothing) — wipe the
        # whole staging dir so a failed job leaves zero residue
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)


class RiverStreamWriter(DataSourceStreamWriter):
    """Streaming sink: each micro-batch is staged by executors and appended
    by the driver in partition order (same contiguity story as the batch
    writer). Epoch commits are idempotent — a replayed batchId is skipped —
    giving effectively-exactly-once appends on retry."""

    def __init__(self, options, schema: T.StructType):
        self._batch = RiverBatchWriter(options, schema)
        self.root = self._batch.root
        self.stream = self._batch.stream

    def write(self, iterator):
        return self._batch.write(iterator)

    def _commits_path(self) -> str:
        return os.path.join(self.root, f"_sink_commits_{self.stream}.json")

    def commit(self, messages, batchId):
        import json

        path = self._commits_path()
        committed = {}
        if os.path.exists(path):
            with open(path) as f:
                committed = json.load(f)
        if str(batchId) in committed:
            self.abort(messages, batchId)  # replay: drop staged files
            return
        self._batch.commit(messages)
        committed[str(batchId)] = sum(m.num_rows for m in messages if m)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(committed, f)
        os.replace(tmp, path)

    def abort(self, messages, batchId):
        self._batch.abort(messages)


# ---------------------------------------------------------------------------
# the DataSource
# ---------------------------------------------------------------------------
class RiverDataSource(DataSource):
    """format("river") — options: path (log root), stream (stream name),
    maxSamplesPerTrigger, retention (streaming read)."""

    @classmethod
    def name(cls):
        return "river"

    def schema(self):
        log = StreamLog(self.options["path"])
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
