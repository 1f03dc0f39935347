"""CLI tools — parity with the reference's tools (cpp/src/tools/):

- ``river-writer``    (river_writer.cpp:11-75): stdin CSV → stream
- ``river-reader``    (river_reader.cpp:11-67): stream → stdout CSV
- ``river-benchmark`` (river_benchmark.cpp:13-133): write-then-read
  throughput, items/sec and MB/s
- ``river-ingest``: run the ingester over a log root (ingester_main.cpp)

Usage: ``python -m river_spark.tools.cli <tool> [args]``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from river_spark.ingest import IngesterSettings, StreamIngester
from river_spark.schema import FieldDefinition, FieldType, StreamSchema
from river_spark.transport import StreamLog, StreamReader, StreamWriter


def _open_log(args) -> StreamLog:
    """--redis host:port connects over the wire (like the reference tools'
    redis_hostname/redis_port args, cpp/src/tools/river_writer.cpp:11-75);
    --path uses the local file log."""
    redis = getattr(args, "redis", None)
    if redis:
        from river_spark.transport.log import open_log_root

        return open_log_root(f"redis://{redis}")
    if not args.path:
        raise SystemExit("one of --path or --redis is required")
    return StreamLog(args.path)


def _schema_from_spec(spec: str) -> StreamSchema:
    """'name:TYPE[:size],...' e.g. 'ch:INT32,v:DOUBLE' or 'blob:FIXED_WIDTH_BYTES:16'."""
    fields = []
    for part in spec.split(","):
        bits = part.split(":")
        name, ftype = bits[0], FieldType(bits[1])
        size = int(bits[2]) if len(bits) > 2 else None
        fields.append(FieldDefinition(name, ftype, size))
    return StreamSchema(fields)


def writer_main(args) -> int:
    log = _open_log(args)
    schema = _schema_from_spec(args.schema)
    w = StreamWriter(log, batch_size=args.batch_size).initialize(args.stream, schema)
    names = schema.field_names()
    dtype = schema.dtype()  # hoisted: rebuilt per-field-per-line otherwise
    kinds = [dtype[name].kind for name in names]
    buf = []
    for lineno, line in enumerate(sys.stdin, 1):
        line = line.strip()
        if not line:
            continue
        vals = line.split(",")
        if len(vals) != len(names):
            # zip() would silently truncate extra columns (data loss) or
            # defer a short row to a confusing np.array error at flush time
            raise SystemExit(
                f"line {lineno}: expected {len(names)} fields {names}, got {len(vals)}"
            )
        row = tuple(
            float(v) if kind == "f" else int(v) for kind, v in zip(kinds, vals)
        )
        buf.append(row)
        if len(buf) >= args.batch_size:
            arr = np.array(buf, dtype=dtype)
            w.write(arr)
            buf = []
    if buf:
        w.write(np.array(buf, dtype=dtype))
    w.stop()
    print(f"wrote {w.total_samples_written} samples to {args.stream}", file=sys.stderr)
    return 0


def reader_main(args) -> int:
    log = _open_log(args)
    r = StreamReader(log).initialize(args.stream, timeout_ms=args.timeout_ms)
    names = r.schema.field_names()
    print(",".join(names))
    while True:
        res = r.read(args.batch_size, timeout_ms=args.timeout_ms)
        if res.eof:
            break
        if res.count == 0:
            if args.follow:
                continue
            break
        for row in res.samples:
            print(",".join(str(row[name]) for name in names))
    return 0


def benchmark_main(args) -> int:
    """river_benchmark defaults: 1M samples x 8 B, batch 10240."""
    import tempfile

    scratch = None
    if not args.path and not getattr(args, "redis", None):
        scratch = tempfile.mkdtemp(prefix="river_bench_")
        args.path = scratch
    log = _open_log(args)
    schema = StreamSchema([FieldDefinition("v", FieldType.DOUBLE)])
    n = args.num_samples
    arr = np.zeros(n, dtype=schema.dtype())
    arr["v"] = np.arange(n)
    w = StreamWriter(log, batch_size=args.batch_size).initialize(f"bench_{int(time.time())}", schema)
    t0 = time.perf_counter()
    w.write(arr)
    w.stop()
    t_write = time.perf_counter() - t0
    mb = n * schema.sample_size() / 1e6
    r = StreamReader(log).initialize(w.stream_name)
    t0 = time.perf_counter()
    got = 0
    while True:
        res = r.read(args.batch_size * 10, timeout_ms=10)
        if res.eof or res.count == 0:
            break
        got += res.count
    t_read = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "write_items_per_sec": round(n / t_write),
                "write_mb_per_sec": round(mb / t_write, 1),
                "read_items_per_sec": round(got / t_read),
                # MB from samples actually read: the loop can exit early on
                # a slow wire (count==0 before EOF) and a full-count MB
                # figure would overstate throughput
                "read_mb_per_sec": round(got * schema.sample_size() / 1e6 / t_read, 1),
            }
        )
    )
    if scratch:
        import shutil

        shutil.rmtree(scratch, ignore_errors=True)
    return 0


def ingest_main(args) -> int:
    log = _open_log(args)
    settings = (
        IngesterSettings.from_json(open(args.settings).read())
        if args.settings
        else IngesterSettings.catch_all()
    )
    ing = StreamIngester(log, args.out, settings)
    ing.ingest()
    results = ing.wait_all()
    for name, res in results.items():
        print(f"{name}: {res}", file=sys.stderr)
    return 0


def zonemap_main(args) -> int:
    """Build (or rebuild) the file-level min/max skipping index for a
    parquet dataset root — the ops-side entry to ingest/zonemap.py
    (Spark-free local builder; readers prune via read_pruned)."""
    from river_spark.ingest.zonemap import list_parquet_files, write_zonemap_local

    out = write_zonemap_local(args.root)
    if out is None:
        print("no parquet files found", file=sys.stderr)
        return 1
    print(
        json.dumps(
            {"zonemap": out, "files_indexed": len(list_parquet_files(args.root))}
        )
    )
    return 0


def compact_main(args) -> int:
    """Size-tiered compaction of a finalized stream's part files
    (ingest/compact.py) — bin-packs adjacent small parts into
    target-size files, preserving sample order and resume safety."""
    from river_spark.ingest.compact import compact_parts
    from river_spark.ingest.zonemap import write_zonemap_local

    stats = compact_parts(args.dir, target_bytes=args.target_bytes)
    # Compaction rewrites/removes part files; a pre-existing zone-map
    # index would keep pointing readers (prune_files/read_pruned derive
    # the file list solely from it) at dead paths. Rebuild it in place.
    zm = os.path.join(args.dir, "_zonemap")
    rebuilt = None
    if os.path.isdir(zm):
        rebuilt = write_zonemap_local(args.dir)
    print(json.dumps({"dir": args.dir, **stats, "zonemap_rebuilt": rebuilt}))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="river_spark.tools.cli")
    sub = ap.add_subparsers(dest="tool", required=True)

    w = sub.add_parser("writer", help="stdin CSV -> stream")
    w.add_argument("--path", default=None)
    w.add_argument("--redis", default=None, help="host:port of a redis server")
    w.add_argument("--stream", required=True)
    w.add_argument("--schema", required=True, help="name:TYPE[,name:TYPE...]")
    w.add_argument("--batch-size", type=int, default=1536)

    r = sub.add_parser("reader", help="stream -> stdout CSV")
    r.add_argument("--path", default=None)
    r.add_argument("--redis", default=None, help="host:port of a redis server")
    r.add_argument("--stream", required=True)
    r.add_argument("--batch-size", type=int, default=10000)
    r.add_argument("--timeout-ms", type=int, default=1000)
    r.add_argument("--follow", action="store_true")

    b = sub.add_parser("benchmark", help="write/read throughput")
    b.add_argument("--path", default=None)
    b.add_argument("--redis", default=None, help="host:port of a redis server")
    b.add_argument("--num-samples", type=int, default=1_000_000)
    b.add_argument("--batch-size", type=int, default=10_240)

    i = sub.add_parser("ingest", help="run the ingester once")
    i.add_argument("--path", default=None)
    i.add_argument("--redis", default=None, help="host:port of a redis server")
    i.add_argument("--out", required=True)
    i.add_argument("--settings", default=None)

    z = sub.add_parser("zonemap", help="build the min/max skipping index")
    z.add_argument("--root", required=True, help="parquet dataset root")

    c = sub.add_parser("compact", help="size-tiered part-file compaction")
    c.add_argument("--dir", required=True, help="ingested stream directory")
    c.add_argument("--target-bytes", type=int, default=128 * 1024 * 1024)

    args = ap.parse_args(argv)
    return {
        "writer": writer_main,
        "reader": reader_main,
        "benchmark": benchmark_main,
        "ingest": ingest_main,
        "zonemap": zonemap_main,
        "compact": compact_main,
    }[args.tool](args)


if __name__ == "__main__":
    sys.exit(main())
