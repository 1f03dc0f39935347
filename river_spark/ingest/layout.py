"""Finalized-stream data layout resolution.

A finalized stream directory holds EITHER the reference-parity
monolithic ``data.parquet`` (total size under
``single_file_max_bytes``) OR size-tiered ``data_*.parquet`` parts
(ingest/compact.py) — large streams never pay the 2x-storage rewrite
into one unsplittable file. Consumers that hardcoded ``data.parquet``
(HTTP API, the roundtrip queries) silently lost large streams (round-9
advice); every in-repo reader now resolves through here.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq


def data_files(stream_dir: str) -> list[str]:
    """The stream's data files: the monolithic file if present, else the
    size-tiered parts in name order (names are zero-padded, so
    lexicographic == ingest order)."""
    final = os.path.join(stream_dir, "data.parquet")
    if os.path.exists(final):
        return [final]
    return [
        os.path.join(stream_dir, f)
        for f in sorted(os.listdir(stream_dir))
        if f.startswith("data_") and f.endswith(".parquet")
    ]


def data_glob(stream_dir: str) -> str:
    """A Spark-readable path covering both layouts: matches
    ``data.parquet`` and every ``data_*.parquet`` part, and nothing else
    (``metadata.json``, ``_zonemap``, in-progress temps are excluded by
    the suffix)."""
    return os.path.join(stream_dir, "data*.parquet")


def servable_file(stream_dir: str) -> str | None:
    """One parquet FILE for single-file consumers (the HTTP API's
    ``data.parquet`` endpoint). Monolithic layout: the file itself.
    Tiered layout: a lazily-built merge cache (``.data.http.parquet``,
    dot-prefixed so directory scans ignore it), streamed row-group by
    row-group so peak memory is one row group, rebuilt when any part is
    newer. None if the stream has no data files."""
    files = data_files(stream_dir)
    if not files:
        return None
    if len(files) == 1 and files[0].endswith(os.sep + "data.parquet"):
        return files[0]
    cache = os.path.join(stream_dir, ".data.http.parquet")
    newest = max(os.path.getmtime(p) for p in files)
    if os.path.exists(cache) and os.path.getmtime(cache) >= newest:
        return cache
    tmp = cache + ".inprogress"
    writer = None
    try:
        for p in files:
            pf = pq.ParquetFile(p)
            for i in range(pf.metadata.num_row_groups):
                t = pf.read_row_group(i)
                if writer is None:
                    writer = pq.ParquetWriter(tmp, t.schema, compression="snappy")
                writer.write_table(t)
    finally:
        if writer is not None:
            writer.close()
    os.replace(tmp, cache)
    return cache
