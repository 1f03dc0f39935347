"""Ingestion settings: per-stream regex routing + column pruning.

Parity with ``cpp/ingester/src/ingester_settings.h``:
- defaults: 128 MiB per row-group file, 32 samples per read, 60 s minimum
  age before deletion (``ingester_settings.h:20-22``).
- per-stream regex whitelist/blacklist over *field names*, whitelist wins
  (``ingester_settings.h:40-49``, ``:63-81``).
- stream-name regex routing (``cpp/ingester/src/ingester.cpp:66-77``).
- JSON settings format mirrors ``ingester_settings.h:84-147`` /
  ``example_settings/example.json``.

In Spark terms the column filter is simply a projection (``df.select``)
that Catalyst pushes into the Parquet scan — config-driven pruning.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

DEFAULT_BYTES_PER_ROW_GROUP = 128 * 1024 * 1024
DEFAULT_SAMPLES_PER_READ = 32
DEFAULT_MINIMUM_AGE_S = 60
DEFAULT_STALE_PERIOD_MS = 300_000  # cpp/ingester/src/ingester.h:50


@dataclass
class StreamIngestionSettings:
    stream_name_regex: str = ".*"
    bytes_per_row_group: int = DEFAULT_BYTES_PER_ROW_GROUP
    samples_per_read: int = DEFAULT_SAMPLES_PER_READ
    minimum_age_seconds_before_deletion: int = DEFAULT_MINIMUM_AGE_S
    columns_whitelist: list[str] = field(default_factory=list)
    columns_blacklist: list[str] = field(default_factory=list)
    # Opt-in: build a file-level min/max data-skipping index (_zonemap)
    # when the stream finalizes — the write-side half of zonemap.py's
    # read-side pruning, produced by the ingest path itself so river
    # streams land as skippable parquet. Off by default: one footer
    # re-read per finalized file.
    build_zonemap: bool = False
    # Finalize layout switch. At or below this many total part bytes the
    # stream finalizes to the reference's single data.parquet
    # (laptop-scale parity, ingester.cpp:561-566); above it the parts are
    # size-tiered-compacted in place (ingest/compact.py) and data.parquet
    # is never written — a monolithic rewrite of a large stream is both a
    # 2x-storage spike and an unsplittable file for downstream Spark
    # scans. SURVEY section 7 phase-6 posture.
    single_file_max_bytes: int = 256 << 20
    # target part size for the size-tiered path
    compact_target_bytes: int = 128 << 20

    def matches(self, stream_name: str) -> bool:
        return re.fullmatch(self.stream_name_regex, stream_name) is not None

    def filter_fields(self, names: list[str]) -> list[str]:
        """Whitelist wins over blacklist (ingester_settings.h:63-81)."""
        if self.columns_whitelist:
            pats = [re.compile(p) for p in self.columns_whitelist]
            return [n for n in names if any(p.fullmatch(n) for p in pats)]
        if self.columns_blacklist:
            pats = [re.compile(p) for p in self.columns_blacklist]
            return [n for n in names if not any(p.fullmatch(n) for p in pats)]
        return list(names)


@dataclass
class IngesterSettings:
    streams: list[StreamIngestionSettings] = field(default_factory=list)
    stale_period_ms: int = DEFAULT_STALE_PERIOD_MS

    def settings_for(self, stream_name: str) -> StreamIngestionSettings | None:
        """First matching per-stream settings, else None (stream skipped
        unless a catch-all entry exists)."""
        for s in self.streams:
            if s.matches(stream_name):
                return s
        return None

    @classmethod
    def catch_all(cls) -> IngesterSettings:
        return cls(streams=[StreamIngestionSettings()])

    @classmethod
    def from_json(cls, s: str) -> IngesterSettings:
        obj = json.loads(s)
        streams = []
        for entry in obj.get("streams", []):
            streams.append(
                StreamIngestionSettings(
                    stream_name_regex=entry.get("stream_name_regex", ".*"),
                    bytes_per_row_group=int(
                        entry.get("bytes_per_row_group", DEFAULT_BYTES_PER_ROW_GROUP)
                    ),
                    samples_per_read=int(entry.get("samples_per_read", DEFAULT_SAMPLES_PER_READ)),
                    minimum_age_seconds_before_deletion=int(
                        entry.get("minimum_age_seconds_before_deletion", DEFAULT_MINIMUM_AGE_S)
                    ),
                    columns_whitelist=list(entry.get("columns_whitelist", [])),
                    columns_blacklist=list(entry.get("columns_blacklist", [])),
                )
            )
        return cls(streams=streams, stale_period_ms=int(obj.get("stale_period_ms", DEFAULT_STALE_PERIOD_MS)))
