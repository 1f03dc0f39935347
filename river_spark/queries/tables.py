"""Table access + cross-engine helpers shared by the query registry."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table. Plain ``spark.read.parquet`` so Catalyst sees
    the files directly — filters/projections in the query push down into the
    scan (PushedFilters/ReadSchema in .explain).

    events.ts is physically TIMESTAMP(NANOS), which Spark rejects unless
    read as long — set defensively here so the queries work on any caller's
    SparkSession, not just ours (the driver builds its own)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def event_ts(col: str = "ts"):
    """events.ts is INT64 epoch-nanos (read via nanosAsLong). Truncate to
    microseconds — matches DuckDB TIMESTAMP_NS → TIMESTAMP semantics."""
    return F.timestamp_micros(F.expr(f"{col} div 1000"))


def r2(col, n: int = 2):
    """Round a double consistently on both engines so the driver's
    value-hash is stable across summation orders."""
    return F.round(col, n)
