"""Table access + cross-engine helpers shared by the query registry."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

_TS_TYPES = (TimestampType, TimestampNTZType)


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table. Plain ``spark.read.parquet`` so Catalyst sees
    the files directly — filters/projections in the query push down into the
    scan (PushedFilters/ReadSchema in .explain).

    events.ts has shipped as both TIMESTAMP(NANOS) (readable only via
    nanosAsLong → INT64 epoch-nanos) and timestamp[us] (read natively as
    TIMESTAMP_NTZ). Set nanosAsLong defensively — a no-op for the micros
    layout — then let callers dtype-dispatch via :func:`event_ts` /
    :func:`events_tbl`."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def event_ts(df: DataFrame, col: str = "ts") -> Column:
    """Timestamp-typed event time regardless of physical storage: pass
    timestamp columns through untouched (keeps scan pushdown intact); for
    legacy INT64 epoch-nanos, truncate to micros — matches DuckDB
    TIMESTAMP_NS → TIMESTAMP semantics."""
    if isinstance(df.schema[col].dataType, _TS_TYPES):
        return F.col(col)
    return F.timestamp_micros(F.expr(f"{col} div 1000"))


def events_tbl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` normalized to a timestamp type. On current
    testdata this is a passthrough (filters on ts still reach the parquet
    scan); on legacy nanos data it converts once at the read."""
    df = tbl(spark, sf_dir, "events")
    return df.withColumn("ts", event_ts(df))


def r2(col, n: int = 2):
    """Round a double consistently on both engines so the driver's
    value-hash is stable across summation orders."""
    return F.round(col, n)
