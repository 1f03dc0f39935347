"""Table access + cross-engine helpers shared by the query registry."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

_TS_TYPES = (TimestampType, TimestampNTZType)


def _ensure_nanos_conf(spark: SparkSession) -> None:
    """Make TIMESTAMP(NANOS) parquet readable exactly once per session.

    Sessions built by :func:`river_spark.session.get_spark` already carry
    the conf; driver-supplied sessions get it here on first table read.
    Guarded per session object so a leaf helper no longer mutates session
    config on every call — a caller that wants native nanos semantics can
    flip the conf after their first read and ``tbl`` won't fight them."""
    if getattr(spark, "_river_nanos_conf_done", False):
        return
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark._river_nanos_conf_done = True


def tbl(spark: SparkSession, sf_dir: str, name: str, fresh: bool = False) -> DataFrame:
    """Read one driver table. Plain ``spark.read.parquet`` so Catalyst sees
    the files directly — filters/projections in the query push down into the
    scan (PushedFilters/ReadSchema in .explain).

    events.ts has shipped as both TIMESTAMP(NANOS) (readable only via
    nanosAsLong → INT64 epoch-nanos) and timestamp[us] (read natively as
    TIMESTAMP_NTZ). Ensure nanosAsLong once per session — a no-op for the
    micros layout — then let callers dtype-dispatch via :func:`event_ts` /
    :func:`events_tbl`.

    The returned DataFrame (an UNEXECUTED read plan — no rows, no
    results) is memoized per (session, path): ``spark.read.parquet``
    re-reads the footer and re-lists the file on EVERY call (~100 ms
    measured), and a multi-table query pays that per table per build —
    r15 measured q5_nation_volume spending 0.56 s of its 0.89 s wall
    constructing the plan, 6 footer reads included. DataFrames are
    immutable, so sharing the relation is safe; data is still read from
    parquet on every execution. The cache dies with the session object
    (keyed on it), and is keyed by absolute path so different SF dirs
    never collide.

    ``fresh=True`` bypasses the memo and returns a NEW read plan with its
    own attribute IDs (the memo is also left unpopulated). Required when
    a query feeds the SAME table into both sides of a cogroup: shared
    attribute IDs across FlatMapCoGroupsInPandas' two children break
    Catalyst's column pruning under count()-style actions — the right
    side's pandas frame arrives missing every column whose ID also
    appears on the left (reproduced in tests/test_udfs.py)."""
    _ensure_nanos_conf(spark)
    path = os.path.abspath(os.path.join(sf_dir, f"{name}.parquet"))
    if fresh:
        return spark.read.parquet(path)
    cache = getattr(spark, "_river_tbl_cache", None)
    if cache is None:
        cache = {}
        spark._river_tbl_cache = cache
    df = cache.get(path)
    if df is None:
        df = spark.read.parquet(path)
        cache[path] = df
    return df


def tview(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Session-memoized temp view over :func:`tbl`, for queries built as
    ONE ``spark.sql()`` statement (r16). Every DataFrame method is an
    eager py4j + Catalyst-analysis round (~12-90 ms each on literal-heavy
    plans, r16 build audit); the vector-family queries spent 30-50% of
    their wall in ~20 such rounds. A single SQL statement is one round.
    The view resolves to the SAME memoized unexecuted read plan ``tbl``
    returns — data is still read from parquet on every execution, and
    the view name embeds the absolute path so SF dirs never collide."""
    import re

    path = os.path.abspath(os.path.join(sf_dir, f"{name}.parquet"))
    vname = "tv_" + re.sub(r"\W", "_", path)
    reg = getattr(spark, "_river_tview_names", None)
    if reg is None:
        reg = set()
        spark._river_tview_names = reg
    if vname not in reg:
        tbl(spark, sf_dir, name).createOrReplaceTempView(vname)
        reg.add(vname)
    return vname


def event_ts(df: DataFrame, col: str = "ts") -> Column:
    """Timestamp-typed event time regardless of physical storage: pass
    timestamp columns through untouched (keeps scan pushdown intact); for
    legacy INT64 epoch-nanos, truncate to micros — matches DuckDB
    TIMESTAMP_NS → TIMESTAMP semantics.

    The legacy conversion builds TIMESTAMP_NTZ by pure micro-arithmetic on
    an NTZ epoch base — same type as the native layout, and (unlike
    ``timestamp_micros``, which yields LTZ) independent of the caller's
    session timezone, so string literals / window() / date_format() agree
    across both physical layouts on any session."""
    if isinstance(df.schema[col].dataType, _TS_TYPES):
        return F.col(col)
    return F.expr(
        f"timestampadd(MICROSECOND, {col} div 1000, timestamp_ntz'1970-01-01 00:00:00')"
    )


def events_tbl(spark: SparkSession, sf_dir: str, fresh: bool = False) -> DataFrame:
    """events with ``ts`` normalized to a timestamp type. On current
    testdata this is a passthrough (filters on ts still reach the parquet
    scan); on legacy nanos data it converts once at the read.
    ``fresh=True``: own-attribute-ID read plan (see :func:`tbl`)."""
    df = tbl(spark, sf_dir, "events", fresh=fresh)
    return df.withColumn("ts", event_ts(df))


def r2(col, n: int = 2):
    """Round a double consistently on both engines so the driver's
    value-hash is stable across summation orders."""
    return F.round(col, n)


def spread_scan(df: DataFrame, *cols: str) -> DataFrame:
    """Scale-adaptive parallelism for a CPU-heavy first stage (r15).

    At bench/test SFs every input table is ONE parquet row group, so a
    scan-rooted stage runs as a single task no matter how expensive its
    per-row work is (XPath parses, tokenize+explode into wide partial
    aggregates, per-pair DP) — 31 of 32 cores idle. This helper
    repartitions to ``defaultParallelism`` ONLY when the plan would
    actually read fewer partitions than that, so at real scale — where
    the scan splits into thousands of tasks by itself — it is a
    plan-build no-op and never injects a corpus-scale shuffle. The
    explicit partition count opts the exchange out of AQE coalescing,
    which sizes partitions by shuffled BYTES and is blind to per-row
    CPU cost downstream (the r15 mm-codec measurement: a bare
    ``repartition("doc_id")`` was coalesced back to one task).

    Pass hash ``cols`` (a uniform key) to skip round-robin's
    sort-before-repartition; omit them for keyless round-robin."""
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 - conversion quirks: keep the plan as-is
        return df
    if cur >= n:
        return df
    return df.repartition(n, *[F.col(c) for c in cols]) if cols else df.repartition(n)
