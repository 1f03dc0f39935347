"""File-level zone maps: a min/max data-skipping index over a parquet
dataset, for predicates the directory layout can't prune.

`storage.py` covers the first two layout levers (hash bucketing,
directory partitioning). This is the third: per-FILE column statistics,
collected once from parquet footers and persisted as a tiny index table,
so a reader can drop whole files from the scan list for range predicates
on any clustered-ish column — the mechanism behind Delta/Iceberg data
skipping and the batch analog of the transport reader's seek
(`/root/reference/cpp/src/reader.cpp:507-583` skips whole stream
segments by key from segment NAMES without opening them; a zone map
skips whole files by value range from FOOTERS without scanning them).

Zone maps only pay off when values cluster within files — which is
exactly what `layout_zorder` (queries/relational7.py) produces and
measures: tight per-file min/max boxes. The two together are
write-side clustering + read-side skipping.

Scale design:
- `build_zonemap` reads ONLY footers (a few KB per file, no data IO)
  and does so ON EXECUTORS via `mapInPandas` over the file list, so a
  million-file dataset indexes in one short distributed job; the driver
  never opens a file.
- The index is one row per (file, column) — persistable as parquet next
  to the data and itself prunable.
- Pruning is CONSERVATIVE: a file missing statistics for the predicate
  column is always kept, string stats are compared only when both
  bounds are present (parquet writers may truncate long string
  min/max), and NaN-containing double stats are kept (parquet min/max
  ordering excludes NaN).
"""

from __future__ import annotations

import math
import os
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_ZM_SCHEMA = StructType(
    [
        StructField("file", StringType(), False),
        StructField("column", StringType(), False),
        StructField("num_rows", LongType(), False),
        StructField("null_count", LongType(), True),
        # numeric view of the bounds (NULL for non-numeric columns)
        StructField("num_lo", DoubleType(), True),
        StructField("num_hi", DoubleType(), True),
        # string view of the bounds (always populated when stats exist)
        StructField("str_lo", StringType(), True),
        StructField("str_hi", StringType(), True),
        StructField("has_stats", LongType(), False),
    ]
)


def _file_stats(path: str) -> list[dict]:
    """Footer-only stats for one parquet file: per column, min/max
    aggregated across row groups. Runs on an executor."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    num_rows = md.num_rows
    agg: dict[str, dict] = {}
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            name = col.path_in_schema
            ent = agg.setdefault(
                name, {"lo": None, "hi": None, "nulls": 0, "ok": True}
            )
            st = col.statistics
            if st is None or not st.has_min_max:
                ent["ok"] = False
                continue
            lo, hi = st.min, st.max
            # NaN-polluted double stats are unreliable per the parquet
            # spec's ordering rules — keep the file unconditionally.
            if isinstance(lo, float) and (math.isnan(lo) or math.isnan(hi)):
                ent["ok"] = False
                continue
            ent["lo"] = lo if ent["lo"] is None else min(ent["lo"], lo)
            ent["hi"] = hi if ent["hi"] is None else max(ent["hi"], hi)
            if st.null_count is not None:
                ent["nulls"] += st.null_count
    rows = []
    for name, ent in agg.items():
        ok = ent["ok"] and ent["lo"] is not None
        lo, hi = (ent["lo"], ent["hi"]) if ok else (None, None)
        is_num = ok and isinstance(lo, (int, float)) and not isinstance(lo, bool)
        rows.append(
            {
                "file": path,
                "column": name,
                "num_rows": num_rows,
                "null_count": ent["nulls"] if ok else None,
                "num_lo": float(lo) if is_num else None,
                "num_hi": float(hi) if is_num else None,
                "str_lo": str(lo) if ok else None,
                "str_hi": str(hi) if ok else None,
                "has_stats": 1 if ok else 0,
            }
        )
    return rows


def list_parquet_files(root: str) -> list[str]:
    """Data files of a (possibly partitioned) parquet dataset root, in
    deterministic order. Skips dot/underscore side files (checkpoints,
    _zonemap, metadata.json siblings)."""
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = sorted(
            d for d in dirnames if not d.startswith((".", "_"))
        )
        for f in sorted(filenames):
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                out.append(os.path.join(dirpath, f))
    return out


def build_zonemap(
    spark: SparkSession, root: str, files: Iterable[str] | None = None
) -> DataFrame:
    """Distributed zone-map build: ship the file LIST through an
    exchange, read footers on executors, return one row per
    (file, column). No data pages are touched."""
    paths = list(files) if files is not None else list_parquet_files(root)
    if not paths:
        return spark.createDataFrame([], _ZM_SCHEMA)
    pdf = spark.createDataFrame(
        [(p,) for p in paths], StructType([StructField("path", StringType(), False)])
    )
    # ~1 footer per task-slot-chunk; footers are KB-sized so a generous
    # fan-out costs nothing and a million files still balance.
    n_slices = min(len(paths), spark.sparkContext.defaultParallelism * 4)

    def _collect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[dict] = []
            for p in b["path"]:
                rows.extend(_file_stats(p))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _ZM_SCHEMA.fields]
            )

    return pdf.repartition(n_slices).mapInPandas(_collect, _ZM_SCHEMA)


def write_zonemap(spark: SparkSession, root: str) -> str:
    """Build and persist the index under ``<root>/_zonemap`` (the
    underscore prefix keeps every parquet reader from treating it as
    data). Returns the index path."""
    out = os.path.join(root, "_zonemap")
    build_zonemap(spark, root).coalesce(1).write.mode("overwrite").parquet(out)
    return out


def prune_files(
    zonemap: pd.DataFrame, column: str, lo=None, hi=None
) -> list[str]:
    """Files whose [min, max] for ``column`` may intersect [lo, hi]
    (either bound may be None for a half-open range). Conservative:
    files without usable stats for the column are kept. ``zonemap`` is
    the pandas form of the index (it is small by construction)."""
    all_files = sorted(zonemap["file"].unique())
    zm = zonemap[zonemap["column"] == column]
    with_stats = zm[zm["has_stats"] == 1]
    no_stats = set(all_files) - set(with_stats["file"])
    numeric = isinstance(lo, (int, float)) or isinstance(hi, (int, float))
    lo_c, hi_c = ("num_lo", "num_hi") if numeric else ("str_lo", "str_hi")
    keep = set(no_stats)
    for _, r in with_stats.iterrows():
        f_lo, f_hi = r[lo_c], r[hi_c]
        if f_lo is None or (isinstance(f_lo, float) and math.isnan(f_lo)):
            keep.add(r["file"])  # stats exist but not in this view
            continue
        if lo is not None and f_hi < lo:
            continue
        if hi is not None and f_lo > hi:
            continue
        keep.add(r["file"])
    return [f for f in all_files if f in keep]


def read_pruned(
    spark: SparkSession,
    root: str,
    column: str,
    lo=None,
    hi=None,
    zonemap: pd.DataFrame | None = None,
) -> DataFrame:
    """Zone-map-pruned scan: read only the surviving files AND re-apply
    the range predicate (the zone map is an over-approximation; the
    filter stays pushed down into the surviving scans). An empty
    survivor list returns an empty DataFrame with the dataset schema."""
    if zonemap is None:
        zm_path = os.path.join(root, "_zonemap")
        zonemap = spark.read.parquet(zm_path).toPandas()
    kept = prune_files(zonemap, column, lo, hi)
    if not kept:
        return (
            spark.read.parquet(root)
            .filter(F.lit(False))
        )
    df = spark.read.parquet(*kept)
    if lo is not None:
        df = df.filter(F.col(column) >= F.lit(lo))
    if hi is not None:
        df = df.filter(F.col(column) <= F.lit(hi))
    return df


def write_zonemap_local(root: str) -> str | None:
    """Driver/ingester-side zone-map build with NO SparkSession: collect
    `_file_stats` for every data file sequentially and persist the same
    `_zonemap` parquet `write_zonemap` produces. For the ingest path —
    `SingleStreamIngester` finalizes with pyarrow only, and a
    just-finalized stream is one-to-few files, so a distributed build
    would be overhead. Readers cannot tell which builder wrote the
    index. Returns the index path, or None when the root has no data
    files yet."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    paths = list_parquet_files(root)
    if not paths:
        return None
    rows: list[dict] = []
    for p in paths:
        rows.extend(_file_stats(p))
    cols = [f.name for f in _ZM_SCHEMA.fields]
    pdf = pd.DataFrame(rows, columns=cols)
    out = os.path.join(root, "_zonemap")
    os.makedirs(out, exist_ok=True)
    schema = pa.schema(
        [
            ("file", pa.string()),
            ("column", pa.string()),
            ("num_rows", pa.int64()),
            ("null_count", pa.int64()),
            ("num_lo", pa.float64()),
            ("num_hi", pa.float64()),
            ("str_lo", pa.string()),
            ("str_hi", pa.string()),
            ("has_stats", pa.int64()),
        ]
    )
    tmp = os.path.join(out, ".part-0.parquet.inprogress")
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema, preserve_index=False), tmp)
    # A previous build may have come from the Spark writer
    # (part-00000-<uuid>.parquet + _SUCCESS); leaving those alongside
    # part-0.parquet would double/stale every index row for readers
    # that scan the directory. Land the new index FIRST (os.replace is
    # atomic, and overwriting part-0.parquet keeps the previous index
    # valid up to that instant), THEN sweep older generations — a crash
    # mid-sweep leaves a usable index plus removable stale files, never
    # a window with no index at all.
    final = os.path.join(out, "part-0.parquet")
    os.replace(tmp, final)
    for stale in os.listdir(out):
        full = os.path.join(out, stale)
        if full != final and (stale.endswith(".parquet") or stale == "_SUCCESS"):
            os.remove(full)
    return out
