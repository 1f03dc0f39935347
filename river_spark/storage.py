"""Physical table layout helpers: bucketing and partitioned layout.

The two lakehouse layout levers that matter at 100 TB and are invisible
at laptop scale:

- **Bucketing** (`write_bucketed`): hash-cluster a table into a fixed
  number of buckets on its join/aggregation key at WRITE time. Two
  tables bucketed the same way join with ZERO exchanges — the shuffle
  was paid once, at ingest, instead of on every query. This is the
  batch analog of the transport's per-stream segment layout (the
  reference fixes each stream's segment partitioning at write time,
  `cpp/src/writer.cpp:149-213`; readers never re-shuffle).
- **Partitioned layout** (`write_partitioned`): directory-partition a
  table by a low-cardinality column so predicates on it prune entire
  directories at planning time (`PartitionFilters` in the scan, zero IO
  for pruned partitions) — the batch analog of the reader's seek: skip
  data by key without touching it (`cpp/src/reader.cpp:507-583`).

Both write through the session catalog (`saveAsTable`) because bucket
metadata lives in the table catalog, not the parquet footers; plain
`spark.read.parquet` on a bucketed directory silently loses the bucket
spec and re-shuffles. tests/test_storage_layout.py pins the plan
contracts: no Exchange in the bucketed join, PartitionFilters + pruned
input size in the partitioned scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "error",
) -> None:
    """Persist ``df`` hash-bucketed on ``bucket_cols`` (optionally
    sorted within buckets — sorted buckets additionally let sort-merge
    joins skip their sort). ``mode`` follows Spark's own writer default
    (errorifexists): replacing a live table is a destructive act the
    caller must opt into with mode="overwrite". ``num_buckets`` should match the downstream
    join fan-in, not the cluster size: both sides of a co-located join
    must use the SAME bucket count and columns."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    table: str,
    partition_cols: list[str],
    mode: str = "error",
) -> None:
    """Persist ``df`` directory-partitioned on ``partition_cols`` (low
    cardinality only: every distinct value becomes a directory; date /
    event-type / language are right, user_id is wrong). ``mode`` defaults
    to Spark's errorifexists; pass "overwrite" explicitly to replace."""
    df.write.mode(mode).partitionBy(*partition_cols).saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — REQUIRED for bucketed tables (a path-based parquet
    read drops the bucket spec and the join shuffles again)."""
    return spark.table(table)
