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


def _interleave_expr(cols: list[str], bits: int) -> str:
    """SQL expression interleaving ``bits`` low bits of each column in
    ``cols`` round-robin (Morton order): bit k of column j lands at
    position k * len(cols) + j. Pure integer arithmetic, whole-stage
    codegen friendly."""
    n = len(cols)
    terms = []
    for k in range(bits):
        for j, c in enumerate(cols):
            terms.append(f"shiftleft(shiftright({c}, {k}) & 1, {k * n + j})")
    return " + ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 10,
    mode: str = "error",
) -> None:
    """Persist ``df`` as parquet physically clustered along the Morton
    (Z-order) curve over ``cols`` — the multi-dimensional layout lever
    next to bucketing (join locality) and partitioning (directory
    pruning): after z-ordering, each file's min/max footer stats form a
    tight box over EVERY z-ordered column, so range predicates on ANY of
    them skip most files (via the `_zonemap` index or any engine's
    footer-stats skipping). This is what Delta's OPTIMIZE ZORDER BY and
    Iceberg's sort orders do; `layout_zorder` (queries/relational7.py)
    gate-checks the box math, this is the write path that realizes it.

    Mechanics: each column is affinely scaled into [0, 2^bits) using its
    global min/max (one lightweight agg job — the analog of the range
    sampling `repartitionByRange` does anyway), the scaled values are
    bit-interleaved into one z-value, and the rows are range-partitioned
    AND sorted by it. Range partitioning makes the per-file z-ranges
    disjoint; the within-file sort tightens row-group stats too.

    100 TB posture: one exchange (the range partitioner samples, then
    shuffles once), no global sort barrier — sorting is per-file. The
    min/max pre-scan reads only the z columns (column-pruned) and is
    O(data) but cheap; production systems persist these bounds in table
    metadata instead of re-scanning."""
    from pyspark.sql import functions as F

    lo_hi = df.agg(
        *[F.min(c).alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    span = (1 << bits) - 1
    scaled = []
    zdf = df
    for i, c in enumerate(cols):
        lo, hi = lo_hi[f"lo_{i}"], lo_hi[f"hi_{i}"]
        rng = (hi - lo) or 1
        sc = f"__z{i}"
        zdf = zdf.withColumn(
            sc,
            F.expr(
                f"cast((cast({c} as double) - {lo}) * {span} / {rng} as bigint)"
            ),
        )
        scaled.append(sc)
    zdf = zdf.withColumn("__zv", F.expr(_interleave_expr(scaled, bits)))
    (
        zdf.repartitionByRange(n_files, "__zv")
        .sortWithinPartitions("__zv")
        .drop("__zv", *scaled)
        .write.mode(mode)
        .parquet(path)
    )
