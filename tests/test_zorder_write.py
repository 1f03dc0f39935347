"""write_zordered: the physical Z-order write path, end to end with the
zone-map index — z-clustered files must let BOTH z-ordered dimensions
prune most files, while the natural (single-column-sorted) layout prunes
on its sort column only; and the pruned read must equal the full scan.

layout_zorder (queries/relational7.py) gate-checks the Morton box MATH
against DuckDB; this suite checks the WRITE PATH realizes it on disk.
"""

import os

import pytest
from pyspark.sql import functions as F

from river_spark.ingest.zonemap import (
    build_zonemap,
    list_parquet_files,
    prune_files,
    read_pruned,
    write_zonemap,
)
from river_spark.storage import write_zordered

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
N_FILES = 16


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    """lineitem written twice: z-ordered on (l_partkey, l_suppkey) vs
    the natural layout (range-partitioned + sorted on l_orderkey — a
    GOOD single-dimension layout, not a straw man)."""
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zroot = str(tmp_path_factory.mktemp("zorder"))
    nroot = str(tmp_path_factory.mktemp("natural"))
    write_zordered(li, zroot, ["l_partkey", "l_suppkey"], n_files=N_FILES, mode="overwrite")
    (
        li.repartitionByRange(N_FILES, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(nroot)
    )
    return li, zroot, nroot


def _survivors(spark, root, column, lo, hi):
    zm = build_zonemap(spark, root).toPandas()
    return len(prune_files(zm, column, lo=lo, hi=hi)), len(list_parquet_files(root))


def test_zorder_prunes_both_dimensions(spark, layouts):
    li, zroot, _ = layouts
    pk_hi = li.agg(F.max("l_partkey")).collect()[0][0]
    # a 10%-wide range on EACH z-ordered dimension
    for col in ("l_partkey", "l_suppkey"):
        hi_val = li.agg(F.max(col)).collect()[0][0]
        kept, total = _survivors(spark, zroot, col, 0, hi_val // 10)
        assert total == N_FILES
        # Morton interleaving guarantees a 1/10 slab on either dimension
        # maps to a contiguous-ish fraction of the curve; with 16 files
        # over 2 dims a 10% slab cannot need more than half the files.
        assert kept <= total // 2, (col, kept, total)
    assert pk_hi is not None


def test_natural_layout_cannot_prune_z_columns(spark, layouts):
    li, _, nroot = layouts
    hi_val = li.agg(F.max("l_partkey")).collect()[0][0]
    kept, total = _survivors(spark, nroot, "l_partkey", 0, hi_val // 10)
    # orderkey-sorted files each span ~the whole partkey domain: nothing
    # (or almost nothing) can be skipped — the point of the comparison.
    assert kept >= total - 1, (kept, total)


def test_zordered_read_pruned_equals_full_scan(spark, layouts):
    li, zroot, _ = layouts
    write_zonemap(spark, zroot)  # persisted index, as production would
    hi_val = li.agg(F.max("l_suppkey")).collect()[0][0]
    lo, hi = hi_val // 4, hi_val // 2
    got = (
        read_pruned(spark, zroot, "l_suppkey", lo=lo, hi=hi)
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    exp = (
        li.filter((F.col("l_suppkey") >= lo) & (F.col("l_suppkey") <= hi))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_zorder_write_preserves_rows_exactly(spark, layouts):
    li, zroot, _ = layouts
    back = spark.read.parquet(zroot)
    assert back.count() == li.count()
    assert back.exceptAll(li).count() == 0 and li.exceptAll(back).count() == 0
