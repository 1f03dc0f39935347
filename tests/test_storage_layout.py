"""Plan contracts for the physical-layout helpers (river_spark/storage.py):
bucketed tables join with zero exchanges; partitioned tables prune
directories at plan time. These are the two layout levers that decide
whether a 100 TB join/scan pays a shuffle/a full scan or neither."""

import pytest
from pyspark.sql import functions as F

from river_spark.storage import read_table, write_bucketed, write_partitioned

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    events = spark.range(0, 10_000).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 97).alias("score"),
    )
    profile = spark.range(0, 1_000).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 7).alias("segment"),
    )
    write_bucketed(events, "ev_bucketed", ["user_id"], num_buckets=8,
                   sort_cols=["user_id"], mode="overwrite")
    write_bucketed(profile, "prof_bucketed", ["user_id"], num_buckets=8,
                   sort_cols=["user_id"], mode="overwrite")
    yield "ev_bucketed", "prof_bucketed"
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS prof_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ev, prof = bucketed_tables
    # AQE wraps everything in AdaptiveSparkPlan; disable broadcast so the
    # join actually exercises the bucket co-location (a broadcast would
    # trivially avoid the exchange for this small side)
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, ev).join(read_table(spark, prof), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # sorted buckets: the sort-merge join needs no extra sort either
        n = joined.count()
        assert n == 1_000
    finally:
        # restore the SESSION's configured value — unset() would fall back
        # to Spark's 10MB default, not river_spark.session's 64MB
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    ev, _ = bucketed_tables
    agg = read_table(spark, ev).groupBy("user_id").agg(F.sum("score").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed agg still shuffles:\n{plan}"
    assert agg.count() == 10_000


def test_unbucketed_baseline_does_shuffle(spark):
    """Sanity: the same join WITHOUT bucketing plans an exchange — the
    no-Exchange asserts above prove the layout, not a quirk."""
    a = spark.range(0, 10_000).select(F.col("id").alias("user_id"))
    b = spark.range(0, 1_000).select(F.col("id").alias("user_id"))
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = a.join(b, "user_id")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)


@pytest.fixture(scope="module")
def partitioned_table(spark):
    df = spark.range(0, 10_000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 5).cast("string").alias("etype"),
        (F.col("id") % 1000).alias("payload"),
    )
    write_partitioned(df, "ev_partitioned", ["etype"], mode="overwrite")
    yield "ev_partitioned"
    spark.sql("DROP TABLE IF EXISTS ev_partitioned")


def test_partition_pruning_in_plan(spark, partitioned_table):
    df = read_table(spark, partitioned_table).filter(F.col("etype") == "3")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "etype" in plan
    # the pruned scan must enumerate exactly one of the five partitions
    files = df.inputFiles()
    assert files and all("etype=3" in f for f in files), files
    assert df.count() == 2_000


def test_partition_pruning_skips_io(spark, partitioned_table):
    full = read_table(spark, partitioned_table)
    pruned = full.filter(F.col("etype").isin("0", "1"))
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert pruned.count() == 4_000


def test_write_helpers_default_to_errorifexists(spark):
    """The layout helpers follow Spark's own writer default: a second
    save to the same table must raise instead of silently replacing it
    (overwrite is an explicit opt-in)."""
    from pyspark.sql.utils import AnalysisException

    df = spark.range(0, 10).select(F.col("id").alias("user_id"))
    write_bucketed(df, "dflt_bucketed", ["user_id"], num_buckets=2, mode="overwrite")
    try:
        with pytest.raises(AnalysisException):
            write_bucketed(df, "dflt_bucketed", ["user_id"], num_buckets=2)
    finally:
        spark.sql("DROP TABLE IF EXISTS dflt_bucketed")
