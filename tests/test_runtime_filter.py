"""AQE runtime bloom-filter join pruning: Spark can inject a
`might_contain(bloom_filter_agg(...))` semi-join reduction on the BIG
side of a selective shuffle join — the probe side scans are pre-filtered
by a bloom filter built from the selective side, cutting shuffle volume
before the join. At 100 TB this is the difference between shuffling the
whole fact table and shuffling the ~matching slice; the configs below
are the production knobs, lowered so the optimization fires at test
scale (the default applicationSideScanSizeThreshold is 10GB).

Pinned here so a Spark upgrade or a session-conf regression that
silently stops the injection fails a test instead of shipping a 10x
shuffle.
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
}


@pytest.fixture
def bloom_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _join(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    sel = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(sel, li.l_orderkey == sel.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )


def test_bloom_filter_injected_on_probe_side(spark, bloom_confs):
    df = _join(spark)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in optimized, "runtime bloom filter not injected"
    assert "Bloom" in physical or "might_contain" in physical


def test_bloom_filter_preserves_results(spark, bloom_confs):
    with_filter = {tuple(r) for r in _join(spark).collect()}
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    without = {tuple(r) for r in _join(spark).collect()}
    assert with_filter == without and with_filter
