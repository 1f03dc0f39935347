"""AQE skew-join splitting: a reduce partition holding a hot key is
split into mapper-range chunks, each joined against a REPLICATED copy of
the other side's matching partition (`SortMergeJoin(skew=true)` +
`AQEShuffleRead skewed`). At 100 TB this is what saves a join from one
straggler task processing a celebrity key while 999 executors idle —
and it composes with the explicit salting in operators/skew.py
(`join_salted`): AQE handles skew it can SEE at runtime; salting handles
skew you know at plan time or in aggregations AQE can't split.

Pinned mechanism caveat (discovered empirically, load-bearing for
real deployments): AQE splits a skewed partition by MAP-OUTPUT ranges,
so a shuffle fed by a single map task (one unsplittable parquet file /
one row group — exactly what a laptop-scale test produces) can never be
split, no matter how skewed. The fixtures below repartition upstream to
get a multi-mapper shuffle; at production scale thousands of mappers
make split granularity a non-issue. Thresholds are lowered to fire at
test scale (defaults: 256MB threshold, factor 5).
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@pytest.fixture
def skew_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_join(spark, n_mappers):
    """60% of lineitem rows collapse onto one hot supplier key."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    if n_mappers > 1:
        li = li.repartition(n_mappers)
    skewed = li.select(
        F.when(F.col("l_orderkey") % 5 < 3, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .alias("k"),
        "l_quantity",
    )
    dim = spark.read.parquet(f"{SF_DIR}/supplier.parquet").select(
        F.col("s_suppkey").alias("k"), "s_nationkey"
    )
    return (
        skewed.join(dim, "k")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )


def _final_plan_str(df):
    return df._jdf.queryExecution().executedPlan().executedPlan().toString()


def test_skew_split_fires_with_multiple_mappers(spark, skew_confs):
    df = _skewed_join(spark, n_mappers=32)
    df.collect()
    plan = _final_plan_str(df)
    assert "skew=true" in plan, "AQE did not split the skewed partition"
    assert "AQEShuffleRead skewed" in plan


def test_skew_split_cannot_fire_with_one_mapper(spark, skew_confs):
    """Splitting is per map-output range: a single-mapper shuffle has
    exactly one range per partition, so the same skewed data CANNOT be
    split. Pinned so the mechanism's granularity stays documented — if
    a Spark version starts splitting sub-mapper, we want to know."""
    df = _skewed_join(spark, n_mappers=1)
    df.collect()
    assert "skew=true" not in _final_plan_str(df)


def test_skew_split_preserves_results(spark, skew_confs):
    with_split = {tuple(r) for r in _skewed_join(spark, 32).collect()}
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    without = {tuple(r) for r in _skewed_join(spark, 32).collect()}
    assert with_split == without and with_split
