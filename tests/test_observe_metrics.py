"""df.observe (CollectMetrics): accumulator-style metrics computed
IN-FLIGHT on the rows a query actually processes — row counts, null
counts, sums — without a second scan or a separate count() job. At
100 TB this is how a pipeline self-audits (dq_expectations' cheaper
sibling): the ETL job and its quality metrics share one pass.

Pinned: metrics equal an independent aggregation, they observe the
post-filter stream exactly, and the plan carries CollectMetrics without
adding an exchange.
"""

from pyspark.sql import Observation, functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_observe_matches_independent_aggregation(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    obs = Observation("audit")
    flt = li.filter(F.col("l_quantity") > 25)
    observed = flt.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.round("l_quantity").cast("long")).alias("qty_sum"),
        F.count(F.when(F.col("l_returnflag").isNull(), 1)).alias("null_flags"),
    )
    out = observed.groupBy("l_returnflag").count()
    out.collect()  # one job: aggregation AND metrics
    exp = flt.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.round("l_quantity").cast("long")).alias("qty_sum"),
    ).collect()[0]
    got = obs.get
    assert got["rows"] == exp["rows"] > 0
    assert got["qty_sum"] == exp["qty_sum"]
    assert got["null_flags"] == 0


def test_observe_adds_no_exchange(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    obs = Observation("plan_probe")
    base = li.filter(F.col("l_quantity") > 25).groupBy("l_returnflag").count()
    with_obs = (
        li.filter(F.col("l_quantity") > 25)
        .observe(obs, F.count(F.lit(1)).alias("rows"))
        .groupBy("l_returnflag")
        .count()
    )
    def exchanges(df):
        return df._jdf.queryExecution().executedPlan().toString().count("Exchange")
    assert "CollectMetrics" in with_obs._jdf.queryExecution().executedPlan().toString()
    assert exchanges(with_obs) == exchanges(base)
