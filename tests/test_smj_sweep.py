"""SMJ-only execution sweep (opt-in): run EVERY registry query with
auto-broadcast disabled, so each equi-join plans the way it would at
100 TB (sort-merge / shuffled-hash), and assert it still EXECUTES.

Why this exists: broadcast joins mask planner bugs at laptop SF. Round
10 found Spark 4.1's union-output-partitioning propagation crashes a
downstream SortMergeJoin ("Can't zip RDDs with unequal numbers of
partitions") — invisible under default thresholds, guaranteed on the
at-scale path (fixed in session.py; repro in test_review_fixes.py).
This sweep is the systematic version of that discovery: any query that
only works because a broadcast hid a planning defect fails here.

Opt-in because it re-executes all 307 queries (~10 min, roughly the
cost of the oracle suite): set SPARK_GRAFT_SMJ_SWEEP=1. Round-10 status:
ALL 307 green.
"""

import os

import pytest

from river_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SMJ_SWEEP", "0") != "1",
    reason="opt-in full-registry re-execution; set SPARK_GRAFT_SMJ_SWEEP=1",
)


@pytest.fixture(scope="module")
def smj_spark(spark):
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    old = {}
    for k in keys:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, "-1")
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_executes_without_broadcast(name, smj_spark):
    # correctness is the oracle suite's job; this gate is about the
    # at-scale PLAN executing at all
    QUERIES[name].fn(smj_spark, SF_DIR).collect()
