"""stitched_lag must be ROW-IDENTICAL to the plain per-key lag window —
that equivalence is what lets coarse-key gap queries (ev_burstiness /
ev_gap_entropy) run the stitched plan while keeping plain-SQL oracles.

Covers the stitching edge cases a naive implementation gets wrong:
- a bucket's FIRST row takes the previous bucket's LAST value;
- EMPTY buckets: the carry must come from the previous NON-EMPTY
  bucket, not bucket-1;
- each key's global first row stays NULL;
- same-timestamp ties resolved by the full ordering tuple;
- single-row keys and single-bucket keys.
"""

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from river_spark.operators.stitched_lag import stitched_lag


def _plain(df):
    w = Window.partitionBy("k").orderBy("ts", "rid")
    return df.withColumn("prev_value", F.lag("ts").over(w))


def _assert_equal(spark, df):
    got = stitched_lag(
        df,
        key_cols=["k"],
        order_cols=["ts", "rid"],
        value_col="ts",
        bucket=F.date_trunc("day", F.col("ts")),
    )
    exp = _plain(df)
    cols = ["k", "rid", "ts", "prev_value"]
    g = sorted(got.select(*cols).collect())
    e = sorted(exp.select(*cols).collect())
    assert g == e


def test_handcrafted_boundaries(spark):
    t = dt.datetime(2024, 1, 1)

    def at(day, sec):
        return t + dt.timedelta(days=day, seconds=sec)

    rows = [
        # key a: 3 days, day 2 EMPTY -> day 3's first row carries from day 1
        ("a", 1, at(0, 10)),
        ("a", 2, at(0, 20)),
        ("a", 3, at(2, 5)),
        ("a", 4, at(2, 6)),
        # key b: single row (global first stays NULL)
        ("b", 5, at(1, 0)),
        # key c: same-ts tie inside one bucket, resolved by rid
        ("c", 6, at(0, 0)),
        ("c", 7, at(0, 0)),
        # key d: boundary rows at day edges (23:59:59 then 00:00:00)
        ("d", 8, at(0, 86399)),
        ("d", 9, at(1, 0)),
    ]
    df = spark.createDataFrame(rows, "k string, rid long, ts timestamp_ntz")
    _assert_equal(spark, df)
    # spot-pin the carries the test exists for
    got = {
        r["rid"]: r["prev_value"]
        for r in stitched_lag(
            df, ["k"], ["ts", "rid"], "ts", F.date_trunc("day", F.col("ts"))
        ).collect()
    }
    assert got[3] == at(0, 20), "empty-bucket carry must skip to day 1's last"
    assert got[5] is None
    assert got[7] == at(0, 0), "tie resolved by rid"
    assert got[9] == at(0, 86399), "midnight boundary stitch"


def test_randomized_equivalence(spark):
    # deterministic pseudo-random fixture (no Math.random: fixed seed)
    import random

    rng = random.Random(421)
    t = dt.datetime(2024, 3, 1)
    rows = []
    rid = 0
    for k in "abcde":
        n = rng.randint(1, 60)
        for _ in range(n):
            rid += 1
            rows.append(
                (
                    k,
                    rid,
                    t
                    + dt.timedelta(
                        days=rng.randint(0, 9), seconds=rng.randint(0, 86399)
                    ),
                )
            )
    df = spark.createDataFrame(rows, "k string, rid long, ts timestamp_ntz")
    _assert_equal(spark, df)


def test_parallelism_is_key_x_bucket(spark):
    """The point of the operator: the fine window's exchange hashes on
    (key, bucket), not key alone."""
    t = dt.datetime(2024, 1, 1)
    rows = [
        ("a", i, t + dt.timedelta(days=i % 7, seconds=i)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "k string, rid long, ts timestamp_ntz")
    out = stitched_lag(
        df, ["k"], ["ts", "rid"], "ts", F.date_trunc("day", F.col("ts"))
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the fine window's exchange must hash on (k, _sl_bucket) — that's
    # the keys x buckets parallelism; the coarse rollup window still
    # hashes on k alone over the tiny per-bucket table, which is fine
    assert "_sl_bucket" in plan
    import re

    fine = re.search(r"hashpartitioning\(k#\d+[^)]*_sl_bucket", plan)
    assert fine, "fine window lost the bucket in its partitioning"


def test_null_values_stitch_on_position_not_nullness(spark):
    """A legitimately-NULL lagged value must stay NULL (round-10 advice:
    the old coalesce-based stitch let a non-first row whose previous
    value was NULL pick up the previous bucket's carry), and a NULL last
    value must itself carry across the bucket boundary."""
    t = dt.datetime(2024, 1, 1)

    def at(day, sec):
        return t + dt.timedelta(days=day, seconds=sec)

    rows = [
        # day 0: v = 1.0 then NULL (NULL is the bucket's LAST value)
        ("a", 1, at(0, 10), 1.0),
        ("a", 2, at(0, 20), None),
        # day 1: first row's carry must be the NULL from rid 2,
        # second row's in-bucket lag is 3.0 (non-null, unaffected)
        ("a", 3, at(1, 5), 3.0),
        ("a", 4, at(1, 6), 4.0),
        # day 2: mid-bucket NULL — rid 6's lag is NULL and must STAY
        # NULL, not coalesce to day 1's carry
        ("a", 5, at(2, 1), None),
        ("a", 6, at(2, 2), 6.0),
    ]
    df = spark.createDataFrame(rows, "k string, rid long, ts timestamp_ntz, v double")
    got = stitched_lag(
        df, ["k"], ["ts", "rid"], "v", F.date_trunc("day", F.col("ts"))
    )
    w = Window.partitionBy("k").orderBy("ts", "rid")
    exp = df.withColumn("prev_value", F.lag("v").over(w))
    cols = ["k", "rid", "ts", "v", "prev_value"]
    assert sorted(got.select(*cols).collect()) == sorted(exp.select(*cols).collect())
    by_rid = {r["rid"]: r["prev_value"] for r in got.collect()}
    assert by_rid[3] is None, "NULL last value must carry across the boundary"
    assert by_rid[6] is None, "mid-bucket NULL lag must not pick up the carry"


def test_prefix_sum_equivalence(spark):
    """stitched_prefix_sum must match the plain running-sum window.
    Values are integer-valued doubles (exactly representable), so the
    regrouped addition is bit-exact and plain == stitched row-for-row;
    the NULL rules (leading NULLs stay NULL, later NULLs are skipped)
    are pinned by hand rows."""
    from river_spark.operators.stitched_lag import stitched_prefix_sum

    t = dt.datetime(2024, 1, 1)

    def at(day, sec):
        return t + dt.timedelta(days=day, seconds=sec)

    rows = [
        # key a: leading NULL (stays NULL), empty day 1, carry across day 2
        ("a", 1, at(0, 1), None),
        ("a", 2, at(0, 2), 5.0),
        ("a", 3, at(2, 1), 7.0),
        ("a", 4, at(2, 2), None),   # sum so far (12.0) persists through NULL
        ("a", 5, at(3, 1), 1.0),
        # key b: single NULL-only key -> all NULL
        ("b", 6, at(0, 1), None),
    ]
    df = spark.createDataFrame(rows, "k string, rid long, ts timestamp_ntz, v double")
    got = stitched_prefix_sum(
        df, ["k"], ["ts", "rid"], "v", F.date_trunc("day", F.col("ts")),
        out_col="rs",
    )
    w = (
        Window.partitionBy("k")
        .orderBy("ts", "rid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    exp = df.withColumn("rs", F.sum("v").over(w))
    cols = ["k", "rid", "ts", "v", "rs"]
    assert sorted(got.select(*cols).collect()) == sorted(exp.select(*cols).collect())

    # randomized: integer-valued doubles, many keys/buckets
    import random

    rng = random.Random(829)
    rows = []
    rid = 0
    for k in "abcde":
        for _ in range(rng.randint(1, 80)):
            rid += 1
            rows.append(
                (
                    k,
                    rid,
                    t + dt.timedelta(days=rng.randint(0, 9), seconds=rng.randint(0, 86399)),
                    float(rng.randint(-50, 50)),
                )
            )
    df = spark.createDataFrame(rows, "k string, rid long, ts timestamp_ntz, v double")
    got = stitched_prefix_sum(
        df, ["k"], ["ts", "rid"], "v", F.date_trunc("day", F.col("ts")), out_col="rs"
    )
    exp = df.withColumn("rs", F.sum("v").over(w))
    assert sorted(got.select(*cols).collect()) == sorted(exp.select(*cols).collect())


def test_row_number_equivalence(spark):
    """stitched_row_number must match the plain rank window, including
    ties resolved by the full ordering tuple and single-row keys."""
    from river_spark.operators.stitched_lag import stitched_row_number

    import random

    rng = random.Random(66)
    t = dt.datetime(2024, 5, 1)
    rows = []
    rid = 0
    for k in "abcd":
        for _ in range(rng.randint(1, 120)):
            rid += 1
            rows.append(
                (k, rid, t + dt.timedelta(days=rng.randint(0, 9),
                                          seconds=rng.randint(0, 3600)))
            )
    rows.append(("z", 9999, t))  # single-row key
    df = spark.createDataFrame(rows, "k string, rid long, ts timestamp_ntz")
    got = stitched_row_number(
        df, ["k"], ["ts", "rid"], F.date_trunc("day", F.col("ts")), out_col="rn"
    )
    w = Window.partitionBy("k").orderBy("ts", "rid")
    exp = df.withColumn("rn", F.row_number().over(w).cast("long"))
    cols = ["k", "rid", "ts", "rn"]
    assert sorted(got.select(*cols).collect()) == sorted(exp.select(*cols).collect())
