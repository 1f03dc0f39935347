"""Scale-operator tests: rollup cascade correctness, salted-join parity
with the plain join, approx-distinct error bound, partitioned ingest
layout."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from river_spark.operators.rollup import time_rollup
from river_spark.operators.skew import salted_join


def test_rollup_cascade_matches_one_shot(spark, sf_dir):
    from river_spark.queries.tables import events_tbl

    ev = events_tbl(spark, sf_dir).withColumn("tstamp", F.col("ts"))
    rolled = time_rollup(ev, "tstamp", ["event_type"], "value")
    hour = rolled.filter(F.col("resolution") == "1 hour")
    one_shot = ev.groupBy(
        F.date_trunc("hour", "tstamp").alias("bucket_start"), "event_type"
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
    a = {(r.bucket_start, r.event_type): (r.n, round(r.total, 4)) for r in hour.collect()}
    b = {(r.bucket_start, r.event_type): (r.n, r.total) for r in one_shot.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k][0] == b[k][0] and abs(a[k][1] - b[k][1]) < 1e-6


def test_rollup_rejects_bad_resolution(spark, sf_dir):
    from river_spark.queries.tables import events_tbl

    ev = events_tbl(spark, sf_dir).withColumn("tstamp", F.col("ts"))
    with pytest.raises(ValueError):
        time_rollup(ev, "tstamp", [], "value", resolutions=["7 minutes"])
    with pytest.raises(ValueError):
        time_rollup(ev, "tstamp", [], "value", strategy="bogus")
    with pytest.raises(ValueError):
        time_rollup(ev, "tstamp", [], "value", strategy="grouping_sets", materialize=True)


def test_rollup_grouping_sets_matches_cascade(spark, sf_dir):
    """The r15 single-pass GROUPING SETS strategy must produce the same
    rows as the cascade strategy, and its plan must collapse to a single
    shuffle exchange. count/min/max are order-insensitive and compared
    exactly; the raw double `total` may differ in the last ulp (direct
    sum vs sum-of-partial-sums — the gsets order is exactly the oracle's
    one-shot semantics), so it is compared to 1e-9 relative; the DECLARED
    query rounds to 2 dp and is pinned bit-identical by its oracle test."""
    from river_spark.queries.tables import events_tbl

    ev = events_tbl(spark, sf_dir).withColumn("tstamp", F.col("ts"))
    cascade = time_rollup(ev, "tstamp", ["event_type"], "value")
    gsets = time_rollup(ev, "tstamp", ["event_type"], "value", strategy="grouping_sets")

    def keyed(df):
        return {
            (r.resolution, r.bucket_start, r.event_type): (r.n, r.total, r.vmin, r.vmax)
            for r in df.collect()
        }

    a, b = keyed(cascade), keyed(gsets)
    assert set(a) == set(b)
    for k, (n, total, vmin, vmax) in a.items():
        n2, total2, vmin2, vmax2 = b[k]
        assert (n, vmin, vmax) == (n2, vmin2, vmax2), k
        assert abs(total - total2) <= 1e-9 * max(1.0, abs(total)), k
    # AQE toString prints Final and Initial sections — count the final one
    plan = gsets._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") <= 1
    assert "Expand" in final


def test_salted_join_parity_with_hot_key(spark):
    # 90% of fact rows share one key — the skew scenario salting exists for
    fact = spark.createDataFrame(
        [(1 if i % 10 else i % 100, float(i)) for i in range(10_000)], ["k", "v"]
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(100)], ["dk", "name"])
    plain = fact.join(dim, fact.k == dim.dk).groupBy("name").agg(
        F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("sv")
    )
    salted = salted_join(fact, dim, "k", "dk", num_salts=8).groupBy("name").agg(
        F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("sv")
    )
    a = {r.name: (r.n, r.sv) for r in plain.collect()}
    b = {r.name: (r.n, r.sv) for r in salted.collect()}
    assert a == b
    # the salt actually spreads the hot key across partitions
    l = fact.withColumn(
        "__s", F.pmod(F.xxhash64("k", "v"), F.lit(8))
    ).filter(F.col("k") == 1)
    assert l.select("__s").distinct().count() == 8


def test_salted_left_join_keeps_unmatched(spark):
    fact = spark.createDataFrame([(1, 1.0), (999, 2.0)], ["k", "v"])
    dim = spark.createDataFrame([(1, "one")], ["dk", "name"])
    rows = salted_join(fact, dim, "k", "dk", num_salts=4, how="left").collect()
    m = {r.k: r.name for r in rows}
    assert m[1] == "one" and m[999] is None and len(rows) == 2


def test_approx_distinct_error_bound(spark, sf_dir):
    from river_spark.queries.tables import tbl

    li = tbl(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("l_partkey").alias("n")).collect()
    }
    approx = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", rsd=0.02).alias("n"))
        .collect()
    }
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(0.1 * exact[k], 2), (k, exact[k], approx[k])


def test_partitioned_ingest_layout(spark, tmp_path):
    from river_spark.schema import FieldDefinition, FieldType, StreamSchema
    from river_spark.streaming import ingest_stream_continuous
    from river_spark.transport import StreamLog, StreamWriter

    log = StreamLog(str(tmp_path / "store"))
    schema = StreamSchema([FieldDefinition("v", FieldType.DOUBLE)])
    # clock spanning two days so two date partitions appear
    day_ms = 86_400_000
    base = 1_700_000_000_000 - (1_700_000_000_000 % day_ms)
    ticks = iter([base + i * (day_ms // 2) for i in range(100)])
    w = StreamWriter(log, batch_size=10, clock=lambda: next(ticks))
    w.initialize("pd", schema)
    arr = np.zeros(40, dtype=schema.dtype())
    arr["v"] = np.arange(40)
    w.write(arr)
    w.stop()
    q = ingest_stream_continuous(
        spark, str(tmp_path / "store"), "pd", str(tmp_path / "out"), partition_by_date=True
    )
    q.awaitTermination(120)
    out = str(tmp_path / "out" / "pd")
    parts = sorted(d for d in os.listdir(out) if d.startswith("date="))
    assert len(parts) >= 2, parts
    df = spark.read.parquet(out)
    assert df.count() == 40
    # partition pruning: a date filter must prune files
    one_day = parts[0].split("=", 1)[1]
    pruned = df.filter(F.col("date") == one_day)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert df.filter(F.col("date") == one_day).count() < 40


def test_rollup_buckets_are_session_timezone_independent(spark):
    """Bucket boundaries are pure NTZ epoch math — a non-UTC caller
    session must produce the same day/hour buckets as UTC (unix_timestamp
    would shift day buckets to 19:00 of the previous day on EST)."""
    from pyspark.sql import functions as F

    from river_spark.operators.rollup import time_rollup

    df = spark.createDataFrame(
        [("2024-01-15 10:30:45", "a", 1.0), ("2024-01-15 11:00:05", "a", 2.0)],
        "ts string, k string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))

    def run():
        rolled = time_rollup(df, "ts", ["k"], "v", resolutions=["1 hour", "1 day"])
        rows = rolled.select(
            "resolution", F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("b")
        ).collect()
        return sorted((r.resolution, r.b) for r in rows)

    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = run()
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        est = run()
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)
    assert utc == est
    assert ("1 day", "2024-01-15 00:00:00") in utc
    assert ("1 hour", "2024-01-15 10:00:00") in utc
