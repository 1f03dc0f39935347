"""Regression tests for bench.py helpers (warmup-dir selection must not
crash on non-numeric sf* directory names)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import pick_warmup_dir


def test_pick_warmup_dir_smallest_numeric(tmp_path):
    for d in ("sf0.001", "sf0.01", "sf0.1"):
        (tmp_path / d).mkdir()
    got = pick_warmup_dir(str(tmp_path / "sf0.1"))
    assert got == str(tmp_path / "sf0.001")


def test_pick_warmup_dir_ignores_non_numeric(tmp_path):
    for d in ("sf_scratch", "sfbroken", "sf0.01", "sf0.1"):
        (tmp_path / d).mkdir()
    got = pick_warmup_dir(str(tmp_path / "sf0.1"))
    assert got == str(tmp_path / "sf0.01")


def test_pick_warmup_dir_none_when_only_junk(tmp_path):
    (tmp_path / "sf_scratch").mkdir()
    assert pick_warmup_dir(str(tmp_path / "sf_scratch")) is None


def test_build_scaled_dir_replicates_without_key_collisions(spark, tmp_path, monkeypatch):
    """The scaling probe's data builder must produce factor-x fact rows
    with DISJOINT join keys across replicas (colliding orderkeys would
    square the join output and benchmark a different query), per-replica
    token-renamed document text (recipe-v4: within-replica similarity
    preserved exactly, cross-replica exactly zero), and unchanged
    dimensions."""
    import bench

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    out = bench.build_scaled_dir(spark, src, factor=3)

    def n(d, t):
        return spark.read.parquet(os.path.join(d, f"{t}.parquet")).count()

    for t in ("orders", "lineitem", "documents", "embeddings"):
        assert n(out, t) == 3 * n(src, t), t
    for t in ("region", "nation", "customer"):
        assert n(out, t) == n(src, t), t
    ord_scaled = spark.read.parquet(os.path.join(out, "orders.parquet"))
    assert ord_scaled.select("o_orderkey").distinct().count() == ord_scaled.count()
    # join fan-out must stay 1:1 per lineitem row: the scaled join yields
    # exactly 3x the source join's rows, not 9x
    li_s = spark.read.parquet(os.path.join(out, "lineitem.parquet"))
    li = spark.read.parquet(os.path.join(src, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(src, "orders.parquet"))
    base = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert li_s.join(ord_scaled, li_s.l_orderkey == ord_scaled.o_orderkey).count() == 3 * base
    # replica text is injectively renamed: every replica-1 token carries
    # the ~r1 suffix, so replica-1 shares NO token (hence no shingle)
    # with replica-0 — cross-replica similarity is exactly zero while
    # within-replica Jaccard is preserved by the bijection
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(out, "documents.parquet"))
    r1 = docs.filter((F.col("doc_id") >= 100_000_000) & (F.col("doc_id") < 200_000_000))
    assert r1.count() > 0
    assert r1.filter(~F.col("text").rlike(r"~r1(\s|$)")).count() == 0
    # cached second call is a no-op returning the same dir
    assert bench.build_scaled_dir(spark, src, factor=3) == out
