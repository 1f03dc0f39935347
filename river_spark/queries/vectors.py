"""Vector similarity over the ``embeddings`` table (array<float>, dim 64).

Brute-force cosine top-k is the exactness baseline; the LSH-bucketed
variant (operators/similarity.py) is the 100 TB path. Dot products stay
JVM-side via ``aggregate``/``zip_with`` higher-order functions — no
Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.queries.relational import q
from river_spark.queries.tables import tbl


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


@q(
    "emb_knn_cosine",
    oracle="""
    WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
    s AS (SELECT vec_id, label,
                 list_dot_product(embedding::DOUBLE[], qe)
                   / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                      * sqrt(list_dot_product(qe, qe))) AS cos
          FROM embeddings, q WHERE vec_id <> 0)
    SELECT vec_id, label, round(cos, 6) AS cos_sim
    FROM s ORDER BY cos DESC, vec_id LIMIT 10
    """,
    tags=("vector", "knn"),
    bench=True,
)
def emb_knn_cosine(spark, sf_dir):
    """Brute-force cosine top-10 for the vec_id=0 query vector. The query
    row is broadcast; the scan is embarrassingly parallel; top-k is
    TakeOrderedAndProject (no full sort)."""
    emb = tbl(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    cos = _dot(F.col("embedding"), F.col("qe")) / (
        _norm(F.col("embedding")) * _norm(F.col("qe"))
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .withColumn("_cos", cos)
        .orderBy(F.desc("_cos"), "vec_id")
        .limit(10)
        .select("vec_id", "label", F.round("_cos", 6).alias("cos_sim"))
    )


@q(
    "emb_norms",
    oracle="""
    SELECT vec_id, label,
           round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm
    FROM embeddings
    """,
    tags=("vector",),
)
def emb_norms(spark, sf_dir):
    return tbl(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.round(_norm(F.col("embedding")), 6).alias("l2_norm")
    )


@q(
    "emb_centroid_norms",
    oracle="""
    WITH e AS (
        SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
        FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)),
    c AS (SELECT label, pos, avg(val) AS m FROM e GROUP BY label, pos)
    SELECT label, round(sqrt(sum(m * m)), 6) AS centroid_norm, n
    FROM c JOIN (SELECT label AS l2, count(*) AS n FROM embeddings GROUP BY 1) t
      ON label = l2
    GROUP BY label, n
    """,
    tags=("vector", "agg"),
)
def emb_centroid_norms(spark, sf_dir):
    """Per-label centroid: posexplode → per-dimension mean → norm.
    Shuffles (label, pos) pairs — dimension-parallel, so wide vectors
    don't bottleneck a single reducer at scale."""
    emb = tbl(spark, sf_dir, "embeddings")
    e = emb.select("label", F.posexplode("embedding").alias("pos", "val")).withColumn(
        "val", F.col("val").cast("double")
    )
    c = e.groupBy("label", "pos").agg(F.avg("val").alias("m"))
    n = emb.groupBy("label").agg(F.count("*").alias("n"))
    return (
        c.groupBy("label")
        .agg(F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 6).alias("centroid_norm"))
        .join(F.broadcast(n), "label")
        .select("label", "centroid_norm", "n")
    )
