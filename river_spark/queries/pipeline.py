"""Training-data-pipeline queries. Oracle-backed wherever the result is
deterministic and SQL-expressible (exact-verified MinHash pairs, planted
-twin ANN retrieval, payload metadata); the rest (probabilistic-recall
dedup, fake-decoder multimodal) stay rows-only with unit tests against
brute-force baselines in tests/test_pipeline_ops.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.operators.dedup import (
    cosine_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash_pairs,
    simhash_signatures,
)
from river_spark.operators.multimodal import decode_image_features, sample_frames, with_payload_metadata
from river_spark.operators.similarity import lsh_topk
from river_spark.queries.relational import q
from river_spark.queries.tables import tbl


@q(
    "dedup_minhash_lsh",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)),
    cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    pair AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(inter * 1.0 / (ca.c + cb.c - inter), 6) AS jaccard
    FROM pair
    JOIN cnt ca ON ca.doc_id = doc_a
    JOIN cnt cb ON cb.doc_id = doc_b
    WHERE inter * 1.0 / (ca.c + cb.c - inter) >= 0.9
    """,
    tags=("dedup", "minhash"),
    bench=True,
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH candidates verified by EXACT shingle Jaccard — the
    production two-stage shape (cheap probabilistic candidates, exact
    verify). With 64 hashes in 16 bands (4 rows/band) a pair at the 0.9
    threshold is missed with probability (1-0.9^4)^16 ≈ 4e-8, so the
    output equals the oracle's exhaustive exact-Jaccard pairs; the
    verify stage makes precision exact by construction."""
    docs = tbl(spark, sf_dir, "documents")
    sh = shingles(docs, "doc_id", "text", 3, hashed=True)
    sigs = minhash_signatures(sh, 64)
    cand = lsh_candidate_pairs(sigs, bands=16)
    sets = sh.groupBy("doc_id").agg(F.collect_set("shingle").alias("ss"))
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("ss_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("ss_b"))
    inter = F.size(F.array_intersect("ss_a", "ss_b"))
    union = F.size(F.array_union("ss_a", "ss_b"))
    jac = inter * F.lit(1.0) / union
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(jac >= 0.9)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@q("dedup_simhash", tags=("dedup", "simhash"))
def dedup_simhash(spark, sf_dir):
    # max_hamming=8: the synthetic docs share a small vocabulary, so wider
    # radii degenerate into flagging a quarter of all pairs
    docs = tbl(spark, sf_dir, "documents")
    sigs = simhash_signatures(docs, "doc_id", "text")
    return simhash_pairs(sigs, max_hamming=8)


@q("emb_cosine_dedup", tags=("dedup", "vector"))
def emb_cosine_dedup(spark, sf_dir):
    # the synthetic embeddings are near-orthogonal (max pairwise cos ≈ 0.4);
    # 6 planes + low threshold make the bucketing path observable on them
    emb = tbl(spark, sf_dir, "embeddings")
    return cosine_dedup(emb, "vec_id", "embedding", n_planes=6, threshold=0.2)


@q(
    "emb_ann_lsh",
    oracle="""
    SELECT vec_id AS query_id, vec_id + 1000000 AS top1_doc_id,
           CAST(1.0 AS DOUBLE) AS top1_cos
    FROM embeddings WHERE vec_id < 5
    """,
    tags=("vector", "ann"),
    bench=True,
)
def emb_ann_lsh(spark, sf_dir):
    """Planted-twin retrieval through the full LSH-ANN pipeline: each
    query vector gets an exact duplicate planted in the corpus (vec_id +
    1e6); identical vectors share every hyperplane sign, so the twin is
    always bucketed with its query and MUST come back as rank-1 with
    cosine 1.0. This verifies bucketing, probe expansion, scoring, and
    ranking end-to-end; recall on weak neighbors is covered by unit
    tests against brute force (tests/test_pipeline_ops.py)."""
    from pyspark.sql import Window

    emb = tbl(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    twins = queries.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "label", "embedding"
    )
    corpus = emb.unionByName(twins)
    topk = lsh_topk(corpus, queries, "vec_id", "embedding", k=10, n_planes=12, probe_hamming=2)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "doc_id")
    return (
        topk.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("doc_id").alias("top1_doc_id"), F.round("cos_sim", 6).alias("top1_cos"))
    )


@q(
    "mm_payload_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           substring(hex(encode(text)), 1, 8) AS payload_magic,
           sha256(text) AS payload_sha
    FROM documents
    """,
    tags=("multimodal",),
)
def mm_payload_metadata(spark, sf_dir):
    """Binary-column plumbing over synthetic payloads (documents.text as
    bytes — the container has no real media, SURVEY Part B north-star).
    Byte length, 4-byte magic hex, and sha-256 are all exactly
    DuckDB-expressible, so this gets a bit-level oracle."""
    docs = tbl(spark, sf_dir, "documents").withColumn("payload", F.encode("text", "UTF-8"))
    return with_payload_metadata(docs, "payload").select(
        "doc_id", "payload_bytes", "payload_magic", "payload_sha"
    )


@q("mm_decode_features", tags=("multimodal", "udf"))
def mm_decode_features(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents").withColumn("payload", F.encode("text", "UTF-8"))
    return decode_image_features(docs, "doc_id", "payload", decoder="fake")


@q("mm_frame_sample", tags=("multimodal",))
def mm_frame_sample(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents").withColumn("payload", F.encode("text", "UTF-8"))
    return sample_frames(docs, "doc_id", "payload", n_frames=4)


@q(
    "emb_ann_ivf",
    oracle="""
    SELECT vec_id AS query_id, vec_id + 1000000 AS top1_doc_id,
           CAST(1.0 AS DOUBLE) AS top1_cos
    FROM embeddings WHERE vec_id < 5
    """,
    tags=("vector", "ann", "ivf"),
)
def emb_ann_ivf(spark, sf_dir):
    """IVF-partitioned ANN (KMeans cells, n_probes nearest cells scored),
    verified by planted-twin retrieval: the twin is assigned to the cell
    whose centroid is nearest the query vector — exactly the first cell
    the query probes — so it MUST come back rank-1 with cosine 1.0.
    Recall against brute force is covered in tests/test_pipeline_ops.py."""
    from pyspark.sql import Window

    from river_spark.operators.similarity import ivf_topk

    emb = tbl(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    twins = queries.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "label", "embedding"
    )
    corpus = emb.unionByName(twins)
    topk = ivf_topk(corpus, queries, "vec_id", "embedding", k=10, n_lists=16, n_probes=3)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "doc_id")
    return (
        topk.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("doc_id").alias("top1_doc_id"), F.round("cos_sim", 6).alias("top1_cos"))
    )
