"""Training-data-pipeline queries (rows-only: genuinely non-SQL ops — the
driver records a weaker rows-only check; exactness is covered by unit
tests against brute-force baselines in tests/test_pipeline_ops.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from river_spark.operators.dedup import cosine_dedup, minhash_dedup, simhash_pairs, simhash_signatures
from river_spark.operators.multimodal import decode_image_features, sample_frames, with_payload_metadata
from river_spark.operators.similarity import lsh_topk
from river_spark.queries.relational import q
from river_spark.queries.tables import tbl


@q("dedup_minhash_lsh", tags=("dedup", "minhash"), bench=True)
def dedup_minhash_lsh(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    return minhash_dedup(docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.3)


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


@q("emb_ann_lsh", tags=("vector", "ann"), bench=True)
def emb_ann_lsh(spark, sf_dir):
    emb = tbl(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return lsh_topk(emb, queries, "vec_id", "embedding", k=10, n_planes=12, probe_hamming=2)


@q("mm_payload_metadata", tags=("multimodal",))
def mm_payload_metadata(spark, sf_dir):
    """Binary-column plumbing over synthetic payloads (documents.text as
    bytes — the container has no real media, SURVEY Part B north-star)."""
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


@q("emb_ann_ivf", tags=("vector", "ann", "ivf"))
def emb_ann_ivf(spark, sf_dir):
    """IVF-partitioned ANN (KMeans cells, n_probes nearest cells scored) —
    the data-adaptive complement to the LSH path."""
    from river_spark.operators.similarity import ivf_topk

    emb = tbl(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(emb, queries, "vec_id", "embedding", k=10, n_lists=16, n_probes=3)
