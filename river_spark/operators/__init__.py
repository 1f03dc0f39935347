from river_spark.operators.asof import asof_join
from river_spark.operators.dedup import (
    cosine_dedup,
    minhash_dedup,
    simhash_pairs,
    simhash_signatures,
)
from river_spark.operators.multimodal import (
    decode_image_features,
    sample_frames,
    with_payload_metadata,
)
from river_spark.operators.similarity import brute_force_topk, lsh_topk

__all__ = [
    "asof_join",
    "brute_force_topk",
    "cosine_dedup",
    "decode_image_features",
    "lsh_topk",
    "minhash_dedup",
    "sample_frames",
    "simhash_pairs",
    "simhash_signatures",
    "with_payload_metadata",
]
