from river_spark.functions.udfs import (
    clickstream_cogroup_fn,
    payload_stats_arrow_fn,
    normalize_text_udf,
    tokenize_udtf,
    weighted_avg_udaf,
)

__all__ = ["clickstream_cogroup_fn", "normalize_text_udf", "payload_stats_arrow_fn", "tokenize_udtf", "weighted_avg_udaf"]
