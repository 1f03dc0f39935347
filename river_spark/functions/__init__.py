from river_spark.functions.udfs import (
    clickstream_cogroup_fn,
    normalize_text_udf,
    tokenize_udtf,
    weighted_avg_udaf,
)

__all__ = ["clickstream_cogroup_fn", "normalize_text_udf", "tokenize_udtf", "weighted_avg_udaf"]
