from river_spark.functions.udfs import (
    normalize_text_udf,
    tokenize_udtf,
    weighted_avg_udaf,
)

__all__ = ["normalize_text_udf", "tokenize_udtf", "weighted_avg_udaf"]
