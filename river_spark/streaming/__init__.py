from river_spark.streaming.ingest_query import ingest_stream_continuous, ingest_streams

__all__ = ["ingest_stream_continuous", "ingest_streams"]
