"""river_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of pbotros/river.

The reference (pbotros/river) is a schema'd streaming framework over Redis
Streams plus a Parquet ingester. This package re-expresses that surface
Spark-first:

- ``river_spark.schema``       — the seven-type schema kernel (reference
  ``cpp/src/schema.h:29-37``) with JSON wire-format compatibility and
  converters to/from Spark ``StructType`` and NumPy structured dtypes.
- ``river_spark.transport``    — an append-only segmented stream log
  (writer/reader with read/tail/seek/EOF/tombstone semantics, reference
  ``cpp/src/writer.cpp`` / ``cpp/src/reader.cpp``) backed by local files
  in place of Redis (not available in this environment).
- ``river_spark.ingest``       — stream→Parquet ETL with system columns
  ``sample_index``/``key``/``timestamp_ms``, resume, compaction, retention
  (reference ``cpp/ingester/src/ingester.cpp``).
- ``river_spark.sources``      — Spark 4 Python DataSource exposing the
  stream log to batch and Structured Streaming reads.
- ``river_spark.operators``    — analytics operators Spark lacks natively:
  as-of join, top-k per group, dedup family (exact/MinHash-LSH/SimHash/
  n-gram Jaccard/embedding-cosine), similarity search, text analysis,
  multimodal column plumbing.
- ``river_spark.queries``      — the judged query registry: every operator
  exposed as a (spark_fn, oracle_sql) pair over the driver's test tables.
"""

from river_spark.schema import FieldDefinition, FieldType, StreamSchema
from river_spark.session import get_spark

__all__ = ["FieldDefinition", "FieldType", "StreamSchema", "get_spark"]

__version__ = "0.1.0"
