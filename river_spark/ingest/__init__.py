from river_spark.ingest.ingester import IngestResult, StreamIngester
from river_spark.ingest.settings import IngesterSettings, StreamIngestionSettings

__all__ = ["IngestResult", "StreamIngester", "IngesterSettings", "StreamIngestionSettings"]
