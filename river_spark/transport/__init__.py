from river_spark.transport.backend import MemoryBackend, StorageBackend
from river_spark.transport.log import FileBackend, StreamLog
from river_spark.transport.reader import StreamReader
from river_spark.transport.redis_backend import RedisBackend
from river_spark.transport.writer import StreamWriter

__all__ = [
    "FileBackend",
    "MemoryBackend",
    "RedisBackend",
    "StorageBackend",
    "StreamLog",
    "StreamReader",
    "StreamWriter",
]
