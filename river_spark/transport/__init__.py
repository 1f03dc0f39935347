from river_spark.transport.log import StreamLog
from river_spark.transport.reader import StreamReader
from river_spark.transport.writer import StreamWriter

__all__ = ["StreamLog", "StreamReader", "StreamWriter"]
