"""Catalog integration (A10, cpp/src/redis.cpp:325-362).

The reference's catalog is `SCAN MATCH *-metadata`; here every stream in
a log root can be surfaced to Spark's own catalog as a temp view over the
``river`` DataSource, making `SHOW TABLES` / `spark.catalog.listTables`
the catalog API, and stream user-metadata queryable as table comments.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from river_spark.sources import register
from river_spark.transport.log import StreamLog


def _locator_option(log_root: str) -> tuple[str, str]:
    """``redis://host:port`` targets a server (SCAN MATCH *-metadata on
    the wire); anything else is a file log root."""
    if log_root.startswith("redis://"):
        return "redis", log_root[len("redis://"):]
    return "path", log_root


def _open_log(log_root: str) -> StreamLog:
    kind, value = _locator_option(log_root)
    if kind == "redis":
        from river_spark.transport import RedisBackend

        host, _, port = value.rpartition(":")
        return StreamLog(backend=RedisBackend(host or "127.0.0.1", int(port)))
    return StreamLog(value)


def register_streams(spark: SparkSession, log_root: str, prefix: str = "river_") -> list[str]:
    """Create one temp view per live stream; returns the view names.
    ``log_root`` is a file root or ``redis://host:port``."""
    register(spark)
    log = _open_log(log_root)
    kind, value = _locator_option(log_root)
    views = []
    for name in log.list_streams():
        view = prefix + name
        (
            spark.read.format("river")
            .option(kind, value)
            .option("stream", name)
            .load()
            .createOrReplaceTempView(view)
        )
        views.append(view)
    return views


def stream_metadata(log_root: str, name: str) -> dict | None:
    """TBLPROPERTIES-equivalent: the stream's metadata record."""
    return _open_log(log_root).read_metadata(name)
