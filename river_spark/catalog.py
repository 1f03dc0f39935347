"""Catalog integration (A10, cpp/src/redis.cpp:325-362).

The reference's catalog is `SCAN MATCH *-metadata`; here every stream in
a log root can be surfaced to Spark's own catalog as a temp view over the
``river`` DataSource, making `SHOW TABLES` / `spark.catalog.listTables`
the catalog API, and stream user-metadata queryable as table comments.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from river_spark.sources import register
from river_spark.transport.log import is_reserved_stream, locator_option, open_log_root


def register_streams(spark: SparkSession, log_root: str, prefix: str = "river_") -> list[str]:
    """Create one temp view per live stream; returns the view names.
    ``log_root`` is a file root or ``redis://host:port`` (SCAN MATCH
    *-metadata on the wire)."""
    register(spark)
    log = open_log_root(log_root)
    kind, value = locator_option(log_root)
    views = []
    import re

    for name in log.list_streams():
        if is_reserved_stream(name):
            continue  # in-flight sink staging streams are not catalog entries
        # view names must be SQL identifiers; a foreign stream named
        # 'my-stream' would otherwise raise ParseException and abort
        # registration of every remaining stream
        view = prefix + re.sub(r"\W", "_", name)
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
    return open_log_root(log_root).read_metadata(name)
