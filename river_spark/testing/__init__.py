"""Test doubles usable from both pytest and the driver-gate queries."""

from river_spark.testing.mini_redis import MiniRedisServer  # noqa: F401
