"""Test doubles usable from both pytest and the driver-gate queries."""

from river_spark.testing.mini_redis import MiniRedisServer  # noqa: F401
from river_spark.testing.real_redis import redis_server_binary, spawn_redis_server  # noqa: F401
