from river_spark.sources.river_source import RiverDataSource, register

__all__ = ["RiverDataSource", "register"]
