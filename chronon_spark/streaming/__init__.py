from chronon_spark.streaming.groupby import streaming_tiles

__all__ = ["streaming_tiles"]
