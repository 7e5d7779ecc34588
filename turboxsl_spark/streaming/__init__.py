from turboxsl_spark.streaming.sessions import streaming_sessionize

__all__ = ["streaming_sessionize"]
