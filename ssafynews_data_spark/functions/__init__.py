from ssafynews_data_spark.functions import strings, udfs

__all__ = ["strings", "udfs"]
