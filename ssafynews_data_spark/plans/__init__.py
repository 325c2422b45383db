"""Composite pipelines — importing populates the query registry."""

from ssafynews_data_spark.plans import curate, daily_report, preprocess  # noqa: F401
