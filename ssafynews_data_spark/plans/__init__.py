"""Composite pipelines — importing populates the query registry."""

from ssafynews_data_spark.plans import (  # noqa: F401
    curate,
    daily_report,
    pipeline,
    preprocess,
)
