"""Operator modules — importing this package populates the query registry."""

from ssafynews_data_spark.operators import (  # noqa: F401
    bucketing,
    contamination,
    curation_blocks,
    dedup,
    enrichment,
    grouped_pandas,
    merge,
    multimodal,
    relational,
    relational2,
    relational3,
    sampling,
    similarity,
    skew,
    sqlapi,
    stateful,
    streaming_queries,
    text,
    textstats,
    vectors,
)
