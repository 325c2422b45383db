from ssafynews_data_spark.streaming.pipeline import (
    daily_tumbling_counts,
    dedup_stream,
    enrichment_stream,
)

__all__ = ["daily_tumbling_counts", "dedup_stream", "enrichment_stream"]
