"""ssafynews_data_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of
the reference pipeline ``Yoo-SeungHyeon/SSAFYNEWS-Data`` (a Korean news
ETL + analytics stack: Kafka ingest, streaming enrichment, daily Spark
batch analytics — see ``SURVEY.md``), extended with the operators a
large-scale (100 TB) training-data pipeline needs: deduplication,
similarity search, text analysis, and multimodal column plumbing.

Design rules (see SURVEY.md §7):

- DataFrame/SQL API only; Catalyst picks the physical plan.
- Operators are pure ``DataFrame -> DataFrame`` functions — no I/O inside
  operators; sources/sinks live in :mod:`ssafynews_data_spark.sources`.
- Explicit schemas everywhere (:mod:`ssafynews_data_spark.schemas`) —
  schema inference on 100 TB of JSON is a full extra pass.
- UDFs are the slow path: built-in ``pyspark.sql.functions`` first,
  Arrow-vectorized ``pandas_udf`` when Python is unavoidable, never
  row-at-a-time UDFs in a hot path.
"""

from ssafynews_data_spark.session import get_session, session_builder

__all__ = ["get_session", "session_builder"]
__version__ = "0.1.0"
