"""Ingest-edge sources (SURVEY.md §2.1 S1, S11, §2.7 D1).

S1: the reference polls 29 RSS feeds with feedparser
(collect/producer.py:20,60-89) and projects 5 fields per entry
(:36-48).  The engine ingests *parsed entry dicts* (feedparser itself is
an HTTP client, not a data-processing concern — and isn't in the test
image; gate the import) into an ARTICLE_WIRE DataFrame, applying the
producer's sliding-window link dedup (D1, producer.py:7-15) as
``dropDuplicates``.

S11: the daily job's archive move (webhdfs rename realtime→news_archive,
spark_daily_report.py:285-293) as a filesystem-agnostic rename through
the Hadoop FileSystem API — works on HDFS/S3A/local alike.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession

from ssafynews_data_spark.localframe import local_df
from ssafynews_data_spark.schemas import ARTICLE_WIRE

WIRE_FIELDS = tuple(f.name for f in ARTICLE_WIRE.fields)


def entries_to_frame(
    spark: SparkSession, entries: Iterable[Mapping[str, str]]
) -> DataFrame:
    """S1+P1+D1: project the 5 wire fields from feed entries (missing →
    null, like .get in producer.py:42-48) and dedup by link keep-first."""
    rows = [tuple(e.get(f) for f in WIRE_FIELDS) for e in entries]
    df = local_df(spark, rows, ARTICLE_WIRE)
    return df.dropDuplicates(["link"])


def parse_feeds(spark: SparkSession, urls: Iterable[str]) -> DataFrame:
    """Real S1 provider: fetch + parse each feed URL with feedparser.
    Network boundary — excluded from tests (the mock path is
    ``entries_to_frame`` on fixture dicts)."""
    try:  # pragma: no cover - feedparser absent in the test image
        import feedparser
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "feedparser not installed; use entries_to_frame with parsed dicts"
        ) from e
    entries = []  # pragma: no cover
    for url in urls:  # pragma: no cover
        entries.extend(dict(e) for e in feedparser.parse(url).entries)
    return entries_to_frame(spark, entries)  # pragma: no cover


def archive_files(spark: SparkSession, src_dir: str, dst_dir: str) -> int:
    """S11: move every file from src_dir to dst_dir via the Hadoop
    FileSystem API (the engine form of the webhdfs rename loop,
    spark_daily_report.py:285-293).  Returns the number of files moved.

    Rename is a metadata op on HDFS (O(1) per file); on object stores it
    is copy+delete — at scale prefer partition-level moves."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path_cls = jvm.org.apache.hadoop.fs.Path
    src = path_cls(src_dir)
    fs = src.getFileSystem(conf)
    dst = path_cls(dst_dir)
    if not fs.exists(dst):
        fs.mkdirs(dst)
    moved = 0
    for status in fs.listStatus(src):
        if status.isFile():
            name = status.getPath().getName()
            if fs.rename(status.getPath(), path_cls(dst_dir + "/" + name)):
                moved += 1
    return moved
