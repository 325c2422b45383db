"""S1 as a REAL Spark data source: the Python DataSource API (Spark 4).

The reference polls RSS feeds in a driver-side loop
(collect/producer.py:20,60-89).  The Spark-native shape is a custom
batch source: one input partition per feed, so a 29-feed poll is 29
parallel tasks on executors rather than a sequential driver loop — and
the result is a plain DataFrame that composes with every downstream
operator (dedup, enrichment, sinks).

The fetch itself is deterministic and offline here (the test image has
no network/feedparser); the partition-planning, option handling, and
per-partition iteration — the parts that ARE Spark's concern — are
real.  A production deployment swaps ``_entries_for_feed`` for a
feedparser call without touching the source contract.

Classes live in the package (not a test module) because Python workers
unpickle them by module path.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: wire-field order must match schemas.ARTICLE_WIRE.
_FIELDS = ("author", "link", "summary", "title", "updated")


def _entries_for_feed(feed_idx: int, n_entries: int) -> Iterator[tuple]:
    """Deterministic stand-in for one feed's parsed entries."""
    for j in range(n_entries):
        yield (
            f"author-{feed_idx % 7}",
            f"https://feed{feed_idx}.example.com/item/{j}",
            f"summary of feed {feed_idx} item {j}",
            f"feed {feed_idx} headline {j}",
            f"2025-06-{(j % 28) + 1:02d}T0{feed_idx % 10}:00:00",
        )


class FeedInputPartition(InputPartition):
    def __init__(self, feed_idx: int, n_entries: int):
        self.feed_idx = feed_idx
        self.n_entries = n_entries


class FeedReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_feeds = int(options.get("feeds", "4"))
        self.n_entries = int(options.get("entriesperfeed", "25"))
        self._author_filter: str | None = None

    def pushFilters(self, filters):  # noqa: N802 - Spark API name
        """Source-level filter pushdown (Spark 4.1 DataSource API): an
        ``author = 'author-K'`` equality prunes which FEEDS are fetched
        at all (author is feed_idx % 7 in this fixture — production
        feeds are keyed by publisher the same way).  Every other filter
        is yielded back, telling Spark to keep applying it post-scan —
        a source must only absorb what it fully honors."""
        from pyspark.sql.datasource import EqualTo

        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("author",)
                and isinstance(f.value, str)
            ):
                self._author_filter = f.value
            else:
                yield f

    def partitions(self) -> list[InputPartition]:
        # one partition per feed — the unit of parallel fetch; a pushed
        # author filter prunes feeds BEFORE any task is scheduled
        idxs = range(self.n_feeds)
        if self._author_filter is not None:
            idxs = [i for i in idxs if f"author-{i % 7}" == self._author_filter]
        return [FeedInputPartition(i, self.n_entries) for i in idxs]

    def read(self, partition: FeedInputPartition) -> Iterator[tuple]:
        return _entries_for_feed(partition.feed_idx, partition.n_entries)


class FeedStreamReader(SimpleDataSourceStreamReader):
    """The reference's poll-every-N-minutes producer loop
    (collect/producer.py:60-89) as a STREAMING source: each micro-batch
    is one poll cycle over all feeds.  Offsets are the poll counter, so
    recovery replays deterministically (``readBetweenOffsets``) — the
    property the reference's at-most-once loop lacked.

    ``max_polls`` bounds the demo source; past it ``read`` returns no
    rows and an unchanged offset, so ``processAllAvailable`` terminates.
    """

    def __init__(self, options: dict):
        self.n_feeds = int(options.get("feeds", "4"))
        self.n_entries = int(options.get("entriesperfeed", "25"))
        self.max_polls = int(options.get("maxpolls", "3"))

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def _rows_for_poll(self, poll: int) -> list[tuple]:
        rows = []
        for i in range(self.n_feeds):
            for r in _entries_for_feed(i, self.n_entries):
                # poll-specific links model fresh entries per cycle
                rows.append(r[:1] + (f"{r[1]}?poll={poll}",) + r[2:])
        return rows

    def read(self, start: dict):
        poll = start["poll"]
        if poll >= self.max_polls:
            return iter([]), start
        return iter(self._rows_for_poll(poll)), {"poll": poll + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows: list[tuple] = []
        for poll in range(start["poll"], end["poll"]):
            rows.extend(self._rows_for_poll(poll))
        return iter(rows)


class FeedDataSource(DataSource):
    """``spark.read.format("news_feed").option("feeds", N)`` source —
    batch via ``reader``, streaming via ``simpleStreamReader``."""

    @classmethod
    def name(cls) -> str:
        return "news_feed"

    def schema(self) -> str:
        return ", ".join(f"{f} string" for f in _FIELDS)

    def reader(self, schema) -> FeedReader:
        return FeedReader(self.options)

    def simpleStreamReader(self, schema) -> FeedStreamReader:
        return FeedStreamReader(self.options)


def register_feed_source(spark) -> None:
    spark.dataSource.register(FeedDataSource)
