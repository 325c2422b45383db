"""S2/S7-family as a REAL Spark data *sink*: the Python DataSource
writer API (Spark 4), completing the custom-connector story that
``feed_datasource`` opened on the read side.

The reference publishes JSON messages to Kafka from a driver-side loop
(collect/producer.py:50) — the Spark-native shape is a writer data
source: each task serializes its partition to a uniquely-named part
file, the DRIVER commits the batch by writing a manifest naming exactly
the files that belong to it (two-phase commit: task files are invisible
until the driver manifest lands), and aborts delete orphans.  Readers
that honor the manifest get all-or-nothing batches; retried streaming
batches overwrite their manifest idempotently, so at-least-once
execution composes to effectively-once output — the same contract as
the engine's foreachBatch upsert sink, expressed as a reusable format.

Local-path semantics here (the test image has no object store); at
scale ``path`` is shared storage and nothing else changes.  Classes
live in the package because Python workers unpickle them by module
path.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class PartFileCommit(WriterCommitMessage):
    filename: str
    rows: int


def _write_part(path: str, iterator) -> PartFileCommit:
    """Executor side: serialize one partition to a unique part file.
    The unique name means a retried task never clobbers a successful
    attempt — the driver manifest picks the winning attempt."""
    os.makedirs(path, exist_ok=True)
    fname = f"part-{uuid.uuid4().hex}.jsonl"
    n = 0
    with open(os.path.join(path, fname), "w") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict(), default=str, sort_keys=True))
            f.write("\n")
            n += 1
    return PartFileCommit(filename=fname, rows=n)


def _manifest(path: str, name: str, messages) -> None:
    """Driver side: the atomic publish — a manifest naming the batch's
    files (written via temp + rename, the classic commit trick)."""
    body = {
        "files": sorted(m.filename for m in messages),
        "rows": sum(m.rows for m in messages),
    }
    tmp = os.path.join(path, f".{name}.tmp")
    with open(tmp, "w") as f:
        json.dump(body, f)
    os.replace(tmp, os.path.join(path, name))


def _abort(path: str, messages) -> None:
    for m in messages or []:
        if m is None:
            continue
        try:
            os.remove(os.path.join(path, m.filename))
        except FileNotFoundError:
            pass


class JsonlDirWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> PartFileCommit:
        return _write_part(self.path, iterator)

    def commit(self, messages) -> None:
        _manifest(self.path, "_SUCCESS.json", messages)

    def abort(self, messages) -> None:
        _abort(self.path, messages)


class JsonlDirStreamWriter(DataSourceStreamWriter):
    """Streaming flavor: one manifest per epoch.  A retried epoch
    rewrites ``_batch-{id}.json`` over the failed attempt — manifest
    readers see each batch exactly once even under at-least-once
    execution."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> PartFileCommit:
        return _write_part(self.path, iterator)

    def commit(self, messages, batchId: int) -> None:
        _manifest(self.path, f"_batch-{batchId}.json", messages)

    def abort(self, messages, batchId: int) -> None:
        _abort(self.path, messages)


class JsonlDirDataSource(DataSource):
    """``df.write.format("jsonl_dir").option("path", d).save()`` sink —
    batch via ``writer``, streaming via ``streamWriter``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema, overwrite: bool) -> JsonlDirWriter:
        return JsonlDirWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> JsonlDirStreamWriter:
        return JsonlDirStreamWriter(self.options)


def read_manifest_files(path: str) -> tuple[list[str], int]:
    """Manifest-honoring read: the file list + row count the committed
    manifests (batch or per-epoch) actually published."""
    files: list[str] = []
    rows = 0
    for name in sorted(os.listdir(path)):
        if name == "_SUCCESS.json" or (
            name.startswith("_batch-") and name.endswith(".json")
        ):
            with open(os.path.join(path, name)) as f:
                m = json.load(f)
            files.extend(m["files"])
            rows += m["rows"]
    return files, rows


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlDirDataSource)
