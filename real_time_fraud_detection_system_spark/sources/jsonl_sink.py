"""Custom Python DataSource WRITER (Spark 4 API): a newline-delimited
JSON directory sink with staged-file commit semantics, usable as
``df.write.format("jsonlsink")`` and
``stream.writeStream.format("jsonlsink")``.

This is the reference's row-append prediction sink (SURVEY S5,
services/fraud_service/app/main.py:150-170 inserting scored rows) as a
FIRST-CLASS sink format instead of a foreachBatch closure -- the same
role streaming/pipeline.py's prediction_sink_writer plays, re-expressed
through the DataSource writer API so third-party tooling can target it
by name.

Exactly-once discipline (the parquet-sink posture, hand-rolled because
this sink owns its own format):

  * every TASK writes its rows to ``<path>/.staging/<uuid>.jsonl`` and
    returns the filename in its commit message -- a re-tried task
    stages a second file but only the message that reaches commit()
    wins;
  * commit(messages, batchId) renames the winning staged files into
    ``<path>/batch=<batchId>/`` and stamps ``_SUCCESS`` there -- rename
    is atomic per file, and the marker makes half-moved batches
    detectable;
  * a REPLAYED batch (checkpoint says unfinished, but a previous
    attempt already moved files) finds its batch dir without _SUCCESS,
    clears it, and moves the fresh attempt's files -- so readers that
    honor the marker see each batch exactly once;
  * abort() deletes the attempt's staged files; stale staging left by
    a crash (no message survived) is swept by the next commit.

Readers: ``spark.read.json("<path>/batch=*/*.jsonl")`` (or any JSONL
consumer). Values serialize via json.dumps with default=str (timestamps
render ISO-ish via str()), sort_keys for byte-stable rows.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

try:  # pyspark >= 4
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        DataSourceWriter,
        WriterCommitMessage,
    )
except ImportError:  # pragma: no cover - older pyspark
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceStreamWriter = object  # type: ignore[assignment,misc]
    DataSourceWriter = object  # type: ignore[assignment,misc]
    WriterCommitMessage = object  # type: ignore[assignment,misc]


class _Staged(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


def _stage_rows(path: str, iterator) -> _Staged:
    staging = os.path.join(path, ".staging")
    os.makedirs(staging, exist_ok=True)
    name = f"{uuid.uuid4().hex}.jsonl"
    tmp = os.path.join(staging, name)
    n = 0
    with open(tmp, "w") as fh:
        for row in iterator:
            fh.write(
                json.dumps(
                    row.asDict(recursive=True), default=str, sort_keys=True
                )
            )
            fh.write("\n")
            n += 1
    return _Staged(name, n)


def _move_staged(path: str, messages, dest_dir: str) -> int:
    staging = os.path.join(path, ".staging")
    os.makedirs(dest_dir, exist_ok=True)
    total = 0
    winners = set()
    for m in messages:
        if m is None:
            continue
        os.rename(
            os.path.join(staging, m.filename),
            os.path.join(dest_dir, m.filename),
        )
        winners.add(m.filename)
        total += m.n_rows
    # sweep stale staging (crashed attempts whose messages never
    # reached a commit) -- nothing else writes here
    for f in os.listdir(staging):
        if f not in winners:
            try:
                os.remove(os.path.join(staging, f))
            except OSError:
                pass
    return total


class _JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlsink requires option 'path'")

    def write(self, iterator):
        return _stage_rows(self.path, iterator)

    def commit(self, messages, batchId: int) -> None:
        dest = os.path.join(self.path, f"batch={batchId}")
        marker = os.path.join(dest, "_SUCCESS")
        if os.path.isdir(dest) and not os.path.exists(marker):
            # replay of a half-committed attempt: clear and redo
            shutil.rmtree(dest, ignore_errors=True)
        n = _move_staged(self.path, messages, dest)
        with open(marker, "w") as fh:
            fh.write(str(n))

    def abort(self, messages, batchId: int) -> None:
        staging = os.path.join(self.path, ".staging")
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(staging, m.filename))
                except OSError:
                    pass


class _JsonlBatchWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlsink requires option 'path'")
        self.overwrite = overwrite

    def write(self, iterator):
        return _stage_rows(self.path, iterator)

    def commit(self, messages) -> None:
        dest = os.path.join(self.path, "data")
        if self.overwrite and os.path.isdir(dest):
            shutil.rmtree(dest, ignore_errors=True)
        n = _move_staged(self.path, messages, dest)
        with open(os.path.join(dest, "_SUCCESS"), "w") as fh:
            fh.write(str(n))

    def abort(self, messages) -> None:
        staging = os.path.join(self.path, ".staging")
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(staging, m.filename))
                except OSError:
                    pass


class JsonlSinkDataSource(DataSource):
    """format("jsonlsink").option("path", dir): staged-commit JSONL
    directory sink, batch and streaming."""

    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def writer(self, schema, overwrite: bool):
        return _JsonlBatchWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return _JsonlStreamWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
