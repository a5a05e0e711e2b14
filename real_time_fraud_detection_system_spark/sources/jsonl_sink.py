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

  * every TASK writes its rows to
    ``<path>/.staging/<writer-run-id>/<uuid>.jsonl`` and returns the
    filename in its commit message -- a re-tried task stages a second
    file but only the message that reaches commit() wins. Staging is
    NAMESPACED per writer run, so a concurrent writer (second query,
    straggling speculative task of another run) never has its staged
    files swept by this run's commit;
  * commit(messages, batchId) renames the winning staged files into
    ``<path>/batch=<batchId>/`` and stamps ``_SUCCESS`` there -- rename
    is atomic per file, and the marker makes half-moved batches
    detectable;
  * a REPLAYED batch whose PREVIOUS attempt fully committed (marker
    present -- Spark crashed after our commit but before writing its
    own checkpoint commit log) is detected and this attempt's staged
    files are discarded: readers that honor the marker see each batch
    EXACTLY once, never the previous attempt's rows plus ours;
  * a replayed batch whose previous attempt half-moved (dir exists, no
    marker) is cleared and redone;
  * abort() deletes the attempt's staged files; a crashed run's whole
    staging namespace is swept once it is older than
    ``STALE_STAGING_SECONDS`` (age-gated so live concurrent runs are
    never touched).

Batch mode appends into ``<path>/data/``; its ``_SUCCESS`` marker
accumulates the directory's total row count across appends (not just
the newest write), and the move is idempotent under driver-side commit
retry (a winner already renamed into dest is not re-counted, and its
missing staged source is not an error).

Readers: ``spark.read.json("<path>/batch=*/*.jsonl")`` (or any JSONL
consumer). Values serialize via json.dumps with default=str (timestamps
render ISO-ish via str()), sort_keys for byte-stable rows.
"""

from __future__ import annotations

import json
import os
import shutil
import time
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

# a staging namespace untouched for this long belongs to a dead run and
# is swept; a live run's micro-batches commit orders of magnitude faster
STALE_STAGING_SECONDS = 6 * 3600


class _Staged(WriterCommitMessage):
    """Commit message: carries the staging NAMESPACE alongside the
    filename, because the Python streaming sink API re-instantiates the
    writer on each worker (a driver-side uuid does not survive to the
    tasks) -- the message is the single source of truth for where this
    task staged its file."""

    def __init__(self, ns: str, filename: str, n_rows: int):
        self.ns = ns
        self.filename = filename
        self.n_rows = n_rows


def _stage_rows(path: str, run_ns: str, iterator) -> _Staged:
    staging = os.path.join(path, ".staging", run_ns)
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
    return _Staged(run_ns, name, n)


def _discard_staged(path: str, messages) -> None:
    staging = os.path.join(path, ".staging")
    own = set()
    for m in messages:
        if m is not None:
            own.add(m.ns)
            try:
                os.remove(os.path.join(staging, m.ns, m.filename))
            except OSError:
                pass
    _cleanup_namespaces(path, own)


def _cleanup_namespaces(path: str, own: set) -> None:
    """Remove this commit's (now-empty) staging namespaces, then sweep
    SIBLING namespaces whose newest content is older than the staleness
    gate (crashed runs) -- never a live concurrent run's fresh files."""
    root = os.path.join(path, ".staging")
    for ns in own:
        try:
            os.rmdir(os.path.join(root, ns))
        except OSError:
            pass
    cutoff = time.time() - STALE_STAGING_SECONDS
    try:
        siblings = os.listdir(root)
    except OSError:
        return
    for d in siblings:
        if d in own:
            continue
        p = os.path.join(root, d)
        try:
            newest = max(
                (os.path.getmtime(os.path.join(p, f))
                 for f in os.listdir(p)),
                default=os.path.getmtime(p),
            )
            if newest < cutoff:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            continue  # raced with its owner: leave it alone


def _move_staged(path: str, messages, dest_dir: str) -> int:
    """Rename winning staged files into dest_dir. Idempotent under a
    driver-side commit retry: a winner already sitting in dest_dir (its
    staged source gone) is skipped and NOT re-counted. Returns rows
    newly moved by THIS call. Sweeps only this commit's namespaces."""
    staging = os.path.join(path, ".staging")
    os.makedirs(dest_dir, exist_ok=True)
    total = 0
    own = set()
    winners = set()
    for m in messages:
        if m is None:
            continue
        src = os.path.join(staging, m.ns, m.filename)
        dst = os.path.join(dest_dir, m.filename)
        own.add(m.ns)
        winners.add((m.ns, m.filename))
        if not os.path.exists(src) and os.path.exists(dst):
            continue  # prior commit attempt already moved it
        os.rename(src, dst)
        total += m.n_rows
    # sweep non-winner leftovers in THIS commit's namespaces only
    # (retried tasks whose messages never reached commit)
    for ns in own:
        try:
            leftovers = os.listdir(os.path.join(staging, ns))
        except OSError:
            leftovers = []
        for f in leftovers:
            if (ns, f) not in winners:
                try:
                    os.remove(os.path.join(staging, ns, f))
                except OSError:
                    pass
    _cleanup_namespaces(path, own)
    return total


class _JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlsink requires option 'path'")
        # per-INSTANCE namespace: the streaming sink API re-creates the
        # writer on each worker, so different tasks may stage under
        # different namespaces -- the commit message carries which one
        self.run_ns = uuid.uuid4().hex

    def write(self, iterator):
        return _stage_rows(self.path, self.run_ns, iterator)

    def commit(self, messages, batchId: int) -> None:
        dest = os.path.join(self.path, f"batch={batchId}")
        marker = os.path.join(dest, "_SUCCESS")
        if os.path.exists(marker):
            # the classic exactly-once crash window: a prior attempt
            # fully committed (files moved, marker stamped) but Spark
            # died before writing its checkpoint commit log, so the
            # batch replays. The committed files are the batch; this
            # attempt's staged duplicates are discarded.
            _discard_staged(self.path, messages)
            return
        if os.path.isdir(dest):
            # replay of a half-committed attempt: clear and redo
            shutil.rmtree(dest, ignore_errors=True)
        n = _move_staged(self.path, messages, dest)
        with open(marker, "w") as fh:
            fh.write(str(n))

    def abort(self, messages, batchId: int) -> None:
        _discard_staged(self.path, messages)


class _JsonlBatchWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlsink requires option 'path'")
        self.overwrite = overwrite
        self.run_ns = uuid.uuid4().hex

    def write(self, iterator):
        return _stage_rows(self.path, self.run_ns, iterator)

    def commit(self, messages) -> None:
        dest = os.path.join(self.path, "data")
        marker = os.path.join(dest, "_SUCCESS")
        if self.overwrite and os.path.isdir(dest):
            # driver-side commit retry guard (the streaming writer's
            # _SUCCESS check, adapted to overwrite): if every winner's
            # staged source is gone AND its destination file exists, a
            # prior attempt already finished the move -- rmtree here
            # would delete the winners and the re-move would crash on
            # the vanished sources, losing the batch. Treat the
            # overwrite as already done and fall through to the
            # (idempotent) _move_staged + marker rewrite.
            staging = os.path.join(self.path, ".staging")
            winners = [m for m in messages if m is not None]
            done = bool(winners) and all(
                not os.path.exists(os.path.join(staging, m.ns, m.filename))
                and os.path.exists(os.path.join(dest, m.filename))
                for m in winners
            )
            if not done:
                shutil.rmtree(dest, ignore_errors=True)
        prior = 0
        if not self.overwrite and os.path.exists(marker):
            # append mode: the marker carries the DIRECTORY's total row
            # count, so accumulate rather than overwrite with only the
            # newest write's count
            try:
                with open(marker) as fh:
                    prior = int(fh.read().strip() or 0)
            except (OSError, ValueError):
                prior = 0
        n = _move_staged(self.path, messages, dest)
        if self.overwrite:
            # retry-safe total: _move_staged returns only NEWLY moved
            # rows (0 on a retry of a completed attempt), but in
            # overwrite mode the directory's content IS the winners
            n = sum(m.n_rows for m in messages if m is not None)
        with open(marker, "w") as fh:
            fh.write(str(prior + n))

    def abort(self, messages) -> None:
        _discard_staged(self.path, messages)


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
