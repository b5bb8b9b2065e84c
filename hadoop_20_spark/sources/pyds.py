"""Custom Python DataSource (Spark 4 DataSource API) — the real
"write your own InputFormat" surface.

The reference's custom-scan extension point is an InputFormat subclass:
``getSplits`` partitions the work, ``getRecordReader`` yields records
per split (mapred/FileInputFormat.java#getSplits,
ex/terasort/TeraGen.java drives one with synthetic splits).  Spark's
Python DataSource API is the same contract — ``partitions()`` are the
splits, ``read(partition)`` is the record reader — so we implement the
TeraGen generator as a REAL registered source: deterministic rows,
arbitrary parallelism, no input files.

Rows are bit-identical to :func:`hadoop_20_spark.sources.teragen` (the
expression-based generator): ``key = md5('tera_'||id)[:10]``, payload =
``md5('pa_'||id) || md5('pb_'||id)`` right-padded to 90 with 'X' —
hashlib and Spark's ``md5()`` agree on hex digests, so the two
implementations are mutually checkable (asserted in
tests/test_interop.py::test_teragen_datasource_matches_expression).

Usage::

    spark.dataSource.register(TeraGenDataSource)
    df = (spark.read.format("teragen")
          .option("rows", 100000).option("partitions", 32).load())
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class _RangePartition(InputPartition):
    """One split: a half-open id range [start, end) — the getSplits
    analog (block-aligned ranges, no data locality needed for a
    generator)."""

    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _TeraGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("partitions", 8)))

    def partitions(self) -> list[_RangePartition]:
        if self.n_rows <= 0:
            # an empty list makes Spark call read(None); always hand the
            # reader a real (empty) split instead
            return [_RangePartition(0, 0)]
        step = -(-self.n_rows // self.n_parts)  # ceil div
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            sid = str(i)
            key = hashlib.md5(f"tera_{sid}".encode()).hexdigest()[:10]
            payload = (
                hashlib.md5(f"pa_{sid}".encode()).hexdigest()
                + hashlib.md5(f"pb_{sid}".encode()).hexdigest()
            ).ljust(90, "X")
            yield (i, key, payload)


class TeraGenDataSource(DataSource):
    """``spark.read.format("teragen")`` — registered custom source."""

    @classmethod
    def name(cls) -> str:
        return "teragen"

    def schema(self) -> str:
        return "id bigint, key string, payload string"

    def reader(self, schema) -> _TeraGenReader:
        return _TeraGenReader(self.options)


# --- custom sink: the commit-protocol showcase ------------------------------
#
# FileOutputCommitter's contract (mapred/FileOutputCommitter.java): tasks
# write to an attempt-scoped location, task commit publishes a message,
# JOB commit makes the output visible atomically; a failed job aborts and
# leaves nothing visible.  The Python DataSourceWriter is that exact
# protocol: write() runs per task and returns a WriterCommitMessage,
# commit(messages) runs once on the driver with every task's message,
# abort() on failure.  ChecksumSinkDataSource materializes the protocol
# observably: each task reports (rows, checksum); job commit writes ONE
# manifest file with the totals — so partial/duplicate task output can
# never surface (speculative/retried tasks' messages are de-duplicated
# by Spark before commit()).

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclass
class _TaskChecksum(WriterCommitMessage):
    rows: int
    checksum: int


class _ChecksumWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.key_col = options.get("key", None)

    def write(self, iterator) -> _TaskChecksum:
        rows = 0
        checksum = 0
        for row in iterator:
            rows += 1
            d = row.asDict()
            v = d[self.key_col] if self.key_col else next(iter(d.values()))
            checksum = (
                checksum
                + int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            ) % (1 << 62)
        return _TaskChecksum(rows=rows, checksum=checksum)

    def commit(self, messages) -> None:
        manifest = {
            "tasks": len(messages),
            "rows": sum(m.rows for m in messages),
            "checksum": sum(m.checksum for m in messages) % (1 << 62),
        }
        parent = os.path.dirname(self.path)
        if parent:  # a bare-filename path has no parent to create
            os.makedirs(parent, exist_ok=True)
        with open(self.path, "w") as f:
            json.dump(manifest, f)

    def abort(self, messages) -> None:
        # Job failed: NO-OP.  This job's manifest was never written (only
        # commit() writes it), so there is nothing of ours to clean up —
        # and the path may hold a PREVIOUS job's committed manifest,
        # which a failed later job must never destroy (FileOutputCommitter
        # abort cleans attempt-scoped temp output only, never prior
        # committed output).
        pass


class ChecksumSinkDataSource(DataSource):
    """``df.write.format("checksum_sink").option("path", ...)`` — counts
    and checksums rows through the task/job commit protocol and
    publishes a single manifest at job commit."""

    @classmethod
    def name(cls) -> str:
        return "checksum_sink"

    def writer(self, schema, overwrite: bool) -> _ChecksumWriter:
        return _ChecksumWriter(self.options)


# --- custom STREAMING source: the tailing-input contract --------------------
#
# The reference's streaming input was an appended HDFS directory tailed
# by periodic jobs (Scribe→HDFS; realtime-HDFS append/hflush,
# hdfs/DFSClient.java#sync).  The Python DataSourceStreamReader is that
# contract made explicit: offsets are the "how far has the log grown"
# cursor, partitions(start, end) are the splits of the available
# range, read(partition) replays it.  EventGenStreamSource emits a
# deterministic, offset-addressed BOUNDED event log (md5-derived, same
# discipline as TeraGen), chunked into rowsPerBatch-sized splits —
# replaying any offset range yields identical rows, which is exactly
# the reprocessing-safety property the reference got from immutable
# appended files, and restarting from a checkpoint emits nothing twice.


class _OffsetRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _gen_event(i: int) -> tuple:
    h = hashlib.md5(f"ev_{i}".encode()).hexdigest()
    user_id = int(h[:8], 16) % 100
    etype = ("view", "click", "purchase")[int(h[8:10], 16) % 3]
    value = round(int(h[10:16], 16) / 1000.0, 3)
    return (i, user_id, etype, value)


class _EventGenStreamReader(DataSourceStreamReader):
    """Offsets must be MONOTONE ACROSS RESTARTS: a fresh reader instance
    has no memory of the checkpoint, so any latestOffset() derived from
    instance state (e.g. "grow per poll") can return a value BELOW the
    checkpointed start after a restart — Spark then plans an inverted
    batch and later re-emits rows the sink already saw.  The safe
    contract for a bounded log: latestOffset() is a pure function of
    the external state (here: the full log length), and parallelism
    comes from partitions() splitting [start, end) — not from rationing
    the frontier."""

    def __init__(self, options: dict):
        self.rows_per_chunk = int(options.get("rowsPerBatch", 100))
        self.max_rows = int(options.get("maxRows", 1000))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        # the whole bounded log is available: restart-safe by
        # construction (never below any previously returned offset)
        return {"offset": self.max_rows}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["offset"], end["offset"]
        if hi <= lo:  # defensive: empty/inverted range -> no splits
            return [_OffsetRange(lo, lo)]
        step = self.rows_per_chunk or 1
        return [
            _OffsetRange(a, min(a + step, hi)) for a in range(lo, hi, step)
        ]

    def read(self, partition: _OffsetRange):
        for i in range(partition.start, partition.end):
            yield _gen_event(i)

    def commit(self, end: dict) -> None:
        # offsets at/under `end` are durable in the checkpoint; nothing
        # to clean up for a generator (a file source would GC here)
        pass


class EventGenStreamSource(DataSource):
    """``spark.readStream.format("eventgen")`` — registered custom
    streaming source with deterministic offset-addressed replay."""

    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def streamReader(self, schema) -> _EventGenStreamReader:
        return _EventGenStreamReader(self.options)
