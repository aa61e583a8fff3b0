"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API):
a partitioned, filter-pushing reader over the events fixture.

This is the modern extension point for sources Spark has no built-in
connector for (internal services, bespoke formats, feature stores).  The
reader demonstrates the three things a scale-correct source must do:

- **Split planning** (`partitions()`): N `InputPartition`s, each
  consuming a disjoint subset of the file's Arrow batches — executors
  read in parallel, no driver materialization.
- **Filter pushdown** (`pushFilters()`): `EqualTo(event_type, v)` is
  absorbed into the reader (applied per Arrow batch at the source,
  before rows ever reach Spark) and removed from the Spark-side plan;
  everything else is returned as unsupported so Spark re-applies it.
- **Arrow-batch emission** (`read()` yields `pyarrow.RecordBatch`):
  columnar transfer, no per-row Python objects.

Timestamps are surfaced as epoch-microsecond BIGINTs (`ts_us`) — the
tz-free wire encoding — and converted to TIMESTAMP by the caller, so the
source contract is independent of the session timezone and of parquet's
NTZ/LTZ flavor drift (the round-4 fixture regression this repo's
`tables.load_table` normalizes).

Maps to the reference's landing-zone ingestion surface
(storage/client.go:67-101) generalized to a pluggable connector.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (DataSource, DataSourceReader, EqualTo,
                                    InputPartition)

N_PARTITIONS = 8
BATCH_ROWS = 4096

SCHEMA = ("event_id bigint, ts_us bigint, user_id bigint, "
          "event_type string, value double, props string")


class EventsDataSource(DataSource):
    """`spark.read.format("events_pyds").option("path", ...)`."""

    @classmethod
    def name(cls) -> str:
        return "events_pyds"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "EventsReader":
        return EventsReader(self.options)


class EventsReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("events_pyds: 'path' option is required")
        self.n_parts = int(options.get("partitions", N_PARTITIONS))
        self.type_eq: str | None = None

    def pushFilters(self, filters):
        for f in filters:
            if (isinstance(f, EqualTo) and tuple(f.attribute) == ("event_type",)
                    and isinstance(f.value, str) and self.type_eq is None):
                self.type_eq = f.value
            else:
                yield f  # unsupported -> Spark re-applies it

    def partitions(self):
        # CONSUME-ONCE: one reader instance serves every query derived
        # from the same load(), and Spark only calls pushFilters() on
        # plans that HAVE filters — so an absorbed filter left on the
        # reader would silently leak into a later unfiltered query on
        # the same DataFrame.  Binding the filter into this plan's
        # InputPartition values and clearing it here scopes the pushdown
        # to exactly the planning pass that requested it (the sequence
        # per query is pushFilters? -> partitions -> read).
        type_eq, self.type_eq = self.type_eq, None
        return [InputPartition((i, type_eq)) for i in range(self.n_parts)]

    def read(self, partition) -> Iterator:
        """Yield this split's Arrow batches: batch i belongs to split
        (i mod n_parts) — streaming iteration, never a full-file read."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        split, type_eq = partition.value
        pf = pq.ParquetFile(self.path)
        for i, batch in enumerate(pf.iter_batches(batch_size=BATCH_ROWS)):
            if i % self.n_parts != split:
                continue
            tbl = pa.Table.from_batches([batch])
            if type_eq is not None:
                tbl = tbl.filter(pc.equal(tbl["event_type"], type_eq))
            out = pa.table({
                "event_id": tbl["event_id"].cast(pa.int64()),
                "ts_us": tbl["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "user_id": tbl["user_id"].cast(pa.int64()),
                "event_type": tbl["event_type"].cast(pa.string()),
                "value": tbl["value"].cast(pa.float64()),
                "props": tbl["props"].cast(pa.string()),
            })
            yield from out.to_batches()


def register(spark) -> None:
    """Idempotent registration of the custom source."""
    spark.dataSource.register(EventsDataSource)


# ---------------------------------------------------------------------------
# Custom STREAMING Python Data Source: micro-batch replay with real
# offset management (initialOffset / latestOffset / partitions / commit)
# — the full streaming-connector contract a Kafka/queue source
# implements, here replaying the events fixture in file order.

from pyspark.sql.datasource import DataSourceStreamReader

STREAM_ROWS_PER_TRIGGER = 2500
STREAM_PARTS = 4


class EventsStreamDataSource(DataSource):
    """`spark.readStream.format("events_stream_pyds")`."""

    @classmethod
    def name(cls) -> str:
        return "events_stream_pyds"

    def schema(self) -> str:
        return SCHEMA

    def streamReader(self, schema) -> "EventsStreamReader":
        return EventsStreamReader(self.options)


class EventsStreamReader(DataSourceStreamReader):
    """Offsets are row positions in file order: each trigger advances the
    watermark-free high offset by ``rowsPerTrigger`` until the fixture is
    exhausted, then the stream idles (completion is observed from the
    sink, as with the rate-replay source).  Each micro-batch's row range
    splits into ``STREAM_PARTS`` contiguous sub-ranges read in parallel
    on executors as Arrow batches."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("events_stream_pyds: 'path' option is required")
        self.rows_per_trigger = int(
            options.get("rowsPerTrigger", STREAM_ROWS_PER_TRIGGER))
        self.n_parts = int(options.get("partitions", STREAM_PARTS))
        import pyarrow.parquet as pq
        self.total = pq.ParquetFile(self.path).metadata.num_rows
        self._pos = 0

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        self._pos = min(self._pos + self.rows_per_trigger, self.total)
        return {"row": self._pos}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["row"], end["row"]
        if hi <= lo:
            return [InputPartition((lo, lo))]
        step = max(1, -(-(hi - lo) // self.n_parts))
        return [InputPartition((p, min(p + step, hi)))
                for p in range(lo, hi, step)]

    def commit(self, end: dict) -> None:
        pass  # replay source: nothing to acknowledge upstream

    def read(self, partition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq
        lo, hi = partition.value
        if hi <= lo:
            return
        pf = pq.ParquetFile(self.path)
        seen = 0
        for batch in pf.iter_batches(batch_size=BATCH_ROWS):
            b_lo, b_hi = seen, seen + batch.num_rows
            seen = b_hi
            if b_hi <= lo:
                continue
            if b_lo >= hi:
                break
            s, e = max(lo, b_lo) - b_lo, min(hi, b_hi) - b_lo
            tbl = pa.Table.from_batches([batch.slice(s, e - s)])
            out = pa.table({
                "event_id": tbl["event_id"].cast(pa.int64()),
                "ts_us": tbl["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "user_id": tbl["user_id"].cast(pa.int64()),
                "event_type": tbl["event_type"].cast(pa.string()),
                "value": tbl["value"].cast(pa.float64()),
                "props": tbl["props"].cast(pa.string()),
            })
            yield from out.to_batches()


def register_stream(spark) -> None:
    spark.dataSource.register(EventsStreamDataSource)


# ---------------------------------------------------------------------------
# Custom Python Data Source WRITER: executor-parallel shard writes with
# the two-phase commit protocol (write -> WriterCommitMessage -> driver
# commit/abort) — the contract that makes a distributed sink atomic:
# shards land under a staging name and only the driver's commit() makes
# them visible via the manifest; abort() removes every staged shard.

import json as _json
import os as _os
import uuid as _uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclass
class _ShardCommit(WriterCommitMessage):
    filename: str
    n_rows: int


class JsonShardDataSource(DataSource):
    """`df.write.format("json_shards").option("path", dir).save()`:
    JSON-lines shards + an atomically-committed MANIFEST.json."""

    @classmethod
    def name(cls) -> str:
        return "json_shards"

    def writer(self, schema, overwrite: bool) -> "JsonShardWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("json_shards: 'path' option is required")
        return JsonShardWriter(path, [f.name for f in schema.fields])


class JsonShardWriter(DataSourceWriter):
    def __init__(self, path: str, columns: list):
        self.path = path
        self.columns = columns

    def write(self, iterator) -> _ShardCommit:
        """Executor side: stream this partition's rows into one staged
        shard (never buffered whole) and report it to the driver."""
        _os.makedirs(self.path, exist_ok=True)
        fname = f"_staged-{_uuid.uuid4().hex}.jsonl"
        n = 0
        with open(_os.path.join(self.path, fname), "w") as fh:
            for row in iterator:
                fh.write(_json.dumps(
                    {c: row[i] for i, c in enumerate(self.columns)},
                    default=str) + "\n")
                n += 1
        return _ShardCommit(filename=fname, n_rows=n)

    def commit(self, messages) -> None:
        """Driver side: rename every staged shard into place, then write
        the manifest LAST — readers treat the manifest as the commit
        mark, so a crash anywhere before it leaves no visible output."""
        shards = []
        for m in messages:
            final = m.filename.replace("_staged-", "part-")
            _os.rename(_os.path.join(self.path, m.filename),
                       _os.path.join(self.path, final))
            shards.append({"file": final, "n_rows": m.n_rows})
        manifest = {"shards": sorted(shards, key=lambda s: s["file"]),
                    "n_rows": sum(s["n_rows"] for s in shards)}
        with open(_os.path.join(self.path, "MANIFEST.json"), "w") as fh:
            _json.dump(manifest, fh, indent=1)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                _os.remove(_os.path.join(self.path, m.filename))
            except OSError:
                pass


def register_writer(spark) -> None:
    spark.dataSource.register(JsonShardDataSource)
