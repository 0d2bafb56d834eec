"""``rtdl_envelopes`` — a custom Python DataSource (Spark 4 DataSource
API) that generates the reference's message-envelope stream natively.

The reference's ingest service turns arbitrary HTTP JSON into envelope
messages on Kafka (ingest/ingest-service.go:152-258). For development,
tests, and load generation, this source produces the same envelope shape
{stream_id, stream_alt_id, message_type, payload_json} as a first-class
``spark.read.format("rtdl_envelopes")`` — batch and streaming — with:

- deterministic content: row i is a pure function of (seed, i), so any
  two reads of the same options are identical (oracle-friendly, and
  retried tasks regenerate identical data — required for exactly-once);
- real partitioning: ``n_partitions`` InputPartitions generated
  independently, so a 10^9-row load test scales across executors like a
  real source (each task materializes only its slice, nothing on the
  driver);
- a streaming reader with monotonically increasing integer offsets
  (``rows_per_batch`` per micro-batch), the minimal correct offset
  contract (initialOffset/latestOffset/read/commit).

Options: ``seed`` (int, default 42), ``n_rows`` (batch total, default
1000), ``n_partitions`` (default 8), ``stream_id``, ``message_type``
(envelope constants), ``rows_per_batch`` (streaming, default 100).

Register once per session:  spark.dataSource.register(EnvelopeDataSource)
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = (
    "stream_id string, stream_alt_id string, message_type string, "
    "seq bigint, payload_json string"
)


def _row(seed: int, i: int, stream_id: str, message_type: str):
    """Deterministic envelope i. The payload exercises the reference's
    schema-inference branches (primitives + array + nested object,
    README.md:160-168) with seed-dependent values."""
    h = (seed * 1_000_003 + i * 31) % 97
    payload = {
        "type": message_type,
        "name": f"user{i % 50}",
        "value": h + (i % 7) / 10.0,
        "array": [i % 5, (i + 1) % 5],
        "properties": {"age": 18 + (h % 60)},
    }
    return (
        stream_id,
        None,
        message_type,
        i,
        json.dumps(payload, sort_keys=True),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _EnvelopeReader(DataSourceReader):
    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_partitions", 8))
        self.stream_id = options.get("stream_id", "gen-stream")
        self.message_type = options.get("message_type", "generated")

    def partitions(self):
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _RangePartition(s, min(s + step, self.n_rows))
            for s in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(self.seed, i, self.stream_id, self.message_type)


class _EnvelopeStreamReader(DataSourceStreamReader):
    """Integer-offset micro-batch stream: offset k means "k rows
    produced". latestOffset advances by rows_per_batch per poll; a batch
    [start, end) regenerates deterministically on retry."""

    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.stream_id = options.get("stream_id", "gen-stream")
        self.message_type = options.get("message_type", "generated")
        self._latest = 0

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        self._latest += self.rows_per_batch
        return {"offset": self._latest}

    def partitions(self, start, end):
        return [_RangePartition(start["offset"], end["offset"])]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(self.seed, i, self.stream_id, self.message_type)

    def commit(self, end):
        pass

    def stop(self):
        pass


class EnvelopeDataSource(DataSource):
    @classmethod
    def name(cls):
        return "rtdl_envelopes"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _EnvelopeReader(self.options)

    def streamReader(self, schema):
        return _EnvelopeStreamReader(self.options)
