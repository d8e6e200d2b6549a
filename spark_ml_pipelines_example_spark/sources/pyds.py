"""Custom connector via Spark 4's Python DataSource API.

The reference reads only files; a complete engine also needs the
CONNECTOR SDK surface — the ability to plug a new source into
``spark.read.format(...)`` with real partition planning, so Spark
schedules one task per InputPartition and the cluster reads in
parallel. Spark 4 exposes that SDK to Python
(``pyspark.sql.datasource``): ``DataSource.reader`` returns a
``DataSourceReader`` whose ``partitions()`` drives task parallelism and
whose ``read(partition)`` yields that partition's rows on an executor.

``SyntheticTelemetryDataSource`` is the deterministic fixture
connector: ``n_rows`` device readings split over ``n_parts`` planned
partitions (contiguous id ranges — at scale each range would map to a
shard/tablet of the external system), each row a closed-form function
of its id so an independent engine can recompute the exact content
(the SQL oracle replays it from ``range()``). Readings:

    device_id = i
    part      = i // ceil(n_rows / n_parts)
    reading   = (i * i + 17 * i) % 9973        (exact integers)

Registration is per-session (``spark.dataSource.register``); re-running
is idempotent by name.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

DEFAULT_ROWS = 100_000
DEFAULT_PARTS = 8
MOD = 9973


class _IdRange(InputPartition):
    def __init__(self, part: int, start: int, end: int):
        self.part = part
        self.start = start
        self.end = end


class SyntheticTelemetryReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", DEFAULT_ROWS))
        self.n_parts = int(options.get("n_parts", DEFAULT_PARTS))

    def partitions(self):
        per = -(-self.n_rows // self.n_parts)  # ceil
        return [
            _IdRange(p, p * per, min((p + 1) * per, self.n_rows))
            for p in range(self.n_parts)
            if p * per < self.n_rows
        ]

    def read(self, partition: _IdRange):
        for i in range(partition.start, partition.end):
            yield (i, partition.part, (i * i + 17 * i) % MOD)


class SyntheticTelemetryStreamReader(DataSourceStreamReader):
    """Micro-batch reader over the same closed-form id space: offsets
    are plain id watermarks ({"i": n} dict offsets, the Python API's
    JSON-able offset contract), each batch covers [start, end) split
    over ``n_parts`` planned partitions. ``commit`` is a no-op (the
    source is stateless/replayable — the deterministic analogue of a
    Kafka range). Under Trigger.AvailableNow Spark falls back to one
    batch for Python stream sources (logged by MicroBatchExecution);
    the offset/partition/read machinery is exercised all the same."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", DEFAULT_ROWS))
        self.n_parts = int(options.get("n_parts", DEFAULT_PARTS))

    def initialOffset(self):
        return {"i": 0}

    def latestOffset(self):
        return {"i": self.n_rows}

    def partitions(self, start, end):
        s, e = int(start["i"]), int(end["i"])
        per = max(1, -(-(e - s) // self.n_parts))
        return [
            _IdRange(p, s + p * per, min(s + (p + 1) * per, e))
            for p in range(self.n_parts)
            if s + p * per < e
        ]

    def read(self, partition: _IdRange):
        for i in range(partition.start, partition.end):
            yield (i, i // (-(-self.n_rows // self.n_parts)), (i * i + 17 * i) % MOD)

    def commit(self, end):
        pass


class SyntheticTelemetryDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_telemetry"

    def schema(self) -> str:
        return "device_id bigint, part int, reading bigint"

    def reader(self, schema) -> SyntheticTelemetryReader:
        return SyntheticTelemetryReader(self.options)

    def streamReader(self, schema) -> SyntheticTelemetryStreamReader:
        return SyntheticTelemetryStreamReader(self.options)


def register(spark) -> None:
    """Idempotent per-session registration of the connector."""
    spark.dataSource.register(SyntheticTelemetryDataSource)
