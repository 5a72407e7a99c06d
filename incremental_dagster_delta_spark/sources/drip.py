"""Custom Python DataSource: the reference's drip generator as a
first-class Spark source (Spark 4 Python Data Source API).

The reference's ``generate.py`` drips Faker words into day directories
(1 file every 30-60 s) for the sensor to discover. Here the generator IS
a source: ``spark.read.format("drip")`` for a deterministic batch
corpus, ``spark.readStream.format("drip")`` for an unbounded drip —
no filesystem staging, no sensor, offsets tracked by Spark's own
checkpoint.

Scale shape: the batch reader splits ``n_rows`` across
``num_partitions`` independent input partitions — generation is
embarrassingly parallel, and every row is seeded by its ABSOLUTE
position (the stream reader's device, shared), so the corpus is
reproducible at any parallelism: the same (seed, n_rows) yields the
same multiset under any num_partitions, and the batch corpus IS the
first n_rows of the stream (r15 review — per-partition seeding made
the corpus a function of the partition count, contradicting this
paragraph). The stream reader is a ``SimpleDataSourceStreamReader``
whose offset is just the row counter — restart-safe exactly-once via
the streaming checkpoint, the same guarantee the file-based pipeline
gets from its seen-files log.

Rows: (word STRING, word_length BIGINT, day STRING) — the reference's
single-word payload plus its day partition, ready for
``to_processed``-style downstream hops.
"""

from __future__ import annotations

import random
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from incremental_dagster_delta_spark.sources.corpus import DAYS as _DAYS
from incremental_dagster_delta_spark.sources.corpus import WORDS as _WORDS

SCHEMA = "word string, word_length bigint, day string"


def _row(rng: random.Random):
    word = rng.choice(_WORDS)
    return (word, len(word), rng.choice(_DAYS))


def row_at(i: int, seed: int):
    """Row ``i`` of the drip corpus under ``seed`` — absolute-position
    seeding shared by the batch reader, the stream reader, and the
    q_drip_source oracle simulation: row i is the same tuple no matter
    which partition or batch boundary it falls on."""
    return _row(random.Random(seed * 1_000_003 + i))


class _DripPartition(InputPartition):
    def __init__(self, pid: int, start: int, end: int, seed: int) -> None:
        self.pid = pid
        self.start = start
        self.end = end
        self.seed = seed


class _DripBatchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 57))  # reference corpus size
        self.num_partitions = int(options.get("num_partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> Sequence[InputPartition]:
        per = max(1, -(-self.n_rows // self.num_partitions))  # ceil div
        parts = []
        for pid in range(self.num_partitions):
            start, end = pid * per, min((pid + 1) * per, self.n_rows)
            if start >= end:
                break
            parts.append(_DripPartition(pid, start, end, self.seed))
        return parts

    def read(self, partition: _DripPartition) -> Iterator[tuple]:
        if partition is None:
            # n_rows=0: partitions() returned [] and pyspark substitutes
            # a single None partition (plan_data_source_read) — a
            # legitimate empty corpus, not an error (r15 review)
            return
        for i in range(partition.start, partition.end):
            yield row_at(i, partition.seed)


class _DripStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.rows_per_batch = int(options.get("rows_per_batch", 5))
        self.seed = int(options.get("seed", 42))
        # rows available so far; the drip "refills" over wall-clock time
        # in the reference — a bound keeps processAllAvailable() finite
        # (0 = unbounded)
        self.max_rows = int(options.get("max_rows", 0))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def _gen(self, start: int, end: int) -> list[tuple]:
        # absolute-position seeding: row i is the same tuple no matter
        # which batch boundary it falls on → replays are deterministic
        return [row_at(i, self.seed) for i in range(start, end)]

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["row"]
        hi = lo + self.rows_per_batch
        if self.max_rows:
            hi = min(hi, self.max_rows)
        if hi <= lo:
            return iter([]), start
        return iter(self._gen(lo, hi)), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(self._gen(start["row"], end["row"]))


class DripDataSource(DataSource):
    """``spark.dataSource.register(DripDataSource)`` then
    ``spark.read.format("drip")`` / ``spark.readStream.format("drip")``."""

    @classmethod
    def name(cls) -> str:
        return "drip"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _DripBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _DripStreamReader(self.options)
