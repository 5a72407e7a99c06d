"""Partitioned table IO manager (reference §2.1 S4–S8).

Spark-native reimplementation of the reference's ``DeltaIOManager``
(``ingest_example/delta_io.py:72-129``): append writes, partition-scoped
overwrite ("refresh"), hive ``partitionBy`` including data-derived columns,
the empty-commit guard, and partition-pruned reads.

Storage format is hive-partitioned Parquet. The environment ships no Delta
Lake jars, so the Delta-specific pieces map as:

- Delta ``append``                 → ``mode("append")`` parquet write
- Delta ``replaceWhere`` refresh   → ``mode("overwrite")`` with
  ``spark.sql.sources.partitionOverwriteMode=dynamic`` (replaces exactly the
  partitions present in the written DataFrame)
- Delta partition pruning / data skipping → Catalyst partition pruning +
  parquet min/max row-group skipping from a ``.where()`` on partition/data
  columns

Set ``format="delta"`` on a cluster with delta-spark to get ACID semantics;
the API is format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class PartitionedTable:
    """One managed, hive-partitioned table rooted at ``path``.

    Mirrors the reference's per-asset table config: a table path plus a
    ``partition_by`` list that may mix time-expansion columns and data
    columns (reference ``processed.py:33-34``:
    ``partition_by=["$time$expand", "word_length"]``).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        partition_cols: list[str],
        fmt: str = "parquet",
    ) -> None:
        self.spark = spark
        self.path = path
        self.partition_cols = list(partition_cols)
        self.fmt = fmt

    # -- writes ------------------------------------------------------------

    def append(self, df: DataFrame) -> bool:
        """Incremental append (reference delta_io.py:91: mode="append").

        Returns False (and writes nothing) for an empty batch — the
        empty-commit guard at reference delta_io.py:85-86.
        """
        return self._write(df, mode="append")

    def overwrite_partitions(self, df: DataFrame) -> bool:
        """Refresh mode (reference delta_io.py:92-93 + 104-107): replace
        only the partitions present in ``df`` — Delta ``replaceWhere``
        semantics via dynamic partition overwrite."""
        return self._write(df, mode="overwrite")

    def _write(self, df: DataFrame, mode: str) -> bool:
        if df.isEmpty():
            return False
        writer = df.write.format(self.fmt).mode(mode)
        if self.partition_cols:
            writer = writer.partitionBy(*self.partition_cols)
        writer.save(self.path)
        return True

    # -- reads -------------------------------------------------------------

    def read(self, predicate: str | None = None) -> DataFrame:
        """Partition-pruned read (reference delta_io.py:118-129). Catalyst
        prunes partitions and pushes data filters into the parquet scan
        automatically from the ``where`` — no manual filter plumbing."""
        df = self.spark.read.format(self.fmt).load(self.path)
        if predicate is not None:
            df = df.where(predicate)
        return df

    def read_partition(self, **partition_values: str) -> DataFrame:
        """Read exactly one partition, e.g. ``read_partition(year="2024",
        month="03", day="26")`` — the reference's per-run scoped load
        (delta_io.py:122-127)."""
        df = self.spark.read.format(self.fmt).load(self.path)
        for k, v in partition_values.items():
            df = df.where(F.col(k) == F.lit(v))
        return df

    def exists(self) -> bool:
        try:
            self.spark.read.format(self.fmt).load(self.path).schema
            return True
        except Exception:
            return False
