"""Whole-file text ingestion source (reference §2.1 S1–S3).

The reference's filesystem sensor + listing asset (``sensors.py:44-53``,
``listing.py:21-28``) enumerate ``*.txt`` files under day-partitioned
directories and read each file's full content as one record
(``processed.py:53-56``). In Spark that entire apparatus is the file
source:

- batch: ``spark.read.format("text").option("wholetext", True)`` with hive
  partition discovery picking up the ``day=YYYY-MM-DD`` directory key;
- streaming: the same source via ``readStream`` — its checkpointed
  seen-files log IS the sensor cursor + listing + count watermark, with
  exactly-once-per-file semantics the reference's positional watermark
  cannot guarantee (SURVEY.md §7.1).

Filename identity comes from the hidden ``_metadata.file_path`` column
(works in both batch and streaming; ``input_file_name()`` is
batch-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# Schema of a day-partitioned wholetext directory: the text source
# contributes `value`; partition discovery contributes `day`.
INGEST_SCHEMA = StructType(
    [
        StructField("value", StringType(), True),
        StructField("day", StringType(), True),
    ]
)


def _project(df: DataFrame) -> DataFrame:
    """files → (filename, word, word_length, day): reference processed.py:51-60."""
    return df.select(
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias("filename"),
        F.trim(F.col("value")).alias("word"),
        F.length(F.trim(F.col("value"))).cast("long").alias("word_length"),
        F.col("day").cast("string").alias("day"),
    )


def read_text_files(spark: SparkSession, root: str) -> DataFrame:
    """Batch wholetext scan of ``root/day=*/**.txt`` → one row per file."""
    df = (
        spark.read.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", "*.txt")
        .option("basePath", root)
        .load(root)
        .select("value", "day", "_metadata")
    )
    return _project(df)


def stream_text_files(spark: SparkSession, root: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming wholetext source over the same layout.

    The checkpointed seen-files log replaces the reference's sensor cursor
    (sensors.py:31-37) and watermark recovery (processed.py:13-26):
    restart-safe, exactly-once per file.
    """
    reader = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", "*.txt")
        .option("basePath", root)
        .schema(INGEST_SCHEMA)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(root).select("value", "day", "_metadata")
    return _project(df)
