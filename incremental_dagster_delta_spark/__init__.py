"""incremental_dagster_delta_spark — a PySpark-native incremental analytics engine.

A ground-up Spark reimplementation of the capability surface of the reference
repo ``mattfysh/incremental-dagster-delta`` (see SURVEY.md): incremental
file ingestion with exactly-once new-data detection, scalar derivation,
time-partition expansion, partitioned table writes (append / partition
overwrite) and partition-pruned reads — plus the full relational capability
surface Spark provides (joins, aggregations, windows, SQL) and
LLM-data-pipeline extension operators (dedup, similarity search, text
analysis, multimodal plumbing).

Architecture is Spark-first: the DataFrame API declares logical plans and
Catalyst/Tungsten/AQE pick physical strategies. Storage is hive-partitioned
Parquet (this environment ships no Delta Lake jars; the table layer's
append / overwrite-partitions / pruned-read semantics are the same ones
Delta's ``append`` / ``replaceWhere`` / data-skipping provide, and
``tableio.PartitionedTable`` is written so a Delta backend can be swapped
in via format="delta" when the jar is present).
"""

from incremental_dagster_delta_spark.session import get_spark
from incremental_dagster_delta_spark.tables import TABLE_NAMES, load_table, register_views

__all__ = ["get_spark", "TABLE_NAMES", "load_table", "register_views"]
__version__ = "0.1.0"
