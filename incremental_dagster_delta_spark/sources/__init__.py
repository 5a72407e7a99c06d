from incremental_dagster_delta_spark.sources.ingest import (
    read_text_files,
    stream_text_files,
)
from incremental_dagster_delta_spark.sources.fixture import generate_ingest_fixture

__all__ = ["read_text_files", "stream_text_files", "generate_ingest_fixture"]
