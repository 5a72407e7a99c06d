from incremental_dagster_delta_spark.streaming.pipeline import IngestPipeline

__all__ = ["IngestPipeline"]
