from nebula_spark.streaming.ingest import TableRoute, run_multi_stream, run_stream

__all__ = ["run_stream", "run_multi_stream", "TableRoute"]
