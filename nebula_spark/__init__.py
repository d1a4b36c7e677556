"""nebula_spark — a PySpark-native CDC / incremental-ingest engine.

A ground-up re-expression of the capabilities of the reference system
(ajitpratap0/nebula, a Go Extract-&-Load platform) on Apache Spark:

- change-feed tailing (Structured Streaming over an ordered binlog
  directory) instead of goroutine channel pipelines,
- last-writer-wins dedup as `max(struct(op_sequence, ...))` aggregation
  / `row_number()` windows instead of an in-memory conflict resolver,
- key-bucketed copy-on-write MERGE into a snapshot-versioned lake table
  instead of append-only Iceberg writes,
- exactly-once via commit manifests embedded in the atomic snapshot
  commit instead of idempotent-delivery maps,
- schema evolution as StructType diff + snapshot schema versioning.

Everything is DataFrame ops; Python touches data only through
vectorized Arrow paths.
"""

from nebula_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
