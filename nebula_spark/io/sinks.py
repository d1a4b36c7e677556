"""Sinks — the reference's destination surface (SURVEY §2.5) as
configured Spark writers.

The reference hand-rolls buffered/compressed CSV & JSON writers,
partitioned S3/GCS parquet-avro-orc layouts, and chunked bulk loads
(destinations/csv, /json, /s3, /gcs, /snowflake). Spark's writer covers
all of it: format + compression option + partitionBy + repartition for
file sizing. Kept as dataclasses so pipeline configs mirror the
reference's JSON connector configs (cmd/nebula/main.go:148-160)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class FileSink:
    """One class covers csv/json/parquet/orc/avro destinations — format
    choice ≙ the reference's per-destination modules; compression ≙ its
    compressed wrapper (destinations/compressed/wrapper.go)."""

    path: str
    format: str = "parquet"  # csv | json | parquet | orc | avro
    mode: str = "append"
    compression: str | None = "zstd"
    partition_by: list[str] = field(default_factory=list)
    target_files: int | None = None  # chunked upload sizing analogue
    options: dict = field(default_factory=dict)

    def write(self, df: DataFrame) -> None:
        if self.target_files:
            df = (
                df.repartition(self.target_files, *self.partition_by)
                if self.partition_by
                else df.repartition(self.target_files)
            )
        w = df.write.format(self.format).mode(self.mode)
        if self.compression:
            w = w.option("compression", self.compression)
        for k, v in self.options.items():
            w = w.option(k, v)
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.save(self.path)


@dataclass
class LakeSink:
    """Upsert into a LakeTable — the capability the reference's Iceberg
    destination lacks (SupportsUpsert()==false, destinations/iceberg/
    init.go:117-121); here it's the primary path."""

    path: str
    key_col: str = "doc_id"
    n_buckets: int = 16
    resolve_strategy: str = "auto"

    def write(self, spark, batch: DataFrame, epoch: int | None = None):
        from nebula_spark.lake import LakeTable, merge_into

        table = LakeTable.load(self.path)
        return merge_into(
            spark, table, batch, epoch=epoch, resolve_strategy=self.resolve_strategy
        )
