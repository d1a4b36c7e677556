"""Config-driven EL pipeline — the reference's `nebula run --source
s.json --destination d.json` entry point (cmd/nebula/main.go:102-297)
as a declarative Spark plan.

The reference wires source → N transform workers → batch collector →
destination over channels (internal/pipeline/simple_pipeline.go:
173-248); here the same JSON config compiles to ONE DataFrame lineage,
so Catalyst fuses the stages and the 'batch collector' is the write
job's natural batching. A connector registry maps type strings to
implementations (pkg/connector/registry analogue).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from nebula_spark.cdc import transforms as TR
from nebula_spark.io.sinks import FileSink, LakeSink
from nebula_spark.io.sources import CSVSource, JSONSource, LakeSource, ParquetSource

_SOURCE_TYPES = {
    "csv": CSVSource,
    "json": JSONSource,
    "parquet": ParquetSource,
    "lake": LakeSource,
}


def _build_source(cfg: dict):
    cfg = dict(cfg)
    stype = cfg.pop("type")
    if stype not in _SOURCE_TYPES:
        raise ValueError(f"unknown source type {stype!r}")
    if "schema" in cfg and isinstance(cfg["schema"], str):
        cfg["schema"] = T._parse_datatype_string(cfg["schema"])
    return _SOURCE_TYPES[stype](**cfg)


def _build_transform(cfg: dict):
    cfg = dict(cfg)
    ttype = cfg.pop("type")
    if ttype == "field_mapper":
        return TR.field_mapper(cfg["mapping"])
    if ttype == "filter":
        return TR.filter_transform(F.expr(cfg["predicate"]))
    if ttype == "type_converter":
        return TR.type_converter(cfg["conversions"], strict=cfg.get("strict", False))
    if ttype == "projection":
        return TR.column_projection(cfg.get("whitelist"), cfg.get("blacklist"))
    if ttype == "with_columns":
        return TR.with_columns({k: F.expr(v) for k, v in cfg["exprs"].items()})
    raise ValueError(f"unknown transform type {ttype!r}")


@dataclass
class Pipeline:
    source_cfg: dict
    destination_cfg: dict
    transform_cfgs: list[dict]

    @classmethod
    def from_files(cls, source_path: str, destination_path: str) -> "Pipeline":
        with open(source_path) as f:
            s = json.load(f)
        with open(destination_path) as f:
            d = json.load(f)
        return cls(s, d, s.pop("transforms", []) + d.pop("transforms", []))

    def run(self, spark: SparkSession) -> dict[str, Any]:
        import time

        t0 = time.time()
        src = _build_source(self.source_cfg)
        df: DataFrame = src.read(spark)
        chain = TR.chain(*[_build_transform(c) for c in self.transform_cfgs])
        df = chain(df)

        dcfg = dict(self.destination_cfg)
        dtype = dcfg.pop("type")
        if dtype == "lake":
            epoch = dcfg.pop("epoch", None)
            res = LakeSink(**dcfg).write(spark, df, epoch=epoch)
            rows = res.keys_touched if not res.skipped else 0
        else:
            sink = FileSink(format=dtype, **dcfg)
            sink.write(df)
            rows = None  # avoid a second pass; caller can count
        dt = time.time() - t0
        return {"seconds": round(dt, 2), "rows": rows}
