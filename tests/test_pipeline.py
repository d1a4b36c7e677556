"""Config-driven pipeline runner — the `nebula run` analogue."""

import json
import os

from nebula_spark.pipeline import Pipeline


def test_csv_to_parquet_pipeline(spark, tmp_path):
    src_data = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "a", "10"), (2, "b", "x"), (3, "c", "30")],
        "id int, name string, qty string",
    ).write.option("header", True).csv(src_data)

    src_cfg = {
        "type": "csv",
        "path": src_data,
        "header": True,
        "schema": "id int, name string, qty string",
        "transforms": [
            {"type": "type_converter", "conversions": {"qty": "int"}},
            {"type": "filter", "predicate": "qty IS NOT NULL"},
            {"type": "field_mapper", "mapping": {"qty": "quantity"}},
        ],
    }
    dst_cfg = {"type": "parquet", "path": str(tmp_path / "out"), "mode": "overwrite"}
    s, d = str(tmp_path / "s.json"), str(tmp_path / "d.json")
    with open(s, "w") as f:
        json.dump(src_cfg, f)
    with open(d, "w") as f:
        json.dump(dst_cfg, f)

    res = Pipeline.from_files(s, d).run(spark)
    assert res["seconds"] >= 0
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted((r["id"], r["quantity"]) for r in out.collect()) == [(1, 10), (3, 30)]


def test_parquet_to_lake_pipeline(spark, tmp_path):
    from nebula_spark.cdc import gen_binlog
    from nebula_spark.cdc.binlog import SEQUENCE_SCHEMA
    from nebula_spark.lake import LakeTable

    src_data = str(tmp_path / "log")
    gen_binlog(spark, 1000, 100, seed=31).write.parquet(src_data)
    LakeTable.create(str(tmp_path / "t"), SEQUENCE_SCHEMA, "doc_id", n_buckets=4)

    p = Pipeline(
        {"type": "parquet", "path": src_data},
        {"type": "lake", "path": str(tmp_path / "t"), "key_col": "doc_id", "epoch": 0},
        [{"type": "filter", "predicate": "op IN ('INSERT','UPDATE','DELETE')"}],
    )
    res = p.run(spark)
    assert res["rows"] > 0
    assert LakeTable.load(str(tmp_path / "t")).read(spark).count() > 0
