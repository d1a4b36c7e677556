"""Physical-plan audits — the .explain() checks that the declared
optimizations actually happen: column pruning reaches the scan,
the small-batch merge broadcasts, dedup is partial-aggregated, the
fat-batch plan is one full-outer join."""

from pyspark.sql import functions as F

from nebula_spark.cdc import gen_binlog
from nebula_spark.cdc.binlog import SEQUENCE_SCHEMA
from nebula_spark.cdc.dedup import lww_dedup
from nebula_spark.lake import LakeTable, merge_into
from nebula_spark.lake.merge import _resolve


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_key_scan_prunes_columns(spark, tmp_path):
    """The merge pre-scan reads only narrow columns — a scan that reads
    token arrays for a bucket-stats job would be wrong at 100 TB."""
    table = LakeTable.create(str(tmp_path / "t"), SEQUENCE_SCHEMA, "doc_id", n_buckets=4)
    merge_into(spark, table, gen_binlog(spark, 1000, 100, seed=1), epoch=0)
    key_only = table.read(spark, include_internal=True).select("doc_id")
    plan = _plan(key_only)  # physical FileScan carries ReadSchema
    assert "ReadSchema: struct<doc_id:string>" in plan


def test_small_batch_merge_broadcasts(spark, tmp_path):
    table = LakeTable.create(str(tmp_path / "t"), SEQUENCE_SCHEMA, "doc_id", n_buckets=4)
    merge_into(spark, table, gen_binlog(spark, 2000, 200, seed=2), epoch=0)
    tiny = lww_dedup(gen_binlog(spark, 50, 200, seed=3), key="doc_id")
    tiny = table.bucket_of(tiny)
    merged = _resolve(spark, table, tiny, [0, 1, 2, 3], "op", "op_sequence", "broadcast")
    assert "BroadcastHashJoin" in _plan(merged)


def test_fat_batch_plan_is_single_full_outer(spark, tmp_path):
    table = LakeTable.create(str(tmp_path / "t"), SEQUENCE_SCHEMA, "doc_id", n_buckets=4)
    merge_into(spark, table, gen_binlog(spark, 2000, 200, seed=4), epoch=0)
    b = lww_dedup(gen_binlog(spark, 2000, 200, seed=5), key="doc_id")
    merged = _resolve(
        spark, table, table.bucket_of(b), [0, 1, 2, 3], "op", "op_sequence", "fullouter"
    )
    plan = _plan(merged)
    assert plan.count("FullOuter") == 1
    # and no second join (no anti-join insert pass)
    assert "LeftAnti" not in plan


def test_agg_dedup_has_partial_aggregation(spark):
    """The LWW agg dedup must show two-phase aggregation (map-side
    partial combine) — that's the skew defense."""
    log = gen_binlog(spark, 5000, 100, seed=6)
    plan = _plan(lww_dedup(log, how="agg"))
    # two aggregate operators over the same grouping = partial + final
    assert plan.count("Aggregate") >= 2


def test_window_dedup_uses_group_limit(spark):
    """Spark 4 plans rank<=1 windows as WindowGroupLimit (top-1 per key
    pushed before the full sort) — verify we benefit."""
    log = gen_binlog(spark, 5000, 100, seed=7)
    plan = _plan(lww_dedup(log, how="window"))
    assert "WindowGroupLimit" in plan


def test_commit_retry_on_version_collision(tmp_path, spark):
    """Optimistic concurrency: a stale writer whose target version was
    taken must rebase onto the new HEAD instead of corrupting."""
    table = LakeTable.create(str(tmp_path / "t"), SEQUENCE_SCHEMA, "doc_id", n_buckets=2)
    # simulate a racing writer: occupy version 1 directly
    other = LakeTable.load(str(tmp_path / "t"))
    other.commit(summary={"operation": "racer"})
    assert table.snapshot().version == 1
    snap = table.commit(summary={"operation": "late"})  # must land at v2
    assert snap.version == 2 and snap.raw["summary"]["operation"] == "late"