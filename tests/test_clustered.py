"""Key-clustered compaction, the multi-file MoR plain scan it enables,
and point lookups.

- compact(cluster_by_key=True, max_file_rows=N) sorts each bucket by
  the merge key and rolls files every N rows → several files per
  bucket covering contiguous, pairwise-disjoint key ranges (Iceberg's
  sort-ordered RewriteDataFiles vs bin-pack).
- A MoR bucket whose files are all key-unique AND pairwise
  bounds-disjoint reads as a plain scan (no fold, no shuffle), not just
  single-file buckets.
- LakeTable.lookup(keys) composes bucket pruning (each key hashes to
  one bucket), file pruning (key bounds) and a pushed IN predicate —
  the CDC serving query.
"""

import pytest
from pyspark.sql import functions as F, types as T

from nebula_spark.lake import LakeTable, merge_into
from nebula_spark.lake.maintenance import compact

_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)


def _batch(spark, keys, seq0, op="INSERT", val=lambda i: i):
    rows = [
        (seq0 + i, op, k, None if op == "DELETE" else val(i))
        for i, k in enumerate(keys)
    ]
    return spark.createDataFrame(
        rows, "op_sequence long, op string, k string, v long"
    )


def _mk(tmp_path, mode="cow", conflict=None, n_buckets=2):
    props = {"merge_mode": mode}
    if conflict:
        props["conflict"] = conflict
    return LakeTable.create(
        str(tmp_path / "t"), _SCHEMA, "k", n_buckets=n_buckets, properties=props
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _bucket_bounds(table):
    return {
        b: sorted((e["min_key"], e["max_key"]) for e in es)
        for b, es in table.snapshot().files.items()
    }


def test_clustered_compaction_writes_disjoint_sorted_files(spark, tmp_path):
    table = _mk(tmp_path, mode="cow")
    keys = [f"k{i:06d}" for i in range(900)]
    merge_into(spark, table, _batch(spark, keys, 0), epoch=0)
    before = sorted(tuple(r) for r in table.read(spark).collect())

    compact(spark, table, cluster_by_key=True, max_file_rows=120)
    snap = table.snapshot()
    assert any(len(es) > 1 for es in snap.files.values()), (
        "900 rows over 2 buckets at 120 rows/file must split"
    )
    for b, bounds in _bucket_bounds(table).items():
        assert all(mn is not None and mx is not None for mn, mx in bounds)
        for (mn1, mx1), (mn2, mx2) in zip(bounds, bounds[1:]):
            assert mx1 < mn2, f"bucket {b} files overlap: {bounds}"
    assert sorted(tuple(r) for r in table.read(spark).collect()) == before


def test_mor_plain_scan_for_disjoint_multifile_buckets(spark, tmp_path):
    table = _mk(tmp_path, mode="mor")
    keys = [f"k{i:06d}" for i in range(600)]
    merge_into(spark, table, _batch(spark, keys, 0), epoch=0)
    merge_into(
        spark, table, _batch(spark, keys[::3], 10_000, val=lambda i: i + 7), epoch=1
    )
    before = sorted(tuple(r) for r in table.read(spark).collect())
    assert "Aggregate" in _plan(table.read(spark))

    compact(spark, table, cluster_by_key=True, max_file_rows=100)
    assert any(len(es) > 1 for es in table.snapshot().files.values())
    df = table.read(spark)
    plan = _plan(df)
    assert "Aggregate" not in plan and "Exchange" not in plan, (
        "disjoint key-unique files must read as a plain scan"
    )
    assert sorted(tuple(r) for r in df.collect()) == before


def test_mor_overlapping_key_unique_files_still_fold(spark, tmp_path):
    """Two deduped merges write key-unique files whose ranges OVERLAP —
    the multi-file plain-scan shortcut must not fire."""
    table = _mk(tmp_path, mode="mor", n_buckets=1)
    keys = [f"k{i:06d}" for i in range(100)]
    merge_into(spark, table, _batch(spark, keys, 0), epoch=0)
    merge_into(
        spark, table, _batch(spark, keys, 10_000, val=lambda i: i * 5), epoch=1
    )
    df = table.read(spark)
    assert "Aggregate" in _plan(df)
    got = {r["k"]: r["v"] for r in df.collect()}
    assert got == {k: i * 5 for i, k in enumerate(keys)}
    assert df.count() == len(keys)


def test_mor_equal_boundary_bounds_are_not_disjoint(spark, tmp_path):
    """Touching bounds (file1.max_key == file2.min_key) may share the
    boundary key — the shortcut must treat them as overlapping."""
    table = _mk(tmp_path, mode="mor", n_buckets=1)
    merge_into(spark, table, _batch(spark, ["a", "m"], 0), epoch=0)
    merge_into(
        spark, table, _batch(spark, ["m", "z"], 100, val=lambda i: i + 50), epoch=1
    )
    # manifest: two key-unique files, ranges [a,m] and [m,z]
    df = table.read(spark)
    assert "Aggregate" in _plan(df)
    got = {r["k"]: r["v"] for r in df.collect()}
    assert got == {"a": 0, "m": 50, "z": 51}


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_lookup_returns_current_rows(spark, tmp_path, mode):
    table = _mk(tmp_path, mode=mode, n_buckets=4)
    keys = [f"k{i:06d}" for i in range(400)]
    merge_into(spark, table, _batch(spark, keys, 0), epoch=0)
    # updates + a delete, several versions of the same keys
    merge_into(
        spark,
        table,
        _batch(spark, keys[:100], 10_000, op="UPDATE", val=lambda i: i + 1000),
        epoch=1,
    )
    merge_into(spark, table, _batch(spark, ["k000005"], 20_000, op="DELETE"), epoch=2)

    got = {
        r["k"]: r["v"]
        for r in table.lookup(
            spark, ["k000003", "k000005", "k000250", "missing"]
        ).collect()
    }
    assert got == {"k000003": 1003, "k000250": 250}
    assert table.lookup(spark, []).count() == 0


def test_lookup_prunes_buckets_and_files(spark, tmp_path, monkeypatch):
    table = _mk(tmp_path, mode="cow", n_buckets=8)
    keys = [f"k{i:06d}" for i in range(2000)]
    merge_into(spark, table, _batch(spark, keys, 0), epoch=0)
    compact(spark, table, cluster_by_key=True, max_file_rows=64)

    captured = {}
    orig = LakeTable.read

    def spy(self, spark_, **kw):
        captured.update(kw)
        return orig(self, spark_, **kw)

    monkeypatch.setattr(LakeTable, "read", spy)
    got = table.lookup(spark, ["k000123", "k001999"]).collect()
    assert {r["k"] for r in got} == {"k000123", "k001999"}
    # bucket pruning: at most 2 of 8 buckets scanned
    assert len(list(captured["buckets"])) <= 2
    # file pruning: clustered files not covering the keys are excluded
    snap = table.snapshot()
    total = sum(len(snap.files.get(int(b), [])) for b in captured["buckets"])
    excluded = sum(len(v) for v in captured["exclude_paths"].values())
    assert excluded > 0 and total - excluded <= 2
    assert captured["key_in"] == ["k000123", "k001999"]


def test_lookup_mor_uncompacted_folds_to_winner(spark, tmp_path):
    """key_in is applied BEFORE the fold: a key with several appended
    versions must still resolve to the LWW winner, and under FWW to the
    first write."""
    table = _mk(tmp_path, mode="mor", n_buckets=2)
    merge_into(spark, table, _batch(spark, ["a", "b"], 0), epoch=0)
    merge_into(
        spark, table, _batch(spark, ["a"], 100, op="UPDATE", val=lambda i: 99), epoch=1
    )
    got = {r["k"]: r["v"] for r in table.lookup(spark, ["a"]).collect()}
    assert got == {"a": 99}

    fww = LakeTable.create(
        str(tmp_path / "fww"),
        _SCHEMA,
        "k",
        n_buckets=2,
        properties={"merge_mode": "mor", "conflict": "first_write_wins"},
    )
    merge_into(
        spark,
        fww,
        _batch(spark, ["a"], 100, val=lambda i: 1),
        epoch=0,
        conflict="first_write_wins",
    )
    merge_into(
        spark,
        fww,
        _batch(spark, ["a"], 50, op="UPDATE", val=lambda i: 2),
        epoch=1,
        conflict="first_write_wins",
    )
    got = {r["k"]: r["v"] for r in fww.lookup(spark, ["a"]).collect()}
    assert got == {"a": 2}  # seq 50 < 100: the earlier write wins
