"""Table maintenance: compaction (small-file merge) and tombstone
purge.

Every merge writes fresh files for touched buckets, so long streams
accumulate tombstone rows. Compaction rewrites chosen
buckets into one file each and drops tombstones whose _seq is below a
safety watermark.

Watermark semantics: a tombstone at _seq=s may still be needed to beat
an out-of-order event with seq<s arriving later. The caller passes the
global low-water mark of the source (min over partitions of the lineage
offsets = everything at or below it has been applied); tombstones below
it can never lose to a future event and are safe to purge. watermark=None
purges all tombstones (only valid once the change log is fully drained).
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession, functions as F

from nebula_spark.lake.table import DELETED_COL, SEQ_COL, LakeTable


def compact(
    spark: SparkSession,
    table: LakeTable,
    buckets: list[int] | None = None,
    purge_tombstone_watermark: int | None = None,
    purge_all_tombstones: bool = False,
) -> dict:
    """Rewrite buckets into one file each; optionally purge tombstones.
    Returns a summary dict. Atomic (one snapshot commit)."""
    t0 = time.time()
    snap = table.snapshot()
    chosen = sorted(snap.files.keys()) if buckets is None else sorted(buckets)
    if not chosen:
        return {"buckets": 0, "seconds": 0.0}

    df = table.read(spark, buckets=chosen, include_internal=True)
    if purge_all_tombstones:
        df = df.filter(~F.col(DELETED_COL))
    elif purge_tombstone_watermark is not None:
        df = df.filter(
            ~(F.col(DELETED_COL) & (F.col(SEQ_COL) < F.lit(purge_tombstone_watermark)))
        )
    df = table.bucket_of(df)

    commit_dir = table.new_commit_dir()
    df.repartition("_bucket").write.partitionBy("_bucket").mode("append").parquet(
        commit_dir
    )
    new_files = LakeTable.list_written_files(commit_dir)
    new_snap = table.commit(
        new_files_by_bucket=new_files,
        replaced_buckets=chosen,
        summary={"operation": "compact", "buckets": len(chosen)},
    )
    return {
        "buckets": len(chosen),
        "version": new_snap.version,
        "seconds": round(time.time() - t0, 2),
    }


def expire_snapshots(table: LakeTable, keep_last: int = 10) -> int:
    """Delete snapshot JSONs (and data files referenced by no retained
    snapshot) older than the last ``keep_last`` — Iceberg's
    expire_snapshots analogue. Returns number of files removed."""
    import os

    head = table.snapshot().version
    keep_versions = set(range(max(0, head - keep_last + 1), head + 1))
    meta = table._meta()
    all_versions = {
        int(f[5:17]) for f in os.listdir(meta) if f.startswith("snap-")
    }
    # files referenced by any retained snapshot stay
    live: set[str] = set()
    for v in keep_versions:
        if v in all_versions:
            for entries in table.snapshot(v).files.values():
                live.update(e["path"] for e in entries)
    removed = 0
    for v in sorted(all_versions):
        if v in keep_versions:
            continue
        for entries in table.snapshot(v).files.values():
            for e in entries:
                p = e["path"]
                if p not in live and os.path.exists(p):
                    os.remove(p)
                    removed += 1
        os.remove(os.path.join(meta, f"snap-{v:012d}.json"))
    return removed


def vacuum_orphans(table: LakeTable, grace_s: float = 86400.0) -> int:
    """Delete data files referenced by NO retained snapshot — the
    leftovers of failed/interrupted commits (their dirs are inert for
    correctness but accumulate forever) and of expired history.
    Iceberg's remove_orphan_files analogue.

    ``grace_s``: only files older than this are touched — an IN-FLIGHT
    commit has already written its files but not yet published its
    snapshot, and deleting them would corrupt it. Keep the grace
    comfortably above the longest plausible commit. Returns files
    removed; empty commit dirs are pruned too."""
    import os
    import time

    live: set[str] = set()
    meta = table._meta()
    for f in os.listdir(meta):
        if not f.startswith("snap-"):
            continue
        v = int(f[5:17])
        for entries in table.snapshot(v).files.values():
            live.update(os.path.abspath(e["path"]) for e in entries)
    cutoff = time.time() - grace_s
    removed = 0
    data_root = os.path.join(table.root, "data")
    for commit_dir in sorted(os.listdir(data_root)):
        cdir = os.path.join(data_root, commit_dir)
        if not os.path.isdir(cdir):
            continue
        for dirpath, _dirnames, filenames in os.walk(cdir, topdown=False):
            for fn in filenames:
                p = os.path.abspath(os.path.join(dirpath, fn))
                if p in live:
                    continue
                try:
                    if os.path.getmtime(p) <= cutoff:
                        os.remove(p)
                        removed += 1
                except FileNotFoundError:
                    pass
            try:
                os.rmdir(dirpath)  # only succeeds when fully emptied
            except OSError:
                pass
    return removed
