"""A/B evidence for segmented manifests (round 5).

Measures the DRIVER-SIDE metadata cost of a commit — snapshot JSON +
(segmented) side-segment bytes written, and commit() wall time — at a
wide bucket layout, inline vs `manifest_segment_buckets`. The workload
is the steady state of a bucket-aligned CDC stream on a big table:
every bucket already holds file entries (populate phase), then each
micro-batch commit touches only a few buckets (narrow phase).

Inline, every commit rewrites a snapshot carrying ALL file entries —
O(table) bytes per commit; segmented, the snapshot carries only the
{segment_id: path} map and the commit rewrites the one-or-few segments
covering the touched buckets — O(changed buckets). This bench is pure
driver code (synthetic file entries through LakeTable.commit(), no
Spark jobs), so the numbers are deterministic — no steal-noise
protocol needed, a single run is the evidence.

Usage: python scripts/segments_bench.py [n_buckets] [seg_width]
           [files_per_bucket] [narrow_commits]
Prints one JSON line; paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402  (types only, no JVM)

from nebula_spark.lake.table import LakeTable  # noqa: E402

_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)


def _entry(table_root: str, b: int, gen: int):
    """A realistic file entry tuple: (path, size, min_seq, max_seq,
    key_unique, min_key, max_key) with a real-length parquet path."""
    path = os.path.join(
        table_root,
        "data",
        f"b={b:05d}",
        f"part-{gen:05d}-0f{b:05d}ab-{gen:04d}-c000.zstd.parquet",
    )
    lo, hi = gen * 1_000_000 + b * 100, gen * 1_000_000 + b * 100 + 99
    return (path, 4 << 20, lo, hi, True, f"k{lo:012d}", f"k{hi:012d}")


def _meta_bytes_of_version(table: LakeTable, version: int) -> int:
    """Metadata bytes WRITTEN by the commit that produced ``version``:
    its snapshot JSON plus any manifest segments stamped with it."""
    total = os.path.getsize(table._meta(f"snap-{version:012d}.json"))
    for p in glob.glob(table._meta(os.path.join("segments", f"seg-*-{version:012d}-*.json"))):
        total += os.path.getsize(p)
    return total


def run_variant(workdir: str, seg_width: int, n_buckets: int,
                files_per_bucket: int, narrow: int) -> dict:
    tdir = os.path.join(workdir, f"t_w{seg_width}")
    table = LakeTable.create(
        tdir,
        _SCHEMA,
        "k",
        n_buckets=n_buckets,
        properties={"manifest_segment_buckets": seg_width},
    )
    gen = 0
    # populate: every bucket ends up with files_per_bucket entries
    for _ in range(files_per_bucket):
        table.commit(
            new_files_by_bucket={
                b: [_entry(tdir, b, gen)] for b in range(n_buckets)
            },
            summary={"operation": "populate"},
        )
        gen += 1
    # narrow steady state: each commit appends to 4 deterministic buckets
    secs, byts = [], []
    for i in range(narrow):
        touched = [(i * 7 + j * 13) % n_buckets for j in range(4)]
        t0 = time.perf_counter()
        snap = table.commit(
            new_files_by_bucket={b: [_entry(tdir, b, gen)] for b in set(touched)},
            summary={"operation": "merge"},
        )
        secs.append(time.perf_counter() - t0)
        byts.append(_meta_bytes_of_version(table, snap.version))
        gen += 1
    # a bucket-scoped read's metadata I/O: files_for on 4 buckets
    snap = table.snapshot()
    t0 = time.perf_counter()
    got = snap.files_for([0, 1, 2, 3])
    lookup_ms = (time.perf_counter() - t0) * 1e3
    assert len(got) == 4 and all(len(v) >= files_per_bucket for v in got.values())
    out = {
        "seg_width": seg_width,
        "commit_ms_avg": round(sum(secs) / len(secs) * 1e3, 2),
        "commit_bytes_avg": int(sum(byts) / len(byts)),
        "commit_bytes_last": byts[-1],
        "lookup4_meta_ms": round(lookup_ms, 2),
        "total_meta_dir_bytes": sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(table._meta())
            for f in fs
        ),
    }
    shutil.rmtree(tdir, ignore_errors=True)
    return out


def main():
    n_buckets = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    seg_width = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    files_per_bucket = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    narrow = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    workdir = tempfile.mkdtemp(prefix="nebula_segbench_")
    try:
        inline = run_variant(workdir, 0, n_buckets, files_per_bucket, narrow)
        seg = run_variant(workdir, seg_width, n_buckets, files_per_bucket, narrow)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    print(
        json.dumps(
            {
                "n_buckets": n_buckets,
                "files_per_bucket": files_per_bucket,
                "narrow_commits": narrow,
                "inline": inline,
                "segmented": seg,
                "bytes_per_commit_ratio": round(
                    inline["commit_bytes_avg"] / seg["commit_bytes_avg"], 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
