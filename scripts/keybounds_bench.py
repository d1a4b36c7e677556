"""A/B evidence for per-file key-bounds pruning (round 5).

Workload: the monotonic-primary-key CDC shape — G insert generations,
each a fresh contiguous id range, then U update batches touching only
the newest range. Without pruning every merge scans and rewrites each
touched bucket's ENTIRE history, so per-batch cost grows with the
accumulated generations; with per-file key bounds the disjoint old
generations are kept out of the scan and the rewrite, so cost stays
flat.

A = pruning on (normal engine), B = pruning off (prunable_files
monkeypatched to {}), interleaved A/B/A/B with fresh tables per run —
the same best-of-under-steal-noise protocol as scaling_bench. Prints
one JSON line; paste the table into BENCH/BASELINE.md.

Usage: python scripts/keybounds_bench.py [gens] [events_per_gen] [rounds]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(spark, prune: bool, gens: int, per_gen: int, workdir: str) -> dict:
    from pyspark.sql import functions as F, types as T

    from nebula_spark.lake import LakeTable, merge_into
    from nebula_spark.lake.table import LakeTable as LT

    schema = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("v", T.LongType(), True),
        ]
    )
    tdir = os.path.join(workdir, f"t_{'a' if prune else 'b'}_{time.time_ns()}")
    table = LakeTable.create(tdir, schema, "k", n_buckets=16)

    orig = LT.prunable_files
    if not prune:
        LT.prunable_files = lambda self, buckets, key_bounds, version=None: {}
    try:
        batch_secs = []
        for g in range(gens):
            lo = g * per_gen
            df = (
                spark.range(lo, lo + per_gen)
                .select(
                    F.col("id").alias("op_sequence"),
                    F.lit("INSERT").alias("op"),
                    F.format_string("k%012d", F.col("id")).alias("k"),
                    (F.col("id") * 2).alias("v"),
                )
            )
            t0 = time.time()
            merge_into(spark, table, df, epoch=g, dedup_how="agg")
            batch_secs.append(round(time.time() - t0, 2))
        # update batches confined to the NEWEST range: the monotonic-PK
        # steady state (hot recent rows)
        upd_secs = []
        for u in range(3):
            lo = (gens - 1) * per_gen
            df = (
                spark.range(lo, lo + per_gen)
                .select(
                    (F.col("id") + (gens + u) * per_gen).alias("op_sequence"),
                    F.lit("UPDATE").alias("op"),
                    F.format_string("k%012d", F.col("id")).alias("k"),
                    (F.col("id") * 3 + u).alias("v"),
                )
            )
            t0 = time.time()
            merge_into(spark, table, df, epoch=gens + u)
            upd_secs.append(round(time.time() - t0, 2))
        rows = table.read(spark).count()
    finally:
        LT.prunable_files = orig
        shutil.rmtree(tdir, ignore_errors=True)
    return {
        "prune": prune,
        "insert_batch_secs": batch_secs,
        "update_batch_secs": upd_secs,
        "update_total": round(sum(upd_secs), 2),
        "rows": rows,
    }


def main():
    from nebula_spark.session import get_spark

    gens = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    per_gen = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("keybounds-bench", parallelism=cpus)
    workdir = tempfile.mkdtemp(prefix="nebula_kb_")

    a_runs, b_runs = [], []
    for _ in range(rounds):
        a_runs.append(run_variant(spark, True, gens, per_gen, workdir))
        b_runs.append(run_variant(spark, False, gens, per_gen, workdir))
    best_a = min(a_runs, key=lambda r: r["update_total"])
    best_b = min(b_runs, key=lambda r: r["update_total"])
    assert best_a["rows"] == best_b["rows"]
    print(
        json.dumps(
            {
                "gens": gens,
                "events_per_gen": per_gen,
                "cpus": cpus,
                "rounds": rounds,
                "prune_on": best_a,
                "prune_off": best_b,
                "all_update_totals_on": [r["update_total"] for r in a_runs],
                "all_update_totals_off": [r["update_total"] for r in b_runs],
                "update_speedup": round(
                    best_b["update_total"] / best_a["update_total"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
