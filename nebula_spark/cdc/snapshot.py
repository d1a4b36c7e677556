"""Initial-snapshot policy — when to bulk-load the base table before
tailing the change log.

Mirrors the reference's snapshot modes (internal/pipeline/cdc.go:49-50,
350-380): ``initial`` always loads the snapshot first, ``never`` starts
tailing immediately, ``when_needed`` loads only when the table has no
usable state (fresh table, or lineage lost). The load itself is the
idempotent ``append_into`` with the reserved bootstrap epoch, so a
crashed-and-retried ``initial`` never double-loads.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from nebula_spark.lake.merge import append_into
from nebula_spark.lake.table import LakeTable

SNAPSHOT_MODES = ("initial", "never", "when_needed")
BOOTSTRAP_EPOCH = -1


def needs_snapshot(table: LakeTable) -> bool:
    """True when the table carries no state to resume from: no data
    files and no applied-epoch lineage (the reference's 'position lost /
    table empty' condition, cdc.go:350-380)."""
    snap = table.snapshot()
    return not snap.has_files and not snap.applied


def maybe_bootstrap(
    spark: SparkSession,
    table: LakeTable,
    bootstrap_path: str | None,
    mode: str = "initial",
) -> dict:
    """Apply the snapshot policy; returns what happened (for metrics)."""
    if mode not in SNAPSHOT_MODES:
        raise ValueError(f"unknown snapshot mode {mode!r}; one of {SNAPSHOT_MODES}")
    if mode == "never" or bootstrap_path is None:
        return {"mode": mode, "loaded": False, "reason": "policy"}
    if mode == "when_needed" and not needs_snapshot(table):
        return {"mode": mode, "loaded": False, "reason": "table_has_state"}
    version = append_into(
        spark,
        table,
        spark.read.parquet(bootstrap_path),
        epoch=BOOTSTRAP_EPOCH,
        summary_op="bootstrap",
    )
    already = version == -1
    return {
        "mode": mode,
        "loaded": not already,
        "reason": "already_applied" if already else "loaded",
        "version": None if already else version,
    }
