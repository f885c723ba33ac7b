"""Change-log replay: epoch loop, checkpointing, resume-from-manifest.

The reference's analogue is its staged batch pipeline — every stage persists
to disk and downstream stages resume from those files
(``pipeline_process_subtables_to_final.py:114-180``); a full run wipes outputs
and deterministically replays everything (``:11-54``). Here:

* the change log is split into k **epochs** by deterministic LSN ranges
  (bounds depend only on (min_lsn, max_lsn, k), never on partitioning);
* each epoch is one MERGE commit; the snapshot properties record
  ``applied_epochs[epoch] = {last_lsn, metrics}`` — this IS the
  checkpoint/manifest store;
* ``replay_log`` skips epochs already stamped, so a killed replay resumes
  mid-stream and duplicate invocation is a no-op (exactly-once);
* because resolution is per-key LWW on LSN, *any* epoch boundary placement
  yields the same final state — verified by the resplit property test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.lake import LakeTable
from .maintenance import MaintenancePolicy, run_maintenance
from .merge import MergeResult, merge_into


def epoch_bounds(min_lsn: int, max_lsn: int, num_epochs: int) -> list[tuple[int, int]]:
    """Deterministic half-open LSN ranges covering [min_lsn, max_lsn]."""
    span = max_lsn - min_lsn + 1
    num_epochs = max(1, min(num_epochs, span))
    step = span // num_epochs
    rem = span % num_epochs
    bounds, lo = [], min_lsn
    for i in range(num_epochs):
        hi = lo + step + (1 if i < rem else 0)
        bounds.append((lo, hi))
        lo = hi
    return bounds


def replay_log(
    table: LakeTable,
    log: DataFrame,
    num_epochs: int = 1,
    lsn_col: str = "lsn",
    op_col: str = "op",
    salt_partitions: int | None = None,
    epoch_prefix: str = "replay",
    lsn_range: tuple[int, int] | None = None,
    mode: str = "cow",
    lww_strategy: str = "auto",
    maintenance: "MaintenancePolicy | None" = None,
) -> list[MergeResult]:
    """Apply an entire change log as ``num_epochs`` MERGE commits.

    Epochs are keyed ``{prefix}:{lo}-{hi}`` so the same log replayed with the
    same split is idempotent end-to-end, and a resumed run skips completed
    epochs without reading their data (the filter prunes at the parquet scan).

    ``lsn_range=(min_lsn, max_lsn)`` (inclusive), when the caller already
    knows it (an offsets manifest / binlog position does), skips the
    full-log min/max scan — one less serial driver-side job per replay.

    ``maintenance`` (a ``plans.maintenance.MaintenancePolicy``) runs
    compaction / tombstone vacuum / snapshot GC every ``every_epochs``
    applied epochs and once at the end, so sustained replays keep per-bucket
    file counts and metadata bounded without the caller scheduling anything.
    The vacuum watermark is the completed epoch's upper LSN bound — epochs
    ascend in disjoint ranges, so no event below it can arrive later.
    """
    if lsn_range is not None:
        lo_v, hi_v = lsn_range
    else:
        lo_hi = log.agg(
            F.min(lsn_col).alias("lo"), F.max(lsn_col).alias("hi")
        ).collect()[0]
        if lo_hi["lo"] is None:
            return []
        lo_v, hi_v = int(lo_hi["lo"]), int(lo_hi["hi"])
    results: list[MergeResult] = []
    applied_since_sweep = 0
    for lo, hi in epoch_bounds(lo_v, hi_v, num_epochs):
        epoch_id = f"{epoch_prefix}:{lo}-{hi}"
        batch = log.filter((F.col(lsn_col) >= lo) & (F.col(lsn_col) < hi))
        results.append(
            merge_into(
                table,
                batch,
                epoch=epoch_id,
                lsn_col=lsn_col,
                op_col=op_col,
                salt_partitions=salt_partitions,
                mode=mode,
                lww_strategy=lww_strategy,
                # the epoch's LSN span upper-bounds its event count — free,
                # and over-estimating biases mode="auto" toward cow (safe).
                # As a HARD bound it also proves the narrow kernel's winner
                # broadcast safe when under the cap, skipping the per-epoch
                # HLL probe job (LSNs are unique integers, so at most hi-lo
                # events exist in [lo, hi)).
                batch_rows_est=hi - lo,
                batch_rows_bound=hi - lo,
            )
        )
        if maintenance is not None and not results[-1].skipped:
            applied_since_sweep += 1
            if maintenance.every_epochs and applied_since_sweep >= maintenance.every_epochs:
                run_maintenance(
                    table, maintenance,
                    watermark_lsn=hi if maintenance.vacuum else None,
                )
                applied_since_sweep = 0
    if maintenance is not None and applied_since_sweep:
        run_maintenance(
            table, maintenance, watermark_lsn=hi_v + 1 if maintenance.vacuum else None
        )
    return results


def replay_files(
    spark: SparkSession,
    table: LakeTable,
    paths: list[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
    salt_partitions: int | None = None,
) -> list[MergeResult]:
    """Directory/offset-style ingestion: each file (sorted by name — the
    reference's glob-discovery S5, ``combine_subtables.py:63,160-166``) is one
    epoch keyed by its basename, so re-listing a directory only applies new
    files — a batch-mode changelog tail."""
    results = []
    for p in sorted(paths):
        epoch_id = f"file:{p.rsplit('/', 1)[-1]}"
        results.append(
            merge_into(
                table,
                spark.read.parquet(p),
                epoch=epoch_id,
                lsn_col=lsn_col,
                op_col=op_col,
                salt_partitions=salt_partitions,
            )
        )
    return results
