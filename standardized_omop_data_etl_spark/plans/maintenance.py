"""Lake-table maintenance & CDC-out: snapshot diff and re-bucketing.

``snapshot_diff`` is the engine's legacy change-data-capture *output*
surface; since r4 it delegates to the canonical incremental-scan in
``plans.change_feed`` (``read_changes`` + ``ChangeFeedConsumer``), which adds
bucket pruning under the MERGE broadcast gate, vacuum/rollback fidelity
guards, and durable consumer offsets. Iceberg calls this the ``changes``
incremental read.

``rebucket`` evolves ``num_buckets`` — the knob that keeps per-bucket data
bounded as a table grows from GB to 100 TB. One aligned shuffle rewrites the
layout; the manifest commit is atomic, and time travel across the boundary
still works because each snapshot records its own bucket count.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..sources.lake import BUCKET_FN, DELETED_COL, LINEAGE_COL, LSN_COL, LakeTable, bucket_expr


@dataclass(frozen=True)
class MaintenancePolicy:
    """Cadence policy for background table upkeep inside an ingest loop.

    The 10^10-event regime's flatness (BENCH/endurance_*_r03.json) depends on
    compaction/vacuum/snapshot-GC actually running; wiring the cadence into
    ``replay_log``/``stream_changelog_from`` removes the "caller must
    remember" failure mode — per-bucket file counts and metadata stay bounded
    by construction.

    * ``every_epochs`` — run the sweep after every N APPLIED (non-skipped)
      epochs, and once more at the end of a replay. 0 disables the cadence.
    * ``max_files_per_bucket`` — compaction trigger/target (buckets above it
      are rewritten to one file). Between sweeps a bucket gains at most one
      file per applied epoch, so file counts are bounded by
      ``max_files_per_bucket + every_epochs``.
    * ``expire_keep_last`` — snapshots retained by the GC pass (None skips
      snapshot expiry — keep everything for time travel).
    * ``orphan_sweep`` — also run ``LakeTable.remove_orphan_files`` each
      sweep (crashed-writer leftovers). Off by default: orphans only exist
      after a crash, and the sweep LISTs the whole data root — cheap locally,
      a real object-store cost at 10^10-row table sizes. Turn it on for
      long-lived streaming sinks, or run the action manually after an
      incident.
    * ``vacuum`` — GC tombstones below the replay's applied LSN watermark.
      Only ``replay_log`` honors it: its epochs ascend in disjoint LSN
      ranges, so after epoch (lo, hi) no event with lsn < hi can ever
      arrive and the resurrection guard below hi is provably dead weight.
      Streaming batches carry no such ordering guarantee, so the streaming
      sink ignores the flag (vacuum there needs an upstream low-watermark
      the caller must supply explicitly via ``vacuum_tombstones``).
    """

    every_epochs: int = 8
    max_files_per_bucket: int = 8
    expire_keep_last: int | None = 4
    vacuum: bool = False
    orphan_sweep: bool = False


def run_maintenance(
    table: LakeTable, policy: MaintenancePolicy, watermark_lsn: int | None = None
) -> None:
    """One maintenance sweep under ``policy`` (see ``MaintenancePolicy``)."""
    compact_buckets(table, max_files_per_bucket=policy.max_files_per_bucket)
    if policy.vacuum and watermark_lsn is not None:
        vacuum_tombstones(table, watermark_lsn=watermark_lsn)
    if policy.expire_keep_last is not None:
        table.expire_snapshots(keep_last=policy.expire_keep_last)
    if policy.orphan_sweep:
        table.remove_orphan_files()


def snapshot_diff(
    table: LakeTable, from_version: int, to_version: int
) -> DataFrame:
    """Row-level changes between two snapshots as a change-event DataFrame
    ``(op ∈ insert|update|delete, lsn, <payload...>)`` — a thin wrapper over
    the canonical incremental-scan implementation in ``plans.change_feed``
    (r4), kept for this surface's legacy column names. Runs with
    ``allow_gc=True``: a row physically removed inside the range (vacuum)
    surfaces as a synthesized delete with ``lsn = before-watermark + 1``.
    Prefer ``read_changes`` / ``ChangeFeedConsumer`` for new consumers —
    they add fidelity guards and durable offsets.
    """
    from .change_feed import CHANGE_LSN_COL, CHANGE_OP_COL, read_changes

    d = read_changes(table, from_version, to_version, allow_gc=True)
    payload = [c for c in d.columns if c not in (CHANGE_OP_COL, CHANGE_LSN_COL)]
    return d.select(
        F.col(CHANGE_OP_COL).alias("op"), F.col(CHANGE_LSN_COL).alias("lsn"), *payload
    )


def rebucket(table: LakeTable, new_num_buckets: int) -> int:
    """Rewrite the table layout into ``new_num_buckets`` buckets (one aligned
    shuffle of the full table) and commit a new snapshot. Returns the new
    version. Use when per-bucket volume outgrows the micro-batch MERGE
    sweet spot."""
    owner = table.acquire_writer_lease()
    try:
        return _rebucket_locked(table, new_num_buckets)
    finally:
        table.release_writer_lease(owner)


def _rebucket_locked(table: LakeTable, new_num_buckets: int) -> int:
    key = table.key_col
    df = table.read(include_hidden=True)
    out = df.withColumn("_bucket", bucket_expr(key, new_num_buckets))
    version = table.current_version() + 1
    clustered = out.repartition(new_num_buckets, F.col(key))
    new_files, out_dir = table.write_bucket_files(clustered, version, cluster=False, bloom=True)

    # per-bucket counts from the written files in ONE narrow pass (key +
    # tombstone marker only): every written row is one key (the rewrite read
    # resolved state), so count(*) = distinct keys and the not-deleted count
    # = visible rows.
    all_files = [table.fs.join(table.path, f) for fl in new_files.values() for f in fl]
    counts: dict[int, int] = {}
    kcounts: dict[int, int] = {}
    if all_files:
        from pyspark.sql import types as T

        narrow = T.StructType(
            [table.schema()[key], T.StructField(DELETED_COL, T.BooleanType(), True)]
        )
        cnt = (
            table.spark.read.schema(narrow)
            .parquet(*all_files)
            .groupBy(bucket_expr(key, new_num_buckets).alias("_b"))
            .agg(
                F.count(F.lit(1)).alias("keys"),
                F.sum(
                    F.when(F.coalesce(F.col(DELETED_COL), F.lit(False)), 0).otherwise(1)
                ).alias("visible"),
            )
            .collect()
        )
        counts = {r["_b"]: int(r["visible"]) for r in cnt}
        kcounts = {r["_b"]: int(r["keys"]) for r in cnt}

    m = table.manifest()
    manifest = {
        "version": version,
        "parent": m["version"],
        # rows were physically re-placed with THIS engine's bucket hash just
        # above, so stamp the current BUCKET_FN — propagating the old value
        # would leave a legacy/foreign table permanently rejected by
        # _check_format even after the migration it prescribes.
        "bucket_fn": BUCKET_FN,
        "schema": m["schema"],
        "key_col": key,
        "num_buckets": new_num_buckets,
        "files": {str(b): fl for b, fl in new_files.items() if fl},
        "row_counts": {str(b): int(c) for b, c in counts.items() if c},
        "key_counts": {str(b): int(c) for b, c in kcounts.items() if c},
        "mor_buckets": [],  # full rewrite materializes any merge-on-read state
        "file_stats": table.stats_for_commit(new_files) or {},
        "properties": m["properties"],
        "summary": {"operation": "rebucket", "from": m["num_buckets"], "to": new_num_buckets},
    }
    table._write_manifest(manifest)
    return version


def compact_buckets(
    table: LakeTable,
    max_files_per_bucket: int = 4,
    target_rows_per_file: int | None = None,
) -> int:
    """Small-file compaction: many tiny epochs leave many files per bucket
    over time (every MERGE appends ~1 file to each touched bucket's rewrite),
    degrading scan planning and open-file overhead at scale. Buckets holding
    more than ``max_files_per_bucket`` files are rewritten into one file each
    via a single aligned shuffle of ONLY those buckets; untouched buckets are
    carried by reference. Read state is byte-identical (tombstones and hidden
    columns included); returns the new version (current if nothing to do).

    ``target_rows_per_file`` bounds file size for huge buckets: the rewrite
    key-sorts within each bucket and rolls files at the target, so rolled
    files carry DISJOINT key ranges; with per-file manifest stats a point
    ``lookup`` then opens one file per bucket instead of the whole bucket
    (the Iceberg sort-order + data-file-stats pruning analogue)."""
    owner = table.acquire_writer_lease()
    try:
        # manifest read + bucket selection must happen UNDER the lease: a
        # commit landing between an early read and the acquire would make the
        # selected file lists and prev row_counts stale vs the data rewritten.
        m = table.manifest()
        buckets = sorted(
            int(b) for b, fl in m["files"].items() if len(fl) > max_files_per_bucket
        )
        if not buckets:
            return table.current_version()
        key = table.key_col
        version = table.current_version() + 1
        rows = table.read(buckets=buckets, include_hidden=True).withColumn(
            "_bucket", bucket_expr(key, table.num_buckets)
        )
        new_files, _ = table.write_bucket_files(
            rows, version, cluster=True,
            sort_within=target_rows_per_file is not None,
            max_records_per_file=target_rows_per_file,
        )
        prev_counts = {int(b): int(c) for b, c in m.get("row_counts", {}).items()}
        # visible rows AND distinct keys are unchanged by compaction (the
        # rewrite materializes resolved state: one row per key, tombstones
        # kept) — restamp both so commit doesn't drop the replaced entries
        prev_keys = dict(prev_counts)
        prev_keys.update({int(b): int(c) for b, c in m.get("key_counts", {}).items()})
        table.assert_writer_lease(owner)
        return table.commit(
            new_files,
            replaced_buckets=set(buckets),
            summary={"operation": "compact", "buckets": buckets},
            row_counts_update={b: prev_counts.get(b, 0) for b in buckets},
            key_counts_update={b: prev_keys.get(b, 0) for b in buckets},
            file_stats_update=table.stats_for_commit(new_files),
        )
    finally:
        table.release_writer_lease(owner)


def vacuum_tombstones(table: LakeTable, watermark_lsn: int) -> int:
    """GC tombstone rows whose deletion LSN is below ``watermark_lsn`` (i.e.
    the upstream can no longer deliver events older than the watermark, so
    the resurrection guard is no longer needed). Rewrites only buckets that
    actually contain qualifying tombstones; returns the new version (or the
    current one if nothing qualified)."""
    owner = table.acquire_writer_lease()
    try:
        # bucket discovery runs UNDER the lease (cf. compact_buckets): it is a
        # narrow 3-column scan, and doing it early would let a concurrent
        # merge land tombstones/rows between selection and rewrite.
        key = table.key_col
        num_buckets = table.num_buckets
        hidden = table.read(include_hidden=True, columns=[key, LSN_COL, DELETED_COL])
        dead = hidden.filter(
            F.coalesce(F.col(DELETED_COL), F.lit(False)) & (F.col(LSN_COL) < watermark_lsn)
        )
        buckets = sorted(
            r["_b"]
            for r in dead.select(bucket_expr(key, num_buckets).alias("_b")).distinct().collect()
        )
        if not buckets:
            return table.current_version()
        version = table.current_version() + 1
        keep = table.read(buckets=buckets, include_hidden=True).filter(
            ~(
                F.coalesce(F.col(DELETED_COL), F.lit(False))
                & (F.col(LSN_COL) < watermark_lsn)
            )
        ).withColumn("_bucket", bucket_expr(key, num_buckets))
        new_files, out_dir = table.write_bucket_files(keep, version, cluster=False, bloom=True)
        # visible counts are unchanged by tombstone GC — re-stamp them for the
        # rewritten buckets (commit drops counts of replaced buckets otherwise).
        # Distinct keys DO shrink (vacuumed tombstone keys are gone); every
        # written row is one key, so one narrow count of the new files is exact.
        prev_counts = {
            int(b): int(c) for b, c in table.manifest().get("row_counts", {}).items()
        }
        all_files = [table.fs.join(table.path, f) for fl in new_files.values() for f in fl]
        kcounts: dict[int, int] = {b: 0 for b in buckets}
        if all_files:
            from pyspark.sql import types as T

            key_only = T.StructType([table.schema()[key]])
            cnt = (
                table.spark.read.schema(key_only)
                .parquet(*all_files)
                .groupBy(bucket_expr(key, num_buckets).alias("_b"))
                .count()
                .collect()
            )
            kcounts.update({int(r["_b"]): int(r["count"]) for r in cnt})
        table.assert_writer_lease(owner)
        return table.commit(
            new_files,
            replaced_buckets=set(buckets),
            summary={"operation": "vacuum_tombstones", "watermark_lsn": watermark_lsn,
                     "buckets": buckets},
            row_counts_update={b: prev_counts.get(b, 0) for b in buckets},
            key_counts_update=kcounts,
            file_stats_update=table.stats_for_commit(new_files),
        )
    finally:
        table.release_writer_lease(owner)
