"""MERGE INTO: apply one micro-batch of change events to a LakeTable.

Semantics (the north-star contract, mirroring Iceberg MERGE):

    MERGE INTO tgt USING (LWW-deduped batch) src ON tgt.key = src.key
      WHEN MATCHED AND src.lsn > tgt._lsn AND src.op = 'delete' THEN DELETE
      WHEN MATCHED AND src.lsn > tgt._lsn                       THEN UPDATE
      WHEN MATCHED (src.lsn <= tgt._lsn)                        THEN KEEP  -- stale / replayed
      WHEN NOT MATCHED AND src.op <> 'delete'                   THEN INSERT

insert/update/upsert all write the payload (only ``delete`` is special), so
out-of-order and duplicate delivery are self-correcting: a replayed or late
event loses to the per-row ``_lsn`` high-water mark.

Reference parity: this generalizes the reference's merge kernel
(``combine_subtables.py:42-172`` — first-source-wins per key) with the sort
direction flipped to last-writer-wins on LSN; the per-row ``_lineage`` string
is the reference's ``_source_value`` provenance convention
(``readme.md:91-97``).

Scale architecture — the table payload is NEVER shuffled and NEVER cached:

1. The batch is LWW-reduced (one shuffle, map-side combined, optionally
   salted) and persisted — it is micro-batch-sized, the only thing we cache.
2. **Key probe**: the deduped batch joins the target's (key, _lsn) columns
   only — a 2-column pruned parquet scan of just the hash-touched buckets —
   to resolve every event's action (insert/update/delete/stale). Per-bucket
   metrics fall out of one aggregation over this probe.
3. Buckets whose events all resolved to no-ops are carried forward by
   manifest reference — no read, no write.
4. Changed buckets are rewritten copy-on-write: surviving target rows are
   read bucket-clustered and written back WITHOUT repartitioning (the rows
   are filtered through a left-anti join against the replaced-key set, which
   is broadcast when small); the new/updated rows — batch-sized — are the
   only thing shuffled into bucket order.
5. Exactly-once: an epoch already stamped in the snapshot properties is a
   no-op (Iceberg snapshot-summary analogue). Data writes land before the
   atomic manifest pointer flip, so a crash mid-epoch leaves the previous
   snapshot current and re-running is safe.

Cost per epoch = O(batch) shuffle + O(changed-bucket data) read/write.
With fine bucketing (e.g. 4096 buckets on a 100 TB table) a micro-batch
rewrite touches only the buckets its keys hash into.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.storagelevel import StorageLevel

from ..operators.lww import lww_latest
from ..sources.lake import (
    LINEAGE_COL,
    LSN_COL,
    LakeTable,
    bucket_expr,
    conform_exprs,
    diff_schema,
)

APPLIED_EPOCHS_PROP = "applied_epochs"

# Below this many replaced keys, the anti-join filter side is broadcast so
# the target scan never shuffles. Above it, an explicit shuffle-hash anti
# join (still only over changed buckets — and never a sort-merge: sorting
# the table side is pure waste for an existence check).
BROADCAST_KEYS_MAX = 500_000


@dataclass
class MergeResult:
    version: int
    epoch: str
    skipped: bool = False
    schema_changes: list[dict[str, str]] = field(default_factory=list)
    metrics: dict[str, Any] = field(default_factory=dict)
    per_bucket: dict[int, dict[str, int]] = field(default_factory=dict)


def _is_applied(table: LakeTable, epoch: str) -> bool:
    return epoch in table.properties().get(APPLIED_EPOCHS_PROP, {})


def merge_into(
    table: LakeTable,
    batch: DataFrame,
    epoch: int | str,
    lsn_col: str = "lsn",
    op_col: str = "op",
    salt_partitions: int | None = None,
    source_name: str = "changelog",
) -> MergeResult:
    """Apply one micro-batch. Idempotent per ``epoch``."""
    epoch = str(epoch)
    if _is_applied(table, epoch):
        return MergeResult(version=table.current_version(), epoch=epoch, skipped=True)
    timing = os.environ.get("SODES_MERGE_TIMING") == "1"
    marks: list[tuple[str, float]] = [("start", time.time())]

    def mark(label: str) -> None:
        if timing:
            marks.append((label, time.time()))

    key = table.key_col
    num_buckets = table.num_buckets
    manifest = table.manifest()
    prev_counts = {int(b): int(c) for b, c in manifest.get("row_counts", {}).items()}

    # ---- 1. ALTER-before-MERGE: schema-registry diff on the payload schema.
    payload_schema = T.StructType(
        [f for f in batch.schema.fields if f.name not in (lsn_col, op_col)]
    )
    evolved, changes = diff_schema(table.schema(), payload_schema)
    if changes:
        table.alter_schema(evolved, changes)

    # ---- 2. Per-key LWW within the batch (A4 kernel); persist (batch-sized).
    src = lww_latest(
        batch, key, lsn_col, salt_partitions=salt_partitions, count_col="_n_events"
    ).withColumn("_bucket", bucket_expr(key, num_buckets))
    src = src.persist(StorageLevel.MEMORY_AND_DISK)
    touched = sorted(r["_bucket"] for r in src.select("_bucket").distinct().collect())
    mark("lww+touched")

    resolved = None
    try:
        # ---- 3. Key probe: src ⟕ target(key, _lsn) — 2-column pruned scan.
        # Explicit shuffle-hash: both sides are key-scale; a sort-merge plan
        # (AQE's occasional pick at borderline sizes) pays two sorts for
        # nothing, and plan flapping makes throughput bimodal.
        tgt_keys = table.read(buckets=touched, include_hidden=True, columns=[key, LSN_COL])
        resolved = src.join(
            tgt_keys.withColumnRenamed(LSN_COL, "_t_lsn").hint("shuffle_hash"),
            on=key,
            how="left",
        )
        newer = F.col("_t_lsn").isNull() | (F.col(lsn_col) > F.col("_t_lsn"))
        action = (
            F.when(newer & (F.col(op_col) == "delete") & F.col("_t_lsn").isNotNull(), "delete")
            .when(newer & (F.col(op_col) == "delete"), "delete_noop")
            .when(newer & F.col("_t_lsn").isNull(), "insert")
            .when(newer, "update")
            .otherwise("stale")
        )
        resolved = resolved.withColumn("_action", action).persist(StorageLevel.MEMORY_AND_DISK)

        # ---- 4. Per-bucket metrics from the probe (north rule: per-partition
        # lineage + metrics), and the changed-bucket set.
        stats = (
            resolved.groupBy("_bucket")
            .agg(
                F.sum(F.when(F.col("_action") == "insert", 1).otherwise(0)).alias("inserts"),
                F.sum(F.when(F.col("_action") == "update", 1).otherwise(0)).alias("updates"),
                F.sum(F.when(F.col("_action") == "delete", 1).otherwise(0)).alias("deletes"),
                F.sum(F.when(F.col("_action") == "delete_noop", 1).otherwise(0)).alias(
                    "delete_noops"
                ),
                F.sum(F.when(F.col("_action") == "stale", 1).otherwise(0)).alias("stale"),
                F.sum("_n_events").alias("events_seen"),
                F.max(F.col(lsn_col)).alias("max_lsn"),
            )
            .collect()
        )
        mark("probe+stats")

        per_bucket: dict[int, dict[str, int]] = {}
        totals = {
            k: 0 for k in ("inserts", "updates", "deletes", "delete_noops", "stale", "events_seen")
        }
        last_lsn = -1
        changed: list[int] = []
        new_counts: dict[int, int] = {}
        for r in stats:
            d = r.asDict()
            b = int(d.pop("_bucket"))
            last_lsn = max(last_lsn, int(d.pop("max_lsn")))
            pb = {k: int(v) for k, v in d.items()}
            # rows carried through unmodified (stale events keep the target
            # row, so only updates/deletes displace rows)
            pb["kept"] = max(prev_counts.get(b, 0) - pb["updates"] - pb["deletes"], 0)
            per_bucket[b] = pb
            for k in totals:
                totals[k] += pb[k]
            if pb["inserts"] + pb["updates"] + pb["deletes"] > 0:
                changed.append(b)
                new_counts[b] = (
                    prev_counts.get(b, 0) - pb["deletes"] + pb["inserts"]
                )
        changed.sort()
        n_replaced = sum(per_bucket[b]["updates"] + per_bucket[b]["deletes"] for b in changed)
        metrics = {
            **totals,
            "events_applied": totals["inserts"] + totals["updates"] + totals["deletes"],
            # superseded within batch (LWW dupes) + superseded by target state
            "conflicts_resolved": (
                totals["events_seen"]
                - sum(
                    pb["inserts"] + pb["updates"] + pb["deletes"] + pb["delete_noops"] + pb["stale"]
                    for pb in per_bucket.values()
                )
            )
            + totals["stale"],
            "last_lsn": int(last_lsn),
            "buckets_touched": len(touched),
            "buckets_rewritten": len(changed),
        }

        # ---- 5. Copy-on-write rewrite of changed buckets only.
        version = table.current_version() + 1
        new_files: dict[int, list[str]] = {}
        bytes_written = 0
        if changed:
            src_lineage = F.concat_ws(
                " | ",
                F.lit(source_name),
                F.concat(F.lit("epoch="), F.lit(epoch)),
                F.concat(F.lit("op="), F.col(op_col)),
                F.concat(F.lit("lsn="), F.col(lsn_col).cast("string")),
            )
            new_rows = resolved.filter(F.col("_action").isin("insert", "update")).select(
                *conform_exprs(resolved, evolved),
                F.col(lsn_col).cast("long").alias(LSN_COL),
                src_lineage.alias(LINEAGE_COL),
                F.col("_bucket"),
            )
            replaced_keys = resolved.filter(
                F.col("_action").isin("update", "delete")
            ).select(key)
            replaced_keys = (
                F.broadcast(replaced_keys)
                if n_replaced <= BROADCAST_KEYS_MAX
                else replaced_keys.hint("shuffle_hash")
            )
            tgt = table.read(buckets=changed, include_hidden=True)
            surviving = tgt.join(replaced_keys, on=key, how="left_anti").select(
                *[F.col(f.name) for f in evolved.fields],
                F.col(LSN_COL),
                F.col(LINEAGE_COL),
                bucket_expr(key, num_buckets).alias("_bucket"),
            )
            # surviving rows come from per-bucket files → already clustered and
            # written shuffle-free; new rows (batch-sized) are repartitioned by
            # bucket. One union → one write job (the union is narrow: each
            # side keeps its own partitioning).
            out = surviving.unionByName(new_rows.repartition(F.col("_bucket")))
            _, out_dir = table.write_bucket_files(out, version, cluster=False)
            new_files = table.list_bucket_files(out_dir)
            for b, fl in new_files.items():
                nbytes = sum(os.path.getsize(os.path.join(table.path, f)) for f in fl)
                per_bucket.setdefault(b, {})["bytes_written"] = nbytes
                bytes_written += nbytes
        metrics["bytes_written"] = bytes_written
        mark("write")

        applied = dict(table.properties().get(APPLIED_EPOCHS_PROP, {}))
        applied[epoch] = {"last_lsn": metrics["last_lsn"], "metrics": metrics}
        new_version = table.commit(
            new_files,
            replaced_buckets=set(changed),
            schema=evolved,
            properties_update={APPLIED_EPOCHS_PROP: applied},
            summary={
                "operation": "merge",
                "epoch": epoch,
                "metrics": metrics,
                "per_bucket": {str(b): v for b, v in per_bucket.items()},
                "schema_changes": changes,
            },
            row_counts_update=new_counts,
        )
        mark("commit")
    finally:
        if resolved is not None:
            resolved.unpersist()
        src.unpersist()
    if timing:
        spans = ", ".join(
            f"{label}={t - prev:.2f}s" for (label, t), (_, prev) in zip(marks[1:], marks)
        )
        print(f"[merge_into epoch={epoch}] {spans}")
    return MergeResult(
        version=new_version,
        epoch=epoch,
        schema_changes=changes,
        metrics=metrics,
        per_bucket=per_bucket,
    )
