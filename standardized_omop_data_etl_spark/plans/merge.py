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

Scale design
------------
* The batch is LWW-reduced first (one shuffle, map-side combined, optionally
  salted — see operators/lww.py).
* Only the buckets the deduped batch hashes into are read, joined, and
  rewritten; all other buckets carry forward by manifest reference. A MERGE
  costs O(batch + touched-bucket data), never O(table).
* The join is a single shuffle on the key; with fine bucketing at 100 TB
  (e.g. 4096 buckets) each touched bucket is a bounded read. AQE coalesces
  and splits skewed join partitions at runtime.
* Exactly-once: an epoch already stamped in the snapshot properties is a
  no-op (commit dedup, Iceberg snapshot-summary analogue). The data write and
  the manifest pointer flip are ordered so a crash between them leaves the
  table at the previous snapshot; re-running the epoch is then safe because
  nothing referenced the new files yet.
"""

from __future__ import annotations

import os
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

    key = table.key_col
    num_buckets = table.num_buckets

    # ---- 1. ALTER-before-MERGE: schema-registry diff on the payload schema.
    payload_schema = T.StructType(
        [f for f in batch.schema.fields if f.name not in (lsn_col, op_col)]
    )
    evolved, changes = diff_schema(table.schema(), payload_schema)
    if changes:
        table.alter_schema(evolved, changes)

    # ---- 2. Per-key last-writer-wins within the batch (A4 kernel).
    src = lww_latest(
        batch, key, lsn_col, salt_partitions=salt_partitions, count_col="_n_events"
    )

    # ---- 3. Touched buckets only (collect ≤ num_buckets small ints).
    src = src.withColumn("_bucket", bucket_expr(key, num_buckets))
    touched = sorted(
        r["_bucket"] for r in src.select("_bucket").distinct().collect()
    )

    # ---- 4. Join target (touched buckets, hidden cols) with deduped batch.
    tgt = table.read(buckets=touched, include_hidden=True)
    # typed NULL-pad + widening casts onto the evolved schema (operator P2)
    s = src.select(
        F.struct(*conform_exprs(src, evolved)).alias("_s_payload"),
        F.col(key).alias("_s_key"),
        F.col(lsn_col).cast("long").alias("_s_lsn"),
        F.col(op_col).alias("_s_op"),
        F.col("_n_events").alias("_s_n"),
    )
    t = tgt.select(
        F.struct(*[F.col(c) for c in evolved.fieldNames()]).alias("_t_payload"),
        F.col(key).alias("_t_key"),
        F.col(LSN_COL).alias("_t_lsn"),
        F.col(LINEAGE_COL).alias("_t_lineage"),
    )
    j = t.join(s, t["_t_key"] == s["_s_key"], "full_outer")

    newer = F.col("_s_key").isNotNull() & (
        F.col("_t_key").isNull() | (F.col("_s_lsn") > F.col("_t_lsn"))
    )
    action = (
        F.when(F.col("_s_key").isNull(), F.lit("keep"))
        .when(newer & (F.col("_s_op") == "delete") & F.col("_t_key").isNotNull(), F.lit("delete"))
        .when(newer & (F.col("_s_op") == "delete"), F.lit("delete_noop"))
        .when(newer & F.col("_t_key").isNull(), F.lit("insert"))
        .when(newer, F.lit("update"))
        .otherwise(F.lit("stale"))  # matched, src.lsn <= tgt._lsn
    )
    take_src = action.isin("insert", "update")
    # Per-row provenance (reference readme.md:91-97 convention: F11 concat_ws).
    src_lineage = F.concat_ws(
        " | ",
        F.lit(source_name),
        F.concat(F.lit("epoch="), F.lit(epoch)),
        F.concat(F.lit("op="), F.col("_s_op")),
        F.concat(F.lit("lsn="), F.col("_s_lsn").cast("string")),
    )
    merged = j.select(
        F.when(take_src, F.col("_s_payload")).otherwise(F.col("_t_payload")).alias("_p"),
        F.when(take_src, F.col("_s_lsn")).otherwise(F.col("_t_lsn")).alias(LSN_COL),
        F.when(take_src, src_lineage).otherwise(F.col("_t_lineage")).alias(LINEAGE_COL),
        action.alias("_action"),
        F.coalesce(F.col("_s_n"), F.lit(0)).alias("_n_events"),
        F.coalesce(F.col("_s_lsn"), F.lit(-1)).alias("_batch_lsn"),
    ).select(
        "_p.*", LSN_COL, LINEAGE_COL, "_action", "_n_events", "_batch_lsn"
    ).withColumn("_bucket", bucket_expr(key, num_buckets))

    merged = merged.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # ---- 5. Per-bucket metrics (north rule: per-partition lineage+metrics).
        stats = (
            merged.groupBy("_bucket")
            .agg(
                F.sum(F.when(F.col("_action") == "insert", 1).otherwise(0)).alias("inserts"),
                F.sum(F.when(F.col("_action") == "update", 1).otherwise(0)).alias("updates"),
                F.sum(
                    F.when(F.col("_action").isin("delete", "delete_noop"), 1).otherwise(0)
                ).alias("deletes"),
                F.sum(F.when(F.col("_action") == "stale", 1).otherwise(0)).alias("stale"),
                F.sum(F.when(F.col("_action") == "keep", 1).otherwise(0)).alias("kept"),
                F.sum("_n_events").alias("events_seen"),
                F.max("_batch_lsn").alias("max_lsn"),
            )
            .collect()
        )
        per_bucket: dict[int, dict[str, int]] = {}
        totals = {k: 0 for k in ("inserts", "updates", "deletes", "stale", "kept", "events_seen")}
        last_lsn = -1
        for r in stats:
            d = r.asDict()
            b = d.pop("_bucket")
            last_lsn = max(last_lsn, d.pop("max_lsn"))
            per_bucket[b] = {k: int(v) for k, v in d.items()}
            for k in totals:
                totals[k] += int(d[k])
        distinct_keys = sum(
            pb["inserts"] + pb["updates"] + pb["deletes"] + pb["stale"]
            for pb in per_bucket.values()
        )
        metrics = {
            **totals,
            "events_applied": totals["inserts"] + totals["updates"] + totals["deletes"],
            # superseded within batch (LWW dupes) + superseded by target state
            "conflicts_resolved": (totals["events_seen"] - distinct_keys) + totals["stale"],
            "last_lsn": int(last_lsn),
        }

        # ---- 6. Write surviving rows for touched buckets; commit atomically.
        version = table.current_version() + 1
        out = merged.filter(
            ~F.col("_action").isin("delete", "delete_noop")
        ).select(*evolved.fieldNames(), LSN_COL, LINEAGE_COL, "_bucket")
        new_files = table.write_bucket_files(out, version)
        bytes_written = 0
        for b, fl in new_files.items():
            nbytes = sum(os.path.getsize(os.path.join(table.path, f)) for f in fl)
            per_bucket.setdefault(b, {})["bytes_written"] = nbytes
            bytes_written += nbytes
        metrics["bytes_written"] = bytes_written

        applied = dict(table.properties().get(APPLIED_EPOCHS_PROP, {}))
        applied[epoch] = {"last_lsn": metrics["last_lsn"], "metrics": metrics}
        new_version = table.commit(
            new_files,
            replaced_buckets=set(touched),
            schema=evolved,
            properties_update={APPLIED_EPOCHS_PROP: applied},
            summary={
                "operation": "merge",
                "epoch": epoch,
                "metrics": metrics,
                "per_bucket": {str(b): v for b, v in per_bucket.items()},
                "schema_changes": changes,
            },
        )
    finally:
        merged.unpersist()
    return MergeResult(
        version=new_version,
        epoch=epoch,
        schema_changes=changes,
        metrics=metrics,
        per_bucket=per_bucket,
    )
