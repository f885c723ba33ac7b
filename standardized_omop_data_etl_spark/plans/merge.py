"""MERGE INTO: apply one micro-batch of change events to a LakeTable.

Semantics (the north-star contract, mirroring Iceberg MERGE):

    MERGE INTO tgt USING (LWW-deduped batch) src ON tgt.key = src.key
      WHEN MATCHED AND src.lsn > tgt._lsn AND src.op = 'delete' THEN TOMBSTONE
      WHEN MATCHED AND src.lsn > tgt._lsn                       THEN UPDATE
      WHEN MATCHED (src.lsn <= tgt._lsn)                        THEN KEEP  -- stale / replayed
      WHEN NOT MATCHED AND src.op = 'delete'                    THEN TOMBSTONE
      WHEN NOT MATCHED                                          THEN INSERT

insert/update/upsert all write the payload (only ``delete`` is special), so
out-of-order and duplicate delivery are self-correcting: a replayed or late
event loses to the per-row ``_lsn`` high-water mark. Deletes write hidden
TOMBSTONE rows (NULL payload, ``_deleted=true``, the deletion LSN) rather
than dropping the row, so the watermark survives the delete and a stale
update delivered after it — in any later micro-batch, any order — still
loses. Visible reads filter tombstones; ``vacuum_tombstones`` GCs them once
the stream's low-watermark passes.

Reference parity: this generalizes the reference's merge kernel
(``combine_subtables.py:42-172`` — first-source-wins per key) with the sort
direction flipped to last-writer-wins on LSN; the per-row ``_lineage`` string
is the reference's ``_source_value`` provenance convention
(``readme.md:91-97``).

Scale architecture — wide (payload-bearing) data crosses the wire exactly
once, and the table payload is NEVER shuffled:

1. **One bucket-aligned shuffle.** The batch is LWW-reduced with a
   ``row_number`` window whose exchange is pinned to ``num_buckets``
   partitions on the table key. Because the bucket function IS Spark's
   shuffle hash (``lake.bucket_expr``), shuffle partition i == bucket i, so
   the winners land bucket-clustered with no second shuffle.
2. **Scratch spill, not cache.** The winners are written once to a scratch
   parquet dir partitioned by bucket (~1 file per bucket). Caching
   array-bearing rows through Spark's columnar in-memory store measured ~10×
   the cost of a parquet round-trip; every later pass over the winners is a
   column-pruned scan of this scratch.
3. **Narrow key probe.** Winner keys join the target's (key, _lsn) columns
   only — a 2-column pruned parquet scan of just the touched buckets — to
   resolve every event's action (insert/update/delete/stale). Per-bucket
   metrics fall out of one aggregation over this narrow probe, which is the
   only thing persisted (it is key-sized, no payloads).
4. Buckets whose events all resolved to no-ops are carried forward by
   manifest reference — no read, no write.
5. **Broadcast-filtered copy-on-write.** Changed buckets are rewritten with
   the applied/replaced key sets broadcast as semi/anti join filters, so both
   the surviving target rows and the new winner rows stream from
   bucket-clustered files straight to bucket-clustered output files — zero
   wide shuffles in the write. Past ``BROADCAST_KEYS_MAX`` keys the filters
   fall back to shuffled joins plus one aligned repartition.
6. Exactly-once: an epoch already stamped in the snapshot properties is a
   no-op (Iceberg snapshot-summary analogue). Data writes land before the
   atomic manifest pointer flip, so a crash mid-epoch leaves the previous
   snapshot current and re-running is safe.

Cost per epoch = 1 wide shuffle + 1 wide scratch round-trip (both O(batch))
+ narrow key-scale joins + O(changed-bucket data) read/write. With fine
bucketing (e.g. 4096 buckets on a 100 TB table) a micro-batch rewrite
touches only the buckets its keys hash into.
"""

from __future__ import annotations

import os
import re
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.storagelevel import StorageLevel

from ..operators.bloom import DIRECT_BCAST_MAX, bloom_anti, bloom_semi
from ..operators.lww import lww_latest, lww_latest_narrow, unpersist_pinned
from ..sources.lake import (
    DELETED_COL,
    LINEAGE_COL,
    LSN_COL,
    DATA_DIR,
    LakeTable,
    bucket_expr,
    conform_exprs,
    diff_schema,
)


# The only ops merge_into applies. Anything else (e.g. op='invalid' from
# parse_json_changelog's dead-letter rows) or a NULL LSN is silently
# DROPPED by the guard filter below — it must never merge as an insert with
# NULL _lsn. Callers that want to persist/count the rejects split them off
# first with sources.json_changelog.split_dead_letter.
VALID_OPS = ("insert", "update", "delete", "upsert")

# Below this many keys, the semi/anti filter side is broadcast so neither the
# target scan nor the winner scan shuffles (the keys are short strings; 4M ≈
# 100-200 MB broadcast — sized for real executors). Above it, shuffled hash
# joins (never sort-merge: sorting the table side is pure waste for an
# existence check) plus one bucket-aligned repartition before the write.
BROADCAST_KEYS_MAX = int(os.environ.get("SODES_BROADCAST_KEYS_MAX", 4_000_000))

# Above BROADCAST_KEYS_MAX the narrow key sides shuffle-hash-join (no sort,
# no plan flapping). An explicit hint is BINDING though — AQE cannot demote
# it when a partition's build share outgrows executor memory — so past this
# many estimated rows the join is left unhinted and AQE picks a
# spill-friendly sort-merge instead of failing the stage.
SHUFFLE_HASH_KEYS_MAX = 64_000_000

# Cow key-filter form chooser (keyed() in the rewrite): past
# DIRECT_BCAST_MAX keys the bloom form is used only when the filtered set
# is a SMALL fraction of the base — bloom-positives pay a wide-row
# exchange, so at high touch fractions (bootstrap/backfill epochs that
# rewrite most rows) exchanging ~the whole base costs more than one serial
# broadcast build; at the 10^10-regime's routine sliver-touch epochs the
# bloom exchanges almost nothing and keeps the driver O(bitmap).
BLOOM_MAX_POSITIVE_FRACTION = float(
    os.environ.get("SODES_BLOOM_MAX_POSITIVE_FRACTION", 0.25)
)


def _knob(env: str, fallback):
    """SODES_* knobs are read at CALL time, not import time, so a campaign
    A/B that exports one mid-session takes effect on the next epoch — the
    same contract as SODES_WINNER_FETCH. The module constant (monkeypatched
    by tests) is the no-env fallback."""
    v = os.environ.get(env)
    return type(fallback)(v) if v is not None else fallback


def _bkm() -> int:
    return _knob("SODES_BROADCAST_KEYS_MAX", BROADCAST_KEYS_MAX)


def _dbm() -> int:
    return _knob("SODES_DIRECT_BCAST_MAX", DIRECT_BCAST_MAX)


def _keyed_join_side(df, rows_est: int, bcast_max: int | None = None):
    """Size-tiered join side for a narrow key frame: broadcast under the
    broadcast cap, explicit shuffle-hash under the hash-build cap, unhinted
    (AQE) past it. Callers on the per-epoch hot path pass a LOW ``bcast_max``
    (DIRECT_BCAST_MAX): a broadcast hash relation build is O(rows) serial
    driver time, so past ~512k keys the fully parallel shuffle-hash exchange
    of two narrow frames is both faster at scale and executor-count-
    proportional — the broadcast's only win is on genuinely small sides."""
    if rows_est <= (_bkm() if bcast_max is None else bcast_max):
        return F.broadcast(df)
    if rows_est <= SHUFFLE_HASH_KEYS_MAX:
        return df.hint("shuffle_hash")
    return df


def _probe_target_side(table, touched, src_keys, tgt_rows_est, batch_rows_bound):
    """The metrics probe's target side, shared by the cow and mor probes:
    a 3-column (key, _t_lsn, _t_del) read of the touched buckets, size-tiered
    via ``_keyed_join_side`` at the LOW broadcast tier (DIRECT_BCAST_MAX —
    the probe runs every epoch, so its driver-serial relation build is a
    scaling cost, and a shuffle-hash of two narrow key frames parallelizes
    fully). When the target outgrows BROADCAST_KEYS_MAX but the EPOCH's hard
    row bound fits it (winners ≤ batch rows), the scan is pruned by a
    semi-join of the winner keys pushed below the scan and below the mor LWW
    resolver — without the pruning, a >cap-key table forces the join over
    EVERY resident key of the touched buckets per epoch: O(table) exchange
    for an O(batch) classification, the dominant per-epoch cost in the
    10^10-row regime's routine micro-batches."""
    key = table.key_col
    prune = (
        tgt_rows_est > _bkm()
        and batch_rows_bound is not None
        and batch_rows_bound <= _bkm()
    )
    tgt_keys = table.read(
        buckets=touched, include_hidden=True, columns=[key, LSN_COL, DELETED_COL],
        key_filter=src_keys.select(key) if prune else None,
    ).withColumnRenamed(LSN_COL, "_t_lsn").withColumnRenamed(DELETED_COL, "_t_del")
    if prune:
        # the pruned scan is ≈ batch-keys-sized; broadcast it only when that
        # bound is genuinely small — a multi-M-row relation build is serial
        # driver time (see _keyed_join_side)
        return _keyed_join_side(
            tgt_keys, min(batch_rows_bound, tgt_rows_est), bcast_max=_dbm()
        )
    return _keyed_join_side(tgt_keys, tgt_rows_est, bcast_max=_dbm())



# mode="auto" crossover knobs (see resolve_merge_mode). The endurance
# campaigns (BENCH/endurance_*_r03.json: 20 epochs × 2M events) give the
# shape: mor per-epoch cost stays flat (~O(batch): one delta write +
# key-scale probe) while cow drifts up with table size (the rewrite of every
# touched bucket re-copies all its resident rows). A uniform-key micro-batch
# touches essentially every bucket once batch_keys ≳ a few × num_buckets, so
# cow's write amplification ≈ table_rows / batch_rows. Write-path accounting
# says mor ingests faster at essentially ANY ratio (cow pays scratch + rewrite
# ≈ (2 + ratio) × batch writes; mor pays one delta write + the probe), and
# both direct measurements agree: mor +23% at ratio ≈ 0.4 INCLUDING a full
# materializing compaction (r3), +20% at ratio ≈ 0.85 (r4, 16M/8-epoch
# pinned legs — BENCH/BASELINE.md). The threshold therefore only protects
# the bootstrap/backfill shape, where the batch RESCALES the table and cow's
# pure-parquet output is worth the (small, comparable-cost) rewrite:
AUTO_MOR_REWRITE_AMPLIFICATION = 0.5
# fallback when the caller can't estimate the batch size: past this many
# resident rows, routine micro-batches are always small relative to the
# table, so auto picks mor on table size alone.
AUTO_MOR_TABLE_ROWS_MIN = 10_000_000

# Winner-fetch auto-routing (narrow kernel): the broadcast fetch costs an
# O(keys) SERIAL driver relation build (~0.8 µs/key — 1.3 s at 1.6M keys);
# the bloom fetch replaces it with O(bitmap) driver work but pays a
# parallel ~0.35 µs/row membership eval over the whole batch plus two
# extra jobs (winner persist+count, bitmap build). Measured crossover
# (BENCH/BASELINE.md r04l): bloom wins past ~16 local cores — on a real
# multi-executor cluster the broadcast is additionally a 100-200 MB
# driver fanout — and only when the epoch is big enough that the saved
# serial build outweighs the two extra jobs' scheduling gaps:
BLOOM_FETCH_MIN_CORES = 16
BLOOM_FETCH_MIN_ROWS = 4_000_000


def resolve_winner_fetch(batch_rows_est: int | None, parallelism: int) -> str:
    """Pick the narrow kernel's winner fetch ('auto' = size-guarded
    broadcast, 'bloom' = distributed-bitmap prefilter) from the cluster
    width and the epoch's row bound. Unknown batch size → broadcast: the
    count-guarded broadcast is safe at any size, while the bloom's two extra
    jobs only pay for themselves on provably large epochs."""
    if (
        parallelism >= _knob("SODES_BLOOM_MIN_CORES", BLOOM_FETCH_MIN_CORES)
        and batch_rows_est is not None
        and batch_rows_est >= _knob("SODES_BLOOM_MIN_ROWS", BLOOM_FETCH_MIN_ROWS)
    ):
        return "bloom"
    return "auto"


# lww_strategy="auto" crossover: the narrow kernel (winners-only wide
# exchange) pays ~4 extra stages + a sizing job per epoch; its payoff — not
# shuffling non-winner payloads — only dominates when each core has a LOT of
# exchange work per epoch. Measured A/B on this box (BENCH/BASELINE.md r4
# kernel-shape table): at 31k batch rows/core window wins ~1.7x, at 125k
# rows/core window still wins, at 500k rows/core narrow wins 1.5x (and
# 3.5x/core at 2-16M rows/core in the pinned campaigns). Geometric midpoint
# of the measured bracket:
NARROW_MIN_ROWS_PER_CORE = 250_000


def resolve_lww_strategy(
    batch_rows_est: int | None, parallelism: int
) -> str:
    """Pick the LWW kernel from the epoch's per-core exchange work. Unknown
    batch size → window: a streaming micro-batch of unknown size is almost
    always small relative to the cluster, and window's worst measured
    deficit (the few-core, huge-epoch regime) needs both knowns to be
    extreme. Callers that KNOW the regime pass 'narrow'/'window' outright."""
    if batch_rows_est is None or batch_rows_est <= 0:
        return "window"
    per_core = batch_rows_est / max(int(parallelism), 1)
    return "narrow" if per_core >= NARROW_MIN_ROWS_PER_CORE else "window"


def resolve_merge_mode(
    table_rows: int,
    batch_rows_est: int | None,
    amplification: float | None = None,
) -> str:
    """Pick cow vs mor for one epoch from free manifest stats.

    * ``table_rows`` — resident visible rows (sum of manifest row_counts; no
      job needed).
    * ``batch_rows_est`` — caller's estimate of this epoch's event count (an
      LSN span, an offsets-manifest delta). Over-estimating the batch biases
      toward cow — safe, since cow is the bootstrap-friendly default.

    cow when the table is empty/small or the batch rescales the table
    (initial load, backfill: rewrite cost ≈ batch cost, and cow leaves pure
    parquet scans behind); mor when the batch is a small fraction of the
    resident data (steady-state tailing: cow would re-copy
    ``amplification``× the batch in untouched-row bytes every epoch).
    """
    if amplification is None:  # read at call time so tests/ops can retune
        amplification = AUTO_MOR_REWRITE_AMPLIFICATION
    if batch_rows_est is not None and batch_rows_est > 0:
        return "mor" if table_rows > amplification * batch_rows_est else "cow"
    return "mor" if table_rows > AUTO_MOR_TABLE_ROWS_MIN else "cow"


# Action taxonomy of the MERGE matrix (shared by the cow and mor paths and
# their per-bucket metrics).
_ACTIONS = (
    "inserts", "updates", "revives", "deletes", "redeletes",
    "tombstone_inserts", "stale",
)
_ACTION_OF = {
    "inserts": "insert", "updates": "update", "revives": "revive",
    "deletes": "delete", "redeletes": "redelete",
    "tombstone_inserts": "tombstone_insert", "stale": "stale",
}


@dataclass
class MergeResult:
    version: int
    epoch: str
    skipped: bool = False
    schema_changes: list[dict[str, str]] = field(default_factory=list)
    metrics: dict[str, Any] = field(default_factory=dict)
    per_bucket: dict[int, dict[str, int]] = field(default_factory=dict)


def _is_applied(table: LakeTable, epoch: str) -> bool:
    return table.is_epoch_applied(epoch)


def _sweep_stale_scratch(table: LakeTable) -> None:
    """Remove scratch dirs orphaned by a crashed merge. Only safe under the
    writer lease (merge_into holds it here): a concurrent writer's live
    scratch would otherwise be destroyed."""
    data_root = table.fs.join(table.path, DATA_DIR)
    if not table.fs.isdir(data_root):
        return
    for entry in table.fs.listdir(data_root):
        if entry.startswith("scratch-"):
            table.fs.rmtree(table.fs.join(data_root, entry))


def densify_sparse_batch(
    table: LakeTable,
    batch: DataFrame,
    lsn_col: str = "lsn",
    op_col: str = "op",
    batch_rows_bound: int | None = None,
) -> DataFrame:
    """Fold a SPARSE change batch into full-image events (Debezium-style
    partial updates: an ``update`` event's NULL payload columns mean
    "unchanged"; ``insert``/``upsert`` stay full images whose NULLs are
    genuine; ``delete`` deletes). The reference has no streaming analogue —
    its per-row merge always carries whole rows (combine_subtables.py:61-124);
    this is the CDC-native generalization.

    Semantics per key, folding the batch's events in LSN order onto the
    resident row (epoch LSN ranges ascend — the replay/vacuum contract — so
    resident state predates every batch event):

    * the newest full image or delete is the *boundary*; updates at or below
      it are dead (an update between an image and a later delete died with
      the delete; an update after a delete is the standard CDC
      update-on-absent anomaly and is a no-op, NOT a resurrection);
    * updates above the boundary apply column-wise: each column takes its
      newest NON-NULL update value, else the boundary image's value, else —
      when the batch holds no full image for the key — the resident row's
      value (a batch-keyed pruned read; keys with neither an image nor a
      resident row drop as no-ops);
    * a key whose boundary is a delete emits one tombstone.

    Output is a DENSE batch (ops ``upsert``/``delete`` only, one event per
    key, lsn = the key's newest batch LSN, the collapsed-event count
    appended as ``_n_events``) that the unchanged MERGE machinery — modes,
    probes, feeds, MVs — applies as usual; ``merge_into`` feeds it to the
    ``prereduced`` kernel, which skips the second LWW pass entirely (the
    fold IS the reduction).

    Caveat, by design: columns fold INDEPENDENTLY. Correlated columns
    (e.g. the fixtures' ``n_tok == size(tokens)`` invariant) keep their
    correlation only if the producer always updates them together in one
    event — a partial image touching ``tokens`` but not ``n_tok`` composes
    the new array with the old count, exactly as Debezium partial images
    would at any consumer.

    One exchange, aligned: the fold groups on the key after a
    ``repartition(num_buckets, key)`` that the downstream LWW kernel's
    exchange reuses. The resident fill reads ONLY the fill keys' rows
    (``key_filter`` pushed below the scan and the mor resolver) when
    ``batch_rows_bound`` proves the filter broadcastable, the usual
    size-tiered join otherwise. Caller must hold the writer lease (resident
    values are read at lease time; ``merge_into(sparse_updates=True)`` does).
    """
    key = table.key_col
    payload = [c for c in batch.columns if c not in (key, lsn_col, op_col)]
    dtypes = {f.name: f.dataType for f in batch.schema.fields}
    lsn = F.col(lsn_col)
    is_full = F.col(op_col).isin("insert", "upsert")
    is_upd = F.col(op_col) == "update"
    is_dele = F.col(op_col) == "delete"

    aggs = [
        F.max(lsn).alias("_last"),
        F.count(F.lit(1)).alias("_n_events"),  # collapsed-event count, for metrics
        F.max(F.when(is_dele, lsn)).alias("_bd"),
        F.max(F.when(is_full, F.struct(
            lsn.alias("_l"), *[F.col(c).alias(c) for c in payload]
        ))).alias("_img"),
    ]
    for c in payload:
        aggs.append(
            F.max(F.when(is_upd & F.col(c).isNotNull(),
                         F.struct(lsn.alias("_l"), F.col(c).alias("_v"))))
            .alias(f"_u_{c}")
        )
    folded = (
        batch.filter(
            F.col(op_col).isin(*VALID_OPS)
            & F.col(lsn_col).isNotNull()
            & F.col(key).isNotNull()
        )
        .repartition(table.num_buckets, F.col(key))
        .groupBy(key)
        .agg(*aggs)
        # three output branches + the fill read's key filter consume the
        # fold; pin it (O(batch keys) rows) so each reads the cached
        # aggregate instead of re-running it. Released by merge_into via
        # unpersist_pinned after the epoch consumes the batch.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    boundary = F.greatest(
        F.coalesce(F.col("_img._l"), F.lit(-1)), F.coalesce(F.col("_bd"), F.lit(-1))
    )
    is_del_out = (
        F.coalesce(F.col("_bd"), F.lit(-1))
        > F.coalesce(F.col("_img._l"), F.lit(-1))
    )
    folded = folded.withColumn("_boundary", boundary).withColumn("_is_del", is_del_out)

    def upd_val(c):
        u = F.col(f"_u_{c}")
        return F.when(u["_l"] > F.col("_boundary"), u["_v"])

    out_cols = [key, F.col("_last").alias(lsn_col), F.col("_n_events")]

    tombstones = folded.filter(F.col("_is_del")).select(
        *out_cols,
        F.lit("delete").alias(op_col),
        *[F.lit(None).cast(dtypes[c]).alias(c) for c in payload],
    )
    dense = folded.filter(~F.col("_is_del") & F.col("_img").isNotNull()).select(
        *out_cols,
        F.lit("upsert").alias(op_col),
        *[F.coalesce(upd_val(c), F.col(f"_img.{c}")).alias(c) for c in payload],
    )

    fill = folded.filter(~F.col("_is_del") & F.col("_img").isNull())
    # Fast path for the whole-row-producer shape (every key carries at least
    # one full image, so NO key needs resident state): one O(batch-keys)
    # count over the pinned aggregate proves `fill` empty, and the resident
    # read + its join are skipped entirely — an all-full-image "sparse" log
    # then costs ≈ the dense replay (the fold is the only residue). The
    # count materializes the persisted fold, work the first consumer would
    # have done anyway; when fill keys DO exist it costs one extra cheap
    # cached-scan job, disclosed here, and nothing else changes.
    if fill.count() == 0:
        filled = dense.limit(0)  # folds to an empty relation (OptimizeLimitZero)
    else:
        resident_cols = [
            c for c in payload if c in {f.name for f in table.schema().fields}
        ]
        bounded = batch_rows_bound is not None and batch_rows_bound <= _bkm()
        resident = table.read(
            columns=[key] + resident_cols,
            key_filter=fill.select(key) if bounded else None,
        ).select(key, *[F.col(c).alias(f"_r_{c}") for c in resident_cols])
        resident = (
            F.broadcast(resident) if bounded
            else _keyed_join_side(resident, _bkm() + 1)
        )
        filled = fill.join(resident, key, "inner").select(
            *out_cols,
            F.lit("upsert").alias(op_col),
            *[
                F.coalesce(
                    upd_val(c),
                    F.col(f"_r_{c}") if c in resident_cols
                    else F.lit(None).cast(dtypes[c]),
                ).alias(c)
                for c in payload
            ],
        )

    order = batch.columns + ["_n_events"]
    out = tombstones.unionByName(dense).unionByName(filled).select(*order)
    out._sodes_pinned = folded  # released via unpersist_pinned (lww.py contract)
    return out


def densify_sparse_stats(
    table: LakeTable,
    batch: DataFrame,
    lsn_col: str = "lsn",
    op_col: str = "op",
    batch_rows_bound: int | None = None,
) -> DataFrame:
    """Observability companion to ``densify_sparse_batch`` (the engine's
    no-silent-drops convention — same pattern as ``minhash_lsh_with_stats``
    / ``jaccard_df_cutoff_stats``): one row classifying every key the fold
    will emit OR drop. ``fill_dropped`` counts update-on-absent keys — the
    fold's only silent no-op, and in a healthy pipeline it should be ~0
    (a persistent non-zero value usually means the consumer missed a
    snapshot/bootstrap and is applying partial images to rows it never
    loaded). Cheap by construction: the skeleton fold aggregates only
    (key, lsn, op) — no payload structs — and the resident probe is the
    same batch-keyed pruned read the fill itself uses.

    Columns: ``keys_total, tombstones, dense_images, fill_keys,
    fill_matched, fill_dropped``.
    """
    key = table.key_col
    lsn = F.col(lsn_col)
    skel = (
        batch.filter(
            F.col(op_col).isin(*VALID_OPS)
            & F.col(lsn_col).isNotNull()
            & F.col(key).isNotNull()
        )
        .groupBy(key)
        .agg(
            F.max(F.when(F.col(op_col).isin("insert", "upsert"), lsn)).alias("_bf"),
            F.max(F.when(F.col(op_col) == "delete", lsn)).alias("_bd"),
        )
        .withColumn(
            "_is_del",
            F.coalesce(F.col("_bd"), F.lit(-1)) > F.coalesce(F.col("_bf"), F.lit(-1)),
        )
        .withColumn("_needs_fill", ~F.col("_is_del") & F.col("_bf").isNull())
    )
    fill_keys = skel.filter(F.col("_needs_fill")).select(key)
    bounded = batch_rows_bound is not None and batch_rows_bound <= _bkm()
    resident = table.read(
        columns=[key], key_filter=fill_keys if bounded else None
    ).select(key)
    resident = (
        F.broadcast(resident) if bounded
        else _keyed_join_side(resident, _bkm() + 1)
    )
    matched = fill_keys.join(resident, key, "left_semi")
    return (
        skel.agg(
            F.count(F.lit(1)).alias("keys_total"),
            F.sum(F.col("_is_del").cast("long")).alias("tombstones"),
            F.sum((~F.col("_is_del") & F.col("_bf").isNotNull()).cast("long"))
            .alias("dense_images"),
            F.sum(F.col("_needs_fill").cast("long")).alias("fill_keys"),
        )
        .crossJoin(matched.agg(F.count(F.lit(1)).alias("fill_matched")))
        .withColumn("fill_dropped", F.col("fill_keys") - F.col("fill_matched"))
    )


def merge_into(
    table: LakeTable,
    batch: DataFrame,
    epoch: int | str,
    lsn_col: str = "lsn",
    op_col: str = "op",
    salt_partitions: int | None = None,
    source_name: str = "changelog",
    mode: str = "cow",
    missing: str = "null",
    lww_strategy: str = "auto",
    batch_rows_est: int | None = None,
    batch_rows_bound: int | None = None,
    prepared: PreparedDelta | None = None,
    sparse_updates: bool = False,
) -> MergeResult:
    """Apply one micro-batch. Idempotent per ``epoch``; single-writer
    enforced via the table's writer lease (a concurrent merge raises
    ``ConcurrentWriterError`` instead of corrupting scratch/commit state).

    ``mode`` selects the apply strategy (same final read state, different
    cost shape — the Iceberg copy-on-write / merge-on-read choice):

    * ``"cow"`` (default) — changed buckets are rewritten; reads stay pure
      parquet scans. Write cost ∝ changed-bucket data: right when batches
      are small relative to the buckets they touch, or reads dominate.
    * ``"mor"`` — the batch's LWW winners are APPENDED as per-bucket delta
      files (one payload write total; nothing rewritten) and readers resolve
      per-key LWW over the touched buckets until ``compact_buckets``
      materializes them. Write cost ∝ batch regardless of table size: right
      for sustained high-throughput ingest, where an epoch touching every
      bucket would otherwise rewrite the whole table each time. Metrics,
      exactly-once stamping, schema evolution, and tombstone semantics are
      identical (verified bit-exact against the cow path and the oracle).
    * ``"auto"`` — resolved per epoch by ``resolve_merge_mode`` from the
      manifest's resident row total and ``batch_rows_est`` (cow for
      bootstrap/backfill-shaped epochs, mor for steady-state tailing).

    ``missing`` is the policy for table columns absent from the batch
    (``"null"`` fills NULL — partial-payload changelogs; ``"error"`` raises
    ``SchemaEvolutionError``, flagging probable renames — see
    ``diff_schema``).

    ``lww_strategy`` picks the per-key conflict-resolution kernel:
    ``"auto"`` (default) resolves per epoch from ``batch_rows_est`` per core
    (``resolve_lww_strategy``; the r4 kernel-shape A/B in BENCH/BASELINE.md);
    ``"narrow"`` ( — measured ~3.5×/core faster; winner-set broadcast
    size-guarded, see ``_lww_winners``) or ``"window"`` (single windowed
    shuffle of every payload; pair with ``salt_partitions`` for degenerate
    order columns where one key's MAX LSN itself is massively duplicated —
    replay LSNs are unique per key, so that arises only off-contract).

    ``batch_rows_est`` is an ESTIMATE feeding the mode/kernel choice (over-
    reporting biases toward cow/window — safe either way);
    ``batch_rows_bound`` is a HARD upper bound on the batch's row count (a
    replay epoch's LSN span, an offsets-manifest delta) and feeds the narrow
    kernel's broadcast size guard: under the broadcast margin it proves the
    winner set broadcastable and skips the per-epoch sizing job entirely.
    Pass it only when it is a true bound — an under-report defeats the guard.

    ``prepared`` hands in this epoch's pre-written mor delta files
    (``prepare_mor_delta`` — the pipelined replay lookahead). Only the mor
    path consumes it; any other resolution (cow mode, skipped epoch, schema
    drift since the prepare) discards the files and proceeds normally, so a
    stale lookahead can never corrupt state — at worst it re-does the work.

    ``sparse_updates=True`` treats ``update`` events' NULL payload columns
    as "unchanged" (Debezium-style partial images) and folds the batch to
    full-image events under the lease first — see ``densify_sparse_batch``.
    A handed-in ``prepared`` delta is discarded in this mode (the lookahead
    wrote raw-batch winners; densification needs lease-time resident state).
    """
    if mode not in ("cow", "mor", "auto"):
        raise ValueError(
            f"unknown merge mode {mode!r} (expected 'cow', 'mor', or 'auto')"
        )
    if mode == "auto":
        total_rows = sum(
            int(c) for c in table.manifest().get("row_counts", {}).values()
        )
        mode = resolve_merge_mode(total_rows, batch_rows_est)
    if lww_strategy not in ("window", "narrow", "auto"):
        raise ValueError(
            f"unknown lww_strategy {lww_strategy!r} "
            "(expected 'window', 'narrow', or 'auto')"
        )
    if lww_strategy == "auto":
        lww_strategy = resolve_lww_strategy(
            batch_rows_est, table.spark.sparkContext.defaultParallelism
        )
    epoch = str(epoch)
    if prepared is not None and mode != "mor":
        prepared.discard(table)  # lookahead only serves the mor apply path
        prepared = None
    if _is_applied(table, epoch):
        if prepared is not None:
            prepared.discard(table)
        return MergeResult(version=table.current_version(), epoch=epoch, skipped=True)
    lease_owner = table.acquire_writer_lease()
    try:
        # Re-check under the lease: another process may have applied this very
        # epoch between our unlocked check and the acquire — re-applying would
        # be LWW-safe for the data but would commit a spurious version and
        # clobber the epoch's recorded metrics.
        if _is_applied(table, epoch):
            if prepared is not None:
                prepared.discard(table)
            return MergeResult(version=table.current_version(), epoch=epoch, skipped=True)
        if sparse_updates:
            if prepared is not None:  # lookahead folded nothing — stale by definition
                prepared.discard(table)
                prepared = None
            batch = densify_sparse_batch(
                table, batch, lsn_col=lsn_col, op_col=op_col,
                batch_rows_bound=batch_rows_bound,
            )
            # the fold already left exactly one event per key with the
            # collapsed count in _n_events; a second LWW pass would re-sort
            # the payload for nothing — the kernel degenerates to the
            # bucket-pinned exchange alone.
            lww_strategy = "prereduced"
        try:
            if mode == "mor":
                return _merge_mor_locked(
                    table, batch, epoch, lsn_col, op_col, salt_partitions,
                    source_name, lease_owner, missing, lww_strategy,
                    batch_rows_bound, prepared,
                )
            return _merge_into_locked(
                table, batch, epoch, lsn_col, op_col, salt_partitions, source_name,
                lease_owner, missing, lww_strategy, batch_rows_bound,
            )
        finally:
            if sparse_updates:
                unpersist_pinned(batch)
    finally:
        table.release_writer_lease(lease_owner)


def _lww_winners(
    batch: DataFrame,
    key: str,
    lsn_col: str,
    salt_partitions: int | None,
    num_buckets: int,
    strategy: str,
    rows_bound: int | None = None,
) -> DataFrame:
    """Per-key LWW winners, bucket-aligned (one exchange pinned to
    ``num_buckets``), with the collapsed-event count in ``_n_events``.

    ``strategy='window'`` shuffles every event payload once (row_number over
    a key-partitioned window); ``strategy='narrow'`` (the default — measured
    ~3.5×/core faster, see BENCH/BASELINE.md) reduces (key, lsn) map-side
    first and moves only the winners' payloads — same winners bit-exact
    (see ``lww_latest_narrow``), ~events-per-key× fewer wide-shuffle bytes,
    hot keys combine before the exchange so salting is unnecessary. The
    winners' payloads are fetched via the size-guarded broadcast by default
    (~1.3 s serial build at 1.6M keys — cheaper than the bloom fetch's
    parallel membership eval below ~16 local cores; see lww_latest_narrow),
    or via the blocked-bloom fetch (``SODES_WINNER_FETCH=bloom`` — no
    driver-built relation, O(bitmap) driver work) on large executor counts.
    Past ``BROADCAST_KEYS_MAX`` keys either fetch abandons the narrow plan
    for the window kernel (once the winners can't be broadcast, a candidate
    join would shuffle every payload anyway). The bloom fetch pins the
    winner aggregate; ``unpersist_pinned`` releases it post-scratch.

    ``strategy='prereduced'`` is for batches the caller GUARANTEES hold at
    most one event per key (``densify_sparse_batch`` output): LWW over them
    is identity, so the kernel reduces to the bucket-pinned exchange alone —
    no sort, no aggregate, no probe. The fold's collapsed-event count rides
    in as ``_n_events`` (defaulted to 1 if absent) so metrics stay honest."""
    if strategy == "prereduced":
        src = batch
        if "_n_events" not in src.columns:
            src = src.withColumn("_n_events", F.lit(1).cast("long"))
        return src.repartition(num_buckets, F.col(key))
    if strategy == "narrow":
        # SODES_WINNER_FETCH: deployment/campaign selector — "auto"
        # (cost-based routing: resolve_winner_fetch picks bloom on wide
        # clusters × large epochs, size-guarded broadcast otherwise),
        # "bloom" / "broadcast" / "shuffled" (forced, A/B).
        fetch_env = os.environ.get("SODES_WINNER_FETCH", "auto")
        try:
            fetch = {"auto": "auto", "bloom": "bloom", "broadcast": True,
                     "shuffled": False}[fetch_env]
        except KeyError:
            # validated BEFORE any work: a typo'd campaign knob must fail
            # loud and early, not as a bare KeyError mid-merge under the
            # writer lease
            raise ValueError(
                f"SODES_WINNER_FETCH={fetch_env!r}: expected one of "
                "'auto', 'bloom', 'broadcast', 'shuffled'"
            ) from None
        if fetch == "auto":
            fetch = resolve_winner_fetch(
                rows_bound, batch.sparkSession.sparkContext.defaultParallelism
            )
        return lww_latest_narrow(
            batch, key, lsn_col, count_col="_n_events", num_partitions=num_buckets,
            broadcast_winners=fetch, broadcast_keys_max=_bkm(),
            keys_bound=rows_bound,
        )
    src = lww_latest(
        batch,
        key,
        lsn_col,
        salt_partitions=salt_partitions,
        count_col="_n_events",
        num_partitions=None if salt_partitions else num_buckets,
    )
    if salt_partitions:
        # the salted two-phase reduce leaves an arbitrary partitioning;
        # re-align once so the bucketed write stays ~1 file per bucket
        src = src.repartition(num_buckets, F.col(key))
    return src


@dataclass
class PreparedDelta:
    """One epoch's LWW winners, pre-written as final mor delta files AHEAD of
    the epoch's lease/commit window — the unit of the pipelined replay
    lookahead (``plans.replay.replay_log(pipeline=True)``).

    The delta write is a pure function of (batch, table schema): it reads no
    table data and mutates no table state, so it can run concurrently with
    the PREVIOUS epoch's metrics probe and commit — overlapping the loop's
    per-epoch serial fraction (driver-side commit I/O, lease heartbeats,
    stats reduction) with cluster work. At small epoch grains that serial
    fraction is exactly what compresses N→4N scaling efficiency (Amdahl),
    so the overlap buys efficiency, not just wall-clock.

    Crash safety: the files live in a fresh uuid'd ``snap-v{V}`` dir written
    BEFORE any manifest references them — a crash strands them exactly like
    a crashed writer's output, and ``LakeTable.remove_orphan_files`` reclaims
    them once the version counter passes their stamp. ``schema_json`` pins
    the table schema the payload was conformed to; the consuming merge
    re-checks it under the lease and rewrites the delta if the table evolved
    in between (single-writer loops make that impossible, but the check
    keeps the API safe to misuse).
    """

    epoch: str
    new_files: dict[int, list[str]]
    out_dir: str
    schema_json: str

    def discard(self, table: LakeTable) -> None:
        table.fs.rmtree(self.out_dir)


def _write_mor_delta(
    table: LakeTable,
    batch: DataFrame,
    epoch: str,
    lsn_col: str,
    op_col: str,
    salt_partitions: int | None,
    source_name: str,
    evolved: T.StructType,
    lww_strategy: str,
    batch_rows_bound: int | None,
    version: int,
) -> tuple[dict[int, list[str]], str]:
    """LWW-reduce one batch and write the winners as final per-bucket mor
    delta files (hidden columns stamped in the same projection). Shared by
    the locked mor merge and the pipelined ``prepare_mor_delta`` lookahead —
    both paths MUST produce identical files, so this is the only writer."""
    key = table.key_col
    num_buckets = table.num_buckets
    batch = batch.filter(
        F.col(op_col).isin(*VALID_OPS) & F.col(lsn_col).isNotNull() & F.col(key).isNotNull()
    )
    winners_df = _lww_winners(batch, key, lsn_col, salt_partitions, num_buckets,
                              lww_strategy, rows_bound=batch_rows_bound)
    src_lineage = F.concat_ws(
        " | ",
        F.lit(source_name),
        F.concat(F.lit("epoch="), F.lit(epoch)),
        F.concat(F.lit("op="), F.col(op_col)),
        F.concat(F.lit("lsn="), F.col(lsn_col).cast("string")),
    )
    delta = winners_df.select(
        *conform_exprs(winners_df, evolved),
        F.col(lsn_col).cast("long").alias(LSN_COL),
        src_lineage.alias(LINEAGE_COL),
        (F.col(op_col) == "delete").alias(DELETED_COL),
        F.col("_n_events").cast("long").alias("_n_events"),
        bucket_expr(key, num_buckets).alias("_bucket"),
    )
    new_files, out_dir = table.write_bucket_files(delta, version, cluster=False)
    unpersist_pinned(winners_df)  # winners are final delta files now
    return new_files, out_dir


def prepare_mor_delta(
    table: LakeTable,
    batch: DataFrame,
    epoch: int | str,
    lsn_col: str = "lsn",
    op_col: str = "op",
    salt_partitions: int | None = None,
    source_name: str = "changelog",
    missing: str = "null",
    lww_strategy: str = "auto",
    batch_rows_est: int | None = None,
    batch_rows_bound: int | None = None,
) -> PreparedDelta | None:
    """Pre-write one epoch's mor delta files without taking the writer lease
    (the pipelined replay lookahead — see ``PreparedDelta``).

    Returns ``None`` when the lookahead cannot run ahead safely and the
    caller should fall through to a plain ``merge_into``:

    * the epoch is already stamped (resumed replay — nothing to do), or
    * the batch's payload schema diffs from the table's (ALTER-before-MERGE
      must run under the lease, serially, so the delta conforms to the
      POST-alter schema).

    The files are stamped at ``current_version() + 2`` — the version the
    epoch's own commit lands at when the in-flight previous epoch commits
    first (+1). ``remove_orphan_files`` skips dirs stamped at or above the
    current version, so an in-flight lookahead is never collectable while
    its window is open; a crashed one becomes collectable as soon as the
    version counter passes it.
    """
    epoch = str(epoch)
    if table.is_epoch_applied(epoch):
        return None
    payload_schema = T.StructType(
        [f for f in batch.schema.fields if f.name not in (lsn_col, op_col, "_n_events")]
    )
    evolved, changes = diff_schema(table.schema(), payload_schema, missing=missing)
    if changes:
        return None
    if lww_strategy == "auto":
        lww_strategy = resolve_lww_strategy(
            batch_rows_est, table.spark.sparkContext.defaultParallelism
        )
    new_files, out_dir = _write_mor_delta(
        table, batch, epoch, lsn_col, op_col, salt_partitions, source_name,
        evolved, lww_strategy, batch_rows_bound,
        version=table.current_version() + 2,
    )
    return PreparedDelta(
        epoch=epoch, new_files=new_files, out_dir=out_dir, schema_json=evolved.json()
    )


def _reduce_cow_stats(
    stats,
    prev_counts: dict[int, int],
    prev_keys: dict[int, int],
) -> tuple[
    dict[int, dict[str, int]], dict[str, int], int, list[int],
    dict[int, int], dict[int, int], int, int,
]:
    """Driver-side O(buckets) reduction of the probe's per-bucket stats rows
    into (per_bucket, totals, last_lsn, changed, new_counts, new_keys,
    n_replaced, n_applied). Pure dict arithmetic over one short row per
    TOUCHED bucket — measured well under a second at 64k buckets
    (tests/test_replay.py::test_bucket_stats_loop_scales), so this stays a
    plain loop; were bucket counts to grow past ~10^6 per epoch the whole
    reduction belongs in the Spark agg as a map_agg, not here."""
    per_bucket: dict[int, dict[str, int]] = {}
    totals = {k: 0 for k in (*_ACTIONS, "events_seen")}
    last_lsn = -1
    changed: list[int] = []
    new_counts: dict[int, int] = {}
    new_keys: dict[int, int] = {}
    for r in stats:
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        b = int(d.pop("_bucket"))
        last_lsn = max(last_lsn, int(d.pop("max_lsn")))
        pb = {k: int(v) for k, v in d.items()}
        pb["writes"] = sum(pb[k] for k in _ACTIONS if k != "stale")
        # visible rows carried through unmodified
        pb["kept"] = max(prev_counts.get(b, 0) - pb["updates"] - pb["deletes"], 0)
        per_bucket[b] = pb
        for k in totals:
            totals[k] += pb[k]
        if pb["writes"] > 0:
            changed.append(b)
            new_counts[b] = (
                prev_counts.get(b, 0) + pb["inserts"] + pb["revives"] - pb["deletes"]
            )
            # only brand-new keys change the distinct-key count; every other
            # action replaces (or appends a newer version of) an existing
            # key's row
            new_keys[b] = prev_keys.get(b, 0) + pb["inserts"] + pb["tombstone_inserts"]
    changed.sort()
    # keys whose existing target row (live or tombstone) is displaced
    n_replaced = sum(
        per_bucket[b]["updates"] + per_bucket[b]["deletes"]
        + per_bucket[b]["revives"] + per_bucket[b]["redeletes"]
        for b in changed
    )
    n_applied = sum(per_bucket[b]["writes"] for b in changed)
    return per_bucket, totals, last_lsn, changed, new_counts, new_keys, n_replaced, n_applied


def _merge_into_locked(
    table: LakeTable,
    batch: DataFrame,
    epoch: str,
    lsn_col: str,
    op_col: str,
    salt_partitions: int | None,
    source_name: str,
    lease_owner: str,
    missing: str = "null",
    lww_strategy: str = "narrow",
    batch_rows_bound: int | None = None,
) -> MergeResult:
    timing = os.environ.get("SODES_MERGE_TIMING") == "1"
    marks: list[tuple[str, float]] = [("start", time.time())]

    def mark(label: str) -> None:
        # Phase boundaries double as lease heartbeats: a merge whose wide
        # phases outlast the lease ttl renews here instead of being silently
        # "taken over" mid-write (the commit additionally re-verifies
        # ownership via assert_writer_lease before the pointer flip).
        table.renew_writer_lease(lease_owner)
        if timing:
            marks.append((label, time.time()))

    spark = table.spark
    key = table.key_col
    num_buckets = table.num_buckets
    manifest = table.manifest()
    prev_counts = {int(b): int(c) for b, c in manifest.get("row_counts", {}).items()}
    # distinct-key counts (live + tombstoned): exactly what the probe's
    # include_hidden scan materializes — sizes the broadcast gate. Legacy
    # manifests lack the entry; the visible count is the fallback.
    prev_keys = dict(prev_counts)
    prev_keys.update({int(b): int(c) for b, c in manifest.get("key_counts", {}).items()})
    _sweep_stale_scratch(table)

    # ---- 1. ALTER-before-MERGE: schema-registry diff on the payload schema.
    payload_schema = T.StructType(
        [f for f in batch.schema.fields if f.name not in (lsn_col, op_col, "_n_events")]
    )
    evolved, changes = diff_schema(table.schema(), payload_schema, missing=missing)
    if changes:
        table.alter_schema(evolved, changes)

    # ---- 2. Per-key LWW (A4 kernel), bucket-aligned, spilled to scratch.
    # Guard: unknown ops / NULL LSNs never reach the merge (they'd otherwise
    # apply as upserts with NULL _lsn). The filter fuses into the LWW scan.
    batch = batch.filter(
        F.col(op_col).isin(*VALID_OPS) & F.col(lsn_col).isNotNull() & F.col(key).isNotNull()
    )
    winners_df = _lww_winners(batch, key, lsn_col, salt_partitions, num_buckets,
                              lww_strategy, rows_bound=batch_rows_bound)
    src = winners_df.withColumn("_bucket", bucket_expr(key, num_buckets))
    scratch_dir = table.fs.join(
        table.path, DATA_DIR, f"scratch-{re.sub(r'[^A-Za-z0-9_.-]', '_', epoch)}-{uuid.uuid4().hex[:8]}"
    )
    src.write.partitionBy("_bucket").parquet(scratch_dir)
    unpersist_pinned(winners_df)  # winners are on scratch disk now
    touched = sorted(
        int(d.split("=", 1)[1])
        for d in table.fs.listdir(scratch_dir)
        if d.startswith("_bucket=")
    )
    mark("lww+scratch")

    resolved = None
    try:
        if not touched:  # empty batch: stamp the epoch, move nothing.
            metrics = {
                k: 0
                for k in (
                    "inserts", "updates", "revives", "deletes", "redeletes",
                    "tombstone_inserts", "stale", "events_seen", "events_applied",
                    "conflicts_resolved", "bytes_written", "buckets_touched",
                    "buckets_rewritten",
                )
            }
            metrics["last_lsn"] = -1
            table.assert_writer_lease(lease_owner)
            new_version = table.commit(
                {}, set(), schema=evolved,
                summary={"operation": "merge", "epoch": epoch, "metrics": metrics},
            )
            table.stamp_epoch(epoch, -1, metrics, new_version)
            return MergeResult(
                version=new_version, epoch=epoch, schema_changes=changes, metrics=metrics
            )

        srcr = spark.read.schema(src.schema).parquet(scratch_dir)

        # ---- 3. Narrow key probe: winner keys ⟕ target(key, _lsn) — both
        # sides key-sized, payloads never move. The manifest's per-bucket
        # key counts size the target side FOR FREE (no sizing job): a small
        # side (≤DIRECT_BCAST_MAX keys, live + tombstoned — exactly what
        # this include_hidden scan materializes) broadcasts; a bigger one
        # takes an explicit shuffle-hash of the two NARROW frames — fully
        # parallel, unlike a multi-M-row broadcast relation build, which is
        # serial driver time every epoch (the N→4N scaling cost). Explicit
        # hint, never sort-merge: a sort-merge plan (AQE's occasional pick
        # at borderline sizes) pays two sorts for nothing, and plan
        # flapping makes throughput bimodal.
        tgt_rows_est = sum(prev_keys.get(b, 0) for b in touched)
        tgt_side = _probe_target_side(table, touched, srcr, tgt_rows_est, batch_rows_bound)
        narrow = srcr.select(key, lsn_col, op_col, "_bucket", "_n_events").join(
            tgt_side, on=key, how="left"
        )
        # Action matrix vs (target present?, target tombstone?, op):
        #   insert           no target,        op != delete  → new visible row
        #   tombstone_insert no target,        op == delete  → guard tombstone
        #   revive           target tombstone, op != delete  → visible +1
        #   update           target live,      op != delete  → visible ±0
        #   redelete         target tombstone, op == delete  → refresh tombstone
        #   delete           target live,      op == delete  → visible −1
        #   stale            src.lsn <= target._lsn          → no-op (LWW)
        # Deletes WRITE a tombstone row carrying the deletion LSN — the
        # watermark survives the delete, so a stale update delivered
        # out-of-order after the delete cannot resurrect the key.
        newer = F.col("_t_lsn").isNull() | (F.col(lsn_col) > F.col("_t_lsn"))
        t_missing = F.col("_t_lsn").isNull()
        t_dead = F.coalesce(F.col("_t_del"), F.lit(False))
        is_del = F.col(op_col) == "delete"
        action = (
            F.when(~newer, "stale")
            .when(t_missing & is_del, "tombstone_insert")
            .when(t_missing, "insert")
            .when(t_dead & is_del, "redelete")
            .when(t_dead, "revive")
            .when(is_del, "delete")
            .otherwise("update")
        )
        resolved = (
            narrow.withColumn("_action", action)
            .select(key, lsn_col, "_bucket", "_n_events", "_action")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

        # ---- 4. Per-bucket metrics from the probe (north rule: per-partition
        # lineage + metrics), and the changed-bucket set.
        stats = (
            resolved.groupBy("_bucket")
            .agg(
                *[
                    F.sum(
                        F.when(F.col("_action") == _ACTION_OF[name], 1).otherwise(0)
                    ).alias(name)
                    for name in _ACTIONS
                ],
                F.sum("_n_events").alias("events_seen"),
                F.max(F.col(lsn_col)).alias("max_lsn"),
            )
            .collect()
        )
        mark("probe+stats")

        (
            per_bucket, totals, last_lsn, changed,
            new_counts, new_keys, n_replaced, n_applied,
        ) = _reduce_cow_stats(stats, prev_counts, prev_keys)
        metrics = {
            **totals,
            "events_applied": (
                totals["inserts"] + totals["updates"] + totals["revives"] + totals["deletes"]
            ),
            # superseded within batch (LWW dupes) + superseded by target state
            "conflicts_resolved": (
                totals["events_seen"]
                - sum(pb["writes"] + pb["stale"] for pb in per_bucket.values())
            )
            + totals["stale"],
            "last_lsn": int(last_lsn),
            "buckets_touched": len(touched),
            "buckets_rewritten": len(changed),
        }

        # ---- 5. Copy-on-write rewrite of changed buckets only: key-set
        # filters keep both inputs bucket-clustered end to end. The per-action
        # totals are already in hand, so each filter picks its CHEAPEST form:
        # an empty complement means no join at all (the common replay case —
        # stale==0 ⇒ every winner applies, so srcr passes through untouched),
        # a small set broadcasts, and a large one takes the bloom-prefiltered
        # exact filter (operators.bloom) whose only driver cost is a bitmap —
        # a broadcast hash relation build is O(keys) SERIAL driver time per
        # epoch, the fixed cost that caps N→4N scaling efficiency.
        n_stale = totals["stale"]
        version = table.current_version() + 1
        new_files: dict[int, list[str]] = {}
        bytes_written = 0
        if changed:

            def keyed(action_filter, count: int, base: DataFrame, how: str,
                      base_rows: int) -> DataFrame:
                # Size-tiered EXACT key filter, cost-based on the TOUCH
                # FRACTION (count / base rows — both already known from the
                # probe stats and the manifest, no sizing job):
                #   * ≤DIRECT_BCAST_MAX keys: broadcast — a tiny relation
                #     builds faster than a bitmap job.
                #   * large key set BUT a large fraction of the base (the
                #     bootstrap/backfill shape): broadcast up to the 4M cap —
                #     the bloom form would exchange most of the base's WIDE
                #     rows, which costs more than one serial relation build.
                #   * large key set, small fraction (the 10^10-regime routine
                #     epoch: millions of keys touching a sliver of the
                #     table): bloom_semi/bloom_anti (operators.bloom) — no
                #     O(keys) driver build, bloom-negatives stream exchange-
                #     free, and the exact join's num_buckets partitioning IS
                #     the bucket layout, so the write needs no re-cluster
                #     (the old fallback re-shuffled the ENTIRE rewrite output
                #     past the broadcast cap).
                ks = resolved.filter(action_filter).select(key)
                if count <= _dbm() or (
                    count <= _bkm()
                    and count >= _knob(
                        "SODES_BLOOM_MAX_POSITIVE_FRACTION",
                        BLOOM_MAX_POSITIVE_FRACTION,
                    ) * max(base_rows, 1)
                ):
                    return base.join(F.broadcast(ks), on=key, how=how)
                fn = bloom_anti if how == "left_anti" else bloom_semi
                return fn(base, ks, key, count, num_buckets)

            src_rows = n_applied + n_stale
            if n_stale == 0:
                applied_rows = srcr  # nothing to drop: every LWW winner applies
            elif n_stale <= n_applied:
                # anti on the smaller (stale) set: above DIRECT_BCAST_MAX the
                # bloom form exchanges only ~that set's rows, so always
                # filter by the side that moves less
                applied_rows = keyed(F.col("_action") == "stale", n_stale, srcr,
                                     "left_anti", src_rows)
            else:
                applied_rows = keyed(F.col("_action") != "stale", n_applied, srcr,
                                     "left_semi", src_rows)
            src_lineage = F.concat_ws(
                " | ",
                F.lit(source_name),
                F.concat(F.lit("epoch="), F.lit(epoch)),
                F.concat(F.lit("op="), F.col(op_col)),
                F.concat(F.lit("lsn="), F.col(lsn_col).cast("string")),
            )
            new_rows = applied_rows.select(
                *conform_exprs(srcr, evolved),
                F.col(lsn_col).cast("long").alias(LSN_COL),
                src_lineage.alias(LINEAGE_COL),
                (F.col(op_col) == "delete").alias(DELETED_COL),
                F.col("_bucket"),
            )
            tgt = table.read(buckets=changed, include_hidden=True)
            if n_replaced == 0:
                surviving_rows = tgt  # pure-insert epoch: no target row displaced
            else:
                surviving_rows = keyed(
                    F.col("_action").isin("update", "delete", "revive", "redelete"),
                    n_replaced,
                    tgt,
                    "left_anti",
                    sum(prev_keys.get(b, 0) for b in changed),
                )
            surviving = surviving_rows.select(
                *[F.col(f.name) for f in evolved.fields],
                F.col(LSN_COL),
                F.col(LINEAGE_COL),
                F.col(DELETED_COL),
                bucket_expr(key, num_buckets).alias("_bucket"),
            )
            out = surviving.unionByName(new_rows)
            # every filter path preserves bucket alignment: broadcast and
            # bloom-negative branches stream from per-bucket files, and the
            # bloom exact joins land on num_buckets hash partitions, which
            # ARE the buckets — so no re-cluster before the write, ever
            _, out_dir = table.write_bucket_files(out, version, cluster=False)
            new_files = table.list_bucket_files(out_dir)
            for b, fl in new_files.items():
                nbytes = sum(table.fs.getsize(table.fs.join(table.path, f)) for f in fl)
                per_bucket.setdefault(b, {})["bytes_written"] = nbytes
                bytes_written += nbytes
        metrics["bytes_written"] = bytes_written
        mark("write")

        table.assert_writer_lease(lease_owner)
        new_version = table.commit(
            new_files,
            replaced_buckets=set(changed),
            schema=evolved,
            summary={
                "operation": "merge",
                "epoch": epoch,
                "metrics": metrics,
                "per_bucket": {str(b): v for b, v in per_bucket.items()},
                "schema_changes": changes,
            },
            row_counts_update=new_counts,
            key_counts_update=new_keys,
            # Per-epoch stats are OPT-IN (write.file_stats.on_merge): fresh
            # epoch files are small, soon compacted, and kept-unconditionally
            # by the skipper when statless — not worth +1 footer job/epoch.
            # compact/vacuum/overwrite (the long-lived files) always stamp.
            file_stats_update=(
                table.stats_for_commit(new_files)
                if table.properties().get("write.file_stats.on_merge") else None
            ),
        )
        table.stamp_epoch(epoch, metrics["last_lsn"], metrics, new_version)
        mark("commit")
    finally:
        if resolved is not None:
            resolved.unpersist()
        table.fs.rmtree(scratch_dir)
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


def _merge_mor_locked(
    table: LakeTable,
    batch: DataFrame,
    epoch: str,
    lsn_col: str,
    op_col: str,
    salt_partitions: int | None,
    source_name: str,
    lease_owner: str,
    missing: str = "null",
    lww_strategy: str = "narrow",
    batch_rows_bound: int | None = None,
    prepared: PreparedDelta | None = None,
) -> MergeResult:
    """Merge-on-read apply: ONE payload write per epoch.

    The batch's LWW winners are written directly as final per-bucket delta
    files — already carrying the physical hidden columns — and the commit
    APPENDS them to the touched buckets (``LakeTable.commit(append=True)``),
    marking those buckets merge-on-read; readers resolve per-key LWW until
    compaction rewrites them. Compared to the cow path this removes both the
    scratch round-trip and the changed-bucket rewrite: write cost is
    O(batch) regardless of how much of the table the batch touches, which is
    what keeps sustained ingest flat at the 10^10-event scale (an epoch that
    touches every bucket would otherwise rewrite the full table each time).

    The narrow metrics probe (winner keys vs the CURRENT resolved target
    keys) is unchanged, so per-bucket metrics, ``conflicts_resolved``, and
    the exactly-once stamp are bit-compatible with the cow path. Stale
    winners are appended too — per-key LWW resolution makes them harmless by
    construction — and simply counted as ``stale``.

    Delta files additionally carry a transient ``_n_events`` column (the
    per-key collapsed-event count feeding ``events_seen``); table readers
    never see it because every read uses an explicit manifest schema.
    """
    timing = os.environ.get("SODES_MERGE_TIMING") == "1"
    marks: list[tuple[str, float]] = [("start", time.time())]

    def mark(label: str) -> None:
        table.renew_writer_lease(lease_owner)
        if timing:
            marks.append((label, time.time()))

    spark = table.spark
    key = table.key_col
    num_buckets = table.num_buckets
    manifest = table.manifest()
    prev_counts = {int(b): int(c) for b, c in manifest.get("row_counts", {}).items()}
    prev_keys = dict(prev_counts)  # distinct keys; cf. the cow path
    prev_keys.update({int(b): int(c) for b, c in manifest.get("key_counts", {}).items()})
    _sweep_stale_scratch(table)

    # ---- 1. ALTER-before-MERGE (identical to the cow path).
    payload_schema = T.StructType(
        [f for f in batch.schema.fields if f.name not in (lsn_col, op_col, "_n_events")]
    )
    evolved, changes = diff_schema(table.schema(), payload_schema, missing=missing)
    if changes:
        table.alter_schema(evolved, changes)

    # ---- 2. LWW winners written ONCE as final delta files (hidden cols
    # stamped in the same projection; the window exchange is bucket-aligned
    # so each task streams straight into its bucket dir). A pipelined
    # lookahead may have written these files already — consume them iff the
    # schema it conformed to is still the table's evolved schema (re-checked
    # HERE, under the lease); otherwise the lookahead is stale: discard and
    # rewrite.
    if (
        prepared is not None
        and prepared.epoch == epoch
        and not changes
        and prepared.schema_json == evolved.json()
    ):
        new_files = prepared.new_files
    else:
        if prepared is not None:
            prepared.discard(table)
        new_files, _ = _write_mor_delta(
            table, batch, epoch, lsn_col, op_col, salt_partitions, source_name,
            evolved, lww_strategy, batch_rows_bound,
            version=table.current_version() + 1,
        )
    touched = sorted(new_files)
    mark("lww+delta")

    if not touched:  # empty batch: stamp the epoch, move nothing.
        metrics = {k: 0 for k in (*_ACTIONS, "events_seen", "events_applied",
                                  "conflicts_resolved", "bytes_written",
                                  "buckets_touched", "buckets_rewritten",
                                  "buckets_appended")}
        metrics["last_lsn"] = -1
        table.assert_writer_lease(lease_owner)
        new_version = table.commit(
            {}, set(), schema=evolved,
            summary={"operation": "merge-mor", "epoch": epoch, "metrics": metrics},
        )
        table.stamp_epoch(epoch, -1, metrics, new_version)
        return MergeResult(
            version=new_version, epoch=epoch, schema_changes=changes, metrics=metrics
        )

    # ---- 3. Narrow metrics probe: delta winner keys vs the CURRENT resolved
    # target keys — classification only, nothing downstream consumes it, so
    # it is one aggregation job with no persist. Reading a mor bucket's keys
    # applies LWW resolution inside LakeTable.read.
    delta_files = [table.fs.join(table.path, f) for fl in new_files.values() for f in fl]
    narrow_schema = T.StructType(
        [
            next(f for f in evolved.fields if f.name == key),
            T.StructField(LSN_COL, T.LongType(), True),
            T.StructField(DELETED_COL, T.BooleanType(), True),
            T.StructField("_n_events", T.LongType(), True),
        ]
    )
    srcn = (
        spark.read.schema(narrow_schema)
        .parquet(*delta_files)
        .withColumn("_bucket", bucket_expr(key, num_buckets))
    )
    # manifest-sized broadcast, same policy as the cow probe: the target side
    # is known small for free (distinct keys = rows the resolved include_hidden
    # scan materializes), so the delta side streams with no exchange; past the
    # broadcast cap the shared helper prunes by the winner keys instead.
    tgt_rows_est = sum(prev_keys.get(b, 0) for b in touched)
    tgt_side = _probe_target_side(table, touched, srcn, tgt_rows_est, batch_rows_bound)
    narrow = srcn.join(tgt_side, on=key, how="left")
    newer = F.col("_t_lsn").isNull() | (F.col(LSN_COL) > F.col("_t_lsn"))
    t_missing = F.col("_t_lsn").isNull()
    t_dead = F.coalesce(F.col("_t_del"), F.lit(False))
    is_del = F.coalesce(F.col(DELETED_COL), F.lit(False))
    action = (
        F.when(~newer, "stale")
        .when(t_missing & is_del, "tombstone_insert")
        .when(t_missing, "insert")
        .when(t_dead & is_del, "redelete")
        .when(t_dead, "revive")
        .when(is_del, "delete")
        .otherwise("update")
    )
    stats = (
        narrow.withColumn("_action", action)
        .groupBy("_bucket")
        .agg(
            *[
                F.sum(F.when(F.col("_action") == _ACTION_OF[name], 1).otherwise(0)).alias(name)
                for name in _ACTIONS
            ],
            F.sum("_n_events").alias("events_seen"),
            F.max(F.col(LSN_COL)).alias("max_lsn"),
        )
        .collect()
    )
    mark("probe+stats")

    per_bucket: dict[int, dict[str, int]] = {}
    totals = {k: 0 for k in (*_ACTIONS, "events_seen")}
    last_lsn = -1
    new_counts: dict[int, int] = {}
    new_keys: dict[int, int] = {}
    bytes_written = 0
    for r in stats:
        d = r.asDict()
        b = int(d.pop("_bucket"))
        last_lsn = max(last_lsn, int(d.pop("max_lsn")))
        pb = {k: int(v) for k, v in d.items()}
        pb["writes"] = sum(pb[k] for k in _ACTIONS if k != "stale")
        pb["kept"] = max(prev_counts.get(b, 0) - pb["updates"] - pb["deletes"], 0)
        nbytes = sum(
            table.fs.getsize(table.fs.join(table.path, f)) for f in new_files.get(b, [])
        )
        pb["bytes_written"] = nbytes
        bytes_written += nbytes
        per_bucket[b] = pb
        for k in totals:
            totals[k] += pb[k]
        new_counts[b] = (
            prev_counts.get(b, 0) + pb["inserts"] + pb["revives"] - pb["deletes"]
        )
        new_keys[b] = prev_keys.get(b, 0) + pb["inserts"] + pb["tombstone_inserts"]
    metrics = {
        **totals,
        "events_applied": (
            totals["inserts"] + totals["updates"] + totals["revives"] + totals["deletes"]
        ),
        "conflicts_resolved": (
            totals["events_seen"]
            - sum(pb["writes"] + pb["stale"] for pb in per_bucket.values())
        )
        + totals["stale"],
        "last_lsn": int(last_lsn),
        "bytes_written": bytes_written,
        "buckets_touched": len(touched),
        "buckets_rewritten": 0,
        "buckets_appended": len(touched),
    }

    table.assert_writer_lease(lease_owner)
    new_version = table.commit(
        new_files,
        replaced_buckets=set(),
        schema=evolved,
        summary={
            "operation": "merge-mor",
            "epoch": epoch,
            "metrics": metrics,
            "per_bucket": {str(b): v for b, v in per_bucket.items()},
            "schema_changes": changes,
        },
        row_counts_update=new_counts,
        key_counts_update=new_keys,
        append=True,
        file_stats_update=(
            table.stats_for_commit(new_files)
            if table.properties().get("write.file_stats.on_merge") else None
        ),
    )
    table.stamp_epoch(epoch, metrics["last_lsn"], metrics, new_version)
    mark("commit")
    if timing:
        spans = ", ".join(
            f"{label}={t - prev:.2f}s" for (label, t), (_, prev) in zip(marks[1:], marks)
        )
        print(f"[merge_mor epoch={epoch}] {spans}")
    return MergeResult(
        version=new_version,
        epoch=epoch,
        schema_changes=changes,
        metrics=metrics,
        per_bucket=per_bucket,
    )
