"""Structured-Streaming changelog tail → LakeTable MERGE sink.

The live-tail counterpart of ``plans.replay``: a file-source stream (the
binlog directory) feeds ``foreachBatch``; each micro-batch goes through the
same ``merge_into`` path, so LWW resolution, schema evolution, metrics, and
exactly-once stamping are identical between batch replay and streaming tail.

Exactly-once composition: Spark's streaming checkpoint gives at-least-once
``foreachBatch`` invocations with a stable ``batch_id``; ``merge_into``'s
epoch stamp (``stream:{id}``) turns re-invocations into no-ops — the standard
idempotent-sink construction. No watermark state is needed: the per-row
``_lsn`` high-water mark in the target table makes late/out-of-order events
self-correcting (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql import types as T

from ..plans.maintenance import MaintenancePolicy, run_maintenance
from ..plans.merge import merge_into
from ..sources.lake import LakeTable

CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


def stream_changelog_from(
    events: DataFrame,
    table: LakeTable,
    checkpoint_dir: str,
    trigger_once: bool = False,
    salt_partitions: int | None = None,
    epoch_prefix: str = "stream",
    mode: str = "cow",
    maintenance: "MaintenancePolicy | None" = None,
    views: list | None = None,
    max_batch_rows: int | None = None,
    sparse_updates: bool = False,
) -> StreamingQuery:
    """MERGE-sink for ANY streaming DataFrame of changelog events
    ``(lsn, op, <payload>)`` — the source-agnostic seam. A Kafka topic plugs
    in as::

        raw = (spark.readStream.format("kafka")
               .option("kafka.bootstrap.servers", ...)
               .option("subscribe", topic).load()
               .select(F.col("value").cast("string").alias("value")))
        stream_changelog_from(parse_json_changelog(raw), table, ckpt)

    and a socket/rate source the same way (exercised in the test suite —
    no Kafka broker exists in this sandbox). Exactly-once is source-
    independent: the checkpoint provides a stable ``batch_id``; the epoch
    stamp makes re-delivered batches no-ops.

    ``maintenance`` runs a compaction/snapshot-GC sweep every
    ``every_epochs`` applied batches, so a long-running tail keeps file
    counts bounded without an external scheduler. The policy's ``vacuum``
    flag is IGNORED here: streaming batches carry no LSN-ordering guarantee,
    so a safe tombstone watermark must come from the upstream (call
    ``vacuum_tombstones`` explicitly with it).

    ``views`` chains persisted materialized views onto the same tail: each
    entry is ``(view_table, consumer, group_cols, sum_cols)`` (from
    ``plans.mv.materialize_view`` over ``table``) and is refreshed after
    every applied batch — binlog → table → view in one streaming pipeline.
    ``refresh_view`` is itself exactly-once (position-keyed ledger epochs),
    so redelivered batches and crashes anywhere in the chain stay safe."""
    applied = {"n": 0}

    def apply_batch(batch_df, batch_id: int) -> None:
        from ..plans.mv import refresh_view

        res = merge_into(
            table,
            batch_df,
            epoch=f"{epoch_prefix}:{batch_id}",
            salt_partitions=salt_partitions,
            source_name=epoch_prefix,
            mode=mode,
            # A hard per-trigger row bound (Kafka maxOffsetsPerTrigger, file
            # sources with bounded files × rows, rate source rowsPerSecond ×
            # trigger) unlocks the bound-gated fast paths: the narrow
            # kernel's probe-free winner broadcast and the batch-keyed
            # metrics-probe pruning. Leave None when the source can't bound
            # a trigger — merge falls back to its probe-based guards.
            batch_rows_bound=max_batch_rows,
            # Debezium-style partial images (update NULL = unchanged) fold
            # to full rows under the lease — plans.merge.densify_sparse_batch
            sparse_updates=sparse_updates,
        )
        for view, consumer, group_cols, sum_cols in views or []:
            refresh_view(view, consumer, group_cols, sum_cols)
        if maintenance is not None and maintenance.every_epochs and not res.skipped:
            applied["n"] += 1
            if applied["n"] >= maintenance.every_epochs:
                run_maintenance(table, maintenance, watermark_lsn=None)
                applied["n"] = 0

    writer = events.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_changelog_kafka(
    spark: SparkSession,
    table: LakeTable,
    checkpoint_dir: str,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    payload_schema: T.StructType | None = None,
    trigger_once: bool = False,
    salt_partitions: int | None = None,
    mode: str = "cow",
    maintenance: "MaintenancePolicy | None" = None,
    source_format: str = "kafka",
    sparse_updates: bool = False,
    **source_options: str,
) -> StreamingQuery:
    """Tail a Kafka topic of Debezium-ish JSON envelopes and MERGE each
    micro-batch — the concrete wiring of the docstring sketch above.

    The topic's ``value`` bytes are parsed by ``parse_json_changelog`` (the
    same envelope adapter the file/rate paths use), so dead-letter handling,
    LWW, schema evolution, and the exactly-once epoch stamp are identical
    across sources. Kafka partitions/offsets need no bookkeeping here:
    Spark's checkpoint owns them, and the per-key LSN inside the envelope —
    not the Kafka offset — orders conflicting events, so a repartitioned or
    multi-partition topic (no global order) is still correct by LWW.

    ``source_format``/``source_options`` exist for brokerless tests: a
    ``socket`` (or any) source emitting one JSON envelope per line in a
    ``value`` string column is wire-compatible, which is exactly what the
    test suite uses — this sandbox ships no Kafka broker or
    spark-sql-kafka package. On a real cluster the default format is the
    built-in ``kafka`` source (requires the spark-sql-kafka-0-10 package on
    the classpath).
    """
    from ..sources.json_changelog import DEFAULT_PAYLOAD, parse_json_changelog

    reader = spark.readStream.format(source_format)
    if source_format == "kafka":
        reader = (
            reader.option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
        )
    for k, v in source_options.items():
        reader = reader.option(k, v)
    raw = reader.load().select(F.col("value").cast("string").alias("value"))
    events = parse_json_changelog(raw, payload=payload_schema or DEFAULT_PAYLOAD)
    return stream_changelog_from(
        events, table, checkpoint_dir,
        trigger_once=trigger_once, salt_partitions=salt_partitions,
        epoch_prefix=f"{source_format}:{topic}" if topic else source_format,
        mode=mode, maintenance=maintenance,
        max_batch_rows=_trigger_row_bound(source_format, source_options),
        sparse_updates=sparse_updates,
    )


def _trigger_row_bound(source_format: str, source_options: dict) -> int | None:
    """Per-trigger HARD record bound derivable from the source config, or
    None. kafka's maxOffsetsPerTrigger qualifies (one record = at most one
    event). Non-kafka stand-ins (socket/rate/file) silently IGNORE that
    option, so forwarding it would hand the merge an unenforced "bound" and
    defeat the broadcast guards it feeds — an under-report is worse than no
    bound."""
    if source_format != "kafka":
        return None
    b = source_options.get("maxOffsetsPerTrigger")
    return int(b) if b is not None else None


def stream_changelog(
    spark: SparkSession,
    table: LakeTable,
    changelog_dir: str,
    checkpoint_dir: str,
    schema: T.StructType | None = None,
    trigger_once: bool = False,
    salt_partitions: int | None = None,
    max_files_per_trigger: int | None = None,
    maintenance: "MaintenancePolicy | None" = None,
) -> StreamingQuery:
    """Tail ``changelog_dir`` (parquet files) and MERGE each micro-batch."""
    reader = spark.readStream.schema(schema or CHANGELOG_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(changelog_dir)
    return stream_changelog_from(
        stream, table, checkpoint_dir,
        trigger_once=trigger_once, salt_partitions=salt_partitions,
        maintenance=maintenance,
    )
