"""Structured-Streaming changelog tail: stream == batch replay semantics."""

import os
import time

import pytest
from pyspark.sql import functions as F

from standardized_omop_data_etl_spark.sources.generators import base_sequences, change_log
from standardized_omop_data_etl_spark.sources.lake import LakeTable
from standardized_omop_data_etl_spark.sources.oracle import canonicalize, expected_final_state
from standardized_omop_data_etl_spark.streaming.changelog import stream_changelog


@pytest.mark.timeout(300)
def test_stream_matches_oracle(spark, tmp_path):
    base = base_sequences(spark, 200, seed=11, max_len=32)
    log = change_log(spark, 600, 200, seed=11, max_len=32)
    base_pdf, log_pdf = base.toPandas(), log.toPandas()

    # binlog dir: three "segments" arriving as files
    log_dir = str(tmp_path / "binlog")
    os.makedirs(log_dir)
    for i, (lo, hi) in enumerate([(0, 200), (200, 400), (400, 600)]):
        log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)).coalesce(1).write.parquet(
            f"{log_dir}/seg{i}.parquet"
        )

    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), schema=base.schema, key_col="doc_id",
        num_buckets=4, overwrite=True,
    )
    tbl.overwrite_full(base)

    q = stream_changelog(
        spark, tbl, log_dir + "/*", str(tmp_path / "ckpt"), trigger_once=True,
        max_files_per_trigger=1,
    )
    q.awaitTermination(240)

    got = canonicalize(tbl.read().toPandas())
    exp = canonicalize(expected_final_state(base_pdf, log_pdf))
    assert len(got) == len(exp)
    assert got.equals(exp), "stream-applied state != oracle"

    # restart the stream with the same checkpoint: no new data → no change
    v = tbl.current_version()
    q2 = stream_changelog(
        spark, tbl, log_dir + "/*", str(tmp_path / "ckpt"), trigger_once=True
    )
    q2.awaitTermination(120)
    assert tbl.current_version() == v


@pytest.mark.timeout(300)
def test_windowed_counts_drop_late_events(spark, tmp_path):
    """Append-mode watermark semantics: an event later than the watermark
    delay past its window close is dropped from the finalized window."""
    from standardized_omop_data_etl_spark.streaming.windowed import windowed_event_counts

    schema = "ts timestamp, source string"
    seg_dir = str(tmp_path / "segs")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(seg_dir)

    def write_seg(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(f"{seg_dir}/{name}")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(seg_dir + "/*")
        agg = windowed_event_counts(stream, window_duration="10 seconds",
                                    watermark_delay="10 seconds")
        q = (agg.writeStream.outputMode("append").format("parquet")
             .option("path", out_dir).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    import datetime as dt
    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    # seg1: 3 events in window [0,10) + one at :40 that pushes the watermark
    # past [0,10)'s close (40 - 10s delay = :30)
    write_seg("seg1", [(t(1), "web"), (t(2), "web"), (t(5), "books"), (t(40), "web")])
    run_once()
    # seg2: a LATE event for [0,10) (beyond watermark -> must be dropped) and
    # fresh events at :50 (advance watermark so [40,50) could finalize later)
    write_seg("seg2", [(t(6), "web"), (t(50), "books"), (t(51), "web")])
    run_once()

    got = {
        (str(r["window_start"])[-8:], r["source"]): r["n_events"]
        for r in spark.read.parquet(out_dir).collect()
    }
    # [0,10) was finalized with seg1's counts only: the late (t6, web) event
    # did NOT bump web's count from 2 to 3
    assert got[("00:00:00", "web")] == 2
    assert got[("00:00:00", "books")] == 1


@pytest.mark.timeout(300)
def test_stateful_compactor_emits_only_frontier_advances(spark, tmp_path):
    """applyInPandasWithState changelog compactor: per key, each micro-batch
    emits at most the batch's max-LSN event, and only when it advances the
    key's running high-water mark; the final emission per key equals the
    batch LWW winner."""
    from standardized_omop_data_etl_spark.operators.lww import lww_latest
    from standardized_omop_data_etl_spark.sources.generators import change_log
    from standardized_omop_data_etl_spark.streaming.stateful import (
        compact_changelog_stream,
    )

    log = change_log(spark, 300, 60, seed=13, max_len=8)
    seg_dir = str(tmp_path / "segs")
    os.makedirs(seg_dir)
    # segment 2 carries an out-of-order, already-superseded slice (its lsns
    # are below segment 1's) — the compactor must emit nothing for keys
    # whose frontier it does not advance
    segs = [(200, 300), (0, 150), (150, 200)]
    for i, (lo, hi) in enumerate(segs):
        log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)).coalesce(1).write.parquet(
            f"{seg_dir}/seg{i}.parquet"
        )

    stream = spark.readStream.schema(log.schema).parquet(seg_dir + "/*")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        compact_changelog_stream(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    emitted = spark.read.schema(log.schema).parquet(out_dir).toPandas()
    emitted = emitted[emitted["doc_id"].notna()]
    # per key: strictly increasing lsn across emissions, <= one per batch
    for doc, grp in emitted.groupby("doc_id"):
        lsns = list(grp.sort_values("lsn")["lsn"])
        assert lsns == sorted(set(lsns)) and len(lsns) <= len(segs)
    # final emission per key == batch LWW winner over the whole log
    final = {d: int(g["lsn"].max()) for d, g in emitted.groupby("doc_id")}
    want = {
        r["doc_id"]: r["lsn"]
        for r in lww_latest(log, "doc_id", "lsn").collect()
    }
    assert final == want


def test_rate_source_json_changelog_end_to_end(spark, tmp_path):
    """Non-file streaming source: the built-in rate source emits monotone
    ``value`` longs; each is wrapped into a Debezium-ish JSON envelope IN the
    streaming plan, parsed back by ``parse_json_changelog``, and merged via
    ``stream_changelog_from`` — proving the adapter + MERGE sink compose
    outside file sources (a Kafka topic differs only in the reader)."""
    import time as _time

    from pyspark.sql import functions as F, types as T

    from standardized_omop_data_etl_spark.sources.json_changelog import (
        parse_json_changelog,
    )
    from standardized_omop_data_etl_spark.sources.lake import LakeTable
    from standardized_omop_data_etl_spark.streaming import stream_changelog_from

    payload = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("n", T.LongType())]
    )
    tbl = LakeTable.create(
        spark, str(tmp_path / "rate_tbl"), schema=payload, key_col="doc_id",
        num_buckets=4, overwrite=True,
    )

    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 400)
        .load()
        .select(
            F.to_json(
                F.struct(
                    F.lit("c").alias("op"),
                    (F.col("value") * 10).alias("ts_ms"),
                    F.struct(F.col("value").alias("lsn")).alias("source"),
                    F.lit(None).cast(payload).alias("before"),
                    F.struct(
                        F.concat(F.lit("doc-"), F.col("value")).alias("doc_id"),
                        (F.col("value") * 2).alias("n"),
                    ).alias("after"),
                )
            ).alias("value")
        )
    )
    events = parse_json_changelog(raw, payload=payload)
    q = stream_changelog_from(
        events, tbl, str(tmp_path / "rate_ckpt"), epoch_prefix="rate"
    )
    try:
        # rate keeps producing forever; stop once >=200 events have merged
        deadline = _time.time() + 120
        last_lsn = -1
        while _time.time() < deadline:
            recs = tbl.applied_epochs()
            last_lsn = max(
                (int(r.get("last_lsn", -1)) for r in recs.values()), default=-1
            )
            if last_lsn >= 200:
                break
            _time.sleep(1.0)
        assert last_lsn >= 200, f"stream never reached 200 events (lsn={last_lsn})"
    finally:
        q.stop()

    # every lsn ≤ the stamped high-water mark merged exactly once: doc ids
    # are unique per lsn, so visible rows == contiguous applied prefix
    applied = sorted(
        int(r["last_lsn"]) for r in tbl.applied_epochs().values() if int(r["last_lsn"]) >= 0
    )
    got = tbl.read().select("doc_id", "n").collect()
    assert len(got) == applied[-1] + 1
    by_id = {r["doc_id"]: r["n"] for r in got}
    assert by_id["doc-0"] == 0 and by_id[f"doc-{applied[-1]}"] == applied[-1] * 2


@pytest.mark.timeout(300)
def test_socket_source_through_kafka_wiring(spark, tmp_path):
    """Brokerless stand-in for the Kafka path: stream_changelog_kafka with
    source_format='socket' consumes one JSON envelope per line from a live
    TCP server — same value-column shape a Kafka topic delivers — through
    parse_json_changelog and the MERGE sink. Covers inserts, updates, a
    delete, and dead-letter lines (broken JSON / unknown op) arriving
    interleaved on the wire."""
    import json as _json
    import socket
    import threading
    import time as _time

    from pyspark.sql import types as T

    from standardized_omop_data_etl_spark.streaming.changelog import (
        stream_changelog_kafka,
    )

    payload = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("n", T.LongType())]
    )
    tbl = LakeTable.create(
        spark, str(tmp_path / "sock_tbl"), schema=payload, key_col="doc_id",
        num_buckets=4, overwrite=True,
    )

    def env(op, lsn, doc, n=None):
        body = {"doc_id": doc, "n": n}
        return _json.dumps(
            {
                "op": op,
                "ts_ms": lsn * 10,
                "source": {"lsn": lsn},
                "before": body if op == "d" else None,
                "after": None if op == "d" else body,
            }
        )

    lines = [env("c", i, f"doc-{i % 10}", i) for i in range(20)]  # 2 rounds
    lines.insert(7, "this is not json")               # dead letter: parse fail
    lines.insert(13, env("zz", 55, "doc-3", 3))        # dead letter: unknown op
    lines.append(env("d", 100, "doc-0"))               # tombstone doc-0

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve():
        conn, _ = srv.accept()
        conn.sendall(("\n".join(lines) + "\n").encode())
        stop.wait(180)  # keep the connection open until the test is done
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    q = stream_changelog_kafka(
        spark, tbl, str(tmp_path / "sock_ckpt"),
        bootstrap_servers="", topic="t0", payload_schema=payload,
        source_format="socket", host="127.0.0.1", port=str(port),
    )
    try:
        deadline = _time.time() + 120
        while _time.time() < deadline:
            recs = tbl.applied_epochs()
            if max((int(r.get("last_lsn", -1)) for r in recs.values()), default=-1) >= 100:
                break
            _time.sleep(1.0)
        got = {r["doc_id"]: r["n"] for r in tbl.read().collect()}
    finally:
        stop.set()
        q.stop()
        srv.close()

    # LWW winners: doc-k keeps n from its second round (lsn 10+k); doc-0 deleted
    assert got == {f"doc-{k}": 10 + k for k in range(1, 10)}, got
    # dead-letter lines (lsn 55 unknown-op) never merged: doc-3 kept its winner
    assert got["doc-3"] == 13


@pytest.mark.timeout(300)
def test_streaming_chained_materialized_view(spark, tmp_path):
    """binlog → table → persisted view in ONE streaming pipeline: the MERGE
    foreachBatch chains refresh_view per applied batch; after the tail
    drains, the view equals a from-scratch re-aggregate of the table."""
    import os

    import pandas as pd

    from standardized_omop_data_etl_spark.plans.mv import (
        MV_KEY_COL,
        bootstrap_agg,
        materialize_view,
    )
    from standardized_omop_data_etl_spark.sources.generators import (
        base_sequences,
        change_log,
    )
    from standardized_omop_data_etl_spark.sources.lake import LakeTable
    from standardized_omop_data_etl_spark.streaming import stream_changelog_from

    base = base_sequences(spark, 150, seed=21, max_len=24)
    log = change_log(spark, 600, 150, seed=21, max_len=24)
    log_dir = str(tmp_path / "binlog")
    os.makedirs(log_dir)
    for i, (lo, hi) in enumerate([(0, 300), (300, 600)]):
        log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)).coalesce(
            1
        ).write.parquet(f"{log_dir}/seg{i}.parquet")

    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), schema=base.schema, key_col="doc_id",
        num_buckets=4, overwrite=True,
    )
    tbl.overwrite_full(base)
    view, consumer = materialize_view(
        spark, str(tmp_path / "v"), tbl, ["source"], ["n_tok"], name="sv"
    )

    stream = spark.readStream.schema(log.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(log_dir + "/*")
    q = stream_changelog_from(
        stream, tbl, str(tmp_path / "ckpt"), trigger_once=True,
        views=[(view, consumer, ["source"], ["n_tok"])],
    )
    q.awaitTermination(240)

    got = (
        view.read().drop(MV_KEY_COL).toPandas()
        .sort_values("source").reset_index(drop=True)
    )
    want = (
        bootstrap_agg(tbl.read(), ["source"], ["n_tok"]).toPandas()
        .sort_values("source").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # restart on the same checkpoint: no new files -> table AND view stable
    v_t, v_v = tbl.current_version(), view.current_version()
    q2 = stream_changelog_from(
        stream, tbl, str(tmp_path / "ckpt"), trigger_once=True,
        views=[(view, consumer, ["source"], ["n_tok"])],
    )
    q2.awaitTermination(120)
    assert (tbl.current_version(), view.current_version()) == (v_t, v_v)


def test_kafka_wiring_forwards_trigger_bound(spark, tmp_path, monkeypatch):
    """maxOffsetsPerTrigger is a hard per-trigger record bound; the kafka
    wiring must forward it as max_batch_rows so every micro-batch merge gets
    the bound-gated fast paths (probe-free winner broadcast, batch-keyed
    probe pruning). No broker needed: the forwarding is asserted at the
    stream_changelog_from seam, and the bound's arrival at merge_into is
    asserted with a one-batch file stream."""
    from pyspark.sql import types as T

    from standardized_omop_data_etl_spark.sources.lake import LakeTable
    from standardized_omop_data_etl_spark.streaming import changelog as ch

    # 1. the bound derivation: HARD for kafka, refused for stand-in sources
    # that silently ignore maxOffsetsPerTrigger (an unenforced bound would
    # defeat the broadcast guards it feeds)
    assert ch._trigger_row_bound("kafka", {"maxOffsetsPerTrigger": "12345"}) == 12345
    assert ch._trigger_row_bound("kafka", {}) is None
    for fake_src in ("rate", "socket", "parquet"):
        assert ch._trigger_row_bound(fake_src, {"maxOffsetsPerTrigger": "12345"}) is None

    # and the wiring passes it through to stream_changelog_from
    seen = {}

    def fake_from(events, table, ckpt, **kw):
        seen.update(kw)

        class _Q:  # minimal StreamingQuery stand-in
            def stop(self):
                pass

        return _Q()

    monkeypatch.setattr(ch, "stream_changelog_from", fake_from)
    ch.stream_changelog_kafka(
        spark, table=None, checkpoint_dir=str(tmp_path / "ck"),
        bootstrap_servers="", topic="", source_format="rate",
        rowsPerSecond="10", maxOffsetsPerTrigger="12345",
    )
    assert seen.get("max_batch_rows") is None  # rate ignores the option
    monkeypatch.undo()

    # 2. stream_changelog_from(max_batch_rows=) -> merge_into(batch_rows_bound=)
    bounds = []
    real_merge = ch.merge_into

    def spy_merge(table, batch, **kw):
        bounds.append(kw.get("batch_rows_bound"))
        return real_merge(table, batch, **kw)

    monkeypatch.setattr(ch, "merge_into", spy_merge)
    schema = T.StructType(
        [
            T.StructField("lsn", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
    src = tmp_path / "bound_src"
    src.mkdir()
    spark.createDataFrame(
        [(i, "upsert", f"d{i}", i) for i in range(20)], schema
    ).coalesce(1).write.mode("overwrite").parquet(str(src))
    tbl = LakeTable.create(
        spark, str(tmp_path / "bound_tbl"),
        schema=T.StructType([f for f in schema.fields if f.name not in ("lsn", "op")]),
        key_col="doc_id", num_buckets=4, overwrite=True,
    )
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = ch.stream_changelog_from(
        stream, tbl, str(tmp_path / "bound_ckpt"), trigger_once=True,
        max_batch_rows=777,
    )
    q.awaitTermination(120)
    assert bounds and all(b == 777 for b in bounds)
    assert tbl.read().count() == 20
