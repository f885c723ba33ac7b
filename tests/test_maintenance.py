"""snapshot_diff (CDC-out), rebucket, and the JSON changelog adapter."""

import pandas as pd
from pyspark.sql import functions as F

from standardized_omop_data_etl_spark.plans.maintenance import rebucket, snapshot_diff
from standardized_omop_data_etl_spark.plans.replay import replay_log
from standardized_omop_data_etl_spark.sources.generators import base_sequences, change_log
from standardized_omop_data_etl_spark.sources.json_changelog import (
    parse_json_changelog,
    to_json_changelog,
)
from standardized_omop_data_etl_spark.sources.lake import LakeTable
from standardized_omop_data_etl_spark.sources.oracle import canonicalize, expected_final_state


def _table(spark, tmp_path, base, buckets=8):
    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), schema=base.schema, key_col="doc_id",
        num_buckets=buckets, overwrite=True,
    )
    tbl.overwrite_full(base)
    return tbl


def test_snapshot_diff_roundtrip(spark, tmp_path):
    """Applying the diff between v_pre and v_post onto a copy of v_pre
    reproduces v_post exactly — CDC-out feeds CDC-in."""
    base = base_sequences(spark, 150, seed=3, max_len=24)
    log = change_log(spark, 500, 150, seed=3, max_len=24)
    tbl = _table(spark, tmp_path, base)
    v_pre = tbl.current_version()
    replay_log(tbl, log, num_epochs=1)
    v_post = tbl.current_version()

    diff = snapshot_diff(tbl, v_pre, v_post)
    ops = {r["op"] for r in diff.select("op").distinct().collect()}
    assert ops <= {"insert", "update", "delete"} and ops

    # replay the diff into a fresh copy of the pre state
    copy = LakeTable.create(
        spark, str(tmp_path / "copy"), schema=base.schema, key_col="doc_id",
        num_buckets=8, overwrite=True,
    )
    copy.overwrite_full(base)
    from standardized_omop_data_etl_spark.plans.merge import merge_into

    merge_into(copy, diff, epoch="cdc-out-roundtrip")
    got = canonicalize(copy.read().toPandas())
    want = canonicalize(tbl.read().toPandas())
    pd.testing.assert_frame_equal(got, want)


def test_snapshot_diff_no_change(spark, tmp_path):
    base = base_sequences(spark, 50, seed=4, max_len=16)
    tbl = _table(spark, tmp_path, base)
    v = tbl.current_version()
    assert snapshot_diff(tbl, v, v).count() == 0


def test_rebucket_preserves_state(spark, tmp_path):
    base = base_sequences(spark, 200, seed=5, max_len=16)
    log = change_log(spark, 400, 200, seed=5, max_len=16)
    tbl = _table(spark, tmp_path, base, buckets=4)
    before = canonicalize(tbl.read().toPandas())
    rebucket(tbl, 16)
    assert tbl.num_buckets == 16
    after = canonicalize(tbl.read().toPandas())
    pd.testing.assert_frame_equal(before, after)
    # merges keep working at the new layout and match the oracle
    replay_log(tbl, log, num_epochs=2)
    want = canonicalize(
        expected_final_state(base.toPandas(), log.toPandas())
    )
    got = canonicalize(tbl.read().toPandas())
    pd.testing.assert_frame_equal(got, want)


def test_json_changelog_roundtrip(spark):
    log = change_log(spark, 300, 100, seed=6, max_len=16)
    as_json = to_json_changelog(log)
    back = parse_json_changelog(as_json)
    # upsert maps to 'u' (update) in the envelope — fold for comparison
    orig = log.withColumn(
        "op", F.when(F.col("op") == "upsert", "update").otherwise(F.col("op"))
    )
    a = canonicalize(orig.toPandas())
    b = canonicalize(back.toPandas())
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_json_changelog_invalid_lines(spark):
    raw = spark.createDataFrame(
        [("not json",), ('{"op": "z"}',), ('{"op":"c","source":{"lsn":1},"after":{"doc_id":"d1","tokens":[1,2],"n_tok":2,"source":"web"}}',)],
        "value string",
    )
    parsed = parse_json_changelog(raw)
    rows = {r["op"] for r in parsed.collect()}
    assert rows == {"invalid", "insert"}
    assert parsed.filter("op = 'invalid'").count() == 2


def test_vacuum_tombstones(spark, tmp_path):
    from pyspark.sql import functions as F

    from standardized_omop_data_etl_spark.plans.maintenance import vacuum_tombstones
    from standardized_omop_data_etl_spark.plans.merge import merge_into
    from standardized_omop_data_etl_spark.sources.lake import DELETED_COL

    base = base_sequences(spark, 100, seed=8, max_len=16)
    log = change_log(spark, 300, 100, seed=8, max_len=16)
    tbl = _table(spark, tmp_path, base)
    merge_into(tbl, log, epoch="all")
    visible_before = canonicalize(tbl.read().toPandas())
    n_tomb = (
        tbl.read(include_hidden=True)
        .filter(F.coalesce(F.col(DELETED_COL), F.lit(False)))
        .count()
    )
    assert n_tomb > 0
    vacuum_tombstones(tbl, watermark_lsn=10**9)
    n_after = (
        tbl.read(include_hidden=True)
        .filter(F.coalesce(F.col(DELETED_COL), F.lit(False)))
        .count()
    )
    assert n_after == 0
    pd.testing.assert_frame_equal(canonicalize(tbl.read().toPandas()), visible_before)
    # after vacuum, a stale update CAN insert again (watermark contract says
    # the upstream no longer delivers below-watermark events; simulate a
    # post-watermark event instead and check normal operation continues)
    r = merge_into(tbl, log.limit(0), epoch="empty-after-vacuum")
    assert r.metrics["events_applied"] == 0


def test_writer_lease_blocks_concurrent_merge(spark, tmp_path):
    from standardized_omop_data_etl_spark.sources.lake import ConcurrentWriterError

    base = base_sequences(spark, 50, seed=9, max_len=16)
    log = change_log(spark, 100, 50, seed=9, max_len=16)
    tbl = _table(spark, tmp_path, base)
    from standardized_omop_data_etl_spark.plans.merge import merge_into

    other = tbl.acquire_writer_lease(owner="other-writer")
    import pytest as _pytest
    with _pytest.raises(ConcurrentWriterError):
        merge_into(tbl, log, epoch="blocked")
    assert tbl.current_version() == 1  # state intact, nothing committed
    tbl.release_writer_lease(other)
    r = merge_into(tbl, log, epoch="unblocked")
    assert not r.skipped
    # lease released after merge: a new writer can acquire immediately
    tbl.release_writer_lease(tbl.acquire_writer_lease(owner="next"))


def test_stale_lease_takeover(spark, tmp_path):
    base = base_sequences(spark, 20, seed=10, max_len=8)
    tbl = _table(spark, tmp_path, base)
    tbl.acquire_writer_lease(owner="crashed-writer")
    # a fresh lease under ttl blocks ...
    import pytest as _pytest
    from standardized_omop_data_etl_spark.sources.lake import ConcurrentWriterError
    with _pytest.raises(ConcurrentWriterError):
        tbl.acquire_writer_lease(owner="new-writer", ttl_sec=600)
    # ... but is presumed dead past the ttl and taken over
    got = tbl.acquire_writer_lease(owner="new-writer", ttl_sec=0.0)
    assert got == "new-writer"
    tbl.release_writer_lease(got)


def test_bucket_fn_mismatch_refused(spark, tmp_path):
    import json

    import pytest as _pytest

    from standardized_omop_data_etl_spark.sources.lake import TableFormatError

    base = base_sequences(spark, 20, seed=11, max_len=8)
    tbl = _table(spark, tmp_path, base)
    # simulate a table written by an engine with a different bucket hash
    v = tbl.current_version()
    m = tbl.manifest()
    m["bucket_fn"] = "xxhash64_pmod_v0"
    tbl.fs.write_text_atomic(tbl._meta_path(f"v{v}.json"), json.dumps(m))
    with _pytest.raises(TableFormatError):
        LakeTable.load(spark, tbl.path)
    with _pytest.raises(TableFormatError):
        tbl.commit({}, set(), summary={"operation": "noop"})


def test_compact_buckets(spark, tmp_path):
    from standardized_omop_data_etl_spark.plans.maintenance import compact_buckets

    base = base_sequences(spark, 120, seed=12, max_len=16)
    log = change_log(spark, 600, 120, seed=12, max_len=16)
    tbl = _table(spark, tmp_path, base, buckets=4)
    replay_log(tbl, log, num_epochs=6)  # many small epochs -> many files/bucket
    m = tbl.manifest()
    files_before = {b: len(fl) for b, fl in m["files"].items()}
    assert max(files_before.values()) > 2
    before = canonicalize(tbl.read().toPandas())
    hidden_before = tbl.read(include_hidden=True).count()
    v = compact_buckets(tbl, max_files_per_bucket=2)
    assert v == tbl.current_version()
    files_after = {b: len(fl) for b, fl in tbl.manifest()["files"].items()}
    assert all(n <= max(2, 1) or n < files_before[b] for b, n in files_after.items())
    assert sum(files_after.values()) < sum(files_before.values())
    pd.testing.assert_frame_equal(canonicalize(tbl.read().toPandas()), before)
    assert tbl.read(include_hidden=True).count() == hidden_before
    # compaction is a no-op when already compact
    assert compact_buckets(tbl, max_files_per_bucket=4) == v


def test_key_counts_track_resolved_rows_through_lifecycle(spark, tmp_path):
    """The manifest's key_counts (what sizes the merge probe's broadcast
    gate) must equal the per-bucket rows an include_hidden read actually
    materializes — after cow merges with deletes (tombstones), mor appends,
    compaction, and a tombstone vacuum."""
    from standardized_omop_data_etl_spark.plans.maintenance import (
        compact_buckets,
        vacuum_tombstones,
    )
    from standardized_omop_data_etl_spark.plans.merge import merge_into
    from standardized_omop_data_etl_spark.sources.lake import bucket_expr

    def actual_by_bucket(tbl):
        rows = (
            tbl.read(include_hidden=True, columns=[tbl.key_col])
            .groupBy(bucket_expr(tbl.key_col, tbl.num_buckets).alias("_b"))
            .count()
            .collect()
        )
        return {int(r["_b"]): int(r["count"]) for r in rows}

    def assert_counts(tbl, label):
        assert tbl.key_counts() == actual_by_bucket(tbl), label
        vis = (
            tbl.read(columns=[tbl.key_col])
            .groupBy(bucket_expr(tbl.key_col, tbl.num_buckets).alias("_b"))
            .count()
            .collect()
        )
        got_vis = {int(b): c for b, c in
                   ((int(k), int(v)) for k, v in tbl.manifest()["row_counts"].items())}
        assert got_vis == {int(r["_b"]): int(r["count"]) for r in vis}, label

    base = base_sequences(spark, 120, seed=11, max_len=16)
    log = change_log(spark, 600, 120, seed=11, max_len=16)
    tbl = _table(spark, tmp_path, base, buckets=4)
    assert_counts(tbl, "bootstrap")

    mid = 600 // 2
    merge_into(tbl, log.filter(F.col("lsn") < mid), epoch="cow0")
    assert_counts(tbl, "after cow merge")
    merge_into(tbl, log.filter(F.col("lsn") >= mid), epoch="mor0", mode="mor")
    assert_counts(tbl, "after mor append")
    compact_buckets(tbl, max_files_per_bucket=1)
    assert_counts(tbl, "after compaction")
    hi = log.agg(F.max("lsn")).collect()[0][0]
    vacuum_tombstones(tbl, watermark_lsn=hi + 1)
    assert_counts(tbl, "after vacuum")
    # after vacuuming everything below the watermark there are no tombstones:
    # distinct keys == visible rows
    assert tbl.key_counts() == {
        int(b): int(c) for b, c in tbl.manifest()["row_counts"].items()
    }


def test_auto_maintenance_bounds_file_counts(spark, tmp_path):
    """Endurance-shaped (scaled down): a sustained mor replay with a
    MaintenancePolicy and NO manual maintenance calls keeps per-bucket file
    counts bounded by max_files_per_bucket + every_epochs, vacuums
    tombstones behind the applied watermark, and stays bit-exact."""
    from standardized_omop_data_etl_spark.plans.maintenance import MaintenancePolicy
    from standardized_omop_data_etl_spark.sources.lake import DELETED_COL

    base = base_sequences(spark, 200, seed=5, max_len=16)
    log = change_log(spark, 2000, 200, seed=5, max_len=16)
    tbl = _table(spark, tmp_path, base, buckets=4)
    policy = MaintenancePolicy(
        every_epochs=2, max_files_per_bucket=2, expire_keep_last=3, vacuum=True
    )
    replay_log(tbl, log, num_epochs=10, mode="mor", maintenance=policy)

    files = tbl.manifest()["files"]
    worst = max(len(fl) for fl in files.values())
    assert worst <= policy.max_files_per_bucket + policy.every_epochs, files
    # final sweep ran: the tail of the log was vacuumed with watermark past
    # max lsn, so no tombstones survive
    n_tomb = (
        tbl.read(include_hidden=True, columns=[DELETED_COL])
        .filter(F.coalesce(F.col(DELETED_COL), F.lit(False)))
        .count()
    )
    assert n_tomb == 0
    # snapshot GC honored the retention
    metas = [f for f in (tmp_path / "t" / "metadata").iterdir()
             if f.name.startswith("v") and f.name.endswith(".json")]
    assert len(metas) <= policy.expire_keep_last
    got = canonicalize(tbl.read().toPandas())
    exp = canonicalize(expected_final_state(base.toPandas(), log.toPandas()))
    pd.testing.assert_frame_equal(got, exp)
