"""Pipelined replay (``replay_log(pipeline=True)``) correctness.

The one-slot lookahead overlaps each mor epoch's delta WRITE with the
previous epoch's probe + commit (``plans.merge.prepare_mor_delta``). None of
that may change WHAT is committed: final state, per-epoch metrics, versions,
idempotency/resume semantics, and maintenance cadence must be bit-identical
to the serial loop — and a lookahead that is never consumed (crash) must be
reclaimable by the orphan GC, never by accident while still in flight.
"""

import pytest
from pyspark.sql import functions as F

from standardized_omop_data_etl_spark.plans.maintenance import MaintenancePolicy
from standardized_omop_data_etl_spark.plans.merge import (
    merge_into,
    prepare_mor_delta,
)
from standardized_omop_data_etl_spark.plans.replay import replay_log
from standardized_omop_data_etl_spark.sources.generators import base_sequences, change_log
from standardized_omop_data_etl_spark.sources.lake import LakeTable
from standardized_omop_data_etl_spark.sources.oracle import (
    canonicalize,
    expected_final_state,
)

N_DOCS = 250
N_EVENTS = 1500


@pytest.fixture(scope="module")
def fixtures(spark):
    base = base_sequences(spark, N_DOCS, seed=91, max_len=48)
    log = change_log(spark, N_EVENTS, N_DOCS, seed=91, max_len=48)
    return base, log, base.toPandas(), log.toPandas()


def make_table(spark, tmp_path, base, name, num_buckets=8):
    tbl = LakeTable.create(
        spark, str(tmp_path / name), schema=base.schema, key_col="doc_id",
        num_buckets=num_buckets, overwrite=True,
    )
    tbl.overwrite_full(base)
    return tbl


def state(tbl):
    return canonicalize(tbl.read().toPandas())


def test_pipeline_bit_identical_to_serial(spark, tmp_path, fixtures):
    """pipeline=True produces the same final state, the same per-epoch
    metrics, the same version sequence, and the same epoch stamps as the
    serial mor loop — the overlap is invisible to everything but the clock."""
    base, log, base_pdf, log_pdf = fixtures
    serial = make_table(spark, tmp_path, base, "serial")
    piped = make_table(spark, tmp_path, base, "piped")
    r_s = replay_log(serial, log, num_epochs=6, mode="mor")
    r_p = replay_log(piped, log, num_epochs=6, mode="mor", pipeline=True)

    assert [r.epoch for r in r_p] == [r.epoch for r in r_s]
    assert [r.version for r in r_p] == [r.version for r in r_s]
    for rs, rp in zip(r_s, r_p):
        assert rp.metrics == rs.metrics, f"epoch {rs.epoch}"
        assert rp.per_bucket == rs.per_bucket, f"epoch {rs.epoch}"

    got_p, got_s = state(piped), state(serial)
    assert got_p.equals(got_s)
    exp = canonicalize(expected_final_state(base_pdf, log_pdf))
    assert got_p.equals(exp)


def test_pipeline_auto_mode_matches_oracle(spark, tmp_path, fixtures):
    """mode='auto' under the pipeline: cow-resolved epochs simply skip the
    lookahead (prep returns None / merge discards it) and the replay still
    lands on the oracle state."""
    base, log, base_pdf, log_pdf = fixtures
    tbl = make_table(spark, tmp_path, base, "auto")
    replay_log(tbl, log, num_epochs=5, mode="auto", pipeline=True)
    exp = canonicalize(expected_final_state(base_pdf, log_pdf))
    assert state(tbl).equals(exp)


def test_pipeline_cow_mode_falls_back_serial(spark, tmp_path, fixtures):
    """pipeline=True with mode='cow' never prepares anything and matches the
    plain cow replay exactly."""
    base, log, base_pdf, log_pdf = fixtures
    tbl = make_table(spark, tmp_path, base, "cowpipe")
    r = replay_log(tbl, log, num_epochs=4, mode="cow", pipeline=True)
    assert all(not x.skipped for x in r)
    exp = canonicalize(expected_final_state(base_pdf, log_pdf))
    assert state(tbl).equals(exp)
    # no stranded lookahead dirs: every snap dir's files are referenced
    assert tbl.remove_orphan_files() == []


def test_pipeline_resume_skips_applied(spark, tmp_path, fixtures):
    """Kill-and-resume: after a partial serial replay, a full pipelined
    replay skips the stamped epochs (no duplicate commits, no stranded
    lookahead files) and completes to the oracle state."""
    base, log, base_pdf, log_pdf = fixtures
    tbl = make_table(spark, tmp_path, base, "resume")
    lo_hi = log.agg(F.min("lsn").alias("lo"), F.max("lsn").alias("hi")).first()
    full = replay_log(tbl, log, num_epochs=6, mode="mor",
                      lsn_range=(int(lo_hi["lo"]), int(lo_hi["hi"])))
    # rebuild fresh, apply only the first 3 epochs, then resume pipelined
    tbl2 = make_table(spark, tmp_path, base, "resume2")
    for r in full[:3]:
        lo, hi = map(int, r.epoch.split(":")[1].split("-"))
        merge_into(tbl2, log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)),
                   epoch=r.epoch, mode="mor")
    res = replay_log(tbl2, log, num_epochs=6, mode="mor", pipeline=True,
                     lsn_range=(int(lo_hi["lo"]), int(lo_hi["hi"])))
    assert [r.skipped for r in res] == [True] * 3 + [False] * 3
    exp = canonicalize(expected_final_state(base_pdf, log_pdf))
    assert state(tbl2).equals(exp)
    assert tbl2.remove_orphan_files() == []


def test_pipeline_with_maintenance_cadence(spark, tmp_path, fixtures):
    """Maintenance sweeps run at the same cadence as the serial loop (no
    lookahead may be in flight across a sweep — the loop eats one serial
    epoch instead), file counts stay bounded, state stays exact."""
    base, log, base_pdf, log_pdf = fixtures
    policy = MaintenancePolicy(
        every_epochs=2, max_files_per_bucket=2, expire_keep_last=4, vacuum=True
    )
    tbl = make_table(spark, tmp_path, base, "maint", num_buckets=4)
    replay_log(tbl, log, num_epochs=8, mode="mor", pipeline=True,
               maintenance=policy)
    files = tbl.manifest()["files"]
    worst = max(len(fl) for fl in files.values())
    assert worst <= policy.max_files_per_bucket + policy.every_epochs, files
    exp = canonicalize(expected_final_state(base_pdf, log_pdf))
    assert state(tbl).equals(exp)
    # nothing stranded: every delta the lookahead wrote was consumed or
    # discarded inline; orphan sweep finds nothing
    assert tbl.remove_orphan_files() == []


def test_prepared_consumed_without_rewrite(spark, tmp_path, fixtures):
    """A valid prepared delta is consumed as-is: the files the lookahead
    wrote are exactly the files the manifest references (no second write)."""
    base, log, _, _ = fixtures
    tbl = make_table(spark, tmp_path, base, "consume")
    batch = log.filter(F.col("lsn") < 400)
    prepared = prepare_mor_delta(tbl, batch, epoch="e1")
    assert prepared is not None
    res = merge_into(tbl, batch, epoch="e1", mode="mor", prepared=prepared)
    assert not res.skipped
    manifest_files = {f for fl in tbl.manifest()["files"].values() for f in fl}
    for bucket_files in prepared.new_files.values():
        for f in bucket_files:
            assert f in manifest_files
    # and the dir is still on disk (it IS the committed data)
    rel = tbl.fs.relpath(prepared.out_dir, tbl.path)
    assert tbl.fs.isdir(prepared.out_dir), rel


def test_stale_prepared_discarded_on_cow(spark, tmp_path, fixtures):
    """A prepared delta handed to a merge that resolves cow is discarded —
    files gone, state identical to a plain cow merge."""
    base, log, _, _ = fixtures
    tbl = make_table(spark, tmp_path, base, "stale")
    twin = make_table(spark, tmp_path, base, "stale_twin")
    batch = log.filter(F.col("lsn") < 400)
    prepared = prepare_mor_delta(tbl, batch, epoch="e1")
    assert prepared is not None
    out_dir = prepared.out_dir
    res = merge_into(tbl, batch, epoch="e1", mode="cow", prepared=prepared)
    ref = merge_into(twin, batch, epoch="e1", mode="cow")
    assert not tbl.fs.isdir(out_dir)
    assert res.metrics == ref.metrics
    assert state(tbl).equals(state(twin))


def test_prepared_discarded_on_applied_epoch(spark, tmp_path, fixtures):
    """An epoch already stamped discards the lookahead and skips — the
    exactly-once guarantee is unchanged by the pipeline."""
    base, log, _, _ = fixtures
    tbl = make_table(spark, tmp_path, base, "applied")
    batch = log.filter(F.col("lsn") < 400)
    merge_into(tbl, batch, epoch="e1", mode="mor")
    v = tbl.current_version()
    prepared = prepare_mor_delta(tbl, batch, epoch="e2")  # different epoch
    # hand it to an ALREADY-APPLIED epoch: must discard + skip
    res = merge_into(tbl, batch, epoch="e1", mode="mor", prepared=prepared)
    assert res.skipped
    assert not tbl.fs.isdir(prepared.out_dir)
    assert tbl.current_version() == v
    # prepare itself returns None for a stamped epoch (resume fast-path)
    assert prepare_mor_delta(tbl, batch, epoch="e1") is None


def test_crashed_lookahead_collected_by_orphan_gc(spark, tmp_path, fixtures):
    """A lookahead that is never consumed (crash between prepare and apply)
    parks above the current version — invisible to the GC while its window
    is open, reclaimed once the version counter passes its stamp."""
    base, log, _, _ = fixtures
    tbl = make_table(spark, tmp_path, base, "crash")
    prepared = prepare_mor_delta(tbl, log.filter(F.col("lsn") < 300), epoch="dead")
    assert prepared is not None
    # window still open (stamped current+2): GC must NOT touch it
    assert tbl.remove_orphan_files() == []
    assert tbl.fs.isdir(prepared.out_dir)
    # three commits later the version counter has passed the stamp
    for i, lo in enumerate((300, 600, 900)):
        merge_into(
            tbl, log.filter((F.col("lsn") >= lo) & (F.col("lsn") < lo + 300)),
            epoch=f"e{i}", mode="mor",
        )
    removed = tbl.remove_orphan_files()
    assert removed, "parked lookahead files should be collectable now"
    assert not tbl.fs.isdir(prepared.out_dir)
