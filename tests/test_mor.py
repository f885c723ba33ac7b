"""Merge-on-read (``merge_into(..., mode="mor")``) correctness.

The mor path must be observationally identical to copy-on-write — same final
read state, same per-epoch metrics, same idempotency and tombstone
semantics — while writing O(batch) instead of O(changed buckets) per epoch.
Compaction/vacuum materialize the resolved state and clear the mor flags.
"""

import pytest
from pyspark.sql import functions as F, types as T

from standardized_omop_data_etl_spark.plans.maintenance import (
    compact_buckets,
    vacuum_tombstones,
)
from standardized_omop_data_etl_spark.plans.merge import merge_into
from standardized_omop_data_etl_spark.plans.replay import replay_log
from standardized_omop_data_etl_spark.sources.generators import base_sequences, change_log
from standardized_omop_data_etl_spark.sources.lake import LakeTable
from standardized_omop_data_etl_spark.sources.oracle import (
    canonicalize,
    expected_final_state,
)

N_DOCS = 300
N_EVENTS = 1200


@pytest.fixture(scope="module")
def fixtures(spark):
    base = base_sequences(spark, N_DOCS, seed=77, max_len=64)
    log = change_log(spark, N_EVENTS, N_DOCS, seed=77, max_len=64)
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


def assert_same_state(got_pdf, exp_pdf):
    assert list(got_pdf.columns) == list(exp_pdf.columns)
    assert len(got_pdf) == len(exp_pdf)
    for col in exp_pdf.columns:
        mism = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(got_pdf[col], exp_pdf[col]))
            if a != b and not (a is None and b is None)
        ]
        assert not mism, f"column {col}: first mismatches {mism[:3]}"


def test_mor_matches_cow_and_oracle(spark, tmp_path, fixtures):
    base, log, base_pdf, log_pdf = fixtures
    cow = make_table(spark, tmp_path, base, "cow")
    mor = make_table(spark, tmp_path, base, "mor")
    r_cow = replay_log(cow, log, num_epochs=4)
    r_mor = replay_log(mor, log, num_epochs=4, mode="mor")

    # metrics bit-compatible per epoch (bytes differ by construction)
    skip = {"bytes_written", "buckets_rewritten", "buckets_appended", "buckets_touched"}
    for rc, rm in zip(r_cow, r_mor):
        mc = {k: v for k, v in rc.metrics.items() if k not in skip}
        mm = {k: v for k, v in rm.metrics.items() if k not in skip}
        assert mc == mm, f"epoch {rc.epoch}: {mc} != {mm}"
        assert rm.metrics["buckets_rewritten"] == 0

    # mor buckets flagged, nothing rewritten: delta files appended
    assert mor.mor_buckets(), "expected merge-on-read buckets after mor merges"

    got_mor, got_cow = state(mor), state(cow)
    assert_same_state(got_mor, got_cow)
    assert_same_state(got_mor, canonicalize(expected_final_state(base_pdf, log_pdf)))

    # visible row_counts agree with actual visible rows, both paths
    for tbl in (cow, mor):
        assert sum(tbl.manifest().get("row_counts", {}).values()) == tbl.read().count()

    # compaction materializes: flags cleared, read state unchanged
    v = compact_buckets(mor, max_files_per_bucket=1)
    assert v > 0 and not mor.mor_buckets()
    assert_same_state(state(mor), got_cow)

    # vacuum below the max lsn drops resolved tombstones, state unchanged
    vacuum_tombstones(mor, watermark_lsn=int(log_pdf["lsn"].max()) + 1)
    assert_same_state(state(mor), got_cow)


def test_mor_epoch_reapply_is_noop(spark, tmp_path, fixtures):
    base, log, _, _ = fixtures
    tbl = make_table(spark, tmp_path, base, "idem")
    r1 = merge_into(tbl, log, epoch="e0", mode="mor")
    before = state(tbl)
    r2 = merge_into(tbl, log, epoch="e0", mode="mor")
    assert r2.skipped and not r1.skipped
    assert tbl.current_version() == r1.version
    assert_same_state(state(tbl), before)


def test_mor_mixed_with_cow_epochs(spark, tmp_path, fixtures):
    """Alternating cow/mor epochs on one table resolves identically to pure
    cow — a cow epoch's key-probe must read THROUGH earlier mor deltas."""
    base, log, base_pdf, log_pdf = fixtures
    tbl = make_table(spark, tmp_path, base, "mixed")
    ref = make_table(spark, tmp_path, base, "mixedref")
    from standardized_omop_data_etl_spark.plans.replay import epoch_bounds

    lo, hi = int(log_pdf["lsn"].min()), int(log_pdf["lsn"].max())
    for i, (a, b) in enumerate(epoch_bounds(lo, hi, 4)):
        batch = log.filter((F.col("lsn") >= a) & (F.col("lsn") < b))
        merge_into(tbl, batch, epoch=f"m:{a}", mode="mor" if i % 2 else "cow")
        merge_into(ref, batch, epoch=f"c:{a}", mode="cow")
    assert_same_state(state(tbl), state(ref))
    assert_same_state(state(tbl), canonicalize(expected_final_state(base_pdf, log_pdf)))


def test_mor_out_of_order_no_resurrection(spark, tmp_path):
    sch = T.StructType(
        [
            T.StructField("lsn", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
        ]
    )
    df0 = spark.createDataFrame([("d", [0])], "doc_id string, tokens array<int>")
    tbl = LakeTable.create(
        spark, str(tmp_path / "oo"), schema=df0.schema, key_col="doc_id", num_buckets=2
    )
    tbl.overwrite_full(df0)

    def ev(lsn, op, toks):
        return (lsn, op, "d", toks)

    merge_into(tbl, spark.createDataFrame([ev(100, "delete", None)], sch), epoch="b2", mode="mor")
    assert tbl.read().count() == 0
    # late update below the tombstone's lsn must NOT resurrect
    r = merge_into(tbl, spark.createDataFrame([ev(50, "update", [1, 2])], sch), epoch="b1", mode="mor")
    assert tbl.read().count() == 0 and r.metrics["stale"] == 1
    # newer update revives
    r = merge_into(tbl, spark.createDataFrame([ev(150, "update", [7, 8])], sch), epoch="b3", mode="mor")
    assert r.metrics["revives"] == 1
    rows = tbl.read().collect()
    assert len(rows) == 1 and rows[0]["tokens"] == [7, 8]


def test_mor_schema_evolution_added_column(spark, tmp_path, fixtures):
    from standardized_omop_data_etl_spark.sources.generators import with_added_column

    base, log, base_pdf, log_pdf = fixtures
    tbl = make_table(spark, tmp_path, base, "evo")
    evolved = with_added_column(log, from_lsn=N_EVENTS // 2, seed=77)
    results = replay_log(tbl, evolved, num_epochs=3, mode="mor")
    assert any(r.schema_changes for r in results)
    cols = [f.name for f in tbl.schema().fields]
    assert "lang" in cols
    # pre-evolution rows surface NULL lang through the mor resolve
    got = state(tbl)
    exp = canonicalize(expected_final_state(base_pdf, evolved.toPandas()))
    assert_same_state(got, exp)


def test_mor_row_count_zero_overwrites_stale_entry(spark, tmp_path):
    df0 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    tbl = LakeTable.create(
        spark, str(tmp_path / "z"), schema=df0.schema, key_col="k", num_buckets=1
    )
    tbl.overwrite_full(df0)
    sch = "lsn long, op string, k string, v int"
    merge_into(
        tbl,
        spark.createDataFrame([(1, "delete", "a", None), (2, "delete", "b", None)], sch),
        epoch="d",
        mode="mor",
    )
    assert tbl.read().count() == 0
    assert sum(tbl.manifest().get("row_counts", {}).values()) == 0


def test_mor_salted_matches_plain(spark, tmp_path, fixtures):
    """Hot-key salting composes with the mor path: the salted two-phase LWW
    feeds the delta write through an explicit bucket re-alignment."""
    base, log, base_pdf, log_pdf = fixtures
    plain = make_table(spark, tmp_path, base, "msalt_plain")
    salted = make_table(spark, tmp_path, base, "msalt_salted")
    replay_log(plain, log, num_epochs=2, mode="mor")
    replay_log(salted, log, num_epochs=2, mode="mor", salt_partitions=4)
    assert_same_state(state(salted), state(plain))
    assert_same_state(state(salted), canonicalize(expected_final_state(base_pdf, log_pdf)))


def test_resolve_merge_mode_chooser():
    """Unit: the auto chooser's crossover. cow only for bootstrap/backfill-
    shaped epochs (the batch rescales the table — measured mor wins ingest
    at every ratio ≥ 0.4, so the 0.5 threshold protects just that shape),
    mor everywhere else; absolute-size fallback when the batch size is
    unknown."""
    from standardized_omop_data_etl_spark.plans.merge import (
        AUTO_MOR_REWRITE_AMPLIFICATION,
        AUTO_MOR_TABLE_ROWS_MIN,
        resolve_merge_mode,
    )

    assert AUTO_MOR_REWRITE_AMPLIFICATION == 0.5  # retune ⇒ re-measure first
    assert resolve_merge_mode(0, 1_000_000) == "cow"         # empty table
    assert resolve_merge_mode(400_000, 1_000_000) == "cow"   # initial load 2.5x
    assert resolve_merge_mode(499_999, 1_000_000) == "cow"   # at the boundary
    assert resolve_merge_mode(500_001, 1_000_000) == "mor"   # past crossover
    assert resolve_merge_mode(1_700_000, 2_000_000) == "mor"  # r4 measured +20%
    assert resolve_merge_mode(100_000_000, 1_000) == "mor"   # steady tail
    assert resolve_merge_mode(AUTO_MOR_TABLE_ROWS_MIN - 1, None) == "cow"
    assert resolve_merge_mode(AUTO_MOR_TABLE_ROWS_MIN + 1, None) == "mor"
    # amplification override
    assert resolve_merge_mode(2_000_000, 1_000_000, amplification=2.5) == "cow"
    assert resolve_merge_mode(2_000_000, 1_000_000, amplification=1.5) == "mor"


def test_auto_mode_replay_matches_oracle_and_picks_modes(spark, tmp_path, fixtures, monkeypatch):
    """End-to-end mode="auto": with the amplification threshold forced low,
    later epochs (small batch vs grown table) must commit as merge-mor while
    a table-rescaling epoch commits as cow — and the final state is
    bit-exact vs the oracle either way."""
    import standardized_omop_data_etl_spark.plans.merge as M

    base, log, base_pdf, log_pdf = fixtures
    tbl = make_table(spark, tmp_path, base, "tauto")
    # N_DOCS=300 resident rows; epochs of ~N_EVENTS/6=200 LSNs: ratio 1.5
    monkeypatch.setattr(M, "AUTO_MOR_REWRITE_AMPLIFICATION", 1.2)
    replay_log(tbl, log, num_epochs=6, mode="auto")
    ops = [
        tbl.manifest(v)["summary"].get("operation")
        for v in range(2, tbl.current_version() + 1)
    ]
    assert "merge-mor" in ops, ops
    assert_same_state(state(tbl), canonicalize(expected_final_state(base_pdf, log_pdf)))

    # a batch that rescales the table resolves to cow even mid-stream
    fresh = (
        base.select(
            F.concat(F.lit("bulk-"), F.col("doc_id")).alias("doc_id"),
            "tokens", "n_tok", "source",
        )
        .withColumn("lsn", F.monotonically_increasing_id() + 50_000_000)
        .withColumn("op", F.lit("insert"))
    )
    r = merge_into(tbl, fresh, epoch="bulk", mode="auto", batch_rows_est=N_DOCS * 10)
    assert tbl.manifest(r.version)["summary"]["operation"] == "merge"


def test_resolve_lww_strategy_chooser():
    """Kernel chooser follows the measured per-core crossover
    (BENCH/BASELINE.md r4 kernel-shape A/B): window under 250k batch
    rows/core or when the batch size is unknown, narrow above."""
    from standardized_omop_data_etl_spark.plans.merge import (
        NARROW_MIN_ROWS_PER_CORE,
        resolve_lww_strategy,
    )

    assert resolve_lww_strategy(None, 32) == "window"          # unknown batch
    assert resolve_lww_strategy(0, 32) == "window"
    assert resolve_lww_strategy(1_000_000, 32) == "window"     # 31k/core
    assert resolve_lww_strategy(16_000_000, 32) == "narrow"    # 500k/core
    assert resolve_lww_strategy(16_000_000, 4) == "narrow"     # campaign shape
    assert resolve_lww_strategy(NARROW_MIN_ROWS_PER_CORE, 1) == "narrow"
    assert resolve_lww_strategy(NARROW_MIN_ROWS_PER_CORE - 1, 1) == "window"


def test_lww_auto_bit_identical_to_explicit(spark, tmp_path, fixtures):
    """lww_strategy='auto' (the default) must produce the same final state
    as both explicit kernels — on the same log, epoch by epoch."""
    base, log, base_pdf, log_pdf = fixtures
    states = {}
    for strat in ("auto", "window", "narrow"):
        tbl = make_table(spark, tmp_path, base, name=f"t_{strat}")
        replay_log(tbl, log, num_epochs=3, lww_strategy=strat)
        states[strat] = canonicalize(tbl.read().toPandas())
    assert states["auto"].equals(states["window"])
    assert states["auto"].equals(states["narrow"])
