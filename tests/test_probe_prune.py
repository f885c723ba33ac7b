"""Batch-keyed probe pruning (``LakeTable.read(key_filter=...)`` + the MERGE
probes' pruned-broadcast path).

At 10^10-row scale the touched buckets' key count exceeds every join-build
cap, so without pruning the per-epoch metrics probe sort-merges an O(table)
narrow scan against an O(batch) winner set. The pruning semi-joins the
winner keys BELOW the scan (and below the mor LWW resolver), making the
target side batch-sized and broadcastable. These tests force the regime by
shrinking ``BROADCAST_KEYS_MAX`` and assert the pruned probe is
observationally identical — final state AND per-epoch metrics — to the
default probe on the same epoch split.
"""

import pytest
from pyspark.sql import functions as F

from standardized_omop_data_etl_spark.plans import change_feed as feed_mod
from standardized_omop_data_etl_spark.plans import merge as merge_mod
from standardized_omop_data_etl_spark.plans.change_feed import read_changes
from standardized_omop_data_etl_spark.plans.maintenance import compact_buckets
from standardized_omop_data_etl_spark.plans.merge import merge_into
from standardized_omop_data_etl_spark.plans.replay import replay_log
from standardized_omop_data_etl_spark.sources.generators import base_sequences, change_log
from standardized_omop_data_etl_spark.sources.lake import LakeTable
from standardized_omop_data_etl_spark.sources.oracle import canonicalize

N_DOCS = 300
N_EVENTS = 1500


@pytest.fixture(scope="module")
def fixtures(spark):
    base = base_sequences(spark, N_DOCS, seed=91, max_len=64)
    log = change_log(spark, N_EVENTS, N_DOCS, seed=91, max_len=64)
    return base, log


def make_table(spark, tmp_path, base, name, num_buckets=8):
    tbl = LakeTable.create(
        spark, str(tmp_path / name), schema=base.schema, key_col="doc_id",
        num_buckets=num_buckets, overwrite=True,
    )
    tbl.overwrite_full(base)
    return tbl


def state(tbl):
    return canonicalize(tbl.read().toPandas())


def test_key_filter_read_equivalence(spark, tmp_path, fixtures):
    """read(key_filter=K) == read().semi_join(K) on a table with mor
    buckets, visible and hidden forms, pruned and full columns."""
    base, log = fixtures
    tbl = make_table(spark, tmp_path, base, "kf")
    replay_log(tbl, log, num_epochs=2, lsn_range=(0, N_EVENTS - 1), mode="mor")

    keys = tbl.read(columns=["doc_id"]).limit(40).select("doc_id")
    keys_pdf = keys.toPandas()

    got = canonicalize(tbl.read(key_filter=keys).toPandas())
    exp = canonicalize(
        tbl.read().join(F.broadcast(keys), on="doc_id", how="left_semi").toPandas()
    )
    assert got.equals(exp)
    assert set(got["doc_id"]) <= set(keys_pdf["doc_id"])

    # hidden form resolves mor deltas identically under the filter
    got_h = canonicalize(
        tbl.read(include_hidden=True, key_filter=keys)
        .select("doc_id", "_lsn").toPandas()
    )
    exp_h = canonicalize(
        tbl.read(include_hidden=True).select("doc_id", "_lsn")
        .join(F.broadcast(keys), on="doc_id", how="left_semi").toPandas()
    )
    assert got_h.equals(exp_h)

    # pruned columns that exclude the key still filter (scan widened internally)
    n = tbl.read(columns=["n_tok"], key_filter=keys).count()
    assert n == got.shape[0]


def test_mor_read_prunes_complex_columns(spark, tmp_path, fixtures):
    """A narrow projection over a mor bucket must not decode the tokens
    array: the resolver's tie-break references only simple columns, so
    Catalyst pushes the pruning into the parquet scan (the mv refresh /
    recompute regression this guards: full-width decode of every resident
    row for a 4-column aggregate)."""
    base, log = fixtures
    tbl = make_table(spark, tmp_path, base, "prune_cols")
    replay_log(tbl, log, num_epochs=2, lsn_range=(0, N_EVENTS - 1), mode="mor")
    assert tbl.manifest().get("mor_buckets"), "fixture must leave mor buckets"

    narrow = tbl.read().groupBy("source").agg(F.sum("n_tok").alias("s"))
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "tokens" not in plan, "tokens array not pruned below the mor resolver"

    # and the full-width read still resolves to the same rows as cow replay
    wide = canonicalize(tbl.read().toPandas())
    assert set(wide.columns) == {"doc_id", "tokens", "n_tok", "source"}


def test_lookup_point_read(spark, tmp_path, fixtures):
    """lookup(keys) == full read filtered to the keys, scanning only the
    keys' hash buckets; tombstoned and absent keys return nothing."""
    base, log = fixtures
    tbl = make_table(spark, tmp_path, base, "lk")
    replay_log(tbl, log, num_epochs=2, lsn_range=(0, N_EVENTS - 1), mode="mor")

    full = tbl.read().toPandas()
    present = sorted(full["doc_id"])[:7]
    all_keys = set(tbl.read(include_hidden=True).select("doc_id").toPandas()["doc_id"])
    absent = [k for k in (f"doc-{i:08d}" for i in range(10**7, 10**7 + 3))
              if k not in all_keys]

    got = canonicalize(tbl.lookup(present + absent).toPandas())
    exp = canonicalize(full[full["doc_id"].isin(present)])
    assert got.equals(exp)

    assert tbl.lookup([]).count() == 0
    assert tbl.lookup(absent).count() == 0
    # column pruning composes with the pushdown
    assert tbl.lookup(present, columns=["n_tok"]).count() == len(present)


def test_lookup_version_pinned_across_rebucket(spark, tmp_path, fixtures):
    """A time-travel lookup must hash keys against the SNAPSHOT's bucket
    layout: after a rebucket, current-layout bucket ids point at the wrong
    old buckets and would silently return nothing."""
    from standardized_omop_data_etl_spark.plans.maintenance import rebucket

    base, _log = fixtures
    tbl = make_table(spark, tmp_path, base, "lk_rb", num_buckets=4)
    v_old = tbl.current_version()
    keys = [r[0] for r in tbl.read(columns=["doc_id"]).limit(5).collect()]
    rebucket(tbl, 16)

    got = canonicalize(tbl.lookup(keys, version=v_old).toPandas())
    exp = canonicalize(
        tbl.read(version=v_old).filter(F.col("doc_id").isin(keys)).toPandas()
    )
    assert got.equals(exp) and got.shape[0] == 5
    # and the current-version lookup sees the new layout
    assert tbl.lookup(keys).count() == 5


def _replay_epochs(tbl, log, n_events, mode, epochs):
    per = n_events // epochs
    results = []
    for i in range(epochs):
        lo = i * per
        hi = (i + 1) * per if i < epochs - 1 else n_events
        batch = log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))
        results.append(
            merge_into(tbl, batch, epoch=f"e{i}", mode=mode, batch_rows_bound=hi - lo)
        )
    return results


def test_pruned_change_feed_identical(spark, tmp_path, monkeypatch):
    """Feed pruning over a winner-only mor range returns the identical feed
    (with and without before-images); a range containing a compaction falls
    back to the unpruned plan and stays correct. Shape mirrors the real
    regime: resident keys (2000) >> change volume (~200 events)."""
    base = base_sequences(spark, 2000, seed=93, max_len=48)
    log = change_log(spark, 200, 2000, seed=93, max_len=48)
    tbl = make_table(spark, tmp_path, base, "feed_prune", num_buckets=8)
    v0 = tbl.current_version()
    replay_log(tbl, log, num_epochs=2, lsn_range=(0, 199), mode="mor")
    v1 = tbl.current_version()

    def feed_pdf(**kw):
        return canonicalize(read_changes(tbl, v0, v1, **kw).toPandas())

    exp_plain = feed_pdf()
    exp_before = feed_pdf(include_before=True)

    bound = feed_mod._mor_range_winner_bound(tbl, v0, v1)
    assert bound is not None and 0 < bound <= 200

    filtered_reads = []
    orig_read = LakeTable.read

    def spy_read(self, *args, **kwargs):
        if kwargs.get("key_filter") is not None:
            filtered_reads.append(kwargs.get("version"))
        return orig_read(self, *args, **kwargs)

    monkeypatch.setattr(LakeTable, "read", spy_read)
    # gate: before_est (~2000 resident keys) > cap >= bound (<=200 winners)
    monkeypatch.setattr(feed_mod, "BROADCAST_KEYS_MAX", 500)
    got_plain = feed_pdf()
    assert filtered_reads, "feed pruning never engaged"
    assert got_plain.equals(exp_plain), "pruned feed diverged (plain)"

    # include_before tightens the cap 16x; widen so the gate still fires
    # (cap = 8000//16 = 500 > bound, before_est 2000 > 500)
    monkeypatch.setattr(feed_mod, "BROADCAST_KEYS_MAX", 8000)
    filtered_reads.clear()
    got_before = feed_pdf(include_before=True)
    assert filtered_reads, "before-image feed pruning never engaged"
    assert got_before.equals(exp_before), "pruned feed diverged (before-images)"
    monkeypatch.setattr(LakeTable, "read", orig_read)

    # compaction inside the range -> winner-only precondition fails -> falls
    # back (bound is None) and the feed is still exact
    compact_buckets(tbl, max_files_per_bucket=1)
    v2 = tbl.current_version()
    assert feed_mod._mor_range_winner_bound(tbl, v0, v2) is None
    exp2 = canonicalize(read_changes(tbl, v0, v2).toPandas())
    monkeypatch.setattr(feed_mod, "BROADCAST_KEYS_MAX", 10)
    got2 = canonicalize(read_changes(tbl, v0, v2).toPandas())
    assert got2.equals(exp2)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_pruned_probe_identical(spark, tmp_path, fixtures, monkeypatch, mode):
    """Force the >cap regime (table keys 300 > cap 280 >= epoch bound 250)
    and assert the pruned probe classifies every epoch identically to the
    default probe: same per-epoch metrics dict, same final state — and that
    the pruning path actually engaged (read() saw a key_filter)."""
    base, log = fixtures
    epochs = 6  # 250 events/epoch <= cap

    ref = make_table(spark, tmp_path, base, f"ref_{mode}")
    ref_results = _replay_epochs(ref, log, N_EVENTS, mode, epochs)

    monkeypatch.setattr(merge_mod, "BROADCAST_KEYS_MAX", 280)
    filtered_reads = []
    orig_read = LakeTable.read

    def spy_read(self, *args, **kwargs):
        if kwargs.get("key_filter") is not None:
            filtered_reads.append(kwargs.get("buckets"))
        return orig_read(self, *args, **kwargs)

    monkeypatch.setattr(LakeTable, "read", spy_read)
    pruned = make_table(spark, tmp_path, base, f"pruned_{mode}")
    pruned_results = _replay_epochs(pruned, log, N_EVENTS, mode, epochs)
    monkeypatch.setattr(LakeTable, "read", orig_read)

    assert filtered_reads, "pruning gate never engaged under the shrunk cap"
    for r_ref, r_got in zip(ref_results, pruned_results):
        assert r_got.metrics == r_ref.metrics, (
            f"epoch {r_ref.epoch} metrics diverged under pruning"
        )
    assert state(pruned).equals(state(ref)), (
        "pruned probe diverged from default final state"
    )
