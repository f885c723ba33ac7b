"""Incremental change-data-feed correctness (plans/change_feed.py).

Invariants:
* the feed between two snapshots equals a pandas state-diff oracle
  (op classification, after-image payload, change LSN) — cow and mor,
* the feed is itself a replayable changelog: applying it to a copy of
  v_from reproduces v_to's visible state bit-exactly,
* bucket pruning only scans buckets whose manifest file lists differ,
* vacuum / rollback inside the range are refused (fidelity guards),
* from==to is an empty frame with the contract schema.
"""

import pandas as pd
import pytest

from standardized_omop_data_etl_spark.plans.change_feed import (
    CHANGE_LSN_COL,
    CHANGE_OP_COL,
    ChangeFeedUnavailableError,
    changed_buckets,
    read_changes,
)
from standardized_omop_data_etl_spark.plans.maintenance import vacuum_tombstones
from standardized_omop_data_etl_spark.plans.merge import merge_into
from standardized_omop_data_etl_spark.plans.replay import replay_log
from standardized_omop_data_etl_spark.sources.generators import base_sequences, change_log
from standardized_omop_data_etl_spark.sources.lake import LakeTable
from standardized_omop_data_etl_spark.sources.oracle import canonicalize

N_DOCS = 250
N_EVENTS = 1000


@pytest.fixture(scope="module")
def fixtures(spark):
    base = base_sequences(spark, N_DOCS, seed=7, max_len=48)
    log = change_log(spark, N_EVENTS, N_DOCS, seed=7, max_len=48)
    return base, log, base.toPandas(), log.toPandas()


def make_table(spark, tmp_path, base, name="t", num_buckets=8):
    tbl = LakeTable.create(
        spark, str(tmp_path / name), schema=base.schema,
        key_col="doc_id", num_buckets=num_buckets, overwrite=True,
    )
    tbl.overwrite_full(base)
    return tbl


def _state(base_pdf, log_pdf, upto_lsn):
    """key -> (lsn, deleted, payload dict) after events with lsn < upto_lsn."""
    payload_cols = [c for c in log_pdf.columns if c not in ("lsn", "op")]
    st = {
        # bootstrap rows sit at lsn -1: every log event (lsn >= 0) beats them
        # (sources/lake.py overwrite_full)
        r["doc_id"]: (-1, False, {c: r.get(c) for c in payload_cols})
        for _, r in base_pdf.iterrows()
    }
    ev = log_pdf[log_pdf["lsn"] < upto_lsn].sort_values("lsn", kind="mergesort")
    for _, r in ev.iterrows():
        st[r["doc_id"]] = (
            int(r["lsn"]), r["op"] == "delete", {c: r.get(c) for c in payload_cols}
        )
    return st


def expected_feed(base_pdf, log_pdf, lo_lsn, hi_lsn):
    """Pandas oracle: visible-state diff between 'events < lo applied' and
    'events <= hi applied', classified insert/update/delete."""
    s_before = _state(base_pdf, log_pdf, lo_lsn)
    s_after = _state(base_pdf, log_pdf, hi_lsn + 1)
    rows = []
    for k, (lsn_a, dead_a, pay_a) in s_after.items():
        b = s_before.get(k)
        if b is not None and lsn_a <= b[0]:
            continue
        live_b = b is not None and not b[1]
        if dead_a and not live_b:
            continue
        op = "delete" if dead_a else ("update" if live_b else "insert")
        rows.append({CHANGE_OP_COL: op, **pay_a, CHANGE_LSN_COL: lsn_a})
    payload_cols = [c for c in log_pdf.columns if c not in ("lsn", "op")]
    return pd.DataFrame(rows, columns=[CHANGE_OP_COL, *payload_cols, CHANGE_LSN_COL])


def assert_feed_equals(feed_df, expected_pdf):
    got = canonicalize(feed_df.toPandas())
    exp = canonicalize(expected_pdf)
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp), f"feed rows {len(got)} != {len(exp)}"
    for col in exp.columns:
        mism = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(got[col], exp[col]))
            if a != b and not (a is None and b is None)
            and not (a != a and b != b)  # NaN == NaN for float payloads
        ]
        assert not mism, f"column {col}: first mismatches {mism[:3]}"


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_feed_matches_state_diff_oracle(spark, tmp_path, fixtures, mode):
    base, log, base_pdf, log_pdf = fixtures
    tbl = make_table(spark, tmp_path, base, f"feed_{mode}")
    v0 = tbl.current_version()
    results = replay_log(tbl, log, num_epochs=2, mode=mode)
    v1, v2 = results[0].version, results[1].version
    mid = N_EVENTS // 2  # epoch split: [0, mid), [mid, N)
    assert_feed_equals(
        read_changes(tbl, v1, v2), expected_feed(base_pdf, log_pdf, mid, N_EVENTS)
    )
    # full-range feed from the bootstrap snapshot
    assert_feed_equals(
        read_changes(tbl, v0, v2), expected_feed(base_pdf, log_pdf, 0, N_EVENTS)
    )


def test_feed_is_replayable_changelog(spark, tmp_path, fixtures):
    """merge_into(copy_of_v_from, feed) == v_to visible state, bit-exact."""
    import pyspark.sql.functions as F

    base, log, base_pdf, log_pdf = fixtures
    tbl = make_table(spark, tmp_path, base, "feed_src")
    v0 = tbl.current_version()
    replay_log(tbl, log, num_epochs=3)
    feed = read_changes(tbl, v0, tbl.current_version())
    clone = make_table(spark, tmp_path, base, "feed_clone")
    batch = feed.select(
        F.col(CHANGE_LSN_COL).alias("lsn"),
        F.when(F.col(CHANGE_OP_COL) == "delete", "delete")
        .otherwise("upsert")
        .alias("op"),
        *[c for c in feed.columns if c not in (CHANGE_OP_COL, CHANGE_LSN_COL)],
    )
    merge_into(clone, batch, epoch="feed-replay")
    pd.testing.assert_frame_equal(
        canonicalize(clone.read().toPandas()), canonicalize(tbl.read().toPandas())
    )


def test_bucket_pruning_and_small_epoch(spark, tmp_path, fixtures):
    """A tiny epoch touching few keys: changed_buckets is a strict subset and
    the pruned feed still matches the oracle."""
    import pyspark.sql.functions as F

    base, log, base_pdf, log_pdf = fixtures
    tbl = make_table(spark, tmp_path, base, "feed_prune", num_buckets=32)
    v0 = tbl.current_version()
    small = log.filter(F.col("lsn") < 12)
    merge_into(tbl, small, epoch="small")
    v1 = tbl.current_version()
    cb = changed_buckets(tbl.manifest(v0), tbl.manifest(v1))
    assert cb is not None and 0 < len(cb) < 32
    assert_feed_equals(
        read_changes(tbl, v0, v1),
        expected_feed(base_pdf, log_pdf[log_pdf["lsn"] < 12], 0, 11),
    )


def test_guards_and_empty_range(spark, tmp_path, fixtures):
    base, log, _, _ = fixtures
    tbl = make_table(spark, tmp_path, base, "feed_guard")
    v0 = tbl.current_version()
    replay_log(tbl, log, num_epochs=1)
    v1 = tbl.current_version()

    # from == to: empty frame with the contract schema
    empty = read_changes(tbl, v1, v1)
    assert empty.count() == 0
    assert empty.columns[0] == CHANGE_OP_COL and empty.columns[-1] == CHANGE_LSN_COL

    # vacuum inside the range: refused, then readable with allow_gc
    vacuum_tombstones(tbl, watermark_lsn=N_EVENTS + 1)
    v2 = tbl.current_version()
    if v2 > v1:  # vacuum only commits when it removed something
        with pytest.raises(ChangeFeedUnavailableError, match="vacuum"):
            read_changes(tbl, v0, v2)
        read_changes(tbl, v0, v2, allow_gc=True).count()  # opt-in works
        # range ending BEFORE the vacuum stays fully readable
        read_changes(tbl, v0, v1).count()

    # rollback inside the range: refused (probe a range holding ONLY the
    # rollback commit, so the walk can't trip on the earlier vacuum first)
    pre_rollback = tbl.current_version()
    tbl.rollback(v1)
    with pytest.raises(ChangeFeedUnavailableError, match="rollback"):
        read_changes(tbl, pre_rollback, tbl.current_version())

    with pytest.raises(ValueError):
        read_changes(tbl, v1, v0)


def test_feed_barrier_watermark_is_o1_and_propagates(spark, tmp_path, fixtures):
    """Every commit carries the latest barrier forward, so the guard reads
    ONLY the endpoint manifest: a vacuum deep in history still blocks a
    wide range many merges later; ranges starting at/after it are clean; an
    overwrite of a non-empty table is a barrier, the bootstrap one is not."""
    import pyspark.sql.functions as F

    base, log, _, _ = fixtures
    tbl = make_table(spark, tmp_path, base, "feed_barrier")
    v0 = tbl.current_version()
    assert tbl.manifest()["feed_barrier"] is None  # bootstrap overwrite: no barrier

    merge_into(tbl, log.filter(F.col("lsn") < 400), epoch="b0")
    vacuum_tombstones(tbl, watermark_lsn=401)
    v_vac = tbl.current_version()
    merge_into(tbl, log.filter((F.col("lsn") >= 400) & (F.col("lsn") < 700)), epoch="b1")
    merge_into(tbl, log.filter(F.col("lsn") >= 700), epoch="b2")
    head = tbl.current_version()
    assert head > v_vac
    # barrier propagated through two later merges
    assert tbl.manifest(head)["feed_barrier"] == {
        "version": v_vac, "operation": "vacuum_tombstones",
    }
    with pytest.raises(ChangeFeedUnavailableError, match="vacuum"):
        read_changes(tbl, v0, head)
    read_changes(tbl, v_vac, head).count()  # range starting AT the barrier: clean

    # overwrite of a NON-empty table is a barrier
    tbl.overwrite_full(base)
    v_ow = tbl.current_version()
    merge_into(tbl, log.filter(F.col("lsn") < 50), epoch="b3")
    with pytest.raises(ChangeFeedUnavailableError, match="overwrite"):
        read_changes(tbl, v_ow - 1, tbl.current_version())
    read_changes(tbl, v_ow, tbl.current_version()).count()


def test_allow_gc_full_join_recovers_vacuumed_deletes(spark, tmp_path, fixtures):
    """With allow_gc=True the diff runs as a full-outer join: a key whose
    tombstone was physically vacuumed inside the range still surfaces as a
    synthesized delete (null payload, lsn = before-watermark + 1)."""
    import pyspark.sql.functions as F

    base, log, _, _ = fixtures
    tbl = make_table(spark, tmp_path, base, "feed_gc")
    v0 = tbl.current_version()
    replay_log(tbl, log, num_epochs=1)
    deleted_keys = {
        r["doc_id"]
        for r in read_changes(tbl, v0, tbl.current_version())
        .filter(F.col(CHANGE_OP_COL) == "delete")
        .select("doc_id")
        .collect()
    }
    assert deleted_keys, "fixture must produce deletes"
    vacuum_tombstones(tbl, watermark_lsn=N_EVENTS + 1)
    got = read_changes(tbl, v0, tbl.current_version(), allow_gc=True)
    got_deleted = {
        r["doc_id"]
        for r in got.filter(F.col(CHANGE_OP_COL) == "delete").select("doc_id").collect()
    }
    assert got_deleted == deleted_keys


def test_consumer_polls_partition_the_feed(spark, tmp_path, fixtures):
    """Poll→process→commit across three merges delivers every change exactly
    once (union of polled feeds == the full-range feed); a restarted consumer
    resumes from the committed offset; an uncommitted poll redelivers."""
    import pyspark.sql.functions as F

    from standardized_omop_data_etl_spark.plans.change_feed import ChangeFeedConsumer

    base, log, _, _ = fixtures
    tbl = make_table(spark, tmp_path, base, "feed_consumer")
    v0 = tbl.current_version()
    c = ChangeFeedConsumer(tbl, "sink-a", start_version=v0)
    assert c.poll() is None  # caught up at creation

    polled = []
    for i, lo in enumerate(range(0, N_EVENTS, N_EVENTS // 3 + 1)):
        hi = min(lo + N_EVENTS // 3 + 1, N_EVENTS)
        merge_into(
            tbl, log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)), epoch=f"e{i}"
        )
        got = c.poll()
        assert got is not None
        feed, head = got
        # uncommitted re-poll redelivers the same range
        feed2, head2 = c.poll()
        assert head2 == head and feed2.count() == feed.count()
        polled.append(feed.toPandas())
        assert c.commit(head)
        assert not c.commit(head)  # double-commit is a no-op

    # a fresh consumer object resumes from the durable offset
    c2 = ChangeFeedConsumer(tbl, "sink-a", start_version=0)  # start ignored: exists
    assert c2.position() == tbl.current_version() and c2.poll() is None

    full = read_changes(tbl, v0, tbl.current_version()).toPandas()
    union = pd.concat(polled, ignore_index=True)
    # a key may be re-reported across polls (insert then update), and the
    # per-poll op is classified against that poll's base state — but the
    # LAST polled change per key must carry the same winning LSN as the
    # full-range feed (nothing lost, nothing delivered past the winner).
    last = (
        union.sort_values(CHANGE_LSN_COL, kind="mergesort")
        .groupby("doc_id", as_index=False)
        .tail(1)
    )
    merged = last.merge(full, on="doc_id", suffixes=("_got", "_full"), how="right")
    # final-delete keys: a later redelete only refreshes the tombstone LSN
    # (no visible delta), so polls legitimately report the FIRST delete —
    # the op must match, the LSN may be ≤ the full-range (final) tombstone's.
    dead = merged[f"{CHANGE_OP_COL}_full"] == "delete"
    assert (merged.loc[dead, f"{CHANGE_OP_COL}_got"] == "delete").all()
    assert (
        merged.loc[dead, f"{CHANGE_LSN_COL}_got"]
        <= merged.loc[dead, f"{CHANGE_LSN_COL}_full"]
    ).all()
    live = ~dead
    assert (
        merged.loc[live, f"{CHANGE_LSN_COL}_got"]
        == merged.loc[live, f"{CHANGE_LSN_COL}_full"]
    ).all()
    # and no (key, lsn) change is delivered twice across committed polls
    assert not union.duplicated(subset=["doc_id", CHANGE_LSN_COL]).any()


def test_consumer_commit_cas_loses_race(spark, tmp_path, fixtures):
    """Two processes sharing a consumer name: the second commit for the same
    range CAS-fails instead of silently double-advancing; racing initializers
    agree on one start position."""
    import pyspark.sql.functions as F

    from standardized_omop_data_etl_spark.plans.change_feed import ChangeFeedConsumer

    base, log, _, _ = fixtures
    tbl = make_table(spark, tmp_path, base, "feed_race")
    v0 = tbl.current_version()
    c1 = ChangeFeedConsumer(tbl, "shared", start_version=v0)
    c2 = ChangeFeedConsumer(tbl, "shared", start_version=v0 + 999)  # loses init race
    assert c2.position() == v0
    merge_into(tbl, log.filter(F.col("lsn") < 100), epoch="race0")
    _, head1 = c1.poll()
    _, head2 = c2.poll()
    assert head1 == head2
    assert c1.commit(head1)
    assert not c2.commit(head2)  # CAS fails: c1 already advanced past pos
    assert c2.position() == head1 and c2.poll() is None


def test_mirror_replicates_table_exactly_once(spark, tmp_path, fixtures):
    """End-to-end CDC replication: source ingests the log across interleaved
    mirror drains; the mirror converges to the source's visible state
    bit-exactly, a redelivered drain (offset commit 'lost') is a no-op on
    the sink ledger, and a caught-up drain returns []."""
    import pyspark.sql.functions as F

    from standardized_omop_data_etl_spark.plans.change_feed import (
        ChangeFeedConsumer,
        mirror_changes,
    )

    base, log, _, _ = fixtures
    src = make_table(spark, tmp_path, base, "mirror_src")
    v0 = src.current_version()
    sink = make_table(spark, tmp_path, base, "mirror_sink")
    c = ChangeFeedConsumer(src, "mirror", start_version=v0)

    third = N_EVENTS // 3 + 1
    last_pos = v0
    for i, lo in enumerate(range(0, N_EVENTS, third)):
        merge_into(
            src,
            log.filter((F.col("lsn") >= lo) & (F.col("lsn") < lo + third)),
            epoch=f"src{i}",
        )
        last_pos = c.position()
        rs = mirror_changes(c, sink)
        assert rs and not any(r.skipped for r in rs)

    pd.testing.assert_frame_equal(
        canonicalize(sink.read().toPandas()), canonicalize(src.read().toPandas())
    )
    assert mirror_changes(c, sink) == []  # caught up

    # crash-between-process-and-commit: rewind the offset to the last drain's
    # start — the redelivered range produces the identical epoch key, which
    # the sink's ledger skips without touching data or version
    sink_v = sink.current_version()
    c.fs.write_text_atomic(c._path, c._payload(last_pos))
    rs = mirror_changes(c, sink)
    assert rs and all(r.skipped for r in rs)
    assert sink.current_version() == sink_v
    pd.testing.assert_frame_equal(
        canonicalize(sink.read().toPandas()), canonicalize(src.read().toPandas())
    )


def test_racing_consumers_at_least_once_no_skipped_ranges(spark, tmp_path, fixtures):
    """Two ChangeFeedConsumer handles SHARING one name race poll/commit under
    injected CAS interference (judge task r5#7): a peer's full
    poll-process-commit is slipped in BETWEEN the victim's poll and its CAS
    via the fault hook, and separately a commit attempt dies in a simulated
    outage BEFORE the swap lands. Contract proved: delivery is at-least-once
    (duplicate processing of a range is observed, never silently dropped)
    and NO version range is skipped — the union of processed (pos, head]
    ranges tiles every committed version, and both handles converge on the
    final head."""
    import pyspark.sql.functions as F

    from standardized_omop_data_etl_spark.plans.change_feed import ChangeFeedConsumer
    from standardized_omop_data_etl_spark.sources.fs import (
        FaultInjectingFileSystem,
        LocalFileSystem,
    )

    base, log, _, _ = fixtures
    tbl = make_table(spark, tmp_path, base, "feed_race2")
    v0 = tbl.current_version()
    # 5 source epochs to chase
    for i, lo in enumerate(range(0, 500, 100)):
        merge_into(
            tbl,
            log.filter((F.col("lsn") >= lo) & (F.col("lsn") < lo + 100)),
            epoch=f"r{i}",
        )
    head_final = tbl.current_version()

    processed: list[tuple[str, int, int]] = []  # (who, pos, head)
    state = {"peer_budget": 2, "outage_budget": 1, "in_hook": False}

    # victim A runs on a fault-injecting fs; peer B on a plain one
    tbl_b = LakeTable.load(spark, tbl.path)
    b = ChangeFeedConsumer(tbl_b, "shared2", start_version=v0)

    def drain_b_once():
        got = b.poll()
        if got is None:
            return
        _, head = got
        processed.append(("B", b.position(), head))
        assert b.commit(head)

    def hook(op, path):
        if op != "replace_if_equals" or not path.endswith("shared2.json"):
            return
        if state["in_hook"]:
            return
        state["in_hook"] = True
        try:
            if state["outage_budget"] > 0:
                state["outage_budget"] -= 1
                raise ConnectionError("injected outage before CAS landed")
            if state["peer_budget"] > 0:
                state["peer_budget"] -= 1
                drain_b_once()  # peer wins the race inside A's commit window
        finally:
            state["in_hook"] = False

    tbl_a = LakeTable.load(
        spark, tbl.path, fs=FaultInjectingFileSystem(LocalFileSystem(), hook=hook)
    )
    a = ChangeFeedConsumer(tbl_a, "shared2", start_version=v0)

    cas_failures = 0
    outages = 0
    for _ in range(20):  # bounded retry loop, breaks when caught up
        got = a.poll()
        if got is None:
            break
        _, head = got
        processed.append(("A", a.position(), head))
        try:
            if not a.commit(head):
                cas_failures += 1  # peer advanced first: re-poll, reprocess
        except ConnectionError:
            outages += 1  # unknown outcome: re-poll re-delivers the range
    else:
        raise AssertionError("consumer never caught up")

    assert cas_failures >= 1, "peer interleave never caused a CAS failure"
    assert outages == 1
    assert a.position() == head_final and b.poll() is None

    # no skipped ranges: every committed version is inside >=1 processed range
    covered = set()
    for _, pos, head in processed:
        covered.update(range(pos + 1, head + 1))
    assert covered == set(range(v0 + 1, head_final + 1)), processed
    # at-least-once, not exactly-once: some version was delivered twice
    counts = {}
    for _, pos, head in processed:
        for v in range(pos + 1, head + 1):
            counts[v] = counts.get(v, 0) + 1
    assert any(n > 1 for n in counts.values()), processed
