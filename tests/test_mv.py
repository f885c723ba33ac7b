"""Before-images on the change feed + incremental aggregate maintenance.

The contract under test, end to end: bootstrap a per-(source) count/sum view
once, then after every replay epoch refresh it ONLY from
``read_changes(..., include_before=True)`` deltas — and at every version the
maintained view must equal a from-scratch re-aggregate of the table's visible
state (the recompute oracle). Before-images themselves are checked against a
pandas state oracle (NULL on inserts, prior visible payload on
updates/deletes).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from standardized_omop_data_etl_spark.plans.change_feed import (
    BEFORE_PREFIX,
    CHANGE_OP_COL,
    ChangeFeedConsumer,
    read_changes,
)
from standardized_omop_data_etl_spark.plans.mv import (
    COUNT_COL,
    agg_deltas,
    apply_agg_deltas,
    bootstrap_agg,
)
from standardized_omop_data_etl_spark.plans.replay import replay_log
from standardized_omop_data_etl_spark.sources.generators import base_sequences, change_log
from standardized_omop_data_etl_spark.sources.lake import LakeTable

N_DOCS = 200
N_EVENTS = 1200
EPOCHS = 4


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    base = base_sequences(spark, N_DOCS, seed=11, max_len=32)
    log = change_log(spark, N_EVENTS, N_DOCS, seed=11, max_len=32)
    tbl = LakeTable.create(
        spark,
        str(tmp_path_factory.mktemp("mv") / "t"),
        schema=base.schema,
        key_col="doc_id",
        num_buckets=8,
        overwrite=True,
    )
    tbl.overwrite_full(base)
    v0 = tbl.current_version()
    replay_log(tbl, log, num_epochs=EPOCHS)
    return tbl, v0, base.toPandas(), log.toPandas()


def _visible_state(base_pdf, log_pdf, upto_lsn):
    """doc_id -> payload dict of rows visible after events with lsn < upto."""
    cols = [c for c in log_pdf.columns if c not in ("lsn", "op")]
    st = {r["doc_id"]: {c: r.get(c) for c in cols} for _, r in base_pdf.iterrows()}
    dead = set()
    ev = log_pdf[log_pdf["lsn"] < upto_lsn].sort_values("lsn", kind="mergesort")
    for _, r in ev.iterrows():
        if r["op"] == "delete":
            dead.add(r["doc_id"])
            st[r["doc_id"]] = {c: r.get(c) for c in cols}
        else:
            dead.discard(r["doc_id"])
            st[r["doc_id"]] = {c: r.get(c) for c in cols}
    return {k: v for k, v in st.items() if k not in dead}


def test_before_images_match_state_oracle(spark, table):
    tbl, v0, base_pdf, log_pdf = table
    v_hi = tbl.current_version()
    per_epoch = N_EVENTS // EPOCHS  # replay_log splits the LSN range evenly
    for v_from in range(v0, v_hi):
        feed = read_changes(tbl, v_from, v_from + 1, include_before=True).toPandas()
        vis = _visible_state(base_pdf, log_pdf, (v_from - v0) * per_epoch)
        for _, r in feed.iterrows():
            if r[CHANGE_OP_COL] == "insert":
                assert pd.isna(r[BEFORE_PREFIX + "doc_id"]), r["doc_id"]
            else:
                prior = vis[r["doc_id"]]
                assert r[BEFORE_PREFIX + "doc_id"] == r["doc_id"]
                assert int(r[BEFORE_PREFIX + "n_tok"]) == int(prior["n_tok"])
                assert list(r[BEFORE_PREFIX + "tokens"]) == list(prior["tokens"])
        # updates/deletes ⇔ key visible at v_from
        ops = feed.set_index("doc_id")[CHANGE_OP_COL]
        for doc_id, op in ops.items():
            assert (op != "insert") == (doc_id in vis)


def test_incremental_view_equals_recompute_every_version(spark, table):
    tbl, v0, _, _ = table
    v_hi = tbl.current_version()
    group, sums = ["source"], ["n_tok"]
    view = bootstrap_agg(tbl.read(version=v0), group, sums)
    for v in range(v0, v_hi):
        feed = read_changes(tbl, v, v + 1, include_before=True)
        view = apply_agg_deltas(view, agg_deltas(feed, group, sums), group, sums)
        got = view.toPandas().sort_values("source").reset_index(drop=True)
        want = (
            bootstrap_agg(tbl.read(version=v + 1), group, sums)
            .toPandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_group_moving_updates_and_zero_groups(spark, tmp_path):
    # hand-built log: one row moves groups, one group empties entirely
    base = spark.createDataFrame(
        [("a", [1, 2], 2, "s1"), ("b", [3], 1, "s2")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), schema=base.schema,
        key_col="doc_id", num_buckets=4, overwrite=True,
    )
    tbl.overwrite_full(base)
    log = spark.createDataFrame(
        [
            (1, "upsert", "a", [9, 9, 9], 3, "s2"),  # a moves s1 -> s2
            (2, "delete", "b", None, None, "s2"),     # s2 loses b
        ],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    replay_log(tbl, log, num_epochs=1)
    feed = read_changes(tbl, 1, tbl.current_version(), include_before=True)
    view = bootstrap_agg(base, ["source"], ["n_tok"])
    view = apply_agg_deltas(
        view, agg_deltas(feed, ["source"], ["n_tok"]), ["source"], ["n_tok"]
    )
    got = {r["source"]: (r[COUNT_COL], r["mv_sum_n_tok"]) for r in view.collect()}
    assert got == {"s2": (1, 3.0)}  # s1 emptied and dropped; s2 = moved row only


def test_consumer_poll_include_before(spark, table):
    tbl, v0, _, _ = table
    c = ChangeFeedConsumer(tbl, "mv_test", start_version=v0)
    feed, head = c.poll(include_before=True)
    assert head == tbl.current_version()
    bcols = [c_ for c_ in feed.columns if c_.startswith(BEFORE_PREFIX)]
    assert BEFORE_PREFIX + "tokens" in bcols and BEFORE_PREFIX + "doc_id" in bcols
    # collapsed multi-epoch feed still nets to the recompute oracle
    view = bootstrap_agg(tbl.read(version=v0), ["source"], ["n_tok"])
    view = apply_agg_deltas(
        view, agg_deltas(feed, ["source"], ["n_tok"]), ["source"], ["n_tok"]
    )
    want = bootstrap_agg(tbl.read(), ["source"], ["n_tok"]).toPandas()
    got = view.toPandas()
    pd.testing.assert_frame_equal(
        got.sort_values("source").reset_index(drop=True),
        want.sort_values("source").reset_index(drop=True),
        check_dtype=False,
    )
    assert c.commit(head)


def test_agg_deltas_requires_before_images(spark, table):
    tbl, v0, _, _ = table
    feed = read_changes(tbl, v0, v0 + 1)  # no before-images
    with pytest.raises(ValueError, match="include_before"):
        agg_deltas(feed, ["source"], ["n_tok"])


def test_persisted_view_refresh_and_crash_recovery(spark, tmp_path):
    from standardized_omop_data_etl_spark.plans.mv import (
        MV_KEY_COL,
        materialize_view,
        refresh_view,
    )

    base = base_sequences(spark, 120, seed=3, max_len=24)
    src = LakeTable.create(
        spark, str(tmp_path / "src"), schema=base.schema,
        key_col="doc_id", num_buckets=4, overwrite=True,
    )
    src.overwrite_full(base)
    view, c = materialize_view(
        spark, str(tmp_path / "view"), src, ["source"], ["n_tok"], name="m1"
    )

    log = change_log(spark, 600, 120, seed=3, max_len=24)
    e1 = log.filter(F.col("lsn") < 200)
    e2 = log.filter((F.col("lsn") >= 200) & (F.col("lsn") < 400))
    e3 = log.filter(F.col("lsn") >= 400)

    replay_log(src, e1, num_epochs=1, epoch_prefix="a")
    applied = refresh_view(view, c, ["source"], ["n_tok"])
    assert len(applied) == 1 and not applied[0].skipped

    def recompute():
        return (
            bootstrap_agg(src.read(), ["source"], ["n_tok"])
            .toPandas().sort_values("source").reset_index(drop=True)
        )

    def view_state():
        return (
            view.read().drop(MV_KEY_COL)
            .toPandas().sort_values("source").reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(view_state(), recompute(), check_dtype=False)

    # crash window: refresh applied e2's MERGE but the offset commit was
    # lost — simulate by CAS-ing the offset file back to the old position
    replay_log(src, e2, num_epochs=1, epoch_prefix="b")
    pos_before = c.position()
    refresh_view(view, c, ["source"], ["n_tok"])
    assert c.fs.replace_if_equals(
        c._path, c._payload(c.position()), c._payload(pos_before)
    )
    assert c.position() == pos_before  # "crashed" before the commit

    # base advances further before anyone notices
    replay_log(src, e3, num_epochs=1, epoch_prefix="c")
    applied = refresh_view(view, c, ["source"], ["n_tok"])
    # fast-forward consumed the ledger hwm, then applied ONLY the new range
    assert len(applied) == 1
    pd.testing.assert_frame_equal(view_state(), recompute(), check_dtype=False)
    # idempotent once caught up
    assert refresh_view(view, c, ["source"], ["n_tok"]) == []
    pd.testing.assert_frame_equal(view_state(), recompute(), check_dtype=False)


def test_persisted_view_group_deletes_tombstone(spark, tmp_path):
    from standardized_omop_data_etl_spark.plans.mv import (
        MV_KEY_COL,
        materialize_view,
        refresh_view,
    )

    base = spark.createDataFrame(
        [("a", [1], 1, "s1"), ("b", [2], 1, "s2")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    src = LakeTable.create(
        spark, str(tmp_path / "src"), schema=base.schema,
        key_col="doc_id", num_buckets=2, overwrite=True,
    )
    src.overwrite_full(base)
    view, c = materialize_view(
        spark, str(tmp_path / "v"), src, ["source"], ["n_tok"], name="m2"
    )
    # delete the only s1 row -> the s1 group must disappear from the view
    log = spark.createDataFrame(
        [(1, "delete", "a", None, None, "s1")],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    replay_log(src, log, num_epochs=1)
    refresh_view(view, c, ["source"], ["n_tok"])
    got = view.read().select("source").toPandas()["source"].tolist()
    assert got == ["s2"]
    # and it can come back (tombstone revive through the same MERGE path)
    log2 = spark.createDataFrame(
        [(2, "upsert", "z", [5, 5], 2, "s1")],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    replay_log(src, log2, num_epochs=1)
    refresh_view(view, c, ["source"], ["n_tok"])
    got = {
        r["source"]: (r["mv_count"], r["mv_sum_n_tok"]) for r in view.read().collect()
    }
    assert got == {"s1": (1, 2.0), "s2": (1, 1.0)}


def test_agg_deltas_plan_prunes_payload_columns(spark, table):
    """The delta plan must never read the tokens arrays: Catalyst pushes
    agg_deltas' column needs through the feed's join/classification, so a
    view refresh scans (key, lsn, deleted, group, sum) — not payloads."""
    tbl, v0, _, _ = table
    feed = read_changes(tbl, v0, tbl.current_version(), include_before=True)
    d = agg_deltas(feed, ["source"], ["n_tok"])
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "tokens" not in plan, plan


def test_before_images_across_schema_evolution(spark, tmp_path):
    """A column added between the two snapshot versions has no before-image
    by definition: the feed pads `_before_<new>` as NULL instead of failing
    to read a column that didn't exist at v_from; MV maintenance over the
    evolved column works from the evolution epoch onward."""
    from standardized_omop_data_etl_spark.sources.generators import (
        with_added_column,
    )

    base = base_sequences(spark, 300, seed=13, max_len=24)
    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), schema=base.schema,
        key_col="doc_id", num_buckets=4, overwrite=True,
    )
    tbl.overwrite_full(base)
    log = change_log(spark, 800, 300, seed=13, max_len=24)
    e1 = log.filter(F.col("lsn") < 400)
    e2 = with_added_column(log.filter(F.col("lsn") >= 400), from_lsn=400)
    replay_log(tbl, e1, num_epochs=1, epoch_prefix="a")
    v1 = tbl.current_version()
    replay_log(tbl, e2, num_epochs=1, epoch_prefix="b")

    feed = read_changes(tbl, v1, tbl.current_version(), include_before=True)
    pdf = feed.toPandas()
    assert BEFORE_PREFIX + "lang" in pdf.columns
    # nothing carried a lang at v_from — every before-image of it is NULL
    assert pdf[BEFORE_PREFIX + "lang"].isna().all()
    # but pre-existing columns keep real before-images on updates
    upd = pdf[pdf[CHANGE_OP_COL] == "update"]
    assert len(upd) > 0 and upd[BEFORE_PREFIX + "n_tok"].notna().all()

    # and the deltas still reconcile: incremental == recompute over the
    # evolved grouping column (NULL group collects the pre-evolution rows)
    pre = tbl.read(version=v1).withColumn("lang", F.lit(None).cast("string"))
    view = bootstrap_agg(pre, ["lang"], ["n_tok"])
    view = apply_agg_deltas(
        view, agg_deltas(feed, ["lang"], ["n_tok"]), ["lang"], ["n_tok"]
    )
    want = bootstrap_agg(tbl.read(), ["lang"], ["n_tok"])
    got = view.toPandas().sort_values("lang", na_position="first").reset_index(drop=True)
    want = want.toPandas().sort_values("lang", na_position="first").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_refresh_strategies_equivalent_and_auto_picks(spark, tmp_path):
    """strategy='recompute' must land the identical view state through the
    same position-keyed epoch; 'auto' picks recompute for a range touching
    most buckets and incremental for a bucket-local one."""
    from standardized_omop_data_etl_spark.plans.mv import (
        MV_KEY_COL,
        _touched_fraction,
        materialize_view,
        refresh_view,
    )
    from standardized_omop_data_etl_spark.sources.lake import bucket_expr

    base = base_sequences(spark, 400, seed=17, max_len=24)
    log = change_log(spark, 1000, 400, seed=17, max_len=24)

    def build(name, strategy):
        src = LakeTable.create(
            spark, str(tmp_path / f"s_{name}"), schema=base.schema,
            key_col="doc_id", num_buckets=8, overwrite=True,
        )
        src.overwrite_full(base)
        view, c = materialize_view(
            spark, str(tmp_path / f"v_{name}"), src, ["source"], ["n_tok"],
            name=name,
        )
        replay_log(src, log, num_epochs=2)
        refresh_view(view, c, ["source"], ["n_tok"], strategy=strategy)
        return src, view

    states = {}
    for strat in ("incremental", "recompute", "auto"):
        src, view = build(strat, strat)
        states[strat] = (
            view.read().drop(MV_KEY_COL).toPandas()
            .sort_values("source").reset_index(drop=True)
        )
        want = (
            bootstrap_agg(src.read(), ["source"], ["n_tok"]).toPandas()
            .sort_values("source").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(states[strat], want, check_dtype=False)
    pd.testing.assert_frame_equal(states["incremental"], states["recompute"])

    # chooser inputs: a uniform range touches ~all buckets (fraction ~1),
    # a bucket-local range touches a small share
    src = LakeTable.create(
        spark, str(tmp_path / "s_frac"), schema=base.schema,
        key_col="doc_id", num_buckets=8, overwrite=True,
    )
    src.overwrite_full(base)
    v0 = src.current_version()
    replay_log(src, log, num_epochs=1, epoch_prefix="u")
    v1 = src.current_version()
    local_log = log.filter(bucket_expr("doc_id", 8) == 0).withColumn(
        "lsn", F.col("lsn") + 10_000
    )
    replay_log(src, local_log, num_epochs=1, epoch_prefix="l")
    v2 = src.current_version()
    assert _touched_fraction(src, v0, v1) > 0.9   # uniform -> recompute zone
    assert _touched_fraction(src, v1, v2) < 0.5   # local -> incremental zone


def test_agg_deltas_derived_group_pattern(spark, table):
    """Grouping by a DERIVED column works when the caller derives its
    _before_ twin too — agg_deltas reads BEFORE_PREFIX+group mechanically,
    so any expression computed over both images becomes a valid group."""
    tbl, v0, _, _ = table
    band = lambda c: (F.col(c) / 8).cast("int")  # noqa: E731
    feed = read_changes(tbl, v0, tbl.current_version(), include_before=True)
    feed = feed.withColumn("len_band", band("n_tok")).withColumn(
        BEFORE_PREFIX + "len_band", band(BEFORE_PREFIX + "n_tok")
    )
    view = bootstrap_agg(
        tbl.read(version=v0).withColumn("len_band", band("n_tok")),
        ["len_band"], ["n_tok"],
    )
    view = apply_agg_deltas(
        view, agg_deltas(feed, ["len_band"], ["n_tok"]), ["len_band"], ["n_tok"]
    )
    want = bootstrap_agg(
        tbl.read().withColumn("len_band", band("n_tok")), ["len_band"], ["n_tok"]
    )
    got = view.toPandas().sort_values("len_band").reset_index(drop=True)
    want = want.toPandas().sort_values("len_band").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_group_recompute_minmax_under_deletes(spark, tmp_path):
    """min/max maintenance via strategy='group_recompute': after every
    refresh the persisted view equals a from-scratch re-aggregate —
    INCLUDING the case the delta algebra cannot answer, a delete removing a
    group's current minimum/maximum (the group's next-best value must come
    back from the base table). Also: 'incremental' with min/max is refused,
    and 'auto' with min/max routes to group_recompute for a bucket-local
    range."""
    from standardized_omop_data_etl_spark.plans.mv import (
        MV_KEY_COL,
        materialize_view,
        refresh_view,
    )

    base = base_sequences(spark, 300, seed=23, max_len=24)
    log = change_log(spark, 900, 300, seed=23, max_len=24)
    src = LakeTable.create(
        spark, str(tmp_path / "s_mm"), schema=base.schema,
        key_col="doc_id", num_buckets=8, overwrite=True,
    )
    src.overwrite_full(base)
    view, cons = materialize_view(
        spark, str(tmp_path / "v_mm"), src, ["source"],
        sum_cols=["n_tok"], min_cols=["n_tok"], max_cols=["n_tok"], name="mm",
    )

    def assert_matches_recompute():
        got = (
            view.read().drop(MV_KEY_COL).toPandas()
            .sort_values("source").reset_index(drop=True)
        )
        want = (
            bootstrap_agg(src.read(), ["source"], ["n_tok"],
                          min_cols=["n_tok"], max_cols=["n_tok"]).toPandas()
            .sort_values("source").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    with pytest.raises(ValueError, match="not delta-maintainable"):
        refresh_view(view, cons, ["source"], ["n_tok"],
                     strategy="incremental", min_cols=["n_tok"])

    # maintained == recomputed at EVERY version, through generic churn
    per = 300
    for i in range(3):
        replay_log(src, log.filter((F.col("lsn") >= i * per) & (F.col("lsn") < (i + 1) * per)),
                   num_epochs=1, epoch_prefix=f"e{i}",
                   lsn_range=(i * per, (i + 1) * per - 1))
        refresh_view(view, cons, ["source"], ["n_tok"],
                     strategy="group_recompute",
                     min_cols=["n_tok"], max_cols=["n_tok"])
        assert_matches_recompute()

    # the targeted case: delete exactly the doc holding one group's MIN and
    # another group's MAX n_tok — the refreshed view must surface the
    # runner-up values, which only a re-read of those groups can produce
    cur = src.read().select("doc_id", "source", "n_tok").toPandas()
    g_min = cur.loc[cur["n_tok"].idxmin()]
    g_max = cur.loc[cur["n_tok"].idxmax()]
    from pyspark.sql import Row, types as T
    ev_schema = T.StructType(
        [T.StructField("lsn", T.LongType()), T.StructField("op", T.StringType())]
        # nullable copies: delete events carry NULL payloads
        + [T.StructField(f.name, f.dataType, True) for f in base.schema.fields]
    )
    kills = spark.createDataFrame(
        [Row(lsn=10_001, op="delete", doc_id=g_min["doc_id"], tokens=None,
             n_tok=None, source=None),
         Row(lsn=10_002, op="delete", doc_id=g_max["doc_id"], tokens=None,
             n_tok=None, source=None)],
        ev_schema,
    )
    merge_into_mod = __import__(
        "standardized_omop_data_etl_spark.plans.merge", fromlist=["merge_into"]
    )
    merge_into_mod.merge_into(src, kills, epoch="kill-minmax")
    # auto with min/max on a 2-doc (bucket-local) range -> group_recompute
    refresh_view(view, cons, ["source"], ["n_tok"], strategy="auto",
                 min_cols=["n_tok"], max_cols=["n_tok"])
    assert_matches_recompute()
