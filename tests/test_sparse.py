"""Sparse (partial-column) update semantics — densify_sparse_batch + MERGE.

Oracle: a literal per-key pandas fold of the event chain in LSN order
(update NULL = unchanged; boundary semantics per the densify docstring),
applied per epoch so cross-epoch resident fill is exercised exactly as the
engine performs it.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Row, functions as F, types as T

from standardized_omop_data_etl_spark.plans.merge import densify_sparse_batch, merge_into
from standardized_omop_data_etl_spark.plans.replay import replay_log
from standardized_omop_data_etl_spark.sources.lake import LakeTable

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
])

EV_SCHEMA = T.StructType(
    [T.StructField("lsn", T.LongType()), T.StructField("op", T.StringType())]
    + SCHEMA.fields
)

PAYLOAD = ["tokens", "n_tok", "source"]


def fold_oracle(base_rows: dict, events: list[dict]) -> dict:
    """state: {doc_id: {col: val}} after folding events (lsn order) onto base."""
    state = {k: dict(v) for k, v in base_rows.items()}
    for e in sorted(events, key=lambda e: e["lsn"]):
        k = e["doc_id"]
        if e["op"] == "delete":
            state.pop(k, None)
        elif e["op"] in ("insert", "upsert"):
            state[k] = {c: e.get(c) for c in PAYLOAD}
        elif e["op"] == "update":
            if k not in state:
                continue  # update-on-absent: no-op
            for c in PAYLOAD:
                if e.get(c) is not None:
                    state[k][c] = e[c]
    return state


def ev(lsn, op, doc, tokens=None, n_tok=None, source=None):
    return dict(lsn=lsn, op=op, doc_id=doc, tokens=tokens, n_tok=n_tok, source=source)


def make_table(spark, tmp_path, base_events):
    tbl = LakeTable.create(spark, str(tmp_path / "tbl"), schema=SCHEMA,
                           key_col="doc_id", num_buckets=8, overwrite=True)
    if base_events:
        df = spark.createDataFrame([Row(**e) for e in base_events], EV_SCHEMA)
        merge_into(tbl, df, epoch="bootstrap")
    return tbl


def read_state(tbl) -> dict:
    rows = tbl.read().collect()
    return {
        r["doc_id"]: {c: (list(r[c]) if c == "tokens" and r[c] is not None else r[c])
                      for c in PAYLOAD}
        for r in rows
    }


CASES = [
    # update after image in same batch: per-column coalesce
    [ev(10, "insert", "a", [1, 2], 2, "s1"), ev(20, "update", "a", None, 9, None)],
    # update NULL keeps prior value; image NULL is genuine
    [ev(10, "insert", "b", None, 5, "s1"), ev(20, "update", "b", [7], None, None)],
    # update stacking: newest non-null per column wins
    [ev(10, "insert", "c", [1], 1, "s1"), ev(20, "update", "c", [2], None, None),
     ev(30, "update", "c", None, 3, None)],
    # delete kills earlier updates; update after delete is a no-op
    [ev(10, "insert", "d", [1], 1, "s1"), ev(20, "update", "d", [2], None, None),
     ev(30, "delete", "d"), ev(40, "update", "d", [9], 9, "s9")],
    # resurrect by full image after delete; later update applies to it
    [ev(10, "insert", "e", [1], 1, "s1"), ev(20, "delete", "e"),
     ev(30, "upsert", "e", [5], 5, "s5"), ev(40, "update", "e", None, 6, None)],
    # update-only on absent key: no-op
    [ev(10, "update", "zz", [1], 1, "s1")],
    # out-of-lsn-order arrival within the batch (arrival order irrelevant)
    [ev(30, "update", "f", None, 7, None), ev(10, "insert", "f", [3], 3, "s3"),
     ev(20, "update", "f", [4], None, None)],
]


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_sparse_cases_single_batch(spark, tmp_path, mode):
    base = {"a": dict(tokens=[0], n_tok=0, source="base"),
            "f": dict(tokens=[0], n_tok=0, source="base")}
    base_events = [ev(0, "insert", k, **v) for k, v in base.items()]
    tbl = make_table(spark, tmp_path, base_events)
    events = [e for case in CASES for e in case]
    batch = spark.createDataFrame([Row(**e) for e in events], EV_SCHEMA)
    merge_into(tbl, batch, epoch="sparse1", mode=mode, sparse_updates=True,
               batch_rows_bound=len(events))
    assert read_state(tbl) == fold_oracle(base, events)


def test_sparse_resident_fill_across_epochs(spark, tmp_path):
    # epoch 1 inserts; epoch 2 holds ONLY partial updates — every updated
    # column must fill from the epoch-1 resident rows, untouched columns
    # must survive verbatim.
    base_events = [ev(i, "insert", f"k{i}", [i, i + 1], 2, f"s{i}") for i in range(20)]
    tbl = make_table(spark, tmp_path, [])
    merge_into(tbl, spark.createDataFrame([Row(**e) for e in base_events], EV_SCHEMA),
               epoch="e1", sparse_updates=True, batch_rows_bound=20)
    upd = [ev(100 + i, "update", f"k{i}", None, 99, None) for i in range(0, 20, 2)]
    upd.append(ev(200, "update", "ghost", None, 1, None))  # absent key: no-op
    merge_into(tbl, spark.createDataFrame([Row(**e) for e in upd], EV_SCHEMA),
               epoch="e2", mode="mor", sparse_updates=True, batch_rows_bound=len(upd))
    expect = fold_oracle({}, base_events + upd)
    assert read_state(tbl) == expect
    assert "ghost" not in read_state(tbl)


def test_sparse_update_on_tombstone_is_noop(spark, tmp_path):
    tbl = make_table(spark, tmp_path, [ev(0, "insert", "t", [1], 1, "s")])
    merge_into(tbl, spark.createDataFrame([Row(**ev(10, "delete", "t"))], EV_SCHEMA),
               epoch="del", sparse_updates=True, batch_rows_bound=1)
    merge_into(tbl, spark.createDataFrame([Row(**ev(20, "update", "t", None, 9, None))],
                                          EV_SCHEMA),
               epoch="upd", sparse_updates=True, batch_rows_bound=1)
    assert read_state(tbl) == {}


def test_sparse_replay_matches_dense_oracle(spark, tmp_path):
    """Random-ish deterministic log, sparsified: replay_log(sparse_updates=True)
    over 4 epochs == pandas fold oracle."""
    import random

    rnd = random.Random(7)
    docs = [f"d{i}" for i in range(60)]
    events = []
    for lsn in range(400):
        doc = rnd.choice(docs)
        roll = rnd.random()
        if roll < 0.15:
            events.append(ev(lsn, "delete", doc))
        elif roll < 0.35:
            events.append(ev(lsn, "insert", doc, [lsn], 1, f"s{lsn}"))
        elif roll < 0.5:
            events.append(ev(lsn, "upsert", doc, [lsn, lsn], 2, f"s{lsn}"))
        else:
            # sparse update: each column independently present
            events.append(ev(
                lsn, "update", doc,
                [lsn] if rnd.random() < 0.5 else None,
                lsn if rnd.random() < 0.5 else None,
                f"u{lsn}" if rnd.random() < 0.5 else None,
            ))
    base = {d: dict(tokens=[0], n_tok=0, source="base") for d in docs[:30]}
    tbl = make_table(spark, tmp_path, [ev(-1 - i, "insert", d, **v)
                                       for i, (d, v) in enumerate(base.items())])
    log = spark.createDataFrame([Row(**e) for e in events], EV_SCHEMA)
    results = replay_log(tbl, log, num_epochs=4, lsn_range=(0, 399),
                         mode="auto", sparse_updates=True)
    assert len(results) == 4 and not any(r.skipped for r in results)
    assert read_state(tbl) == fold_oracle(base, events)
    # idempotence: re-applying the sparse replay skips every epoch
    v = tbl.current_version()
    again = replay_log(tbl, log, num_epochs=4, lsn_range=(0, 399),
                       mode="auto", sparse_updates=True)
    assert all(r.skipped for r in again) and tbl.current_version() == v


def test_sparse_all_full_image_skips_resident_read(spark, tmp_path, monkeypatch):
    """Whole-row-producer fast path: when every key carries at least one full
    image (no fill keys), the densify's resident read + join are skipped
    entirely — the 'sparse' replay plan degenerates to fold + merge. Spied
    via LakeTable.read: the ONLY reads the epoch may perform are the probe's
    include_hidden key scan and the rewrite's full-bucket read; the fill
    read's signature (a visible column-projected read with/without
    key_filter) must not occur. Result stays oracle-exact."""
    from standardized_omop_data_etl_spark.sources.lake import LakeTable as LT

    base_events = [ev(i, "insert", f"w{i}", [i], 1, "s") for i in range(20)]
    tbl = make_table(spark, tmp_path, base_events)
    # upserts (full images) + deletes only — no update events at all
    events = (
        [ev(100 + i, "upsert", f"w{i}", [100 + i, i], 2, f"s{i}") for i in range(15)]
        + [ev(200 + i, "delete", f"w{15 + i}") for i in range(3)]
    )
    log = spark.createDataFrame([Row(**e) for e in events], EV_SCHEMA)

    calls: list[dict] = []
    real_read = LT.read

    def spying(self, *a, **kw):
        calls.append(kw)
        return real_read(self, *a, **kw)

    monkeypatch.setattr(LT, "read", spying)
    merge_into(tbl, log, epoch="full-image", sparse_updates=True,
               batch_rows_bound=len(events))
    fill_reads = [
        kw for kw in calls
        if kw.get("columns") and not kw.get("include_hidden")
    ]
    assert not fill_reads, f"resident fill read ran on an all-image log: {fill_reads}"
    monkeypatch.undo()
    assert read_state(tbl) == fold_oracle(
        {f"w{i}": dict(tokens=[i], n_tok=1, source="s") for i in range(20)}, events
    )


def test_sparse_pipeline_flag_degrades_serial(spark, tmp_path):
    # pipeline=True with sparse_updates must be correct (lookahead suppressed)
    base_events = [ev(i, "insert", f"p{i}", [i], 1, "s") for i in range(10)]
    tbl = make_table(spark, tmp_path, [])
    merge_into(tbl, spark.createDataFrame([Row(**e) for e in base_events], EV_SCHEMA),
               epoch="e1", sparse_updates=True, batch_rows_bound=10)
    upd = [ev(100 + i, "update", f"p{i}", None, 42, None) for i in range(10)]
    log = spark.createDataFrame([Row(**e) for e in upd], EV_SCHEMA)
    replay_log(tbl, log, num_epochs=2, lsn_range=(100, 109), mode="mor",
               sparse_updates=True, pipeline=True)
    assert read_state(tbl) == fold_oracle({}, base_events + upd)


def test_densify_output_shape(spark, tmp_path):
    tbl = make_table(spark, tmp_path, [ev(0, "insert", "x", [1], 1, "s")])
    batch = spark.createDataFrame(
        [Row(**ev(10, "update", "x", None, 5, None)),
         Row(**ev(11, "delete", "y")),
         Row(**ev(12, "insert", "z", [9], 1, "s9"))], EV_SCHEMA)
    out = densify_sparse_batch(tbl, batch, batch_rows_bound=3)
    rows = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert out.columns == batch.columns + ["_n_events"]
    assert all(r["_n_events"] == 1 for r in rows.values())
    assert rows["x"]["op"] == "upsert" and rows["x"]["n_tok"] == 5 \
        and list(rows["x"]["tokens"]) == [1] and rows["x"]["source"] == "s"
    assert rows["y"]["op"] == "delete" and rows["y"]["tokens"] is None
    assert rows["z"]["op"] == "upsert" and rows["z"]["n_tok"] == 1


@pytest.mark.timeout(300)
def test_sparse_streaming_tail(spark, tmp_path):
    """stream_changelog_from(sparse_updates=True): a file-tailed sparse
    changelog lands on the same pandas fold oracle as the batch path."""
    from pyspark.sql import functions as F

    from standardized_omop_data_etl_spark.streaming.changelog import (
        CHANGELOG_SCHEMA,
        stream_changelog_from,
    )

    base_events = [ev(i, "insert", f"s{i % 40}", [i], 1, f"src{i}") for i in range(40)]
    upd = []
    for j in range(120):
        lsn = 100 + j
        doc = f"s{j % 40}"
        if j % 11 == 0:
            upd.append(ev(lsn, "delete", doc))
        elif j % 7 == 0:
            upd.append(ev(lsn, "upsert", doc, [lsn], 1, f"src{lsn}"))
        else:
            upd.append(ev(lsn, "update", doc,
                          [lsn] if j % 2 else None,
                          lsn if j % 3 else None,
                          f"u{lsn}" if j % 5 else None))

    tbl = make_table(spark, tmp_path, [])
    merge_into(tbl, spark.createDataFrame([Row(**e) for e in base_events], EV_SCHEMA),
               epoch="boot", sparse_updates=True, batch_rows_bound=40)

    log_dir = str(tmp_path / "binlog")
    import os as _os
    _os.makedirs(log_dir)
    updf = spark.createDataFrame([Row(**e) for e in upd], EV_SCHEMA)
    for i, (lo, hi) in enumerate([(100, 160), (160, 220)]):
        updf.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)).coalesce(1).write.parquet(
            f"{log_dir}/seg{i}.parquet"
        )

    stream = spark.readStream.schema(EV_SCHEMA).option("maxFilesPerTrigger", 1).parquet(
        log_dir + "/*"
    )
    q = stream_changelog_from(
        stream, tbl, str(tmp_path / "ckpt"), trigger_once=True,
        sparse_updates=True, max_batch_rows=len(upd),
    )
    q.awaitTermination(240)

    assert read_state(tbl) == fold_oracle({}, base_events + upd)


def test_sparse_with_schema_evolution_added_column(spark, tmp_path):
    """A sparse epoch whose events carry a NEW column: ALTER-before-MERGE
    adds it; fill-needing keys take the update's value for the new column
    (or NULL — no resident value can exist for a just-added column)."""
    base_events = [ev(i, "insert", f"n{i}", [i], 1, "s") for i in range(6)]
    tbl = make_table(spark, tmp_path, [])
    merge_into(tbl, spark.createDataFrame([Row(**e) for e in base_events], EV_SCHEMA),
               epoch="e1", sparse_updates=True, batch_rows_bound=6)

    ev2_schema = T.StructType(EV_SCHEMA.fields + [T.StructField("lang", T.StringType())])
    upd = [
        dict(ev(100, "update", "n0", None, 7, None), lang="en"),
        dict(ev(101, "update", "n1", None, None, None), lang=None),  # all-unchanged
        dict(ev(102, "insert", "n9", [9], 1, "s9"), lang="de"),
    ]
    merge_into(tbl, spark.createDataFrame([Row(**e) for e in upd], ev2_schema),
               epoch="e2", sparse_updates=True, batch_rows_bound=3)

    rows = {r["doc_id"]: r.asDict() for r in tbl.read().collect()}
    assert set(rows) == {f"n{i}" for i in range(6)} | {"n9"}
    assert rows["n0"]["n_tok"] == 7 and rows["n0"]["lang"] == "en" \
        and list(rows["n0"]["tokens"]) == [0] and rows["n0"]["source"] == "s"
    # all-unchanged update: row survives verbatim, new column NULL
    assert rows["n1"]["n_tok"] == 1 and rows["n1"]["lang"] is None
    assert rows["n9"]["lang"] == "de"
    # untouched keys: padded NULL for the added column
    assert rows["n3"]["lang"] is None and rows["n3"]["n_tok"] == 1


def test_densify_sparse_stats(spark, tmp_path):
    from standardized_omop_data_etl_spark.plans.merge import densify_sparse_stats

    tbl = make_table(spark, tmp_path, [ev(0, "insert", "r1", [1], 1, "s"),
                                       ev(1, "insert", "r2", [2], 1, "s")])
    batch = spark.createDataFrame([
        Row(**ev(10, "update", "r1", None, 5, None)),   # fill, matched
        Row(**ev(11, "update", "ghost", None, 5, None)),  # fill, dropped
        Row(**ev(12, "delete", "r2")),                   # tombstone
        Row(**ev(13, "insert", "r3", [3], 1, "s")),      # dense image
        Row(**ev(14, "update", "r3", None, 9, None)),    # same key as image
    ], EV_SCHEMA)
    stats = densify_sparse_stats(tbl, batch, batch_rows_bound=5).collect()[0]
    assert stats["keys_total"] == 4
    assert stats["tombstones"] == 1
    assert stats["dense_images"] == 1
    assert stats["fill_keys"] == 2
    assert stats["fill_matched"] == 1
    assert stats["fill_dropped"] == 1


def test_sparse_crash_before_commit_then_resume(spark, tmp_path):
    """Crash a sparse mor epoch at the manifest-pointer flip (injected fs
    fault), then resume with a healthy fs: the epoch re-applies cleanly —
    densify re-reads the UNCHANGED pre-epoch resident state — and lands on
    the fold oracle. No double-apply, no partial state."""
    from standardized_omop_data_etl_spark.sources.fs import (
        FaultInjectingFileSystem,
        LocalFileSystem,
    )
    from standardized_omop_data_etl_spark.sources.lake import CURRENT_PTR

    base_events = [ev(i, "insert", f"c{i}", [i], 1, "s") for i in range(12)]
    tbl = make_table(spark, tmp_path, [])
    merge_into(tbl, spark.createDataFrame([Row(**e) for e in base_events], EV_SCHEMA),
               epoch="e1", sparse_updates=True, batch_rows_bound=12)
    v_before = tbl.current_version()

    crashes = {"armed": True}

    def hook(op, path):
        if crashes["armed"] and op == "write_text_atomic" and path.endswith(CURRENT_PTR):
            crashes["armed"] = False
            raise RuntimeError("injected crash at pointer flip")

    upd = [ev(100 + i, "update", f"c{i}", None, 77, None) for i in range(12)]
    upd_df_rows = [Row(**e) for e in upd]
    faulty = LakeTable.load(spark, tbl.path,
                            fs=FaultInjectingFileSystem(LocalFileSystem(), hook=hook))
    with pytest.raises(RuntimeError, match="injected crash"):
        merge_into(faulty, spark.createDataFrame(upd_df_rows, EV_SCHEMA),
                   epoch="e2", mode="mor", sparse_updates=True, batch_rows_bound=12)

    # resume with a healthy fs: pre-crash state intact, epoch unstamped
    resumed = LakeTable.load(spark, tbl.path)
    assert resumed.current_version() == v_before
    res = merge_into(resumed, spark.createDataFrame(upd_df_rows, EV_SCHEMA),
                     epoch="e2", mode="mor", sparse_updates=True, batch_rows_bound=12)
    assert not res.skipped
    assert read_state(resumed) == fold_oracle({}, base_events + upd)
