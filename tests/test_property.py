"""Property-based invariants of the MERGE/LWW engine (hypothesis).

The engine's core claim is order-independence: a change log's final state is
a pure function of the log's (key, lsn) winners, no matter how the events
are batched into epochs, in what order the epochs are applied, or which
apply mode (cow / mor / auto) each epoch uses. hypothesis searches the
combinatorial space of tiny logs × arbitrary partitions × arbitrary orders ×
mixed modes that the example-based suites can't enumerate; the oracle is the
pure-pandas ``expected_final_state`` (shares no code with the engine).

Examples are deliberately few (each one drives real Spark jobs) but every
run explores fresh cases; failures shrink to minimal logs.
"""

import shutil
import tempfile

import pandas as pd
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from standardized_omop_data_etl_spark.plans.merge import merge_into
from standardized_omop_data_etl_spark.sources.lake import LakeTable
from standardized_omop_data_etl_spark.sources.oracle import (
    canonicalize,
    expected_final_state,
)

N_KEYS = 6
OPS = ("insert", "update", "delete", "upsert")

PAYLOAD_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("val", T.LongType(), True),
])
LOG_SCHEMA = T.StructType([
    T.StructField("lsn", T.LongType(), False),
    T.StructField("op", T.StringType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("val", T.LongType(), True),
])


@st.composite
def scenario(draw):
    """A base table, a change log, a partition of the log into batches, an
    application order, and a per-batch apply mode."""
    base_keys = draw(st.lists(st.integers(0, N_KEYS - 1), unique=True, max_size=N_KEYS))
    base = [(k, draw(st.integers(-5, 5))) for k in sorted(base_keys)]
    n_events = draw(st.integers(1, 14))
    # unique LSNs: the LWW contract's tie-break on duplicate (key, lsn) is
    # deterministic but oracle-undefined, so the property space excludes it
    lsns = draw(st.lists(st.integers(0, 200), unique=True,
                         min_size=n_events, max_size=n_events))
    events = [
        (
            lsn,
            draw(st.sampled_from(OPS)),
            draw(st.integers(0, N_KEYS - 1)),
            draw(st.one_of(st.none(), st.integers(-5, 5))),
        )
        for lsn in lsns
    ]
    n_batches = draw(st.integers(1, 4))
    assignment = [draw(st.integers(0, n_batches - 1)) for _ in events]
    order = draw(st.permutations(range(n_batches)))
    modes = [draw(st.sampled_from(("cow", "mor", "auto"))) for _ in range(n_batches)]
    return base, events, assignment, order, modes


def _apply_scenario(spark, base, events, assignment, order, modes):
    base_pdf = pd.DataFrame(base, columns=["doc_id", "val"])
    log_pdf = pd.DataFrame(events, columns=["lsn", "op", "doc_id", "val"])

    workdir = tempfile.mkdtemp(prefix="prop_lww_")
    try:
        tbl = LakeTable.create(
            spark, workdir + "/t", schema=PAYLOAD_SCHEMA, key_col="doc_id",
            num_buckets=4, overwrite=True,
        )
        if len(base_pdf):
            tbl.overwrite_full(spark.createDataFrame(base_pdf, PAYLOAD_SCHEMA))
        for b in order:
            rows = [e for e, a in zip(events, assignment) if a == b]
            batch = spark.createDataFrame(
                pd.DataFrame(rows, columns=["lsn", "op", "doc_id", "val"]),
                LOG_SCHEMA,
            )
            merge_into(tbl, batch, epoch=f"p{b}", mode=modes[b])
        got = canonicalize(tbl.read().toPandas())
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    exp = canonicalize(expected_final_state(base_pdf, log_pdf))
    return got, exp


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(scenario())
def test_any_partition_any_order_any_mode_reaches_oracle(spark, sc):
    """Order-independence: every batching, application order, and cow/mor
    mix of the same log lands on the pandas-oracle final state — including
    out-of-order tombstones (no resurrection), upserts on absent keys, and
    NULL payloads."""
    base, events, assignment, order, modes = sc
    got, exp = _apply_scenario(spark, base, events, assignment, order, modes)
    assert got.equals(exp), f"\ngot:\n{got}\nexpected:\n{exp}"


WIDE_LOG_SCHEMA = T.StructType(
    LOG_SCHEMA.fields + [T.StructField("extra", T.LongType(), True)]
)


@st.composite
def evolution_scenario(draw):
    """A log whose batches carry DIFFERENT payload schemas: some batches have
    an added ``extra`` column, some don't (partial-payload changelog)."""
    base_keys = draw(st.lists(st.integers(0, N_KEYS - 1), unique=True, max_size=N_KEYS))
    base = [(k, draw(st.integers(-5, 5))) for k in sorted(base_keys)]
    n_events = draw(st.integers(1, 12))
    lsns = draw(st.lists(st.integers(0, 100), unique=True,
                         min_size=n_events, max_size=n_events))
    n_batches = draw(st.integers(1, 3))
    wide = [draw(st.booleans()) for _ in range(n_batches)]  # batch carries `extra`?
    events = []
    assignment = []
    for lsn in lsns:
        b = draw(st.integers(0, n_batches - 1))
        assignment.append(b)
        events.append((
            lsn,
            draw(st.sampled_from(OPS)),
            draw(st.integers(0, N_KEYS - 1)),
            draw(st.one_of(st.none(), st.integers(-5, 5))),
            draw(st.integers(0, 9)) if wide[b] else None,
        ))
    order = draw(st.permutations(range(n_batches)))
    modes = [draw(st.sampled_from(("cow", "mor"))) for _ in range(n_batches)]
    return base, events, assignment, wide, order, modes


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(evolution_scenario())
def test_schema_evolution_any_order_reaches_oracle(spark, sc):
    """ALTER-before-MERGE under arbitrary batch schemas: batches that add a
    column evolve the table; batches that lack it (missing='null' policy)
    pad NULL — and the final state still equals the oracle where each
    event's `extra` is its value if its batch carried the column, else NULL,
    regardless of the order batches arrive in."""
    base, events, assignment, wide, order, modes = sc
    base_pdf = pd.DataFrame(base, columns=["doc_id", "val"])
    log_pdf = pd.DataFrame(events, columns=["lsn", "op", "doc_id", "val", "extra"])

    workdir = tempfile.mkdtemp(prefix="prop_evo_")
    try:
        tbl = LakeTable.create(
            spark, workdir + "/t", schema=PAYLOAD_SCHEMA, key_col="doc_id",
            num_buckets=4, overwrite=True,
        )
        if len(base_pdf):
            tbl.overwrite_full(spark.createDataFrame(base_pdf, PAYLOAD_SCHEMA))
        for b in order:
            rows = [e for e, a in zip(events, assignment) if a == b]
            if wide[b]:
                batch = spark.createDataFrame(
                    pd.DataFrame(rows, columns=["lsn", "op", "doc_id", "val", "extra"]),
                    WIDE_LOG_SCHEMA,
                )
            else:
                batch = spark.createDataFrame(
                    pd.DataFrame(
                        [r[:4] for r in rows], columns=["lsn", "op", "doc_id", "val"]
                    ),
                    LOG_SCHEMA,
                )
            merge_into(tbl, batch, epoch=f"p{b}", mode=modes[b], missing="null")
        got = canonicalize(tbl.read().toPandas())
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    exp_pdf = expected_final_state(base_pdf, log_pdf)
    if "extra" not in got.columns:
        # no wide batch ever applied (or none had events): table never evolved
        exp_pdf = exp_pdf.drop(columns=["extra"])
    exp = canonicalize(exp_pdf)
    assert got.equals(exp), f"\ngot:\n{got}\nexpected:\n{exp}"


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(scenario(), st.data())
def test_reapply_any_prefix_is_noop(spark, sc, data):
    """Exactly-once: re-applying any already-stamped epoch (same epoch id,
    any mode) after the full scenario changes neither the version nor the
    state."""
    base, events, assignment, order, modes = sc
    base_pdf = pd.DataFrame(base, columns=["doc_id", "val"])

    workdir = tempfile.mkdtemp(prefix="prop_idem_")
    try:
        tbl = LakeTable.create(
            spark, workdir + "/t", schema=PAYLOAD_SCHEMA, key_col="doc_id",
            num_buckets=4, overwrite=True,
        )
        if len(base_pdf):
            tbl.overwrite_full(spark.createDataFrame(base_pdf, PAYLOAD_SCHEMA))
        batches = {}
        for b in order:
            rows = [e for e, a in zip(events, assignment) if a == b]
            batches[b] = spark.createDataFrame(
                pd.DataFrame(rows, columns=["lsn", "op", "doc_id", "val"]),
                LOG_SCHEMA,
            )
            merge_into(tbl, batches[b], epoch=f"p{b}", mode=modes[b])
        v = tbl.current_version()
        before = canonicalize(tbl.read().toPandas())
        # replay a random epoch with a random (possibly different) mode
        b = data.draw(st.sampled_from(list(order)))
        remode = data.draw(st.sampled_from(("cow", "mor", "auto")))
        res = merge_into(tbl, batches[b], epoch=f"p{b}", mode=remode)
        assert res.skipped
        assert tbl.current_version() == v
        assert canonicalize(tbl.read().toPandas()).equals(before)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


SPARSE_PAYLOAD_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("v1", T.LongType(), True),
    T.StructField("v2", T.LongType(), True),
])
SPARSE_LOG_SCHEMA = T.StructType([
    T.StructField("lsn", T.LongType(), False),
    T.StructField("op", T.StringType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("v1", T.LongType(), True),
    T.StructField("v2", T.LongType(), True),
])


def _sparse_fold_oracle(base, events):
    """Pure-python per-column fold (update None = unchanged; insert/upsert
    full images; updates on absent/deleted keys are no-ops)."""
    state = {k: {"v1": v1, "v2": v2} for k, v1, v2 in base}
    for lsn, op, k, v1, v2 in sorted(events):
        if op == "delete":
            state.pop(k, None)
        elif op in ("insert", "upsert"):
            state[k] = {"v1": v1, "v2": v2}
        elif op == "update" and k in state:
            if v1 is not None:
                state[k]["v1"] = v1
            if v2 is not None:
                state[k]["v2"] = v2
    return canonicalize(pd.DataFrame(
        [(k, v["v1"], v["v2"]) for k, v in state.items()],
        columns=["doc_id", "v1", "v2"],
    ))


@st.composite
def sparse_scenario(draw):
    """Base table + sparse log + a partition into CONTIGUOUS ascending
    epochs (the sparse contract: resident fill reads lease-time state, so
    epochs must ascend — arbitrary epoch order is out of the mode's spec)."""
    base_keys = draw(st.lists(st.integers(0, N_KEYS - 1), unique=True, max_size=N_KEYS))
    base = [(k, draw(st.integers(-5, 5)), draw(st.integers(-5, 5)))
            for k in sorted(base_keys)]
    n_events = draw(st.integers(1, 14))
    lsns = sorted(draw(st.lists(st.integers(0, 200), unique=True,
                                min_size=n_events, max_size=n_events)))
    events = []
    for lsn in lsns:
        op = draw(st.sampled_from(OPS))
        if op == "delete":
            v1 = v2 = None
        elif op == "update":  # sparse: None = unchanged, per column
            v1 = draw(st.one_of(st.none(), st.integers(-5, 5)))
            v2 = draw(st.one_of(st.none(), st.integers(-5, 5)))
        else:  # full image; None here is a GENUINE null
            v1 = draw(st.one_of(st.none(), st.integers(-5, 5)))
            v2 = draw(st.one_of(st.none(), st.integers(-5, 5)))
        events.append((lsn, op, draw(st.integers(0, N_KEYS - 1)), v1, v2))
    n_epochs = draw(st.integers(1, 4))
    cuts = sorted(draw(st.lists(st.integers(0, n_events), min_size=n_epochs - 1,
                                max_size=n_epochs - 1)))
    bounds = list(zip([0] + cuts, cuts + [n_events]))
    modes = [draw(st.sampled_from(("cow", "mor", "auto"))) for _ in bounds]
    return base, events, bounds, modes


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(sparse_scenario())
# pinned regression: a sparse update to an absent key on an EMPTY table —
# both sides fold to zero rows (exposed a dtype-only mismatch between the
# empty engine frame and the empty oracle frame in canonicalize)
@example(sc=([], [(0, "update", 0, None, None)], [(0, 1)], ["cow"]))
def test_sparse_fold_reaches_oracle(spark, sc):
    """Sparse (partial-column) updates: any contiguous ascending epoching
    with any per-epoch mode folds to the pure-python per-column oracle —
    including empty epochs, genuine-null images vs unchanged-null updates,
    and cross-epoch resident fill."""
    base, events, bounds, modes = sc
    base_pdf = pd.DataFrame(base, columns=["doc_id", "v1", "v2"])
    workdir = tempfile.mkdtemp(prefix="prop_sparse_")
    try:
        tbl = LakeTable.create(
            spark, workdir + "/t", schema=SPARSE_PAYLOAD_SCHEMA, key_col="doc_id",
            num_buckets=4, overwrite=True,
        )
        if len(base_pdf):
            tbl.overwrite_full(spark.createDataFrame(base_pdf, SPARSE_PAYLOAD_SCHEMA))
        for i, ((lo, hi), mode) in enumerate(zip(bounds, modes)):
            rows = events[lo:hi]
            batch = spark.createDataFrame(
                pd.DataFrame(rows, columns=["lsn", "op", "doc_id", "v1", "v2"]),
                SPARSE_LOG_SCHEMA,
            )
            merge_into(tbl, batch, epoch=f"sp{i}", mode=mode, sparse_updates=True,
                       batch_rows_bound=max(hi - lo, 1))
        got = canonicalize(tbl.read().toPandas())
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    exp = _sparse_fold_oracle(base, events)
    assert got.equals(exp), f"\ngot:\n{got}\nexpected:\n{exp}"
