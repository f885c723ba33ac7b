"""Temporal operators: as-of join + sessionization — brute-force oracles and
plan-shape assertions (one exchange each; never a range join)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from standardized_omop_data_etl_spark.operators.temporal import asof_join, sessionize

T0 = datetime(2024, 1, 1)


def ts(minutes):
    return T0 + timedelta(minutes=minutes)


@pytest.fixture()
def clicks(spark):
    # (user, ts, click_id, v) — includes equal-timestamp rows for user 1
    return spark.createDataFrame(
        [
            (1, ts(0), 100, "a"),
            (1, ts(10), 101, "b"),
            (1, ts(10), 102, "b2"),  # same ts as 101: tie_col must pick 102
            (1, ts(40), 103, "c"),
            (2, ts(5), 200, "x"),
        ],
        "user int, ts timestamp, click_id long, v string",
    )


@pytest.fixture()
def buys(spark):
    return spark.createDataFrame(
        [
            (1, ts(10), 9000),  # equal ts: must match (<=), winner click 102
            (1, ts(39), 9001),  # most recent is the ts(10) pair -> 102
            (1, ts(41), 9002),  # -> 103
            (2, ts(1), 9003),   # before any click -> null
            (3, ts(50), 9004),  # user with no clicks at all -> null
        ],
        "user int, ts timestamp, buy_id long",
    )


def brute_asof(buys_rows, clicks_rows):
    out = {}
    for u, bts, bid in buys_rows:
        cands = [c for c in clicks_rows if c[0] == u and c[1] <= bts]
        best = max(cands, key=lambda c: (c[1], c[2]), default=None)
        out[bid] = best[2] if best else None
    return out


def test_asof_matches_bruteforce(spark, clicks, buys):
    got = {
        r["buy_id"]: r["asof_click_id"]
        for r in asof_join(buys, clicks, by=["user"], tie_col="click_id").collect()
    }
    assert got == brute_asof(
        [tuple(r) for r in buys.collect()], [tuple(r) for r in clicks.collect()]
    )
    assert got == {9000: 102, 9001: 102, 9002: 103, 9003: None, 9004: None}


def test_asof_payload_and_matched_ts(spark, clicks, buys):
    r = {
        x["buy_id"]: (x["asof_v"], x["asof_ts"])
        for x in asof_join(buys, clicks, by=["user"], tie_col="click_id").collect()
    }
    assert r[9002] == ("c", ts(40))
    assert r[9003] == (None, None)


def test_asof_inner_drops_unmatched(spark, clicks, buys):
    out = asof_join(buys, clicks, by=["user"], tie_col="click_id", how="inner")
    assert sorted(r["buy_id"] for r in out.collect()) == [9000, 9001, 9002]


def test_asof_tolerance(spark, clicks, buys):
    # 5-minute window: only buys within 5 min of their click keep the match
    out = asof_join(
        buys, clicks, by=["user"], tie_col="click_id", tolerance_seconds=300.0
    )
    got = {r["buy_id"]: r["asof_click_id"] for r in out.collect()}
    assert got == {9000: 102, 9001: None, 9002: 103, 9003: None, 9004: None}


def test_asof_prefix_collision_raises(spark, clicks, buys):
    bad = buys.withColumn("asof_v", F.lit(1))
    with pytest.raises(ValueError, match="collide"):
        asof_join(bad, clicks, by=["user"])


def test_asof_single_exchange(spark, clicks, buys):
    plan = (
        asof_join(buys, clicks, by=["user"], tie_col="click_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one hash exchange on the by-key; no broadcast-nested-loop / cartesian
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_sessionize_gaps(spark):
    df = spark.createDataFrame(
        [
            (1, ts(0), 1),
            (1, ts(20), 2),   # 20 min gap, same session
            (1, ts(60), 3),   # 40 min gap -> new session
            (1, ts(61), 4),
            (2, ts(0), 5),    # other key: own numbering
        ],
        "user int, ts timestamp, event_id long",
    )
    out = sessionize(df, by=["user"], gap_seconds=1800.0, tie_col="event_id")
    got = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}
    # exact-boundary gap (== gap_seconds) does NOT split
    df2 = spark.createDataFrame(
        [(1, ts(0), 1), (1, ts(30), 2)], "user int, ts timestamp, event_id long"
    )
    got2 = {r["event_id"]: r["session_seq"] for r in
            sessionize(df2, by=["user"], gap_seconds=1800.0, tie_col="event_id").collect()}
    assert got2 == {1: 1, 2: 1}


def test_sessionize_single_exchange(spark):
    df = spark.createDataFrame(
        [(1, ts(0), 1), (1, ts(60), 2)], "user int, ts timestamp, event_id long"
    )
    plan = (
        sessionize(df, by=["user"], tie_col="event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # lag + running sum share one partitioning: exactly one exchange, one sort
    assert plan.count("Exchange hashpartitioning") == 1
