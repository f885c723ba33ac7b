"""Packing operators: invariants, oracles-by-construction, determinism, plans.

chunk_pack's correctness statement: per shard, the segments laid out by
(pack_id, pack_pos) reconstruct the exact concatenation of docs in doc_id
order, every non-final pack holds exactly `capacity` tokens, and each doc's
segments partition [0, n_tok). ffd_pack's: every packable doc lands whole in
exactly one pack, no pack exceeds capacity, FFD never uses more packs than
next-fit, and assignments ignore input partitioning.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from standardized_omop_data_etl_spark.operators.packing import (
    balanced_shards,
    chunk_pack,
    ffd_pack,
    pack_stats,
)

CAP = 64


@pytest.fixture(scope="module")
def docs(spark):
    # zipf-ish lengths incl. > CAP docs and exactly-CAP docs
    rows = []
    for i in range(500):
        n = [3, 7, 15, 30, 64, 90, 200][i % 7] + (i % 11)
        rows.append((f"d{i:04d}", n))
    rows.append(("d9998", CAP))  # exact fit
    rows.append(("d9999", 1))
    return spark.createDataFrame(rows, "doc_id string, n_tok int")


def test_chunk_pack_reconstructs_concatenation(spark, docs):
    out = chunk_pack(docs, CAP, num_shards=8).toPandas()
    src = docs.toPandas().set_index("doc_id")["n_tok"].to_dict()

    # each doc's segments partition [0, n_tok)
    for doc_id, g in out.groupby("doc_id"):
        g = g.sort_values("seg_start")
        assert g["seg_start"].iloc[0] == 0
        assert (g["seg_start"] + g["seg_len"]).iloc[-1] == src[doc_id]
        assert (
            (g["seg_start"] + g["seg_len"]).iloc[:-1].to_numpy()
            == g["seg_start"].iloc[1:].to_numpy()
        ).all()

    for shard, g in out.groupby("shard"):
        # every pack except the shard's last is exactly full, none overflows
        fill = g.groupby("pack_id")["seg_len"].sum().sort_index()
        assert (fill.iloc[:-1] == CAP).all()
        assert fill.iloc[-1] <= CAP
        # within a pack, segments tile [0, fill) by pack_pos
        for pack_id, p in g.groupby("pack_id"):
            p = p.sort_values("pack_pos")
            assert p["pack_pos"].iloc[0] == 0
            assert (
                (p["pack_pos"] + p["seg_len"]).iloc[:-1].to_numpy()
                == p["pack_pos"].iloc[1:].to_numpy()
            ).all()
        # concat order inside the shard == doc_id order
        order = g.sort_values(["pack_id", "pack_pos"])["doc_id"].drop_duplicates()
        assert list(order) == sorted(order)

    assert out["seg_len"].sum() == sum(src.values())


def test_chunk_pack_single_exchange(spark, docs):
    plan = chunk_pack(docs, CAP, num_shards=8)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_ffd_invariants(spark, docs):
    out = ffd_pack(docs, CAP, num_shards=8).toPandas()
    src = docs.toPandas()
    assert len(out) == len(src)  # every doc assigned exactly once
    assert set(out["doc_id"]) == set(src["doc_id"])

    over = out[out["pack_id"] < 0]
    assert set(over["doc_id"]) == set(src[src["n_tok"] > CAP]["doc_id"])

    ok = out[out["pack_id"] >= 0]
    fill = ok.groupby(["shard", "pack_id"])["n_tok"].sum()
    assert (fill <= CAP).all()
    # pack ids dense per shard
    for shard, g in ok.groupby("shard"):
        ids = sorted(g["pack_id"].unique())
        assert ids == list(range(len(ids)))
        # FFD <= next-fit pack count (next-fit in the same decreasing order)
        nf, free = 0, 0
        for n in g.sort_values(["n_tok", "doc_id"], ascending=[False, True])[
            "n_tok"
        ]:
            if n > free:
                nf, free = nf + 1, CAP
            free -= n
        assert len(ids) <= nf


def test_ffd_deterministic_under_repartition(spark, docs):
    a = ffd_pack(docs, CAP, num_shards=8).toPandas()
    b = ffd_pack(docs.repartition(7), CAP, num_shards=8).toPandas()
    key = ["shard", "pack_id", "doc_id", "n_tok", "pack_pos"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_balanced_shards_balances_tokens(spark, docs):
    out = balanced_shards(docs, 8)
    sums = (
        out.groupBy("shard").agg(F.sum("n_tok").alias("t")).toPandas()["t"]
    )
    assert len(sums) == 8
    assert sums.max() / sums.min() < 1.05  # serpentine bands cancel variance
    # and chunk_pack composes with it via shard_col
    packed = chunk_pack(out, CAP, shard_col="shard")
    assert packed.filter(F.col("shard") >= 8).count() == 0
    total = packed.agg(F.sum("seg_len")).collect()[0][0]
    assert total == docs.agg(F.sum("n_tok")).collect()[0][0]


def test_pack_stats_both_shapes(spark, docs):
    c = pack_stats(chunk_pack(docs, CAP, num_shards=4), CAP).toPandas()
    f = pack_stats(ffd_pack(docs, CAP, num_shards=4), CAP).toPandas()
    assert (c["fill_ratio"] > 0.9).all()  # concat-and-chunk: only final pack slack
    assert (c["unpackable"] == 0).all()
    assert (f["unpackable"] > 0).any()  # the >CAP docs are visible, not dropped
    assert (f["fill_ratio"] <= 1.0).all()
    # chunk packs strictly fewer-or-equal packs than no-split FFD on same data
    assert c["packs"].sum() <= f["packs"].sum() + f["unpackable"].sum() * 4


def test_balanced_shards_no_row_level_single_partition(spark, docs):
    """The global rank must be distributed: the only SinglePartition
    exchange allowed is over the O(partitions)-row counts frame, never the
    row stream (regression guard for the naked-Window.orderBy trap)."""
    plan = (
        balanced_shards(docs, 8)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert "rangepartitioning" in plan, plan
