"""Training-shard packing over pre-tokenized sequences.

The table this engine ingests (doc_id, tokens array<int>, n_tok, source) exists
to FEED a trainer, and the step between "upserted lake table" and "training
batches" is packing: turning variable-length token sequences into fixed-size
examples with minimal padding. The reference has no analogue (its unit of work
is a clinical row, `combine_subtables.py:61-124`); these are the operators the
north-star pipeline needs downstream of the MERGE.

Three operators, three cost/fidelity points:

* ``chunk_pack`` — the pretraining-canonical concat-and-chunk: concatenate all
  sequences in a shard in a deterministic order and cut every ``capacity``
  tokens, docs straddling a boundary are SPLIT. Zero padding by construction.
  Everything is closed-form from one per-shard prefix sum: a doc whose shard
  starts at cumulative offset ``c0`` with length ``L`` covers packs
  ``floor(c0/cap) .. floor((c0+L-1)/cap)``, and each covered pack's segment is
  an interval intersection — so the whole operator is ONE window cumsum (one
  hash exchange on ``shard``) plus a stateless ``sequence()`` explode. No
  Python, no iteration, and the same arithmetic runs as a DuckDB oracle.
* ``balanced_shards`` — serpentine (boustrophedon) token balancing: rank docs
  by length, snake rank → shard so every shard gets one doc from each length
  band. One global sort exchange; max/min shard token mass converges to 1 as
  docs/shard grows. Use it to pick ``shard_col`` when hash sharding's token
  variance matters.
* ``ffd_pack`` — first-fit-decreasing bin packing for the no-split regime
  (e.g. contrastive / instruction tuning where a doc must stay whole). Greedy
  FFD is inherently sequential per bin set, so it runs per-shard in one
  Arrow ``applyInPandas`` group (no per-row Python): shards bound the state,
  the classic 11/9·OPT+6/9 FFD guarantee holds within each shard, and
  cross-shard parallelism is the scale axis. Oversized docs (``n_tok >
  capacity``) come back with ``pack_id = -1`` rather than silently vanishing —
  the caller decides whether to split or drop (the no-silent-caps rule).

Determinism (reference O2): every ordering ties on ``doc_id``; repartitioning
the input does not change any assignment (asserted in tests/test_packing.py).

Scale: the only exchanges are one hash partition on ``shard`` (chunk/ffd) or
one global sort (balanced_shards). Per-shard state is O(docs/shard); pick
``num_shards`` so a shard's doc metadata fits an executor — at 10^10 tokens
and 64k shards that is ~150k tokens of METADATA per shard, trivially small,
while each shard still packs millions of tokens.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T


def _shard(doc_col: str, num_shards: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(doc_col)), F.lit(num_shards)).cast("int")


def chunk_pack(
    df: DataFrame,
    capacity: int,
    num_shards: int = 64,
    doc_col: str = "doc_id",
    len_col: str = "n_tok",
    shard_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: within each shard, docs are laid end-to-end
    in ``doc_col`` order and cut into packs of exactly ``capacity`` tokens
    (the final partial pack of a shard is shorter). Returns one row per
    (doc, pack) SEGMENT:

      shard, pack_id, doc_id, seg_start (token offset within the doc),
      seg_len, pack_pos (offset of the segment within the pack).

    A doc longer than ``capacity`` simply spans several packs — no special
    case. Pass ``shard_col`` to reuse an existing assignment (e.g. from
    ``balanced_shards``); default is hash sharding on ``doc_col``.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    cap = F.lit(int(capacity)).cast("long")
    shard = F.col(shard_col) if shard_col else _shard(doc_col, num_shards)
    base = df.select(
        shard.alias("shard"),
        F.col(doc_col).alias("doc_id"),
        F.col(len_col).cast("long").alias("_len"),
    ).filter(F.col("_len") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c0 = F.coalesce(F.sum("_len").over(w), F.lit(0)).cast("long")
    with_off = base.select("shard", "doc_id", "_len", c0.alias("_c0"))
    k = F.col("_k")
    lo = F.greatest(F.col("_c0"), k * cap)          # global start of segment
    hi = F.least(F.col("_c0") + F.col("_len"), (k + 1) * cap)
    return (
        with_off.withColumn(
            "_k",
            # `div` is exact long division; double `/` + cast is exact only
            # while quotients stay far below 2^53 / cap — true at any sane
            # scale, but the integer form costs nothing and has no seam
            F.explode(
                F.sequence(
                    F.expr(f"_c0 div {int(capacity)}"),
                    F.expr(f"(_c0 + _len - 1) div {int(capacity)}"),
                )
            ),
        )
        .select(
            "shard",
            k.cast("long").alias("pack_id"),
            "doc_id",
            (lo - F.col("_c0")).cast("long").alias("seg_start"),
            (hi - lo).cast("long").alias("seg_len"),
            (lo - k * cap).cast("long").alias("pack_pos"),
        )
    )


def balanced_shards(
    df: DataFrame,
    num_shards: int,
    doc_col: str = "doc_id",
    len_col: str = "n_tok",
    out_col: str = "shard",
) -> DataFrame:
    """Assign every doc a shard in ``[0, num_shards)`` balancing total tokens:
    docs are ranked by ``(len desc, doc_id)`` and the rank snakes across
    shards (0,1,..,S-1,S-1,..,1,0,0,1,..), so each shard receives one doc per
    length band and band-internal variance cancels. Adds ``out_col`` to the
    input columns.

    The global rank is computed DISTRIBUTED — a naked
    ``Window.orderBy(...)`` would collapse every row into one partition (the
    single-reducer trap). Instead: one order-preserving
    ``repartitionByRange`` on the rank ordering, a per-partition local
    ``row_number`` (same partitioning — no extra row exchange), plus an
    O(partitions)-row cumulative-count frame broadcast back as rank offsets
    (its SinglePartition window is over partition counts, not rows). Exact
    total order, no serial stage over data. Both branches re-evaluate the
    same range repartition, so the input must be deterministic under
    recompute — true of any stable scan, and the standard Spark recompute
    contract.
    """
    if num_shards <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")
    order = [F.col(len_col).desc(), F.col(doc_col).asc()]
    parts = df.repartitionByRange(*order).withColumn(
        "_pid", F.spark_partition_id()
    )
    # rank offset per range-partition: an O(partitions)-row frame (its own
    # single-partition window is over partition COUNTS, not rows), broadcast
    # back; the range exchange is shared between both branches
    sizes = parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.select(
        "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    local = (
        F.row_number().over(Window.partitionBy("_pid").orderBy(*order)) - 1
    ).cast("long")
    s = F.lit(int(num_shards)).cast("long")
    r = local + F.col("_off")
    fwd = r % (2 * s)
    snake = F.when(fwd < s, fwd).otherwise(2 * s - 1 - fwd)
    return (
        parts.join(F.broadcast(offs), "_pid")
        .withColumn(out_col, snake.cast("int"))
        .drop("_pid", "_off")
    )


_FFD_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("pack_id", T.LongType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_tok", T.LongType()),
        T.StructField("pack_pos", T.LongType()),
    ]
)


def _ffd_one_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    """First-fit-decreasing within one shard. Only doc METADATA enters pandas
    (doc_id + length — never the token arrays), so shard state is a few bytes
    per doc."""
    cap = int(pdf["_cap"].iloc[0])
    shard = int(pdf["shard"].iloc[0])
    pdf = pdf.sort_values(
        ["n_tok", "doc_id"], ascending=[False, True], kind="mergesort"
    )
    free: list[int] = []  # free[i] = remaining capacity of pack i
    out_pack: list[int] = []
    out_pos: list[int] = []
    for n in pdf["n_tok"].to_numpy():
        n = int(n)
        if n > cap:
            out_pack.append(-1)
            out_pos.append(0)
            continue
        for i, f in enumerate(free):
            if f >= n:
                out_pos.append(cap - f)
                free[i] = f - n
                out_pack.append(i)
                break
        else:
            out_pos.append(0)
            free.append(cap - n)
            out_pack.append(len(free) - 1)
    return pd.DataFrame(
        {
            "shard": shard,
            "pack_id": pd.Series(out_pack, dtype="int64"),
            "doc_id": pdf["doc_id"].to_numpy(),
            "n_tok": pdf["n_tok"].to_numpy(),
            "pack_pos": pd.Series(out_pos, dtype="int64"),
        }
    )


def ffd_pack(
    df: DataFrame,
    capacity: int,
    num_shards: int = 64,
    doc_col: str = "doc_id",
    len_col: str = "n_tok",
    shard_col: str | None = None,
) -> DataFrame:
    """First-fit-decreasing packing WITHOUT splitting docs: each doc lands
    whole in exactly one pack of ``capacity`` tokens; ``pack_pos`` is its
    offset inside the pack. Docs with ``n_tok > capacity`` return
    ``pack_id = -1`` (unpackable — caller's decision). Pack ids are dense
    per shard; ``(shard, pack_id)`` is the pack identity.

    The greedy scan is per-shard inside one Arrow ``applyInPandas`` group —
    the documented exception shape (genuinely sequential semantics) — over
    metadata columns only; the O(P) first-fit probe per doc is fine at the
    intended docs/shard (≤ a few hundred thousand).
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    shard = F.col(shard_col) if shard_col else _shard(doc_col, num_shards)
    meta = df.select(
        shard.alias("shard"),
        F.col(doc_col).cast("string").alias("doc_id"),
        F.col(len_col).cast("long").alias("n_tok"),
        F.lit(int(capacity)).alias("_cap"),
    ).filter(F.col("n_tok") > 0)
    return meta.groupBy("shard").applyInPandas(_ffd_one_shard, _FFD_SCHEMA)


def pack_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-shard packing efficiency report for either packer's output:
    packs, docs (or segments), tokens, fill ratio, and unpackable docs.
    O(shards) output — safe to collect."""
    seg_len = "seg_len" if "seg_len" in packed.columns else "n_tok"
    ok = packed.filter(F.col("pack_id") >= 0)
    return (
        ok.groupBy("shard")
        .agg(
            F.countDistinct("pack_id").alias("packs"),
            F.count(F.lit(1)).alias("rows"),
            F.sum(seg_len).alias("tokens"),
        )
        .join(
            packed.filter(F.col("pack_id") < 0)
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("unpackable")),
            "shard",
            "left",
        )
        .select(
            "shard",
            "packs",
            "rows",
            "tokens",
            F.round(
                F.col("tokens") / (F.col("packs") * F.lit(float(capacity))), 4
            ).alias("fill_ratio"),
            F.coalesce("unpackable", F.lit(0)).alias("unpackable"),
        )
    )
