"""Keyed conflict-resolution kernels: last-writer-wins and priority dedup.

This is the engine's MERGE heart. The reference implements the same semantic
procedurally: sources are processed in a fixed priority order and a later
source's row is dropped when its ``(person_id, concept_id)`` key was already
seen (reference ``combine_subtables.py:61-124``, operator A4 in SURVEY.md §2).
Here it is a single shuffle-parallel aggregation; the CDC engine flips the
sort direction (priority-index asc → lsn desc) to get last-writer-wins.

Scale notes
-----------
* ``lww_latest`` is ``groupBy(key).agg(max_by(struct(payload), order))`` — one
  shuffle with map-side partial aggregation (Spark plans partial_max_by before
  the exchange), so a hot key's events are pre-reduced per input partition
  before they ever cross the wire. That map-side combine is already the main
  skew defense.
* For adversarial skew (one doc_id = whole batch), ``salt_partitions`` forces
  an *explicit* two-phase reduction: phase 1 reduces per (key, salt) after a
  ``repartition(key, salt)``, phase 2 reduces the ≤S survivors per key. Salt
  is derived from the order column (deterministic, replay-stable) — never
  from ``rand()``.
* Determinism under duplicate order values: the ordering struct appends
  ``xxhash64(payload)`` as a tie-break, so replays and resplits of the log
  produce bit-identical winners even if two different payloads carry the same
  LSN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _order_struct(df: DataFrame, order_col: str, payload_cols: list[str]) -> Column:
    return F.struct(
        F.col(order_col).alias("o"),
        F.xxhash64(*[F.col(c) for c in payload_cols]).alias("tie"),
    )


def lww_latest(
    df: DataFrame,
    key_cols: list[str] | str,
    order_col: str,
    descending: bool = True,
    salt_partitions: int | None = None,
    count_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """One row per key: the payload with the max (or min) ``order_col``.

    ``count_col`` (optional) adds a column with the number of input rows the
    key had — the "conflicts resolved" metric is ``sum(count - 1)``.

    Default path is ``row_number() OVER (PARTITION BY key ORDER BY ord)``:
    one shuffle + one in-partition sort, all inside codegen-friendly
    operators. This measurably beats ``max_by(struct(payload), ord)`` —
    Spark's ObjectHashAggregate falls back to sort-based aggregation past 128
    groups per partition and then evaluates the struct comparisons
    interpreted, ~10× the CPU on array-bearing payloads.

    ``num_partitions`` pins the shuffle width; pass the target table's
    ``num_buckets`` so the window exchange is bucket-aligned (see
    ``lake.bucket_expr``) and downstream bucket-clustered writes need no
    further wide shuffle.

    ``salt_partitions`` switches to the explicit two-phase salted reduction
    for adversarial hot-key skew (one key ~ whole batch).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    payload_cols = [c for c in df.columns]
    ordering = _order_struct(df, order_col, payload_cols)
    if salt_partitions and salt_partitions > 1:
        if not descending:
            ordering = F.struct(
                (-F.col(order_col)).alias("o"), ordering["tie"].alias("tie")
            )
        return _lww(df, keys, ordering, payload_cols, salt_partitions, count_col)

    order_key = F.col(order_col).desc() if descending else F.col(order_col).asc()
    tie = F.xxhash64(*[F.col(c) for c in payload_cols])
    src = (
        df.repartition(num_partitions, *[F.col(k) for k in keys])
        if num_partitions
        else df
    )
    w = Window.partitionBy(*keys).orderBy(order_key, tie.desc())
    out = src.withColumn("_rn", F.row_number().over(w))
    if count_col:
        # same partition+order spec as the row_number → shares one sort and
        # one WindowExec pass; the unbounded frame just changes the frame.
        out = out.withColumn(
            count_col,
            F.count(F.lit(1)).over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ),
        )
    return out.filter(F.col("_rn") == 1).drop("_rn")


def _lww(
    df: DataFrame,
    keys: list[str],
    ordering: Column,
    payload_cols: list[str],
    salt_partitions: int | None,
    count_col: str | None,
) -> DataFrame:
    payload = F.struct(*[F.col(c) for c in payload_cols])
    if salt_partitions and salt_partitions > 1:
        # Two-phase salted reduce: spread each hot key over `salt_partitions`
        # sub-aggregations keyed by a deterministic salt of the order struct.
        salt = F.pmod(F.xxhash64(ordering), F.lit(salt_partitions)).alias("_salt")
        phase1 = (
            df.select(*payload_cols, salt, ordering.alias("_ord"), payload.alias("_payload"))
            .repartition(*[F.col(k) for k in keys], F.col("_salt"))
            .groupBy(*keys, "_salt")
            .agg(
                F.max_by("_payload", "_ord").alias("_payload"),
                F.max("_ord").alias("_ord"),
                F.count(F.lit(1)).alias("_n"),
            )
        )
        agg = phase1.groupBy(*keys).agg(
            F.max_by("_payload", "_ord").alias("_payload"),
            F.sum("_n").alias("_n"),
        )
    else:
        agg = (
            df.select(*payload_cols, ordering.alias("_ord"), payload.alias("_payload"))
            .groupBy(*keys)
            .agg(
                F.max_by("_payload", "_ord").alias("_payload"),
                F.count(F.lit(1)).alias("_n"),
            )
        )
    out_cols = [F.col(f"_payload.{c}").alias(c) for c in payload_cols]
    if count_col:
        out_cols.append(F.col("_n").alias(count_col))
    return agg.select(*out_cols)


def priority_dedup(
    df: DataFrame,
    key_cols: list[str] | str,
    priority_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """First-priority-wins per key (lowest priority value kept) — the exact
    semantic of the reference's source-priority merge
    (``combine_subtables.py:7-18,95-124``): A4 in SURVEY.md §2.

    Implemented as ``row_number() OVER (PARTITION BY key ORDER BY priority)``.
    Ties within a priority break on ``tiebreak_cols`` if given (SQL-portable),
    else on a full-payload hash (deterministic either way).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    payload_cols = df.columns
    ties = (
        [F.col(c).asc() for c in tiebreak_cols]
        if tiebreak_cols
        else [F.xxhash64(*[F.col(c) for c in payload_cols]).asc()]
    )
    w = Window.partitionBy(*keys).orderBy(F.col(priority_col).asc(), *ties)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
