"""Keyed conflict-resolution kernels: last-writer-wins and priority dedup.

This is the engine's MERGE heart. The reference implements the same semantic
procedurally: sources are processed in a fixed priority order and a later
source's row is dropped when its ``(person_id, concept_id)`` key was already
seen (reference ``combine_subtables.py:61-124``, operator A4 in SURVEY.md §2).
Here it is a single shuffle-parallel aggregation; the CDC engine flips the
sort direction (priority-index asc → lsn desc) to get last-writer-wins.

Scale notes
-----------
* ``lww_latest`` is ``row_number() OVER (PARTITION BY key ORDER BY ord DESC)``
  — one shuffle + one in-partition sort, fully codegen-friendly. (The
  max_by(struct(payload)) formulation measured ~10× the CPU: aggregating
  variable-length payload structs forces ObjectHashAggregate's interpreted
  sort-based fallback past 128 groups per partition.)
* For adversarial skew (one doc_id = whole batch), ``salt_partitions`` forces
  an explicit two-phase windowed pick: phase 1 picks per (key, salt) — the
  window's own exchange spreads a hot key over `salt_partitions` reducers —
  and phase 2 picks among the ≤S survivors per key. Salt is derived from the
  order column (deterministic, replay-stable) — never from ``rand()``.
* Determinism under duplicate order values: the ordering struct appends
  ``xxhash64(payload)`` as a tie-break, so replays and resplits of the log
  produce bit-identical winners even if two different payloads carry the same
  LSN.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel

# Winner sets at or below this many keys fit the narrow kernel's candidate
# prefilter (bloom bitmap ≤ ~8 MB); larger sets fall back to the window
# kernel (see lww_latest_narrow's broadcast_winners='auto'). Same contract
# (and default value) as plans.merge.BROADCAST_KEYS_MAX. Env-tunable for
# campaign A/Bs (SODES_BROADCAST_KEYS_MAX) — read at CALL time in
# lww_latest_narrow (same contract as every other SODES_* knob), so an
# export mid-session takes effect on the next call; this module constant
# is the no-env fallback.
BROADCAST_KEYS_MAX = int(os.environ.get("SODES_BROADCAST_KEYS_MAX", 4_000_000))



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
    tie = F.xxhash64(*[F.col(c) for c in payload_cols])

    def window_pick(
        src,
        part_cols: list[str],
        order_expr,
        tie_expr,
        cnt: str | None,
        weight_col: str | None = None,
    ):
        # ``weight_col`` is passed EXPLICITLY by the salted phase-2 call (each
        # phase-1 survivor carries its group's row count) — never inferred
        # from src.columns, so a payload that happens to contain a same-named
        # column can't corrupt the events_seen/conflicts metrics.
        w = Window.partitionBy(*part_cols).orderBy(order_expr, tie_expr)
        out = src.withColumn("_rn", F.row_number().over(w))
        if cnt:
            # same partition+order spec as the row_number → shares one sort
            # and one WindowExec pass; only the frame differs.
            weight = F.coalesce(F.col(weight_col), F.lit(1)) if weight_col else F.lit(1)
            out = out.withColumn(
                cnt,
                F.sum(weight).over(
                    w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
                ),
            )
        return out.filter(F.col("_rn") == 1).drop("_rn")

    # asc_nulls_last mirrors F.min's NULL handling (min ignores NULLs), so the
    # narrow kernel's eqNullSafe probe and this window pick the same winner
    # when ascending order values contain NULLs. Spark's desc() is already
    # NULLS LAST, matching F.max. A key whose order values are ALL NULL
    # degrades to the pure payload-hash tie-break on both paths.
    order_key = (
        F.col(order_col).desc() if descending else F.col(order_col).asc_nulls_last()
    )
    if salt_partitions and salt_partitions > 1:
        # Two-phase salted pick, both phases windowed (codegen sort +
        # row_number — never ObjectHashAggregate): phase 1 reduces per
        # (key, salt) so a hot key's rows spread over `salt_partitions`
        # reducers; phase 2 picks among the ≤S survivors per key.
        salt = F.pmod(F.xxhash64(F.col(order_col), tie), F.lit(salt_partitions))
        p1 = window_pick(
            df.withColumn("_salt", salt), keys + ["_salt"], order_key, tie.desc(), "__lww_w"
        )
        tie2 = F.xxhash64(*[F.col(c) for c in payload_cols])
        out = window_pick(p1, keys, order_key, tie2.desc(), count_col, weight_col="__lww_w")
        return out.drop("_salt", "__lww_w")

    src = (
        df.repartition(num_partitions, *[F.col(k) for k in keys])
        if num_partitions
        else df
    )
    return window_pick(src, keys, order_key, tie.desc(), count_col)


# Blocked bloom prefilter for the narrow kernel's candidate fetch (shared
# primitives in operators.bloom): one 64-bit block per (key, winning-order)
# pair, 4 bit positions inside it ≈ 0.1-0.5% false positives — FPs only add
# rows to the exact candidate join, never wrong winners.
from .bloom import bloom_frame, bloom_member, bloom_words

# keys_bound fast path: a HARD bound under this margin of the cap proves
# the broadcast safe with no sizing work at all. (r4 backed the margin with
# an HLL estimate for unbounded batches; r5 replaced that probe — a full
# extra batch scan, ~8.6 s of a 42 s 16M-event epoch at 4 cores — with an
# EXACT persist+count of the winner aggregate itself, which the broadcast
# build then reuses instead of recomputing. Exact count ⇒ no margin needed
# on that path; the margin only still guards the probe-free bound.)
AUTO_BROADCAST_MARGIN = 0.9


def lww_latest_narrow(
    df: DataFrame,
    key_cols: list[str] | str,
    order_col: str,
    descending: bool = True,
    count_col: str | None = None,
    num_partitions: int | None = None,
    broadcast_winners: bool | str = "auto",
    broadcast_keys_max: int | None = None,
    keys_bound: int | None = None,
) -> DataFrame:
    """Two-phase narrow-max LWW: bit-identical winners to ``lww_latest``,
    but the wide shuffle moves only the WINNERS' payloads, not every event.

    1. ``groupBy(key).agg(max(order), count)`` over the key/order columns
       only — map-side combinable, so a hot key collapses to one partial per
       input partition before anything moves (no salting needed).
    2. Fetch the winners' payload rows from the batch — WITHOUT moving the
       losers. ``broadcast_winners`` picks the fetch:

       * ``"auto"`` (default) — broadcast the (key, winning order, count)
         aggregate, size-guarded: a HARD ``keys_bound`` under the margin
         proves it safe with no probe job (distinct keys ≤ rows); an
         unbounded batch persists + exactly counts the aggregate
         (the count's scan+shuffle feeds the broadcast from cache); past
         ``broadcast_keys_max`` the whole narrow plan is abandoned for
         ``lww_latest`` (once the winner set can't be broadcast, a
         candidate join would shuffle every payload anyway). Measured on
         this box the relation build costs ~1.3 s serial at 1.6M keys —
         cheaper than the bloom fetch's parallel work below ~16 local
         cores.
       * ``"bloom"`` — cluster-scale fetch, no driver-built relation: the
         winner aggregate is persisted and counted (exact sizing, one
         batch scan), a blocked bloom over ``xxhash64(key, winning
         order)`` is built DISTRIBUTED (per-word ``bit_or``) and attached
         as a one-row broadcast; the ~one-per-key bloom-positive rows
         resolve EXACTLY via a shuffle-hash join co-partitioned at
         ``num_partitions``, which the tie-break window reuses. Driver
         work is O(bitmap) — the fetch scales with executors — and a bad
         size estimate can only raise the FP rate, never OOM. Costs
         ~0.35 µs/row of membership eval over the batch, so it pays off
         when (batch rows × 0.35 µs) / cores exceeds the ~1.3 s serial
         build: large clusters, or very large batches. Select per
         deployment via ``SODES_WINNER_FETCH=bloom``.
       * ``True`` / ``False`` — force the broadcast (no probe; caller
         guarantees a bounded key set) or the fully shuffled candidate
         join (A/B only; prefer ``lww_latest`` when key-heavy).
    3. The existing deterministic tie-break (xxhash64 over the full payload,
       identical column order to ``lww_latest``) picks one row per key among
       the few order-tied candidates; its window exchange doubles as the
       bucket alignment (``num_partitions = num_buckets``).

    Shuffle bytes: window path moves every event's payload once; this moves
    (a) two narrow columns' partial aggregates and (b) the candidates'
    payloads (≈ one row per key). At K events/key that is a ~K× reduction of
    the wide exchange — the difference between shuffling a 100 TB epoch and
    shuffling its ~1/K winner set on a real cluster. The price is a second
    scan of the batch (phases 1 and 2 each read it), which parquet/cache
    absorbs; prefer the window path when events/key ≈ 1 or the batch scan
    dominates.

    Pathological edge (documented, not handled): a hot key whose max order
    value itself is massively duplicated sends all its tied candidates to
    one phase-3 reducer. Replay LSNs are unique per key, so this arises only
    with degenerate order columns — use the salted window path there.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    payload_cols = list(df.columns)
    if broadcast_keys_max is None:  # call-time knob read; module attr fallback
        env = os.environ.get("SODES_BROADCAST_KEYS_MAX")
        broadcast_keys_max = int(env) if env is not None else BROADCAST_KEYS_MAX
    agg_ord = F.max(order_col) if descending else F.min(order_col)
    winners = df.groupBy(*[F.col(k) for k in keys]).agg(
        agg_ord.alias("_w_ord"), F.count(F.lit(1)).alias("_w_cnt")
    )
    pinned = None
    if broadcast_winners == "auto":
        # Default fetch is the broadcast: measured on this box the winner
        # relation build is ~1.3 s SERIAL at 1.6M keys, while the bloom
        # fetch's per-row membership eval over the whole batch is ~0.35
        # µs/row — ~5.6 s of PARALLEL work on a 16M-row batch at 4 cores.
        # The crossover favors the bloom only past ~16 local cores or on a
        # real multi-executor cluster (where the driver build is also a
        # 100-200 MB fanout hot spot) — deployments there opt in with
        # broadcast_winners="bloom" / SODES_WINNER_FETCH=bloom (plus the
        # plans.merge.resolve_winner_fetch auto-routing). Sizing: a HARD
        # keys_bound under the margin proves the broadcast safe with no
        # sizing work at all (distinct keys ≤ rows); otherwise the winner
        # aggregate itself is persisted and counted EXACTLY — one job whose
        # scan+shuffle the broadcast build then REUSES from cache, unlike
        # the r4 HLL probe, which paid a full extra batch scan and still
        # left the broadcast subtree recomputing the aggregate. Past the
        # cap the whole narrow plan is abandoned for the window kernel
        # (once the winner set can't be broadcast, a candidate join would
        # shuffle every payload anyway).
        if keys_bound is not None and keys_bound <= AUTO_BROADCAST_MARGIN * broadcast_keys_max:
            broadcast_winners = True
        else:
            winners = winners.persist(StorageLevel.MEMORY_AND_DISK)
            n_keys = winners.count()
            if n_keys > broadcast_keys_max:
                winners.unpersist()
                out = lww_latest(
                    df, keys, order_col, descending=descending,
                    count_col=count_col, num_partitions=num_partitions,
                )
                out._sodes_pinned = None  # API compat: nothing pinned
                return out
            pinned = winners  # released by the caller via unpersist_pinned
            broadcast_winners = True
    if broadcast_winners == "bloom":
        # Cluster-scale fetch: the winner set never becomes a driver-built
        # broadcast hash relation. (a) persist + count the winner aggregate
        # — exact sizing off the scan phase 1 needs anyway, and unlike a
        # broadcast, an under-sized bloom only raises the false-positive
        # rate, never OOMs; (b) prefilter the batch map-side with a blocked
        # bloom over xxhash64(key, winning order) built distributively and
        # attached as a one-row broadcast (O(bitmap) driver work); (c)
        # resolve exactly with a co-partitioned shuffle-hash join at the
        # bucket partitioning, which the tie-break window then reuses.
        # False positives die in the eqNullSafe filter — winners stay
        # bit-identical to the window kernel.
        winners = winners.persist(StorageLevel.MEMORY_AND_DISK)
        n_keys = winners.count()
        if n_keys > broadcast_keys_max:
            winners.unpersist()
            out = lww_latest(
                df, keys, order_col, descending=descending,
                count_col=count_col, num_partitions=num_partitions,
            )
            out._sodes_pinned = None  # API compat: nothing pinned on this path
            return out
        pinned = winners
        nwords = bloom_words(n_keys)
        h_win = F.xxhash64(*[F.col(k) for k in keys], F.col("_w_ord"))
        bf = bloom_frame(winners, h_win, nwords)
        h = F.xxhash64(*[F.col(k) for k in keys], F.col(order_col))
        cand = df.join(F.broadcast(bf)).filter(
            bloom_member(F.col("_bf"), h, nwords)
        ).drop("_bf")
        if num_partitions:
            cand = cand.repartition(num_partitions, *[F.col(k) for k in keys])
            win_side = winners.repartition(num_partitions, *[F.col(k) for k in keys])
        else:
            win_side = winners
        cand = cand.join(win_side.hint("shuffle_hash"), on=keys, how="inner").filter(
            F.col(order_col).eqNullSafe(F.col("_w_ord"))
        )
    else:
        win_side = (
            F.broadcast(winners) if broadcast_winners else winners.hint("shuffle_hash")
        )
        cand = df.join(win_side, on=keys, how="inner").filter(
            F.col(order_col).eqNullSafe(F.col("_w_ord"))
        )
        if num_partitions:
            cand = cand.repartition(num_partitions, *[F.col(k) for k in keys])
    tie = F.xxhash64(*[F.col(c) for c in payload_cols])
    w = Window.partitionBy(*keys).orderBy(tie.desc())
    out = cand.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    if count_col:
        out = out.withColumn(count_col, F.col("_w_cnt"))
    out = out.drop("_rn", "_w_ord", "_w_cnt").select(
        *payload_cols, *([count_col] if count_col else [])
    )
    out._sodes_pinned = pinned  # bloom fetch pins the winner aggregate
    return out


def unpersist_pinned(df: DataFrame) -> None:
    """Release anything a kernel call pinned in the block-manager cache —
    the bloom fetch pins the (key, order, count) winner aggregate so the
    bitmap build and the exact candidate join share one computation. Call
    after the kernel's output has been materialized (e.g. scratch write)."""
    pinned = getattr(df, "_sodes_pinned", None)
    if pinned is not None:
        pinned.unpersist()


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
