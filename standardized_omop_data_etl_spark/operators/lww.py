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

from pyspark.sql import Column, DataFrame, Window, functions as F

# Winner sets at or below this many keys are broadcast in the narrow kernel's
# candidate join; larger sets fall back to the window kernel (see
# lww_latest_narrow's broadcast_winners='auto'). Same contract (and default
# value) as plans.merge.BROADCAST_KEYS_MAX — the keys are short strings, so
# 4M keys ≈ 100-200 MB broadcast, sized for real executors.
BROADCAST_KEYS_MAX = 4_000_000

# The auto probe is an HLL estimate (rsd=0.02), not an exact count: only
# broadcast when the estimate clears the bound with room for the error, so
# an undercount can never push an over-bound winner set into a broadcast.
AUTO_BROADCAST_MARGIN = 0.9


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


def lww_latest_narrow(
    df: DataFrame,
    key_cols: list[str] | str,
    order_col: str,
    descending: bool = True,
    count_col: str | None = None,
    num_partitions: int | None = None,
    broadcast_winners: bool | str = "auto",
    broadcast_keys_max: int = BROADCAST_KEYS_MAX,
    keys_bound: int | None = None,
) -> DataFrame:
    """Two-phase narrow-max LWW: bit-identical winners to ``lww_latest``,
    but the wide shuffle moves only the WINNERS' payloads, not every event.

    1. ``groupBy(key).agg(max(order), count)`` over the key/order columns
       only — map-side combinable, so a hot key collapses to one partial per
       input partition before anything moves (no salting needed).
    2. Join the (key, winning order) pairs back to the batch and keep rows
       whose order equals the winner's (null-safe, so an all-NULL-order key
       degrades to the same full-tie pick as the window path). When the
       winner set is broadcast the batch streams from its scan with NO
       exchange — Catalyst fuses the equality filter into the join as a
       composite (order, key) hash key, and without the hint that fusion
       forces a sort-merge exchange of every payload, defeating the point
       (verified on the physical plan). ``broadcast_winners`` controls this:

       * ``"auto"`` (default) — the key count is estimated with a cheap HLL
         probe (``approx_count_distinct`` over ``xxhash64(key)``: a
         column-pruned scan whose map-side sketches are a few KB — no
         aggregate materialized, no cache pinned, no per-epoch count job).
         At or under ``AUTO_BROADCAST_MARGIN × broadcast_keys_max`` (the
         margin absorbs the HLL error on the safe side) the winner set is
         broadcast; PAST the bound the whole narrow plan is abandoned for
         ``lww_latest``: once the key set can't be broadcast, the candidate
         join would shuffle every payload anyway — the same bytes as the
         window kernel's single exchange — and then still pay the phase-1
         aggregate, a winner re-cluster, and the tie-break window on top.
         Measured on a 16M-event / 8M-key epoch the shuffled candidate join
         was ~2× the window kernel's wall and scaled worse (fixed per-epoch
         jobs amortize over less parallel work). This is the size guard that
         makes the kernel safe for UNBOUNDED key sets — an initial-load
         epoch with tens of millions of distinct keys must not broadcast
         them, and with this fallback it degrades to the window plan's
         one-payload-shuffle cost instead of three exchanges.
       * ``True`` / ``False`` — explicit, no probe job: force the broadcast
         (caller guarantees a bounded key set) or force the shuffled
         candidate join (kept for A/B measurement — ``lww_strategy`` callers
         never reach it; prefer ``lww_latest`` when key-heavy).

       ``keys_bound`` short-circuits the ``"auto"`` probe: a caller that
       knows a HARD upper bound on the batch's row count (a replay epoch's
       LSN span, an offsets delta) passes it here, and since distinct keys
       ≤ rows, a bound under the margin proves the broadcast safe with no
       probe job. It must be a true bound, not an estimate — an
       under-report defeats the size guard. Bounds past the margin just
       fall through to the probe (many rows may still be few keys).
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
    if broadcast_winners == "auto" and keys_bound is not None:
        # distinct keys ≤ rows: a HARD row bound under the margin proves the
        # winner set broadcastable with no probe job at all (the common
        # bounded-epoch replay shape — one fewer batch scan per epoch); a
        # bound past the margin proves nothing (keys may still be few), so
        # fall through to the HLL probe rather than abandoning the kernel.
        if keys_bound <= AUTO_BROADCAST_MARGIN * broadcast_keys_max:
            broadcast_winners = True
    if broadcast_winners == "auto":
        est = df.agg(
            F.approx_count_distinct(
                F.xxhash64(*[F.col(k) for k in keys]), rsd=0.02
            ).alias("n")
        ).collect()[0]["n"]
        if est > AUTO_BROADCAST_MARGIN * broadcast_keys_max:
            out = lww_latest(
                df, keys, order_col, descending=descending,
                count_col=count_col, num_partitions=num_partitions,
            )
            out._sodes_pinned = None  # API compat: nothing pinned on this path
            return out
        do_broadcast = True
    else:
        do_broadcast = bool(broadcast_winners)
    agg_ord = F.max(order_col) if descending else F.min(order_col)
    winners = df.groupBy(*[F.col(k) for k in keys]).agg(
        agg_ord.alias("_w_ord"), F.count(F.lit(1)).alias("_w_cnt")
    )
    win_side = F.broadcast(winners) if do_broadcast else winners.hint("shuffle_hash")
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
    out._sodes_pinned = None  # nothing pinned since the HLL auto-probe
    return out


def unpersist_pinned(df: DataFrame) -> None:
    """Release anything a kernel call pinned in the block-manager cache.
    Since the ``broadcast_winners='auto'`` probe became a cache-free HLL
    estimate this is a no-op, kept so epoch loops written against the old
    persist-and-count contract stay source-compatible."""
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
