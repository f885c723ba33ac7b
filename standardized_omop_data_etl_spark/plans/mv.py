"""Incremental aggregate maintenance over the change feed.

The classic materialized-view problem: keep ``SELECT group_cols,
count(*), sum(v)...`` current as the base table ingests changes, WITHOUT
re-aggregating the table. At 10^10 rows a per-poll re-aggregate is the
reference's recompute-everything model (``combine_subtables.py:61-124``)
applied to analytics; with before-images on the feed the update is exact
algebra instead:

* every change row's AFTER image contributes ``+1 / +v`` to its (new) group
  unless the op is a delete;
* every change row's BEFORE image (``_before_*`` — the row visible at
  v_from) retracts ``-1 / -v`` from its (old) group unless the op is an
  insert.

Group-moving updates fall out for free: the retraction and the contribution
simply land in different groups. Count and sum are the self-maintainable
aggregates (avg = sum/count at read time); min/max are NOT delta-maintainable
under deletes (retracting the current minimum needs the group's next-smallest
value, which the feed does not carry) — they are served by the
``group_recompute`` strategy instead: the feed names exactly which groups
changed (after-image groups ∪ before-image groups), and only THOSE groups are
re-aggregated from the base table. Scan cost is one pass of the base with a
broadcast semi-join filter (group values are not the bucketing key, so rows
of a touched group live in every bucket); aggregate cost is O(touched-group
rows) — the minimum possible for exact min/max under deletes without a
per-group value index.

Scale shape: ``agg_deltas`` is one union + one partial-aggregated groupBy of
the CHANGE volume (never the table); ``apply_agg_deltas`` joins O(groups
touched) deltas against the view — broadcast-sized in any realistic grouping.
The exactness contract (incrementally maintained == recomputed from the final
table, epoch by epoch) is the oracle in tests/test_mv.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .change_feed import BEFORE_PREFIX, CHANGE_OP_COL

COUNT_COL = "mv_count"


def _sum_col(v: str) -> str:
    return f"mv_sum_{v}"


def _min_col(v: str) -> str:
    return f"mv_min_{v}"


def _max_col(v: str) -> str:
    return f"mv_max_{v}"


def agg_deltas(
    feed: DataFrame,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
) -> DataFrame:
    """Net per-group deltas carried by a change-feed frame (must come from
    ``read_changes(..., include_before=True)`` / ``poll(include_before=True)``).
    Output: ``group_cols`` + ``mv_count`` + ``mv_sum_<v>`` per ``sum_cols``
    entry — summable onto a view by ``apply_agg_deltas``."""
    sum_cols = sum_cols or []
    missing = [c for c in group_cols + sum_cols if BEFORE_PREFIX + c not in feed.columns]
    if missing:
        raise ValueError(
            f"feed lacks before-images for {missing}; read with include_before=True"
        )
    post = feed.filter(F.col(CHANGE_OP_COL) != "delete").select(
        *group_cols,
        F.lit(1).alias("_w"),
        *[F.col(v).alias(v) for v in sum_cols],
    )
    # op != insert ⇔ the key was visible at v_from ⇔ a before-image exists
    pre = feed.filter(F.col(CHANGE_OP_COL) != "insert").select(
        *[F.col(BEFORE_PREFIX + c).alias(c) for c in group_cols],
        F.lit(-1).alias("_w"),
        *[F.col(BEFORE_PREFIX + v).alias(v) for v in sum_cols],
    )
    agg = (
        post.unionByName(pre)
        .groupBy(*group_cols)
        .agg(
            F.sum("_w").cast("long").alias(COUNT_COL),
            *[
                F.sum(F.col(v) * F.col("_w")).alias(_sum_col(v))
                for v in sum_cols
            ],
        )
    )
    # all-zero deltas (a group whose changes net out exactly) are no-ops
    keep = F.col(COUNT_COL) != 0
    for v in sum_cols:
        keep = keep | (F.coalesce(F.col(_sum_col(v)), F.lit(0)) != 0)
    return agg.filter(keep)


def apply_agg_deltas(
    view: DataFrame,
    deltas: DataFrame,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
) -> DataFrame:
    """Merge a delta frame onto the current view state: full outer join on
    the group key, sum each measure, drop groups whose count reaches zero.
    ``view`` must have the same ``mv_*`` columns ``agg_deltas`` emits (an
    empty initial view is ``bootstrap_agg(df.limit(0), ...)``)."""
    sum_cols = sum_cols or []
    measures = [COUNT_COL] + [_sum_col(v) for v in sum_cols]
    d = deltas.select(
        *[F.col(c).alias(f"_g_{c}") for c in group_cols],
        *[F.col(m).alias(f"_d_{m}") for m in measures],
    )
    # NULL is a legitimate group value (e.g. a column added mid-stream):
    # join null-SAFELY, else the view's NULL group and its delta never meet
    cond = None
    for c in group_cols:
        eq = view[c].eqNullSafe(d[f"_g_{c}"])
        cond = eq if cond is None else (cond & eq)
    j = view.join(d, on=cond, how="full")
    out = j.select(
        *[
            F.coalesce(view[c], d[f"_g_{c}"]).alias(c)
            for c in group_cols
        ],
        *[
            (F.coalesce(F.col(m), F.lit(0)) + F.coalesce(F.col(f"_d_{m}"), F.lit(0)))
            .cast("long" if m == COUNT_COL else "double")
            .alias(m)
            for m in measures
        ],
    )
    return out.filter(F.col(COUNT_COL) > 0)


def bootstrap_agg(
    df: DataFrame,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> DataFrame:
    """The view's initial state from a full read — run ONCE at subscription
    time; every refresh after that is ``agg_deltas`` + ``apply_agg_deltas``
    over the feed (count/sum) or a ``group_recompute`` refresh (min/max —
    kept in their source column types, never coerced)."""
    sum_cols = sum_cols or []
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias(COUNT_COL),
        *[F.sum(v).cast("double").alias(_sum_col(v)) for v in sum_cols],
        *[F.min(v).alias(_min_col(v)) for v in (min_cols or [])],
        *[F.max(v).alias(_max_col(v)) for v in (max_cols or [])],
    )


# ---------------------------------------------------------------------------
# Persisted views: the MV as a LakeTable maintained through the same
# exactly-once MERGE machinery as any other CDC sink.

MV_KEY_COL = "mv_key"


def _mv_key(group_cols: list[str]):
    """Composite group key as the view table's single key column (LakeTable
    keys are one column); \\x1f-joined with a NULL sentinel so (NULL,) and
    ("",) stay distinct."""
    return F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
            for c in group_cols
        ],
    )


def materialize_view(
    spark,
    path: str,
    source,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    name: str = "mv",
    num_buckets: int = 4,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
):
    """Create a persisted aggregate view of ``source`` (a LakeTable) at its
    current version and subscribe a feed consumer at the same version.
    Returns ``(view_table, consumer)`` — thereafter ``refresh_view`` is the
    only write path. O(table) exactly once, here."""
    from ..sources.lake import LakeTable
    from .change_feed import ChangeFeedConsumer

    sum_cols = sum_cols or []
    v0 = source.current_version()
    snap = bootstrap_agg(
        source.read(version=v0), group_cols, sum_cols, min_cols, max_cols
    ).withColumn(MV_KEY_COL, _mv_key(group_cols))
    view = LakeTable.create(
        spark, path, schema=snap.schema, key_col=MV_KEY_COL,
        num_buckets=num_buckets, overwrite=True,
    )
    view.overwrite_full(snap)
    consumer = ChangeFeedConsumer(source, name, start_version=v0)
    return view, consumer


def _mv_applied_head(view, consumer) -> int | None:
    """Highest source version any ``mv:{name}:from-*`` epoch in the view's
    ledger has applied (stored as the epoch's last_lsn). O(epochs) metadata;
    read only on refresh, never per-row."""
    prefix = f"mv:{consumer.name}:from-"
    heads = [
        int(rec.get("last_lsn", -1))
        for e, rec in view.applied_epochs().items()
        if e.startswith(prefix)
    ]
    return max(heads) if heads else None


def _touched_fraction(source, pos: int, head: int) -> float:
    """Fraction of the source's resident rows living in buckets the range
    touched — free from the two endpoint manifests. 1.0 when bucket layouts
    aren't comparable (rebucket in between)."""
    from .change_feed import changed_buckets

    m_from, m_to = source.manifest(pos), source.manifest(head)
    touched = changed_buckets(m_from, m_to)
    counts = {int(k): int(v) for k, v in m_to.get("row_counts", {}).items()}
    total = sum(counts.values())
    if touched is None or total == 0:
        return 1.0
    return sum(counts.get(b, 0) for b in touched) / total


def refresh_view(
    view,
    consumer,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    allow_gc: bool = False,
    strategy: str = "auto",
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> list:
    """Drain the consumer into the persisted view — incremental, exactly
    once, resumable:

    * each poll's deltas apply as ONE MERGE epoch keyed on the consumer
      POSITION alone (``mv:{name}:from-{pos}``): a crash between MERGE and
      offset-commit redelivers from the same position, the ledger skips the
      duplicate, and the consumer fast-forwards to the head recorded as the
      epoch's LSN — no double-retraction, no lost range, even if the source
      committed more epochs in between;
    * racing maintainers sharing a consumer name collapse the same way: one
      MERGE wins the ledger, the loser's commit CAS fails and it re-polls.

    ``strategy`` picks how the new group values are computed — the MERGE
    application and exactly-once bookkeeping are identical either way:

    * ``"incremental"`` — feed deltas (2 pruned scans of TOUCHED buckets at
      the two versions + the change-volume join); count/sum only;
    * ``"recompute"`` — one pruned full re-aggregate, merged as upserts plus
      deletes of groups that vanished (still position-keyed: cheaper than
      deltas whenever the range touched most of the table);
    * ``"group_recompute"`` — re-aggregate ONLY the groups the feed names
      (after-image groups ∪ before-image groups, so a group-moving update
      refreshes both its old and new group): one base scan with a broadcast
      semi-join filter + O(touched-group rows) aggregation. This is the
      exact-maintenance path for ``min_cols`` / ``max_cols`` — a delete that
      removes a group's minimum is answered by re-reading just that group;
    * ``"auto"`` (default) — with min/max: ``group_recompute``, escalating
      to ``recompute`` when the range touched ≥ half the table's rows;
      without: ``incremental`` vs ``recompute`` at the same threshold (the
      measured model in BENCH/BASELINE.md's mv_bench table).

    Returns the MergeResults of epochs actually applied this call."""
    from .merge import merge_into

    if strategy not in ("auto", "incremental", "recompute", "group_recompute"):
        raise ValueError(f"unknown strategy {strategy!r}")
    sum_cols = sum_cols or []
    min_cols = min_cols or []
    max_cols = max_cols or []
    if (min_cols or max_cols) and strategy == "incremental":
        raise ValueError(
            "min/max aggregates are not delta-maintainable under deletes; "
            "use strategy='group_recompute' (or 'auto'/'recompute')"
        )
    measures = (
        [COUNT_COL]
        + [_sum_col(v) for v in sum_cols]
        + [_min_col(v) for v in min_cols]
        + [_max_col(v) for v in max_cols]
    )
    # measure dtypes for the delete rows' typed NULLs (min/max keep their
    # source types; count/sum are long/double by construction)
    mtypes = {
        f.name: f.dataType
        for f in view.schema().fields
        if f.name in measures
    }
    results = []
    while True:
        # crash / race recovery: ledger knows more than the offset file
        hwm = _mv_applied_head(view, consumer)
        if hwm is not None and hwm > consumer.position():
            consumer.commit(hwm)
            continue
        got = consumer.poll(allow_gc=allow_gc, include_before=True)
        if got is None:
            return results
        feed, head = got
        pos = consumer.position()
        frac = (
            _touched_fraction(consumer.table, pos, head)
            if strategy == "auto" else None
        )
        if strategy == "auto":
            if frac >= 0.5:
                resolved = "recompute"
            elif min_cols or max_cols:
                resolved = "group_recompute"
            else:
                resolved = "incremental"
        else:
            resolved = strategy
        if resolved in ("recompute", "group_recompute"):
            src = consumer.table.read(version=head)
            if resolved == "group_recompute":
                # groups named by the range: new groups of surviving rows +
                # old groups of rows that were visible at `pos` (before
                # images) — broadcast-sized (O(touched groups))
                after_keys = feed.filter(F.col(CHANGE_OP_COL) != "delete").select(
                    _mv_key(group_cols).alias(MV_KEY_COL)
                )
                before_keys = feed.filter(F.col(CHANGE_OP_COL) != "insert").select(
                    _mv_key([BEFORE_PREFIX + c for c in group_cols]).alias(MV_KEY_COL)
                )
                touched_keys = after_keys.unionByName(before_keys).distinct()
                src = src.withColumn(MV_KEY_COL, _mv_key(group_cols)).join(
                    F.broadcast(touched_keys), on=MV_KEY_COL, how="left_semi"
                ).drop(MV_KEY_COL)
            fresh = bootstrap_agg(
                src, group_cols, sum_cols, min_cols, max_cols
            ).withColumn(MV_KEY_COL, _mv_key(group_cols))
            gone = view.read().select(MV_KEY_COL, *group_cols)
            if resolved == "group_recompute":
                # only touched groups may vanish; an untouched group absent
                # from the RESTRICTED aggregate must not be deleted
                gone = gone.join(F.broadcast(touched_keys), on=MV_KEY_COL,
                                 how="left_semi")
            gone = gone.join(
                fresh.select(MV_KEY_COL), on=MV_KEY_COL, how="left_anti"
            )
            batch = fresh.select(
                F.lit(head).cast("long").alias("lsn"),
                F.lit("upsert").alias("op"),
                MV_KEY_COL, *group_cols, *measures,
            ).unionByName(
                gone.select(
                    F.lit(head).cast("long").alias("lsn"),
                    F.lit("delete").alias("op"),
                    MV_KEY_COL, *group_cols,
                    *[F.lit(None).cast(mtypes[m]).alias(m) for m in measures],
                )
            )
            r = merge_into(view, batch, epoch=f"mv:{consumer.name}:from-{pos}")
            if not r.skipped:
                results.append(r)
            if not r.skipped and not consumer.commit(head):
                continue
            continue
        deltas = agg_deltas(feed, group_cols, sum_cols)
        d = deltas.select(
            *[F.col(c).alias(f"_g_{c}") for c in group_cols],
            *[F.col(m).alias(f"_d_{m}") for m in measures],
        )
        # touched groups only: right join current state onto the deltas —
        # null-SAFE on the group key (NULL is a legitimate group value)
        cur = view.read().drop(MV_KEY_COL)
        cond = None
        for c in group_cols:
            eq = cur[c].eqNullSafe(d[f"_g_{c}"])
            cond = eq if cond is None else (cond & eq)
        j = cur.join(d, on=cond, how="right")
        vals = j.select(
            *[F.col(f"_g_{c}").alias(c) for c in group_cols],
            *[
                (
                    F.coalesce(F.col(m), F.lit(0))
                    + F.coalesce(F.col(f"_d_{m}"), F.lit(0))
                )
                .cast("long" if m == COUNT_COL else "double")
                .alias(m)
                for m in measures
            ],
        )
        batch = vals.select(
            F.lit(head).cast("long").alias("lsn"),
            F.when(F.col(COUNT_COL) <= 0, F.lit("delete"))
            .otherwise(F.lit("upsert"))
            .alias("op"),
            _mv_key(group_cols).alias(MV_KEY_COL),
            *group_cols,
            *measures,
        )
        r = merge_into(view, batch, epoch=f"mv:{consumer.name}:from-{pos}")
        if not r.skipped:
            results.append(r)
        # skipped ⇒ a winner already applied from this position; loop's
        # ledger probe will fast-forward the offset to ITS head, not ours
        if not r.skipped and not consumer.commit(head):
            continue  # lost the offset CAS to a peer; re-poll from winner
