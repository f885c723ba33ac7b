"""Incremental change-data-feed scan between two committed snapshots.

The ingest side of this engine applies a binlog as MERGE commits; this is the
CONSUMER side: ``read_changes(table, v_from, v_to)`` returns exactly the
logical row changes between two snapshots — the Iceberg incremental-scan /
Delta CDF analogue — so a downstream pipeline (index build, feature refresh,
replication) processes only what changed instead of re-reading the table.
(The reference has no incremental consumer: every run re-processes all
subtables end-to-end, ``combine_subtables.py:61-124`` — at 100 TB that
full-rescan model is precisely what a change feed replaces.)

Built entirely from the lake's own metadata, no extra bookkeeping at write
time:

* **Bucket pruning** — only buckets whose manifest file lists differ between
  the two snapshots can contain changes; everything else is never scanned.
  At 10^10-event scale an epoch touches a small fraction of buckets, so the
  feed's cost tracks the CHANGE volume, not the table size.
* **Row-level diff via the LWW watermark** — every stored row carries
  ``_lsn``; a row is "changed since v_from" iff its key was absent at
  v_from or its ``_lsn`` exceeds the key's v_from watermark. The before
  side is a 3-column (key, lsn, deleted) probe scan — payloads are read
  once, on the after side only.
* **The same broadcast discipline as MERGE** — the before probe is
  broadcast when the manifest's per-bucket key counts say it fits under
  ``BROADCAST_KEYS_MAX``, else an explicit shuffle-hash join (no sort, no
  plan flapping), mirroring ``plans/merge.py``'s key-probe gate.

Change classification (``_change_op``): ``insert`` (key not visible at
v_from), ``update`` (visible at both), ``delete`` (visible at v_from,
tombstoned at v_to). Tombstone-refreshes of already-dead keys (redelete /
tombstone-insert guards) are internal bookkeeping with no visible-state
delta and are filtered out. Delete rows carry the tombstone's payload (the
winning delete event's columns) and its LSN.

Fidelity guards: ``vacuum_tombstones`` between the snapshots can GC the only
evidence of a delete, and ``rollback`` makes LSNs non-monotone across the
range — both are detected from the walked manifest summaries and raise
unless the caller opts in; a ``rebucket`` only disables bucket pruning (the
diff itself is key-based and stays correct).
"""

from __future__ import annotations

import json
from typing import Any

import pyspark.sql.functions as F

import pyspark.sql.types as T

from ..sources.lake import DELETED_COL, LINEAGE_COL, LSN_COL, LakeTable
from .merge import _ACTIONS, BROADCAST_KEYS_MAX, SHUFFLE_HASH_KEYS_MAX, _knob

# Version ops whose commits add no data files (safe inside a pruned range).
_METADATA_ONLY_OPS = {"alter"}

CHANGE_OP_COL = "_change_op"
CHANGE_LSN_COL = "_change_lsn"
BEFORE_PREFIX = "_before_"


class ChangeFeedUnavailableError(RuntimeError):
    """The requested version range cannot produce a faithful change feed
    (tombstones vacuumed or history rewritten within the range)."""


def changed_buckets(m_from: dict[str, Any], m_to: dict[str, Any]) -> list[int] | None:
    """Buckets that can possibly hold changes between two manifests: those
    whose file lists differ (commits replace or append per-bucket file lists
    and carry everything else forward by reference, so an identical list is
    an identical bucket). Returns None when the bucket layouts are not
    comparable (rebucket in between) — caller must scan all buckets."""
    if m_from["num_buckets"] != m_to["num_buckets"] or m_from.get("bucket_fn") != m_to.get("bucket_fn"):
        return None
    all_b = set(m_from["files"]) | set(m_to["files"])
    return sorted(int(b) for b in all_b if m_from["files"].get(b) != m_to["files"].get(b))


_BARRIER_REASON = {
    "vacuum_tombstones": (
        "deletes below its watermark are no longer observable from "
        "tombstones. Pass allow_gc=True to read the feed anyway — the diff "
        "switches to a full-outer join and physically removed rows surface "
        "as synthesized deletes (null payload, LSN = before-watermark + 1)."
    ),
    "rollback": (
        "LSNs are not monotone across a history rewrite, so an incremental "
        "diff is not well-defined. Read the feed in two ranges split at the "
        "rollback, or pass allow_gc=True to diff the endpoint states as-is."
    ),
    "overwrite": (
        "a full overwrite of a non-empty table resets per-row LSNs, so the "
        "watermark diff is not well-defined across it. Re-bootstrap the "
        "consumer at the overwrite version (allow_gc=True skips this check, "
        "but rows whose LSN moved backward are misreported as unchanged)."
    ),
}


def _mor_range_winner_bound(
    table: LakeTable, from_version: int, to_version: int
) -> int | None:
    """Σ LWW winners over a version range, or None when the range is not
    winner-only (any cow merge, compaction, rebucket, overwrite… adds files
    that also carry UNCHANGED resident rows, so "keys in added files" would
    balloon past the change volume). Over a pure merge-on-read range every
    added file holds exactly one epoch's winners — including late/
    out-of-order winners whose LSN sits below any global watermark, which is
    why the pruning keys off file membership, never an LSN cutoff. O(range)
    driver-side manifest reads, same cost class as the legacy barrier walk
    (consumers poll short ranges)."""
    total = 0
    for v in range(from_version + 1, to_version + 1):
        try:
            s = table.manifest(v).get("summary", {})
        except Exception:
            # a mid-range manifest that cannot be read (raced GC, partial
            # listing) only costs the optimization, never the feed
            return None
        op = s.get("operation")
        if op == "merge-mor":
            mt = s.get("metrics")
            if not isinstance(mt, dict) or any(a not in mt for a in _ACTIONS):
                # a merge-mor commit without full per-action metrics (foreign
                # writer, damaged summary) cannot bound its winner count —
                # treat like an unknown op rather than under-counting to 0
                return None
            total += sum(int(mt[a]) for a in _ACTIONS)
        elif op not in _METADATA_ONLY_OPS:
            return None
    return total


def _added_files(
    m_from: dict[str, Any], m_to: dict[str, Any], buckets: list[int] | None
) -> list[str]:
    """Relative paths of data files present at v_to but not v_from (the
    range's winner deltas, when the range is winner-only)."""
    sel = None if buckets is None else {int(b) for b in buckets}
    out: list[str] = []
    for b, files in m_to["files"].items():
        if sel is not None and int(b) not in sel:
            continue
        old = set(m_from["files"].get(b, []))
        out.extend(f for f in files if f not in old)
    return out


def _raise_barrier(op: str, version: int, from_version: int, to_version: int) -> None:
    raise ChangeFeedUnavailableError(
        f"{op} at version {version} is inside the requested range "
        f"({from_version}, {to_version}]: " + _BARRIER_REASON[op]
    )


def _guard_linear_history(
    table: LakeTable, m_to: dict[str, Any], from_version: int, to_version: int,
    allow_gc: bool,
) -> None:
    """Refuse ranges containing a feed barrier — tombstone vacuum (delete
    evidence GC'd), rollback (LSNs non-monotone), or an overwrite of a
    non-empty table (LSNs reset). O(1): every commit carries the latest
    barrier's (version, operation) forward in its manifest (``feed_barrier``,
    sources/lake.py commit), so only the endpoint manifest is consulted.
    Manifests written before the watermark existed fall back to walking the
    range — O(versions) tiny JSON reads, driver-side."""
    if allow_gc:
        return
    if "feed_barrier" in m_to:
        fb = m_to["feed_barrier"]
        if fb is not None and fb["version"] > from_version:
            _raise_barrier(fb["operation"], fb["version"], from_version, to_version)
        return
    for v in range(from_version + 1, to_version + 1):
        op = table.manifest(v).get("summary", {}).get("operation")
        if op in ("vacuum_tombstones", "rollback"):
            _raise_barrier(op, v, from_version, to_version)


def read_changes(
    table: LakeTable,
    from_version: int,
    to_version: int | None = None,
    allow_gc: bool = False,
    include_before: bool = False,
):
    """DataFrame of logical row changes between two snapshots.

    Output schema: ``_change_op`` (insert|update|delete), every user-visible
    column of ``to_version``'s schema (the after-image; a delete row carries
    the winning delete event's payload), and ``_change_lsn`` (the LSN that
    produced the change) — so the feed itself is a replayable changelog:
    applying it to a copy of v_from with ``merge_into`` reproduces v_to's
    visible state exactly (tested in tests/test_change_feed.py).

    ``include_before=True`` additionally emits ``_before_<col>`` for every
    user column: the row VISIBLE at ``from_version`` (NULL on inserts — no
    visible predecessor) — the Delta-CDF ``update_preimage`` analogue, which
    is what delta-able consumers (incremental aggregate maintenance,
    plans/mv.py) need to retract the old contribution. Cost is explicit:
    the before side must then read full payloads of the candidate buckets
    instead of the 3-column probe, roughly doubling the feed's scan; the
    broadcast gate tightens accordingly (rows are table-width, not
    3 columns).
    """
    to_version = table.current_version() if to_version is None else to_version
    if from_version > to_version:
        raise ValueError(f"from_version {from_version} > to_version {to_version}")
    m_to = table.manifest(to_version)
    user_cols = [f["name"] for f in m_to["schema"]["fields"]]
    if from_version == to_version:
        schema = table.schema(to_version)
        empty = table.spark.createDataFrame([], schema)
        return empty.select(
            F.lit("").alias(CHANGE_OP_COL), *user_cols,
            F.lit(None).cast("long").alias(CHANGE_LSN_COL),
        ).limit(0)
    m_from = table.manifest(from_version)
    _guard_linear_history(table, m_to, from_version, to_version, allow_gc)
    buckets = changed_buckets(m_from, m_to)

    # After side: full payload of candidate buckets at v_to, tombstones kept
    # (they ARE the deletes). Before side: 3-column (key, lsn, deleted) probe
    # of the same buckets at v_from — the key's visibility watermark.
    key = m_to["key_col"]

    # Batch-keyed feed pruning (the MERGE probes' trick, consumer side):
    # the before-probe sizing below needs the per-bucket key counts anyway;
    # when they exceed the broadcast cap AND the range is winner-only
    # merge-on-read (every added file holds exactly one epoch's winners),
    # the changed-key candidates are precisely the keys IN the added files —
    # a narrow O(change-volume) scan. Pushing them as a key_filter below
    # both endpoint reads (and below the mor resolvers) makes both join
    # sides change-sized: no table-sized exchange no matter how many keys
    # the touched buckets hold. Skipped under allow_gc (physically removed
    # rows appear in NO added file — the full-outer diff must see the whole
    # bucket to synthesize their deletes).
    b_payload = [c for c in user_cols if c != key] if include_before else []
    key_counts = m_from.get("key_counts", {})
    if buckets is None:
        before_est = sum(int(c) for c in key_counts.values())
    else:
        before_est = sum(int(key_counts.get(str(b), 0)) for b in buckets)
    bkm = _knob("SODES_BROADCAST_KEYS_MAX", BROADCAST_KEYS_MAX)
    cap = bkm // 16 if include_before else bkm
    ck = None
    if before_est > cap and not allow_gc:
        bound = _mor_range_winner_bound(table, from_version, to_version)
        if bound is not None and bound <= cap:
            added = _added_files(m_from, m_to, buckets)
            if added:
                key_field = next(
                    f for f in table.physical_schema(to_version).fields if f.name == key
                )
                ck = (
                    table.spark.read.schema(T.StructType([key_field]))
                    .parquet(*[table.fs.join(table.path, f) for f in added])
                    .select(key)
                )

    after = table.read(
        version=to_version, buckets=buckets, include_hidden=True, key_filter=ck
    ).drop(LINEAGE_COL)
    # Before side: 3-column (key, lsn, deleted) visibility probe — or, with
    # before-images requested, the full payload at v_from (cost disclosed in
    # the docstring); payload columns come out _before_-prefixed. A column
    # ADDED between the two versions has no before-image by definition:
    # read only what existed at v_from and pad the rest as typed NULLs.
    from_cols = {f["name"] for f in m_from["schema"]["fields"]}
    b_read = [c for c in b_payload if c in from_cols]
    before = (
        table.read(
            version=from_version, buckets=buckets, include_hidden=True,
            columns=[key, LSN_COL, DELETED_COL] + b_read, key_filter=ck,
        )
        .withColumnRenamed(LSN_COL, "_b_lsn")
        .withColumnRenamed(DELETED_COL, "_b_del")
    )
    for c in b_read:
        before = before.withColumnRenamed(c, BEFORE_PREFIX + c)
    if include_before and len(b_read) < len(b_payload):
        to_types = {f.name: f.dataType for f in table.schema(to_version).fields}
        for c in b_payload:
            if c not in from_cols:
                before = before.withColumn(
                    BEFORE_PREFIX + c, F.lit(None).cast(to_types[c])
                )
    # Same probe-sizing gate as the MERGE kernel: manifest key counts are
    # free; under the cap the payload side streams with NO exchange. With
    # full-width before rows the cap tightens by a width factor. A pruned
    # before side is change-sized by construction (≤ the winner bound the
    # pruning gated on), so it also broadcasts.
    if ck is not None or before_est <= cap:
        before_side = F.broadcast(before)
    elif before_est <= SHUFFLE_HASH_KEYS_MAX:
        before_side = before.hint("shuffle_hash")
    else:
        # an explicit shuffle_hash hint overrides AQE and will OOM the build
        # side once a partition's share no longer fits executor memory —
        # past this bound leave the join unhinted (AQE picks, typically
        # sort-merge, which spills instead of failing)
        before_side = before
    # Linear history: every before-row still exists at v_to (live, tombstoned
    # or rewritten), so a LEFT join suffices. Under allow_gc the range may
    # contain a vacuum that physically removed rows — a FULL join lets the
    # before-only side surface those as synthesized deletes.
    j = after.join(before_side, on=key, how="full" if allow_gc else "left")

    a_missing = F.col(LSN_COL).isNull()  # possible only under the full join
    b_missing = F.col("_b_lsn").isNull()
    newer = b_missing | a_missing | (F.col(LSN_COL) > F.col("_b_lsn"))
    b_dead = F.coalesce(F.col("_b_del"), F.lit(False))
    a_dead = F.coalesce(F.col(DELETED_COL), F.lit(False))
    # visible-state delta classification; tombstone→tombstone refreshes and
    # guard tombstones on never-live keys have no visible delta → dropped.
    op = (
        F.when(a_missing & ~b_dead, F.lit("delete"))  # row GC'd since v_from
        .when(a_missing, F.lit(None).cast("string"))
        .when(a_dead & ~b_missing & ~b_dead, F.lit("delete"))
        .when(~a_dead & (b_missing | b_dead), F.lit("insert"))
        .when(~a_dead, F.lit("update"))
    )  # else NULL → filtered
    # before-image is the row VISIBLE at v_from: NULL unless the key was
    # live there (tombstones are bookkeeping, not a visible predecessor)
    b_visible = ~b_missing & ~b_dead
    before_cols = [
        F.when(b_visible, F.col(BEFORE_PREFIX + c)).alias(BEFORE_PREFIX + c)
        for c in b_payload
    ]
    if include_before and b_payload:
        before_cols.insert(0, F.when(b_visible, F.col(key)).alias(BEFORE_PREFIX + key))
    return (
        j.filter(newer)
        .withColumn(CHANGE_OP_COL, op)
        .filter(F.col(CHANGE_OP_COL).isNotNull())
        .select(
            CHANGE_OP_COL,
            *user_cols,
            *before_cols,
            # synthesized deletes have no stored row: stay monotone past the
            # before-watermark (snapshot_diff's legacy convention)
            F.coalesce(F.col(LSN_COL), F.col("_b_lsn") + 1).alias(CHANGE_LSN_COL),
        )
    )


CONSUMERS_DIR = "_consumers"


class ChangeFeedConsumer:
    """Durable change-feed consumer with committed offsets — the Kafka
    consumer-group analogue for the lake table, mirroring the ingest side's
    exactly-once design on the consume side.

    The offset (last PROCESSED snapshot version) lives in one tiny JSON per
    consumer name under ``<table>/_consumers/``, written through the table's
    ``FileSystem`` (so it works unchanged on the object-store adapter), and
    advanced with a compare-and-swap (``replace_if_equals``): two processes
    sharing a consumer name cannot silently double-advance — the loser's
    commit returns False and it re-polls from the winner's position.

    Delivery contract: ``poll()`` → process → ``commit(head)`` is
    at-least-once; a crash between process and commit redelivers the same
    version range. Downstream sinks make it exactly-once the same way the
    ingest side does — an idempotent apply keyed on the range (e.g.
    ``merge_into(sink, batch, epoch=f"{name}:{pos}-{head}")``).

    A consumer lagging past ``expire_snapshots``' retention loses its
    from-manifest and raises ``ChangeFeedUnavailableError`` — size snapshot
    retention to the slowest consumer, exactly as with Kafka log retention.
    """

    def __init__(self, table: LakeTable, name: str, start_version: int | None = None):
        self.table = table
        self.name = name
        self.fs = table.fs
        self._path = self.fs.join(table.path, CONSUMERS_DIR, f"{name}.json")
        if not self.fs.exists(self._path):
            pos = table.current_version() if start_version is None else start_version
            self.fs.makedirs(self.fs.join(table.path, CONSUMERS_DIR))
            # create_exclusive: two racing initializers agree on one start
            self.fs.create_exclusive(self._path, self._payload(pos))

    def _payload(self, position: int) -> str:
        return json.dumps({"name": self.name, "position": int(position)})

    def position(self) -> int:
        return int(json.loads(self.fs.read_text(self._path))["position"])

    def poll(self, allow_gc: bool = False, include_before: bool = False):
        """(feed DataFrame, head_version) for everything committed past this
        consumer's position, or None when caught up. Does NOT advance the
        offset — call ``commit(head_version)`` after processing.
        ``include_before`` passes through to ``read_changes`` (before-images
        for delta-able consumers, at the documented extra scan cost)."""
        pos = self.position()
        head = self.table.current_version()
        if head <= pos:
            return None
        try:
            feed = read_changes(
                self.table, pos, head, allow_gc=allow_gc,
                include_before=include_before,
            )
        except FileNotFoundError as e:
            raise ChangeFeedUnavailableError(
                f"consumer '{self.name}' position v{pos} predates snapshot "
                "retention (expire_snapshots GC'd its manifest); reset the "
                "consumer or widen retention."
            ) from e
        return feed, head

    def commit(self, head_version: int) -> bool:
        """CAS-advance the offset from the position ``poll`` was served at.
        False = another process advanced first; re-poll and reprocess."""
        pos = self.position()
        if head_version <= pos:
            return False
        return self.fs.replace_if_equals(
            self._path, self._payload(pos), self._payload(head_version)
        )


def mirror_changes(consumer: ChangeFeedConsumer, sink: LakeTable, allow_gc: bool = False):
    """Drain a consumer into another LakeTable — end-to-end CDC replication
    (binlog → table A → feed → table B) with exactly-once sink state.

    Each poll applies as ONE idempotent MERGE epoch keyed on the consumer
    name + version range, then the offset commits. A crash anywhere
    redelivers the same range into the same epoch key, which the sink's
    epoch ledger skips — the identical commit-then-stamp contract the ingest
    side uses, now composed across two tables. The feed's op/LSN columns map
    straight onto the MERGE changelog contract (delete → delete, everything
    else → upsert; synthesized GC deletes keep LWW monotone via
    watermark + 1), so the sink's tombstone/resurrection guards hold on the
    mirror too. Returns the list of MergeResults (empty when caught up)."""
    from .merge import merge_into

    results = []
    while (got := consumer.poll(allow_gc=allow_gc)) is not None:
        feed, head = got
        pos = consumer.position()
        payload = [c for c in feed.columns if c not in (CHANGE_OP_COL, CHANGE_LSN_COL)]
        batch = feed.select(
            F.col(CHANGE_LSN_COL).alias("lsn"),
            F.when(F.col(CHANGE_OP_COL) == "delete", "delete")
            .otherwise("upsert")
            .alias("op"),
            *payload,
        )
        results.append(
            merge_into(sink, batch, epoch=f"mirror:{consumer.name}:{pos}-{head}")
        )
        consumer.commit(head)
    return results
