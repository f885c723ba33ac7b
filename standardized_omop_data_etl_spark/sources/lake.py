"""Snapshot-versioned, key-bucketed parquet lake table ("mini-Iceberg").

No Iceberg runtime jars ship in this environment, so the engine provides its
own lake-table format with the same contract the north star requires of an
Iceberg sink:

* **snapshot isolation** — every commit writes an immutable snapshot manifest
  ``metadata/v{N}.json`` listing the data files per bucket; readers resolve
  the current snapshot through an atomically-replaced ``metadata/_current``
  pointer. Old snapshots stay readable (time travel).
* **key bucketing** — data files are laid out by
  ``bucket = pmod(hash(key), num_buckets)`` where ``hash`` is Spark's
  Murmur3 shuffle hash (``bucket_expr``/``BUCKET_FN`` — deliberately NOT
  xxhash64: the bucket function must equal the shuffle hash for the
  bucket-aligned-exchange property below). A MERGE touches only the
  buckets its batch hashes into; untouched buckets carry their existing files
  forward by reference. This is the property that keeps a micro-batch MERGE
  proportional to the *batch*, not the 100 TB table.
* **commit-level properties** — arbitrary JSON properties ride on the
  snapshot (the exactly-once layer stamps applied checkpoint epochs here, the
  analogue of Iceberg's ``snapshot.summary`` dedup check).
* **schema-as-data** — the table schema is stored in the manifest; evolution
  never rewrites files. Spark's parquet reader applies the current schema on
  read: files missing a column yield NULL, int32 files read as int64 after a
  widening, array<int> reads as array<long> (all verified by tests).

Reference parity: the reference's stage-checkpoint directories
(``pipeline_process_subtables_to_final.py:17-23,171-180``) become snapshot
commits; its destructive re-init / full replay (``:11-54``) becomes
``create(..., overwrite=True)`` + replay from LSN 0.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from .fs import FileSystem, LocalFileSystem

METADATA_DIR = "metadata"
DATA_DIR = "data"
CURRENT_PTR = "_current"
LEASE_FILE = "_lease"

# Identifier of the bucket hash function baked into every manifest. The
# on-disk placement of rows depends on it, so a reader/writer built with a
# different bucket function MUST refuse the table (probing buckets computed
# with the wrong hash silently misses existing keys — duplicate inserts,
# broken tombstone guards). Changing the function requires a new identifier
# here plus a ``rebucket`` migration of existing tables.
BUCKET_FN = "murmur3_pmod_v1"

# Hidden physical columns (present in data files, invisible to table readers).
LSN_COL = "_lsn"  # per-row last-applied LSN: powers MATCHED AND src.lsn > tgt.lsn
LINEAGE_COL = "_lineage"  # per-row provenance string (reference readme.md:91-97 analogue)
# Tombstone marker: deletes keep a hidden row carrying the deletion LSN, so a
# stale (out-of-order) update delivered AFTER the delete still loses the LWW
# comparison instead of resurrecting the key. Visible reads filter these out;
# vacuum_tombstones (plans.maintenance) GCs them past a watermark.
DELETED_COL = "_deleted"


class SchemaEvolutionError(ValueError):
    """Raised when an incoming batch schema cannot be reconciled."""


class TableFormatError(ValueError):
    """Raised when a table's on-disk format (e.g. its bucket hash function)
    is incompatible with this engine version."""


class ConcurrentWriterError(RuntimeError):
    """Raised when another writer holds the table's writer lease."""


def bucket_expr(key_col: str, num_buckets: int):
    """Deterministic bucket id for a key — same hash on writer and reader.

    Deliberately ``pmod(hash(key), num_buckets)`` — Spark's own Murmur3 shuffle
    hash — so that ``df.repartition(num_buckets, key)`` places every row in
    shuffle partition == its bucket id (verified property of HashPartitioning).
    Any shuffle keyed on the table key is therefore *bucket-aligned*: the LWW
    window shuffle, the bucket-clustered writes, and the bucketed-join layout
    all reuse one exchange with zero extra wide shuffles."""
    return F.pmod(F.hash(F.col(key_col)), F.lit(num_buckets)).cast("int")


# ---------------------------------------------------------------------------
# Schema-registry diff (the ALTER-before-MERGE policy)
# ---------------------------------------------------------------------------

# keys are DataType.simpleString() names
_WIDENINGS: dict[tuple[str, str], bool] = {
    ("int", "bigint"): True,
    ("smallint", "int"): True,
    ("smallint", "bigint"): True,
    ("tinyint", "smallint"): True,
    ("tinyint", "int"): True,
    ("tinyint", "bigint"): True,
    ("float", "double"): True,
}


def _can_widen(src: T.DataType, dst: T.DataType) -> bool:
    if src == dst:
        return True
    if isinstance(src, T.ArrayType) and isinstance(dst, T.ArrayType):
        return _can_widen(src.elementType, dst.elementType)
    return _WIDENINGS.get((src.simpleString(), dst.simpleString()), False)


def _widen(a: T.DataType, b: T.DataType) -> T.DataType | None:
    """Least common widened type of two types, or None if incompatible."""
    if a == b:
        return a
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        elem = _widen(a.elementType, b.elementType)
        return T.ArrayType(elem, True) if elem is not None else None
    if _can_widen(a, b):
        return b
    if _can_widen(b, a):
        return a
    return None


def diff_schema(
    table_schema: T.StructType,
    batch_schema: T.StructType,
    missing: str = "null",
) -> tuple[T.StructType, list[dict[str, str]]]:
    """Schema-registry diff: reconcile an incoming batch schema with the table.

    Returns ``(evolved_schema, changes)`` where changes is a list of
    ``{action: add_column|widen_type, column, type}`` DDL-shaped records.
    Policy (north_rule): added columns OK (nullable), integer/float widening
    OK (incl. inside array elements — `n_tok` int32→int64, tokens
    array<int32>→array<int64>), anything else is an error. Batch columns
    missing from the table are appended. Order: table columns first,
    additions appended — id-based, order-tolerant like Iceberg.

    ``missing`` is the EXPLICIT policy for table columns absent from the
    batch (an upstream DROP, or one half of a RENAME):

    * ``"null"`` (default) — batch rows get NULL for that column; valid for
      partial-payload changelogs that never carry every column.
    * ``"error"`` — raise ``SchemaEvolutionError`` naming the column; when
      the batch simultaneously ADDS a column of the identical type, the
      error flags the pair as a probable rename (renames cannot be applied
      automatically under name-based matching — the history under the old
      name would silently detach from the new one; backfill explicitly).
    """
    if missing not in ("null", "error"):
        raise ValueError(f"unknown missing-column policy {missing!r}")
    if missing == "error":
        batch_names = {f.name for f in batch_schema.fields}
        dropped = [f for f in table_schema.fields if f.name not in batch_names]
        if dropped:
            table_names = {f.name for f in table_schema.fields}
            added = [f for f in batch_schema.fields if f.name not in table_names]
            hints = []
            for d in dropped:
                same_type = [a.name for a in added if a.dataType == d.dataType]
                if same_type:
                    hints.append(
                        f"{d.name!r} -> {same_type[0]!r} looks like a RENAME "
                        "(same type dropped+added); renames are not auto-applied "
                        "— the old column's history would silently detach. "
                        "Backfill/alias explicitly upstream"
                    )
            raise SchemaEvolutionError(
                "batch is missing table column(s) "
                + ", ".join(repr(d.name) for d in dropped)
                + " (missing='error'). "
                + ("; ".join(hints) if hints else
                   "Pass missing='null' to NULL-fill if the upstream drop is intended")
            )
    changes: list[dict[str, str]] = []
    by_name = {f.name: f for f in batch_schema.fields}
    out: list[T.StructField] = []
    for f in table_schema.fields:
        b = by_name.pop(f.name, None)
        if b is None or b.dataType == f.dataType:
            out.append(T.StructField(f.name, f.dataType, True))
            continue
        widened = _widen(f.dataType, b.dataType)
        if widened is None:
            raise SchemaEvolutionError(
                f"incompatible type change for column {f.name!r}: "
                f"{f.dataType.simpleString()} -> {b.dataType.simpleString()}"
            )
        if widened != f.dataType:
            changes.append(
                {"action": "widen_type", "column": f.name, "type": widened.simpleString()}
            )
        out.append(T.StructField(f.name, widened, True))
    for name, b in by_name.items():
        changes.append({"action": "add_column", "column": name, "type": b.dataType.simpleString()})
        out.append(T.StructField(name, b.dataType, True))
    return T.StructType(out), changes


def conform_exprs(df: DataFrame, schema: T.StructType) -> list:
    """Column expressions projecting ``df`` onto ``schema`` (missing columns →
    typed NULL). The columnar analogue of the reference's
    ``add_missing_columns.py:27-49`` schema-padding pass (operator P2)."""
    have = {f.name for f in df.schema.fields}
    return [
        (df[f.name].cast(f.dataType) if f.name in have else F.lit(None).cast(f.dataType)).alias(
            f.name
        )
        for f in schema.fields
    ]


def conform_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    return df.select(*conform_exprs(df, schema))


# ---------------------------------------------------------------------------
# LakeTable
# ---------------------------------------------------------------------------


class LakeTable:
    """A snapshot-versioned bucketed parquet table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str, fs: FileSystem | None = None):
        self.spark = spark
        self.fs = fs or LocalFileSystem()
        self.path = self.fs.abspath(path)

    # -- creation / loading -------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_col: str,
        num_buckets: int = 16,
        properties: dict[str, Any] | None = None,
        overwrite: bool = False,
        fs: FileSystem | None = None,
    ) -> "LakeTable":
        fs = fs or LocalFileSystem()
        path = fs.abspath(path)
        if fs.exists(fs.join(path, METADATA_DIR, CURRENT_PTR)):
            if not overwrite:
                raise FileExistsError(f"table already exists at {path}")
            fs.rmtree(path)
        fs.makedirs(fs.join(path, METADATA_DIR))
        fs.makedirs(fs.join(path, DATA_DIR))
        tbl = cls(spark, path, fs)
        manifest = {
            "version": 0,
            "parent": None,
            "bucket_fn": BUCKET_FN,
            "schema": json.loads(schema.json()),
            "key_col": key_col,
            "num_buckets": num_buckets,
            "files": {},  # bucket(str) -> [relative data file paths]
            "row_counts": {},  # bucket(str) -> VISIBLE row count (merge metrics)
            # bucket(str) -> DISTINCT-KEY count (live + tombstoned keys) —
            # exactly the rows an include_hidden read of the bucket
            # materializes (mor deltas resolve to one row per key), so it —
            # not the visible count — sizes the merge probe's broadcast
            # gate; tombstone build-up between vacuums would otherwise blow
            # the gate's estimate without bound.
            "key_counts": {},
            "properties": properties or {},
            "summary": {"operation": "create", "total_rows": 0},
        }
        tbl._write_manifest(manifest)
        return tbl

    @classmethod
    def load(cls, spark: SparkSession, path: str, fs: FileSystem | None = None) -> "LakeTable":
        tbl = cls(spark, path, fs)
        tbl._check_format(tbl.manifest())  # raises if missing/incompatible
        return tbl

    @classmethod
    def exists(cls, path: str, fs: FileSystem | None = None) -> bool:
        fs = fs or LocalFileSystem()
        return fs.exists(fs.join(fs.abspath(path), METADATA_DIR, CURRENT_PTR))

    # -- manifest plumbing ---------------------------------------------------

    @staticmethod
    def _check_format(manifest: dict[str, Any]) -> None:
        fn = manifest.get("bucket_fn")
        if fn != BUCKET_FN:
            raise TableFormatError(
                f"table was bucketed with {fn!r}, this engine uses {BUCKET_FN!r};"
                " probing its buckets would miss existing keys — migrate with"
                " plans.maintenance.rebucket using a matching engine version"
            )

    def _meta_path(self, name: str) -> str:
        return self.fs.join(self.path, METADATA_DIR, name)

    def current_version(self) -> int:
        return int(self.fs.read_text(self._meta_path(CURRENT_PTR)).strip())

    def manifest(self, version: int | None = None) -> dict[str, Any]:
        if version is None:
            version = self.current_version()
        return json.loads(self.fs.read_text(self._meta_path(f"v{version}.json")))

    def _write_manifest(self, manifest: dict[str, Any]) -> None:
        v = manifest["version"]
        self.fs.write_text_atomic(self._meta_path(f"v{v}.json"), json.dumps(manifest, indent=1))
        self.fs.write_text_atomic(self._meta_path(CURRENT_PTR), str(v))

    # -- writer lease --------------------------------------------------------

    def _lease_payload(self, owner: str) -> str:
        return json.dumps({"owner": owner, "acquired_at": time.time()})

    def acquire_writer_lease(self, owner: str | None = None, ttl_sec: float = 600.0) -> str:
        """Single-writer enforcement: atomically create the lease file; a
        live lease held by another owner raises ``ConcurrentWriterError``
        (fail fast — the caller retries or backs off), a lease older than
        ``ttl_sec`` is presumed crashed and taken over.

        Primitives: ``FileSystem.create_exclusive`` (O_EXCL locally,
        If-None-Match conditional PUT on object stores) for fresh acquisition,
        and ``FileSystem.replace_if_equals`` — an atomic compare-and-swap on
        the observed stale content — for takeover. The CAS is what fences two
        racing takeovers: both observe the same stale payload, exactly one CAS
        succeeds, the loser re-reads and sees a live foreign lease. (The
        remove-then-create formulation had a window where writer B could
        remove the lease writer A just re-created — two live writers.)

        Long jobs must renew (``renew_writer_lease``) well within ``ttl_sec``
        — merge/compaction renew at phase boundaries — or size ``ttl_sec`` to
        the job's expected duration; commits re-verify ownership via
        ``assert_writer_lease`` before the pointer flip."""
        owner = owner or f"pid-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        lease_path = self._meta_path(LEASE_FILE)
        for attempt in (1, 2, 3):
            if self.fs.create_exclusive(lease_path, self._lease_payload(owner)):
                return owner
            try:
                raw = self.fs.read_text(lease_path)
                held = json.loads(raw)
            except (FileNotFoundError, ValueError):
                continue  # raced with a release / partial create — retry
            age = time.time() - float(held.get("acquired_at", 0))
            if held.get("owner") == owner:
                return owner
            if age <= ttl_sec:
                raise ConcurrentWriterError(
                    f"writer lease held by {held.get('owner')!r} "
                    f"({age:.0f}s old, ttl {ttl_sec:.0f}s) on {self.path}"
                )
            # stale lease: fenced takeover — swap only if nobody else did first
            if self.fs.replace_if_equals(lease_path, raw, self._lease_payload(owner)):
                return owner
            # CAS lost: another writer took over (or the owner revived) — loop
            # once more to read the new holder and fail with its identity.
        raise ConcurrentWriterError(f"could not acquire writer lease on {self.path}")

    def renew_writer_lease(self, owner: str) -> None:
        """Refresh the lease timestamp so a long-running job is not presumed
        crashed. CAS on the current content: if the lease was meanwhile taken
        over (we overran the ttl), the renewal FAILS loudly instead of
        re-stamping a lease that now belongs to someone else."""
        lease_path = self._meta_path(LEASE_FILE)
        try:
            raw = self.fs.read_text(lease_path)
            held = json.loads(raw)
        except (FileNotFoundError, ValueError):
            raise ConcurrentWriterError(
                f"writer lease on {self.path} vanished while held by {owner!r}"
            )
        if held.get("owner") != owner:
            raise ConcurrentWriterError(
                f"writer lease on {self.path} was taken over by "
                f"{held.get('owner')!r} while {owner!r} was still running"
            )
        if not self.fs.replace_if_equals(lease_path, raw, self._lease_payload(owner)):
            raise ConcurrentWriterError(
                f"writer lease on {self.path} changed hands during renewal by {owner!r}"
            )

    def assert_writer_lease(self, owner: str) -> None:
        """Commit-time fence: verify the lease still belongs to ``owner``
        before flipping the manifest pointer. A job that overran its ttl and
        lost the lease aborts here instead of racing the taker's commit."""
        lease_path = self._meta_path(LEASE_FILE)
        try:
            held = json.loads(self.fs.read_text(lease_path))
        except (FileNotFoundError, ValueError):
            raise ConcurrentWriterError(
                f"writer lease on {self.path} missing at commit time (owner {owner!r})"
            )
        if held.get("owner") != owner:
            raise ConcurrentWriterError(
                f"writer lease on {self.path} now held by {held.get('owner')!r}; "
                f"{owner!r} overran its ttl — aborting commit"
            )

    def release_writer_lease(self, owner: str) -> None:
        lease_path = self._meta_path(LEASE_FILE)
        try:
            held = json.loads(self.fs.read_text(lease_path))
        except (FileNotFoundError, ValueError):
            return
        if held.get("owner") == owner:
            self.fs.remove(lease_path)

    # -- schema accessors ----------------------------------------------------

    def schema(self, version: int | None = None) -> T.StructType:
        """User-facing table schema (hidden physical columns excluded)."""
        return T.StructType.fromJson(self.manifest(version)["schema"])

    def physical_schema(self, version: int | None = None) -> T.StructType:
        s = self.schema(version)
        return T.StructType(
            list(s.fields)
            + [
                T.StructField(LSN_COL, T.LongType(), True),
                T.StructField(LINEAGE_COL, T.StringType(), True),
                T.StructField(DELETED_COL, T.BooleanType(), True),
            ]
        )

    @property
    def key_col(self) -> str:
        return self.manifest()["key_col"]

    @property
    def num_buckets(self) -> int:
        return self.manifest()["num_buckets"]

    def properties(self, version: int | None = None) -> dict[str, Any]:
        return self.manifest(version)["properties"]

    def key_counts(self, version: int | None = None) -> dict[int, int]:
        """Per-bucket distinct-key counts (live + tombstoned) — exactly what
        an ``include_hidden`` read of the bucket materializes: clean buckets
        hold one physical row per key by construction, and mor buckets
        resolve to one row per key at read time. Buckets without an entry
        (legacy / pre-upgrade manifests) fall back to the visible count: an
        undercount only until the next write of that bucket re-stamps it."""
        m = self.manifest(version)
        vis = {int(b): int(c) for b, c in m.get("row_counts", {}).items()}
        keys = {int(b): int(c) for b, c in m.get("key_counts", {}).items()}
        return {**vis, **keys}

    # -- reads ---------------------------------------------------------------

    def _files(
        self,
        version: int | None = None,
        buckets: list[int] | None = None,
        file_subset: set[str] | None = None,
    ) -> list[str]:
        m = self.manifest(version)
        out: list[str] = []
        for b, files in m["files"].items():
            if buckets is None or int(b) in buckets:
                out.extend(
                    self.fs.join(self.path, f)
                    for f in files
                    if file_subset is None or f in file_subset
                )
        return out

    def mor_buckets(self, version: int | None = None) -> set[int]:
        """Buckets carrying merge-on-read delta files (appended by
        ``merge_into(..., mode="mor")``): their rows require per-key LWW
        resolution at read time until compaction rewrites them."""
        return {int(b) for b in self.manifest(version).get("mor_buckets", [])}

    def _resolve_lww(self, df: DataFrame, key: str) -> DataFrame:
        """Per-key LWW resolution of merge-on-read rows: one row per key, the
        max-``_lsn`` version (tombstones kept as rows — visibility filtering
        is the caller's concern, so compaction preserves the resurrection
        guard). A hash tie-break over the scanned SIMPLE columns mirrors
        ``operators.lww.lww_latest``. Note the tie-break's scope: (key, lsn)
        is unique across delta files by construction (epochs are exactly-once
        and each epoch's winners are LWW-unique per key), so ties only arise
        from byte-identical duplicate rows, where any pick is the same row. A
        hypothetical upstream that emitted two DIFFERENT payloads under one
        (key, lsn) would resolve per-projection until compaction pins one.

        Two physical forms, same pick:

        * narrow (array-free) scans — ``max`` over a ``(lsn, tie, payload…)``
          struct, whose lexicographic order IS the (lsn desc, tie desc) sort.
          It is map-side combinable: a key's N accumulated delta versions
          collapse to one partial per scan partition BEFORE the exchange, so
          the MERGE probe's cost stops growing with deltas-since-compaction
          (the window form shuffled and sorted every accumulated version —
          measured 2-3x the probe wall at 8 uncompacted epochs and the worst
          scaling phase of the whole merge at 1→4 cores);
        * payload scans (array columns, e.g. ``tokens``) — the windowed sort:
          max-over-struct on complex types forces ObjectHashAggregate whose
          per-row struct buffers measured slower than the sort it replaces.
        """
        # Tie scope: (key, lsn) is unique across delta files by construction,
        # so ties only arise between byte-identical duplicate rows, where any
        # pick is the same row — hashing the SIMPLE columns is therefore
        # pick-identical to hashing everything for every realizable input.
        # What it buys: the window form's ordering expression no longer
        # references array/map/struct payloads, so Catalyst column-prunes
        # them BELOW the resolver for narrow consumers (a group/sum view
        # refresh over a mor bucket reads 4 columns, not the tokens array —
        # hashing all columns forced a full-width decode of every resident
        # row). The hypothetical upstream that emits two DIFFERENT payloads
        # under one (key, lsn) resolves per-projection until compaction pins
        # one — same caveat class as before, now also covering payloads that
        # differ only in complex columns.
        simple_cols = [
            f.name for f in df.schema.fields
            if not isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        tie = F.xxhash64(*[F.col(c) for c in simple_cols])
        narrow = len(simple_cols) == len(df.columns)
        if narrow:
            rest = [c for c in df.columns if c not in (key, LSN_COL)]
            packed = F.struct(
                F.col(LSN_COL).alias("_o"),
                tie.alias("_t"),
                *[F.col(c).alias(c) for c in rest],
            )
            won = df.groupBy(key).agg(F.max(packed).alias("_w"))
            return won.select(
                F.col(key),
                F.col("_w").getField("_o").alias(LSN_COL),
                *[F.col("_w").getField(c).alias(c) for c in rest],
            ).select(*df.columns)
        w = Window.partitionBy(key).orderBy(F.col(LSN_COL).desc(), tie.desc())
        return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")

    def read(
        self,
        version: int | None = None,
        buckets: list[int] | None = None,
        include_hidden: bool = False,
        columns: list[str] | None = None,
        key_filter: DataFrame | None = None,
        file_subset: set[str] | None = None,
        key_in: list | None = None,
    ) -> DataFrame:
        """Read the table (optionally a bucket subset / older snapshot /
        column subset).

        ``key_in`` (driver-small literal key list) applies ``key IN (...)``
        directly on the scan — unlike the ``key_filter`` semi-join it
        reaches parquet as a pushed-down ``In`` predicate, so row-group
        min/max (and key bloom filters on compacted files) prune INSIDE the
        files the manifest couldn't skip. Same placement as ``key_filter``:
        below merge-on-read LWW resolution, which is sound because per-key
        resolution is independent across keys.

        ``file_subset`` (manifest-relative paths) further restricts the scan
        to specific data files — the file-skipping hook ``lookup`` drives
        from per-file manifest stats. Callers must only drop files that
        provably cannot contain the rows they want: per-key LWW resolution
        of merge-on-read buckets is unaffected by removing files that hold
        none of the wanted keys, but removing one VERSION of a wanted key
        would resurrect an older version.

        ``key_filter`` restricts the result to rows whose key appears in the
        given single-column frame (column name = the table key). The
        semi-join is applied BELOW merge-on-read LWW resolution — per-key
        resolution is independent across keys, so filter-then-resolve picks
        the same rows — which means a mor bucket's resolution exchange moves
        only the filtered keys' versions instead of every resident row. The
        filter side is broadcast unconditionally: callers gate on
        BROADCAST_KEYS_MAX-style bounds before passing one (the MERGE probe
        gates on the epoch's ``batch_rows_bound``).

        Always reads with the *manifest schema* explicitly, so files written
        before a schema evolution surface NULLs / widened ints without any
        rewrite. ``columns`` prunes the read schema — parquet only scans
        those columns (used by the MERGE key-probe, which reads 2 columns of
        a table whose payload may be 100 TB).

        Buckets listed in the snapshot's ``mor_buckets`` hold merge-on-read
        delta files: their rows pass through per-key LWW resolution (the
        window shuffle touches ONLY those buckets; clean buckets stream
        straight from parquet with zero overhead). Resolution needs the key
        and ``_lsn`` even when the caller prunes them away, so the scan
        schema is widened internally and re-projected after.
        """
        m = self.manifest(version)
        mor = {int(b) for b in m.get("mor_buckets", [])}
        all_buckets = sorted(int(b) for b in m["files"])
        want_buckets = all_buckets if buckets is None else [b for b in all_buckets if b in set(buckets)]
        clean = [b for b in want_buckets if b not in mor]
        delta = [b for b in want_buckets if b in mor]

        phys = self.physical_schema(version)
        user = self.schema(version)
        if include_hidden:
            want = [f.name for f in phys.fields] if columns is None else list(columns)
            out_schema = T.StructType([f for f in phys.fields if f.name in want])
            key = m["key_col"]
            need = set(want) | ({key, LSN_COL} if delta else set())
            if key_filter is not None:
                need.add(key)
            scan_schema = T.StructType([f for f in phys.fields if f.name in need])

            def scan(bs):
                files = self._files(version, bs, file_subset)
                if not files:
                    return None
                df = self.spark.read.schema(scan_schema).parquet(*files)
                if key_in is not None:
                    df = df.where(F.col(key).isin(key_in))
                if key_filter is not None:
                    df = df.join(F.broadcast(key_filter.select(key)), on=key, how="left_semi")
                return df

            parts = []
            c = scan(clean)
            if c is not None:
                parts.append(c)
            if delta:
                d = scan(delta)
                if d is not None:
                    parts.append(self._resolve_lww(d, key))
            if not parts:
                return self.spark.createDataFrame([], out_schema)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out.select(*[F.col(f.name) for f in out_schema.fields])

        # visible read: scan the requested columns + the tombstone marker,
        # filter tombstones (files predating tombstones read NULL = live)
        want = [f.name for f in user.fields] if columns is None else list(columns)
        out_schema = T.StructType([f for f in user.fields if f.name in want])
        key = m["key_col"]
        need = set(want) | {DELETED_COL} | ({key, LSN_COL} if delta else set())
        if key_filter is not None:
            need.add(key)
        read_schema = T.StructType([f for f in phys.fields if f.name in need])

        def scan(bs):
            files = self._files(version, bs, file_subset)
            if not files:
                return None
            df = self.spark.read.schema(read_schema).parquet(*files)
            if key_in is not None:
                df = df.where(F.col(key).isin(key_in))
            if key_filter is not None:
                df = df.join(F.broadcast(key_filter.select(key)), on=key, how="left_semi")
            return df

        parts = []
        c = scan(clean)
        if c is not None:
            parts.append(c)
        if delta:
            d = scan(delta)
            if d is not None:
                parts.append(self._resolve_lww(d, key))
        if not parts:
            return self.spark.createDataFrame([], out_schema)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False))).select(
            *[F.col(f.name) for f in out_schema.fields]
        )

    def lookup(
        self,
        keys: list,
        version: int | None = None,
        include_hidden: bool = False,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """Point reads for an explicit (small) key list.

        Buckets are pure hash-of-key, so the keys' bucket set is computable
        up front: one driver-sized job hashes ``keys`` through the SAME
        ``bucket_expr`` the writer used (never a Python reimplementation of
        Murmur3 — the layout contract lives in one place), then the read
        scans ONLY those buckets with the keys pushed down as a literal
        ``key IN (...)`` predicate — pushed to the parquet scan, so after
        manifest file-skipping (``_skip_files_by_key``) the row-group
        min/max and key bloom filters prune INSIDE the surviving files. At
        10^10 rows / 64k buckets a 10-key lookup reads ~10 buckets' files,
        and of a compacted bucket's key-sorted files typically ONE row
        group. ``keys`` must be driver-small (they are inlined into the
        plan); batch-sized key sets belong in ``read(key_filter=...)`` with
        caller-chosen buckets.
        """
        if not keys:
            return self.read(version=version, buckets=[], include_hidden=include_hidden,
                             columns=columns)
        m = self.manifest(version)
        key = self.key_col
        key_field = next(f for f in self.schema(version).fields if f.name == key)
        kdf = self.spark.createDataFrame(
            [(k,) for k in keys], T.StructType([key_field])
        )
        # Bucket ids must be computed against the SNAPSHOT's layout, not the
        # current one — a rebucket between `version` and HEAD changes both
        # the count and (hypothetically) the function. Unknown bucket_fn →
        # scan every bucket; the key_in predicate still prunes rows.
        if m.get("bucket_fn") == BUCKET_FN:
            buckets = sorted(
                r[0] for r in
                kdf.select(
                    bucket_expr(key, int(m["num_buckets"])).alias("_b")
                ).distinct().collect()
            )
        else:
            buckets = None
        file_subset = self._skip_files_by_key(m, buckets, keys)
        return self.read(
            version=version, buckets=buckets, include_hidden=include_hidden,
            columns=columns, key_in=list(keys), file_subset=file_subset,
        )

    @staticmethod
    def _skip_files_by_key(
        manifest: dict, buckets: list[int] | None, keys: list
    ) -> set[str] | None:
        """Manifest-stats file skipping for a point lookup: keep only files
        whose [min_key, max_key] range could contain one of ``keys``.

        Safe by construction: a file that CONTAINS a wanted key (any version
        of it, tombstones included — they carry the key) necessarily has
        min_key <= key <= max_key, so it is always kept; parquet truncation
        only widens bounds. Files without stats (older snapshots, unreadable
        footers) are kept unconditionally. Returns None (no restriction)
        when the snapshot has no stats at all."""
        stats = manifest.get("file_stats") or {}
        if not stats:
            return None
        import bisect

        try:
            skeys = sorted(keys)
        except TypeError:
            return None  # mixed-type key list: don't risk a bad comparison
        bucket_set = None if buckets is None else set(buckets)
        subset: set[str] = set()
        for b, fl in manifest["files"].items():
            if bucket_set is not None and int(b) not in bucket_set:
                continue
            for f in fl:
                s = stats.get(f)
                lo = s.get("min_key") if s else None
                hi = s.get("max_key") if s else None
                if lo is None or hi is None:
                    subset.add(f)  # no usable bounds: never skip
                    continue
                try:
                    i = bisect.bisect_left(skeys, lo)
                    if i < len(skeys) and skeys[i] <= hi:
                        subset.add(f)
                except TypeError:
                    subset.add(f)  # stats type mismatch: never skip
        return subset

    # -- writes --------------------------------------------------------------

    def _new_data_dir(self, version: int) -> str:
        d = self.fs.join(self.path, DATA_DIR, f"snap-v{version}-{uuid.uuid4().hex[:8]}")
        self.fs.makedirs(d)
        return d

    def write_bucket_files(
        self,
        df: DataFrame,
        version: int,
        cluster: bool = True,
        out_dir: str | None = None,
        sort_within: bool = False,
        max_records_per_file: int | None = None,
        bloom: bool | None = None,
    ) -> tuple[dict[int, list[str]], str]:
        """Write ``df`` (which must carry an int ``_bucket`` column) as one
        dir per bucket under a snapshot data dir; returns
        (bucket -> [relative file paths], out_dir). ``_bucket`` is a path-only
        partition column — not stored in row groups, re-derived from the key.

        ``cluster=True`` repartitions by the table key into ``num_buckets``
        partitions; because the bucket function IS Spark's shuffle hash (see
        ``bucket_expr``), shuffle partition i holds exactly bucket i, so each
        task writes ONE file into one bucket dir. Pass ``cluster=False`` for
        inputs that are already bucket-clustered (rows read back from this
        table's own per-bucket files, or an already-aligned shuffle) — that
        skips shuffling the big side entirely.

        ``sort_within=True`` + ``max_records_per_file`` produce size-bounded
        files with DISJOINT key ranges inside each bucket: rows are sorted by
        key within each task, and ``maxRecordsPerFile`` rolls over a file
        sequentially, so every rolled file holds a contiguous key run (a
        subsequence of a sorted stream is sorted). Combined with per-file
        manifest stats this makes point ``lookup``s skip to one file per
        bucket no matter how large the bucket grows.

        Table property ``write.target_rows_per_file`` applies that pair as
        the default for EVERY write that doesn't size its files explicitly
        (cow bucket rewrites, mor deltas, compaction, vacuum, overwrite,
        rebucket). At 10^10 rows a bucket is tens of GB — one file per
        rewrite means unsplittable multi-GB parquet and an O(bucket) open
        cost per lookup; the property bounds every produced file and keeps
        the sorted-run invariant continuously, not just after compaction.
        An explicit ``max_records_per_file`` argument overrides it.
        """
        if max_records_per_file is None:
            prop = self.properties().get("write.target_rows_per_file")
            if prop:
                max_records_per_file = int(prop)
                # rolled files must stay disjoint key runs, else per-file
                # manifest stats degrade to whole-bucket ranges
                sort_within = True
        if out_dir is None:
            out_dir = self._new_data_dir(version)
        out = df.repartition(self.num_buckets, F.col(self.key_col)) if cluster else df
        if sort_within:
            out = out.sortWithinPartitions(F.col(self.key_col), F.col(LSN_COL))
        writer = out.write.partitionBy("_bucket").mode("append")
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
        if bloom is None:
            bloom = cluster
        if bloom and self.properties().get("write.parquet.bloom.key", True):
            # Key bloom filters on rewrites of long-lived files (compaction,
            # vacuum, rebucket, overwrite): a pushed-down `key IN (...)`
            # lookup then skips row groups whose min/max happen to straddle
            # a probed key. Epoch delta writes default bloom-off (they are
            # small and soon compacted; default follows ``cluster``).
            ndv = max_records_per_file or 1_000_000
            writer = (
                writer.option(f"parquet.bloom.filter.enabled#{self.key_col}", "true")
                .option(f"parquet.bloom.filter.expected.ndv#{self.key_col}", int(ndv))
            )
        writer.parquet(out_dir)
        return self.list_bucket_files(out_dir), out_dir

    def list_bucket_files(self, out_dir: str) -> dict[int, list[str]]:
        """Enumerate the per-bucket parquet files under a snapshot data dir.
        Call once after all writes into the dir (a shared dir accumulates
        files across write calls)."""
        files: dict[int, list[str]] = {}
        for entry in self.fs.listdir(out_dir):
            if not entry.startswith("_bucket="):
                continue
            b = int(entry.split("=", 1)[1])
            bucket_dir = self.fs.join(out_dir, entry)
            rels = [
                self.fs.relpath(self.fs.join(bucket_dir, f), self.path)
                for f in self.fs.listdir(bucket_dir)
                if f.endswith(".parquet")
            ]
            files[b] = sorted(rels)
        return files

    # -- per-file column statistics (Iceberg manifest-stats analogue) --------

    def collect_file_stats(self, rel_paths: list[str]) -> dict[str, dict]:
        """Footer-only per-file stats: ``{rel_path: {min_key, max_key,
        min_lsn, max_lsn, rows}}`` for the key column and the hidden LSN.

        Reads ONLY parquet footers (row-group statistics), never row data —
        O(files), not O(rows) — distributed over executors as a
        ``mapInPandas`` job on the path list, so a backfill over 10^6 files
        on a 100 TB table is a single narrow stage, no shuffle. Parquet
        min/max for strings may be truncated by writers, but the format
        guarantees truncated values remain VALID BOUNDS (truncated max is
        incremented), and UTF-8 byte order equals code-point order, so
        range checks against them are always safe. Files whose footers
        can't be read or lack stats simply get no entry / null bounds —
        stats are an optional accelerant, never a correctness dependency.
        """
        if not rel_paths:
            return {}
        key, lsn = self.key_col, LSN_COL
        abs_to_rel = {self.fs.join(self.path, r): r for r in rel_paths}
        paths_df = self.spark.createDataFrame(
            [(p,) for p in abs_to_rel], T.StructType([T.StructField("path", T.StringType())])
        ).repartition(min(len(abs_to_rel), 64))
        key_type = self.schema()[key].dataType
        out_schema = T.StructType([
            T.StructField("path", T.StringType()),
            T.StructField("min_key", key_type),
            T.StructField("max_key", key_type),
            T.StructField("min_lsn", T.LongType()),
            T.StructField("max_lsn", T.LongType()),
            T.StructField("rows", T.LongType()),
        ])
        key_is_str = isinstance(key_type, T.StringType)

        def footer_stats(batches):
            import pandas as pd
            import pyarrow.parquet as pq

            def norm(v):
                if v is None:
                    return None
                if isinstance(v, bytes):
                    try:
                        v = v.decode("utf-8")
                    except UnicodeDecodeError:
                        return None
                if key_is_str and not isinstance(v, str):
                    return None
                return v

            for pdf in batches:
                rows = []
                for path in pdf["path"]:
                    try:
                        md = pq.ParquetFile(path).metadata
                    except Exception:
                        continue
                    idx = {}
                    for i in range(md.num_columns):
                        idx[md.schema.column(i).name] = i
                    nrows = md.num_rows
                    mins = {key: [], lsn: []}
                    maxs = {key: [], lsn: []}
                    for col, acc_min, acc_max in ((key, mins[key], maxs[key]),
                                                  (lsn, mins[lsn], maxs[lsn])):
                        ci = idx.get(col)
                        ok = ci is not None
                        for rg in range(md.num_row_groups if ok else 0):
                            st = md.row_group(rg).column(ci).statistics
                            if st is None or not st.has_min_max:
                                ok = False
                                break
                            acc_min.append(st.min)
                            acc_max.append(st.max)
                        if not ok:
                            acc_min.clear()
                            acc_max.clear()
                    mk = norm(min(mins[key])) if mins[key] else None
                    xk = norm(max(maxs[key])) if maxs[key] else None
                    ml = int(min(mins[lsn])) if mins[lsn] else None
                    xl = int(max(maxs[lsn])) if maxs[lsn] else None
                    rows.append((path, mk, xk, ml, xl, int(nrows)))
                yield pd.DataFrame(
                    rows, columns=["path", "min_key", "max_key", "min_lsn", "max_lsn", "rows"]
                )

        out = {}
        for r in paths_df.mapInPandas(footer_stats, out_schema).collect():
            out[abs_to_rel[r["path"]]] = {
                "min_key": r["min_key"], "max_key": r["max_key"],
                "min_lsn": r["min_lsn"], "max_lsn": r["max_lsn"],
                "rows": r["rows"],
            }
        return out

    def stats_for_commit(self, new_files_by_bucket: dict[int, list[str]]) -> dict[str, dict] | None:
        """Stats for freshly written files, or None when disabled via the
        table property ``write.file_stats`` (default on). Writers call this
        between ``write_bucket_files`` and ``commit``."""
        if not self.properties().get("write.file_stats", True):
            return None
        rels = [f for fl in new_files_by_bucket.values() for f in fl]
        return self.collect_file_stats(rels) if rels else None

    def analyze(self, version: int | None = None) -> int:
        """Backfill per-file stats for referenced files that lack an entry
        (pre-stats snapshots, disabled writers) as a metadata-only commit.
        Returns the new version (current version if nothing to do)."""
        m = self.manifest(version)
        have = m.get("file_stats", {})
        missing = [f for fl in m["files"].values() for f in fl if f not in have]
        if not missing:
            return self.current_version()
        stats = self.collect_file_stats(missing)
        return self.commit(
            {}, set(),
            summary={"operation": "analyze", "files": len(stats)},
            file_stats_update=stats,
        )

    def commit(
        self,
        new_files_by_bucket: dict[int, list[str]],
        replaced_buckets: set[int],
        schema: T.StructType | None = None,
        properties_update: dict[str, Any] | None = None,
        summary: dict[str, Any] | None = None,
        row_counts_update: dict[int, int] | None = None,
        key_counts_update: dict[int, int] | None = None,
        file_stats_update: dict[str, dict] | None = None,
        append: bool = False,
    ) -> int:
        """Commit a new snapshot: replace files for ``replaced_buckets`` with
        ``new_files_by_bucket``; carry all other buckets forward by reference.
        Manifest + current-pointer writes are atomic (temp file + rename), so
        a crash mid-commit leaves the previous snapshot current and only
        orphans unreferenced data files.

        ``append=True`` is the merge-on-read path: ``new_files_by_bucket``
        are ADDED to each bucket's existing file list (nothing replaced) and
        those buckets are marked in the snapshot's ``mor_buckets`` so readers
        apply LWW resolution. A replace of a bucket (copy-on-write merge,
        compaction, vacuum, overwrite) clears its mor flag — the rewrite
        materializes the resolved state.
        """
        m = self.manifest()
        new_version = m["version"] + 1
        mor = {int(b) for b in m.get("mor_buckets", [])}
        mor -= {int(b) for b in replaced_buckets}
        if append:
            files = dict(m["files"])
            for b, fl in new_files_by_bucket.items():
                if fl:
                    files[str(b)] = files.get(str(b), []) + fl
                    mor.add(int(b))
        else:
            files = {b: f for b, f in m["files"].items() if int(b) not in replaced_buckets}
            for b, fl in new_files_by_bucket.items():
                if fl:
                    files[str(b)] = fl
        props = dict(m["properties"])
        if properties_update:
            props.update(properties_update)
        def _apply_counts(prev: dict[str, int], update: dict[int, int] | None) -> dict[str, int]:
            out = {b: c for b, c in prev.items() if int(b) not in replaced_buckets}
            for b, c in (update or {}).items():
                # an explicit update always wins: in the append (mor) path the
                # bucket's old entry was NOT dropped above, so a count falling
                # to zero must overwrite (pop) it rather than be skipped.
                if c > 0:
                    out[str(b)] = int(c)
                else:
                    out.pop(str(b), None)
            return out

        row_counts = _apply_counts(m.get("row_counts", {}), row_counts_update)
        key_counts = _apply_counts(m.get("key_counts", {}), key_counts_update)
        # Per-file stats follow the file lists exactly: carried forward only
        # for files still referenced (a replaced bucket's old entries drop
        # with its files), updated only for referenced files. Stats are an
        # OPTIONAL accelerant — a file with no entry is simply never skipped.
        referenced = {f for fl in files.values() for f in fl}
        file_stats = {
            f: s for f, s in m.get("file_stats", {}).items() if f in referenced
        }
        for f, s in (file_stats_update or {}).items():
            if f in referenced:
                file_stats[f] = s
        # Change-feed barrier watermark (O(1) fidelity guard): operations
        # that make an incremental diff across them unfaithful — tombstone
        # GC (delete evidence removed) and a full overwrite of a NON-empty
        # table (per-row LSNs reset, watermark monotonicity broken) — stamp
        # their own version; everything else carries the parent's forward.
        # plans.change_feed reads ONLY the endpoint manifest instead of
        # walking every version in the range (10^5 epochs at the 10^10
        # target). rollback() writes its manifest manually and stamps there.
        op_name = (summary or {}).get("operation")
        if op_name == "vacuum_tombstones" or (
            op_name == "overwrite" and any(m.get("row_counts", {}).values())
        ):
            feed_barrier = {"version": new_version, "operation": op_name}
        else:
            feed_barrier = m.get("feed_barrier")
        self._check_format(m)
        manifest = {
            "version": new_version,
            "parent": m["version"],
            "bucket_fn": m.get("bucket_fn"),
            "schema": json.loads(schema.json()) if schema is not None else m["schema"],
            "key_col": m["key_col"],
            "num_buckets": m["num_buckets"],
            "files": files,
            "row_counts": row_counts,
            "key_counts": key_counts,
            "file_stats": file_stats,
            "mor_buckets": sorted(mor),
            "properties": props,
            "summary": summary or {},
            "feed_barrier": feed_barrier,
        }
        self._write_manifest(manifest)
        return new_version

    def alter_schema(self, new_schema: T.StructType, changes: list[dict[str, str]]) -> int:
        """ALTER-before-MERGE: commit a metadata-only snapshot carrying the
        evolved schema. No data files move."""
        m = self.manifest()
        return self.commit(
            {},
            set(),
            schema=new_schema,
            summary={"operation": "alter", "changes": changes, "parent": m["version"]},
        )

    def overwrite_full(self, df: DataFrame, lineage: str = "bootstrap") -> int:
        """Full-table overwrite (CREATE TABLE AS SELECT analogue, reference
        S4/S6). ``df`` must match the table schema; hidden cols are added."""
        key = self.key_col
        out = conform_to_schema(df, self.schema())
        if LSN_COL not in df.columns:
            # -1, not 0: the MERGE matrix applies an event only when its lsn
            # is STRICTLY greater than the resident row's, and change logs
            # may legitimately start at lsn 0 — a bootstrap stamped 0 would
            # silently win a tie against the log's first event
            # (found by tests/test_property.py).
            out = out.withColumn(LSN_COL, F.lit(-1).cast("long"))
        else:
            out = out.withColumn(LSN_COL, df[LSN_COL])
        out = out.withColumn(LINEAGE_COL, F.lit(lineage))
        out = out.withColumn(DELETED_COL, F.lit(False))
        out = out.withColumn("_bucket", bucket_expr(key, self.num_buckets))
        version = self.current_version() + 1
        new_files, _ = self.write_bucket_files(out, version)
        # per-bucket row counts (cheap: re-read only the key column)
        all_files = [self.fs.join(self.path, f) for fl in new_files.values() for f in fl]
        counts: dict[int, int] = {}
        if all_files:
            key_only = T.StructType([self.schema()[key]])
            cnt = (
                self.spark.read.schema(key_only)
                .parquet(*all_files)
                .groupBy(bucket_expr(key, self.num_buckets).alias("_b"))
                .count()
                .collect()
            )
            counts = {r["_b"]: r["count"] for r in cnt}
        return self.commit(
            new_files,
            replaced_buckets=set(range(self.num_buckets)),
            summary={"operation": "overwrite"},
            row_counts_update=counts,
            key_counts_update=counts,  # bootstrap: one row per key, no tombstones
            file_stats_update=self.stats_for_commit(new_files),
        )

    # -- maintenance ---------------------------------------------------------

    def rollback(self, version: int) -> int:
        """Roll the table back to an earlier snapshot by committing a NEW
        snapshot that references ``version``'s files/schema/properties
        (Iceberg's ``rollback_to_snapshot``). History is preserved — the
        bad snapshots stay readable until ``expire_snapshots`` GCs them —
        and the operation is itself just an atomic manifest commit."""
        owner = self.acquire_writer_lease()
        try:
            target = self.manifest(version)
            self._check_format(target)
            cur = self.manifest()
            manifest = {
                "version": cur["version"] + 1,
                "parent": cur["version"],
                "bucket_fn": target.get("bucket_fn"),
                "schema": target["schema"],
                "key_col": target["key_col"],
                "num_buckets": target["num_buckets"],
                "files": target["files"],
                "row_counts": target.get("row_counts", {}),
                "key_counts": target.get("key_counts", {}),
                "mor_buckets": target.get("mor_buckets", []),
                "properties": target["properties"],
                "summary": {"operation": "rollback", "to": version},
                # history rewrite: LSNs are non-monotone across this commit,
                # so it is a change-feed barrier (see commit())
                "feed_barrier": {
                    "version": cur["version"] + 1, "operation": "rollback",
                },
            }
            self._write_manifest(manifest)
            # un-stamp ledger epochs committed after the rollback target so
            # their batches re-apply on resume (the legacy property map rolls
            # back implicitly with the target's properties)
            d = self._epoch_dir()
            if self.fs.exists(d):
                for name in self.fs.listdir(d):
                    if not name.endswith(".json"):
                        continue
                    p = self.fs.join(d, name)
                    if json.loads(self.fs.read_text(p)).get("version", 0) > version:
                        self.fs.remove(p)
            return manifest["version"]
        finally:
            self.release_writer_lease(owner)

    # -- epoch ledger --------------------------------------------------------
    #
    # Exactly-once bookkeeping lives in an append-only ledger (one tiny JSON
    # file per applied epoch), NOT in the manifest: embedding the applied-
    # epoch map in every snapshot makes each commit rewrite O(all epochs ever
    # applied) bytes of metadata — a serial fraction that grows without bound
    # over a table's lifetime (10^5 epochs at the 10^10-event target). With
    # the ledger, commit metadata stays O(buckets) forever and the applied
    # check is a single existence probe.
    #
    # Stamp ordering is commit-then-stamp (both under the writer lease): a
    # crash in between leaves the epoch unstamped, so it re-applies on
    # resume — harmless by construction, because re-applying an epoch whose
    # rows already carry their LSNs classifies every row `stale` under LWW
    # (cow) / resolves to the identical winner (mor). At-least-once stamping
    # + idempotent apply = exactly-once table state.

    def _epoch_dir(self) -> str:
        return self._meta_path("epochs")

    def _epoch_path(self, epoch: str) -> str:
        # content-hashed filename: epoch ids are arbitrary strings (file
        # names, lsn ranges) and must not meet filesystem naming rules
        h = hashlib.sha1(epoch.encode("utf-8")).hexdigest()[:20]
        return self.fs.join(self._epoch_dir(), f"e-{h}.json")

    def stamp_epoch(
        self, epoch: str, last_lsn: int, metrics: dict[str, Any], version: int
    ) -> None:
        """Record ``epoch`` as applied (ledger write; see ordering note
        above). ``version`` is the snapshot the epoch committed — rollback
        uses it to un-stamp epochs applied after the rollback target."""
        d = self._epoch_dir()
        if not self.fs.exists(d):
            self.fs.makedirs(d)
        self.fs.write_text_atomic(
            self._epoch_path(epoch),
            json.dumps(
                {"epoch": epoch, "version": int(version),
                 "last_lsn": int(last_lsn), "metrics": metrics}
            ),
        )

    def is_epoch_applied(self, epoch: str) -> bool:
        if self.fs.exists(self._epoch_path(epoch)):
            return True
        # legacy tables (pre-ledger) carried the map in manifest properties
        return epoch in self.properties().get("applied_epochs", {})

    def applied_epochs(self) -> dict[str, Any]:
        """The checkpoint store's view of applied epochs:
        ``{epoch: {last_lsn, metrics}}`` (north rule: per-partition lineage +
        metrics persisted so replay resumes mid-stream). O(epochs) metadata
        read — an operator/debug surface, never on the ingest hot path
        (``is_epoch_applied`` is the O(1) probe merges use)."""
        out = dict(self.properties().get("applied_epochs", {}))  # legacy
        d = self._epoch_dir()
        if self.fs.exists(d):
            for name in self.fs.listdir(d):
                if not name.endswith(".json"):
                    continue
                rec = json.loads(self.fs.read_text(self.fs.join(d, name)))
                out[rec["epoch"]] = {
                    "last_lsn": rec.get("last_lsn", -1),
                    "metrics": rec.get("metrics", {}),
                }
        return out

    def metrics_df(self) -> DataFrame:
        """Applied-epoch metrics as a DataFrame ``(epoch, last_lsn,
        events_seen, events_applied, conflicts_resolved, bytes_written, ...)``
        — the queryable form of the manifest's metrics store."""
        rows = []
        for epoch, rec in self.applied_epochs().items():
            m = rec.get("metrics", {})
            rows.append(
                {
                    "epoch": epoch,
                    "last_lsn": int(rec.get("last_lsn", -1)),
                    **{k: int(v) for k, v in m.items() if isinstance(v, (int, float))},
                }
            )
        if not rows:
            return self.spark.createDataFrame(
                [], "epoch string, last_lsn long, events_seen long, events_applied long"
            )
        return self.spark.createDataFrame(rows)

    def expire_snapshots(self, keep_last: int = 2) -> list[str]:
        """Delete data files referenced only by expired snapshots (GC)."""
        current = self.current_version()
        keep_versions = set(range(max(0, current - keep_last + 1), current + 1))
        live: set[str] = set()
        all_versions = [
            int(f[1:-5])
            for f in self.fs.listdir(self.fs.join(self.path, METADATA_DIR))
            if f.startswith("v") and f.endswith(".json")
        ]
        for v in keep_versions:
            for fl in self.manifest(v)["files"].values():
                live.update(fl)
        removed: list[str] = []
        for v in sorted(all_versions):
            if v in keep_versions:
                continue
            for fl in self.manifest(v)["files"].values():
                for f in fl:
                    if f not in live:
                        p = self.fs.join(self.path, f)
                        if self.fs.exists(p):
                            self.fs.remove(p)
                            removed.append(f)
            self.fs.remove(self._meta_path(f"v{v}.json"))
        return removed

    def remove_orphan_files(self) -> list[str]:
        """Delete data files NO snapshot references — the leftovers of a
        writer that crashed after writing parquet but before its manifest
        commit (Iceberg's ``remove_orphan_files`` action; ``expire_snapshots``
        only GCs files that once WERE referenced).

        Safety without mtimes (the ``FileSystem`` seam has none): data dirs
        are stamped with the writer's target version at creation
        (``_new_data_dir`` → ``data/snap-v{V}-{uuid}``), and the table is
        single-writer under the lease this method itself holds — so any
        ``snap-v{V}`` dir with ``V < current_version()`` that no existing
        manifest references belongs to a dead writer: its author would have
        committed AT ``V`` (or later), and a commit landing after it would
        have referenced its files. Dirs stamped at the CURRENT version are
        skipped — a just-crashed writer's dir parks there until the next
        successful commit bumps the version, at which point it becomes
        collectable. Merge scratch dirs are a different lifecycle
        (``plans.merge._sweep_stale_scratch``) and are left alone.

        O(listing): reads manifests and directory listings only, never row
        data. Returns the removed manifest-relative paths.
        """
        owner = self.acquire_writer_lease()
        try:
            current = self.current_version()
            referenced: set[str] = set()
            meta_dir = self.fs.join(self.path, METADATA_DIR)
            for name in self.fs.listdir(meta_dir):
                if name.startswith("v") and name.endswith(".json"):
                    for fl in self.manifest(int(name[1:-5]))["files"].values():
                        referenced.update(fl)
            removed: list[str] = []
            data_root = self.fs.join(self.path, DATA_DIR)
            if not self.fs.isdir(data_root):
                return removed
            for entry in self.fs.listdir(data_root):
                if not entry.startswith("snap-v"):
                    continue
                try:
                    ver = int(entry.split("-")[1][1:])
                except (IndexError, ValueError):
                    continue
                if ver >= current:
                    continue  # possibly an in-flight write toward current+1
                snap_dir = self.fs.join(data_root, entry)
                live = 0
                for sub in list(self.fs.listdir(snap_dir)):
                    subp = self.fs.join(snap_dir, sub)
                    if not (sub.startswith("_bucket=") and self.fs.isdir(subp)):
                        continue
                    for f in list(self.fs.listdir(subp)):
                        if not f.endswith(".parquet"):
                            continue
                        p = self.fs.join(subp, f)
                        rel = self.fs.relpath(p, self.path)
                        if rel in referenced:
                            live += 1
                        else:
                            self.fs.remove(p)
                            removed.append(rel)
                    if not any(
                        x.endswith(".parquet") for x in self.fs.listdir(subp)
                    ):
                        self.fs.rmtree(subp)
                if live == 0 and not any(
                    s.startswith("_bucket=") for s in self.fs.listdir(snap_dir)
                ):
                    self.fs.rmtree(snap_dir)  # fully orphaned write: drop markers too
            return removed
        finally:
            self.release_writer_lease(owner)
