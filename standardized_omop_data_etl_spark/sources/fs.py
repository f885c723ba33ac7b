"""Filesystem seam for the lake's metadata/file operations.

Every path operation the lake layer performs (manifest reads/writes, atomic
pointer flips, scratch/bucket-dir listing, GC deletes) goes through ONE
interface so the local-disk implementation can be swapped for an object-store
/ Hadoop-FS implementation without touching table logic. On the stated
deployment target (multi-executor cluster over object storage) raw ``os.*``
calls in table code are a blocker — they only see the driver's local disk.

Implementations:

* ``LocalFileSystem`` — os/shutil based, ships here; atomicity from
  ``os.replace`` and ``O_CREAT|O_EXCL``.
* an fsspec/Hadoop-FS implementation plugs in by subclassing ``FileSystem``:
  - ``write_text_atomic`` maps to S3 conditional PUT (If-None-Match) or a
    rename on HDFS;
  - ``create_exclusive`` (the writer-lease primitive) maps to S3
    ``If-None-Match: *`` conditional create / HDFS ``create(overwrite=false)``
    — the same primitives Iceberg's object-store catalogs use for commits.

Only the DRIVER uses this seam (manifest + listing are driver-side, O(buckets)
metadata); executors read/write data files through Spark's own Hadoop FS layer
via the paths this seam hands out.
"""

from __future__ import annotations

import os
import shutil
import uuid


class FileSystem:
    """Abstract path operations for lake metadata and file layout."""

    # -- path algebra (pure string ops, but dialect-specific: URIs vs posix)
    def join(self, *parts: str) -> str:
        raise NotImplementedError

    def abspath(self, path: str) -> str:
        raise NotImplementedError

    def relpath(self, path: str, start: str) -> str:
        raise NotImplementedError

    # -- queries
    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def isdir(self, path: str) -> bool:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        raise NotImplementedError

    def getsize(self, path: str) -> int:
        raise NotImplementedError

    # -- mutations
    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def write_text_atomic(self, path: str, payload: str) -> None:
        """All-or-nothing replace: readers must never observe a partial file."""
        raise NotImplementedError

    def create_exclusive(self, path: str, payload: str) -> bool:
        """Create-if-absent (the lease/lock primitive). Returns False when the
        path already exists; must be atomic against concurrent creators."""
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError

    def rmtree(self, path: str) -> None:
        raise NotImplementedError


class LocalFileSystem(FileSystem):
    def join(self, *parts: str) -> str:
        return os.path.join(*parts)

    def abspath(self, path: str) -> str:
        return os.path.abspath(path)

    def relpath(self, path: str, start: str) -> str:
        return os.path.relpath(path, start)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def getsize(self, path: str) -> int:
        return os.path.getsize(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path: str, payload: str) -> None:
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def create_exclusive(self, path: str, payload: str) -> bool:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        return True

    def remove(self, path: str) -> None:
        if os.path.exists(path):
            os.remove(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)
