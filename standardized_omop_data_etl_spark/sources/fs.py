"""Filesystem seam for the lake's metadata/file operations.

Every path operation the lake layer performs (manifest reads/writes, atomic
pointer flips, scratch/bucket-dir listing, GC deletes) goes through ONE
interface so the local-disk implementation can be swapped for an object-store
/ Hadoop-FS implementation without touching table logic. On the stated
deployment target (multi-executor cluster over object storage) raw ``os.*``
calls in table code are a blocker — they only see the driver's local disk.

Implementations:

* ``LocalFileSystem`` — os/shutil based; atomicity from ``os.replace`` and
  ``O_CREAT|O_EXCL``; compare-and-swap from an ``fcntl.flock`` sidecar lock.
* ``FsspecFileSystem`` — adapter over any fsspec-compatible filesystem
  (s3fs, gcsfs, adlfs, HadoopFileSystem via ``fsspec``): the object-store
  deployment path. ``write_text_atomic`` maps to a single PUT (object stores
  guarantee all-or-nothing object visibility); ``create_exclusive`` /
  ``replace_if_equals`` map to conditional writes (S3 ``If-None-Match: *`` /
  ``If-Match: <etag>``, GCS ``ifGenerationMatch``) — the same primitives
  Iceberg's object-store catalogs use for commits. The fsspec package is not
  bundled in every environment, so the adapter is duck-typed: anything
  exposing the fsspec method surface plugs in (tests use an in-process fake).
* ``InMemoryFileSystem`` — dict-backed, thread-safe, true atomic CAS. For
  protocol-level unit tests (lease contention, manifest races) that don't
  involve Spark data files.
* ``FaultInjectingFileSystem`` — wraps any implementation with per-operation
  hooks (delays, injected failures, call logs) to force crash/interleaving
  schedules deterministically in tests.

Only the DRIVER uses this seam (manifest + listing are driver-side, O(buckets)
metadata); executors read/write data files through Spark's own Hadoop FS layer
via the paths this seam hands out.
"""

from __future__ import annotations

import os
import posixpath
import shutil
import threading
import uuid
from typing import Any, Callable


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

    def replace_if_equals(self, path: str, expected: str, payload: str) -> bool:
        """Atomic compare-and-swap: replace the file's content with ``payload``
        only if its current content is exactly ``expected``. Returns True on
        success, False if the content differed or the file was gone. This is
        the fenced-takeover primitive for the writer lease: two takeover
        attempts racing on the same observed stale content can never both
        succeed. Maps to S3 ``If-Match: <etag>`` / GCS ``ifGenerationMatch``
        conditional PUT on object stores; locally it is serialized by a
        sidecar flock."""
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

    def replace_if_equals(self, path: str, expected: str, payload: str) -> bool:
        """CAS serialized by an flock on a sidecar ``.caslock`` file: every
        local-host contender (process or thread) must win the same kernel lock
        before the read-compare-replace, so exactly one of two racing takeovers
        can observe the expected content. (POSIX has no native conditional
        replace; the sidecar lives next to the lease and is never cleaned up —
        one inode per table, like the lease itself.)"""
        import fcntl

        lockpath = f"{path}.caslock"
        lock_fd = os.open(lockpath, os.O_CREAT | os.O_WRONLY)
        try:
            fcntl.flock(lock_fd, fcntl.LOCK_EX)
            try:
                with open(path) as f:
                    current = f.read()
            except FileNotFoundError:
                return False
            if current != expected:
                return False
            self.write_text_atomic(path, payload)
            return True
        finally:
            os.close(lock_fd)  # releases the flock

    def remove(self, path: str) -> None:
        if os.path.exists(path):
            os.remove(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)


class InMemoryFileSystem(FileSystem):
    """Dict-backed filesystem with genuinely atomic create/CAS under one lock.

    For protocol-level tests (lease contention, pointer-flip crashes) that
    never hand paths to Spark — data files need a real filesystem, metadata
    does not. Directories are implicit (any proper path prefix of a stored
    file), mirroring object-store semantics where "directories" are listing
    illusions.
    """

    def __init__(self) -> None:
        self._files: dict[str, str] = {}
        self._lock = threading.Lock()

    def join(self, *parts: str) -> str:
        return posixpath.join(*parts)

    def abspath(self, path: str) -> str:
        return path if path.startswith("/") else "/" + path

    def relpath(self, path: str, start: str) -> str:
        return posixpath.relpath(path, start)

    def exists(self, path: str) -> bool:
        with self._lock:
            return path in self._files or self._isdir_locked(path)

    def _isdir_locked(self, path: str) -> bool:
        prefix = path.rstrip("/") + "/"
        return any(k.startswith(prefix) for k in self._files)

    def isdir(self, path: str) -> bool:
        with self._lock:
            return self._isdir_locked(path)

    def listdir(self, path: str) -> list[str]:
        prefix = path.rstrip("/") + "/"
        with self._lock:
            names = {
                k[len(prefix):].split("/", 1)[0]
                for k in self._files
                if k.startswith(prefix)
            }
        return sorted(names)

    def getsize(self, path: str) -> int:
        with self._lock:
            return len(self._files[path].encode())

    def makedirs(self, path: str) -> None:
        pass  # implicit directories

    def read_text(self, path: str) -> str:
        with self._lock:
            try:
                return self._files[path]
            except KeyError:
                raise FileNotFoundError(path) from None

    def write_text_atomic(self, path: str, payload: str) -> None:
        with self._lock:
            self._files[path] = payload

    def create_exclusive(self, path: str, payload: str) -> bool:
        with self._lock:
            if path in self._files:
                return False
            self._files[path] = payload
            return True

    def replace_if_equals(self, path: str, expected: str, payload: str) -> bool:
        with self._lock:
            if self._files.get(path) != expected:
                return False
            self._files[path] = payload
            return True

    def remove(self, path: str) -> None:
        with self._lock:
            self._files.pop(path, None)

    def rmtree(self, path: str) -> None:
        prefix = path.rstrip("/") + "/"
        with self._lock:
            for k in [k for k in self._files if k.startswith(prefix) or k == path]:
                del self._files[k]


class FaultInjectingFileSystem(FileSystem):
    """Pass-through wrapper with a ``hook(op, path)`` called before every
    operation. The hook can sleep (to force interleavings), raise (to simulate
    crashes/outages at an exact point), or record. ``calls`` logs every
    (op, path) for assertions."""

    def __init__(self, inner: FileSystem, hook: Callable[[str, str], None] | None = None):
        self.inner = inner
        self.hook = hook
        self.calls: list[tuple[str, str]] = []

    def _enter(self, op: str, path: str) -> None:
        self.calls.append((op, path))
        if self.hook is not None:
            self.hook(op, path)

    def join(self, *parts: str) -> str:
        return self.inner.join(*parts)

    def abspath(self, path: str) -> str:
        return self.inner.abspath(path)

    def relpath(self, path: str, start: str) -> str:
        return self.inner.relpath(path, start)

    def exists(self, path: str) -> bool:
        self._enter("exists", path)
        return self.inner.exists(path)

    def isdir(self, path: str) -> bool:
        self._enter("isdir", path)
        return self.inner.isdir(path)

    def listdir(self, path: str) -> list[str]:
        self._enter("listdir", path)
        return self.inner.listdir(path)

    def getsize(self, path: str) -> int:
        self._enter("getsize", path)
        return self.inner.getsize(path)

    def makedirs(self, path: str) -> None:
        self._enter("makedirs", path)
        self.inner.makedirs(path)

    def read_text(self, path: str) -> str:
        self._enter("read_text", path)
        return self.inner.read_text(path)

    def write_text_atomic(self, path: str, payload: str) -> None:
        self._enter("write_text_atomic", path)
        self.inner.write_text_atomic(path, payload)

    def create_exclusive(self, path: str, payload: str) -> bool:
        self._enter("create_exclusive", path)
        return self.inner.create_exclusive(path, payload)

    def replace_if_equals(self, path: str, expected: str, payload: str) -> bool:
        self._enter("replace_if_equals", path)
        return self.inner.replace_if_equals(path, expected, payload)

    def remove(self, path: str) -> None:
        self._enter("remove", path)
        self.inner.remove(path)

    def rmtree(self, path: str) -> None:
        self._enter("rmtree", path)
        self.inner.rmtree(path)


class FsspecFileSystem(FileSystem):
    """Object-store adapter over any fsspec-compatible filesystem object.

    ``fs`` is duck-typed against the public fsspec ``AbstractFileSystem``
    surface (``exists/isdir/ls/size/makedirs/cat_file/pipe_file/rm_file/rm``);
    construct with ``FsspecFileSystem.for_protocol("s3")`` when the fsspec
    package is installed, or pass any object exposing those methods (tests use
    an in-process fake).

    Concurrency-primitive mapping (what makes the lease protocol hold on a
    real object store):

    * ``write_text_atomic`` → one PUT. Object stores guarantee readers see
      either the whole previous object or the whole new one, never a partial
      — the property ``LocalFileSystem`` gets from write-temp+rename.
    * ``create_exclusive`` → conditional create. S3 (since 2024) and GCS
      support ``If-None-Match: *`` / ``ifGenerationMatch=0``; fsspec does not
      expose a portable flag for it yet, so the adapter calls the underlying
      fs's ``pipe_file(path, data, mode="create")`` when available (s3fs
      ≥2024.10 maps this to If-None-Match) and otherwise falls back to
      exists+PUT, which is only safe behind an external lock service — the
      fallback is reported via ``supports_conditional_writes``.
    * ``replace_if_equals`` → read, compare, conditional PUT keyed on the
      object's current ETag/generation when the fs exposes it; else
      exists-compare+PUT under the same caveat.

    ``posixpath`` handles URI-style keys (no ``os.sep`` dependence).
    """

    def __init__(self, fs: Any, strict_conditional: bool = False):
        self.fs = fs
        self.strict_conditional = strict_conditional

    @classmethod
    def for_protocol(cls, protocol: str, **storage_options: Any) -> "FsspecFileSystem":
        try:
            import fsspec  # type: ignore
        except ImportError as e:  # pragma: no cover - fsspec not bundled here
            raise ImportError(
                "FsspecFileSystem.for_protocol requires the fsspec package "
                "(pip install fsspec s3fs/gcsfs/adlfs as appropriate)"
            ) from e
        return cls(fsspec.filesystem(protocol, **storage_options))

    @property
    def supports_conditional_writes(self) -> bool:
        return hasattr(self.fs, "pipe_file") and _accepts_mode(self.fs.pipe_file)

    def join(self, *parts: str) -> str:
        return posixpath.join(*parts)

    def abspath(self, path: str) -> str:
        return path  # bucket/key paths are already absolute

    def relpath(self, path: str, start: str) -> str:
        return posixpath.relpath(path, start)

    def exists(self, path: str) -> bool:
        return bool(self.fs.exists(path))

    def isdir(self, path: str) -> bool:
        return bool(self.fs.isdir(path))

    def listdir(self, path: str) -> list[str]:
        return sorted(
            posixpath.basename(p.rstrip("/")) for p in self.fs.ls(path, detail=False)
        )

    def getsize(self, path: str) -> int:
        return int(self.fs.size(path))

    def makedirs(self, path: str) -> None:
        # object stores have no real directories; create best-effort markers
        try:
            self.fs.makedirs(path, exist_ok=True)
        except (NotImplementedError, FileExistsError):
            pass

    def read_text(self, path: str) -> str:
        return self.fs.cat_file(path).decode()

    def write_text_atomic(self, path: str, payload: str) -> None:
        self.fs.pipe_file(path, payload.encode())  # single PUT: all-or-nothing

    def create_exclusive(self, path: str, payload: str) -> bool:
        if self.supports_conditional_writes:
            try:
                self.fs.pipe_file(path, payload.encode(), mode="create")
                return True
            except FileExistsError:
                return False
        if self.strict_conditional:
            raise NotImplementedError(
                "underlying filesystem lacks conditional-create; the writer "
                "lease is unsafe without it (pass strict_conditional=False "
                "only behind an external lock service)"
            )
        if self.fs.exists(path):
            return False
        self.fs.pipe_file(path, payload.encode())
        return True

    def replace_if_equals(self, path: str, expected: str, payload: str) -> bool:
        if hasattr(self.fs, "replace_if_equals"):  # native CAS (fakes, futures)
            return bool(self.fs.replace_if_equals(path, expected.encode(), payload.encode()))
        if self.strict_conditional:
            raise NotImplementedError(
                "underlying filesystem lacks conditional-replace (If-Match); "
                "lease takeover is unsafe without it"
            )
        try:
            current = self.fs.cat_file(path)
        except FileNotFoundError:
            return False
        if current != expected.encode():
            return False
        self.fs.pipe_file(path, payload.encode())
        return True

    def remove(self, path: str) -> None:
        try:
            self.fs.rm_file(path)
        except FileNotFoundError:
            pass

    def rmtree(self, path: str) -> None:
        try:
            self.fs.rm(path, recursive=True)
        except FileNotFoundError:
            pass


def _accepts_mode(fn: Callable[..., Any]) -> bool:
    import inspect

    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return False
    return "mode" in sig.parameters or any(
        p.kind is inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values()
    )
