"""Vendored contract replica of fsspec's ``MemoryFileSystem``.

The sandbox doesn't ship the ``fsspec`` package, so this replicates the
PUBLIC, documented behavior of ``fsspec.implementations.memory
.MemoryFileSystem`` for exactly the method surface
``sources.fs.FsspecFileSystem`` calls — so the adapter is exercised against
real-fsspec semantics rather than a convenience fake:

* ``_strip_protocol``: ``memory://a/b`` → ``/a/b``; bare paths gain a
  leading slash; trailing slashes are stripped (fsspec AbstractFileSystem
  behavior).
* ``ls(path, detail=False)`` returns FULL normalized paths (not basenames),
  including directory pseudo-entries, sorted.
* ``cat_file`` / ``size`` / ``rm_file`` raise ``FileNotFoundError`` on
  missing paths.
* ``makedirs(path, exist_ok=False)`` raises ``FileExistsError`` when the
  directory exists and ``exist_ok`` is false.
* ``rm(path, recursive=True)`` removes a subtree; non-recursive ``rm`` on a
  directory fails.
* ``pipe_file(path, value, mode="overwrite")``: fsspec ≥2024.10 supports
  ``mode="create"`` raising ``FileExistsError`` when the object exists (the
  S3 ``If-None-Match: *`` / GCS ``ifGenerationMatch=0`` conditional-create
  mapping; MemoryFileSystem implements it in-process). There is NO
  conditional-replace (If-Match) surface — exactly like real
  MemoryFileSystem — so the adapter's ``replace_if_equals`` must take its
  read-compare-PUT fallback (or raise under ``strict_conditional``).

Unlike ``tests.test_fs.FakeFsspec`` (disk-backed so Spark can share the
paths), this is pure-memory: it can host the lake's METADATA traffic and the
lease protocol, which is the part of the seam whose concurrency semantics
depend on backend fidelity.
"""

from __future__ import annotations

import posixpath
import threading


class VendoredMemoryFileSystem:
    protocol = "memory"

    def __init__(self) -> None:
        self.store: dict[str, bytes] = {}
        self.pseudo_dirs: set[str] = {"/"}
        self._lock = threading.Lock()

    # -- path handling (AbstractFileSystem._strip_protocol behavior) --------

    def _strip_protocol(self, path: str) -> str:
        if path.startswith("memory://"):
            path = path[len("memory://"):]
        elif path.startswith("memory:"):
            path = path[len("memory:"):]
        if not path.startswith("/"):
            path = "/" + path
        path = posixpath.normpath(path)
        return path if path != "." else "/"

    # -- queries -------------------------------------------------------------

    def exists(self, path: str) -> bool:
        p = self._strip_protocol(path)
        with self._lock:
            return p in self.store or self._isdir_locked(p)

    def _isdir_locked(self, p: str) -> bool:
        if p in self.pseudo_dirs:
            return True
        prefix = p.rstrip("/") + "/"
        return any(k.startswith(prefix) for k in self.store) or any(
            d.startswith(prefix) for d in self.pseudo_dirs
        )

    def isdir(self, path: str) -> bool:
        with self._lock:
            return self._isdir_locked(self._strip_protocol(path))

    def ls(self, path: str, detail: bool = False):
        p = self._strip_protocol(path)
        with self._lock:
            if p in self.store:
                entries = [p]
            else:
                prefix = p.rstrip("/") + "/" if p != "/" else "/"
                names = set()
                for k in list(self.store) + list(self.pseudo_dirs):
                    if k != p and k.startswith(prefix):
                        names.add(prefix + k[len(prefix):].split("/", 1)[0])
                entries = sorted(names)
        if detail:
            return [
                {"name": e, "type": "file" if e in self.store else "directory",
                 "size": len(self.store.get(e, b""))}
                for e in entries
            ]
        return entries

    def size(self, path: str) -> int:
        p = self._strip_protocol(path)
        with self._lock:
            if p not in self.store:
                raise FileNotFoundError(path)
            return len(self.store[p])

    # -- mutations -----------------------------------------------------------

    def makedirs(self, path: str, exist_ok: bool = False) -> None:
        p = self._strip_protocol(path)
        with self._lock:
            if self._isdir_locked(p):
                if not exist_ok:
                    raise FileExistsError(path)
                return
            parts = p.strip("/").split("/")
            for i in range(1, len(parts) + 1):
                self.pseudo_dirs.add("/" + "/".join(parts[:i]))

    def cat_file(self, path: str) -> bytes:
        p = self._strip_protocol(path)
        with self._lock:
            if p not in self.store:
                raise FileNotFoundError(path)
            return self.store[p]

    def pipe_file(self, path: str, value: bytes, mode: str = "overwrite") -> None:
        p = self._strip_protocol(path)
        with self._lock:
            if mode == "create" and p in self.store:
                raise FileExistsError(path)
            self.store[p] = bytes(value)

    def rm_file(self, path: str) -> None:
        p = self._strip_protocol(path)
        with self._lock:
            if p not in self.store:
                raise FileNotFoundError(path)
            del self.store[p]

    def rm(self, path: str, recursive: bool = False) -> None:
        p = self._strip_protocol(path)
        with self._lock:
            if p in self.store:
                del self.store[p]
                return
            if not self._isdir_locked(p):
                raise FileNotFoundError(path)
            if not recursive:
                raise IsADirectoryError(path)
            prefix = p.rstrip("/") + "/"
            for k in [k for k in self.store if k.startswith(prefix)]:
                del self.store[k]
            self.pseudo_dirs = {
                d for d in self.pseudo_dirs if not (d == p or d.startswith(prefix))
            }


class BareFsspec(VendoredMemoryFileSystem):
    """A backend WITHOUT conditional-create support (pre-2024 s3fs shape):
    ``pipe_file`` accepts no ``mode`` — the adapter must detect that and
    refuse lease operations under ``strict_conditional=True``."""

    def pipe_file(self, path: str, value: bytes) -> None:  # no mode kwarg
        super().pipe_file(path, value)
