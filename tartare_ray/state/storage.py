"""Pluggable metadata-storage backend for the exactly-once state layer.

The manifest protocol (state/manifest.py) needs exactly four
primitives from whatever stores its small metadata objects
(manifests, CURRENT, GENERATION, consumer cursors):

1. ``write_atomic(key, data)`` — all-or-nothing publish: a reader
   sees the old bytes or the new bytes, never a prefix.
2. ``cas(key, data, expected)`` — conditional put: succeed only if
   the key's current value is ``expected`` (``None`` = key must not
   exist).  This is the commit primitive: CURRENT only ever moves
   from the parent epoch to the child, so a lost-update race between
   two writers is detected at the swap instead of silently dropping
   an epoch.  S3 offers this natively (If-Match / If-None-Match
   conditional writes); POSIX builds it from a lock + rename.
3. ``lease(name)`` — an exclusive writer lease scoped to the table
   (flock on POSIX; a lease row / lock object elsewhere).
4. ``list / read_text / exists / delete`` — enumeration + point reads
   of committed metadata.

``PosixStorage`` is the default (single node or any shared POSIX
filesystem — NFS/Lustre across a multi-node Ray cluster).
``MemoryStorage`` is the in-process reference implementation with
native conditional-put semantics; it exists so the contract test
(tests/test_storage_contract.py) pins the EXACT semantics a future
object-store backend must provide — the multi-node story is "implement
these seven methods against S3 conditional writes", not "mount NFS".

The DATA plane (partition parquet files) deliberately stays on
path-addressed storage: files are immutable, content/deterministically
named, and written tmp+rename by Ray tasks — any store with atomic
single-object publish works, and nothing below needs list-after-write
consistency (readers only open files a committed manifest names).

tartare keeps this state in MongoDB documents `[UNVERIFIED — empty
checkout, SURVEY.md §0]`; the two-phase file commit replaces Mongo's
single-document atomicity.
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

from .lock import ConcurrentWriterError


class Storage:
    """Interface; see module docstring for the contract.  Keys are
    '/'-separated paths relative to the storage root."""

    def list(self, prefix: str) -> list[str]:
        """Keys under ``prefix`` (non-recursive, sorted basenames)."""
        raise NotImplementedError

    def read_text(self, key: str) -> str:
        """Raises FileNotFoundError on a missing key."""
        raise NotImplementedError

    def exists(self, key: str) -> bool:
        raise NotImplementedError

    def write_atomic(self, key: str, data: str) -> None:
        raise NotImplementedError

    def cas(self, key: str, data: str, expected: str | None) -> bool:
        """Conditional put.  ``expected=None`` = create-if-absent.
        Returns False (and changes nothing) when the current value
        does not match."""
        raise NotImplementedError

    def delete(self, key: str) -> bool:
        """True if the key existed."""
        raise NotImplementedError

    @contextmanager
    def lease(self, name: str = "LOCK"):
        """Exclusive writer lease; raises ConcurrentWriterError if
        another holder is live."""
        raise NotImplementedError
        yield  # pragma: no cover


class PosixStorage(Storage):
    """Default backend: a directory tree on a (possibly shared) POSIX
    filesystem.  write_atomic = tmp + fsync + rename; cas serializes
    through a per-root flock then renames, so it is atomic against
    other PosixStorage users of the same root (the same cooperation
    scope as the writer lease itself)."""

    def __init__(self, root: str):
        self.root = root

    def _p(self, key: str) -> str:
        return os.path.join(self.root, *key.split("/"))

    def list(self, prefix: str) -> list[str]:
        d = self._p(prefix) if prefix else self.root
        if not os.path.isdir(d):
            return []
        return sorted(n for n in os.listdir(d) if not os.path.isdir(os.path.join(d, n)))

    def read_text(self, key: str) -> str:
        with open(self._p(key)) as f:
            return f.read()

    def exists(self, key: str) -> bool:
        return os.path.exists(self._p(key))

    def write_atomic(self, key: str, data: str) -> None:
        path = self._p(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    @contextmanager
    def _cas_lock(self):
        import fcntl

        os.makedirs(self.root, exist_ok=True)
        fd = os.open(os.path.join(self.root, ".caslock"), os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)  # blocking: cas sections are tiny
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    def cas(self, key: str, data: str, expected: str | None) -> bool:
        with self._cas_lock():
            try:
                cur: str | None = self.read_text(key)
            except FileNotFoundError:
                cur = None
            if cur != expected:
                return False
            self.write_atomic(key, data)
            return True

    def delete(self, key: str) -> bool:
        try:
            os.remove(self._p(key))
            return True
        except FileNotFoundError:
            return False

    @contextmanager
    def lease(self, name: str = "LOCK"):
        import fcntl

        path = self._p(name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd = os.open(path, os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except BlockingIOError:
            os.close(fd)
            raise ConcurrentWriterError(f"lease {name!r} held on {self.root}") from None
        try:
            yield self
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)


class MemoryStorage(Storage):
    """In-process reference backend with NATIVE conditional-put
    semantics (what S3 If-Match / If-None-Match provides).  Used by
    the contract test to pin the semantics; also handy in unit tests."""

    def __init__(self):
        self._data: dict[str, str] = {}
        self._mu = threading.Lock()
        self._leases: set[str] = set()

    def list(self, prefix: str) -> list[str]:
        pre = prefix.rstrip("/") + "/" if prefix else ""
        with self._mu:
            out = set()
            for k in self._data:
                if k.startswith(pre):
                    rest = k[len(pre):]
                    if "/" not in rest:
                        out.add(rest)
            return sorted(out)

    def read_text(self, key: str) -> str:
        with self._mu:
            if key not in self._data:
                raise FileNotFoundError(key)
            return self._data[key]

    def exists(self, key: str) -> bool:
        with self._mu:
            return key in self._data

    def write_atomic(self, key: str, data: str) -> None:
        with self._mu:
            self._data[key] = data

    def cas(self, key: str, data: str, expected: str | None) -> bool:
        with self._mu:
            if self._data.get(key) != expected:
                return False
            self._data[key] = data
            return True

    def delete(self, key: str) -> bool:
        with self._mu:
            return self._data.pop(key, None) is not None

    @contextmanager
    def lease(self, name: str = "LOCK"):
        with self._mu:
            if name in self._leases:
                raise ConcurrentWriterError(f"lease {name!r} held")
            self._leases.add(name)
        try:
            yield self
        finally:
            with self._mu:
                self._leases.discard(name)
