"""Single-writer advisory lock for the commit path.

``commit_manifest``'s CURRENT swap is atomic, but two engines racing
the same table_root could both build epoch E+1 from parent E and the
second ``os.replace`` would silently discard the first's work (lost
update).  tartare serializes this through Celery's one-job-per-export
queue `[UNVERIFIED — empty checkout, SURVEY.md §0]`; here an exclusive
``flock`` on ``_manifests/LOCK`` makes the single-writer assumption
explicit and fail-fast.  Advisory only — it protects cooperating
engines on a shared POSIX filesystem, which is exactly the deployment
the manifest design assumes; readers never take it.
"""

from __future__ import annotations

import fcntl
import os


class ConcurrentWriterError(RuntimeError):
    pass


class WriterLock:
    """``with WriterLock(table_root):`` around an epoch's build+commit."""

    def __init__(self, table_root: str):
        self.path = os.path.join(table_root, "_manifests", "LOCK")
        self._fd: int | None = None

    def __enter__(self) -> "WriterLock":
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        self._fd = os.open(self.path, os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(self._fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except BlockingIOError:
            os.close(self._fd)
            self._fd = None
            raise ConcurrentWriterError(
                f"another engine is committing to {os.path.dirname(self.path)}"
            ) from None
        os.ftruncate(self._fd, 0)  # clear a longer previous holder's pid
        os.write(self._fd, str(os.getpid()).encode())
        return self

    def __exit__(self, *exc) -> None:
        if self._fd is not None:
            fcntl.flock(self._fd, fcntl.LOCK_UN)
            os.close(self._fd)
            self._fd = None
